"""Plug-and-play priors and solvers (layers L2-L3)."""

from .denoiser import UNetDenoiser, load_denoiser, init_denoiser_params, save_denoiser_params
from .solvers import Solver, run_bundle, get_solver, SOLVER_REGISTRY

__all__ = [
    "UNetDenoiser", "load_denoiser", "init_denoiser_params", "save_denoiser_params",
    "Solver", "run_bundle", "get_solver", "SOLVER_REGISTRY",
]
