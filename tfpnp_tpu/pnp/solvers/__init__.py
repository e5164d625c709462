"""PnP solver algorithms (layer L3).

Importing this package registers all task solvers:
csmri_{admm,hqs,pg,apg,redadmm,amp}, pr_{iadmm,pg}, ct_{iadmm,pg}, spi_admm
— the union of /root/reference/tasks/*/solver.py registries — plus the
beyond-reference deblur_{admm,hqs,pg}, sr[{3,4}]_{admm,hqs,pg}, and
inpaint_{admm,hqs,pg} families.
"""

from .base import Solver, run_bundle, get_solver, register_solver, SOLVER_REGISTRY
from . import csmri, pr, ct, spi, deblur, sr, inpaint  # noqa: F401  (registration side effects)

__all__ = ["Solver", "run_bundle", "get_solver", "register_solver", "SOLVER_REGISTRY"]
