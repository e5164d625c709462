"""TPU-native parallel-beam Radon transform (forward / adjoint / FBP).

The reference delegates CT physics to the external ``torch_radon`` CUDA
extension (/root/reference/tfpnp/utils/transforms.py:445-510). This module
is a from-scratch XLA implementation:

- **forward projection** has two backends:
  * ``matmul`` (default for benchmark-scale geometries): the full operator
    is materialized once as a dense matrix ``W [H*W, V*D]`` whose columns
    hold each detector cell's bilinear ray footprint; projection is then a
    single ``[B, H*W] @ [H*W, V*D]`` MXU matmul (and the adjoint is the
    exact transpose matmul). W is built *in-graph* from the small sample
    grid by scatter-add, so it lives in HBM without a host round-trip.
    ~95% of W is zeros, but MXU FLOPs are free at this size — the op is
    HBM-bandwidth-bound on reading W, which is still ~100x fewer bytes
    than the gather path touches in random access.
  * ``gather``: for each view the image is resampled on a rotated
    (detector x ray-step) grid with bilinear interpolation — a batched
    gather — and summed along the ray; used above ``_MATMUL_BYTES_CAP``.
- **backprojection**: the *exact* adjoint — the transposed matmul, or for
  the gather backend ``jax.vjp`` of the (linear) forward — adjointness
  <Ax, y> == <x, A^T y> holds to machine precision by construction.
- **FBP**: ramp filter applied along the detector axis in the Fourier
  domain (rfft/irfft), then backprojection. Mirrors
  ``Radon_norm.filter_backprojection`` (transforms.py:479-481).
- **operator norm**: 10-step power method on A^T A, jitted; mirrors
  ``power_method_opnorm`` (transforms.py:447-462). ``backprojection_norm``
  divides the adjoint by opnorm^2 (transforms.py:476-477).

Geometry: square image of side ``resolution``; pixel centers on an integer
grid with the rotation center at (res-1)/2; detector spacing 1.0; ray
sampling step 1.0 with ``det_count`` steps (covers the diagonal, matching
``det_count = ceil(sqrt(2)*resolution)`` from transforms.py:489).
"""

from __future__ import annotations

import functools
import math
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["Radon", "RadonGenerator", "power_method_opnorm"]


def _view_grids(resolution: int, angles: np.ndarray, det_count: int) -> np.ndarray:
    """Precompute bilinear sample positions, shape [V, D, T, 2] (row, col)."""
    c = (resolution - 1) / 2.0
    s = np.arange(det_count, dtype=np.float64) - (det_count - 1) / 2.0  # detector offsets
    t = np.arange(det_count, dtype=np.float64) - (det_count - 1) / 2.0  # ray steps
    grids = np.empty((len(angles), det_count, det_count, 2), np.float32)
    for v, th in enumerate(angles):
        ca, sa = math.cos(th), math.sin(th)
        # detector axis is perpendicular to the ray direction
        col = c + s[:, None] * (-sa) + t[None, :] * ca
        row = c + s[:, None] * ca + t[None, :] * sa
        grids[v, ..., 0] = row
        grids[v, ..., 1] = col
    return grids


def _bilinear_gather(img_flat: jnp.ndarray, rows: jnp.ndarray, cols: jnp.ndarray,
                     h: int, w: int) -> jnp.ndarray:
    """Zero-padded bilinear sampling. img_flat: [B, H*W]; rows/cols: [K]."""
    r0 = jnp.floor(rows)
    c0 = jnp.floor(cols)
    fr = rows - r0
    fc = cols - c0
    r0i = r0.astype(jnp.int32)
    c0i = c0.astype(jnp.int32)

    out = None
    for dr, dc, wgt in (
        (0, 0, (1 - fr) * (1 - fc)),
        (0, 1, (1 - fr) * fc),
        (1, 0, fr * (1 - fc)),
        (1, 1, fr * fc),
    ):
        ri = r0i + dr
        ci = c0i + dc
        valid = (ri >= 0) & (ri < h) & (ci >= 0) & (ci < w)
        idx = jnp.clip(ri, 0, h - 1) * w + jnp.clip(ci, 0, w - 1)
        vals = jnp.take(img_flat, idx, axis=1) * (wgt * valid)[None, :]
        out = vals if out is None else out + vals
    return out  # [B, K]


class Radon:
    """Parallel-beam Radon operator for one (resolution, angles) geometry.

    API mirrors the reference's ``Radon_norm`` wrapper
    (transforms.py:465-484): ``forward``, ``backprojection``,
    ``backprojection_norm``, ``filter_sinogram``, ``filter_backprojection``,
    ``normal_operator``, plus the cached ``opnorm``.
    """

    # above this dense-W size the matmul backend stops paying for itself
    # (W bytes = (res^2) * (views*det) * 4; 128^2 x 30 views ~ 0.36 GB)
    _MATMUL_BYTES_CAP = 1 << 30

    def __init__(self, resolution: int, angles: np.ndarray, det_count: int = -1,
                 opnorm: float | None = None, backend: str = "auto"):
        if det_count <= 0:
            det_count = int(np.ceil(np.sqrt(2) * resolution))
        self.resolution = int(resolution)
        self.det_count = int(det_count)
        self.angles = np.asarray(angles, np.float64)
        self.n_views = len(self.angles)
        self.view = self.n_views  # reference attribute name (transforms.py:474)
        self._grids = jnp.asarray(_view_grids(self.resolution, self.angles, self.det_count))

        if backend == "auto":
            w_bytes = (resolution ** 2) * (self.n_views * det_count) * 4
            backend = "matmul" if w_bytes <= self._MATMUL_BYTES_CAP else "gather"
        self.backend = backend
        # concrete W for the *eager* API only — always passed as a runtime
        # argument, never closed over: a closure-captured device constant
        # is serialized into the compiled program, and a 0.36 GB literal
        # overflows the tunneled backend's remote-compile request
        # (HTTP 413). Trace-level callers use ``w_traced`` instead.
        self._W = jax.jit(self._build_w)() if backend == "matmul" else None

        # ramp filter response on the padded rfft grid
        pad = 1 << max(6, int(np.ceil(np.log2(2 * self.det_count))))
        self._pad = pad
        freqs = np.fft.rfftfreq(pad)
        self._ramp = jnp.asarray(2.0 * np.abs(freqs), jnp.float32)

        if backend == "matmul":
            # W as a runtime ARGUMENT of the eager wrappers (see _W note)
            fwd = jax.jit(self._forward_matmul)
            adj = jax.jit(self._adjoint_matmul)
            self._forward_jit = lambda x: fwd(x, self._W)
            self._adjoint_jit = lambda y: adj(y, self._W)
        else:
            self._forward_jit = jax.jit(self._forward_impl)
            self._adjoint_jit = jax.jit(self._adjoint_impl)

        if opnorm is None:
            x = jax.random.normal(jax.random.PRNGKey(0), (1, resolution, resolution))
            opnorm = float(power_method_opnorm(self.normal_operator, x, n_iter=10))
        self.opnorm = opnorm

    # -- matmul backend ----------------------------------------------------

    def _build_w(self) -> jnp.ndarray:
        """Materialize the operator matrix W [H*W, V*D] by scatter-adding
        every (view, detector, ray-step) bilinear tap into its image cell.
        Runs in-graph (one jitted scatter program) so W is born in HBM."""
        h = w = self.resolution
        v, d, t = self.n_views, self.det_count, self.det_count
        rows = self._grids[..., 0].reshape(-1)          # [V*D*T]
        cols = self._grids[..., 1].reshape(-1)
        # output column of each (view, det) pair, broadcast over ray steps
        out_col = (
            jnp.arange(v * d, dtype=jnp.int32)[:, None]
            * jnp.ones((1, t), jnp.int32)
        ).reshape(-1)
        r0 = jnp.floor(rows)
        c0 = jnp.floor(cols)
        fr = (rows - r0).astype(jnp.float32)
        fc = (cols - c0).astype(jnp.float32)
        r0i = r0.astype(jnp.int32)
        c0i = c0.astype(jnp.int32)
        mat = jnp.zeros((h * w, v * d), jnp.float32)
        for dr, dc, wgt in (
            (0, 0, (1 - fr) * (1 - fc)),
            (0, 1, (1 - fr) * fc),
            (1, 0, fr * (1 - fc)),
            (1, 1, fr * fc),
        ):
            ri = r0i + dr
            ci = c0i + dc
            valid = (ri >= 0) & (ri < h) & (ci >= 0) & (ci < w)
            img_idx = jnp.clip(ri, 0, h - 1) * w + jnp.clip(ci, 0, w - 1)
            mat = mat.at[img_idx, out_col].add(jnp.where(valid, wgt, 0.0))
        return mat

    def w_traced(self) -> jnp.ndarray:
        """In-graph W for trace-level callers: built from the small grid
        constant (a few MB), executed once per program run. Compute it
        where it is loop-invariant (e.g. in a solver's ``filter_aux``,
        which ``run_bundle`` keeps outside the iteration scan) and pass
        it to ``forward_op``/``adjoint_op``."""
        return self._build_w()

    def _forward_matmul(self, x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
        b = x.shape[0]
        sino = jnp.dot(x.reshape(b, -1), w,
                       preferred_element_type=jnp.float32)
        return sino.reshape(b, self.n_views, self.det_count)

    def _adjoint_matmul(self, y: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
        b = y.shape[0]
        xt = jnp.dot(y.reshape(b, -1), w.T,
                     preferred_element_type=jnp.float32)
        return xt.reshape(b, self.resolution, self.resolution)

    # -- backend dispatch (trace-level: call these inside jit) --------------

    def forward_op(self, x: jnp.ndarray, w: jnp.ndarray | None = None) -> jnp.ndarray:
        """Backend-dispatched forward projection, [B, H, W] -> [B, V, D].

        Under the matmul backend pass ``w`` (from :meth:`w_traced`) when a
        loop-invariant spot is available; omitting it builds W inline."""
        if self.backend == "matmul":
            return self._forward_matmul(x, self._build_w() if w is None else w)
        return self._forward_impl(x)

    def adjoint_op(self, y: jnp.ndarray, w: jnp.ndarray | None = None) -> jnp.ndarray:
        """Backend-dispatched exact adjoint, [B, V, D] -> [B, H, W]."""
        if self.backend == "matmul":
            return self._adjoint_matmul(y, self._build_w() if w is None else w)
        return self._adjoint_impl(y)

    # -- gather backend core linear maps -----------------------------------

    def _forward_impl(self, x: jnp.ndarray) -> jnp.ndarray:
        """x: [B, H, W] -> sinogram [B, V, D]."""
        b = x.shape[0]
        h = w = self.resolution
        img_flat = x.reshape(b, h * w)

        def per_view(grid):
            rows = grid[..., 0].reshape(-1)
            cols = grid[..., 1].reshape(-1)
            vals = _bilinear_gather(img_flat, rows, cols, h, w)
            return vals.reshape(b, self.det_count, self.det_count).sum(axis=-1)

        sino = jax.lax.map(per_view, self._grids)  # [V, B, D]
        return jnp.transpose(sino, (1, 0, 2))

    def _adjoint_impl(self, y: jnp.ndarray) -> jnp.ndarray:
        """Exact adjoint of ``_forward_impl``; y: [B, V, D] -> [B, H, W].

        Obtained by reverse-mode AD at zero: for a linear map the VJP *is*
        the adjoint (``jax.linear_transpose`` cannot transpose through the
        per-view ``lax.map`` closure, but vjp can).
        """
        b = y.shape[0]
        zeros = jnp.zeros((b, self.resolution, self.resolution), y.dtype)
        _, vjp = jax.vjp(self._forward_impl, zeros)
        (xt,) = vjp(y)
        return xt

    # -- public API (reference-parity names) ------------------------------

    def forward(self, x: jnp.ndarray) -> jnp.ndarray:
        squeeze = x.ndim == 4  # accept [B, 1, H, W]-style channel too
        if squeeze:
            x = x[:, 0]
        y = self._forward_jit(x)
        return y[:, None] if squeeze else y

    def backprojection(self, y: jnp.ndarray) -> jnp.ndarray:
        squeeze = y.ndim == 4
        if squeeze:
            y = y[:, 0]
        x = self._adjoint_jit(y)
        return x[:, None] if squeeze else x

    def backprojection_norm(self, y: jnp.ndarray) -> jnp.ndarray:
        """Adjoint scaled by 1/opnorm^2 (reference transforms.py:476-477)."""
        return self.backprojection(y) / (self.opnorm ** 2)

    def filter_sinogram(self, sino: jnp.ndarray) -> jnp.ndarray:
        """Ramp ('Ram-Lak') filter along the detector axis."""
        f = jnp.fft.rfft(sino, n=self._pad, axis=-1)
        f = f * self._ramp[: f.shape[-1]]
        out = jnp.fft.irfft(f, n=self._pad, axis=-1)[..., : self.det_count]
        return out.astype(sino.dtype)

    def filter_backprojection(self, sino: jnp.ndarray) -> jnp.ndarray:
        """FBP reconstruction (reference transforms.py:479-481)."""
        filtered = self.filter_sinogram(sino)
        scale = np.pi / (2.0 * self.n_views)
        return self.backprojection(filtered) * scale

    def normal_operator(self, x: jnp.ndarray) -> jnp.ndarray:
        return self.backprojection(self.forward(x))


def power_method_opnorm(normal_op, x: jnp.ndarray, n_iter: int = 10) -> float:
    """Largest singular value of A via power iteration on A^T A
    (reference transforms.py:447-462)."""
    def normalize(v):
        flat = v.reshape(v.shape[0], -1)
        nrm = jnp.linalg.norm(flat, axis=1)
        return (flat / nrm[:, None]).reshape(v.shape), jnp.max(nrm)

    x, _ = normalize(x)
    v = 0.0
    for _ in range(n_iter):
        x = normal_op(x)
        x, v = normalize(x)
    return float(v) ** 0.5


def _make_angles(view: int) -> np.ndarray:
    """Angle ladder matching reference ``create_radon``
    (transforms.py:487-491): linspace(0, 179 deg, view)."""
    return np.linspace(0.0, 179.0 / 180.0 * np.pi, view)


class RadonGenerator:
    """Cache of Radon operators and their opnorms per (resolution, view),
    mirroring reference ``RadonGenerator`` (transforms.py:494-508)."""

    def __init__(self):
        self._ops: Dict[Tuple[int, int], Radon] = {}

    def __call__(self, resolution: int, view: int) -> Radon:
        key = (int(resolution), int(view))
        if key not in self._ops:
            det_count = int(np.ceil(np.sqrt(2) * resolution))
            self._ops[key] = Radon(resolution, _make_angles(view), det_count)
        return self._ops[key]
