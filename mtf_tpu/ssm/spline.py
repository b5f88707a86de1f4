"""Non-rigid SSMs: control-point Spline and Thin-Plate Spline (TPS).

TPU-native re-design of the reference's high-DOF warps
(`/root/reference/SSM/src/Spline.cc` (366 LoC): control-point grid with
per-point influence regions and interpolation types, `Spline.h:10-29`;
`SSM/src/TPS.cc` (747 LoC) via `warpUtils::computeTPS`,
`warpUtils.h:138-141`).

Design: the state is a (2K,) vector of control-point displacements in the
normalized template frame; the warp is `x + D(x; state)` where `D` is a
differentiable interpolation of the control displacements — bilinear over
the control grid (Spline) or the TPS radial-basis solve (TPS). Updates are
additive (displacement fields do not compose through 3x3 matrices; the
reference likewise updates spline control points additively). The per-point
TPS basis is an (N, K+3) matmul — MXU-friendly — with the (K+3)x(K+3)
system inverse precomputed at construction.
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from mtf_tpu.ssm.base import SSM

Array = jax.Array


def _control_grid(kx: int, ky: int, span: float = 1.1) -> np.ndarray:
    """(K, 2) control points covering the normalized template square."""
    xs = np.linspace(-span, span, kx)
    ys = np.linspace(-span, span, ky)
    gx, gy = np.meshgrid(xs, ys)
    return np.stack([gx.ravel(), gy.ravel()], axis=-1).astype(np.float32)


class NonRigidSSM(SSM):
    """Shared additive displacement-field machinery."""

    def __init__(self):
        # no 3x3 generators; keep the attribute absent intentionally
        pass

    # -- displacement interface (subclasses) ---------------------------
    def displacement(self, state: Array, pts: Array) -> Array:
        """(N, 2) displacement field at pts."""
        raise NotImplementedError

    # -- SSM contract over displacements -------------------------------
    def warp_pts(self, state: Array, pts: Array) -> Array:
        return pts + self.displacement(state, pts)

    def warp_pts_from(self, state: Array, dp: Array, pts: Array,
                      compositional: bool = True) -> Array:
        # compositional == additive for displacement fields (Spline.cc
        # updates control points additively regardless of SM flavor)
        return self.warp_pts(state + dp, pts)

    def to_matrix(self, state: Array) -> Array:
        raise TypeError(f"{self.name} is non-rigid: no 3x3 matrix form")

    def from_matrix(self, mat: Array) -> Array:
        raise TypeError(f"{self.name} is non-rigid: no 3x3 matrix form")

    def compose(self, s1: Array, s2: Array) -> Array:
        return s1 + s2

    def invert(self, state: Array) -> Array:
        return -state

    def compositional_update(self, state: Array, dp: Array) -> Array:
        return state + dp

    def inverse_compositional_update(self, state: Array, dp: Array) -> Array:
        return state - dp

    def dwdp_identity(self, pts: Array) -> Array:
        z = self.identity()
        return jax.jacfwd(lambda s: self.warp_pts(s, pts))(z)  # (N,2,S)

    def dwdp_at(self, state: Array, pts: Array) -> Array:
        return jax.jacfwd(lambda s: self.warp_pts(s, pts))(state)

    def fit_pts(self, src: Array, dst: Array,
                weights: Array | None = None) -> Array:
        """Ridge LS control displacements from correspondences
        (`estimateWarpFromPts` analog; minimal-norm when underdetermined,
        e.g. the 4-corner `setRegion` case)."""
        A = self.dwdp_identity(src).reshape(-1, self.dof)   # (2N, S)
        r = (dst - src).reshape(-1)
        if weights is not None:
            w = jnp.repeat(weights, 2)
            A = A * w[:, None]
            r = r * w
        AtA = A.T @ A + 1e-4 * jnp.eye(self.dof, dtype=A.dtype)
        return jnp.linalg.solve(AtA, A.T @ r)

    def state_sigma_from_pixel_sigma(self, pix_sigma: Array,
                                     pts: Array) -> Array:
        # control displacements are already in point units
        return jnp.full((self.dof,), jnp.asarray(pix_sigma, jnp.float32))


def _spline_kernel(d: Array, interp_type: str) -> Array:
    """Truncated 1-D influence kernel on normalized distance d
    (support |d| <= 1), reference `Spline::getWeight` (Spline.cc:223-238).

    `bilinear` is the reference's implemented kernel; `biquadratic` /
    `bicubic` exist in its InterpolationType enum but THROW
    FunctonNotImplemented (Spline.cc:230-233) — here they are actual
    quadratic/cubic B-spline kernels rescaled to the same support."""
    a = jnp.abs(d)
    if interp_type == "bilinear":
        return jnp.maximum(0.0, 1.0 - a)
    if interp_type == "biquadratic":
        t = a * 1.5
        return jnp.where(t < 0.5, 0.75 - t * t,
                         jnp.where(t < 1.5, 0.5 * (1.5 - t) ** 2, 0.0))
    if interp_type == "bicubic":
        t = a * 2.0
        return jnp.where(
            t < 1.0, 2.0 / 3.0 - t * t + 0.5 * t ** 3,
            jnp.where(t < 2.0, (2.0 - t) ** 3 / 6.0, 0.0))
    raise ValueError(f"unknown spline interp_type {interp_type!r}")


class Spline(NonRigidSSM):
    """Control-point grid with per-point influence regions
    (`Spline.cc:80-240`): each control point owns a patch of the
    template; its influence kernel spans the patch half-size plus an
    overlap margin (reference `control_size_x/y` + `control_overlap`,
    defaults 10 px + 1 px), distances are normalized by that span,
    weighted by the interpolation kernel, and the per-point weights are
    normalized to a partition of unity (initInterpolationWeights's
    row-wise division).

    Here the grid lives in the normalized template frame: `overlap` is a
    fraction of the control spacing (the reference default 1 px on a
    10 px patch = 0.1). Weights are recomputed from the query points each
    call — for the LK SMs, which always evaluate at the fixed template
    grid, this equals the reference's `static_wts=true` precomputation.
    """

    name = "spline"

    def __init__(self, kx: int = 5, ky: int = 5, span: float = 1.1,
                 overlap: float = 0.1, interp_type: str = "bilinear"):
        super().__init__()
        _spline_kernel(jnp.zeros(()), interp_type)  # validate early
        self.kx, self.ky, self.span = kx, ky, span
        self.overlap = overlap
        self.interp_type = interp_type
        self.dof = 2 * kx * ky
        self.ctrl = jnp.asarray(_control_grid(kx, ky, span))
        # influence normalizer: half control spacing + overlap margin
        # (dist_norm_x/y of Spline.cc:86-88 in normalized units)
        sx = 2.0 * span / max(kx - 1, 1)
        sy = 2.0 * span / max(ky - 1, 1)
        self._dist_norm = (0.5 * sx + overlap * sx,
                           0.5 * sy + overlap * sy)

    def weights(self, pts: Array) -> Array:
        """(N, K) normalized control-point influence weights."""
        dnx, dny = self._dist_norm
        dx = (pts[:, 0:1] - self.ctrl[None, :, 0]) / dnx      # (N, K)
        dy = (pts[:, 1:2] - self.ctrl[None, :, 1]) / dny
        w = _spline_kernel(dx, self.interp_type) * \
            _spline_kernel(dy, self.interp_type)
        return w / (jnp.sum(w, axis=1, keepdims=True) + 1e-12)

    def displacement(self, state: Array, pts: Array) -> Array:
        D = state.reshape(self.kx * self.ky, 2)
        return self.weights(pts) @ D                          # MXU matmul


class TPS(NonRigidSSM):
    """Thin-plate spline over K anchor points (TPS.cc /
    warpUtils::computeTPS). State = anchor displacements; the bending
    system inverse is precomputed so each warp is one (N, K+3) matmul."""

    name = "tps"

    def __init__(self, kx: int = 4, ky: int = 4, span: float = 1.0,
                 reg: float = 1e-4):
        super().__init__()
        ctrl = _control_grid(kx, ky, span)
        K = ctrl.shape[0]
        self.dof = 2 * K
        self.n_ctrl = K
        # L = [[U + reg*I, P], [P^T, 0]],  P = [1, x, y]
        d2 = np.sum((ctrl[:, None] - ctrl[None]) ** 2, axis=-1)
        U = np.where(d2 > 1e-12, d2 * np.log(d2 + 1e-12), 0.0)
        P = np.concatenate([np.ones((K, 1)), ctrl], axis=1)
        L = np.zeros((K + 3, K + 3), np.float64)
        L[:K, :K] = U + reg * np.eye(K)
        L[:K, K:] = P
        L[K:, :K] = P.T
        self.ctrl = jnp.asarray(ctrl)
        self.L_inv = jnp.asarray(np.linalg.inv(L), jnp.float32)

    def displacement(self, state: Array, pts: Array) -> Array:
        K = self.n_ctrl
        disp = state.reshape(K, 2)
        rhs = jnp.concatenate([disp, jnp.zeros((3, 2), disp.dtype)])
        params = self.L_inv @ rhs                     # (K+3, 2)
        d2 = jnp.sum((pts[:, None] - self.ctrl[None]) ** 2, axis=-1)
        U = jnp.where(d2 > 1e-12, d2 * jnp.log(d2 + 1e-12), 0.0)  # (N, K)
        basis = jnp.concatenate(
            [U, jnp.ones((pts.shape[0], 1), pts.dtype), pts], axis=1)
        return basis @ params                          # (N, 2)


SPLINE_REGISTRY = {
    "spline": Spline, "spl": Spline,
    "tps": TPS,
}
