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


class Spline(NonRigidSSM):
    """Control-point grid with bilinear displacement interpolation
    (Spline.cc; `control_size_x/y` / interpolation types collapse to the
    grid resolution + smooth bilinear blend here)."""

    name = "spline"

    def __init__(self, kx: int = 5, ky: int = 5, span: float = 1.1):
        super().__init__()
        self.kx, self.ky, self.span = kx, ky, span
        self.dof = 2 * kx * ky
        self.ctrl = jnp.asarray(_control_grid(kx, ky, span))

    def displacement(self, state: Array, pts: Array) -> Array:
        kx, ky, span = self.kx, self.ky, self.span
        D = state.reshape(ky, kx, 2)
        # continuous grid coords
        gx = (pts[:, 0] + span) / (2 * span) * (kx - 1)
        gy = (pts[:, 1] + span) / (2 * span) * (ky - 1)
        gx = jnp.clip(gx, 0.0, kx - 1 - 1e-6)
        gy = jnp.clip(gy, 0.0, ky - 1 - 1e-6)
        x0 = jnp.floor(gx).astype(jnp.int32)
        y0 = jnp.floor(gy).astype(jnp.int32)
        fx = (gx - x0)[:, None]
        fy = (gy - y0)[:, None]
        d00 = D[y0, x0]
        d01 = D[y0, x0 + 1]
        d10 = D[y0 + 1, x0]
        d11 = D[y0 + 1, x0 + 1]
        return ((1 - fy) * ((1 - fx) * d00 + fx * d01)
                + fy * ((1 - fx) * d10 + fx * d11))


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
