"""State Space Model (SSM) base machinery.

TPU-native re-design of the reference SSM layer
(`/root/reference/SSM/include/mtf/SSM/StateSpaceModel.h:49-408`,
`ProjectiveBase.cc`). An SSM is a *static* Python object (safe to close over
in jit) exposing pure functions over small f32 state vectors:

    state (S,)  <->  3x3 warp matrix       (to_matrix / from_matrix)
    compositional/additive updates, inversion, composition
    warp application to point grids
    dW/dp pixel-Jacobian basis from Lie-algebra-style generators
    stochastic samplers (random walk / AR(1), jax.random)
    least-squares fit from point correspondences (DLT analogs)

Unification vs the reference: all 12 fixed-matrix SSMs (Translation ...
Homography, Lie variants, SL3, CBH — SSM/src/*.cc, ~6 kLoC of hand-derived
Jacobians) reduce here to a generator basis + per-family to/from-matrix
closures; dW/dp at identity is one einsum over the generators, and exact
Jacobians at arbitrary states come from jax.jacfwd.
"""
from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp

from mtf_tpu.ops import warp as W

Array = jax.Array


def dehom_jacobian_from_generators(generators: Array, pts: Array) -> Array:
    """dW/dp at identity for points (N, 2) -> (N, 2, S).

    For a warp family with d to_matrix(p)/dp_i |_{p=0} = G_i, the derivative
    of the dehomogenized warped point is
        d/dp_i dehom(W(p) x_h) |_0 = (v_x - x v_w, v_y - y v_w),  v = G_i x_h.
    Replaces the per-SSM hand-derived `cmptInitPixJacobian` matrices
    (e.g. Homography.cc:157-359).
    """
    pts_h = W.homogenize(pts)  # (N, 3)
    gv = jnp.einsum("sij,nj->nsi", generators, pts_h)  # (N, S, 3)
    dx = gv[..., 0] - pts[:, :1] * gv[..., 2]  # (N, S)
    dy = gv[..., 1] - pts[:, 1:2] * gv[..., 2]
    return jnp.stack([dx, dy], axis=1)  # (N, 2, S)


def _sqrtm_db(A: Array, iters: int = 10) -> Array:
    """Denman-Beavers iteration for the principal matrix square root."""
    I = jnp.eye(3, dtype=A.dtype)

    from mtf_tpu.ops.linalg import inv3x3

    def step(_, yz):
        Y, Z = yz
        Yn = 0.5 * (Y + inv3x3(Z))
        Zn = 0.5 * (Z + inv3x3(Y))
        return Yn, Zn

    Y, _ = jax.lax.fori_loop(0, iters, step, (A, I))
    return Y


def logm_3x3(A: Array, num_sqrts: int = 3, series_terms: int = 12) -> Array:
    """Principal matrix log of a near-identity 3x3 matrix.

    Inverse scaling-and-squaring: `num_sqrts` repeated Denman-Beavers square
    roots bring A within series range, then a truncated log(I+X) series,
    rescaled by 2^num_sqrts. jax has expm but no logm; tracking warps are
    near identity so this is accurate and jit-friendly. (Needed by the Lie
    SSMs' from_matrix — reference SL3.cc/LieHomography.cc use Eigen
    eigen-decompositions instead.)
    """
    for _ in range(num_sqrts):
        A = _sqrtm_db(A)
    X = A - jnp.eye(3, dtype=A.dtype)
    # log(I+X) = X - X^2/2 + X^3/3 - ...
    out = jnp.zeros_like(A)
    Xp = X
    for k in range(1, series_terms + 1):
        out = out + ((-1.0) ** (k + 1)) / k * Xp
        Xp = Xp @ X
    return out * (2.0 ** num_sqrts)


class SSM:
    """Base class: subclasses define name/dof/generators and to/from-matrix.

    All methods are pure; `self` carries only static config.
    """

    name: str = "base"
    dof: int = 0

    def __init__(self):
        self.generators = jnp.asarray(self._generators(), jnp.float32)

    # ---- to be provided by subclasses -------------------------------
    def _generators(self):  # (dof, 3, 3)
        raise NotImplementedError

    def to_matrix(self, state: Array) -> Array:
        raise NotImplementedError

    def from_matrix(self, mat: Array) -> Array:
        raise NotImplementedError

    # ---- generic algebra (StateSpaceModel.h:199-241 analogs) --------
    def identity(self, dtype=jnp.float32) -> Array:
        return jnp.zeros((self.dof,), dtype)

    def warp_pts(self, state: Array, pts: Array) -> Array:
        return W.apply_warp(self.to_matrix(state), pts)

    def compose(self, s1: Array, s2: Array) -> Array:
        """State of warp W(s1) @ W(s2) (apply s2 first in template frame).

        All 3x3 warp products use precision=HIGHEST: TPU matmuls round
        f32 operands to bf16 by default, and the iterated composition
        accumulates that rounding into the tracked state (r4 on-chip GT
        audit); a 3x3 product at full precision is free."""
        return self.from_matrix(jnp.matmul(
            self.to_matrix(s1), self.to_matrix(s2),
            precision=jax.lax.Precision.HIGHEST))

    def invert(self, state: Array) -> Array:
        from mtf_tpu.ops.linalg import inv3x3
        return self.from_matrix(inv3x3(self.to_matrix(state)))

    def compositional_update(self, state: Array, dp: Array) -> Array:
        """p <- p ∘ dp. Reference: `compositionalUpdate` (Homography.cc:73-92)."""
        return self.compose(state, dp)

    def inverse_compositional_update(self, state: Array, dp: Array) -> Array:
        """p <- p ∘ dp^-1 (ICLK update; SSM/StateSpaceModel.h contract)."""
        from mtf_tpu.ops.linalg import inv3x3
        return self.from_matrix(jnp.matmul(
            self.to_matrix(state), inv3x3(self.to_matrix(dp)),
            precision=jax.lax.Precision.HIGHEST))

    def additive_update(self, state: Array, dp: Array) -> Array:
        return state + dp

    def warp_pts_from(self, state: Array, dp: Array, pts: Array,
                      compositional: bool = True) -> Array:
        """Warp `pts` by the state perturbed with update `dp`.

        The differentiation path of every LK iteration (SURVEY.md §3.2):
        jacfwd w.r.t. dp at 0 yields the pixel-vs-state Jacobian. Matrix
        SSMs compose matrices; non-rigid SSMs (Spline/TPS) override with
        displacement-field semantics.
        """
        if compositional:
            M = jnp.matmul(self.to_matrix(state), self.to_matrix(dp),
                           precision=jax.lax.Precision.HIGHEST)
        else:
            M = self.to_matrix(state + dp)
        return W.apply_warp(M, pts)

    # ---- Jacobians ---------------------------------------------------
    def dwdp_identity(self, pts: Array) -> Array:
        """(N, 2, S) warp Jacobian at identity (compositional LK)."""
        return dehom_jacobian_from_generators(self.generators, pts)

    def dwdp_at(self, state: Array, pts: Array) -> Array:
        """(N, 2, S) exact warp Jacobian at `state` (additive LK), via AD."""
        jac = jax.jacfwd(lambda s: self.warp_pts(s, pts))(state)  # (N,2,S)
        return jac

    # ---- corner/point fitting (SSMEstimator least-squares core) -----
    def fit_pts(self, src: Array, dst: Array,
                weights: Array | None = None) -> Array:
        """LS state mapping src points to dst points.

        Default: full-homography (dof>=8) / affine (dof>=6) / similitude DLT
        then projection through from_matrix. Low-DOF subclasses override with
        closed forms. Reference: `estimateWarpFromCorners/Pts`
        (StateSpaceModel.h:244-280).
        """
        if self.dof >= 8:
            mat = W.homography_dlt(src, dst, weights)
        elif self.dof >= 5:
            mat = W.affine_dlt(src, dst, weights)
        else:
            mat = W.similitude_dlt(src, dst, weights)
        return self.from_matrix(mat)

    def fit_corners(self, src_corners: Array, dst_corners: Array) -> Array:
        return self.fit_pts(src_corners, dst_corners)

    # ---- stochastic samplers (StateSpaceModel.h:286-338) ------------
    def random_walk(self, key: Array, state: Array, sigma: Array,
                    compositional: bool = True) -> Array:
        """additive/compositionalRandomWalk analog."""
        dp = sigma * jax.random.normal(key, (self.dof,), state.dtype)
        if compositional:
            return self.compositional_update(state, dp)
        return state + dp

    def auto_regression1(self, key: Array, state: Array, prev_state: Array,
                         sigma: Array, a: float = 0.5,
                         compositional: bool = True) -> Array:
        """AR(1) dynamics: extrapolate the last inter-frame motion, then
        perturb (additive/compositionalAutoRegression1 analog)."""
        dp = sigma * jax.random.normal(key, (self.dof,), state.dtype)
        if compositional:
            # delta = prev^-1 ∘ state, scaled by a, re-applied
            delta = self.compose(self.invert(prev_state), state)
            pred = self.compose(state, self.scale_state(delta, a))
            return self.compositional_update(pred, dp)
        pred = state + a * (state - prev_state)
        return pred + dp

    def scale_state(self, state: Array, a: float) -> Array:
        """Fractional warp: default linear scaling of the state vector
        (exact for Lie parameterizations, first-order otherwise)."""
        return state * a

    def mean_of_samples(self, states: Array, weights: Array) -> Array:
        """Weighted mean of a (P, S) state batch.

        Default: Euclidean mean of state vectors (exact for additive
        parameterizations; `estimateMeanOfSamples`,
        StateSpaceModel.h:286-338). Lie SSMs override with the iterative
        Karcher mean (SL3.cc's iterative sample mean)."""
        return jnp.sum(weights[:, None] * states, axis=0)

    def state_sigma_from_pixel_sigma(self, pix_sigma: Array,
                                     pts: Array) -> Array:
        """Map a desired RMS point displacement (pixels) to per-parameter
        state sigmas: sigma_i = pix_sigma / rms(||dW/dp_i||).
        Reference: `estimateStateSigma` (StateSpaceModel.h:330-338)."""
        J = self.dwdp_identity(pts)  # (N, 2, S)
        rms = jnp.sqrt(jnp.mean(jnp.sum(J * J, axis=1), axis=0))  # (S,)
        return jnp.asarray(pix_sigma) / jnp.maximum(rms, 1e-12)


class AdditiveMatrixSSM(SSM):
    """W(p) = I + sum_i p_i G_i (the reference's 'standard' parameterizations)."""

    def to_matrix(self, state: Array) -> Array:
        return jnp.eye(3, dtype=state.dtype) + jnp.einsum(
            "s,sij->ij", state, self.generators)


class ExpSSM(SSM):
    """W(p) = expm(sum_i p_i G_i) (Lie parameterizations: LieAffine,
    LieHomography, SL3 — reference SSM/src/{LieAffine,LieHomography,SL3}.cc)."""

    def to_matrix(self, state: Array) -> Array:
        return jax.scipy.linalg.expm(
            jnp.einsum("s,sij->ij", state, self.generators))

    def project_algebra(self, X: Array) -> Array:
        """Project a 3x3 algebra element onto the generator basis (LS)."""
        Gflat = self.generators.reshape(self.dof, 9)
        coef = jnp.linalg.lstsq(Gflat.T, X.reshape(9))[0]
        return coef

    def from_matrix(self, mat: Array) -> Array:
        return self.project_algebra(logm_3x3(self._normalize(mat)))

    def _normalize(self, mat: Array) -> Array:
        return mat / mat[2, 2]

    def mean_of_samples(self, states: Array, weights: Array,
                        iters: int = 4) -> Array:
        """Iterative Karcher mean on the group (SL3.cc's iterative sample
        mean): mu <- mu ∘ exp(sum_i w_i log(mu^-1 ∘ s_i))."""
        mu = jnp.sum(weights[:, None] * states, axis=0)
        for _ in range(iters):
            Minv = jnp.linalg.inv(self.to_matrix(mu))

            def rel(s):
                return self.project_algebra(
                    logm_3x3(self._normalize(Minv @ self.to_matrix(s))))

            d = jax.vmap(rel)(states)
            mu = self.compositional_update(
                mu, jnp.sum(weights[:, None] * d, axis=0))
        return mu
