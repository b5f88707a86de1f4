"""Linear-predictor search method (hyperplane tracking).

A TPU-native addition beyond the reference's SM set (closest relatives:
its NN SM — offline sample synthesis, `SM/src/NN.cc` — and RegNet — a
learned update predictor, `SM/src/NT/RegNet.cc`). Classic
Jurie-Dhome-style hyperplane tracking, cf. the symbolic linear predictor
literature (PAPERS.md: "Efficient Subpixel Refinement with Symbolic
Linear Predictors"):

  offline (initialize): sample K random warp perturbations dp_k around the
  template, record intensity differences d_k = I0(w(x, dp_k)) - I0(x), and
  solve the ridge least-squares predictor

      A = argmin_A sum_k ||A d_k - dp_k||^2 + lam ||A||^2
        = P D^T (D D^T + lam I)^-1              (S, N)

  online (update): each iteration is ONE value-only patch sample and ONE
  (S, N) @ (N,) matvec:  dp = A (I_t(w(x, p)) - I0); no gradient pass, no
  Hessian, no solve — the cheapest possible LK-style iteration on an MXU.

Cascade an LK refiner after it (e.g. `casc` with `lpfc`) when subpixel
endgame accuracy is needed; the predictor's basin of attraction is set by
the training sigma, so it natively handles larger motions than GN.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple

import jax
import jax.numpy as jnp

from mtf_tpu.ops import interp
from mtf_tpu.ops import warp as W
from mtf_tpu.sm.core import SearchMethod, TrackerState

Array = jax.Array


@dataclass(frozen=True)
class LPParams:
    n_samples: int = 512       # K training perturbations
    max_iters: int = 5
    pix_sigma: float = 4.0     # training motion magnitude (px)
    ssm_sigma: tuple = ()      # explicit per-dof training sigmas
    ridge: float = 1e-3        # lam, relative to mean diag of D D^T
    epsilon: float = 0.01      # corner-change convergence threshold
    n_stages: int = 3          # coarse-to-fine predictor stack: stage i
                               # is trained at sigma * 0.5^i (multi-
                               # predictor cascade of the LP literature)
    seed: int = 0


class LPState(NamedTuple):
    A: Array        # (n_stages, S, N) stacked predictors
    patch0: Array   # (N, C) template


class LP(SearchMethod):
    name = "lp"

    def __init__(self, am, ssm, prm=None, lp: LPParams | None = None):
        super().__init__(am, ssm, prm)
        self.lp = lp or LPParams()

    # -- helpers -------------------------------------------------------
    def _sigma(self, region) -> Array:
        if self.lp.ssm_sigma:
            return jnp.asarray(self.lp.ssm_sigma, jnp.float32)
        scale = region.norm_mat[0, 0]
        return self.ssm.state_sigma_from_pixel_sigma(
            self.lp.pix_sigma / scale, region.base_pts)

    def _patch_at(self, region, s, frame):
        pts_t = self.ssm.warp_pts(s, region.base_pts)
        pts = W.apply_warp(region.norm_mat, pts_t)
        if self.prm.interp.endswith("_mm"):
            # value-only dense-matmul sampling with the static crop —
            # HALF the stage-1 contraction cost of the LK value+grad
            # pass (no dWx matmul), which is the whole point of LP on
            # the MXU: per-iteration cost = one sample + one matvec
            val, _ = interp.sample_dense(frame, pts,
                                         self.prm.interp[:-3],
                                         crop=self.prm.crop,
                                         need_grad=False)
            return val
        return interp.sample(frame, pts, self.prm.interp, self.prm.border)

    def _train_stage(self, region, frame, patch0, sigma, key):
        """One ridge LS solve -> (S, N) predictor (offline, on device)."""
        K, S = self.lp.n_samples, self.ssm.dof
        dps = sigma[None, :] * jax.random.normal(key, (K, S), jnp.float32)

        def diff_of(dp):
            p = self._patch_at(region, dp, frame)
            return (p - patch0).reshape(-1)

        D = jax.lax.map(diff_of, dps, batch_size=min(K, 256)).T  # (N, K)
        # if the live patch equals the template viewed under dp, the
        # correction to apply is dp^-1 — learn the inverses (same
        # convention as the NN dataset, sm/nn.py)
        P = jax.vmap(self.ssm.invert)(dps).T                     # (S, K)
        # dual (kernel) form of the ridge solution — K x K instead of
        # N x N:  P D^T (D D^T + lam I_N)^-1 = P (D^T D + lam I_K)^-1 D^T
        G = D.T @ D                                              # (K, K)
        lam = self.lp.ridge * jnp.trace(G) / K
        X = jnp.linalg.solve(G + lam * jnp.eye(K), P.T)          # (K, S)
        return (D @ X).T                                         # (S, N)

    # -- API -----------------------------------------------------------
    def _init_extra(self, state: TrackerState, frame: Array):
        region = state.region
        patch0 = self._patch_at(region, self.ssm.identity(), frame)
        sigma = self._sigma(region)
        keys = jax.random.split(jax.random.PRNGKey(self.lp.seed),
                                self.lp.n_stages)
        A = jnp.stack([
            self._train_stage(region, frame, patch0,
                              sigma * (0.5 ** i), keys[i])
            for i in range(self.lp.n_stages)])
        return LPState(A=A, patch0=patch0)

    def _update(self, state: TrackerState, frame: Array) -> TrackerState:
        ssm, lp = self.ssm, self.lp
        ls: LPState = state.extra

        def corners_of(s):
            c_t = ssm.warp_pts(s, state.region.base_corners)
            return W.apply_warp(state.region.norm_mat, c_t)

        def stage_iters(s, A_i):
            def body(carry):
                s, it, done = carry
                patch = self._patch_at(state.region, s, frame)
                d = (patch - ls.patch0).reshape(-1)
                dp = A_i @ d                                  # (S,)
                s_new = ssm.compositional_update(s, dp)
                change = jnp.max(jnp.linalg.norm(
                    corners_of(s_new) - corners_of(s), axis=-1))
                return s_new, it + 1, change < lp.epsilon

            def cond(carry):
                _, it, done = carry
                return jnp.logical_and(it < lp.max_iters,
                                       jnp.logical_not(done))

            s_out, _, _ = jax.lax.while_loop(
                cond, body, (s, jnp.zeros((), jnp.int32),
                             jnp.asarray(False)))
            return s_out

        s = state.ssm_state
        for i in range(lp.n_stages):          # coarse -> fine predictors
            s = stage_iters(s, ls.A[i])
        new_state = state._replace(ssm_state=s)
        patch = self._patch_at(state.region, s, frame)
        return new_state._replace(
            am_state=self.am.update_model(state.am_state, patch))
