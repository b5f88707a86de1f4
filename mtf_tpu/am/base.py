"""Appearance Model (AM) base machinery.

TPU-native re-design of the reference AM layer
(`/root/reference/AM/include/mtf/AM/AppearanceModel.h:63-396`, ImageBase.h).

The key departure from the reference: an AM here is *one pure differentiable
similarity function* ``f(state, It) -> scalar`` (optionally with photometric
parameters via an illumination model). Every derived quantity the reference
hand-codes per AM (~13 kLoC: df_dI0/df_dIt, cmpt*Jacobian,
cmptInit/Curr/SelfHessian — AppearanceModel.h:142-219) is obtained here
generically and exactly via JAX AD:

    gradient        jax.grad(f) w.r.t. It
    GN "self" Hessian   J^T (hvp of f at a perfect match) J
    exact Hessian   jax.hessian of the SM's composed energy

AM state is a small pytree (template features, photometric params, per-AM
extras like PCA bases); `f` recomputes any data-dependent internals (SCV
remaps, MI histograms) inside itself, so there is no hidden mutable state.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

Array = jax.Array


class AMState(NamedTuple):
    """Pytree carried by every tracker: the appearance side of the state.

    template: processed template patch features (N, C) (reference I0)
    p_am:     photometric/illumination params (P,) (reference p_am,
              AppearanceModel.h:228-259); empty for plain AMs
    extra:    per-AM pytree (PCA basis, learning buffers, ...)
    """
    template: Array
    p_am: Array
    extra: Any = ()


@dataclass(frozen=True)
class AMParams:
    """Shared AM configuration (reference AMParams.h:13-40)."""
    resx: int = 50
    resy: int = 50
    n_channels: int = 1
    likelihood_alpha: float = 50.0
    likelihood_beta: float = 0.0
    pix_min: float = 0.0
    pix_max: float = 255.0
    n_bins: int = 8            # MI/CCRE/KLD/SCV histograms
    pre_seed: float = 1.0
    learning_rate: float = 0.0  # template forgetting (0 = no update)
    # subsidiary knobs used by specific AMs
    extra: dict = field(default_factory=dict)


class IlluminationModel:
    """Photometric map g(I, p) applied to the candidate patch before
    similarity (reference IlluminationModel.h:30-96). Pure + static."""

    name = "none"
    n_params = 0

    def apply(self, patch: Array, p: Array) -> Array:
        return patch

    def identity_params(self, dtype=jnp.float32) -> Array:
        return jnp.zeros((self.n_params,), dtype)

    def invert_params(self, p: Array) -> Array:
        return -p


class AM:
    """Base appearance model. Subclasses implement `_similarity` on
    *illumination-corrected* patches; everything else is generic."""

    name = "base"

    def __init__(self, params: AMParams | None = None,
                 ilm: IlluminationModel | None = None):
        self.prm = params or AMParams()
        self.ilm = ilm or IlluminationModel()

    # ---- to be provided by subclasses --------------------------------
    def _similarity(self, state: AMState, patch: Array) -> Array:
        """f(template, patch) with patch already photometrically corrected."""
        raise NotImplementedError

    def _init_extra(self, patch: Array):
        return ()

    # ---- public API ----------------------------------------------------
    @property
    def n_pix(self) -> int:
        return self.prm.resx * self.prm.resy

    def init(self, patch0: Array) -> AMState:
        """Template initialization (`initializePixVals`/`initializeSimilarity`
        analog, AppearanceModel.h:96-123)."""
        return AMState(template=patch0,
                       p_am=self.ilm.identity_params(patch0.dtype),
                       extra=self._init_extra(patch0))

    def f(self, state: AMState, patch: Array) -> Array:
        """Similarity of candidate patch vs state (higher = better match).

        Differentiable in `patch` and `state.p_am` — the entire reference
        gradient API (updateSimilarity/updateCurrGrad/cmpt*Jacobian) derives
        from this one function by AD.
        """
        return self._similarity(state, self.ilm.apply(patch, state.p_am))

    def f_with_pam(self, state: AMState, patch: Array, p_am: Array) -> Array:
        """f with explicit photometric params (joint GN over [dp_ssm, dp_am])."""
        return self._similarity(state, self.ilm.apply(patch, p_am))

    def grad(self, state: AMState, patch: Array) -> Array:
        """df/dIt, shape of patch (reference `updateCurrGrad`)."""
        return jax.grad(lambda p: self.f(state, p))(patch)

    def f_corrected(self, state: AMState, corrected: Array) -> Array:
        """Similarity on an already illumination-corrected patch (the SM
        layer differentiates warp+ILM jointly through one patch function)."""
        return self._similarity(state, corrected)

    def grad_corrected(self, state: AMState, corrected: Array) -> Array:
        return jax.grad(lambda p: self._similarity(state, p))(corrected)

    def grad_template(self, state: AMState, corrected: Array) -> Array:
        """df/dI0 — derivative w.r.t. the (raw) template, re-deriving any
        processed template internals (reference `updateInitGrad` /
        `cmptInitJacobian`, AppearanceModel.h:142-156). Requires AMState
        templates to be stored raw (invariant of this codebase)."""
        def f_of_t(t):
            st2 = self.init(t)._replace(p_am=state.p_am)
            return self._similarity(st2, corrected)
        return jax.grad(f_of_t)(state.template)

    def update_state(self, state: AMState, dp_am: Array) -> AMState:
        """p_am <- p_am + dp_am (reference `updateState`)."""
        if self.ilm.n_params == 0:
            return state
        return state._replace(p_am=state.p_am + dp_am)

    @property
    def needs_update_model(self) -> bool:
        """False when update_model is a no-op — lets hot paths skip
        sampling the final patch entirely (a measurable per-update cost
        at fleet scale)."""
        return self.prm.learning_rate > 0.0

    def update_model(self, state: AMState, patch: Array) -> AMState:
        """Online template learning (`updateModel`, AppearanceModel.h:261).
        Default: exponential forgetting on the raw template."""
        lr = self.prm.learning_rate
        if lr <= 0.0:
            return state
        return state._replace(
            template=(1.0 - lr) * state.template + lr * patch)

    def likelihood(self, state: AMState, patch: Array) -> Array:
        """Sampler-facing likelihood (`getLikelihood`, AppearanceModel.h:84).
        Default: exp(alpha * f) — subclasses override with reference forms."""
        return jnp.exp(self.prm.likelihood_alpha * self.f(state, patch))

    def dist_feat(self, patch: Array) -> Array:
        """Feature vector for NN-search distance (`updateDistFeat`,
        AppearanceModel.h:263-297). Default: flattened raw patch (SSD/L2)."""
        return patch.reshape(-1)

    def self_state(self, patch: Array, p_am: Array) -> AMState:
        """State treating `patch` as the template (for Current-Self Hessians).
        Uses init() so per-AM template processing applies."""
        return self.init(patch)._replace(p_am=p_am)


# ---------------------------------------------------------------------------
# Generic derivative contraction helpers (replace AppearanceModel.h:170-219)
# ---------------------------------------------------------------------------

def jacobian(am: AM, state: AMState, patch: Array, J_pix: Array) -> Array:
    """1xS similarity Jacobian: (df/dIt) . dIt/dp (`cmptCurrJacobian`)."""
    g = am.grad(state, patch).reshape(-1)
    return g @ J_pix


def gn_hessian(am: AM, state: AMState, patch: Array, J_pix: Array) -> Array:
    """S x S Gauss-Newton-style Hessian J^T (d2f/dI2) J at the *actual*
    current patch (`cmptCurrHessian` first-order form)."""
    shape = patch.shape

    def g(p_flat):
        return jax.grad(lambda q: am.f(state, q.reshape(shape)))(
            p_flat.reshape(shape)).reshape(-1)

    p0 = patch.reshape(-1)

    def hvp(v):
        return jax.jvp(g, (p0,), (v,))[1]

    cols = jax.vmap(hvp, in_axes=1, out_axes=1)(J_pix)  # (NC, S)
    return J_pix.T @ cols


def self_hessian(am: AM, patch: Array, p_am: Array, J_pix: Array) -> Array:
    """S x S 'self' Hessian: d2f/dI2 evaluated at a perfect match
    (template == patch), contracted with J (`cmptSelfHessian`,
    AppearanceModel.h:189-219 — the preferred LK Hessian in the reference)."""
    st = am.self_state(patch, p_am)
    return gn_hessian(am, st, patch, J_pix)
