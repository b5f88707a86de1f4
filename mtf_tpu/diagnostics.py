"""Diagnostics: derivative sweeps of any AM x SSM pair.

Re-designs the reference's de-facto unit-test machinery
(`/root/reference/Diagnostics/src/Diagnostics.cc`, driven by
`Examples/cpp/diagnoseMTF.cc:37,309-360`; SURVEY.md §4.1): sweep the
similarity along each state dimension, compare analytic (AD) Jacobians and
Hessians against central finite differences, and assert agreement within a
validation precision.

The reference distinguishes 13 analytic data types (ADT: Norm, Likelihood,
StdJac, ESMJac, 8 Hessian flavors...) because every AM hand-derives its
calculus; here similarity/grad/Hessian all flow from one differentiable
energy, so the sweep validates that energy directly:

    E(dp) = f(am_state, sample(frame, warp(state ∘ dp, pts)))

Outputs per-dimension curves (for plotting / `graphUtils` parity) and a
validation report dict.
"""
from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

import jax
import jax.numpy as jnp

from mtf_tpu.ops import interp
from mtf_tpu.ops import warp as W

Array = jax.Array


@dataclass
class DiagnosticsReport:
    am: str
    ssm: str
    sweeps: dict = field(default_factory=dict)     # dim -> (xs, f(xs))
    jac_analytic: np.ndarray | None = None
    jac_numeric: np.ndarray | None = None
    hess_analytic: np.ndarray | None = None
    hess_numeric: np.ndarray | None = None
    max_jac_err: float = 0.0
    max_hess_err: float = 0.0
    ok: bool = True


class Diagnostics:
    """Sweep/validate one AM x SSM pair on one frame + region.

    `validation_prec` mirrors `enable_validation` / `validation_prec`
    (Diagnostics.cc:131-200).
    """

    def __init__(self, am, ssm, resx: int | None = None,
                 resy: int | None = None, interp_kind: str = "cubic_bspl",
                 border: str = "replicate"):
        # default interp is the C2 cubic B-spline: finite-difference
        # Hessians only converge for a twice-differentiable interpolant
        # (Catmull-Rom is C1; its interpolant Hessian is discontinuous
        # at cell boundaries, so AD-vs-FD comparison is meaningless there)
        self.am = am
        self.ssm = ssm
        self.resx = resx or am.prm.resx
        self.resy = resy or am.prm.resy
        self.interp_kind = interp_kind
        self.border = border

    def _energy_fn(self, frame: Array, corners: Array,
                   data_type: str = "norm"):
        from mtf_tpu.sm.core import make_region
        region = make_region(jnp.asarray(corners, jnp.float32),
                             self.resx, self.resy)
        pts0 = W.apply_warp(region.norm_mat, region.base_pts)
        patch0 = interp.sample(jnp.asarray(frame), pts0,
                               self.interp_kind, self.border)
        am_state = self.am.init(patch0)
        feat0 = (self.am.dist_feat(patch0) if data_type == "feat_norm"
                 else None)

        def E(dp):
            pts_t = self.ssm.warp_pts_from(self.ssm.identity(), dp,
                                           region.base_pts)
            pts = W.apply_warp(region.norm_mat, pts_t)
            patch = interp.sample(jnp.asarray(frame), pts,
                                  self.interp_kind, self.border)
            if data_type == "norm":
                return self.am.f(am_state, patch)
            if data_type == "likelihood":
                return self.am.likelihood(am_state, patch)
            if data_type == "feat_norm":
                return jnp.linalg.norm(self.am.dist_feat(patch) - feat0)
            raise ValueError(f"unknown data_type {data_type!r}")

        return E

    def sweep(self, frame: Array, corners: Array, span: float = 0.1,
              n_pts: int = 21, dims=None, data_type: str = "norm") -> dict:
        """Curves along each state dim.

        `data_type` mirrors the reference's analytic-data-type selector
        (ADT, Diagnostics.h:32-39): `norm` = similarity f, `likelihood` =
        the PF measurement density, `feat_norm` = L2 norm of the
        NN distance-feature difference from the template's.
        """
        E = self._energy_fn(frame, corners, data_type)
        Ev = jax.jit(jax.vmap(E))
        dims = range(self.ssm.dof) if dims is None else dims
        out = {}
        xs = np.linspace(-span, span, n_pts).astype(np.float32)
        for d in dims:
            dps = np.zeros((n_pts, self.ssm.dof), np.float32)
            dps[:, d] = xs
            out[d] = (xs, np.asarray(Ev(jnp.asarray(dps))))
        return out

    def validate(self, frame: Array, corners: Array, eps: float = 1e-3,
                 prec: float = 2.5e-2, hess_prec: float = 1e-1,
                 span: float = 0.1, n_pts: int = 11) -> DiagnosticsReport:
        """AD Jacobian/Hessian vs central finite differences
        (NDT::Jacobian/Hessian analog, Diagnostics.cc sweep + compare)."""
        E0 = self._energy_fn(frame, corners)
        S = self.ssm.dof
        # validate off-optimum: at the init state the gradient is exactly
        # zero (template == patch), so an FD quotient there is pure
        # truncation noise; perturb by a small seeded offset first
        rng = np.random.default_rng(0)
        dp0 = jnp.asarray(
            0.02 * rng.standard_normal(S) / np.sqrt(S), jnp.float32)
        E = lambda dp: E0(dp0 + dp)  # noqa: E731
        z = jnp.zeros((S,), jnp.float32)

        jac = np.asarray(jax.jit(jax.grad(E))(z))
        hess = np.asarray(jax.jit(jax.hessian(E))(z))

        Ej = jax.jit(E)
        jac_fd = np.zeros(S, np.float64)
        for i in range(S):
            e = np.zeros(S, np.float32)
            e[i] = eps
            jac_fd[i] = (float(Ej(jnp.asarray(e))) -
                         float(Ej(jnp.asarray(-e)))) / (2 * eps)
        gradE = jax.jit(jax.grad(E))
        hess_fd = np.zeros((S, S), np.float64)
        for i in range(S):
            e = np.zeros(S, np.float32)
            e[i] = eps
            hess_fd[:, i] = (np.asarray(gradE(jnp.asarray(e))) -
                             np.asarray(gradE(jnp.asarray(-e)))) / (2 * eps)

        scale_j = max(1.0, float(np.abs(jac_fd).max()))
        scale_h = max(1.0, float(np.abs(hess_fd).max()))
        max_jac_err = float(np.abs(jac - jac_fd).max()) / scale_j
        max_hess_err = float(np.abs(hess - hess_fd).max()) / scale_h

        return DiagnosticsReport(
            am=type(self.am).__name__, ssm=self.ssm.name,
            sweeps=self.sweep(frame, corners, span, n_pts),
            jac_analytic=jac, jac_numeric=jac_fd,
            hess_analytic=hess, hess_numeric=hess_fd,
            max_jac_err=max_jac_err, max_hess_err=max_hess_err,
            ok=(max_jac_err < prec and max_hess_err < hess_prec))

    def validate_chain(self, frame: Array, corners: Array,
                       prec: float = 1e-2) -> dict:
        """Validate the PRODUCTION Jacobian path against AD-of-the-energy.

        The LK hot loop computes the energy gradient through the
        hand-fused chain `df/dpatch · (∇I · dW/dp)`
        (LKBase._patch_and_jac) rather than AD through the sampler —
        the analog of the reference's hand-derived StdJac/ESMJac/
        Hessian-flavor ADTs (Diagnostics.h:32-39), and like them it can
        silently diverge from the true derivative. This check compares:
          std_jac   : chain gradient vs jax.grad(E)      (must match)
          esm_jac   : at the template, mean-of-Jacobians == std chain
          gn_hess   : chain GN Hessian vs AD-of-chain GN (must match);
                      symmetry is asserted as a sanity invariant
        """
        from mtf_tpu.am import gn_hessian
        from mtf_tpu.sm.core import SMParams, make_region
        from mtf_tpu.sm.lk import FCLK

        prm = SMParams(interp=self.interp_kind, border=self.border)
        sm = FCLK(self.am, self.ssm, prm)
        region = make_region(jnp.asarray(corners, jnp.float32),
                             self.resx, self.resy)
        pts0 = W.apply_warp(region.norm_mat, region.base_pts)
        patch0 = interp.sample(jnp.asarray(frame), pts0,
                               self.interp_kind, self.border)
        am_state = self.am.init(patch0)
        S = self.ssm.dof
        rng = np.random.default_rng(0)
        dp0 = jnp.asarray(0.02 * rng.standard_normal(S) / np.sqrt(S),
                          jnp.float32)
        s0 = self.ssm.compositional_update(self.ssm.identity(), dp0)
        p_am = self.am.ilm.identity_params()

        # production chain at state s0
        patch, J = sm._patch_and_jac(region, s0, p_am, jnp.asarray(frame))
        j_chain = np.asarray(
            self.am.grad_corrected(am_state, patch).reshape(-1) @ J)[:S]

        # AD reference: d/ddp f(am_state, sample(warp(s0 o dp)))
        fn = sm._patch_fn(region, s0, p_am, jnp.asarray(frame))
        E = lambda q: self.am.f_corrected(am_state, fn(q))  # noqa: E731
        j_ad = np.asarray(jax.grad(E)(jnp.zeros(sm._q_dim,
                                                jnp.float32)))[:S]
        scale = max(1.0, float(np.abs(j_ad).max()))
        std_jac_err = float(np.abs(j_chain - j_ad).max()) / scale

        # ESM Jacobian at the template: J0 == Jt => mean == std
        patch_t, Jt = sm._patch_and_jac(
            region, self.ssm.identity(), p_am, jnp.asarray(frame))
        J0 = sm._template_patch_fn(region, jnp.asarray(frame))
        J0 = jax.jacfwd(J0)(jnp.zeros(sm._q_dim, jnp.float32))
        J0 = J0.reshape(-1, sm._q_dim)
        Jm = 0.5 * (np.asarray(J0) + np.asarray(Jt))
        esm_jac_err = float(np.abs(Jm - np.asarray(Jt)).max()) / max(
            1.0, float(np.abs(Jt).max()))

        # GN Hessian: chain contraction vs the AM helper on the same J
        H_chain = np.asarray(sm._hess_contract(am_state, patch, J))
        H_ref = np.asarray(gn_hessian(self.am, am_state, patch, J))
        gn_hess_err = float(np.abs(H_chain - H_ref).max()) / max(
            1.0, float(np.abs(H_ref).max()))
        sym_err = float(np.abs(H_chain - H_chain.T).max()) / max(
            1.0, float(np.abs(H_chain).max()))

        return {
            "std_jac_err": std_jac_err,
            "esm_jac_err": esm_jac_err,
            "gn_hess_err": gn_hess_err,
            "hess_sym_err": sym_err,
            "ok": bool(std_jac_err < prec and esm_jac_err < prec
                       and gn_hess_err < prec and sym_err < prec),
        }

    def write_curves(self, report: DiagnosticsReport, out_dir: str = "log"):
        """Dump sweep curves in the reference's data-file style
        (graphUtils/`diagnoseMTF` artifacts)."""
        import os
        os.makedirs(out_dir, exist_ok=True)
        base = f"diag_{report.am.lower()}_{report.ssm}"
        for d, (xs, ys) in report.sweeps.items():
            np.savetxt(os.path.join(out_dir, f"{base}_dim{d}.txt"),
                       np.stack([xs, ys], axis=1), fmt="%.6e")
        return base

    def plot_curves(self, report: DiagnosticsReport, out_path: str):
        """Render the per-dimension similarity sweeps to one figure
        (`graphUtils` analog: the curves `diagnoseMTF` shows live)."""
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        dims = sorted(report.sweeps)
        ncol = min(4, max(1, len(dims)))
        nrow = (len(dims) + ncol - 1) // ncol
        fig, axes = plt.subplots(nrow, ncol, squeeze=False,
                                 figsize=(3.2 * ncol, 2.6 * nrow))
        for i, d in enumerate(dims):
            ax = axes[i // ncol][i % ncol]
            xs, ys = report.sweeps[d]
            ax.plot(xs, ys, lw=1.2)
            ax.axvline(0.0, color="0.7", lw=0.6)
            ax.set_title(f"dim {d}", fontsize=9)
            ax.tick_params(labelsize=7)
        for j in range(len(dims), nrow * ncol):
            axes[j // ncol][j % ncol].axis("off")
        fig.suptitle(f"{report.am} x {report.ssm} similarity sweeps",
                     fontsize=11)
        fig.tight_layout()
        fig.savefig(out_path, dpi=110)
        plt.close(fig)
        return out_path
