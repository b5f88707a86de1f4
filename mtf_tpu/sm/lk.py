"""Lucas-Kanade search-method family: FCLK, ICLK, ESM, AESM, FALK, IALK, FCSD.

TPU-native re-design of the reference gradient-descent SMs
(`/root/reference/SM/src/NT/{FCLK,ICLK,ESM,AESM,FALK,IALK,FCSD}.cc`,
~2 kLoC each family member; hot loop documented in SURVEY.md §3.2).

One shared machinery replaces them all:
  * the candidate patch is a *pure differentiable function* of the update
    vector q = [dp_ssm, dp_am]: warp (generator algebra, no from_matrix in
    the differentiation path) -> sample (custom-JVP interp) -> ILM;
  * jacfwd of that function gives the augmented pixel Jacobian the
    reference hand-chains per SSM (Homography.cc:157-359), for every AM x
    SSM x ILM combination;
  * Hessian flavors (InitialSelf / CurrentSelf / Std / full second-order)
    are AD contractions chosen by `SMParams.hess_type`;
  * the iteration is a `lax.while_loop` with optional Levenberg-Marquardt
    accept/reject damping (NT/FCLK.cc:193-217) as jit-friendly lax.cond.

The whole update compiles to one XLA computation: gathers + (N,Q) matmuls
+ a QxQ solve, batched/vmappable for grids, particles and tracker fleets.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from mtf_tpu.am.base import AMState
from mtf_tpu.ops import interp
from mtf_tpu.ops import warp as W
from mtf_tpu.ops.linalg import neg_def_solve
from mtf_tpu.sm.core import SearchMethod, TrackerState

Array = jax.Array


def _tpu_compute() -> bool:
    """True when traced computations will actually run on TPU.

    `jax.default_backend()` ignores `jax.default_device(cpu)` /
    `jax.config.jax_default_device` (jax 0.9), so a TPU-attached process
    running a CPU-placed accuracy leg must NOT dispatch Mosaic kernels.
    Honor the configured default device first, then the backend."""
    dev = jax.config.jax_default_device
    if dev is not None:
        platform = getattr(dev, "platform", dev)
        return str(platform).lower().startswith("tpu")
    return jax.default_backend() == "tpu"


class LKCache(NamedTuple):
    """Per-tracker cached init quantities (ICLK/ESM hoisting,
    NT/ICLK.cc:initialize)."""
    J0: Array       # (NC, S) template pixel Jacobian at identity
    H0: Array       # (Q, Q) initial self Hessian
    coarse: tuple = ()  # per-coarse-phase (templ_s, H0_s): template and
                        # self0 Hessian sampled from the BLURRED init
                        # frame at the decimated grid
                        # (SMParams.coarse_pt_iters, fused path only).
                        # Both sides of the coarse SSD share the same
                        # pixel-unit binomial kernel, so the coarse
                        # optimum coincides with the full one.


class _LKCarry(NamedTuple):
    ssm_state: Array
    p_am: Array
    it: Array
    done: Array
    lm_delta: Array
    f_prev: Array


class LKBase(SearchMethod):
    """Shared LK machinery; subclasses pick Jacobian source + update rule."""

    compositional = True    # False -> additive (FALK/IALK)
    inverse = False         # True -> template-side Jacobian, inverted update
    use_esm_jac = False     # True -> mean of init+curr Jacobians

    # -- patch-as-function-of-update ---------------------------------
    def _patch_fn(self, region, ssm_state, p_am, frame, offset=None):
        """Returns q -> illumination-corrected patch (N, C),
        q = [dp_ssm, dp_am]. The warp Jacobian at q=0 equals the
        generator-basis chain the reference uses (SURVEY.md §3.2).

        `offset`: (2,) crop origin when `frame` is a pre-cropped window
        (the per-update hoisted crop, see _update)."""
        am, ssm, prm = self.am, self.ssm, self.prm
        S = ssm.dof

        def fn(q):
            dp, dpam = q[:S], q[S:]
            pts_t = ssm.warp_pts_from(ssm_state, dp, region.base_pts,
                                      self.compositional)
            pts = W.apply_warp(region.norm_mat, pts_t)
            if offset is not None:
                pts = pts - offset
            patch = interp.sample(frame, pts, prm.interp, prm.border)
            return am.ilm.apply(patch, p_am + dpam)

        return fn

    def _template_patch_fn(self, region, frame):
        """q -> template-side patch on the *init* frame (ICLK/ESM J0)."""
        am, ssm, prm = self.am, self.ssm, self.prm
        S = ssm.dof

        def fn(q):
            dp = q[:S]
            pts_t = ssm.warp_pts_from(ssm.identity(), dp, region.base_pts,
                                      self.compositional)
            pts = W.apply_warp(region.norm_mat, pts_t)
            return interp.sample(frame, pts, prm.interp, prm.border)

        return fn

    @property
    def _q_dim(self):
        return self.ssm.dof + self.am.ilm.n_params

    def _jac(self, fn, q_dim):
        """(NC, q_dim) Jacobian of a patch function at 0 (AD fallback)."""
        J = jax.jacfwd(fn)(jnp.zeros((q_dim,), jnp.float32))
        return J.reshape(-1, q_dim)

    def _patch_and_jac(self, region, ssm_state, p_am, frame, offset=None):
        """One-gather Jacobian chain -> (corrected patch (N,C), J (NC,Q)).

        jacfwd through the sampler costs Q tangent gather passes; the
        reference's chain dI/dx . dW/dp (SURVEY.md §3.2; Homography.cc
        cmptWarpedPixJacobian) needs ONE fused value+gradient gather plus
        a cheap warp-algebra jacfwd and an (N,2,S) contraction — the
        gathers are the TPU bottleneck, so this is the hot-path form.
        """
        am, ssm, prm = self.am, self.ssm, self.prm
        S, P = ssm.dof, am.ilm.n_params

        def pts_fn(dp):
            pts_t = ssm.warp_pts_from(ssm_state, dp, region.base_pts,
                                      self.compositional)
            return W.apply_warp(region.norm_mat, pts_t)

        zero = jnp.zeros((S,), jnp.float32)
        pts = pts_fn(zero)
        Jpts = jax.jacfwd(pts_fn)(zero)         # (N, 2, S): no gathers
        crop_arg = prm.crop
        if offset is not None:
            # frame is already the hoisted per-update crop window
            pts = pts - offset
            crop_arg = None
        # NOTE r4: the standalone parts-sampling Pallas kernel that used
        # to serve `use_pallas=True` on non-fusable configs was DELETED
        # after its settling measurement (VERDICT r3 #10): esm/ncc fleet
        # at B=256 read 1,260 fps vs 9,677 on the XLA dense path
        # (log/ab_parts_r4.log, 7.7x slower; corner diff 0.06 px).
        # `use_pallas` now only selects the chain-fused kernel for the
        # fusable FCLK/SSD family; everything else takes XLA dense.
        if prm.interp.endswith("_mm") and prm.crop_blocks is not None:
            patch, grad = interp.sample_dense_blocked(
                frame, pts, prm.interp[:-3], crop=crop_arg or 64,
                grid_shape=(self.am.prm.resy, self.am.prm.resx),
                blocks=tuple(prm.crop_blocks),
                compute_dtype=jnp.bfloat16 if prm.interp_bf16 else None)
        elif prm.interp.endswith("_mm"):
            # NOTE (r2 A/B): consuming sample_dense_parts and building
            # J = dx*Jx + dy*Jy here measured 9% SLOWER than the stacked
            # grad + einsum (13.2k vs 14.5k fps) — XLA's fusion of the
            # stacked form beats the hand-unstacked broadcast chain.
            patch, grad = interp.sample_dense(
                frame, pts, prm.interp[:-3], crop=crop_arg,
                compute_dtype=jnp.bfloat16 if prm.interp_bf16 else None,
                precision=(jax.lax.Precision.HIGHEST
                           if prm.interp_precision == "highest" else None))
        else:
            patch, grad = interp.sample_with_grad(frame, pts, prm.interp,
                                                  prm.border)
        Jp = jnp.einsum("ncd,nds->ncs", grad, Jpts)      # (N, C, S)
        N, C = patch.shape
        if P == 0:
            return patch, Jp.reshape(N * C, S)
        # chain through the illumination model (dILM/dpatch is cheap
        # elementwise math; dILM/dp gives the photometric columns)
        corrected = am.ilm.apply(patch, p_am)
        ilm_jvp = lambda t: jax.jvp(  # noqa: E731
            lambda q: am.ilm.apply(q, p_am), (patch,), (t,))[1]
        J_ssm = jax.vmap(ilm_jvp, in_axes=2, out_axes=2)(Jp)
        J_ilm = jax.jacfwd(lambda pam: am.ilm.apply(patch, pam))(p_am)
        return corrected, jnp.concatenate(
            [J_ssm.reshape(N * C, S), J_ilm.reshape(N * C, P)], axis=1)

    def _hess_contract(self, am_state: AMState, at_patch: Array, J: Array):
        """J^T (d2 similarity / d corrected-patch^2) J via S hvps."""
        shape = at_patch.shape
        p0 = at_patch.reshape(-1)

        def g(pf):
            return self.am.grad_corrected(
                am_state, pf.reshape(shape)).reshape(-1)

        def hvp(v):
            return jax.jvp(g, (p0,), (v,))[1]

        cols = jax.vmap(hvp, in_axes=1, out_axes=1)(J)
        return J.T @ cols

    @staticmethod
    def _coarse_idx(ry: int, rx: int, stride: int):
        """Row-major indices of the stride-decimated (ry, rx) point
        grid (static)."""
        r = np.arange(0, ry, stride)
        c = np.arange(0, rx, stride)
        return jnp.asarray((r[:, None] * rx + c[None, :]).ravel())

    @staticmethod
    def _binomial(stride: int):
        """Binomial low-pass taps (STATIC numpy — must never enter a
        trace) for a stride-decimated phase (sigma ~ stride/2)."""
        k = np.array([1.0], np.float64)
        for _ in range(2 * (stride - 1)):
            k = np.convolve(k, [0.5, 0.5])
        return k.astype(np.float32)

    @classmethod
    def _blur2(cls, img: Array, stride: int) -> Array:
        """Separable edge-padded binomial blur (2D or (H, W, C), any
        float dtype). Static shift-adds, NOT convolve: the slices fuse
        into one elementwise chain (a vmapped convolve lowers to a
        serial loop and measured ~1.5x on the whole fleet update)."""
        if stride <= 1:
            return img
        k = np.asarray(cls._binomial(stride), np.float32)
        r = (k.shape[0] - 1) // 2
        h, w = img.shape[0], img.shape[1]
        pad = ((r, r), (r, r)) + ((0, 0),) * (img.ndim - 2)
        f = jnp.pad(img.astype(jnp.float32), pad, mode="edge")
        fh = sum(float(k[i]) * f[:, i:i + w] for i in range(len(k)))
        fv = sum(float(k[j]) * fh[j:j + h] for j in range(len(k)))
        return fv.astype(img.dtype)

    # -- init ----------------------------------------------------------
    def _init_extra(self, state: TrackerState, frame: Array):
        # template-side patch + Jacobian at identity warp / identity ILM
        # (ICLK/ESM hoisting, NT/ICLK.cc:initialize)
        patch0, J_full = self._patch_and_jac(
            state.region, self.ssm.identity(),
            self.am.ilm.identity_params(), frame)
        H0 = self._hess_contract(state.am_state, patch0, J_full)
        S = self.ssm.dof
        coarse = ()
        if self.prm.coarse_pt_iters:
            # per-phase blurred templates + self0 Hessians + template
            # Jacobians on the decimated grids. Generic over stateless
            # single-channel AMs (r4): the self Hessian comes from
            # _hess_contract on an AM state initialized from the blurred
            # decimated template (for SSD this equals the -J^T J the
            # fused kernel pairs with — f = -||r||^2/2 exactly), and the
            # packed J0_s serves the ICLK/ESM template-Jacobian paths.
            # Cached at init (learning_rate must be 0 or the cached
            # templates would go stale).
            ry, rx = self.am.prm.resy, self.am.prm.resx
            n = state.region.base_pts.shape[0]
            c_ch = patch0.shape[1] if patch0.ndim == 2 else 1
            # r5: multi-channel (MC*) SSD packs ride the same machinery
            # — the blurred decimated template stays (n_dec, C) and the
            # Jacobian row subset expands point indices to the N*C
            # interleaved rows (AM/src/MC*.cc channel semantics)
            mc_pack = (frame.ndim == 3 and self.am.name == "ssd"
                       and c_ch == frame.shape[2])
            if ((c_ch == 1 and frame.ndim == 2 or mc_pack)
                    and n == ry * rx
                    and self.am.ilm.n_params == 0
                    and not self.am.needs_update_model
                    and self.am.prm.learning_rate == 0.0
                    and not self.prm.spi_type
                    and self.prm.hess_type != "std2"):
                packs = []
                for stride, _ in self.prm.coarse_pt_iters:
                    idx = self._coarse_idx(ry, rx, stride)
                    fr_b = self._blur2(frame, stride)
                    p_b, J_b = self._patch_and_jac(
                        state.region, self.ssm.identity(),
                        self.am.ilm.identity_params(), fr_b)
                    rows = (idx if c_ch == 1 else
                            (idx[:, None] * c_ch
                             + jnp.arange(c_ch)[None, :]).ravel())
                    Js = J_b[:, :S][rows]
                    st_s = self.am.init(p_b[idx])
                    H0_s = self._hess_contract(st_s, p_b[idx], Js)
                    templ_s = (p_b.reshape(-1)[idx] if c_ch == 1
                               else p_b[idx])
                    packs.append((templ_s, H0_s, Js))
                coarse = tuple(packs)
        return LKCache(J0=J_full[:, :S], H0=H0, coarse=coarse)

    # -- fused-kernel fast path (FCLK + SSD + self0 + grayscale) --------
    def _fused_ok(self, state: TrackerState, frame: Array) -> bool:
        """True when the whole iteration collapses into the Pallas
        chain kernel (ops/pallas/lk_fused.py): forward compositional,
        SSD or NCC gradient, optional ESM mean Jacobian (J0 passed as a
        kernel constant), cached self0 Hessian (or the kernel's J^T J
        for SSD selft/std), no ILM/SPI, single-channel dense sampling."""
        from mtf_tpu.ssm.base import SSM as _SSMBase
        prm, am = self.prm, self.am
        use_p = (prm.use_pallas or (prm.use_pallas is None
                                    and _tpu_compute()))
        # NCC: moment-form kernel (banded/tiled like SSD, any N); self0
        # uses the cached H0, selft the per-tile-moment closed form; std
        # (template-state Hessian) stays on the generic hvp path
        fuse_am = (am.name == "ssd"
                   or (am.name == "ncc"
                       and prm.hess_type in ("self0", "selft")))
        fuse_jac = (not self.use_esm_jac or prm.jac_type == "original")
        # multi-channel (MC*) frames ride the same kernel with a
        # channel-stacked window and channel-summed g/JtJ (SSD only;
        # ESM's J0 rows interleave N x C and stay generic)
        mc_ok = (frame.ndim == 3 and am.name == "ssd"
                 and not self.use_esm_jac and frame.shape[2] <= 4)
        return (use_p and prm.interp.endswith("_mm")
                and not self.inverse and fuse_jac
                and self.compositional and fuse_am
                and am.ilm.n_params == 0
                and prm.hess_type in ("self0", "selft", "std")
                and not prm.spi_type and state.spi_mask is None
                and (frame.ndim == 2 or mc_ok)
                and prm.crop_blocks is None
                # the fused path re-derives the warp chain as 3x3 matrix
                # algebra; only valid for SSMs with the default matrix
                # warp_pts_from (TPS/Spline override it)
                and type(self.ssm).warp_pts_from is _SSMBase.warp_pts_from)

    def _iteration_fused(self, state: TrackerState, frame: Array,
                         carry: _LKCarry, offset=None, fenv=None):
        """Chain-fused iteration: ONLY the 3x3 warp algebra stays in XLA
        (M0 = norm ∘ W(p) and the per-generator products M0 G_s); the
        kernel projects the base points, builds the quotient-rule warp
        Jacobian, samples, and reduces g / J^T J entirely in VMEM
        (ops/pallas/lk_fused.py:lk_fused_chain). The previous design fed
        precomputed (2S, N) Jacobians and measured ~1.2 ms/iter of XLA
        glue at B=256 fleet scale just assembling them."""
        from mtf_tpu.ops.pallas.lk_fused import lk_fused_chain
        ssm, prm, am = self.ssm, self.prm, self.am
        S = ssm.dof
        region = state.region
        n = region.base_pts.shape[0]
        # fenv = (ph, templ, H0, blur, j0) is loop-invariant: _update
        # precomputes it outside the iteration loop (and swaps in
        # decimated packs during coarse_pt_iters phases); rebuilt only
        # on direct calls
        ph, templ_ov, h0_ov, blur, j0 = (fenv if fenv is not None
                                         else (None,) * 5)
        if ph is None:
            ph = jnp.concatenate(
                [region.base_pts.T, jnp.ones((1, n), jnp.float32)])  # (3, N)
            if self.use_esm_jac:
                j0 = state.extra.J0.T                            # (S, N)
        # precision HIGHEST: norm_mat carries image-scale translation
        # (bf16 operand rounding = up to 2 px ulp — the r4 GT audit's
        # ~1 px on-chip bias came from default-precision warp algebra)
        M0 = jnp.matmul(region.norm_mat, ssm.to_matrix(carry.ssm_state),
                        precision=jax.lax.Precision.HIGHEST)
        frame_w = frame
        if offset is not None:
            # crop hoisted by _update: shift the warp into window coords
            # (rows 0/1 minus offset*row2 — arithmetic, not .at[] DUS)
            offs3 = jnp.concatenate([offset,
                                     jnp.zeros((1,), offset.dtype)])
            M0 = M0 - offs3[:, None] * M0[2][None, :]
        elif prm.crop is not None and (prm.crop < frame.shape[0]
                                       or prm.crop < frame.shape[1]):
            # direct (non-hoisted) call: window from the warped corners
            h, w = frame.shape[0], frame.shape[1]
            hc, wc = min(prm.crop, h), min(prm.crop, w)
            ci = W.apply_warp(M0, region.base_corners)          # (4, 2)
            x0 = jnp.clip(jnp.floor(jnp.min(ci[:, 0])) - 2.0,
                          0.0, float(w - wc))
            y0 = jnp.clip(jnp.floor(jnp.min(ci[:, 1])) - 2.0,
                          0.0, float(h - hc))
            starts = (y0.astype(jnp.int32), x0.astype(jnp.int32))
            if frame.ndim == 3:
                frame_w = jax.lax.dynamic_slice(
                    frame, starts + (jnp.zeros((), jnp.int32),),
                    (hc, wc, frame.shape[2]))
            else:
                frame_w = jax.lax.dynamic_slice(frame, starts, (hc, wc))
            offs3 = jnp.stack([x0, y0, jnp.zeros((), x0.dtype)])
            M0 = M0 - offs3[:, None] * M0[2][None, :]
        n_ch = 1
        if frame_w.ndim == 3:
            # MC window: channel-stacked rows (C*Hc, Wc); loop-invariant,
            # so XLA hoists the transpose out of the iteration loop
            n_ch = frame_w.shape[2]
            frame_w = jnp.transpose(frame_w, (2, 0, 1)).reshape(
                n_ch * frame_w.shape[0], frame_w.shape[1])
        if templ_ov is not None:
            templ = templ_ov
        elif am.name == "ncc":
            # the kernel's NCC mode consumes the centered UNIT template
            templ = state.am_state.extra[0].reshape(-1)
        elif n_ch > 1:
            templ = state.am_state.template.T                # (C, N)
        else:
            templ = state.am_state.template.reshape(-1)
        val, j, jtj = lk_fused_chain(frame_w, M0, ssm.generators, ph,
                                     templ, prm.interp[:-3],
                                     interpret=not _tpu_compute(),
                                     blur=int(blur or 0),
                                     am=am.name, j0=j0, channels=n_ch)
        # SSD: selft == std == -J^T J at the current J (d2f/dI2 = -I;
        # with the ESM mean Jacobian jtj is the ESM normal matrix,
        # matching the generic path's J_h = J_esm); self0 is the cached
        # template-J Hessian. NCC is gated to self0 in _fused_ok.
        if prm.hess_type == "self0":
            H = h0_ov if h0_ov is not None else state.extra.H0
        else:
            H = -jtj
        damp = carry.lm_delta if prm.enable_lm else 0.0
        Hd = H - damp * jnp.diag(jnp.abs(jnp.diag(H))) \
               - 1e-7 * jnp.eye(S, dtype=H.dtype)
        dq = neg_def_solve(Hd, j)
        return dq, (val.T if n_ch > 1 else val[:, None]), j

    # -- one GN/LM iteration -------------------------------------------
    def _iteration(self, state: TrackerState, frame: Array, carry: _LKCarry,
                   offset=None, fenv=None, phase=None):
        if self._fused_ok(state, frame):
            return self._iteration_fused(state, frame, carry, offset, fenv)
        am, ssm, prm = self.am, self.ssm, self.prm
        S, P = ssm.dof, am.ilm.n_params
        q_dim = S + P
        st0 = state.am_state._replace(p_am=carry.p_am)
        cache: LKCache = state.extra
        region = state.region
        if phase is not None:
            # coarse_pt_iters phase on the GENERIC path (r4): decimated
            # base points, AM state rebuilt from the cached blurred
            # template (stateless AMs only — gated at pack build), and
            # the cached decimated self0 Hessian / template Jacobian
            idx, templ_s, h0s, j0s = phase
            region = region._replace(base_pts=region.base_pts[idx])
            tp = templ_s[:, None] if templ_s.ndim == 1 else templ_s
            st0 = am.init(tp)._replace(p_am=carry.p_am)
            cache = cache._replace(J0=j0s, H0=h0s)

        patch, J = self._patch_and_jac(
            region, carry.ssm_state, carry.p_am, frame, offset)

        # SPI: per-pixel weights gating Jacobian/gradient rows
        # (spiUtils masks; weighted GN solves J^T W^2 J dp = J^T W^2 r)
        mask = None
        if prm.spi_type:
            from mtf_tpu.ops.spi import compute_spi_mask
            mask = compute_spi_mask(
                prm.spi_type, st0.template, patch,
                am.prm.resy, am.prm.resx, prm.spi_thresh)       # (N,)
        if state.spi_mask is not None:
            # external mask (RKLT grid-inlier feedback) composes with any
            # intrinsic SPI criterion
            ext = state.spi_mask.astype(patch.dtype)
            mask = ext if mask is None else mask * ext
        if mask is not None:
            wm = jnp.repeat(mask, patch.size // mask.shape[0])  # (NC,)
            J = J * wm[:, None]
            cache = cache._replace(J0=cache.J0 * wm[:, None])
        else:
            wm = None

        def _mw(g):
            """Gradient rows get the same SPI weight as Jacobian rows so
            j and H are both w^2-weighted (consistent weighted GN)."""
            return g if wm is None else g * wm

        if self.inverse:
            # template-side gradient contracted with cached J0 (ICLK)
            g0 = _mw(am.grad_template(st0, patch).reshape(-1))
            j_ssm = g0 @ cache.J0
            if P > 0:
                gI = _mw(am.grad_corrected(st0, patch).reshape(-1))
                j = jnp.concatenate([j_ssm, gI @ J[:, S:]])
            else:
                j = j_ssm
            J_h = jnp.concatenate(
                [cache.J0, J[:, S:]], axis=1) if P > 0 else cache.J0
        elif self.use_esm_jac:
            J_esm = J.at[:, :S].set(0.5 * (J[:, :S] + cache.J0))
            gI = _mw(am.grad_corrected(st0, patch).reshape(-1))
            if prm.jac_type == "diff_of_jacs":
                g0 = _mw(am.grad_template(st0, patch).reshape(-1))
                j_ssm = 0.5 * (gI @ J[:, :S] + g0 @ cache.J0)
                j = jnp.concatenate([j_ssm, gI @ J[:, S:]]) if P > 0 else j_ssm
            else:
                j = gI @ J_esm
            J_h = J_esm
        else:
            gI = _mw(am.grad_corrected(st0, patch).reshape(-1))
            j = gI @ J
            J_h = J

        # Hessian flavor (ESMParams.h:13-18 analog)
        if prm.hess_type == "self0":
            H = cache.H0
        elif prm.hess_type == "selft":
            st_self = am.self_state(patch, carry.p_am)
            H = self._hess_contract(st_self, patch, J_h)
        elif prm.hess_type == "std":
            H = self._hess_contract(st0, patch, J_h)
        elif prm.hess_type == "std2":
            # full second-order Newton Hessian: AD through the sampler
            # (slow path; kept for the reference's 2nd-order variants)
            fn2 = self._patch_fn(state.region, carry.ssm_state,
                                 carry.p_am, frame, offset)
            E = lambda q: am.f_corrected(st0, fn2(q))
            H = jax.hessian(E)(jnp.zeros((q_dim,), jnp.float32))
        else:
            raise ValueError(f"unknown hess_type {prm.hess_type!r}")

        # LM damping: H is negative-definite at a maximum; damping pushes the
        # diagonal further negative (NT/FCLK.cc:290-296 analog). The
        # Marquardt |diag| scaling alone cannot regularize near-zero-
        # curvature dims (MI/CCRE perspective dofs on shallow surfaces:
        # damp * |H_ii| ~ 0 no matter how large damp grows, so LM keeps
        # rejecting forever) — a Levenberg mean-|diag| floor makes large
        # damp genuinely shrink EVERY step dimension.
        damp = carry.lm_delta if prm.enable_lm else 0.0
        dia = jnp.abs(jnp.diag(H))
        Hd = H - damp * jnp.diag(dia + jnp.mean(dia)) \
               - 1e-7 * jnp.eye(q_dim, dtype=H.dtype)
        # (-Hd) is SPD (damped GN Hessian at a maximum); the unrolled
        # Cholesky avoids the LU custom call (~505 us/iter at fleet scale)
        dq = neg_def_solve(Hd, j)
        return dq, patch, j

    def _apply_dq(self, ssm_state, p_am, dq):
        S = self.ssm.dof
        dp, dpam = dq[:S], dq[S:]
        if self.inverse:
            new_ssm = self.ssm.inverse_compositional_update(ssm_state, dp)
        elif self.compositional:
            new_ssm = self.ssm.compositional_update(ssm_state, dp)
        else:
            new_ssm = ssm_state + (-dp if self.inverse else dp)
        return new_ssm, p_am + dpam

    # -- full update ----------------------------------------------------
    def _update(self, state: TrackerState, frame: Array) -> TrackerState:
        am, ssm, prm = self.am, self.ssm, self.prm
        q_dim = self._q_dim

        # static phase schedule (needed before the crop: the fast path
        # below pre-blurs the SHARED frame per phase)
        phases = ()
        if prm.coarse_pt_iters and getattr(state.extra, "coarse", ()):
            # r5: LM configs run coarse phases too — the accept/reject f
            # is evaluated PHASE-CONSISTENTLY (same blurred decimated
            # grid as the step, reference FCLK.cc:193-217 rollback
            # semantics) and f_prev re-seeds at each phase boundary
            phases = tuple(zip(prm.coarse_pt_iters, state.extra.coarse))

        # Hoist the crop OUT of the iteration loop: a vmapped
        # dynamic_slice lowers to a serial while loop on TPU (~40% of the
        # fleet sampling pass when done per iteration); the window barely
        # moves within one update, so slice once here and sample from the
        # window with shifted coordinates (crop margin absorbs the
        # intra-update motion).
        frame_eff, offset = frame, None
        blur_win = {}
        # fused bf16 fast path with no template learning: cast the SHARED
        # frame to bf16 BEFORE the crop (halves the serial crop-loop
        # bytes and kills the separate (B, hc, wc) cast copy), blur the
        # SHARED frame for the coarse phases (unbatched under vmap;
        # cropping FROM the blurred full frame also matches the
        # LKCache.coarse template convention — those templates sample
        # the full-frame blurred init frame, so the old window-edge-
        # padded per-window blur was the approximation), and crop all
        # variants in ONE stacked dynamic_slice per tracker.
        # r4 A/Bs of the alternatives at B=1024: per-window blur ~2.0
        # ms/update (crop 0.91 + cast + 0.96 blur fusions), stacked
        # crop 1.84 ms, and folding the blur into the kernel's tap
        # weights (dense_sample._weights_dense blur taps, mathematically
        # identical) 3.5x'd the coarse iterations — the (Wc, TN) weight
        # build is the kernel's VPU bottleneck and 7 binomial taps
        # multiply exactly that (log/prof_r4c.log: 36k fps vs 56k).
        fast_bf16 = (self._fused_ok(state, frame) and not prm.enable_lm
                     and not am.needs_update_model)
        if (prm.interp.endswith("_mm") and prm.crop is not None
                and prm.crop_blocks is None):
            h, w = frame.shape[0], frame.shape[1]
            hc, wc = min(prm.crop, h), min(prm.crop, w)
            if hc < h or wc < w:
                pts_t0 = ssm.warp_pts(state.ssm_state, state.region.base_pts)
                pts0 = W.apply_warp(state.region.norm_mat, pts_t0)
                # margin 4: covers intra-update motion AND the widest
                # blurred-tap support (stride-4 binomial radius 3 +
                # linear 1)
                x0 = jnp.clip(jnp.floor(jnp.min(pts0[:, 0])) - 4.0,
                              0.0, float(w - wc))
                y0 = jnp.clip(jnp.floor(jnp.min(pts0[:, 1])) - 4.0,
                              0.0, float(h - hc))
                # NOTE (r3 trace A/Bs): this batched-start
                # dynamic_slice lowers to a serial per-tracker loop
                # (~0.65 ms/update at B=256) but it still WINS — the
                # take-based two-gather form cost 0.70 ms of
                # gather+select+copy fusions, and a per-tracker Pallas
                # DMA-crop kernel (aligned window + dynamic lane roll)
                # measured -15% fleet fps: its (B,) grid serializes
                # un-pipelined DMA latency and rolls 4.4x the bytes
                # (tpu.dynamic_rotate is 32-bit only)
                starts = (y0.astype(jnp.int32), x0.astype(jnp.int32))
                zero = jnp.zeros((), jnp.int32)
                if fast_bf16:
                    # stacked variant crop (2D or MC (H, W, C)): frame +
                    # the per-phase blurs in ONE dynamic_slice per
                    # tracker
                    strides = [st for (st, _), _ in phases if st > 1]
                    fb = frame.astype(jnp.bfloat16)
                    stk = jnp.stack([fb] + [self._blur2(fb, st)
                                            for st in strides])
                    tail = (frame.shape[2],) if frame.ndim == 3 else ()
                    win = jax.lax.dynamic_slice(
                        stk, (zero,) + starts + (zero,) * len(tail),
                        (1 + len(strides), hc, wc) + tail)
                    frame_eff = win[0]
                    blur_win = {st: win[1 + i]
                                for i, st in enumerate(strides)}
                elif frame.ndim == 3:
                    frame_eff = jax.lax.dynamic_slice(
                        frame, starts + (0,), (hc, wc, frame.shape[2]))
                else:
                    frame_eff = jax.lax.dynamic_slice(frame, starts,
                                                      (hc, wc))
                offset = jnp.stack([x0, y0])

        # loop-invariant fused-path environment: homogeneous base points
        # + the bf16 window cast, hoisted so the while body doesn't
        # rebuild them every iteration (each shows up as fleet-scale
        # dynamic-update-slices / converts in the trace)
        fenv = None
        frame_f32 = frame_eff
        if self._fused_ok(state, frame_eff):
            base = state.region.base_pts
            ph_full = jnp.concatenate(
                [base.T, jnp.ones((1, base.shape[0]), jnp.float32)])
            j0T = state.extra.J0.T if self.use_esm_jac else None
            fenv = (ph_full, None, None, 0, j0T)
            if (not prm.enable_lm and frame_eff.ndim == 2
                    and frame_eff.dtype != jnp.bfloat16):
                frame_eff = frame_eff.astype(jnp.bfloat16)

        def corners_of(s):
            c_t = ssm.warp_pts(s, state.region.base_corners)
            return W.apply_warp(state.region.norm_mat, c_t)

        def f_of(s, pam):
            fn = self._patch_fn(state.region, s, pam, frame_eff, offset)
            return am.f_corrected(
                state.am_state._replace(p_am=pam),
                fn(jnp.zeros((q_dim,), jnp.float32)))

        def cond(c: _LKCarry):
            return jnp.logical_and(c.it < prm.max_iters,
                                   jnp.logical_not(c.done))

        def body(c: _LKCarry, fenv_b=None, frame_b=None, phase_b=None,
                 fof_b=None):
            dq, patch, j = self._iteration(
                state, frame_b if frame_b is not None else frame_eff,
                c, offset,
                fenv_b if fenv_b is not None else fenv, phase_b)
            new_ssm, new_pam = self._apply_dq(c.ssm_state, c.p_am, dq)
            if prm.epsilon <= 0.0 and not prm.enable_lm:
                # fixed-iteration mode: the convergence test is dead
                # code, and its two 4-corner warps + norm reductions are
                # real fusion barriers per iteration at fleet scale
                return _LKCarry(new_ssm, new_pam, c.it + 1, c.done,
                                c.lm_delta, c.f_prev)
            corner_change = jnp.max(jnp.linalg.norm(
                corners_of(new_ssm) - corners_of(c.ssm_state), axis=-1))
            if prm.enable_lm:
                f_new = (fof_b or f_of)(new_ssm, new_pam)
                accept = f_new >= c.f_prev
                new_ssm = jnp.where(accept, new_ssm, c.ssm_state)
                new_pam = jnp.where(accept, new_pam, c.p_am)
                delta = jnp.where(accept, c.lm_delta * prm.lm_down,
                                  c.lm_delta * prm.lm_up)
                f_keep = jnp.where(accept, f_new, c.f_prev)
                done = jnp.logical_and(accept, corner_change < prm.epsilon)
                return _LKCarry(new_ssm, new_pam, c.it + 1, done,
                                delta, f_keep)
            done = corner_change < prm.epsilon
            return _LKCarry(new_ssm, new_pam, c.it + 1, done,
                            c.lm_delta, c.f_prev)

        f0 = f_of(state.ssm_state, state.am_state.p_am) if prm.enable_lm \
            else jnp.asarray(-jnp.inf, jnp.float32)
        init = _LKCarry(state.ssm_state, state.am_state.p_am,
                        jnp.zeros((), jnp.int32), jnp.asarray(False),
                        jnp.asarray(prm.lm_delta0, jnp.float32),
                        jnp.asarray(f0, jnp.float32))
        # coarse-to-fine point-decimation phases (SMParams.coarse_pt_iters):
        # early GN iterations on the stride-decimated grid at ~1/stride^2
        # cost, then the full-resolution remainder of max_iters sets the
        # converged fixed point. Works on BOTH execution paths (r4): the
        # fused kernel gets a decimated fenv; the generic XLA path gets a
        # `phase` override (decimated points + cached blurred template +
        # decimated self0 Hessian / template Jacobian).
        carry = init
        if phases and fenv is None and (state.spi_mask is not None
                                        or frame_eff.ndim not in (2, 3)):
            phases = ()       # generic phases need a plain frame + no mask
        if phases:
            ry, rx = am.prm.resy, am.prm.resx
            it_hi = 0
            for (stride, n_it), pack in phases:
                templ_s, h0s, j0s = pack
                idx = self._coarse_idx(ry, rx, stride)
                # anti-aliased pyramid-in-N: the window is low-passed
                # with the SAME pixel-unit binomial kernel the cached
                # phase template was sampled through (raw subsampling
                # aliases fine texture and destabilizes the coarse GN
                # steps at large motion; mismatched blurs shift the
                # coarse optimum). Pre-blurred windows from the stacked
                # crop when available (fast path), else blur here; the
                # kernel's blurred-tap mode (fenv blur field) exists but
                # measured 3.5x slower at fleet scale — see _update.
                frame_s = blur_win.get(stride)
                if frame_s is None:
                    frame_s = self._blur2(frame_eff, stride)
                if fenv is not None:
                    if am.name == "ncc":
                        # kernel NCC mode consumes the centered unit
                        # template of the blurred decimated phase patch
                        from mtf_tpu.am.ncc import NCC as _NCC
                        templ_k = _NCC._center_norm(
                            templ_s[:, None]).reshape(-1)
                    elif templ_s.ndim == 2:
                        # MC pack: kernel consumes (C, n_dec)
                        templ_k = templ_s.T
                    else:
                        templ_k = templ_s
                    j0s_T = j0s.T if self.use_esm_jac else None
                    fenv_s = (fenv[0][:, idx], templ_k, h0s, 0, j0s_T)
                    phase_s = None
                else:
                    fenv_s = None
                    phase_s = (idx, templ_s, h0s, j0s)
                it_hi = min(it_hi + int(n_it), prm.max_iters)

                fof_s = None
                if prm.enable_lm:
                    # phase-consistent LM objective: f on the decimated
                    # points of the BLURRED frame vs the cached blurred
                    # decimated template (an f measured full-res would
                    # reject every coarse step — different optimum)
                    def fof_s(s, pam, idx=idx, templ_s=templ_s,
                              fr=frame_s):
                        region_s = state.region._replace(
                            base_pts=state.region.base_pts[idx])
                        tp = (templ_s[:, None] if templ_s.ndim == 1
                              else templ_s)
                        st_s = am.init(tp)._replace(p_am=pam)
                        fn = self._patch_fn(region_s, s, pam, fr, offset)
                        return am.f_corrected(
                            st_s, fn(jnp.zeros((q_dim,), jnp.float32)))
                    carry = carry._replace(
                        f_prev=fof_s(carry.ssm_state, carry.p_am))

                def cond_s(c, hi=it_hi):
                    return jnp.logical_and(c.it < hi,
                                           jnp.logical_not(c.done))

                def body_s(c, fe=fenv_s, fr=frame_s, ph=phase_s,
                           ff=fof_s):
                    return body(c, fe, fr, ph, ff)

                carry = jax.lax.while_loop(cond_s, body_s, carry)
            # a decimated/blurred coarse phase may have latched done=True
            # at its own (offset) optimum; the SMParams contract is that
            # the final FULL-RESOLUTION iterations set the converged fixed
            # point, so re-arm the convergence test before entering it
            # (and for LM, re-seed f_prev in the full-resolution metric)
            carry = carry._replace(done=jnp.asarray(False))
            if prm.enable_lm:
                carry = carry._replace(
                    f_prev=f_of(carry.ssm_state, carry.p_am))
        out = jax.lax.while_loop(cond, body, carry)

        new_am = state.am_state._replace(p_am=out.p_am)
        new_state = state._replace(ssm_state=out.ssm_state, am_state=new_am)
        if not am.needs_update_model:
            # skip the final-patch sampling entirely (0.23 ms/update at
            # B=256 fleet scale when the template never learns)
            return new_state
        # online template learning (PCA etc., NT/FCLK.cc:353)
        fn = self._patch_fn(state.region, out.ssm_state, out.p_am,
                            frame_f32, offset)
        final_patch = fn(jnp.zeros((q_dim,), jnp.float32))
        new_am2 = am.update_model(new_am, final_patch)
        return new_state._replace(am_state=new_am2)


class FCLK(LKBase):
    """Forward compositional LK (NT/FCLK.cc)."""
    name = "fclk"


class ICLK(LKBase):
    """Inverse compositional LK: init Jacobian/Hessian hoisted to
    initialize, inverse update (NT/ICLK.cc)."""
    name = "iclk"
    inverse = True


class ESM(LKBase):
    """Efficient second-order minimization: mean of init+current Jacobians
    (NT/ESM.cc:228-230)."""
    name = "esm"
    use_esm_jac = True


class AESM(ESM):
    """Additive ESM variant (NT/AESM.cc)."""
    name = "aesm"
    compositional = False


class FALK(LKBase):
    """Forward additive LK (NT/FALK.cc)."""
    name = "falk"
    compositional = False


class IALK(LKBase):
    """Inverse additive LK (NT/IALK.cc) — template Jacobian, additive
    inverted update (Hager-Belhumeur style approximation)."""
    name = "ialk"
    compositional = False
    inverse = True

    def _apply_dq(self, ssm_state, p_am, dq):
        S = self.ssm.dof
        return ssm_state - dq[:S], p_am + dq[S:]


class FCSD(LKBase):
    """Forward compositional steepest descent with learning rate
    (NT/FCSD.cc)."""
    name = "fcsd"

    def _iteration(self, state, frame, carry):
        am, prm = self.am, self.prm
        q_dim = self._q_dim
        st0 = state.am_state._replace(p_am=carry.p_am)
        fn = self._patch_fn(state.region, carry.ssm_state, carry.p_am, frame)
        patch = fn(jnp.zeros((q_dim,), jnp.float32))
        J = self._jac(fn, q_dim)
        gI = am.grad_corrected(st0, patch).reshape(-1)
        j = gI @ J
        dq = prm.sd_learning_rate * j  # ascend
        return dq, patch, j


SM_LK_REGISTRY = {
    "fclk": FCLK, "fc": FCLK,
    "iclk": ICLK, "ic": ICLK,
    "esm": ESM, "aesm": AESM,
    "falk": FALK, "fa": FALK,
    "ialk": IALK, "ia": IALK,
    "fcsd": FCSD,
    # Levenberg-Marquardt variants (reference eslm/fclm/iclm/falm/ialm keys)
    "eslm": ESM, "esl": ESM, "aelm": AESM, "fclm": FCLK, "iclm": ICLK,
    "falm": FALK, "ialm": IALK,
    # reference variants that collapse under jit specialization:
    # FESM = compile-time-specialized ESM (FESM.h:34-37), ESMH = legacy
    # ESM (ESMH.h), IALK2 = alternate inverse-additive formulation,
    # HACLK = FCLK with the converged-template Hessian (hess self0)
    "fesm": ESM, "esmh": ESM, "ialk2": IALK,
}

LM_KEYS = {"eslm", "esl", "aelm", "fclm", "iclm", "falm", "ialm"}
