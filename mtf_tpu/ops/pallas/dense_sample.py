"""Dense-interpolation tap-weight builders (shared by the Pallas LK
kernels).

This module once carried a standalone fleet-batched sampling kernel
(`sample_dense_pallas_parts`); it was superseded by the chain-fused LK
kernel (`lk_fused.py`) for the fusable FCLK/SSD family and measured
7.7x SLOWER than the XLA dense path on non-fusable configs (r4 settling
measurement, log/ab_parts_r4.log: esm/ncc fleet 1,260 vs 9,677 fps at
B=256), so the kernel was deleted and only the weight construction —
used inside `lk_fused._chain_kernel` — remains.
"""
from __future__ import annotations

import jax.numpy as jnp


def _binomial_taps(stride: int):
    """STATIC binomial low-pass taps for a stride-decimated phase
    (sigma ~ stride/2; mirrors LKBase._binomial)."""
    import numpy as np
    k = np.array([1.0], np.float64)
    for _ in range(2 * (stride - 1)):
        k = np.convolve(k, [0.5, 0.5])
    return k.astype(np.float32)


def _weights_dense(t, kind: str, blur: int = 0):
    """phi(t), phi'(t) on tap offsets t (VPU elementwise; |t| and sign
    shared between the two).

    `blur` > 1 returns the BINOMIAL-CONVOLVED kernel (blur o phi):
    sampling the raw image with these taps equals sampling the
    binomial-blurred image with plain phi taps (convolution commutes).
    NOTE: at fleet scale the (Wc, TN) weight build is the chain
    kernel's VPU bottleneck and the extra taps multiply exactly that
    (r4: 3.5x slower coarse phases, log/prof_r4c.log) — the blurred-tap
    mode is only worth it for small point counts; the production coarse
    phases crop pre-blurred windows instead (sm/lk.py).
    """
    if blur and blur > 1:
        taps = _binomial_taps(blur)
        r = (len(taps) - 1) // 2
        w = d = 0.0
        for i, c in enumerate(taps):
            wi, di = _weights_dense(t - (i - r), kind)
            w = w + float(c) * wi
            d = d + float(c) * di
        return w, d
    a = jnp.abs(t)
    s = jnp.sign(t)
    if kind == "linear":
        return jnp.maximum(0.0, 1.0 - a), jnp.where(a < 1.0, -s, 0.0)
    a2, a3 = a * a, a * a * a
    if kind == "cubic":
        w_in = 1.5 * a3 - 2.5 * a2 + 1.0
        w_out = -0.5 * a3 + 2.5 * a2 - 4.0 * a + 2.0
        d_in = 4.5 * a2 - 5.0 * a
        d_out = -1.5 * a2 + 5.0 * a - 4.0
    elif kind == "cubic_bspl":
        w_in = 0.5 * a3 - a2 + 2.0 / 3.0
        w_out = -(a - 2.0) ** 3 / 6.0
        d_in = 1.5 * a2 - 2.0 * a
        d_out = -0.5 * (a - 2.0) ** 2
    else:
        raise ValueError(kind)
    w = jnp.where(a < 1.0, w_in, jnp.where(a < 2.0, w_out, 0.0))
    dphi = jnp.where(a < 1.0, d_in, jnp.where(a < 2.0, d_out, 0.0)) * s
    return w, dphi
