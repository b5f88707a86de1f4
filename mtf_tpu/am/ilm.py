"""Illumination models: GB, PGB, RBF.

Re-designs of the reference photometric sub-models (`AM/src/GB.cc` 160,
`PGB.cc` 358, `RBF.cc` 292; interface `AM/include/mtf/AM/IlluminationModel.h`).
All are linear-in-parameters maps g(I, p) applied to the candidate patch;
their parameter Jacobians needed by the joint Gauss-Newton solve come from
AD on `AM.f_with_pam`, so only `apply` is implemented here.

Parameterization: multiplicative terms are (1 + a) so p = 0 is identity.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from mtf_tpu.am.base import IlluminationModel


class GB(IlluminationModel):
    """Global gain + bias: g(I, p) = (1 + a) I + b * s where s scales the
    bias to pixel range (reference GB.cc)."""
    name = "gb"
    n_params = 2

    def __init__(self, bias_scale: float = 1.0):
        self.bias_scale = bias_scale

    def apply(self, patch, p):
        return (1.0 + p[0]) * patch + p[1] * self.bias_scale


class PGB(IlluminationModel):
    """Piecewise gain + global bias: independent gain per sub-region of the
    patch grid (reference PGB.cc sub-region decomposition)."""
    name = "pgb"

    def __init__(self, resx: int, resy: int, sub_regions_x: int = 3,
                 sub_regions_y: int = 3, bias_scale: float = 1.0):
        self.resx, self.resy = resx, resy
        self.kx, self.ky = sub_regions_x, sub_regions_y
        self.n_params = self.kx * self.ky + 1
        self.bias_scale = bias_scale
        # per-pixel region index map (static)
        ys = np.minimum((np.arange(resy) * self.ky) // resy, self.ky - 1)
        xs = np.minimum((np.arange(resx) * self.kx) // resx, self.kx - 1)
        region = ys[:, None] * self.kx + xs[None, :]
        self._region = jnp.asarray(region.reshape(-1), jnp.int32)  # (N,)

    def apply(self, patch, p):
        gains = 1.0 + jnp.take(p[:-1], self._region)  # (N,)
        return gains[:, None] * patch + p[-1] * self.bias_scale


class RBF(IlluminationModel):
    """Radial-basis-function gain surface + global bias (reference RBF.cc):
    gain(x) = 1 + sum_k a_k phi(||x - c_k||) with Gaussian phi on a fixed
    control grid over the patch."""
    name = "rbf"

    def __init__(self, resx: int, resy: int, n_ctrl_x: int = 3,
                 n_ctrl_y: int = 3, bias_scale: float = 1.0):
        self.n_params = n_ctrl_x * n_ctrl_y + 1
        self.bias_scale = bias_scale
        xs = np.linspace(0, resx - 1, resx)
        ys = np.linspace(0, resy - 1, resy)
        gx, gy = np.meshgrid(xs, ys)
        pix = np.stack([gx.ravel(), gy.ravel()], -1)  # (N, 2)
        cx = np.linspace(0, resx - 1, n_ctrl_x)
        cy = np.linspace(0, resy - 1, n_ctrl_y)
        gcx, gcy = np.meshgrid(cx, cy)
        ctrl = np.stack([gcx.ravel(), gcy.ravel()], -1)  # (K, 2)
        sigma = 0.5 * max(resx / n_ctrl_x, resy / n_ctrl_y)
        d2 = ((pix[:, None, :] - ctrl[None, :, :]) ** 2).sum(-1)
        self._phi = jnp.asarray(np.exp(-d2 / (2 * sigma * sigma)), jnp.float32)

    def apply(self, patch, p):
        gains = 1.0 + self._phi @ p[:-1]  # (N,)
        return gains[:, None] * patch + p[-1] * self.bias_scale


ILM_REGISTRY = {"gb": GB, "pgb": PGB, "rbf": RBF}
