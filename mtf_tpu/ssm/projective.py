"""Concrete fixed-matrix state space models.

Re-designs of the reference SSM family (SSM/src/{Translation,IST,Isometry,
AST,Similitude,ASRT,Affine,Homography,LieAffine,LieHomography,SL3,CBH}.cc,
~6.5 kLoC) as generator bases + small to/from-matrix closures on top of
`mtf_tpu.ssm.base`. Factory keys match `include/mtf/mtf.h:1070-1100`.

Generator conventions (all 3x3):
    T_x, T_y   translation
    R          rotation at identity     [[0,-1],[1,0]]
    S          isotropic scale          diag(1,1,0)
    S_x, S_y   anisotropic scale
    SH1, SH2   shears
    P_x, P_y   perspective (last row)
State orderings are chosen so (tx, ty) always lead.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from mtf_tpu.ops import warp as W
from mtf_tpu.ssm.base import SSM, AdditiveMatrixSSM, ExpSSM, logm_3x3

Array = jax.Array


def _g(rows) -> np.ndarray:
    return np.asarray(rows, np.float32)


G_TX = _g([[0, 0, 1], [0, 0, 0], [0, 0, 0]])
G_TY = _g([[0, 0, 0], [0, 0, 1], [0, 0, 0]])
G_ROT = _g([[0, -1, 0], [1, 0, 0], [0, 0, 0]])
G_SC = _g([[1, 0, 0], [0, 1, 0], [0, 0, 0]])
G_SX = _g([[1, 0, 0], [0, 0, 0], [0, 0, 0]])
G_SY = _g([[0, 0, 0], [0, 1, 0], [0, 0, 0]])
G_SH1 = _g([[0, 1, 0], [0, 0, 0], [0, 0, 0]])
G_SH2 = _g([[0, 0, 0], [1, 0, 0], [0, 0, 0]])
G_PX = _g([[0, 0, 0], [0, 0, 0], [1, 0, 0]])
G_PY = _g([[0, 0, 0], [0, 0, 0], [0, 1, 0]])


def _norm_h(mat: Array) -> Array:
    return mat / mat[2, 2]


class Translation(AdditiveMatrixSSM):
    """2-DOF (tx, ty). Reference: SSM/src/Translation.cc."""
    name, dof = "trans", 2

    def _generators(self):
        return np.stack([G_TX, G_TY])

    def from_matrix(self, mat):
        mat = _norm_h(mat)
        return jnp.stack([mat[0, 2], mat[1, 2]])

    def fit_pts(self, src, dst, weights=None):
        d = dst - src
        if weights is None:
            return jnp.mean(d, axis=0)
        wsum = jnp.maximum(jnp.sum(weights), 1e-12)
        return jnp.sum(d * weights[:, None], axis=0) / wsum


class IST(AdditiveMatrixSSM):
    """3-DOF isotropic scale + translation (tx, ty, s). Ref: IST.cc."""
    name, dof = "ist", 3

    def _generators(self):
        return np.stack([G_TX, G_TY, G_SC])

    def from_matrix(self, mat):
        mat = _norm_h(mat)
        return jnp.stack([mat[0, 2], mat[1, 2], 0.5 * (mat[0, 0] + mat[1, 1]) - 1.0])

    def fit_pts(self, src, dst, weights=None):
        w = jnp.ones(src.shape[0], src.dtype) if weights is None else weights
        wn = w / jnp.maximum(jnp.sum(w), 1e-12)
        cs = jnp.sum(src * wn[:, None], axis=0)
        cd = jnp.sum(dst * wn[:, None], axis=0)
        s0, d0 = src - cs, dst - cd
        k = jnp.sum(wn[:, None] * s0 * d0) / jnp.maximum(
            jnp.sum(wn[:, None] * s0 * s0), 1e-12)
        t = cd - k * cs
        return jnp.stack([t[0], t[1], k - 1.0])


class Isometry(SSM):
    """3-DOF SE(2): (tx, ty, theta). Ref: Isometry.cc (angle-parameterized)."""
    name, dof = "iso", 3

    def _generators(self):
        return np.stack([G_TX, G_TY, G_ROT])

    def to_matrix(self, state):
        tx, ty, th = state[0], state[1], state[2]
        c, s = jnp.cos(th), jnp.sin(th)
        return jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]],
                         state.dtype).at[0, 0].set(c).at[0, 1].set(-s) \
            .at[1, 0].set(s).at[1, 1].set(c).at[0, 2].set(tx).at[1, 2].set(ty)

    def from_matrix(self, mat):
        mat = _norm_h(mat)
        th = jnp.arctan2(mat[1, 0] - mat[0, 1], mat[0, 0] + mat[1, 1])
        return jnp.stack([mat[0, 2], mat[1, 2], th])

    def fit_pts(self, src, dst, weights=None):
        # weighted Procrustes without scale
        w = jnp.ones(src.shape[0], src.dtype) if weights is None else weights
        wn = w / jnp.maximum(jnp.sum(w), 1e-12)
        cs = jnp.sum(src * wn[:, None], axis=0)
        cd = jnp.sum(dst * wn[:, None], axis=0)
        s0, d0 = src - cs, dst - cd
        dot = jnp.sum(wn * jnp.sum(s0 * d0, axis=-1))
        crs = jnp.sum(wn * (s0[:, 0] * d0[:, 1] - s0[:, 1] * d0[:, 0]))
        th = jnp.arctan2(crs, dot)
        c, s = jnp.cos(th), jnp.sin(th)
        t = cd - jnp.stack([c * cs[0] - s * cs[1], s * cs[0] + c * cs[1]])
        return jnp.stack([t[0], t[1], th])


class AST(AdditiveMatrixSSM):
    """4-DOF anisotropic scale + translation (tx, ty, sx, sy). Ref: AST.cc."""
    name, dof = "ast", 4

    def _generators(self):
        return np.stack([G_TX, G_TY, G_SX, G_SY])

    def from_matrix(self, mat):
        mat = _norm_h(mat)
        return jnp.stack([mat[0, 2], mat[1, 2], mat[0, 0] - 1.0, mat[1, 1] - 1.0])

    def fit_pts(self, src, dst, weights=None):
        # independent weighted 1D regressions per axis
        w = jnp.ones(src.shape[0], src.dtype) if weights is None else weights
        wn = w / jnp.maximum(jnp.sum(w), 1e-12)
        cs = jnp.sum(src * wn[:, None], axis=0)
        cd = jnp.sum(dst * wn[:, None], axis=0)
        s0, d0 = src - cs, dst - cd
        k = jnp.sum(wn[:, None] * s0 * d0, axis=0) / jnp.maximum(
            jnp.sum(wn[:, None] * s0 * s0, axis=0), 1e-12)  # (2,)
        t = cd - k * cs
        return jnp.stack([t[0], t[1], k[0] - 1.0, k[1] - 1.0])


class Similitude(SSM):
    """4-DOF (tx, ty, s, theta): scale (1+s) rotation theta. Ref: Similitude.cc."""
    name, dof = "sim", 4

    def _generators(self):
        return np.stack([G_TX, G_TY, G_SC, G_ROT])

    def to_matrix(self, state):
        tx, ty, s, th = state[0], state[1], state[2], state[3]
        k = 1.0 + s
        a, b = k * jnp.cos(th), k * jnp.sin(th)
        m = jnp.eye(3, dtype=state.dtype)
        return m.at[0, 0].set(a).at[0, 1].set(-b).at[1, 0].set(b) \
                .at[1, 1].set(a).at[0, 2].set(tx).at[1, 2].set(ty)

    def from_matrix(self, mat):
        mat = _norm_h(mat)
        a = 0.5 * (mat[0, 0] + mat[1, 1])
        b = 0.5 * (mat[1, 0] - mat[0, 1])
        return jnp.stack([mat[0, 2], mat[1, 2],
                          jnp.hypot(a, b) - 1.0, jnp.arctan2(b, a)])


class ASRT(SSM):
    """5-DOF (tx, ty, sx, sy, theta): W = R(theta) diag(1+sx, 1+sy) + t.
    Ref: ASRT.cc."""
    name, dof = "asrt", 5

    def _generators(self):
        return np.stack([G_TX, G_TY, G_SX, G_SY, G_ROT])

    def to_matrix(self, state):
        tx, ty, sx, sy, th = (state[i] for i in range(5))
        c, s = jnp.cos(th), jnp.sin(th)
        kx, ky = 1.0 + sx, 1.0 + sy
        m = jnp.eye(3, dtype=state.dtype)
        return m.at[0, 0].set(c * kx).at[0, 1].set(-s * ky) \
                .at[1, 0].set(s * kx).at[1, 1].set(c * ky) \
                .at[0, 2].set(tx).at[1, 2].set(ty)

    def from_matrix(self, mat):
        mat = _norm_h(mat)
        th = jnp.arctan2(mat[1, 0] - mat[0, 1], mat[0, 0] + mat[1, 1])
        c, s = jnp.cos(th), jnp.sin(th)
        kx = c * mat[0, 0] + s * mat[1, 0]
        ky = -s * mat[0, 1] + c * mat[1, 1]
        return jnp.stack([mat[0, 2], mat[1, 2], kx - 1.0, ky - 1.0, th])


class Affine(AdditiveMatrixSSM):
    """6-DOF (tx, ty, a00-1, a01, a10, a11-1). Ref: Affine.cc."""
    name, dof = "aff", 6

    def _generators(self):
        return np.stack([G_TX, G_TY, G_SX, G_SH1, G_SH2, G_SY])

    def from_matrix(self, mat):
        mat = _norm_h(mat)
        return jnp.stack([mat[0, 2], mat[1, 2], mat[0, 0] - 1.0,
                          mat[0, 1], mat[1, 0], mat[1, 1] - 1.0])

    def fit_pts(self, src, dst, weights=None):
        return self.from_matrix(W.affine_dlt(src, dst, weights))


class Homography(AdditiveMatrixSSM):
    """8-DOF, W[2,2] pinned to 1 (tx, ty, h00-1, h01, h10, h11-1, h20, h21).
    Ref: Homography.cc (the reference warp)."""
    name, dof = "hom", 8

    def _generators(self):
        return np.stack([G_TX, G_TY, G_SX, G_SH1, G_SH2, G_SY, G_PX, G_PY])

    def from_matrix(self, mat):
        mat = _norm_h(mat)
        return jnp.stack([mat[0, 2], mat[1, 2], mat[0, 0] - 1.0, mat[0, 1],
                          mat[1, 0], mat[1, 1] - 1.0, mat[2, 0], mat[2, 1]])

    def fit_pts(self, src, dst, weights=None):
        return self.from_matrix(W.homography_dlt(src, dst, weights))


class LieIsometry(ExpSSM):
    """3-DOF SE(2) via exp of se(2) (exact closed form through expm).
    Ref: SSM/src/LieIsometry.cc (307 LoC; absent from the reference
    factory registry mtf.h:1070-1100 — provided for inventory parity)."""
    name, dof = "liso", 3

    def _generators(self):
        return np.stack([G_TX, G_TY, G_ROT])

    def fit_pts(self, src, dst, weights=None):
        iso = Isometry()
        return self.from_matrix(iso.to_matrix(iso.fit_pts(src, dst,
                                                          weights)))


class LieAffine(ExpSSM):
    """6-DOF affine via matrix exponential of the affine algebra.
    Ref: LieAffine.cc."""
    name, dof = "laff", 6

    def _generators(self):
        return np.stack([G_TX, G_TY, G_SX, G_SH1, G_SH2, G_SY])

    def fit_pts(self, src, dst, weights=None):
        return self.from_matrix(W.affine_dlt(src, dst, weights))


class LieHomography(ExpSSM):
    """8-DOF homography via exp of sl(3). Ref: LieHomography.cc."""
    name, dof = "lhom", 8

    def _generators(self):
        sym_sh = _g([[0, 1, 0], [1, 0, 0], [0, 0, 0]])
        g_sc = _g([[1, 0, 0], [0, 1, 0], [0, 0, -2]])
        g_an = _g([[1, 0, 0], [0, -1, 0], [0, 0, 0]])
        return np.stack([G_TX, G_TY, G_ROT, g_sc, g_an, sym_sh, G_PX, G_PY])

    def _normalize(self, mat):
        det = jnp.linalg.det(mat)
        return mat / jnp.cbrt(det)

    def fit_pts(self, src, dst, weights=None):
        return self.from_matrix(W.homography_dlt(src, dst, weights))


class SL3(LieHomography):
    """SL(3) parameterization (det-1-normalized exp of sl(3)). Ref: SL3.cc.

    Functionally identical warp group to LieHomography here; kept as a
    separate key for reference API parity (`sl3` vs `l8`, mtf.h:1070-1100).
    """
    name = "sl3"


class CBH(SSM):
    """8-DOF corner-based homography: state = displacements of the 4
    template-frame corners (dx0, dy0, ..., dx3, dy3). Ref: CBH.cc.

    to_matrix solves the 4-point DLT from the canonical unit square to the
    displaced square; from_matrix reads off warped-corner displacements.
    """
    name, dof = "cbh", 8

    def _generators(self):
        # numeric basis: d to_matrix / d p_i at 0 computed on the fly is
        # avoided by an analytic identity: corner displacement generators
        # equal the homography generators re-expressed; we use jacfwd once.
        return np.zeros((8, 3, 3), np.float32)  # replaced in __init__

    def __init__(self):
        super().__init__()
        self._base_corners = W.unit_square_corners()
        # generator basis via jacfwd through the closed-form 4-corner
        # homography (fully differentiable, unlike the SVD DLT)
        gens = jax.jacfwd(self.to_matrix)(jnp.zeros(8, jnp.float32))
        self.generators = jnp.moveaxis(gens.reshape(3, 3, 8), -1, 0)

    def to_matrix(self, state):
        base = W.unit_square_corners(state.dtype)
        dst = base + state.reshape(4, 2)
        return W.homography_from_unit_square(dst)

    def from_matrix(self, mat):
        base = W.unit_square_corners(mat.dtype)
        return (W.apply_warp(mat, base) - base).reshape(8)

    def fit_pts(self, src, dst, weights=None):
        return self.from_matrix(W.homography_dlt(src, dst, weights))


# registry: reference factory keys (mtf.h:1070-1100)
SSM_REGISTRY = {
    "trans": Translation, "2": Translation,
    "ist": IST, "3s": IST,
    "iso": Isometry, "3": Isometry,
    "liso": LieIsometry, "l3": LieIsometry,
    "ast": AST, "4s": AST,
    "sim": Similitude, "4": Similitude,
    "asrt": ASRT, "5": ASRT,
    "aff": Affine, "6": Affine,
    "laff": LieAffine, "l6": LieAffine,
    "hom": Homography, "8": Homography,
    "lhom": LieHomography, "l8": LieHomography,
    "sl3": SL3,
    "cbh": CBH, "c8": CBH,
}
