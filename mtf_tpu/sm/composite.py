"""Composite search methods: Cascade, Parallel, Pyramidal, RKLT.

TPU-native re-designs of the reference composite SMs
(`SM/src/{CascadeSM,ParallelSM,PyramidalSM}.cc`, `SM/src/NT/RKLT.cc`;
SURVEY.md §3.5). Composites hold multiple member SMs; their state is a
tuple of member TrackerStates plus composite bookkeeping. All control flow
(failure fallback, fusion) is jnp.where / lax.cond — jit-safe.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple

import jax
import jax.numpy as jnp

from mtf_tpu.ops import warp as W
from mtf_tpu.sm.core import SearchMethod, TrackerState, image_corners
from mtf_tpu.utils.pyramid import build_pyramid

Array = jax.Array


class CompositeState(NamedTuple):
    members: tuple          # per-member TrackerState
    extra: tuple = ()


class CascadeSM:
    """Sequential composition: member k starts from member k-1's corners
    (reference CascadeSM.cc; registry composites like `nnic`, `pffc`,
    mtf.h:344-478). Members may differ in SM/AM/SSM.

    `auto_reinit_thresh`: when a member's result diverges from its input
    region by more than this many pixels, it is reset to the previous
    member's estimate (CascadeTracker.cc:25-40 auto-reinit)."""

    name = "casc"

    def __init__(self, members: list, auto_reinit_thresh: float | None = None):
        self.members = members
        self.auto_reinit_thresh = auto_reinit_thresh
        self.ssm = members[-1].ssm  # corners reported by the last member

    def initialize(self, frame, corners):
        return CompositeState(tuple(m.initialize(frame, corners)
                                    for m in self.members))

    def update(self, state: CompositeState, frame):
        new_members = []
        corners = None
        for m, st in zip(self.members, state.members):
            if corners is not None:
                st = m.set_region(st, corners)
            st = m.update(st, frame)
            c_new = image_corners(m.ssm, st)
            if self.auto_reinit_thresh is not None and corners is not None:
                div = jnp.max(jnp.linalg.norm(
                    c_new - corners, axis=-1)) > self.auto_reinit_thresh
                st = jax.lax.cond(
                    div, lambda s, c=corners, mm=m: mm.set_region(s, c),
                    lambda s: s, st)
                c_new = jnp.where(div, corners, c_new)
            corners = c_new
            new_members.append(st)
        return CompositeState(tuple(new_members))

    def corners(self, state):
        return image_corners(self.members[-1].ssm, state.members[-1]).T

    def set_region(self, state, corners, frame=None):
        return CompositeState(tuple(
            m.set_region(st, corners)
            for m, st in zip(self.members, state.members)))


class ParallelSM:
    """Concurrent members, fused estimate (reference ParallelSM.cc;
    mean-corner fusion + optional reset of members to the fused region,
    ParallelParams)."""

    name = "prl"

    def __init__(self, members: list, reset_to_mean: bool = True):
        self.members = members
        self.reset_to_mean = reset_to_mean
        self.ssm = members[0].ssm

    def initialize(self, frame, corners):
        return CompositeState(tuple(m.initialize(frame, corners)
                                    for m in self.members))

    def update(self, state: CompositeState, frame):
        new_members = [m.update(st, frame)
                       for m, st in zip(self.members, state.members)]
        all_corners = jnp.stack(
            [image_corners(m.ssm, st)
             for m, st in zip(self.members, new_members)])  # (M, 4, 2)
        fused = jnp.mean(all_corners, axis=0)
        if self.reset_to_mean:
            new_members = [m.set_region(st, fused)
                           for m, st in zip(self.members, new_members)]
        return CompositeState(tuple(new_members), extra=(fused,))

    def corners(self, state):
        if state.extra:
            return state.extra[0].T
        return image_corners(self.members[0].ssm, state.members[0]).T

    def set_region(self, state, corners, frame=None):
        return CompositeState(tuple(
            m.set_region(st, corners)
            for m, st in zip(self.members, state.members)), state.extra)


class PyramidalSM:
    """Coarse-to-fine over a Gaussian pyramid with per-level copies of one
    SM (reference PyramidalSM.cc, mtf.h:554-587). Level templates are
    sampled from the level images at init; per frame, corners cascade
    coarse -> fine with x2 rescaling."""

    name = "pyr"

    def __init__(self, sm: SearchMethod, n_levels: int = 3):
        self.sm = sm
        self.n_levels = n_levels
        self.ssm = sm.ssm

    def initialize(self, frame, corners):
        pyr = build_pyramid(frame, self.n_levels)
        members = []
        for lvl in range(self.n_levels):
            members.append(self.sm.initialize(pyr[lvl],
                                              corners / (2.0 ** lvl)))
        return CompositeState(tuple(members))

    def update(self, state: CompositeState, frame):
        pyr = build_pyramid(frame, self.n_levels)
        new_members = list(state.members)
        corners = None
        for lvl in range(self.n_levels - 1, -1, -1):
            st = new_members[lvl]
            if corners is not None:
                st = self.sm.set_region(st, corners / (2.0 ** lvl))
            st = self.sm.update(st, pyr[lvl])
            corners = image_corners(self.sm.ssm, st) * (2.0 ** lvl)
            new_members[lvl] = st
        return CompositeState(tuple(new_members))

    def corners(self, state):
        return image_corners(self.sm.ssm, state.members[0]).T

    def set_region(self, state, corners, frame=None):
        return CompositeState(tuple(
            self.sm.set_region(st, corners / (2.0 ** lvl))
            for lvl, st in enumerate(state.members)))


@dataclass(frozen=True)
class RKLTParams:
    """Reference RKLTParams analog."""
    failure_thresh_px: float = 15.0  # template-vs-grid corner divergence
    enable_feedback: bool = True     # grid follows the final estimate
    enable_spi: bool = False         # grid inlier mask -> template-SM SPI
                                     # (NT/RKLT.cc:100)


class RKLT:
    """Grid localizer + template-SM refiner with failure fallback
    (reference NT/RKLT.cc:90-116 — the SOTA config, ReadMe.md:432).

    update: grid.update -> templ.set_region(grid) -> templ.update ->
    if ||templ - grid corners|| > thresh: revert to grid result;
    feedback final corners into the grid tracker."""

    name = "rklt"

    def __init__(self, grid_sm, templ_sm, prm: RKLTParams | None = None):
        self.grid_sm = grid_sm
        self.templ_sm = templ_sm
        self.prm = prm or RKLTParams()
        self.ssm = templ_sm.ssm

    def initialize(self, frame, corners):
        return CompositeState((self.grid_sm.initialize(frame, corners),
                               self.templ_sm.initialize(frame, corners)))

    def update(self, state: CompositeState, frame):
        grid_st, templ_st = state.members
        grid_st = self.grid_sm.update(grid_st, frame)
        grid_corners = image_corners(self.grid_sm.ssm, grid_st)

        templ_st = self.templ_sm.set_region(templ_st, grid_corners)
        if self.prm.enable_spi:
            # grid inlier mask -> per-pixel SPI weights for the template
            # SM: each template pixel inherits the inlier flag of the grid
            # cell it falls in (NT/RKLT.cc:100)
            inl = grid_st.extra.inlier_mask                    # (R*R,)
            R = self.grid_sm.grid.grid_res
            resy = self.templ_sm.am.prm.resy
            resx = self.templ_sm.am.prm.resx
            ri = jnp.arange(resy) * R // resy
            ci = jnp.arange(resx) * R // resx
            pix = inl.reshape(R, R)[ri[:, None], ci[None, :]]  # (resy, resx)
            templ_st = templ_st._replace(spi_mask=pix.reshape(-1))
        templ_st = self.templ_sm.update(templ_st, frame)
        if self.prm.enable_spi:
            # restore a mask-free pytree so state structure is identical
            # across frames (scan/while carries require it)
            templ_st = templ_st._replace(spi_mask=None)
        templ_corners = image_corners(self.templ_sm.ssm, templ_st)

        # failure detection (NT/RKLT.cc:105-111)
        diverged = jnp.max(jnp.linalg.norm(
            templ_corners - grid_corners, axis=-1)) > self.prm.failure_thresh_px
        final = jnp.where(diverged, grid_corners, templ_corners)
        templ_st = jax.lax.cond(
            diverged,
            lambda st: self.templ_sm.set_region(st, grid_corners),
            lambda st: st, templ_st)

        if self.prm.enable_feedback:  # NT/RKLT.cc:113-114
            grid_st = self.grid_sm.set_region(grid_st, final)
        return CompositeState((grid_st, templ_st), extra=(final,))

    def corners(self, state):
        if state.extra:
            return state.extra[0].T
        return image_corners(self.templ_sm.ssm, state.members[1]).T

    def set_region(self, state, corners, frame=None):
        return CompositeState(
            (self.grid_sm.set_region(state.members[0], corners),
             self.templ_sm.set_region(state.members[1], corners)),
            state.extra)
