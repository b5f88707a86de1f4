"""On-chip COMPILED Pallas kernel lane (VERDICT r4 #7).

The main suite forces CPU (conftest), so the Pallas kernels only ever run
in interpret mode there — and interpret mode does NOT check the Mosaic
layout/tiling rules that have repeatedly broken compiled kernels (r2-r4
notes). This lane runs the kernels COMPILED on the real axon chip in a
fresh subprocess (the conftest's `jax.config.update("jax_platforms",
"cpu")` cannot be undone in-process), comparing against the interpret
oracle on identical inputs.

Opt-in: set `MTF_TPU_CI=1` (each case costs a multi-minute tunnel
compile), e.g.
    MTF_TPU_CI=1 python -m pytest tests/test_tpu_compiled.py -v
Skipped automatically when the env var is unset or no TPU is reachable.
"""
import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.tpu

_ENABLED = os.environ.get("MTF_TPU_CI") == "1"
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_on_chip(code: str, timeout: float = 1150.0) -> str:
    """Run `code` in a fresh interpreter with the axon platform active."""
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)      # let sitecustomize pick axon
    env["PYTHONPATH"] = _REPO + os.pathsep + env.get("PYTHONPATH", "")
    out = subprocess.run([sys.executable, "-c", code], env=env, cwd=_REPO,
                         capture_output=True, text=True, timeout=timeout)
    assert out.returncode == 0, (out.stdout[-2000:], out.stderr[-2000:])
    return out.stdout


def _require():
    if not _ENABLED:
        pytest.skip("set MTF_TPU_CI=1 to run compiled-kernel chip tests")


CHAIN_CODE = r"""
import numpy as np, jax, jax.numpy as jnp
assert jax.default_backend() == "tpu", jax.default_backend()
from mtf_tpu.ops.pallas.lk_fused import lk_fused_chain
from mtf_tpu.ssm import get_ssm
rng = np.random.default_rng(0)
img = np.cumsum(np.cumsum(rng.normal(0, 1, (144, 144)), 0), 1)
img = (img - img.min()) / (img.max() - img.min()) * 255.0
img = jnp.asarray(img, jnp.float32)
ssm = get_ssm("8")
gens = ssm.generators
base = np.stack(np.meshgrid(np.linspace(-0.5, 0.5, 50),
                            np.linspace(-0.5, 0.5, 50)), -1).reshape(-1, 2)
ph = jnp.asarray(np.concatenate([base.T, np.ones((1, 2500))]), jnp.float32)
M0 = jnp.asarray([[100.0, 0, 70], [0, 100.0, 70], [0, 0, 1]], jnp.float32)
templ = jnp.asarray(rng.uniform(0, 255, (2500,)), jnp.float32)
for am, j0 in (("ssd", None), ("ncc", None),
               ("ssd", jnp.asarray(rng.normal(0, 1, (8, 2500)), jnp.float32))):
    t = templ
    if am == "ncc":
        tc = templ - templ.mean()
        t = tc / (jnp.linalg.norm(tc) + 1e-8)
    args = dict(am=am, j0=j0)
    vi, gi, hi = jax.jit(lambda: lk_fused_chain(
        img, M0, gens, ph, t, interpret=True, **args))()
    vc, gc, hc = jax.jit(lambda: lk_fused_chain(
        img, M0, gens, ph, t, interpret=False, **args))()
    for a, b, nm in ((vi, vc, "val"), (gi, gc, "g"), (hi, hc, "h")):
        rel = float(jnp.max(jnp.abs(a - b)) / (jnp.max(jnp.abs(a)) + 1e-9))
        assert rel < 2e-2, (am, j0 is not None, nm, rel)
    print("OK", am, j0 is not None)
print("CHAIN_PARITY_OK")
"""


GRID_CODE = r"""
import numpy as np, jax, jax.numpy as jnp
assert jax.default_backend() == "tpu", jax.default_backend()
from mtf_tpu.ops.pallas.grid_flow import grid_flow_fused
rng = np.random.default_rng(0)
# TEXTURED scene + per-patch STANDARDIZED templates (production
# semantics). The original smooth-scene/raw-template version made every
# patch an aperture-problem 2x2 solve (H near-singular, damped 1e-6)
# driven by a ~200-unit garbage residual: interpret-vs-compiled bf16
# accumulation differences amplified chaotically through the 4 joint
# iterations and the test measured chaos, not kernel layout
# correctness (r5 session-2 postmortem).
img = rng.uniform(0.0, 255.0, (160, 160))
win = jnp.asarray(img, jnp.float32)
def centers(P, layout):
    if layout == "grid":
        # production layout: row-major patch grid (banded tiles are
        # narrow y slabs)
        side = int(np.sqrt(P))
        g = np.linspace(35, 125, side)
        return np.stack(np.meshgrid(g, g), -1).reshape(-1, 2)
    # adversarial: random centers — tiles span the whole window, the
    # banded path must mask out-of-band points rather than corrupt
    return rng.uniform(30, 130, (P, 2))


for (P, n), layout in (((100, 64), "grid"), ((100, 16), "grid"),
                       ((100, 64), "random")):
    side = int(np.sqrt(n))
    ctr = centers(P, layout)
    off = np.stack(np.meshgrid(np.linspace(-4, 4, side),
                               np.linspace(-4, 4, side)), -1).reshape(-1, 2)
    pts_np = (ctr[:, None] + off[None]).reshape(-1, 2)
    pts = jnp.asarray(pts_np.T, jnp.float32)
    t = np.array([img[int(np.clip(y, 0, 159)), int(np.clip(x, 0, 159))]
                  for x, y in pts_np], np.float64).reshape(P, n)
    t = (t - t.mean(1, keepdims=True)) / (t.std(1, keepdims=True) + 1e-6)
    t = jnp.asarray(t.reshape(-1), jnp.float32)
    sc = jnp.float32(50.0)
    di = np.asarray(grid_flow_fused(win, pts, t, sc, n, 4, True,
                                    interpret=True))
    dc = np.asarray(jax.jit(lambda: grid_flow_fused(
        win, pts, t, sc, n, 4, True, interpret=False))())
    assert np.isfinite(dc).all()
    assert np.abs(di - dc).max() < 0.05, (layout, np.abs(di - dc).max())
    print("OK", layout, P, n)
print("GRID_PARITY_OK")
"""


def test_chain_kernel_compiled_parity():
    """Chain kernel (ssd / ncc / esm-j0 modes) compiled == interpret."""
    _require()
    out = _run_on_chip(CHAIN_CODE)
    assert "CHAIN_PARITY_OK" in out, out[-2000:]


def test_grid_flow_compiled_parity():
    """Grid-flow kernel compiled == interpret on both tile shapes."""
    _require()
    out = _run_on_chip(GRID_CODE)
    assert "GRID_PARITY_OK" in out, out[-2000:]
