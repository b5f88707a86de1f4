import os
import re

import numpy as np
import jax
import jax.numpy as jnp

os.chdir(os.path.dirname(os.path.abspath(__file__)))
from mtf_tpu import create_tracker  # noqa: E402

RES, B = 50, 256
sm = create_tracker("fclk", "ssd", "8", resx=RES, resy=RES,
                    max_iters=10, epsilon=0.0,
                    interp="linear_mm", crop=144)
fn = jax.vmap(sm.update, in_axes=(0, None))

rng = np.random.default_rng(0)
img = jnp.asarray(rng.normal(0, 1, (480, 640)), jnp.float32)
corners = []
r2 = np.random.default_rng(1)
for _ in range(B):
    cx, cy = r2.uniform(120, 520), r2.uniform(100, 380)
    s = r2.uniform(30, 60)
    corners.append([[cx - s, cy - s], [cx + s, cy - s],
                    [cx + s, cy + s], [cx - s, cy + s]])
states = jax.jit(jax.vmap(sm.initialize, in_axes=(None, 0)))(
    img, jnp.asarray(np.asarray(corners, np.float32)))
compiled = jax.jit(fn).lower(states, img).compile()
txt = compiled.as_text()
print("HLO len", len(txt))
# print the definition line of each interesting fusion + its root ops
for name in ["fusion.334", "fusion.335", "fusion.336", "fusion.331",
             "fusion.330", "fusion.326", "fusion.333", "copy.1010",
             "copy.1001", "slice.2647"]:
    # find computation call site
    m = re.search(rf"%{re.escape(name)}\s*=\s*([^\n]+)", txt)
    if m:
        line = m.group(1)
        print(f"\n### {name}: {line[:400]}")
        # if it calls a fused computation, print its body head
        cm = re.search(r"calls=%?([\w.\-]+)", line)
        if cm:
            body = re.search(
                rf"%?{re.escape(cm.group(1))}\s*\([^)]*\)[^{{]*{{(.*?)\n}}",
                txt, re.S)
            if body:
                ops = [ln.strip() for ln in body.group(1).splitlines()
                       if "=" in ln]
                # summarize: op kinds + shapes
                kinds = {}
                for ln in ops:
                    mm = re.search(r"=\s*(\S+)\s+(\S+)\(", ln)
                    if mm:
                        kinds.setdefault(mm.group(2), []).append(mm.group(1))
                for k, shapes in sorted(kinds.items()):
                    big = sorted(set(shapes), key=len)[-1]
                    print(f"   {k:28s} x{len(shapes):3d}  {big[:80]}")
