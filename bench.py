"""Headline benchmark: frames/s/chip on FCLK + SSD + 8-DOF homography.

North-star metric from BASELINE.md: tracker-update throughput per TPU chip
on the reference's default template resolution (50x50, `parameters.h:153`),
measured as a steady-state fleet of independent trackers (the TPU-honest
framing: one chip serves many streams; cf. runMTF's single-stream FPS,
`runMTF.cc:634-636`).

`vs_baseline` divides by the reference-grade CPU denominator: the
reference library cannot build in this image (no Boost/Eigen), so
`native/fclk_baseline.cpp` reimplements its exact hot loop
(FCLK.cc:171-358 + Homography.cc:73-280) as optimized single-core C++
and is run pinned to one core (median of 3, cached in
log/baseline_native.json). A secondary jax-CPU single-core denominator
is kept in log/baseline_cpu.json for continuity with round 1.

Prints one JSON line per benchmark config; the HEADLINE line
{"metric", "value", "unit", "vs_baseline"} is printed last.
"""
import json
import os
import time

import numpy as np

RES = 50            # reference default resx=resy=50
B = 1280            # fleet width per chip (r4 same-session sweep with
                    # the grp=32 coarse kernel: 60.2k fps at 1024,
                    # 61.2k at 1280 — the grouped coarse phases keep
                    # scaling past the r3 B=1024 peak)
# accuracy-safe coarse-to-fine schedule: the r3 decision record rejected
# ((4,7),(2,2)) (hard-cell max-err 0.64px vs 0.44px) for ~2.5% fps —
# the headline ships the safe point and binds accuracy into its row
HEADLINE_SCHEDULE = ((4, 6), (2, 3))
WARMUP = 3
STEPS = 20
BASELINE_CACHE = os.path.join(os.path.dirname(__file__), "log",
                              "baseline_cpu.json")
NATIVE_CACHE = os.path.join(os.path.dirname(__file__), "log",
                            "baseline_native.json")


def _measure_native_baseline():
    """Reference-grade C++ single-core denominator (median of 3).

    Builds and runs native/fclk_baseline (see its header: the reference
    hot loop FCLK.cc:171-358 reimplemented as fused single-pass C++,
    reporting the faster of its two gradient modes — deliberately
    generous to the reference). Cached per machine in
    log/baseline_native.json."""
    import subprocess
    nat_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "native")
    binary = os.path.join(nat_dir, "fclk_baseline")
    if os.path.exists(NATIVE_CACHE) and os.path.getmtime(NATIVE_CACHE) > \
            os.path.getmtime(os.path.join(nat_dir, "fclk_baseline.cpp")):
        with open(NATIVE_CACHE) as f:
            return json.load(f)["fps"]
    subprocess.run(["make", "-C", nat_dir, "fclk_baseline"], check=True,
                   capture_output=True, timeout=300)
    runs = []
    for _ in range(3):
        argv = [binary]
        if os.path.exists("/usr/bin/taskset"):
            argv = ["/usr/bin/taskset", "-c", "0"] + argv
        out = subprocess.run(argv, capture_output=True, text=True,
                             timeout=600, check=True)
        runs.append(json.loads(out.stdout.strip().splitlines()[-1]))
    fps = sorted(r["fps"] for r in runs)[len(runs) // 2]
    os.makedirs(os.path.dirname(NATIVE_CACHE), exist_ok=True)
    with open(NATIVE_CACHE, "w") as f:
        json.dump({"fps": fps, "runs": runs,
                   "config": "native C++ fclk/ssd/hom8 50x50x10it "
                             "1-core median-of-3"}, f)
    return fps


def _scene(seed=0, h=480, w=640):
    import jax.numpy as jnp
    rng = np.random.default_rng(seed)
    img = np.cumsum(np.cumsum(rng.normal(0, 1, (h, w)), 0), 1)
    img = (img - img.min()) / (img.max() - img.min()) * 255.0
    return jnp.asarray(img, jnp.float32)


def _measure_chip():
    import jax
    import jax.numpy as jnp
    from mtf_tpu import create_tracker
    from mtf_tpu.parallel import TrackerFleet, make_mesh

    dev = jax.devices()[0]
    mesh = make_mesh({"tracker": 1}, devices=[dev])
    # dense matmul interpolation (gather-free hot path) with a cropped
    # window — the TPU-native configuration; accuracy is identical to the
    # gather path (tests/test_dense_interp.py). crop=144 measured best on
    # chip (9.9k fps vs 9.2k at 192, 6.9k at 128) and covers the largest
    # fleet patch (~120 px span) with margin
    # coarse_pt_iters: anti-aliased coarse-to-fine point decimation —
    # 7 GN iterations on the 13x13 grid + 2 on 25x25 + 1 full 50x50.
    # Same-session A/Bs vs 10 full iterations: ~2.5x fps, corner diff
    # <=0.3px on the fleet at bench motion, sub-pixel on every tested
    # cell (worst 120px-target large-motion cell 0.64px max vs the
    # full-resolution schedule's 5.6px — the anti-aliased coarse phases
    # WIDEN the convergence basin; see tests/test_learn.py and CLAUDE.md
    # r3 notes). The C++ denominator runs the reference's own fixed-10
    # full-resolution schedule.
    sm = create_tracker("fclk", "ssd", "8", resx=RES, resy=RES,
                        max_iters=10, epsilon=0.0,
                        interp="linear_mm", crop=144,
                        coarse_pt_iters=HEADLINE_SCHEDULE)
    # donate=True: steady-state serving semantics (each frame's states
    # supersede the last); measured +2-5% (log/ab_dispatch_r4.log)
    fleet = TrackerFleet(sm, mesh, donate=True)

    frame0 = _scene(0)
    rng = np.random.default_rng(1)
    corners = []
    for _ in range(B):
        cx, cy = rng.uniform(120, 520), rng.uniform(100, 380)
        s = rng.uniform(30, 60)
        corners.append([[cx - s, cy - s], [cx + s, cy - s],
                        [cx + s, cy + s], [cx - s, cy + s]])
    corners = np.asarray(corners, np.float32)
    states = fleet.initialize(frame0, corners)

    # eager per-frame dispatch: frames stream in one at a time (the
    # serving pattern), and XLA pipelines the async dispatches; a
    # lax.scan over frames measures ~6x slower on this backend.
    # median of 3 timing windows — symmetric with the native C++
    # denominator's median-of-3 protocol (host-side dispatch jitter
    # only ever slows a window down)
    for i in range(WARMUP):
        states = fleet.update(states, frame0)
    jax.block_until_ready(states)
    rates = []
    for _ in range(3):
        t0 = time.perf_counter()
        for i in range(STEPS):
            states = fleet.update(states, frame0)
        jax.block_until_ready(states)
        rates.append(B * STEPS / (time.perf_counter() - t0))
    fps = sorted(rates)[1]

    # ON-CHIP fleet accuracy, same compiled program / same kernel path as
    # the timing loop (the CPU _synth_acc cannot exercise the TPU chain
    # kernel): the whole B-cell fleet rides one exact-GT global warp
    # (synthetic_sequence multi-object mode), frames rendered host-side
    # so no extra device program compiles.
    from mtf_tpu.utils.synth import synthetic_sequence
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        # sigma 0.004 at the GLOBAL anchor scale = 1-3 px/frame cell
        # motion (calibrated log/bench_chip_smoke_r4.log; 0.01 produced
        # >10 px/frame global-perspective distortion)
        frames, gt = synthetic_sequence(
            np.asarray(frame0), jnp.asarray(corners), sm.ssm,
            n_frames=6, sigma_scale=0.004, seed=3)
        frames = np.asarray(frames)
    states = fleet.initialize(frame0, corners)
    errs = []
    for t in range(1, len(frames)):
        states = fleet.update(states, frames[t])
        c = np.asarray(fleet.corners(states))            # (B, 2, 4)
        errs.append(np.mean(np.linalg.norm(
            np.transpose(c, (0, 2, 1)) - gt[t], axis=-1)))
    return fps, float(np.mean(errs))


def _measure_cpu_baseline():
    """Single-stream single-CORE CPU denominator (cached).

    The reference's tracking hot loop is single-threaded C++/Eigen (TBB
    is off by default and "has not shown significant performance
    improvements", ReadMe.md:128-130), so the honest per-device
    comparison pins the jax-CPU run to one core (taskset) and takes the
    median of 3 runs."""
    if os.path.exists(BASELINE_CACHE):
        with open(BASELINE_CACHE) as f:
            return json.load(f)["fps"]
    import subprocess
    import sys
    code = r"""
import json, time
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
from mtf_tpu import create_tracker
rng = np.random.default_rng(0)
img = np.cumsum(np.cumsum(rng.normal(0, 1, (480, 640)), 0), 1)
img = (img - img.min()) / (img.max() - img.min()) * 255.0
frame = jnp.asarray(img, jnp.float32)
sm = create_tracker("fclk", "ssd", "8", resx=%d, resy=%d,
                    max_iters=10, epsilon=0.0)
corners = jnp.asarray([[250,190],[350,190],[350,290],[250,290]], jnp.float32)
state = sm.initialize(frame, corners)
upd = jax.jit(sm.update)
for _ in range(3):
    state = upd(state, frame)
jax.block_until_ready(state)
t0 = time.perf_counter(); K = 20
for _ in range(K):
    state = upd(state, frame)
jax.block_until_ready(state)
print(json.dumps({"fps": K / (time.perf_counter() - t0)}))
""" % (RES, RES)
    runs = []
    for _ in range(3):
        argv = [sys.executable, "-c", code]
        if os.path.exists("/usr/bin/taskset"):
            argv = ["/usr/bin/taskset", "-c", "0"] + argv
        out = subprocess.run(argv, capture_output=True, text=True,
                             timeout=600,
                             cwd=os.path.dirname(os.path.abspath(__file__)))
        runs.append(json.loads(out.stdout.strip().splitlines()[-1])["fps"])
    fps = sorted(runs)[len(runs) // 2]
    os.makedirs(os.path.dirname(BASELINE_CACHE), exist_ok=True)
    with open(BASELINE_CACHE, "w") as f:
        json.dump({"fps": fps, "runs": runs,
                   "config": f"fclk/ssd/8 {RES}x{RES} cpu 1-core median-of-3"}, f)
    return fps


def _measure_scaling_row():
    """BASELINE.md scaling row (VERDICT r3 #8): fleet scaling efficiency
    on an 8-device virtual CPU mesh. No multi-chip hardware is reachable
    from this image (one tunneled chip), so the measurement exercises the
    real sharded code path (NamedSharding fleet over mesh axis `tracker`)
    on virtual devices with the STRONG-scaling protocol (same 64-tracker
    fleet sharded over 1..8 devices; total fps must stay flat) — weak
    scaling on virtual devices only measures host-core contention, since
    8 virtual devices share one CPU's cores. It validates the scaling
    STRUCTURE (no replicated work, no cross-device sync in the update),
    not ICI bandwidth."""
    import subprocess
    import sys
    code = r"""
import json
import numpy as np
import jax
from mtf_tpu import create_tracker
from mtf_tpu.parallel.multihost import measure_fleet_scaling
rng = np.random.default_rng(0)
img = np.cumsum(np.cumsum(rng.normal(0, 1, (480, 640)), 0), 1)
img = (img - img.min()) / (img.max() - img.min()) * 255.0
sm = create_tracker("fclk", "ssd", "8", resx=25, resy=25, max_iters=10,
                    epsilon=0.0, interp="linear_mm", crop=144)
r2 = np.random.default_rng(1)
def corners(i):
    cx, cy = r2.uniform(120, 520), r2.uniform(100, 380)
    s = r2.uniform(30, 60)
    return [[cx - s, cy - s], [cx + s, cy - s],
            [cx + s, cy + s], [cx - s, cy + s]]
out = measure_fleet_scaling(sm, img.astype(np.float32), corners,
                            widths=(1, 2, 4, 8), steps=5,
                            fixed_total=64)
print(json.dumps(out))
"""
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "") +
                        " --xla_force_host_platform_device_count=8")
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, timeout=900, env=env,
                         cwd=os.path.dirname(os.path.abspath(__file__)))
    data = json.loads(out.stdout.strip().splitlines()[-1])
    return {"metric": "fleet_scaling_efficiency_virtual8",
            "value": round(min(data["efficiency"].values()), 3),
            "unit": "efficiency_1_to_8_devices",
            "fps": {k: round(v, 1) for k, v in data["fps"].items()},
            "efficiency": {k: round(v, 3)
                           for k, v in data["efficiency"].items()},
            "note": "8 virtual CPU devices (no multi-chip hardware in "
                    "this image); validates sharded-fleet scaling "
                    "structure, not ICI"}


def main():
    t_start = time.perf_counter()
    try:
        native_fps = _measure_native_baseline()
    except Exception:
        native_fps = None
    try:
        jax_cpu_fps = _measure_cpu_baseline()
    except Exception:
        jax_cpu_fps = None

    # headline FIRST: measuring it after the milestone rows costs ~2.5%
    # (accumulated jit caches / device state in the shared process —
    # 55.8k fresh vs 54.4k after the extras, measured r3)
    # headline fps + accuracy bound into the SAME row (VERDICT r3 Weak
    # #2): the accuracy leg runs ON CHIP with the same compiled fleet
    # program and kernel path as the timing loop (see _measure_chip)
    chip_fps, headline_acc = _measure_chip()
    headline_acc = round(headline_acc, 3) if headline_acc is not None \
        else None
    import jax
    jax.clear_caches()   # free the B=1280 fleet programs before the rows

    rows = []
    # milestone configs (VERDICT r1 #3) — each row is best-effort and
    # time-budgeted; see bench_extra.py. Every row runs in its OWN
    # subprocess: r4 measured the nn1k row at 2,071 fps isolated vs
    # 1,035 in the shared process (cross-row host/device contention that
    # clear_caches alone did not remove; the headline itself also read
    # ~2.5% faster fresh, r3). Isolation costs one interpreter + jax
    # init per row and buys back ~2x on the worst-hit row.
    budget_s = float(os.environ.get("BENCH_BUDGET_S", "2400"))
    try:
        import subprocess
        import sys
        from bench_extra import EXTRA_CONFIGS
        here = os.path.dirname(os.path.abspath(__file__))
        for name, fn in EXTRA_CONFIGS:
            if time.perf_counter() - t_start > budget_s:
                rows.append({"metric": name, "skipped": "time budget"})
                continue
            code = ("import json\nfrom bench_extra import %s as fn\n"
                    "print('BENCHROW ' + json.dumps(fn()))" % fn.__name__)
            try:
                out = subprocess.run(
                    [sys.executable, "-c", code], capture_output=True,
                    text=True, cwd=here,
                    timeout=max(60.0, budget_s -
                                (time.perf_counter() - t_start)))
                lines = [ln for ln in out.stdout.splitlines()
                         if ln.startswith("BENCHROW ")]
                if not lines:
                    # surface the subprocess's actual failure (import
                    # error, OOM, tunnel drop) instead of an IndexError
                    rows.append({
                        "metric": name,
                        "error": "no BENCHROW line (rc=%d)" % out.returncode,
                        "stderr_tail": out.stderr[-800:]})
                    continue
                rows.append(json.loads(lines[-1][len("BENCHROW "):]))
            except Exception as e:  # pragma: no cover - best effort
                rows.append({"metric": name, "error": repr(e)[:200]})
    except Exception:
        pass
    try:
        rows.append(_measure_scaling_row())
    except Exception as e:  # pragma: no cover - best effort
        rows.append({"metric": "fleet_scaling_efficiency_virtual8",
                     "error": repr(e)[:200]})
    headline = {
        "metric": "fclk_ssd_hom8_frames_per_sec_per_chip",
        "value": round(chip_fps, 1),
        "unit": "frames/s",
        "vs_baseline": (round(chip_fps / native_fps, 2)
                        if native_fps else None),
        "synth_mcd_px": headline_acc,
        "coarse_schedule": list(map(list, HEADLINE_SCHEDULE)),
        "baseline_cpu_fps": {"native_cpp_1core": native_fps,
                             "jax_cpu_1core": jax_cpu_fps},
    }
    for row in rows:
        print(json.dumps(row))
    log_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "log")
    os.makedirs(log_dir, exist_ok=True)
    with open(os.path.join(log_dir, "bench_rows.json"), "w") as f:
        json.dump({"rows": rows, "headline": headline}, f, indent=1)
    print(json.dumps(headline))


if __name__ == "__main__":
    main()
