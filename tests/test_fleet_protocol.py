"""Fleet evaluation protocol (VERDICT r1 #8): run_mtf --n_objs N must
reproduce runMTF.cc:499-599 semantics — per-object reinit-on-failure and
the reinit/reset-at-each-frame modes — and agree with single-object runs.
"""
import subprocess
import sys

import numpy as np
import pytest


def _run(*extra):
    out = subprocess.run(
        [sys.executable, "-m", "mtf_tpu.apps.run_mtf", "--synthetic",
         "--n_frames", "10", "--platform", "cpu", "--max_iters", "10",
         "sm", "fclk", "am", "ssd", "ssm", "2", *extra],
        capture_output=True, text=True, timeout=600)
    assert out.returncode == 0, out.stderr[-2000:]
    return out.stdout.strip().splitlines()[-1]


def _field(line, name):
    import re
    m = re.search(rf"{name}=(\[[^\]]*\]|\S+)", line)
    assert m, f"{name} not in {line!r}"
    return m.group(1)



def test_fleet_protocol_matches_single_object():
    """Same synthetic scene warp, reinit-on-failure enabled (but not
    triggered on this easy sequence): fleet per-object errors live at the
    same sub-pixel scale as the single-object protocol run."""
    single = _run("--reinit_on_failure", "--reinit_err_thresh", "5")
    fleet = _run("--reinit_on_failure", "--reinit_err_thresh", "5",
                 "--n_objs", "3")
    e_single = float(_field(single, "avg_mcd"))
    per_obj = [float(v) for v in
               _field(fleet, "per_obj").strip("[]").split(",")]
    assert all(np.isfinite(e) for e in per_obj), fleet
    assert all(abs(e - e_single) < 0.5 for e in per_obj), (single, fleet)
    assert _field(fleet, "failures") == "0", fleet



def test_fleet_reinit_on_failure_fires():
    """A threshold below tracking noise forces the failure path: every
    object accumulates failures and the run stays finite (reinit scatter
    into the batched state works)."""
    fleet = _run("--reinit_on_failure", "--reinit_err_thresh", "1e-6",
                 "--reinit_frame_skip", "2", "--n_objs", "2")
    assert int(_field(fleet, "failures")) >= 2, fleet



def test_fleet_reinit_at_each_frame():
    line = _run("--n_objs", "2", "--reinit_at_each_frame")
    assert float(_field(line, "avg_mcd")) < 0.5, line



def test_fleet_reset_at_each_frame():
    line = _run("--n_objs", "2", "--reset_at_each_frame")
    assert float(_field(line, "avg_mcd")) < 0.5, line
