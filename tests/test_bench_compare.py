"""Unit tests for the automated bench bound (scripts/bench_compare.py).

Pure-JSON logic — no Spark session. The real gate is run as
``python3 scripts/bench_compare.py`` after ``python3 bench.py``.
"""

import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

from bench_compare import compare  # noqa: E402


def _run(queries_a, queries_c, cb_a=(), cb_c=(), **kw):
    return compare(
        {"queries": queries_a, "cache_builders": list(cb_a)},
        {"queries": queries_c, "cache_builders": list(cb_c)}, **kw)


def test_clean_run_passes():
    a = {f"q{i}": 1.0 for i in range(10)}
    r = _run(a, {k: v * 1.1 for k, v in a.items()})
    assert not r["regressions"] and r["checked"] == 10


def test_single_entry_regression_trips():
    a = {f"q{i}": 1.0 for i in range(10)}
    c = dict(a, q3=2.5)
    r = _run(a, c)
    assert set(r["regressions"]) == {"q3"}
    assert r["regressions"]["q3"]["ratio"] > 2.0


def test_uniformly_slow_host_is_calibrated_out():
    # BASELINE.md r8 note: a 2x-slower host on UNCHANGED plans must not
    # trip the bound — the median ratio absorbs it.
    a = {f"q{i}": 1.0 + i / 10 for i in range(11)}
    c = {k: v * 2.0 for k, v in a.items()}
    r = _run(a, c)
    assert not r["regressions"]
    assert abs(r["calibration_median_ratio"] - 2.0) < 1e-9


def test_regression_on_slow_host_still_trips():
    a = {f"q{i}": 1.0 for i in range(10)}
    c = {k: 2.0 for k in a}
    c["q7"] = 5.0  # 2.5x past the host factor
    r = _run(a, c)
    assert set(r["regressions"]) == {"q7"}


def test_cache_builders_excluded_from_both_sides():
    a = {"q0": 1.0, "q1": 1.0, "q2": 1.0}
    c = {"q0": 9.0, "q1": 1.0, "q2": 9.0}
    r = _run(a, c, cb_a=("q0",), cb_c=("q2",))
    assert not r["regressions"]
    assert r["checked"] == 1
    assert r["skipped_cache_builders"] == ["q0", "q2"]


def test_noise_floor_spares_tiny_entries():
    # 0.05 -> 0.14 is a 2.8x ratio but inside the +-0.3 s scheduling band
    a = {f"q{i}": 1.0 for i in range(8)}
    a["tiny"] = 0.05
    c = dict(a, tiny=0.14)
    r = _run(a, c)
    assert not r["regressions"]


def test_cli_end_to_end(tmp_path):
    anchor = {"queries": {"q0": 1.0, "q1": 1.0, "q2": 1.0},
              "cache_builders": []}
    cur = {"queries": {"q0": 1.0, "q1": 1.0, "q2": 3.0},
           "cache_builders": []}
    ap, cp = tmp_path / "a.json", tmp_path / "c.json"
    ap.write_text(json.dumps(anchor))
    cp.write_text(json.dumps(cur))
    script = os.path.join(os.path.dirname(__file__), "..", "scripts",
                          "bench_compare.py")
    out = subprocess.run(
        [sys.executable, script, "--anchor", str(ap), "--current", str(cp)],
        capture_output=True, text=True)
    assert out.returncode == 1 and "q2" in out.stdout
    cp.write_text(json.dumps(anchor))
    out = subprocess.run(
        [sys.executable, script, "--anchor", str(ap), "--current", str(cp)],
        capture_output=True, text=True)
    assert out.returncode == 0, out.stdout + out.stderr


def test_real_anchor_comparable_to_itself():
    """The committed anchor must be self-consistent (guards a malformed
    snapshot)."""
    root = os.path.join(os.path.dirname(__file__), "..")
    path = os.path.join(root, "bench_anchor.json")
    a = json.load(open(path))
    r = compare(a, a)
    assert not r["regressions"]
    assert r["calibration_median_ratio"] == 1.0
    assert r["checked"] > 150
