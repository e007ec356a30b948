#!/usr/bin/env python3
"""Automated bench bound (round-9 verdict item 6).

Compares a fresh ``bench_full.json`` against the committed anchor
(``bench_anchor.json``, a same-layout ``bench_full.json`` snapshot) and
FAILS (exit 1) when any comparable entry regresses past the bound.

Rules (each encodes a documented measurement gotcha from BASELINE.md):

- **Comparable** = present in both runs and a cache-builder in NEITHER
  (cache-builder rows absorb the first build of a shared session cache —
  their timing depends on registry rotation, not plan quality).
- **Host calibration** (BASELINE.md r4/r8 notes: hosts differ up to ~2×
  on unchanged plans): per-entry ratios are normalized by the suite's
  MEDIAN ratio before the bound is applied. A uniformly-slower host
  shifts every ratio equally and cancels out; a single entry that got
  2× slower *relative to the rest of the suite* still trips.
- **Scheduling-noise floor** (±0.1-0.3 s band on sub-second entries): an
  entry only trips if its calibrated time also exceeds the anchor by an
  absolute margin (default 0.3 s), so a 0.05 s -> 0.12 s jitter is not a
  "2.4× regression".

Usage:
  python3 scripts/bench_compare.py                  # compare, exit 1 on trip
  python3 scripts/bench_compare.py --bound 2.0 \
      --anchor bench_anchor.json --current bench_full.json
  python3 scripts/bench_compare.py --write-anchor   # snapshot current as anchor
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def load(path: str) -> dict:
    with open(path) as fh:
        return json.load(fh)


def compare(anchor: dict, current: dict, bound: float = 2.0,
            noise_abs: float = 0.3) -> dict:
    """Pure compare: returns {calibration, regressions, checked, skipped}."""
    skip = set(anchor.get("cache_builders", [])) | set(
        current.get("cache_builders", []))
    a_q, c_q = anchor["queries"], current["queries"]
    common = [n for n in a_q if n in c_q and n not in skip]
    ratios = sorted(c_q[n] / a_q[n] for n in common if a_q[n] > 0)
    if not ratios:
        raise SystemExit("no comparable entries between anchor and current")
    cal = ratios[len(ratios) // 2]  # median = host-speed ratio on unchanged plans
    regressions = {}
    for n in common:
        if a_q[n] <= 0:
            continue
        calibrated = c_q[n] / cal
        if calibrated > a_q[n] * bound and calibrated > a_q[n] + noise_abs:
            regressions[n] = {
                "anchor": a_q[n], "current": c_q[n],
                "calibrated": round(calibrated, 3),
                "ratio": round(calibrated / a_q[n], 2),
            }
    return {
        "calibration_median_ratio": round(cal, 3),
        "bound": bound,
        "checked": len(common),
        "skipped_cache_builders": sorted(skip & (set(a_q) | set(c_q))),
        "regressions": regressions,
    }


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--anchor", default=os.path.join(ROOT, "bench_anchor.json"))
    p.add_argument("--current", default=os.path.join(ROOT, "bench_full.json"))
    p.add_argument("--bound", type=float, default=2.0)
    p.add_argument("--noise-abs", type=float, default=0.3)
    p.add_argument("--write-anchor", action="store_true",
                   help="snapshot --current as --anchor and exit")
    args = p.parse_args()
    if args.write_anchor:
        shutil.copyfile(args.current, args.anchor)
        print(f"anchor written: {args.anchor}")
        return 0
    report = compare(load(args.anchor), load(args.current),
                     bound=args.bound, noise_abs=args.noise_abs)
    print(json.dumps(report, indent=1, sort_keys=True))
    if report["regressions"]:
        print(f"FAIL: {len(report['regressions'])} entr(y/ies) past "
              f"{args.bound}x the anchor after host calibration",
              file=sys.stderr)
        return 1
    print(f"OK: {report['checked']} entries within {args.bound}x "
          f"(host calibration {report['calibration_median_ratio']}x)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
