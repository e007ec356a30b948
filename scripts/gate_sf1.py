#!/usr/bin/env python3
"""sf1 flagship gate (r11 verdict item 7).

The driver's oracle gate runs at sf0.01 every round (and ran at sf0.1 in
r4/r5); this script hash-verifies the flagship chains at ~sf1 — 100x the
driver fixture, 10x the largest gate so far — where skew, spill, and
multi-row-group scan paths actually engage. It synthesizes a 10x copy of
the sf0.1 testdata with JOIN-CONSISTENT key shifts (fact keys shifted per
replica, dimensions kept — every FK still resolves), reusing
scale_probe.synthesize for documents/embeddings (constant near-dup pair
density, perturbed unit-norm embeddings — the production dedup regime),
then runs the driver-gate replica (check_correctness) on the flagship
subset. Spark and the DuckDB oracle read the SAME synthesized parquet, so
the value-hash comparison is exactly as strict as the driver gate's.

Usage:
    python3 scripts/gate_sf1.py                 # synthesize (once) + gate
    python3 scripts/gate_sf1.py --out GATE_sf1.json
    python3 scripts/gate_sf1.py --dir /tmp/sf1 --factor 10
"""
from __future__ import annotations

import argparse
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# the flagship subset (r11) + the top-heaviest registry entries by
# sf0.1 cost (r12 verdict item 2: decimal headroom and tie density
# change with scale — the r5 round()-class bugs only surfaced on a
# bigger fixture, so the heavy compositions get the same 100x check)
FLAGSHIP_FILTERS = [
    "dq29_", "dq31_", "dq33_", "dq34_",          # KNN / edges / expansion
    "dq36_", "dq37_", "dq38_",                   # tumbling/sliding/session
    "dq61_", "dq135_", "dq148_", "dq183_",       # LSH-CC / funnel / SemDeDup / PPJoin
    "dq77_", "dq78_", "dq79_",                   # TPC-H Q1 / Q3 / Q5
    # r13 additions — heaviest sf0.1 rows + the verdict-named chains
    "dq225_", "dq178_", "dq42_", "dq174_",       # MAD / interpolate / n-gram Jaccard / Q9
    "dq168_", "dq190_", "dq227_", "dq238_",      # dup spans / k-core / vocab curve / RFM
    "dq243_", "dq246_", "dq64_", "dq46_",        # Lorenz / span dedup / RRF / cosine near-dup
    "dq62_", "dq122_", "dq160_", "dq72_",        # winnowing / Lloyd / Q21 / pagerank
]

# fact-table key columns shifted by rep * (max+1) per replica; dimension
# tables (region/nation/supplier/part) are copied once — FKs into them
# stay valid, exactly like TPC-H scaling keeps dim cardinality sublinear
SHIFTED = {
    "customer": ["c_custkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey"],
    "events": ["event_id", "user_id"],
}
COPIED = ["region", "nation", "supplier", "part"]


def _read(src_dir: str, name: str):
    import glob

    import pyarrow.parquet as pq

    p = os.path.join(src_dir, f"{name}.parquet")
    if os.path.isfile(p):
        return pq.read_table(p)
    return pq.read_table(sorted(glob.glob(os.path.join(p, "*.parquet"))))


def synthesize_relational(src_dir: str, out_dir: str, factor: int) -> None:
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    for name in COPIED:
        t = _read(src_dir, name)
        pq.write_table(t, os.path.join(out_dir, f"{name}.parquet"))
        print(f"# {name}: copied {t.num_rows} rows", flush=True)
    for name, keys in SHIFTED.items():
        t = _read(src_dir, name)
        bases = {k: pc.max(t[k]).as_py() + 1 for k in keys}
        parts = [t]
        for rep in range(1, factor):
            cols = []
            for cname in t.column_names:
                col = t[cname]
                if cname in keys:
                    col = pc.cast(
                        pc.add(col, rep * bases[cname]), t.schema.field(
                            cname).type)
                cols.append(col)
            parts.append(pa.table(cols, schema=t.schema))
        big = pa.concat_tables(parts)
        pq.write_table(big, os.path.join(out_dir, f"{name}.parquet"),
                       row_group_size=1_000_000)
        print(f"# {name}: {t.num_rows} -> {big.num_rows} rows", flush=True)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--dir", default="/tmp/sf1_gate")
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--out", default=None,
                    help="write the GATE json artifact here")
    ap.add_argument("--filters", default=None,
                    help="comma-separated name substrings (default: the "
                         "flagship subset)")
    args = ap.parse_args()

    marker = os.path.join(args.dir, "_SF1_READY")
    if not os.path.exists(marker):
        synthesize_relational(args.sf_dir, args.dir, args.factor)
        # documents + embeddings through the measured-scaling synthesizer
        # (constant pair density, perturbed re-normalized embeddings)
        from multi_model_vectorsearch_spark import get_spark
        from scale_probe import synthesize

        spark = get_spark("gate-sf1-synth")
        spark.sparkContext.setLogLevel("ERROR")
        synthesize(spark, args.sf_dir, args.dir, args.factor,
                   pair_density="constant")
        spark.stop()
        with open(marker, "w") as fh:
            fh.write("ok")
        print(f"# synthesized {args.dir} at factor {args.factor}",
              flush=True)

    filters = (args.filters.split(",") if args.filters
               else FLAGSHIP_FILTERS)
    cmd = [sys.executable,
           os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "check_correctness.py")]
    if args.out:
        cmd += ["--out", args.out]
    cmd += [args.dir] + filters
    print("#", " ".join(cmd), flush=True)
    return subprocess.call(cmd)


if __name__ == "__main__":
    raise SystemExit(main())
