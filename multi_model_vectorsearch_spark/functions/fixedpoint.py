"""Cross-engine-inert fixed-point snaps for hash-checked double outputs.

The driver compares Spark results against a DuckDB oracle by hashing
values. ``round(x, 6)`` is NOT a safe final output for that comparison:
Spark rounds the double's shortest decimal repr
(``BigDecimal.valueOf(Double.toString(d))``) while DuckDB rounds the
binary value, so even bit-identical input doubles can round apart at
half boundaries (SURVEY.md §5.3 rule 6; falsified "output formatting is
exempt" in CORRECTNESS_r05: dq205/dq206/dq207/dq210). The cast
``CAST(x AS DECIMAL(p,s))`` has the same shortest-repr-vs-binary split.

``floor(x * 1e6 + 0.5)`` is three IEEE-754 ops (multiply, add, floor),
each exactly specified and identical in both engines — bit-identical
inputs give bit-identical BIGINT outputs, full stop. The registry
therefore emits rounded ratios as *micro-unit BIGINTs* (value × 1e6,
half-up; half-up-toward-+inf for negatives — same in both engines since
both use the same formula). The registry-wide type ban
(tests/test_entry.py) keeps raw DOUBLE out of declared outputs so the
hazard class cannot recur.

Scale envelope: exact for |x| < 2^53/scale (≈ 9.0e9 at scale=1e6) —
far above any ratio/score/statistic emitted here. Above that the
multiply itself loses integer precision but remains bit-identical
across engines (same IEEE double in, same out), so the hash still
matches; only the user-facing last digits would be approximate.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MICRO = 1_000_000


def snap(x: Column, scale: int = MICRO) -> Column:
    """``floor(x·scale + 0.5)`` as BIGINT — the engine-identical
    replacement for ``round(x, 6)`` (scale=1e6) on a hash-checked output.
    NULL-safe (floor(NULL) is NULL in both engines)."""
    return F.floor(x * F.lit(float(scale)) + F.lit(0.5)).cast("bigint")


def snap_sql(expr: str, scale: int = MICRO) -> str:
    """DuckDB-side twin of :func:`snap` — textually mirrors the same
    three IEEE ops so the oracle produces the same BIGINT."""
    return f"CAST(floor(({expr}) * {float(scale)} + 0.5) AS BIGINT)"


def snap_double(x: Column, scale: int = MICRO) -> Column:
    """``floor(x·scale + 0.5) / scale`` as DOUBLE — the serving-path
    rounding convention. One convention everywhere: ``F.round(x, 6)``
    (half-up on the shortest decimal repr) and ``np.round(x, 6)``
    (half-to-even on the binary value) can rank a tie at the 6th decimal
    differently between the JVM join path and the Arrow kernel path, which
    the kernel≡join equivalence contract forbids. The numpy twin is
    ``np.floor(x * scale + 0.5) / scale`` — the same three IEEE-754 ops,
    bit-identical on bit-identical input."""
    return F.floor(x * F.lit(float(scale)) + F.lit(0.5)) / F.lit(float(scale))
