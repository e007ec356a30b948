"""Declared-query registration record (split out of dq.py, r9 item 6).

Each ``operators/registrations/<module>.py`` holds the DQ entries whose
builders live in ``operators/<module>.py``; ``dq.py`` stays the single
aggregation point (queries()/oracle_sql()/registry()) and pins the
historical gate order.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame


@dataclass(frozen=True)
class DQ:
    name: str
    builder: Callable[[dict], DataFrame]
    oracle: str | None  # None -> non-SQL-expressible; driver does rows-only check
    note: str = ""
    # Non-empty = this entry's DECLARED CONTRACT is scale-bounded: it is
    # deliberately excluded from the sf1 hash gate, and the string says
    # why and names the scale path that supersedes it (r13 verdict item
    # 2: an explicit per-entry declaration instead of a silent skip).
    # tests/test_entry.py binds the union of GATE_sf1*.json to exactly
    # the declared sf1 set, so a cap can never hide an unverified entry.
    scale_cap: str = ""
