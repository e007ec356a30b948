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
