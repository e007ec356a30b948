"""Table registry over the driver-generated parquet testdata.

Maps the corpus the reference keeps in Redis hashes (db.py:9-19) plus the
TPC-H-ish star schema onto columnar DataFrames. Loading is declarative
(``spark.read.parquet``) so Catalyst applies column pruning and predicate
pushdown into the scan.

The ``events`` table needs special handling on Spark 4.x: its ``ts`` column is
parquet TIMESTAMP(NANOS). With ``spark.sql.legacy.parquet.nanosAsLong=true``
it arrives as a BIGINT of nanoseconds; we re-expose it as a microsecond
TIMESTAMP via integer division (``div`` — double division would lose
precision at the 1e18 scale of epoch-nanos).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from multi_model_vectorsearch_spark.session import configure

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

#: Modality surrogate for the embeddings table (SURVEY.md §1.3): the reference
#: tags every document text/image/audio (main.py:49-70); the synthetic fixture
#: encodes it as label % 3.
MODALITIES = ("text", "image", "audio")


def default_sf_dir() -> str:
    return os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _events(spark: SparkSession, path: str) -> DataFrame:
    raw = spark.read.parquet(path)
    ts_type = dict(raw.dtypes)["ts"]
    if ts_type == "bigint":  # nanosAsLong path (Spark 4.x)
        raw = raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif ts_type == "timestamp_ntz":
        # parquet TIMESTAMP(MICROS, isAdjustedToUTC=false) arrives as
        # TIMESTAMP_NTZ; with the pinned UTC session timezone the cast is a
        # bit-identical reinterpretation, and downstream epoch math
        # (unix_micros) requires the instant type.
        raw = raw.withColumn("ts", F.col("ts").cast("timestamp"))
    return raw.select("event_id", "ts", "user_id", "event_type", "value", "props")


def load_tables(spark: SparkSession, sf_dir: str | None = None,
                register_views: bool = False) -> dict[str, DataFrame]:
    """Load every testdata table as a DataFrame; optionally register temp views.

    Idempotent and cheap: only schema inference happens eagerly.
    """
    configure(spark)
    sf_dir = sf_dir or default_sf_dir()
    out: dict[str, DataFrame] = {}
    for name in TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if not os.path.exists(path):
            continue
        df = _events(spark, path) if name == "events" else spark.read.parquet(path)
        if name == "embeddings":
            df = df.withColumn(
                "modality",
                F.element_at(F.array(*[F.lit(m) for m in MODALITIES]),
                             (F.col("label") % 3 + 1).cast("int")),
            )
        out[name] = df
        if register_views:
            df.createOrReplaceTempView(name)
    return out
