"""Semantics tests for the round-4 operator batch (dq183-dq194).

Hash-equality with the DuckDB oracle is pinned in test_correctness; these
tests pin the properties the oracle can't see — the prefix filter actually
PRUNES, OHLC bars are internally consistent, tombstones delete, PSI is
non-negative, and z-order buckets are tight in BOTH clustering columns.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from multi_model_vectorsearch_spark.operators.relational import dq186_basket_lift
from multi_model_vectorsearch_spark.operators.retrieval import dq185_inverted_index
from multi_model_vectorsearch_spark.operators.scale import dq189_zorder_layout
from multi_model_vectorsearch_spark.operators.textpipe import (
    dq183_prefix_filter_join,
    prefix_filter_candidates,
)
from multi_model_vectorsearch_spark.operators.timeseries import (
    dq184_ohlc_bars,
    dq187_changelog_compact,
    dq188_psi_drift,
)


def test_prefix_filter_prunes(tables):
    """The candidate set must be a small fraction of all doc pairs — the
    whole point of the AllPairs prefix filter — while dq183 (oracle-equal
    to brute force) proves no qualifying pair is pruned away."""
    n_docs = tables["documents"].count()
    all_pairs = n_docs * (n_docs - 1) // 2
    n_cand = prefix_filter_candidates(tables, 0.6).count()
    n_result = dq183_prefix_filter_join(tables).count()
    assert n_result > 0
    assert n_cand >= n_result  # candidates are a superset of the answer
    assert n_cand < 0.2 * all_pairs, (
        f"prefix filter kept {n_cand}/{all_pairs} pairs — not pruning"
    )


def test_ohlc_internal_consistency(tables):
    bars = dq184_ohlc_bars(tables)
    bad = bars.filter(
        (F.col("low_cents") > F.col("open_cents"))
        | (F.col("low_cents") > F.col("close_cents"))
        | (F.col("high_cents") < F.col("open_cents"))
        | (F.col("high_cents") < F.col("close_cents"))
        | (F.col("n") < 1)
    ).count()
    assert bad == 0
    # single-event bars collapse: open == close == high == low
    solo_bad = bars.filter(
        (F.col("n") == 1) & ((F.col("open_cents") != F.col("close_cents"))
                             | (F.col("high_cents") != F.col("low_cents")))
    ).count()
    assert solo_bad == 0


def test_inverted_index_postings_bounded(tables):
    idx = dq185_inverted_index(tables, min_df=5, max_postings=8).collect()
    assert len(idx) > 0
    for r in idx:
        assert r.df >= 5
        postings = [int(x) for x in r.postings_head.split(",")]
        assert 1 <= len(postings) <= 8
        assert postings == sorted(postings)
        assert r.total_tf >= r.df  # every posting has tf >= 1


def test_basket_lift_shape(tables):
    rows = dq186_basket_lift(tables, min_pair_n=2, k=50).collect()
    assert len(rows) > 0
    for r in rows:
        assert r.b1 < r.b2
        assert 0 < r.support_micro <= 1_000_000
        assert r.lift_micro > 0


def test_changelog_tombstones_delete(tables, spark):
    """A user survives compaction iff their LAST op (ts, event_id order)
    is not a purchase tombstone — re-derived via an independent window
    plan and compared as sets."""
    from pyspark.sql import Window

    ev = tables["events"]
    w = Window.partitionBy("user_id").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    last = (
        ev.withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
    )
    expect_alive = {
        r.user_id for r in last.filter("event_type != 'purchase'").collect()
    }
    got_alive = {r.user_id for r in dq187_changelog_compact(tables).collect()}
    assert got_alive == expect_alive
    assert len(got_alive) > 0


def test_psi_nonnegative(tables):
    """Each PSI term (p-q)ln(p/q) is >= 0 (same-sign factors), so the sum
    must be too; buckets are capped at n_buckets."""
    rows = dq188_psi_drift(tables).collect()
    assert len(rows) > 0
    for r in rows:
        # pico-unit integer PSI; per-bucket snap can dip a hair below 0
        assert r.psi_pico >= -r.n_buckets_hit
        assert 1 <= r.n_buckets_hit <= 10


def test_zorder_buckets_tight_in_both_columns(tables):
    """Top-4-bit z-buckets hold ~2 bits of EACH coordinate, so a bucket's
    per-column range must be well under the full domain — the data-skipping
    property a linear sort only gives its leading column."""
    li = tables["lineitem"]
    lo_pk, hi_pk, lo_sk, hi_sk = li.agg(
        F.min("l_partkey"), F.max("l_partkey"),
        F.min("l_suppkey"), F.max("l_suppkey"),
    ).first()
    pk_dom = hi_pk - lo_pk + 1
    sk_dom = hi_sk - lo_sk + 1
    stats = dq189_zorder_layout(tables).collect()
    assert len(stats) == 16
    worst_pk = max((r.pk_max - r.pk_min + 1) / pk_dom for r in stats)
    worst_sk = max((r.sk_max - r.sk_min + 1) / sk_dom for r in stats)
    # 2 bits of each coordinate -> each bucket spans ~1/4 of each domain
    # (binning slop allowed); a linear sort would put ~1.0 on one side.
    assert worst_pk <= 0.35, worst_pk
    assert worst_sk <= 0.35, worst_sk


def test_kcore_peels_low_degree_nodes(tables):
    """No node whose ORIGINAL degree is < k can be in the core (round 1
    removes it); core degrees never exceed original degrees."""
    from multi_model_vectorsearch_spark.operators.graph import (
        dq190_kcore,
        dq33_build_edges,
    )

    edges = dq33_build_edges(tables).select("src", "dst")
    orig = {}
    for r in edges.collect():
        orig[r.src] = orig.get(r.src, 0) + 1
        orig[r.dst] = orig.get(r.dst, 0) + 1
    rows = dq190_kcore(tables, k=2).collect()
    assert len(rows) == len(orig)
    assert any(r.in_kcore for r in rows)
    for r in rows:
        assert r.core_deg <= orig[r.id]
        if orig[r.id] < 2:
            assert not r.in_kcore


def test_pit_features_no_leakage(tables):
    """Re-derive the PIT features in pure Python for a handful of users:
    only strictly-earlier events may contribute."""
    from decimal import Decimal

    from multi_model_vectorsearch_spark.operators.timeseries import (
        dq191_pit_features,
    )

    got = {
        (r.user_id, r.event_id): r
        for r in dq191_pit_features(tables).collect()
        if r.user_id < 5
    }
    assert got, "no purchases for users 0-4 in the smoke fixture"
    ev = sorted(
        ((r.user_id, int(r.ts.timestamp() * 1_000_000), r.event_id,
          r.event_type, r.value)
         for r in tables["events"].filter("user_id < 5").collect()),
        key=lambda x: (x[0], x[1], x[2]),
    )
    for uid, us, eid, etype, val in ev:
        if etype != "purchase":
            continue
        hist = [e for e in ev if e[0] == uid
                and (e[1], e[2]) < (us, eid)]
        views_prior = [e for e in hist if e[3] == "view"]
        v24 = [e for e in ev if e[0] == uid and e[3] == "view"
               and us - 86_400_000_000 <= e[1] <= us - 1]
        r = got[(uid, eid)]
        assert r.views_24h == len(v24)
        exp_spend_cents = int(sum(
            Decimal(str(round(e[4], 2))) * 100 for e in v24)) if v24 else 0
        assert r.view_spend_24h_cents == exp_spend_cents
        if views_prior:
            assert r.last_view_value_cents == round(
                views_prior[-1][4] * 100)
        else:
            assert r.last_view_value_cents is None


def test_source_kl_accounting(tables):
    """Per-source token totals must add to the corpus total and vocab_used
    can't exceed n_tokens; KL is finite (smoothing forbids inf/nan)."""
    import math

    from multi_model_vectorsearch_spark.operators.curation import (
        dq192_source_kl,
    )
    from pyspark.sql import functions as F

    rows = dq192_source_kl(tables).collect()
    assert len(rows) > 1
    total = tables["documents"].select(
        F.sum(F.size(F.split("text", " ")))).first()[0]
    assert sum(r.n_tokens for r in rows) == total
    for r in rows:
        assert r.vocab_used <= r.n_tokens
        # pico-unit integer KL: finite by construction; per-term snap can
        # dip a hair below zero on a perfectly matching source
        assert r.kl_pico >= -r.vocab_used


def test_user_trend_matches_numpy(tables):
    """The exact-moment closed form must agree with numpy's least squares
    on a sampled user (same x=day, y=value inputs)."""
    import numpy as np

    from multi_model_vectorsearch_spark.operators.timeseries import (
        dq193_user_trend,
    )

    rows = dq193_user_trend(tables).collect()
    assert rows
    r = max(rows, key=lambda r: r.n)  # most active user: stable fit
    ev = tables["events"].filter(f"user_id = {r.user_id}").collect()
    x = np.array([int(e.ts.timestamp() * 1e6) // 86_400_000_000
                  for e in ev], dtype=float)
    y = np.array([round(e.value, 2) for e in ev])
    slope = np.polyfit(x, y, 1)[0]
    r2 = np.corrcoef(x, y)[0, 1] ** 2
    assert abs(r.slope_micro / 1e6 - slope) < 2e-6
    assert abs(r.r2_micro / 1e6 - r2) < 2e-6
    assert 0 <= r.r2_micro <= 1_000_000


def test_ohlc_pre_epoch_timestamps(spark):
    """The (ts, event_id) order key must stay correct for NEGATIVE
    epoch-us timestamps (pre-1970): a bare zero-padded '%020d' of a
    negative number inverts the order; the 2^62 offset fixes it."""
    import datetime as dt

    from multi_model_vectorsearch_spark.operators.timeseries import (
        dq184_ohlc_bars,
    )

    utc = dt.timezone.utc
    rows = [
        # one pre-epoch hour, three events: order 1 -> 2 -> 3
        (1, dt.datetime(1969, 12, 31, 10, 0, 5, tzinfo=utc), 7, "view", 10.0, ""),
        (2, dt.datetime(1969, 12, 31, 10, 20, 0, tzinfo=utc), 7, "view", 50.0, ""),
        (3, dt.datetime(1969, 12, 31, 10, 59, 0, tzinfo=utc), 7, "view", 30.0, ""),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")
    bars = dq184_ohlc_bars({"events": ev}).collect()
    assert len(bars) == 1
    b = bars[0]
    assert b.open_cents == 1000, b  # earliest event, not lex victim
    assert b.close_cents == 3000, b  # latest event
    assert b.high_cents == 5000 and b.low_cents == 1000


def test_psi_constant_reference_half(spark):
    """A constant-valued reference half (hi == lo) must bucket everything
    into bucket 0 instead of null-dividing — and still emit a finite
    PSI row."""
    import datetime as dt
    import math

    from multi_model_vectorsearch_spark.operators.timeseries import (
        dq188_psi_drift,
    )

    utc = dt.timezone.utc
    t0 = dt.datetime(2024, 1, 1, tzinfo=utc)
    rows = []
    for i in range(20):
        # even event_id (reference): constant 5.0; odd (current): varies
        v = 5.0 if i % 2 == 0 else float(i)
        rows.append((i, t0, i % 3, "click", v, ""))
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")
    out = dq188_psi_drift({"events": ev}).collect()
    assert len(out) == 1
    assert out[0].psi_pico >= -out[0].n_buckets_hit
