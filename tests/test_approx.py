"""t1 bound checks for approximate operators excluded from the oracle set."""

from __future__ import annotations

import pyspark.sql.functions as F

from multi_model_vectorsearch_spark.operators.ann import (
    cosine_neardup_hof,
    dq46_cosine_neardup_topk,
)
from multi_model_vectorsearch_spark.operators.relational import (
    dq57_approx_distinct,
)


def test_approx_distinct_within_rsd_bound(tables):
    """dq57's est_ok carries the rsd bound (the raw HLL estimate is
    engine-specific and excluded from the hash set); exact_u must match
    an independent exact count."""
    got = {r.o_orderstatus: r for r in dq57_approx_distinct(tables).collect()}
    exact = {
        r.o_orderstatus: r.u
        for r in tables["orders"]
        .groupBy("o_orderstatus")
        .agg(F.countDistinct("o_custkey").alias("u"))
        .collect()
    }
    assert got.keys() == exact.keys()
    for status, u in exact.items():
        assert got[status].exact_u == u
        assert got[status].est_ok == 1, status


def test_blocked_neardup_matches_hof_form(tables):
    """The numpy-blocked dq46 and the pure-SQL HOF form agree exactly."""
    blocked = [tuple(r) for r in dq46_cosine_neardup_topk(tables).collect()]
    hof = [tuple(r) for r in cosine_neardup_hof(tables).collect()]
    assert blocked == hof


def test_approx_quantiles_near_exact(tables):
    """dq140: the sketch's p50 must sit within 2% of dq59's exact p50."""
    from multi_model_vectorsearch_spark.operators.relational import (
        dq59_percentiles,
        dq140_approx_quantiles,
    )

    exact = {r["l_returnflag"]: r["q50_micro"]
             for r in dq59_percentiles(tables).collect()}
    got = {r["l_returnflag"]: r
           for r in dq140_approx_quantiles(tables).collect()}
    assert set(exact) == set(got)
    n_total = sum(r.n for r in got.values())
    assert n_total == tables["lineitem"].count()
    for flag in exact:
        assert got[flag].p50_ok == 1, flag
        assert got[flag].p95_ok == 1, flag


def test_hll_rollup_bound(tables):
    """dq196: the unioned-sketch estimate must sit within HLL error of the
    exact global distinct, and per-day distinct counts must over-count it
    (users active on multiple days)."""
    from multi_model_vectorsearch_spark.operators.relational import (
        dq196_hll_rollup,
    )

    r = dq196_hll_rollup(tables).first()
    assert r.n_days >= 1
    assert r.sum_daily_distinct >= r.exact_distinct
    assert r.est_ok == 1, r


def test_dq247_simhash48_banding_complete_vs_bruteforce(spark, tables):
    """dq247's pigeonhole contract, proven against brute force: banding
    4 x 12-bit bands must find EVERY doc pair within Hamming distance 3
    (any 3 flipped bits spoil at most 3 of 4 bands) and nothing beyond.
    The oracle SQL shares the banding construction, so only an
    all-pairs reference can catch a banding blind spot."""
    from pyspark.sql import functions as F

    from multi_model_vectorsearch_spark.operators.textpipe import (
        _simhash_wide,
        dq247_simhash48_band_pairs,
    )

    t = {"documents": tables["documents"].limit(300)}
    got = {(r.d1, r.d2, r.hd)
           for r in dq247_simhash48_band_pairs(t).collect()}

    sig = _simhash_wide(t)
    a = sig.select(F.col("doc_id").alias("d1"), F.col("simhash").alias("s1"))
    b = sig.select(F.col("doc_id").alias("d2"), F.col("simhash").alias("s2"))
    brute = {
        (r.d1, r.d2, r.hd)
        for r in a.join(b, F.col("d1") < F.col("d2"))
        .select("d1", "d2",
                F.bit_count(F.col("s1").bitwiseXOR(F.col("s2")))
                .cast("int").alias("hd"))
        .filter(F.col("hd") <= 3).collect()
    }
    assert got == brute, (
        f"banding missed {len(brute - got)} true pairs / "
        f"invented {len(got - brute)}")


def test_simhash_packed_votes_match_python_reference(spark, tables):
    """r14 optimization pin: the packed-counter vote kernel
    (textpipe._simhash_from_bits — 20-bit ones-counters, 3 per bigint
    accumulator, bit set iff 2·ones >= n) must produce signatures
    bit-identical to an independent per-bit Python reference implementing
    the classic vote-sign rule sum(bit·2−1) >= 0, at every declared width
    (16 = dq43/dq128, 48 = dq247, 64 = dq248). Docs with an EVEN number
    of distinct tokens exercise the 2·ones == n tie, which the rule
    resolves to bit = 1."""
    import hashlib

    from multi_model_vectorsearch_spark.operators.textpipe import (
        _simhash64_lanes,
        _simhash_wide,
    )

    t = {"documents": tables["documents"].limit(200)}
    docs = {r.doc_id: r.text for r in t["documents"].collect()}

    def py_sig(text: str, bits: int) -> int:
        toks = set(text.split(" "))
        n = len(toks)
        votes = [0] * bits
        for tok in toks:
            hv = int(hashlib.sha256(tok.encode()).hexdigest()[:bits // 4],
                     16)
            for b in range(bits):
                votes[b] += 2 * ((hv >> (bits - 1 - b)) & 1) - 1
        sig = 0
        for b in range(bits):
            if votes[b] >= 0:
                sig |= 1 << (bits - 1 - b)
        return sig

    has_tie = any(len(set(text.split(" "))) % 2 == 0
                  for text in docs.values())
    assert has_tie, "fixture must exercise the even-n vote tie"

    for bits in (16, 48):
        got = {r.doc_id: r.simhash
               for r in _simhash_wide(t, bits).collect()}
        assert got == {d: py_sig(txt, bits) for d, txt in docs.items()}, bits

    got64 = {r.doc_id: (r.sig_hi, r.sig_lo)
             for r in _simhash64_lanes(t).collect()}
    exp64 = {}
    for d, txt in docs.items():
        s = py_sig(txt, 64)
        exp64[d] = (s >> 32, s & 0xFFFFFFFF)
    assert got64 == exp64


def test_dq248_simhash64_banding_complete_vs_bruteforce(spark, tables):
    """dq248's pigeonhole contract at the 100 TB width, proven against
    brute force: the 4 x 16-bit bands tile all 64 signature bits, so
    banding must find EVERY doc pair within two-lane Hamming distance
    3 and nothing beyond. The oracle SQL shares the banding
    construction, so only an all-pairs reference can catch a banding
    blind spot (a band boundary that skips or double-counts a bit)."""
    from pyspark.sql import functions as F

    from multi_model_vectorsearch_spark.operators.textpipe import (
        _simhash64_lanes,
        dq248_simhash64_band_pairs,
    )

    t = {"documents": tables["documents"].limit(300)}
    got = {(r.d1, r.d2, r.hd)
           for r in dq248_simhash64_band_pairs(t).collect()}

    sig = _simhash64_lanes(t)
    a = sig.select(F.col("doc_id").alias("d1"),
                   F.col("sig_hi").alias("ha"), F.col("sig_lo").alias("la"))
    b = sig.select(F.col("doc_id").alias("d2"),
                   F.col("sig_hi").alias("hb"), F.col("sig_lo").alias("lb"))
    hd = (F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
          + F.bit_count(F.col("la").bitwiseXOR(F.col("lb")))).cast("int")
    brute = {
        (r.d1, r.d2, r.hd)
        for r in a.join(b, F.col("d1") < F.col("d2"))
        .select("d1", "d2", hd.alias("hd"))
        .filter(F.col("hd") <= 3).collect()
    }
    assert got == brute, (
        f"banding missed {len(brute - got)} true pairs / "
        f"invented {len(got - brute)}")
    # the lanes really are 32-bit: a value escaping [0, 2^32) would
    # break both the band math and the exact-arithmetic oracle claim
    bad = sig.filter(
        (F.col("sig_hi") < 0) | (F.col("sig_hi") >= 2 ** 32)
        | (F.col("sig_lo") < 0) | (F.col("sig_lo") >= 2 ** 32)).count()
    assert bad == 0
