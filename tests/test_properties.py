"""Property-based tests (hypothesis) for kernels and join rewrites.

Pure-Python kernels get wide random coverage; the Spark property uses few
examples (each example runs real jobs) with deadline disabled.
"""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from multi_model_vectorsearch_spark.functions.embedding import hash_embed_text


@given(st.text(max_size=200))
@settings(max_examples=200)
def test_hash_embed_unit_norm_and_determinism(text):
    v1 = hash_embed_text(text)
    v2 = hash_embed_text(text)
    assert v1 == v2
    assert len(v1) == 16
    assert math.isclose(math.fsum(x * x for x in v1), 1.0, rel_tol=1e-9)


@given(st.text(max_size=50), st.text(max_size=50))
@settings(max_examples=100)
def test_hash_embed_distinct_inputs_disagree(a, b):
    if a != b:
        assert hash_embed_text(a) != hash_embed_text(b)


@given(
    st.lists(st.integers(0, 5), min_size=0, max_size=30),
    st.lists(st.integers(0, 5), min_size=0, max_size=10),
)
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_salted_join_property(spark, left_keys, right_keys):
    """salted_join == plain inner join for arbitrary key multisets,
    including hot keys (every left key equal) and empty sides."""
    from multi_model_vectorsearch_spark.operators.scale import salted_join

    left = spark.createDataFrame(
        [(k, i) for i, k in enumerate(left_keys)] or [], "k int, lv int"
    )
    right = spark.createDataFrame(
        [(k, i * 10) for i, k in enumerate(right_keys)] or [], "k int, rv int"
    )
    plain = sorted(map(tuple, left.join(right, "k").collect()))
    salted = sorted(map(tuple, salted_join(left, right, "k", n_salts=3).collect()))
    assert salted == plain


def _brute_components(edges):
    """Union-find ground truth: v -> min id of its component."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {v: find(v) for v in parent}


def test_star_contraction_deep_chain_round_bound(spark):
    """A 256-node chain (diameter 255, the propagation worst case) must
    converge under star contraction in O(log² n) rounds — the bound that
    motivates the fallback — and label every node with component min 0."""
    import math as m

    from multi_model_vectorsearch_spark.operators.graph import star_contract

    n = 256
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "src bigint, dst bigint"
    )
    labels, rounds = star_contract(chain)
    assert rounds <= m.ceil(m.log2(n)) ** 2
    got = {r.v: r.comp for r in labels.collect()}
    assert got == {i: 0 for i in range(n)}


def test_connected_components_falls_back_and_matches_bruteforce(spark):
    """With the propagation budget squeezed to 1 round the star fallback
    must engage and still produce exact labels on a multi-component graph
    (chain + triangle + isolated pair)."""
    from multi_model_vectorsearch_spark.operators.graph import (
        connected_components,
    )

    edges = (
        [(i, i + 1) for i in range(40, 80)]          # deep chain
        + [(0, 1), (1, 2), (2, 0)]                    # triangle
        + [(100, 101)]                                # pair
    )
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    got = {r.v: r.comp
           for r in connected_components(
               df, max_prop_rounds=1, max_driver_edges=0).collect()}
    assert got == _brute_components(edges)


def test_connected_components_driver_unionfind_matches_distributed(spark):
    """Under max_driver_edges the exact driver union-find engages; its
    labels must equal the distributed propagation path's."""
    from multi_model_vectorsearch_spark.operators.graph import (
        connected_components,
    )

    edges = ([(i, i + 1) for i in range(20)]
             + [(50, 51), (51, 52), (52, 50), (90, 91)])
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    fast = {r.v: r.comp for r in connected_components(df).collect()}
    dist = {r.v: r.comp
            for r in connected_components(
                df, max_driver_edges=0).collect()}
    assert fast == dist == _brute_components(edges)


@given(
    st.lists(
        st.tuples(st.integers(0, 40), st.integers(0, 40)),
        min_size=1, max_size=60,
    )
)
@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_star_contraction_random_graphs_match_bruteforce(spark, raw):
    """star_contract == union-find on arbitrary graphs (self-loops and
    duplicate edges included)."""
    from multi_model_vectorsearch_spark.operators.graph import star_contract

    edges = [(a, b) for a, b in raw if a != b]
    if not edges:
        return
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    labels, _ = star_contract(df)
    assert {r.v: r.comp for r in labels.collect()} == _brute_components(edges)


def test_countmin_estimates_never_undercount(spark, tables):
    """Count-min property: est >= true count for every audited token, and
    the top-1 token's estimate is exact or above."""
    from multi_model_vectorsearch_spark.operators.curation import (
        dq164_countmin_freq,
    )

    rows = dq164_countmin_freq(tables).collect()
    assert len(rows) > 0
    for r in rows:
        assert r.est >= r.c, (r.tok, r.c, r.est)
        assert r.overcount == r.est - r.c


def test_dup_spans_finds_planted_overlap(spark):
    """A planted 40-word verbatim overlap between two docs must surface as
    one long span; unrelated docs must not pair. Oracle-independent: the
    DuckDB oracle mirrors the fingerprint math, so a shared logic bug
    would pass the gate — this pins the semantics to a known plant."""
    from multi_model_vectorsearch_spark.operators import textpipe as T

    shared = " ".join(f"tok{i}x" for i in range(40))
    docs = spark.createDataFrame(
        [
            (1, "alpha beta " + shared + " gamma delta"),
            (2, "omega " + shared + " psi chi phi"),
            (3, " ".join(f"other{i}" for i in range(50))),
        ],
        "doc_id bigint, text string",
    )
    out = T.dq168_dup_spans({"documents": docs}).collect()
    pairs = {(r.d1, r.d2): r for r in out}
    assert set(pairs) == {(1, 2)}
    r = pairs[(1, 2)]
    # 40 shared words = 38 shared 3-grams; winnowed anchors must merge into
    # ONE span covering most of the diagonal (>= w+2 guarantee, minus edges)
    assert r.n_spans == 1
    assert r.max_span_grams >= 20
    assert r.n_anchors >= 3


def test_source_cap_uniform_and_capped(spark):
    from multi_model_vectorsearch_spark.operators import curation as C

    docs = spark.createDataFrame(
        [(i, f"s{i % 3}") for i in range(600)],
        "doc_id bigint, source string",
    )
    out = C.dq169_source_cap({"documents": docs}, cap=50).collect()
    by_src = {}
    for r in out:
        by_src.setdefault(r.source, []).append(r)
    # every source capped exactly (each has 200 candidates)
    assert {s: len(v) for s, v in by_src.items()} == {
        "s0": 50, "s1": 50, "s2": 50}
    # ranks are 1..cap and the selection is deterministic across runs
    assert all(sorted(x.rn for x in v) == list(range(1, 51))
               for v in by_src.values())
    again = C.dq169_source_cap({"documents": docs}, cap=50).collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, out))


def test_scalable_ntile_edge_sizes(spark):
    """N < tiles and N % tiles != 0 must match the window ntile exactly."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F
    from multi_model_vectorsearch_spark.operators import scale as S

    for n in (3, 5, 9, 17):
        df = spark.createDataFrame(
            [(i, float((i * 7919) % 97)) for i in range(n)],
            "c_custkey bigint, c_acctbal double",
        )
        w = Window.orderBy("c_acctbal", "c_custkey")
        want = sorted(map(tuple, df.select(
            "c_custkey", F.ntile(4).over(w).cast("int").alias("q")
        ).collect()))
        got = sorted(map(tuple, S.dq171_global_ntile_scalable(
            {"customer": df}).collect()))
        assert got == want, f"n={n}"


def test_label_prop_recovers_planted_clusters(spark):
    """Vectors planted in well-separated clusters must receive their
    cluster's label — the semantic check the oracle (which mirrors the
    implementation) cannot provide."""
    import math
    from multi_model_vectorsearch_spark.operators import vector_ops as VO

    rows = []
    for i in range(60):
        c = i % 3  # cluster = label
        base = [0.0] * 6
        base[c * 2] = 1.0
        # small deterministic jitter, well inside the cluster margin
        jit = [(((i * 31 + d) % 7) - 3) * 0.01 for d in range(6)]
        vec = [b + j for b, j in zip(base, jit)]
        n = math.sqrt(sum(x * x for x in vec))
        rows.append((i, [float(x / n) for x in vec], c))
    emb = spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>, label bigint")
    # seed = first 15 vectors (5 annotated per cluster); the other 45
    # are propagation targets
    out = VO.dq170_knn_label_prop({"embeddings": emb}, seed_size=15).collect()
    assert len(out) == 45
    assert all(r.pred_label == r.true_label for r in out)


@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    L=st.integers(min_value=15, max_value=60),
    off1=st.integers(min_value=0, max_value=30),
    off2=st.integers(min_value=0, max_value=30),
)
def test_dup_spans_detects_random_planted_overlaps(spark, L, off1, off2):
    """Fuzz the span detector: a planted L-word overlap at arbitrary
    offsets must always be reported for the planted pair (winnowing
    guarantees shared fingerprints for any match of >= w+2 words), with a
    span covering a reasonable fraction of it; disjoint-vocabulary docs
    must never pair."""
    from multi_model_vectorsearch_spark.operators import textpipe as T

    shared = " ".join(f"s{i}q" for i in range(L))
    d1 = " ".join(f"a{i}z" for i in range(off1)) + " " + shared
    d2 = " ".join(f"b{i}z" for i in range(off2)) + " " + shared + " tail1 tail2"
    d3 = " ".join(f"c{i}z" for i in range(40))
    docs = spark.createDataFrame(
        [(1, d1.strip()), (2, d2.strip()), (3, d3)],
        "doc_id bigint, text string",
    )
    out = {(r.d1, r.d2): r for r in T.dq168_dup_spans({"documents": docs}).collect()}
    assert (1, 2) in out
    assert out[(1, 2)].max_span_grams >= max(1, (L - 2) // 3)
    assert all(k == (1, 2) for k in out)


@given(
    st.lists(  # corpus: each doc is a list of word-ids; short docs allowed
        st.lists(st.integers(0, 12), min_size=0, max_size=18),
        min_size=2, max_size=12,
    ),
    st.sampled_from([0.4, 0.6, 0.8]),
)
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_prefix_filter_lossless_property(spark, docs, tau):
    """dq183's prefix+positional filters must find EXACTLY the pairs the
    brute-force O(n²) scan finds, for random corpora — including docs too
    short to shingle, duplicate docs, and tau edge values."""
    from multi_model_vectorsearch_spark.operators.textpipe import (
        SHINGLE_W,
        dq183_prefix_filter_join,
    )

    rows = [(i, " ".join(f"w{w}" for w in ws)) for i, ws in enumerate(docs)]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.d1, r.d2): r.jaccard
        for r in dq183_prefix_filter_join({"documents": d}, tau=tau).collect()
    }
    # brute force in pure Python over the same shingle definition
    sets = {}
    for i, ws in enumerate(docs):
        toks = [f"w{w}" for w in ws]
        sets[i] = {
            " ".join(toks[j:j + SHINGLE_W])
            for j in range(len(toks) - SHINGLE_W + 1)
        }
    expect = {}
    for i in sets:
        for j in sets:
            if i < j and sets[i] and sets[j]:
                inter = len(sets[i] & sets[j])
                jac = round(inter / (len(sets[i]) + len(sets[j]) - inter), 6)
                if jac >= tau:
                    expect[(i, j)] = jac
    assert got == expect


@given(
    st.lists(
        st.tuples(st.integers(0, 2),               # user
                  st.integers(0, 40),              # hour bucket offset
                  st.integers(-10_000, 10_000)),   # cents
        min_size=1, max_size=60,
    )
)
@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_ewma_matches_python_reference(spark, rows):
    """dq198's in-plan integer kernel equals a direct Python replay of
    the same power-of-two EWMA on arbitrary (user, hour, cents) data."""
    from collections import defaultdict

    from multi_model_vectorsearch_spark.operators.timeseries import dq198_ewma

    df = spark.createDataFrame(
        [(i, f"2024-01-0{1 + h // 24} {h % 24:02d}:30:00", u, "a",
          c / 100.0, "{}")
         for i, (u, h, c) in enumerate(rows)],
        "event_id long, ts string, user_id long, event_type string, "
        "value double, props string",
    )
    from pyspark.sql import functions as F

    df = df.withColumn("ts", F.to_timestamp("ts"))
    got = {(r.user_id, r.hb): r.ewma_micro
           for r in dq198_ewma({"events": df}).collect()}

    buckets = defaultdict(int)
    for u, h, c in rows:
        buckets[(u, h)] += c
    by_user = defaultdict(list)
    for (u, h), c in sorted(buckets.items()):
        by_user[u].append((h, c))
    # compare the hb-ordered EWMA series per user (absolute epoch hour
    # buckets on the engine side map 1:1 onto the relative series here)
    span = 20
    got_series = defaultdict(list)
    for (u, hb), v in sorted(got.items()):
        got_series[u].append(v)
    for u, series in by_user.items():
        expect = []
        import math

        for i in range(len(series)):
            frame = series[max(0, i - span + 1): i + 1]
            num = sum(c << (span - 1 - j)
                      for j, (_, c) in enumerate(reversed(frame)))
            den = (1 << span) - (1 << (span - len(frame)))
            # mirror the engine's micro floor snap exactly
            expect.append(math.floor(num / den / 100.0 * 1_000_000.0 + 0.5))
        assert len(got_series[u]) == len(expect)
        for g, w in zip(got_series[u], expect):
            assert g == w, (u, g, w)


@given(
    st.lists(
        st.tuples(st.sampled_from(["A", "N", "R"]),
                  st.integers(1, 500),              # price in whole units
                  st.integers(1, 50)),              # quantity weight
        min_size=1, max_size=80,
    )
)
@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_weighted_median_matches_python_reference(spark, rows):
    """dq199's window formulation equals the direct definition: smallest
    price whose cumulative weight reaches half the total."""
    from collections import defaultdict

    from multi_model_vectorsearch_spark.operators.relational import (
        dq199_weighted_median,
    )

    df = spark.createDataFrame(
        [(f, float(p), float(q)) for f, p, q in rows],
        "l_returnflag string, l_extendedprice double, l_quantity double",
    )
    got = {r.l_returnflag: r.wmedian_cents / 100.0
           for r in dq199_weighted_median({"lineitem": df}).collect()}

    weights = defaultdict(lambda: defaultdict(int))
    for f, p, q in rows:
        weights[f][p] += q
    for f, wmap in weights.items():
        total = sum(wmap.values())
        cum = 0
        for p in sorted(wmap):
            cum += wmap[p]
            if 2 * cum >= total:
                assert got[f] == float(p), (f, got[f], p)
                break


def test_pair_band_join_equals_single_band_reference(spark, tables):
    """The r7 scale rewrite: dq41 joins on 2-seed pair-band keys
    (background bucket collisions ~j² instead of ~j) and decodes
    ``matches`` from the pair-band collision count C(m, 2). This pins the
    rewrite to the definitional single-seed-band formulation — identical
    (d1, d2, matches) set on the real corpus — so a future band change
    cannot silently alter the candidate semantics every dedup chain
    consumes."""
    from pyspark.sql import functions as F

    from multi_model_vectorsearch_spark.operators.textpipe import (
        dq40_minhash_signatures,
        dq41_minhash_lsh_pairs,
    )

    sig = dq40_minhash_signatures(tables)
    a, b = sig.alias("a"), sig.alias("b")
    ref = (
        a.join(b, (F.col("a.seed") == F.col("b.seed"))
               & (F.col("a.mh") == F.col("b.mh"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("d1"), F.col("b.doc_id").alias("d2"))
        .agg(F.count("*").alias("matches"))
        .filter(F.col("matches") >= 2)
    )
    got = dq41_minhash_lsh_pairs(tables).select("d1", "d2", "matches")
    assert sorted(map(tuple, got.collect())) == \
        sorted(map(tuple, ref.collect()))
    assert got.count() > 0  # non-vacuous on the smoke corpus
