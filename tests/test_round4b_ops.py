"""Semantics tests for the round-4b operator batch (dq198+).

Hash-equality with the DuckDB oracle is pinned in test_correctness; these
tests pin the properties the oracle can't see — the EWMA stays inside its
frame's value envelope, the weighted median actually balances cumulative
weight, and the compaction plan conserves rows and keeps bins date-contiguous.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from multi_model_vectorsearch_spark.operators.relational import (
    dq199_weighted_median,
)
from multi_model_vectorsearch_spark.operators.scale import dq201_compaction_plan
from multi_model_vectorsearch_spark.operators.timeseries import HOUR_US, dq198_ewma


def test_ewma_inside_frame_envelope(tables):
    """An EWMA is a convex combination of its frame, so it must lie within
    [min, max] of the trailing 20 hourly values (tolerance for the cent
    quantization + final rounding)."""
    hourly = (
        tables["events"]
        .select(
            "user_id",
            F.floor(F.unix_micros("ts") / HOUR_US).cast("bigint").alias("hb"),
            F.round(F.col("value") * 100).cast("bigint").alias("cents"),
        )
        .groupBy("user_id", "hb")
        .agg((F.sum("cents") / 100.0).alias("hv"))
    )
    from pyspark.sql import Window

    w = (
        Window.partitionBy("user_id").orderBy("hb")
        .rowsBetween(-19, Window.currentRow)
    )
    env = hourly.select(
        "user_id", "hb",
        F.min("hv").over(w).alias("lo"), F.max("hv").over(w).alias("hi"),
    )
    joined = dq198_ewma(tables).withColumn(
        "ewma", F.col("ewma_micro") / 1e6).join(env, ["user_id", "hb"])
    bad = joined.filter(
        (F.col("ewma") < F.col("lo") - 1e-6)
        | (F.col("ewma") > F.col("hi") + 1e-6)
    ).count()
    assert bad == 0
    assert joined.count() > 0


def test_ewma_single_row_group_is_identity(spark):
    """A user with one hourly bucket has EWMA == that bucket's value."""
    rows = [(1, "2024-01-01 00:10:00", 7, "view", 12.34, "{}")]
    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string, "
        "value double, props string"
    ).withColumn("ts", F.to_timestamp("ts"))
    out = dq198_ewma({"events": df}).collect()
    assert len(out) == 1
    assert out[0]["ewma_micro"] == 12_340_000


def test_weighted_median_balances_weight(tables_sf001):
    """For each flag the reported median m must satisfy the defining
    inequalities: weight(price <= m) >= half AND weight(price >= m) >= half
    of total quantity."""
    li = tables_sf001["lineitem"].select(
        "l_returnflag",
        F.col("l_extendedprice").alias("p"),
        F.col("l_quantity").cast("bigint").alias("q"),
    )
    med = dq199_weighted_median(tables_sf001).withColumn(
        "wmedian", F.col("wmedian_cents") / 100.0)
    j = li.join(med, "l_returnflag")
    chk = j.groupBy("l_returnflag").agg(
        F.sum("q").alias("tw"),
        F.sum(F.when(F.col("p") <= F.col("wmedian"), F.col("q"))
              .otherwise(F.lit(0))).alias("w_le"),
        F.sum(F.when(F.col("p") >= F.col("wmedian"), F.col("q"))
              .otherwise(F.lit(0))).alias("w_ge"),
    ).collect()
    assert len(chk) > 0
    for r in chk:
        assert 2 * r["w_le"] >= r["tw"], r
        assert 2 * r["w_ge"] >= r["tw"], r


def test_compaction_plan_conserves_and_orders(tables):
    plan = dq201_compaction_plan(tables, target_rows=500)
    rows = sorted(plan.collect(), key=lambda r: r["bin"])
    assert len(rows) > 1
    total = tables["orders"].count()
    assert sum(r["total_rows"] for r in rows) == total
    # bins are date-contiguous: each bin's range ends before the next begins
    for a, b in zip(rows, rows[1:]):
        assert a["d_max"] < b["d_min"]
    # next-fit bound: a bin's partitions all start (exclusive cumsum)
    # inside one target-sized window, so it can overshoot the target by
    # at most one partition's rows
    max_part = (
        tables["orders"].groupBy("o_orderdate").count()
        .agg(F.max("count")).collect()[0][0]
    )
    for r in rows:
        assert r["total_rows"] <= 500 + max_part - 1, r
    # bin ids are dense from 0
    assert rows[0]["bin"] == 0
    assert rows[-1]["bin"] == len(rows) - 1


def test_sorted_neighborhood_candidates_bounded(tables):
    """SNM emits at most window·n candidate pairs and never a self-pair;
    Jaccard is in (0, 1]."""
    from multi_model_vectorsearch_spark.operators.textpipe import (
        dq200_sorted_neighborhood,
    )

    out = dq200_sorted_neighborhood(tables, window=5, j_min=0.0)
    n_docs = tables["documents"].count()
    rows = out.collect()
    assert 0 < len(rows) <= 5 * n_docs
    for r in rows:
        assert r["d1"] != r["d2"]
        assert 0 <= r["jacc_micro"] <= 1_000_000


def test_bigram_lm_scores_every_doc_negative(tables):
    """Every doc gets a score; smoothed log-probs are strictly negative
    and n_bigrams is exactly token_count - 1."""
    from multi_model_vectorsearch_spark.operators.textpipe import dq202_bigram_lm

    out = dq202_bigram_lm(tables)
    docs = tables["documents"].select(
        "doc_id", (F.size(F.split("text", " ")) - 1).alias("want")
    )
    j = out.join(docs, "doc_id").collect()
    assert len(j) == tables["documents"].count()
    for r in j:
        assert r["mean_logp_micro"] < 0
        assert r["n_bigrams"] == r["want"]


def test_containment_dominates_jaccard(tables):
    """For any pair, containment(A in B) >= Jaccard(A, B): the asymmetric
    measure can only be larger (its denominator is smaller)."""
    from multi_model_vectorsearch_spark.operators.textpipe import (
        dq203_containment_join,
        jaccard_pairs_shared,
    )

    cont = dq203_containment_join(tables, c_min=0.0)
    p = jaccard_pairs_shared(tables).select(
        F.col("d1").alias("src"), F.col("d2").alias("dst"),
        (F.col("i") / (F.col("na") + F.col("nb") - F.col("i"))).alias("j"),
    )
    j = cont.join(p, ["src", "dst"])
    assert j.count() > 0
    # containment comes back snapped to micro units; allow that quantum
    bad = j.filter(
        F.col("containment_micro") < F.col("j") * 1_000_000 - 1).count()
    assert bad == 0


def test_grid_dbscan_micro_fixture(spark):
    """A 6-point dense blob is all core; a far-away isolated point is
    noise; a point eps-adjacent to the blob's edge but itself sparse is
    border."""
    from multi_model_vectorsearch_spark.operators.ann import dq204_grid_dbscan

    blob = [(i, [0.001 * i, 0.0], 0) for i in range(6)]       # within eps
    # 0.0545 is within eps only of the blob's edge point (0.005 -> d=0.0495)
    # so it has 2 neighbors (< min_pts) but a core one -> border
    border = [(10, [0.0545, 0.0], 0)]
    noise = [(20, [5.0, 5.0], 0)]
    df = spark.createDataFrame(
        [(i, [float(a) for a in v], l) for i, v, l in blob + border + noise],
        "vec_id long, embedding array<float>, label int",
    )
    out = {r["vec_id"]: r["label"]
           for r in dq204_grid_dbscan({"embeddings": df},
                                      eps=0.05, min_pts=5).collect()}
    for i in range(6):
        assert out[i] == "core", (i, out)
    assert out[10] == "border", out
    assert out[20] == "noise", out


def test_grid_dbscan_labels_partition(tables):
    """Labels cover every vector exactly once and all three classes have
    sane counts (no degenerate all-noise / all-core split at smoke sf)."""
    from multi_model_vectorsearch_spark.operators.ann import dq204_grid_dbscan

    out = dq204_grid_dbscan(tables)
    n = tables["embeddings"].count()
    assert out.count() == n
    labels = dict(out.groupBy("label").count().collect())
    assert set(labels) <= {"core", "border", "noise"}
    # every core satisfies the density contract
    bad = out.filter((F.col("label") == "core") & (F.col("n_nbrs") < 5)).count()
    assert bad == 0


def test_feature_auc_perfect_and_inverted(spark):
    """AUC mechanics on a known fixture: a perfectly separating score
    gives 1.0, a perfectly inverted one 0.0, and all-tied scores 0.5."""
    from multi_model_vectorsearch_spark.operators.curation import (
        dq205_feature_auc,
    )

    def docs(rows):
        return spark.createDataFrame(
            [(i, "t", lang, src, n) for i, (lang, src, n) in enumerate(rows)],
            "doc_id long, text string, lang string, source string, "
            "n_chars long",
        )

    perfect = docs([("en", "a", 100), ("en", "a", 90),
                    ("fr", "a", 10), ("fr", "a", 20)])
    inverted = docs([("en", "a", 10), ("en", "a", 20),
                     ("fr", "a", 100), ("fr", "a", 90)])
    tied = docs([("en", "a", 50), ("fr", "a", 50)])
    get = lambda df: dq205_feature_auc(
        {"documents": df}).collect()[0]["auc_micro"]
    assert get(perfect) == 1_000_000
    assert get(inverted) == 0
    assert get(tied) == 500_000


def test_mutual_info_parts_nonneg_in_total(tables):
    """Total MI (sum of per-source parts) must be >= 0; a source whose
    language mix matches the corpus contributes ~0."""
    from multi_model_vectorsearch_spark.operators.curation import (
        dq206_mutual_info,
    )

    rows = dq206_mutual_info(tables).collect()
    assert len(rows) > 0
    total = sum(r["mi_part_micro"] for r in rows)
    # each per-(source,lang) term is floor-snapped half-up to micro units
    # (error <= 0.5 micro per term), so total MI >= -(term count)/2 micro
    n_terms = sum(r["n_langs"] for r in rows)
    assert total >= -n_terms
    assert sum(r["n_docs"] for r in rows) == tables["documents"].count()


def test_ks_identical_halves_is_zero(spark):
    """KS of two identical samples is 0; of two disjoint ones is 1."""
    from multi_model_vectorsearch_spark.operators.timeseries import dq207_ks_test

    def ev(rows):
        return spark.createDataFrame(
            [(i, "2024-01-01 00:00:00", 1, et, v, "{}")
             for i, (et, v) in enumerate(rows)],
            "event_id long, ts string, user_id long, event_type string, "
            "value double, props string",
        ).withColumn("ts", F.to_timestamp("ts"))

    # same values on both halves (even/odd event_ids alternate)
    same = ev([("a", 1.0), ("a", 1.0), ("a", 2.0), ("a", 2.0)])
    out = dq207_ks_test({"events": same}).collect()[0]
    assert out["ks_micro"] == 0
    # even ids get {1,2}, odd ids get {10,20}: fully separated
    disj = ev([("a", 1.0), ("a", 10.0), ("a", 2.0), ("a", 20.0)])
    out = dq207_ks_test({"events": disj}).collect()[0]
    assert out["ks_micro"] == 1_000_000


def test_cusum_flags_step_change(spark):
    """A flat series scores ~0; a step change peaks at the step point."""
    from multi_model_vectorsearch_spark.operators.timeseries import dq208_cusum

    def ev(vals):
        return spark.createDataFrame(
            [(i, f"2024-01-01 {i:02d}:00:00", 1, "a", float(v), "{}")
             for i, v in enumerate(vals)],
            "event_id long, ts string, user_id long, event_type string, "
            "value double, props string",
        ).withColumn("ts", F.to_timestamp("ts"))

    flat = dq208_cusum({"events": ev([5.0] * 10)}).collect()[0]
    assert flat["cusum_micro"] == 0
    step = dq208_cusum({"events": ev([0.0] * 5 + [10.0] * 5)}).collect()[0]
    assert step["k_at"] == 5  # deviation peaks right before the jump
    assert step["cusum_micro"] > 0


def test_dup_flow_matrix_accounting(tables):
    """Cells are canonical (src_a <= src_b), pair counts total the
    underlying thresholded pair set, and means stay within [j_min, 1]."""
    from multi_model_vectorsearch_spark.operators.curation import (
        dq209_dup_flow_matrix,
    )
    from multi_model_vectorsearch_spark.operators.textpipe import (
        jaccard_pairs_shared,
    )

    out = dq209_dup_flow_matrix(tables, j_min=0.1).collect()
    assert len(out) > 0
    n_pairs = sum(r["n_pairs"] for r in out)
    p = jaccard_pairs_shared(tables)
    want = p.filter(
        F.floor((F.col("i") / (F.col("na") + F.col("nb") - F.col("i")))
                * 1_000_000 + 0.5)
        >= 100_000).count()
    assert n_pairs == want
    for r in out:
        assert r["src_a"] <= r["src_b"]
        assert 100_000 - 1 <= r["mean_j_micro"] <= 1_000_000 + 1


def test_cluster_purity_bounds(tables):
    """Purity lies in [1/n_labels_in_cell, 1] and members sum to the
    corpus size."""
    from multi_model_vectorsearch_spark.operators.ann import dq210_cluster_purity

    rows = dq210_cluster_purity(tables).collect()
    assert sum(r["n"] for r in rows) == tables["embeddings"].count()
    for r in rows:
        assert r["n_top"] <= r["n"]
        assert r["purity_micro"] >= 1_000_000 / r["n_labels"] - 1
        assert r["purity_micro"] <= 1_000_000


def test_calibration_bins_partition_and_bounds(tables):
    """Bins partition the corpus; rates are probabilities; gap is the
    absolute difference of the two reported rates."""
    from multi_model_vectorsearch_spark.operators.curation import (
        dq211_calibration_bins,
    )

    rows = dq211_calibration_bins(tables).collect()
    assert sum(r["n"] for r in rows) == tables["documents"].count()
    for r in rows:
        assert 0 <= r["bin"] <= 9
        assert 0 <= r["pos_rate_micro"] <= 1_000_000
        assert r["mean_pred_micro"] > 0
        assert abs(r["gap_micro"]
                   - abs(r["mean_pred_micro"] - r["pos_rate_micro"])) <= 2


def test_grouping_sets_consistency(tables):
    """The three grouping sets agree: per-flag rows sum the (flag, status)
    rows, and the grand total sums the per-flag rows."""
    from multi_model_vectorsearch_spark.operators.relational import (
        dq212_grouping_sets,
    )

    rows = dq212_grouping_sets(tables).collect()
    fine = [r for r in rows if r["gid"] == 0]
    per_flag = [r for r in rows if r["gid"] == 1]
    grand = [r for r in rows if r["gid"] == 3]
    assert len(grand) == 1
    assert grand[0]["n"] == sum(r["n"] for r in per_flag)
    assert grand[0]["n"] == sum(r["n"] for r in fine)
    for pf in per_flag:
        assert pf["n"] == sum(
            r["n"] for r in fine if r["l_returnflag"] == pf["l_returnflag"])


def test_rolling_zscore_flags_planted_outlier(spark):
    """A flat history then a huge spike: exactly the spike is flagged."""
    from multi_model_vectorsearch_spark.operators.timeseries import (
        dq213_rolling_zscore,
    )

    vals = [10.0, 11.0] * 8 + [500.0]       # 16 history rows, then a spike
    df = spark.createDataFrame(
        [(i, f"2024-01-01 {i:02d}:00:00", 1, "a", v, "{}")
         for i, v in enumerate(vals)],
        "event_id long, ts string, user_id long, event_type string, "
        "value double, props string",
    ).withColumn("ts", F.to_timestamp("ts"))
    out = dq213_rolling_zscore({"events": df}).collect()
    assert [r["event_id"] for r in out] == [16]
    assert out[0]["abs_z_micro"] > 10_000_000


def test_link_prediction_excludes_existing_edges(tables):
    """No predicted pair may already be an edge, and every score is a
    valid Jaccard in (0, 1]."""
    from multi_model_vectorsearch_spark.operators.graph import (
        dq214_link_prediction,
        dq33_build_edges,
    )

    pred = dq214_link_prediction(tables)
    edges = dq33_build_edges(tables).select(
        F.col("src").alias("a"), F.col("dst").alias("b"))
    overlap = pred.join(edges, ["a", "b"]).count()
    assert overlap == 0
    rows = pred.collect()
    assert len(rows) > 0
    for r in rows:
        assert r["a"] < r["b"]
        assert 0 < r["score_micro"] <= 1_000_000


def test_local_clustering_bounds_and_triangle_consistency(tables):
    """LCC is in [0, 1]; a node's triangles can't exceed C(deg, 2); and
    deg < 2 nodes report exactly 0."""
    from multi_model_vectorsearch_spark.operators.graph import (
        dq215_local_clustering,
    )

    rows = dq215_local_clustering(tables).collect()
    assert len(rows) > 0
    for r in rows:
        assert 0 <= r["lcc_micro"] <= 1_000_000, r
        assert 2 * r["n_tri"] <= r["deg"] * (r["deg"] - 1) + 1e-9, r
        if r["deg"] < 2:
            assert r["lcc_micro"] == 0 and r["n_tri"] == 0


def test_seasonal_profile_devs_average_out(tables):
    """Per type, the n-weighted sum of deviations from the type mean is
    ~0 (the decomposition identity)."""
    from multi_model_vectorsearch_spark.operators.timeseries import (
        dq216_seasonal_profile,
    )

    rows = dq216_seasonal_profile(tables).collect()
    assert len(rows) > 0
    by_type: dict = {}
    for r in rows:
        acc = by_type.setdefault(r["event_type"], [0.0, 0])
        acc[0] += r["dev_micro"] / 1e6 * r["n"]
        acc[1] += r["n"]
    for et, (s, n) in by_type.items():
        assert abs(s / n) < 1e-5, (et, s / n)


def test_dedup_savings_accounting(tables):
    """Savings per source reconcile with the underlying flag table."""
    from multi_model_vectorsearch_spark.operators.curation import (
        dq217_dedup_savings,
    )
    from multi_model_vectorsearch_spark.operators.textpipe import (
        dq181_neardup_first_occurrence,
    )

    rows = dq217_dedup_savings(tables).collect()
    n_total = sum(r["n_docs"] for r in rows)
    assert n_total == tables["documents"].count()
    n_dropped = sum(r["n_dropped"] for r in rows)
    want = dq181_neardup_first_occurrence(tables).filter("is_dup").count()
    assert n_dropped == want
    for r in rows:
        assert r["tokens_dropped"] <= r["tokens_total"]
        assert 0 <= r["savings_micro"] <= 1_000_000


def test_phrase_search_occurrences_are_real(tables):
    """Every reported occurrence must be verifiable by substring check on
    the raw text, and first_pos indexes the phrase's first word."""
    from multi_model_vectorsearch_spark.operators.retrieval import (
        dq218_phrase_search,
    )

    out = dq218_phrase_search(tables)
    joined = out.join(tables["documents"].select("doc_id", "text"), "doc_id")
    rows = joined.collect()
    assert len(rows) > 0
    for r in rows:
        toks = r["text"].split(" ")
        w1, w2 = r["phrase"].split(" ")
        occ = sum(
            1 for i in range(len(toks) - 1)
            if toks[i] == w1 and toks[i + 1] == w2)
        assert occ == r["n_occ"], r
        assert toks[r["first_pos"]] == w1
        assert toks[r["first_pos"] + 1] == w2


def test_order_audit_detects_planted_inversion(spark):
    """Events arriving in id order with one time inversion: exactly one
    late row."""
    from multi_model_vectorsearch_spark.operators.timeseries import (
        dq219_order_audit,
    )

    hours = [0, 1, 2, 1, 4]  # event 3 (ts hour 1) is late vs max seen (2)
    df = spark.createDataFrame(
        [(i, f"2024-01-01 {h:02d}:00:00", 1, "a", 1.0, "{}")
         for i, h in enumerate(hours)],
        "event_id long, ts string, user_id long, event_type string, "
        "value double, props string",
    ).withColumn("ts", F.to_timestamp("ts"))
    out = dq219_order_audit({"events": df}).collect()[0]
    assert out["n"] == 5 and out["n_late"] == 1
    assert out["late_frac_micro"] == 200_000


def test_ari_perfect_and_random_fixtures(spark):
    """ARI is 1.0 when clusters == labels exactly; near 0 for a label
    assignment independent of clusters."""
    from multi_model_vectorsearch_spark.operators.ann import dq220_ari

    # centroids are vec_id 0..3; members cluster tightly around each and
    # carry the centroid's id as label -> perfect agreement
    # centroid ids 0..3 are the pure axis vectors; member ids start at
    # 1000 so they can never collide with a centroid id
    fixed = []
    for c in range(4):
        base = [0.0] * 8
        base[c] = 1.0
        fixed.append((c, [float(x) for x in base], c))
        for m in range(1, 8):
            v = list(base)
            v[4 + c // 2] += 0.001 * m  # orthogonal jitter, nearest stays c
            fixed.append((1000 + c * 100 + m, [float(x) for x in v], c))
    df = spark.createDataFrame(
        fixed, "vec_id long, embedding array<float>, label int")
    out = dq220_ari({"embeddings": df}, n_centroids=4).collect()[0]
    assert out["ari_micro"] == 1_000_000


def test_langid_confusion_reconciles(tables):
    """Cells partition the corpus and per-language fractions sum to 1."""
    from multi_model_vectorsearch_spark.operators.textpipe import (
        dq221_langid_confusion,
    )

    rows = dq221_langid_confusion(tables).collect()
    assert sum(r["n"] for r in rows) == tables["documents"].count()
    by_lang: dict = {}
    for r in rows:
        by_lang.setdefault(r["lang"], []).append(r)
    for lang, cells in by_lang.items():
        assert abs(sum(c["frac_micro"] for c in cells)
                   - 1_000_000) <= len(cells), lang
        assert all(c["n_lang"] == cells[0]["n_lang"] for c in cells)


def test_lsh_pr_curve_monotone_counts(tables):
    """As tau rises, tp/pp/ap can only shrink; precision and recall stay
    probabilities."""
    from multi_model_vectorsearch_spark.operators.textpipe import (
        dq222_lsh_pr_curve,
    )

    rows = sorted(dq222_lsh_pr_curve(tables).collect(),
                  key=lambda r: r["tau_e2"])
    assert len(rows) == 4
    for a, b in zip(rows, rows[1:]):
        assert b["tp"] <= a["tp"]
        assert b["pp"] <= a["pp"]
        assert b["ap"] <= a["ap"]
    for r in rows:
        assert r["tp"] <= min(r["pp"], r["ap"])
        if r["precision_micro"] is not None:
            assert 0 <= r["precision_micro"] <= 1_000_000
        if r["recall_micro"] is not None:
            assert 0 <= r["recall_micro"] <= 1_000_000


def test_nearest_event_join_picks_nearer_side(spark):
    """A view between two purchases matches the closer one; ties go to
    the earlier purchase."""
    from multi_model_vectorsearch_spark.operators.timeseries import (
        dq223_nearest_event_join,
    )

    rows = [
        (0, "2024-01-01 00:00:00", 1, "purchase", 1.0, "{}"),
        (1, "2024-01-01 00:10:00", 1, "view", 1.0, "{}"),      # prev is 10m, next 20m
        (2, "2024-01-01 00:30:00", 1, "purchase", 1.0, "{}"),
        (3, "2024-01-01 00:25:00", 1, "view", 1.0, "{}"),      # 25m in: prev 25m, next 5m
        (4, "2024-01-01 01:00:00", 2, "view", 1.0, "{}"),      # no purchases at all
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string, "
        "value double, props string",
    ).withColumn("ts", F.to_timestamp("ts"))
    got = {r["event_id"]: (r["purchase_id"], r["delta_us"])
           for r in dq223_nearest_event_join({"events": df}).collect()}
    assert got[1] == (0, 10 * 60 * 1_000_000)
    assert got[3] == (2, 5 * 60 * 1_000_000)
    assert got[4] == (None, None)


def test_weighted_reservoir_favors_heavy_docs(tables_sf001):
    """The A-RES sample's mean weight must exceed the corpus mean weight
    (that's what weighting is for), and the keys must be sorted."""
    from multi_model_vectorsearch_spark.operators.curation import (
        dq224_weighted_reservoir,
    )

    rows = dq224_weighted_reservoir(tables_sf001, k=100).collect()
    assert len(rows) == 100
    keys = [r["skey_pico"] for r in rows]
    assert keys == sorted(keys, reverse=True)
    sample_mean = sum(r["w"] for r in rows) / len(rows)
    corpus_mean = (
        tables_sf001["documents"].agg(F.avg("n_chars")).collect()[0][0])
    assert sample_mean > corpus_mean


def test_mad_outliers_robustness(spark):
    """Planting one absurd outlier must not move the median or MAD (both
    selection-based), and the outlier itself must be counted."""
    from multi_model_vectorsearch_spark.operators.relational import (
        dq225_mad_outliers,
    )

    base = [float(v) for v in range(1, 20)]  # 1..19, median 10, MAD 5
    def run(vals):
        df = spark.createDataFrame(
            [(i, "A", "O", v) for i, v in enumerate(vals)],
            "l_orderkey long, l_returnflag string, l_linestatus string, "
            "l_extendedprice double",
        )
        return dq225_mad_outliers({"lineitem": df}).collect()[0]

    clean = run(base)
    assert clean["med_cents"] == 1000 and clean["mad_cents"] == 500
    assert clean["n_outliers"] == 0
    spiked = run(base + [1e9])
    assert spiked["med_cents"] == 1000  # lower median of 20: still 10.00
    assert spiked["mad_cents"] == 500
    assert spiked["n_outliers"] == 1


def test_time_weighted_avg_holds_value_over_gaps(spark):
    """Value 10 held for 9 hours then 100 for 1 hour: TWA = 19, where the
    naive mean would say 55 — the whole point of time weighting. A
    single-event user reports their value."""
    from multi_model_vectorsearch_spark.operators.timeseries import (
        dq226_time_weighted_avg,
    )

    rows = [
        (0, "2024-01-01 00:00:00", 1, "a", 10.0, "{}"),
        (1, "2024-01-01 09:00:00", 1, "a", 100.0, "{}"),
        (2, "2024-01-01 10:00:00", 1, "a", 50.0, "{}"),  # closes the span
        (3, "2024-01-01 00:00:00", 2, "a", 7.5, "{}"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string, "
        "value double, props string",
    ).withColumn("ts", F.to_timestamp("ts"))
    got = {r["user_id"]: r["twa_micro"]
           for r in dq226_time_weighted_avg({"events": df}).collect()}
    assert got[1] == 19_000_000  # (10*9h + 100*1h) / 10h
    assert got[2] == 7_500_000


def test_vocab_coverage_curve_monotone(tables):
    """Coverage rises with k and reaches 1.0 at the full vocab."""
    from multi_model_vectorsearch_spark.operators.textpipe import (
        dq227_vocab_coverage_curve,
    )

    rows = sorted(dq227_vocab_coverage_curve(tables).collect(),
                  key=lambda r: r["k"])
    assert len(rows) >= 3
    for a, b in zip(rows, rows[1:]):
        assert b["coverage_micro"] >= a["coverage_micro"]
        assert b["covered"] >= a["covered"]
    if rows[-1]["k"] >= rows[-1]["vocab_size"]:
        assert rows[-1]["coverage_micro"] == 1_000_000


def test_ivfpq_structure(tables):
    """IVF-PQ invariants the oracle can't see: the query (a codeword, so
    its own codes reconstruct exactly) ranks first with ADC 0; scores
    ascend; and every returned candidate belongs to the query's probe
    cell. (Top-k agreement with exact KNN is NOT asserted — an 8-word
    toy codebook quantizes random 64-dim vectors too coarsely for that,
    which is the PQ trade-off this entry demonstrates.)"""
    from multi_model_vectorsearch_spark.operators.ann import (
        assign_clusters,
        dq228_ivfpq_search,
    )

    approx = dq228_ivfpq_search(tables, k=10).collect()
    assert len(approx) == 10
    assert approx[0]["vec_id"] == 0 and approx[0]["adc_micro"] == 0
    adcs = [r["adc_micro"] for r in approx]
    assert adcs == sorted(adcs)
    assigned = {r["vec_id"]: r["cid"]
                for r in assign_clusters(tables).select("vec_id", "cid")
                .collect()}
    qcid = assigned[0]
    for r in approx:
        assert assigned[r["vec_id"]] == qcid


def test_template_mining_counts_real_prefixes(tables):
    """Every reported template is a true token prefix of at least
    min_docs documents."""
    from multi_model_vectorsearch_spark.operators.textpipe import (
        dq230_template_mining,
    )

    rows = dq230_template_mining(tables).collect()
    assert len(rows) > 0
    texts = [r["text"] for r in tables["documents"].select("text").collect()]
    for r in rows:
        want = sum(1 for t in texts
                   if " ".join(t.split(" ")[:2]) == r["tpl"])
        assert want == r["n_docs"], r


def test_autocorr_detects_planted_momentum(spark):
    """An alternating series has r1 = -1; a strictly increasing one +1
    (up to rounding); both exactly computable from the fixture."""
    from multi_model_vectorsearch_spark.operators.timeseries import (
        dq231_autocorr,
    )

    def ev(vals, uid):
        return [(uid * 1000 + i, f"2024-01-0{1 + i // 24} {i % 24:02d}:00:00",
                 uid, "a", float(v), "{}") for i, v in enumerate(vals)]

    alternating = [10.0, 20.0] * 8            # r1 = -1
    trending = [float(10 + i) for i in range(16)]   # r1 = +1
    df = spark.createDataFrame(
        ev(alternating, 1) + ev(trending, 2),
        "event_id long, ts string, user_id long, event_type string, "
        "value double, props string",
    ).withColumn("ts", F.to_timestamp("ts"))
    got = {r["user_id"]: r["r1_micro"]
           for r in dq231_autocorr({"events": df}).collect()}
    assert got[1] == -1_000_000
    assert got[2] == 1_000_000


def test_period_over_period_deltas_telescope(tables):
    """Per type, deltas sum to last-week minus first-week (telescoping),
    and the first week has NULL delta."""
    from multi_model_vectorsearch_spark.operators.timeseries import (
        dq232_period_over_period,
    )

    rows = dq232_period_over_period(tables).collect()
    by_type: dict = {}
    for r in rows:
        by_type.setdefault(r["event_type"], []).append(r)
    for et, rs in by_type.items():
        rs.sort(key=lambda r: r["wk"])
        assert rs[0]["delta_cents"] is None
        tail = [r["delta_cents"] for r in rs[1:]]
        assert all(d is not None for d in tail)
        assert sum(tail) == rs[-1]["total_cents"] - rs[0]["total_cents"]


def test_benford_audit_is_a_distribution(tables):
    """Observed and expected shares each sum to ~1; chi_sq is identical
    on every row and non-negative."""
    from multi_model_vectorsearch_spark.operators.relational import (
        dq233_benford_audit,
    )

    rows = dq233_benford_audit(tables).collect()
    assert 1 <= len(rows) <= 9
    # micro-unit shares: sum to 1e6 within snap quantum per row
    assert abs(sum(r["p_obs_micro"] for r in rows) - 1_000_000) <= len(rows)
    chis = {r["chi_sq_pico"] for r in rows}
    assert len(chis) == 1 and rows[0]["chi_sq_pico"] >= 0


def test_equiheight_buckets_balance(tables_sf001):
    """Buckets are value-contiguous and roughly equal height (within the
    duplicate-value tolerance every real equi-depth histogram has)."""
    from multi_model_vectorsearch_spark.operators.relational import (
        dq234_equiheight_histogram,
    )

    rows = dq234_equiheight_histogram(tables_sf001).collect()
    by_flag: dict = {}
    for r in rows:
        by_flag.setdefault(r["l_returnflag"], []).append(r)
    for flag, rs in by_flag.items():
        rs.sort(key=lambda r: r["b"])
        total = sum(r["n_rows"] for r in rs)
        for a, b in zip(rs, rs[1:]):
            assert a["hi_cents"] <= b["lo_cents"], (flag, a, b)
        target = total / 8
        for r in rs:
            assert r["n_rows"] <= 2 * target + 1, (flag, r)


def test_markov_nll_uniform_user_scores_low(spark):
    """A user who always repeats the corpus's dominant transition scores
    lower mean NLL than one who takes only rare transitions."""
    from multi_model_vectorsearch_spark.operators.timeseries import (
        dq235_markov_nll,
    )

    # corpus: user 1 does a->a 20 times (dominant); user 2 does a->b
    # (rare: appears only once)
    seq1 = ["a"] * 21
    seq2 = ["a", "b"]
    rows = []
    eid = 0
    for uid, seq in ((1, seq1), (2, seq2)):
        for i, et in enumerate(seq):
            rows.append((eid, f"2024-01-01 {i:02d}:00:00", uid, et, 1.0,
                         "{}"))
            eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string, "
        "value double, props string",
    ).withColumn("ts", F.to_timestamp("ts"))
    got = {r["user_id"]: r["mean_nll_micro"]
           for r in dq235_markov_nll({"events": df}).collect()}
    assert got[1] < got[2]


def test_gini_extremes(spark):
    """Equal spends give Gini ~0; one user owning everything gives Gini
    near (n-1)/n."""
    from multi_model_vectorsearch_spark.operators.relational import dq236_gini

    def ev(spends):
        return spark.createDataFrame(
            [(i, "2024-01-01 00:00:00", uid, "a", float(v), "{}")
             for i, (uid, v) in enumerate(spends)],
            "event_id long, ts string, user_id long, event_type string, "
            "value double, props string",
        ).withColumn("ts", F.to_timestamp("ts"))

    equal = dq236_gini({"events": ev([(u, 10.0) for u in range(10)])})
    assert equal.collect()[0]["gini_micro"] == 0
    skewed = dq236_gini({"events": ev(
        [(u, 0.01) for u in range(9)] + [(9, 10000.0)])})
    g = skewed.collect()[0]["gini_micro"]
    assert g > 850_000


def test_assortativity_bounds(tables):
    from multi_model_vectorsearch_spark.operators.graph import (
        dq237_assortativity,
    )

    rows = dq237_assortativity(tables).collect()
    assert len(rows) == 1
    assert -1_000_000 <= rows[0]["assortativity_micro"] <= 1_000_000


def test_rfm_tiles_are_balanced(tables):
    """Each score dimension splits users into 5 near-equal tiles."""
    from multi_model_vectorsearch_spark.operators.timeseries import (
        dq238_rfm_segments,
    )

    rows = dq238_rfm_segments(tables).collect()
    n = len(rows)
    assert n == tables["events"].select("user_id").distinct().count()
    for col in ("r_score", "f_score", "m_score"):
        counts: dict = {}
        for r in rows:
            counts[r[col]] = counts.get(r[col], 0) + 1
        assert set(counts) == {1, 2, 3, 4, 5}
        assert max(counts.values()) - min(counts.values()) <= 1


def test_quantile_normalize_is_a_cdf(tables):
    """qnorm is in (0, 1], hits 1.0 at each source's max length, and is
    monotone in length within a source."""
    from multi_model_vectorsearch_spark.operators.curation import (
        dq239_quantile_normalize,
    )

    out = dq239_quantile_normalize(tables)
    docs = tables["documents"].select("doc_id", "n_chars")
    rows = out.join(docs, "doc_id").collect()
    assert len(rows) == tables["documents"].count()
    by_src: dict = {}
    for r in rows:
        by_src.setdefault(r["source"], []).append(
            (r["n_chars"], r["qnorm_micro"]))
    for src, pairs in by_src.items():
        pairs.sort()
        assert 0 < pairs[0][1] <= 1_000_000
        assert pairs[-1][1] == 1_000_000
        for (x1, q1), (x2, q2) in zip(pairs, pairs[1:]):
            assert q2 >= q1


def test_burstiness_extremes(spark):
    """A metronome user scores ~-1... actually exactly -1 (zero variance)
    and an extremely bursty one approaches +1."""
    from multi_model_vectorsearch_spark.operators.timeseries import (
        dq240_burstiness,
    )

    def ev(gaps_s, uid):
        ts, out = 0, []
        for i, g in enumerate(gaps_s):
            ts += g
            out.append((uid * 1000 + i, ts, uid))
        return out

    regular = ev([60] * 15, 1)
    bursty = ev([1] * 14 + [1_000_000], 2)
    rows = [(eid, f"{t}", uid) for eid, t, uid in regular + bursty]
    df = spark.createDataFrame(
        rows, "event_id long, sec string, user_id long"
    ).selectExpr(
        "event_id", "user_id",
        "timestamp_seconds(CAST(sec AS LONG) + 1700000000) AS ts",
        "CAST(1.0 AS DOUBLE) AS value",
        "'a' AS event_type", "'{}' AS props",
    )
    got = {r["user_id"]: r["burstiness_micro"]
           for r in dq240_burstiness({"events": df}).collect()}
    assert got[1] == -1_000_000
    # B is bounded by ~(sqrt(n-1)-1)/(sqrt(n-1)+1) for finite n, so a
    # 15-gap burst tops out well below 1; 0.5 already means heavy bursts
    assert got[2] > 500_000


def test_effective_sources_bounds(tables):
    """1 <= effective sources <= n_sources, with equality at the top for
    the perfectly balanced fixture (25 docs per source)."""
    from multi_model_vectorsearch_spark.operators.curation import (
        dq241_effective_sources,
    )

    r = dq241_effective_sources(tables).collect()[0]
    assert 1_000_000 <= r["eff_sources_docs_micro"] \
        <= r["n_sources"] * 1_000_000 + 1
    assert 1_000_000 <= r["eff_sources_tokens_micro"] \
        <= r["n_sources"] * 1_000_000 + 1
    # doc counts are exactly uniform in the fixture -> index == n_sources
    assert abs(r["eff_sources_docs_micro"]
               - r["n_sources"] * 1_000_000) <= 1


def test_split_uniformity_accounting(tables_sf001):
    """Bucket stats reconcile and the chi-square is non-negative; a
    deliberately skewed fixture scores much worse than the real die."""
    from multi_model_vectorsearch_spark.operators.curation import (
        dq242_split_uniformity,
    )

    r = dq242_split_uniformity(tables_sf001).collect()[0]
    assert r["n_total"] == 500
    assert r["n_buckets_hit"] <= 100
    assert r["min_bucket"] >= 1
    assert r["chi_sq_pico"] >= -r["n_buckets_hit"]
    # degrees of freedom = 99; a healthy hash lands within a few sigma
    assert r["chi_sq_pico"] < 200 * 10**12, r


def test_lorenz_deciles_shape(tables):
    """Shares sum to 1, cumulative share is monotone and convex-ish (a
    higher decile never carries a smaller share than a lower one)."""
    from multi_model_vectorsearch_spark.operators.timeseries import (
        dq243_lorenz_deciles,
    )

    rows = sorted(dq243_lorenz_deciles(tables).collect(),
                  key=lambda r: r["decile"])
    assert [r["decile"] for r in rows] == list(range(1, len(rows) + 1))
    assert abs(sum(r["share_micro"] for r in rows) - 1_000_000) <= len(rows)
    assert rows[-1]["cum_share_micro"] == 1_000_000
    for a, b in zip(rows, rows[1:]):
        assert b["cum_share_micro"] >= a["cum_share_micro"]
        # deciles can have unequal sizes at tiny user counts, so only
        # the PER-USER average share is monotone under the sort
        assert (b["share_micro"] / b["n_users"]
                >= a["share_micro"] / a["n_users"] - 1)


def test_growth_accounting_ledger(tables):
    """Week 1 is all-new; active = new + returning everywhere; total new
    across weeks equals the distinct user count."""
    from multi_model_vectorsearch_spark.operators.timeseries import (
        dq244_growth_accounting,
    )

    rows = sorted(dq244_growth_accounting(tables).collect(),
                  key=lambda r: r["wk"])
    assert rows[0]["returning"] == 0
    for r in rows:
        assert r["active"] == r["new_users"] + r["returning"]
    n_users = tables["events"].select("user_id").distinct().count()
    assert sum(r["new_users"] for r in rows) == n_users


def test_dq246_span_dedup_semantics(spark):
    """Hot spans (df > max_df) are dropped everywhere, survivors rebuild
    in original order, and an all-hot doc survives with empty text."""
    from multi_model_vectorsearch_spark.operators.curation import (
        dq246_span_dedup,
    )

    hot = "a b c"  # appears in 3 docs -> df=3 > max_df=2 -> dropped
    docs = spark.createDataFrame(
        [
            (0, f"{hot} x y z p q r"),   # hot + 2 unique spans
            (1, f"u v w {hot}"),          # unique + hot
            (2, hot),                      # all-hot doc
            (3, "m n o a b"),             # unique spans incl. short tail
        ],
        "doc_id bigint, text string",
    )
    out = {r.doc_id: r for r in
           dq246_span_dedup({"documents": docs}).collect()}
    assert out[0].n_spans == 3 and out[0].n_kept == 2
    assert out[0].clean_text == "x y z p q r"  # order preserved
    assert out[1].clean_text == "u v w"
    assert out[2].n_spans == 1 and out[2].n_kept == 0
    assert out[2].clean_text == ""  # all-hot doc not silently dropped
    assert out[3].clean_text == "m n o a b"  # short tail span kept
