"""Corpus-curation operators for LLM training-data pipelines (part 2).

The reference ingests documents one POST at a time (main.py:48-87); a
100 TB pretraining pipeline additionally needs the batch curation steps
implemented here: deterministic dataset splits, stratified subsampling,
context-window packing, benchmark-contamination screening, PII redaction,
and collocation mining. All are expressed with built-in functions so the
hot path stays JVM-side; the only per-doc Python anywhere in the module is
none at all.

Determinism: split/sample decisions hash doc ids through sha2 (stable
across engines, runs, and cluster sizes — unlike ``F.rand`` or ``F.hash``),
so the same document always lands in the same split no matter how the
corpus is partitioned. That is also what makes the DuckDB oracle able to
reproduce every decision bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from multi_model_vectorsearch_spark.functions.fixedpoint import snap

Tables = dict

# sha256(key)[:8 hex] folded to an integer in [0, mod) — the split die.
def _hash_bucket(col: F.Column, mod: int = 100) -> F.Column:
    return (
        F.conv(F.substring(F.sha2(col.cast("string"), 256), 1, 8), 16, 10)
        .cast("bigint") % mod
    )


def dq95_hash_split(t: Tables) -> DataFrame:
    """Deterministic 90/5/5 train/val/test split by content-stable hash.

    Scale note: the assignment is a map-only projection — no shuffle, no
    global coordination — so it holds at any corpus size, and re-runs with
    more executors produce identical splits (a property random sampling
    does not have).
    """
    b = _hash_bucket(F.col("doc_id"))
    return t["documents"].select(
        "doc_id",
        b.alias("bucket"),
        F.when(b < 90, "train").when(b < 95, "val").otherwise("test")
        .alias("split"),
    )


def dq96_stratified_sample(t: Tables) -> DataFrame:
    """Per-language stratified subsample with unequal keep rates.

    The keep decision reuses the hash die, giving each stratum an exact,
    reproducible rate (en 80 %, others 40 %) — the mixture-reweighting
    primitive for domain balancing. Map-only; composes with dq95 by
    hashing a salted key so the two decisions are independent.
    """
    b = _hash_bucket(F.concat(F.lit("strat:"), F.col("doc_id").cast("string")))
    rate = F.when(F.col("lang") == "en", 80).otherwise(40)
    return (
        t["documents"]
        .select("doc_id", "lang", b.alias("bucket"), rate.alias("keep_pct"))
        .filter(F.col("bucket") < F.col("keep_pct"))
    )


def dq97_pack_sequences(t: Tables, capacity: int = 256,
                        n_shards: int = 8) -> DataFrame:
    """Concat-then-chunk context packing: map docs to context-window bins.

    The standard pretraining packing ("concatenate the token stream, cut
    every ``capacity`` tokens") assigns each doc the bin range its span
    covers. A single global cumulative sum would serialize on one
    partition, so the stream is sharded by a doc-id hash and packed per
    shard — exactly how a 1000-executor run would do it, and each shard's
    window is an independent partition of the shuffle.
    """
    d = t["documents"].select(
        "doc_id",
        (F.col("doc_id") % n_shards).alias("shard"),
        F.size(F.split("text", " ")).alias("n_tok"),
    )
    w = (
        Window.partitionBy("shard").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    start = F.coalesce(F.sum("n_tok").over(w), F.lit(0))
    return d.select(
        "doc_id", "shard", "n_tok",
        start.alias("start_tok"),
        F.floor(start / capacity).cast("int").alias("bin_first"),
        F.floor((start + F.col("n_tok") - 1) / capacity).cast("int")
        .alias("bin_last"),
    )


def dq98_contamination(t: Tables) -> DataFrame:
    """Benchmark-contamination screen: train docs sharing 3-gram shingles
    with a held-out set (source ``src0`` stands in for the benchmark).

    The bench shingle set is orders of magnitude smaller than the corpus,
    so the join broadcasts it and the screen is one map-side hash probe per
    train shingle — no shuffle of the 100 TB side. Both sides are
    projections of the ONE session-cached corpus shingle table (a doc's
    shingles don't depend on other docs, so splitting after shingling is
    identical to shingling each split) — filtering the documents first
    would rebuild the explode+distinct pipeline per split and miss the
    cache. Reports every contaminated train doc with its overlap size.
    """
    from multi_model_vectorsearch_spark.operators.textpipe import _shingles

    src = t["documents"].select("doc_id", "source")
    sh = _shingles(t).join(src, "doc_id")
    bench = (
        sh.filter(F.col("source") == "src0")
        .select(F.col("shingle").alias("b_shingle")).distinct()
    )
    train = sh.filter(F.col("source") != "src0")
    hits = train.join(
        F.broadcast(bench), train.shingle == bench.b_shingle
    )
    return hits.groupBy("doc_id").agg(
        F.count("*").alias("n_contaminated")
    )


# PII-ish patterns over the synthetic corpus: the fixture text has no PII,
# so a deterministic synthetic email+phone is injected into every 10th doc
# first — the redaction plumbing (match, count, replace) is what's under
# test, and injection keeps it exercised end-to-end.
_EMAIL = "[a-z0-9]+@[a-z0-9]+\\.[a-z]+"
_PHONE = "[0-9]{3}-[0-9]{3}-[0-9]{4}"


def dq99_pii_redact(t: Tables) -> DataFrame:
    """PII-style redaction: regex match counts + replaced text length."""
    injected = F.when(
        F.col("doc_id") % 10 == 0,
        F.concat(F.col("text"), F.lit(" user"),
                 F.col("doc_id").cast("string"),
                 F.lit("@example.com call 555-123-4567")),
    ).otherwise(F.col("text"))
    d = t["documents"].select("doc_id", injected.alias("txt"))
    n_email = F.size(F.regexp_extract_all("txt", F.lit(_EMAIL), F.lit(0)))
    n_phone = F.size(F.regexp_extract_all("txt", F.lit(_PHONE), F.lit(0)))
    red = F.regexp_replace(
        F.regexp_replace("txt", _EMAIL, "<EMAIL>"), _PHONE, "<PHONE>"
    )
    return d.select(
        "doc_id",
        n_email.alias("n_email"),
        n_phone.alias("n_phone"),
        F.length(red).alias("redacted_len"),
        F.sha2(red, 256).alias("redacted_sha"),
    )


def dq100_pmi_bigrams(t: Tables, min_count: int = 5, k: int = 40) -> DataFrame:
    """Collocation mining: top-k token bigrams by pointwise mutual
    information.

    PMI = ln(p(ab) / (p(a) p(b))) with bigram and unigram probabilities
    from the full stream. All counts are exact aggregations; the unigram
    side is tiny after the groupBy, so both probability joins broadcast.
    """
    from multi_model_vectorsearch_spark.operators.textpipe import (
        word_ngrams,
    )

    toks = t["documents"].select(
        "doc_id", F.split("text", " ").alias("toks")
    )
    grams = toks.select(F.explode(word_ngrams("toks", 2)).alias("bg"))
    uni = (
        t["documents"]
        .select(F.explode(F.split("text", " ")).alias("tok"))
        .groupBy("tok").agg(F.count("*").alias("c_uni"))
    )
    n_uni = uni.agg(F.sum("c_uni").alias("n_uni"))
    bg = grams.groupBy("bg").agg(F.count("*").alias("c_bg"))
    n_bg = bg.agg(F.sum("c_bg").alias("n_bg"))
    w1 = F.split(F.col("bg"), " ").getItem(0)
    w2 = F.split(F.col("bg"), " ").getItem(1)
    j = (
        bg.filter(F.col("c_bg") >= min_count)
        .withColumn("w1", w1).withColumn("w2", w2)
        .join(F.broadcast(uni.withColumnRenamed("tok", "w1")
                          .withColumnRenamed("c_uni", "c1")), "w1")
        .join(F.broadcast(uni.withColumnRenamed("tok", "w2")
                          .withColumnRenamed("c_uni", "c2")), "w2")
        .crossJoin(F.broadcast(n_uni))
        .crossJoin(F.broadcast(n_bg))
    )
    pmi = snap(
        F.log(
            (F.col("c_bg") / F.col("n_bg"))
            / ((F.col("c1") / F.col("n_uni")) * (F.col("c2") / F.col("n_uni")))
        )
    )
    return (
        j.select("bg", "c_bg", pmi.alias("pmi_micro"))
        .orderBy(F.desc("pmi_micro"), F.asc("bg"))
        .limit(k)
    )


def dq102_gopher_repetition(t: Tables, max_top_bigram: float = 0.2) -> DataFrame:
    """Gopher-style repetition quality screen (Rae et al. 2021 §A1.1):
    per-doc duplicate-token fraction and top-bigram fraction, plus the keep
    flag a filter stage would apply.

    MAP-ONLY: every statistic is a function of one document, so nothing
    justifies a shuffle — the earlier explode+groupBy form moved the
    ENTIRE token stream through two Exchanges for per-doc counts. The
    top-bigram count is the longest equal-run of the doc's sorted bigram
    array, computed by a single linear fold; n_uniq is
    size(array_distinct). Zero Exchange, one scan, 1.3 s → 0.7 s warm at
    sf0.1 — and at 100 TB the difference is two full-corpus shuffles.
    """
    d = t["documents"].select("doc_id", F.split("text", " ").alias("toks"))
    # word bigrams in-array: pair each token (0-based i over the slice)
    # with its successor
    bg = F.expr(
        "transform(slice(toks, 1, size(toks) - 1), "
        "(x, i) -> x || ' ' || toks[i + 1])")
    run_step = lambda acc, x: F.struct(  # noqa: E731
        x.alias("prev"),
        F.when(x == acc["prev"], acc["run"] + 1)
        .otherwise(F.lit(1).cast("bigint")).alias("run"),
        F.greatest(
            acc["best"],
            F.when(x == acc["prev"], acc["run"] + 1)
            .otherwise(F.lit(1).cast("bigint"))).alias("best"))
    staged = (
        d.withColumn("bgs", F.array_sort(bg))
        .withColumn("runstat", F.aggregate(
            F.col("bgs"),
            F.struct(F.lit("").alias("prev"),
                     F.lit(0).cast("bigint").alias("run"),
                     F.lit(0).cast("bigint").alias("best")),
            run_step))
    )
    n_tok = F.size("toks").cast("bigint")
    n_uniq = F.size(F.array_distinct("toks"))
    top_frac = snap(F.col("runstat")["best"] / F.size("bgs"))
    dup_frac = snap(1 - n_uniq / n_tok)
    return staged.select(
        "doc_id", n_tok.alias("n_tok"),
        dup_frac.alias("dup_tok_frac_micro"),
        top_frac.alias("top_bigram_frac_micro"),
        (top_frac <= int(max_top_bigram * 1_000_000)).alias("keep"),
    )


def dq103_bpe_merge_pairs(t: Tables, k: int = 30) -> DataFrame:
    """First BPE merge round: corpus-wide adjacent character-pair counts.

    Tokenizer training's inner loop — count every adjacent symbol pair,
    weighted by word frequency, and rank. The word vocabulary is tiny after
    the first groupBy (type count, not token count), so the expensive
    explode runs over distinct words only — the same trick real BPE
    trainers use (count types once, weight by frequency).
    """
    words = (
        t["documents"]
        .select(F.explode(F.split("text", " ")).alias("w"))
        .filter(F.length("w") >= 2)
        .groupBy("w").agg(F.count("*").alias("c_w"))
    )
    pairs = words.select(
        "c_w",
        F.explode(
            F.expr("transform(sequence(1, length(w) - 1), "
                   "i -> substring(w, i, 2))")
        ).alias("pair"),
    )
    return (
        pairs.groupBy("pair").agg(F.sum("c_w").alias("c"))
        .orderBy(F.desc("c"), F.asc("pair"))
        .limit(k)
    )


def dq107_temperature_mixture(t: Tables, alpha: float = 0.7,
                              target_frac: float = 0.5) -> DataFrame:
    """Temperature-based source mixture resampling (the p ∝ n^α recipe from
    multilingual pretraining, α=0.7): per-source keep rates that flatten the
    source distribution toward the target corpus size, plus the realized
    per-source kept counts from the deterministic hash die.

    Source stats are two tiny aggregates broadcast back over the corpus, so
    the per-doc keep decision is map-only — the 100 TB side is scanned once
    and never shuffled. Rates are integerized to per-mille before the
    comparison so the decision is exact integer math.
    """
    docs = t["documents"]
    counts = docs.groupBy("source").agg(F.count("*").alias("n_s"))
    sums = counts.agg(
        F.sum("n_s").alias("n_tot"),
        F.sum(F.pow("n_s", F.lit(alpha))).alias("sum_w"),
    )
    rates = counts.crossJoin(F.broadcast(sums)).select(
        "source", "n_s",
        F.least(
            F.lit(1000),
            # +1e-6 so exact-integer boundaries (e.g. uniform sources → rate
            # exactly 500) don't flip on FP summation order of sum_w.
            F.floor(
                F.lit(1000.0)
                * ((F.lit(target_frac) * F.col("n_tot"))
                   * (F.pow("n_s", F.lit(alpha)) / F.col("sum_w")))
                / F.col("n_s")
                + F.lit(1e-6)
            ),
        ).cast("int").alias("rate_pm"),
    )
    die = _hash_bucket(
        F.concat(F.lit("mix:"), F.col("doc_id").cast("string")), 1000
    )
    kept = (
        docs.select("doc_id", "source", die.alias("d"))
        .join(F.broadcast(rates), "source")
        .filter(F.col("d") < F.col("rate_pm"))
        .groupBy("source").agg(F.count("*").alias("n_kept"))
    )
    return rates.join(kept, "source", "left").select(
        "source", "n_s", "rate_pm",
        F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
    )


def dq101_scd2_intervals(t: Tables) -> DataFrame:
    """SCD2 change intervals: per-user event_type validity ranges.

    The slowly-changing-dimension build every warehouse needs: collapse an
    event stream into [valid_from, valid_to) intervals per user, one row
    per state change. One shuffle on user_id; the windows reuse that
    partitioning (single Exchange in the plan).

    Interval bounds are emitted as epoch-microsecond BIGINTs
    (``unix_micros`` / DuckDB ``epoch_us`` — dq208's key pattern), not
    timestamps: sub-day precision rules out a DATE cast, and raw
    timestamp outputs are the driver-canonicalizer hazard that felled
    dq201 in CORRECTNESS_r05 / dq92 in r2.
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    e = t["events"].select("user_id", "ts", "event_id", "event_type")
    changed = e.withColumn("prev", F.lag("event_type").over(w)).filter(
        F.col("prev").isNull() | (F.col("prev") != F.col("event_type"))
    )
    w2 = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return changed.select(
        "user_id", "event_type",
        F.unix_micros("ts").alias("valid_from_us"),
        F.unix_micros(F.lead("ts").over(w2)).alias("valid_to_us"),
        F.row_number().over(w2).alias("version"),
    )


def dq112_weighted_sample(t: Tables, n: int = 50) -> DataFrame:
    """Deterministic weighted sampling without replacement
    (Efraimidis-Spirakis A-ES): each doc gets key = ln(u)/w with u a
    deterministic hash-uniform in (0,1) and weight w = n_chars; the top-n
    keys ARE a weighted sample without replacement.

    The scale property: keys are computed map-only from the row itself, and
    the global top-n is a TakeOrderedAndProject — sampling 1M docs from
    100 TB never shuffles the corpus and needs no sequential pass, unlike
    reservoir sampling. Changing the salt re-draws the sample.
    """
    fold = (
        F.conv(
            F.substring(
                F.sha2(F.concat(F.lit("wrs:"), F.col("doc_id").cast("string")),
                       256),
                1, 8,
            ),
            16, 10,
        ).cast("bigint")
    )
    u = (fold + F.lit(0.5)) / F.lit(4294967296.0)
    wkey = snap(F.log(u) / F.col("n_chars"))
    return (
        t["documents"]
        .select("doc_id", "n_chars", wkey.alias("wkey_micro"))
        .orderBy(F.desc("wkey_micro"), F.asc("doc_id"))
        .limit(n)
    )


def dq115_epoch_plan(t: Tables, target_mult: float = 2.0,
                     max_epochs: float = 4.0) -> DataFrame:
    """Token-budget epoch planner: given a target token budget of
    ``target_mult`` × the corpus, allocate per-source repeat factors
    (epochs) by sqrt-temperature share, capped at ``max_epochs``.

    The dq107 companion for the *up*-sampling direction: small high-value
    sources get more epochs, huge sources fewer, matching the
    data-constrained-scaling recipe of repeating small corpora a bounded
    number of times. Everything after the per-source token count (one
    shuffle on `source`) is arithmetic on a tiny aggregate.
    """
    tok = t["documents"].groupBy("source").agg(
        F.sum(F.size(F.split("text", " "))).alias("n_tok")
    )
    tots = tok.agg(
        F.sum("n_tok").alias("total"),
        F.sum(F.sqrt("n_tok")).alias("sw"),
    )
    share = F.sqrt("n_tok") / F.col("sw")
    epochs_milli = F.least(
        F.lit(int(max_epochs * 1000)).cast("bigint"),
        snap(F.lit(target_mult) * F.col("total") * share / F.col("n_tok"),
             1000),
    )
    return tok.crossJoin(F.broadcast(tots)).select(
        "source", "n_tok",
        snap(share).alias("w_micro"),
        epochs_milli.alias("epochs_milli"),
        F.floor(epochs_milli * F.col("n_tok") / F.lit(1000.0))
        .cast("bigint").alias("planned_tok"),
    ).orderBy("source")


def dq133_dedup_apply(t: Tables) -> DataFrame:
    """Apply-side of near-dup dedup: drop every document that has a
    smaller-id LSH near-duplicate (greedy local-min policy), reporting
    survivorship counts.

    Completes the find→decide→apply dedup chain (dq41 finds candidate
    pairs, dq61 clusters them, this applies the drop). The greedy rule
    "drop if any smaller-id near-dup exists" needs only the pair list —
    no transitive closure — so it's one semi-join, no iteration, and at
    100 TB it composes with dq41's banded join without adding a shuffle
    of the corpus.
    """
    from multi_model_vectorsearch_spark.operators.textpipe import (
        minhash_lsh_pairs_shared,
    )

    drop = minhash_lsh_pairs_shared(t).select("d2").distinct()
    docs = t["documents"].select("doc_id")
    total = docs.agg(F.count("*").cast("bigint").alias("n_total"))
    dropped = docs.join(
        drop, docs.doc_id == F.col("d2"), "left_semi"
    ).agg(F.count("*").cast("bigint").alias("n_dropped"))
    return total.crossJoin(dropped).select(
        "n_total", "n_dropped",
        (F.col("n_total") - F.col("n_dropped")).alias("n_kept"),
    )


def dq135_curation_funnel(t: Tables) -> DataFrame:
    """End-to-end curation survivorship funnel: raw → length band →
    quality ensemble → exact dedup (normalized hash, keep min id) →
    near-dup dedup (greedy LSH drop), one count per stage.

    The flagship composition query: every stage is an operator that
    already exists in the registry (dq86-family band filter, dq131
    ensemble, dq84 normalization, dq41 LSH pairs) chained as semi/anti
    joins on doc_id. At 100 TB each stage is a map-only filter or a
    broadcast of the previous stage's tiny drop-list — the corpus is
    never re-shuffled between stages.
    """
    from multi_model_vectorsearch_spark.operators.textpipe import (
        dq84_normalize_text,
        dq131_quality_ensemble,
        minhash_lsh_pairs_shared,
    )

    docs = t["documents"]
    s1 = docs.filter(F.col("n_chars").between(100, 2000)).select("doc_id")
    qual = dq131_quality_ensemble(t).filter(F.col("keep") == 1) \
        .select("doc_id")
    s2 = s1.join(qual, "doc_id", "left_semi")
    clean = dq84_normalize_text(t).select("doc_id", "clean_sha")
    s3 = (
        s2.join(clean, "doc_id")
        .groupBy("clean_sha").agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    drop = minhash_lsh_pairs_shared(t).select("d2").distinct()
    s4 = s3.join(drop, s3.doc_id == F.col("d2"), "left_anti")

    stages = [
        ("s0_raw", docs.select("doc_id")),
        ("s1_length", s1),
        ("s2_quality", s2),
        ("s3_exact", s3),
        ("s4_neardup", s4),
    ]
    out = None
    for name, df in stages:
        row = df.agg(
            F.lit(name).alias("stage"),
            F.count("*").cast("bigint").alias("n_docs"),
        )
        out = row if out is None else out.unionAll(row)
    return out.orderBy("stage")


def dq137_dup_rate_by_source(t: Tables) -> DataFrame:
    """Per-source near-duplicate rates: how much of each source the greedy
    LSH dedup (dq133's policy) would drop.

    The observability view a curation team actually watches — a source
    whose dup rate jumps is a crawler bug or a licensing reprint. Rates
    derive from the same pair list as dq133, grouped through one broadcast
    join of the drop-set against the doc->source map.
    """
    from multi_model_vectorsearch_spark.operators.textpipe import (
        minhash_lsh_pairs_shared,
    )

    drop = minhash_lsh_pairs_shared(t).select(
        F.col("d2").alias("doc_id")
    ).distinct()
    docs = t["documents"].select("doc_id", "source")
    flagged = docs.join(
        F.broadcast(drop.withColumn("is_dup", F.lit(1))), "doc_id", "left"
    )
    return (
        flagged.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.coalesce("is_dup", F.lit(0))).cast("bigint")
            .alias("n_dup"),
        )
        .select(
            "source", "n_docs", "n_dup",
            snap(F.col("n_dup") / F.col("n_docs")).alias("dup_rate_micro"),
        )
        .orderBy("source")
    )


def dq141_bloom_screen(t: Tables, m_bits: int = 4096,
                       k_hashes: int = 4) -> DataFrame:
    """Deterministic Bloom-filter membership screen, built and probed as
    pure SQL: the held-out set (source src0) populates a 4096-bit / 4-hash
    filter, every doc probes it, and the output is the confusion matrix
    (actual membership × bloom verdict) with counts.

    The set-membership sketch for 100 TB pipelines (benchmark URLs, seen
    doc hashes): the bit table is a few KB broadcast to every probe task —
    a semi-join without shuffling either side. sha2-based bit positions
    make the filter reproducible across engines, so even the false-
    positive count is oracle-checked exactly.
    """
    docs = t["documents"]
    seeds = F.explode(F.sequence(F.lit(0), F.lit(k_hashes - 1))).alias("s")

    def pos():
        return _hash_bucket(
            F.concat(F.lit("bf"), F.col("s").cast("string"), F.lit(":"),
                     F.col("doc_id").cast("string")),
            m_bits,
        )

    members = docs.filter(F.col("source") == "src0")
    bits = (
        members.select("doc_id", seeds).select(pos().alias("b")).distinct()
    )
    probes = docs.select("doc_id", "source", seeds).select(
        "doc_id", "source", F.col("s"), pos().alias("b")
    )
    hit = probes.join(
        F.broadcast(bits.withColumn("present", F.lit(1))), "b", "left"
    )
    verdict = (
        hit.groupBy("doc_id", "source")
        .agg((F.sum(F.coalesce("present", F.lit(0))) == k_hashes)
             .cast("int").alias("bloom_maybe"))
    )
    return (
        verdict.groupBy(
            (F.col("source") == "src0").cast("int").alias("actual"),
            "bloom_maybe",
        )
        .agg(F.count("*").alias("n"))
        .orderBy("actual", "bloom_maybe")
    )


def dq152_perplexity_buckets(t: Tables, n_buckets: int = 4) -> DataFrame:
    """CCNet-style quality bucketing: per language, quartile documents by
    unigram surprisal (the deterministic perplexity surrogate, dq127's
    scorer) and report each bucket's size and mean bits/token. Training
    mixtures then sample by (lang, bucket) — head for quality, tail for
    diversity.

    The scorer is two hash aggs + a broadcast join (textpipe.doc_surprisal);
    the ntile window partitions by lang so no single-partition funnel —
    per-language ordering is the declared semantics, and language
    cardinality bounds the parallelism exactly as it would at 100 TB.
    """
    from multi_model_vectorsearch_spark.operators.textpipe import doc_surprisal

    scored = doc_surprisal(t).select(
        "doc_id", snap(F.col("bits")).alias("bits"))
    langs = t["documents"].select("doc_id", "lang")
    w = Window.partitionBy("lang").orderBy(F.desc("bits"), F.asc("doc_id"))
    bucketed = (
        scored.join(langs, "doc_id")
        .withColumn("bucket", F.ntile(n_buckets).over(w))
    )
    return bucketed.groupBy("lang", "bucket").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        # mean of exact micro ints: one division + half-up floor
        F.floor(F.avg("bits") + F.lit(0.5)).cast("bigint")
        .alias("avg_bits_micro"),
    )


def dq161_incremental_dedup(t: Tables) -> DataFrame:
    """Cross-snapshot incremental dedup: treat doc_id parity as the
    old/new-snapshot surrogate and classify every *new* doc as an exact
    duplicate of the old snapshot (same sha256 of normalized text), a
    near-duplicate (shares an LSH pair with an old doc), or fresh. This is
    the nightly-crawl shape: the old snapshot is the big side scanned once;
    the verdict joins are semi-joins on hash/pair keys.

    Counts per verdict keep the result tiny and order-free.
    """
    from multi_model_vectorsearch_spark.operators.textpipe import (
        minhash_lsh_pairs_shared,
    )

    d = t["documents"].select(
        "doc_id", F.sha2(F.lower(F.trim("text")), 256).alias("sha"))
    old_sha = d.filter(F.col("doc_id") % 2 == 0).select("sha").distinct() \
        .withColumn("e", F.lit(1))
    pairs = minhash_lsh_pairs_shared(t)
    # near-dup: a new doc paired (either direction) with an old doc
    near_ids = (
        pairs.select(F.col("d1").alias("a"), F.col("d2").alias("b"))
        .union(pairs.select(F.col("d2").alias("a"), F.col("d1").alias("b")))
        .filter((F.col("a") % 2 == 1) & (F.col("b") % 2 == 0))
        .select(F.col("a").alias("doc_id")).distinct()
        .withColumn("nr", F.lit(1))
    )
    # single pass over the new snapshot: both verdict keys arrive as
    # broadcast flag joins, the CASE ranks exact > near > fresh — the
    # branch-per-verdict union form re-derived the sha scan once per
    # branch (44 Exchanges, 9.6 s; this plan: 1 scan, <1 s at sf0.1)
    return (
        d.filter(F.col("doc_id") % 2 == 1)
        .join(F.broadcast(old_sha), "sha", "left")
        .join(F.broadcast(near_ids), "doc_id", "left")
        .select(
            F.when(F.col("e") == 1, F.lit("exact"))
            .when(F.col("nr") == 1, F.lit("near"))
            .otherwise(F.lit("fresh")).alias("verdict"))
        .groupBy("verdict")
        .agg(F.count("*").cast("bigint").alias("n_docs"))
    )


def dq162_chunk_dedup_stats(t: Tables) -> DataFrame:
    """Chunk-level exact dedup over the dq150 sliding-window chunks: how
    many chunk occurrences are redundant copies of a chunk already seen in
    a lower doc_id/chunk_id position, per source.

    Boilerplate detection at the granularity training actually consumes:
    two hash aggs on the chunk digest (first-occurrence election, then the
    per-source roll-up) — the chunk text itself never shuffles, only its
    sha256.
    """
    from multi_model_vectorsearch_spark.operators.textpipe import (
        dq150_doc_chunks,
    )

    chunks = dq150_doc_chunks(t).select("doc_id", "chunk_id", "chunk_sha")
    first = chunks.groupBy("chunk_sha").agg(
        F.min(F.struct("doc_id", "chunk_id")).alias("f"))
    marked = chunks.join(first, "chunk_sha").select(
        "doc_id",
        ((F.col("doc_id") != F.col("f.doc_id"))
         | (F.col("chunk_id") != F.col("f.chunk_id"))).cast("int")
        .alias("is_dup"),
    )
    docs = t["documents"].select("doc_id", "source")
    return (
        marked.join(docs, "doc_id")
        .groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_chunks"),
            F.sum("is_dup").cast("bigint").alias("n_dup"),
        )
        .select(
            "source", "n_chunks", "n_dup",
            snap(F.col("n_dup") / F.col("n_chunks"))
            .alias("chunk_dup_rate_micro"),
        )
    )


def dq163_quality_by_dup_status(t: Tables) -> DataFrame:
    """Quality-vs-duplication cross-tab: mean dq45 quality score of
    near-duplicate vs unique docs, per language — the audit that catches a
    dedup policy silently skewing the surviving corpus toward boilerplate
    (dups and low-quality docs correlate; dropping one moves the other).
    """
    from multi_model_vectorsearch_spark.operators.textpipe import (
        dq45_quality, minhash_lsh_pairs_shared,
    )

    q = dq45_quality(t).select("doc_id", "score_micro")
    dup_ids = minhash_lsh_pairs_shared(t).select(
        F.col("d2").alias("doc_id")).distinct()
    langs = t["documents"].select("doc_id", "lang")
    joined = (
        q.join(langs, "doc_id")
        .join(F.broadcast(dup_ids.withColumn("d", F.lit(1))),
              "doc_id", "left")
        .withColumn("is_dup", F.coalesce("d", F.lit(0)))
    )
    return (
        joined.groupBy("lang", "is_dup")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.floor(F.avg("score_micro") + F.lit(0.5)).cast("bigint")
            .alias("avg_score_micro"),
        )
    )


def dq164_countmin_freq(t: Tables, width: int = 512, depth: int = 4,
                        k: int = 20) -> DataFrame:
    """Deterministic count-min sketch over the token stream, audited
    against exact counts: build a depth×width counter table from sha2-based
    bucket hashes, estimate each of the top-k true-frequency tokens as the
    min over its depth cells, and report the overcount. The
    constant-memory frequency sketch for 100 TB streams — the sketch is
    depth×width cells regardless of vocabulary, built in one aggregation,
    and the broadcast probe joins are a few KB.

    sha2 bucket hashing makes every cell (and therefore the estimate and
    its error) bit-reproducible in the DuckDB oracle — the sketch's
    *quality* is part of the checked contract, not just its shape.
    """
    toks = t["documents"].select(
        F.explode(F.split("text", " ")).alias("tok"))
    counts = toks.groupBy("tok").agg(F.count("*").alias("c"))
    seeds = F.explode(
        F.sequence(F.lit(0), F.lit(depth - 1))).alias("s")

    def bucket():
        return _hash_bucket(
            F.concat(F.lit("cm"), F.col("s").cast("string"), F.lit(":"),
                     F.col("tok")),
            width,
        )

    cells = (
        counts.select("tok", "c", seeds)
        .select("c", F.col("s"), bucket().alias("b"))
        .groupBy("s", "b").agg(F.sum("c").alias("cell"))
    )
    top = counts.orderBy(F.desc("c"), F.asc("tok")).limit(k)
    probes = (
        top.select("tok", "c", seeds)
        .select("tok", "c", F.col("s"), bucket().alias("b"))
    )
    return (
        probes.join(F.broadcast(cells), ["s", "b"])
        .groupBy("tok", "c")
        .agg(F.min("cell").cast("bigint").alias("est"))
        .select("tok", F.col("c").cast("bigint").alias("c"), "est",
                (F.col("est") - F.col("c")).cast("bigint").alias("overcount"))
    )


def dq167_dataset_card(t: Tables) -> DataFrame:
    """Per-source dataset card: the manifest row a curation run publishes —
    doc and token counts, mean quality score (dq45's ensemble), near-dup
    rate (shared LSH pair list), and language spread. One stop for "what
    is in this source and should it ship?".

    Composition query: every input is an already-scale-shaped pipeline
    (map-only token counts, broadcast dup flags, two hash aggs), so the
    card costs one pass over the corpus plus tiny joins — this is the
    query you run after every curation round, so its plan shape matters
    as much as any single operator's.
    """
    from multi_model_vectorsearch_spark.operators.textpipe import (
        dq45_quality, minhash_lsh_pairs_shared,
    )

    docs = t["documents"]
    base = docs.select(
        "doc_id", "source", "lang",
        F.size(F.split("text", " ")).alias("n_tok"),
    )
    q = dq45_quality(t).select("doc_id", "score_micro")
    dup = minhash_lsh_pairs_shared(t).select(
        F.col("d2").alias("doc_id")).distinct().withColumn("d", F.lit(1))
    joined = (
        base.join(q, "doc_id")
        .join(F.broadcast(dup), "doc_id", "left")
    )
    return (
        joined.groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("n_tok").cast("bigint").alias("n_tokens"),
            F.floor(F.avg("score_micro") + F.lit(0.5)).cast("bigint")
            .alias("avg_quality_micro"),
            snap(F.sum(F.coalesce("d", F.lit(0)))
                 / F.count("*")).alias("dup_rate_micro"),
            F.countDistinct("lang").cast("bigint").alias("n_langs"),
        )
    )


def dq169_source_cap(t: Tables, cap: int = 400) -> DataFrame:
    """Per-source document cap: keep at most ``cap`` docs per source by a
    deterministic hash priority — the crawl-curation guard that stops one
    giant domain from dominating a training mix (the per-domain cap every
    CommonCrawl-scale pipeline applies before mixing).

    The priority is sha256-derived, so the survivors are a uniform random
    subset of each source, reproducible across runs and engines. Sources
    are power-law by nature, so the selection is two-phase: a salted
    pre-cap bounds any one task to ``cap`` survivors per (source, salt) —
    a giant domain spreads over ``n_salts`` reducers — and the final
    per-source window re-ranks at most ``n_salts × cap`` rows per source.
    The result is identical to the single-window form by construction
    (the global per-source top-``cap`` by priority survives both phases).
    """
    pri = F.substring(
        F.sha2(F.concat(F.lit("cap:"), F.col("doc_id").cast("string")), 256),
        1, 16,
    )
    n_salts = 16
    w1 = Window.partitionBy("source", "salt").orderBy("pri", "doc_id")
    pre = (
        t["documents"]
        .select("doc_id", "source", pri.alias("pri"))
        .withColumn("salt", F.pmod(F.hash("doc_id"), F.lit(n_salts)))
        .withColumn("prn", F.row_number().over(w1))
        .filter(F.col("prn") <= cap)
    )
    w = Window.partitionBy("source").orderBy("pri", "doc_id")
    return (
        pre.withColumn("rn", F.row_number().over(w).cast("int"))
        .filter(F.col("rn") <= cap)
        .select("doc_id", "source", "rn")
        .orderBy("source", "rn")
    )


def dq192_source_kl(t: Tables) -> DataFrame:
    """Per-source unigram KL divergence from the corpus distribution —
    the mixture-health monitor a pretraining pipeline tracks per data
    source (a source drifting lexically from the mix shows up here before
    it shows up in loss curves). Truncated to each source's OBSERVED
    vocabulary with +0.5 Laplace smoothing over the corpus vocab ``V``:
    KL ≈ Σ_w p_s(w)·ln(p_s(w)/p_c(w)).

    Two token-stream aggregations (per-(source, tok) and per-tok) meeting
    in one shuffle join on tok; the scalar sides (per-source totals,
    corpus total, V) broadcast. Every KL term is cast to DECIMAL(28,18)
    before the final sum so the reduction is order-independent —
    double summation over a source's whole vocabulary would otherwise be
    partition-order-sensitive (cf. the per-doc sums of dq111, which stay
    within one doc's tiny term count).
    """
    toks = t["documents"].select(
        "source", F.explode(F.split("text", " ")).alias("tok")
    )
    st = toks.groupBy("source", "tok").agg(F.count("*").alias("c_sw"))
    ct = st.groupBy("tok").agg(F.sum("c_sw").alias("c_w"))
    stot = st.groupBy("source").agg(F.sum("c_sw").alias("n_s"))
    scal = ct.agg(
        F.sum("c_w").alias("n_c"),
        F.count("*").alias("v"),
    )
    p_s = (F.col("c_sw") + 0.5) / (F.col("n_s") + 0.5 * F.col("v"))
    p_c = (F.col("c_w") + 0.5) / (F.col("n_c") + 0.5 * F.col("v"))
    # per-term pico floor snap, then exact integer sum (order-independent
    # without the DECIMAL-cast-of-double repr hazard — dq206's r5 fix)
    term_pico = snap(p_s * F.log(p_s / p_c), 1_000_000_000_000)
    return (
        st.join(ct, "tok")
        .join(F.broadcast(stot), "source")
        .crossJoin(F.broadcast(scal))
        .groupBy("source")
        .agg(
            F.max("n_s").alias("n_tokens"),
            F.count("*").alias("vocab_used"),
            F.sum(term_pico).alias("kl_pico"),
        )
    )


def dq205_feature_auc(t: Tables) -> DataFrame:
    """Per-source ROC AUC of a cheap feature (n_chars) as a classifier for
    a label (lang = 'en') — the eval every heuristic-quality-signal
    pipeline runs before trusting a filter: 'does this score actually
    rank the positives above the negatives, per data source?'

    Exact Mann-Whitney AUC with midrank tie handling, in pure integer
    arithmetic until one final division: scores collapse to DISTINCT
    (source, score) counts first, the exclusive cumulative negative count
    runs in a source-partitioned window over that (small) distinct-score
    table, and 2·numerator = Σ p_s · (2·cum_neg_before + n_s) stays a
    bigint. AUC = num2 / (2·P·N). No ranks over raw rows, no global
    window, no float summation — the plan is one shuffle to (source,
    score) plus a per-source window over distinct scores.
    """
    d = t["documents"].select(
        "source",
        F.col("n_chars").alias("score"),
        (F.col("lang") == "en").cast("bigint").alias("pos"),
    )
    g = d.groupBy("source", "score").agg(
        F.sum("pos").alias("p"),
        (F.count("*") - F.sum("pos")).alias("n"),
    )
    w = (
        Window.partitionBy("source").orderBy("score")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    staged = g.withColumn(
        "cum_neg", F.coalesce(F.sum("n").over(w), F.lit(0)))
    agg = staged.groupBy("source").agg(
        F.sum("p").alias("n_pos"),
        F.sum("n").alias("n_neg"),
        F.sum(F.col("p") * (2 * F.col("cum_neg") + F.col("n")))
        .alias("num2"),
    )
    return (
        agg.filter((F.col("n_pos") > 0) & (F.col("n_neg") > 0))
        .select(
            "source", "n_pos", "n_neg",
            # micro-unit AUC: floor-snap, NOT round() — driver-red in
            # CORRECTNESS_r05 when this was round(raw ratio, 6)
            snap(
                F.col("num2").cast("double")
                / (2.0 * F.col("n_pos") * F.col("n_neg"))).alias("auc_micro"),
        )
    )


def dq206_mutual_info(t: Tables) -> DataFrame:
    """Per-source mutual-information contribution between the `source` and
    `lang` columns — the dataset-composition audit that catches a source
    whose language mix diverges from the corpus (high MI = source strongly
    predicts language = a skew the mixture planner must know about).

    mi_part(s) = Σ_l p(s,l)·ln(p(s,l)·N / (n_s·n_l)) from exact contingency
    counts: one groupBy on (source, lang) plus two marginal aggregates
    broadcast back — the corpus is scanned once, everything downstream is
    contingency-table-sized. Each per-(s,l) term is floor-snapped to a
    micro-unit BIGINT *before* the per-source sum, so the sum is exact
    integer arithmetic (order-independent) and the output never touches
    round()/DECIMAL-cast-of-double — both of which split on
    shortest-repr-vs-binary across engines (driver-red in
    CORRECTNESS_r05 via the old ``round(sum, 6)`` + ``decimal(28,18)``
    staging). The one residual cross-engine surface is ln()'s last ulp
    landing within ~1e-12 of a micro half-boundary — negligible.
    """
    d = t["documents"].select("source", "lang")
    joint = d.groupBy("source", "lang").agg(F.count("*").alias("n_sl"))
    ms = joint.groupBy("source").agg(F.sum("n_sl").alias("n_s"))
    ml = joint.groupBy("lang").agg(F.sum("n_sl").alias("n_l"))
    tot = joint.agg(F.sum("n_sl").alias("n"))
    term_micro = snap(
        (F.col("n_sl") / F.col("n"))
        * F.log(F.col("n_sl") * F.col("n")
                / (F.col("n_s") * F.col("n_l")))
    )
    return (
        joint.join(F.broadcast(ms), "source")
        .join(F.broadcast(ml), "lang")
        .crossJoin(F.broadcast(tot))
        .groupBy("source")
        .agg(
            F.max("n_s").alias("n_docs"),
            F.count("*").alias("n_langs"),
            F.sum(term_micro).alias("mi_part_micro"),
        )
    )


def dq209_dup_flow_matrix(t: Tables, j_min: float = 0.3) -> DataFrame:
    """Cross-source duplicate-flow matrix: near-dup pairs (exact df-capped
    Jaccard ≥ ``j_min``) aggregated by unordered source pair — the 'who
    copies from whom' audit that tells a curation team whether dedup
    budget should go to intra-source boilerplate or cross-source mirrors.

    A pure projection of the session-cached pair table
    (textpipe.jaccard_pairs_shared — inverted-index candidates, never
    doc×doc) joined twice against the tiny (doc_id, source) projection;
    at 100 TB both source lookups are broadcast-joinable. Jaccards are
    rounded to the shared 6-decimal grid, compared on that grid, and
    summed as DECIMAL so the per-cell mean is order-independent.
    """
    from multi_model_vectorsearch_spark.operators.textpipe import (
        jaccard_pairs_shared,
    )

    p = jaccard_pairs_shared(t)
    jacc = snap(
        F.col("i") / (F.col("na") + F.col("nb") - F.col("i")))
    pairs = p.select("d1", "d2", jacc.alias("j")).filter(
        F.col("j") >= int(j_min * 1_000_000))
    src = t["documents"].select("doc_id", "source")
    flows = (
        pairs
        .join(src.select(F.col("doc_id").alias("d1"),
                         F.col("source").alias("s1")), "d1")
        .join(src.select(F.col("doc_id").alias("d2"),
                         F.col("source").alias("s2")), "d2")
        .select(
            F.least("s1", "s2").alias("src_a"),
            F.greatest("s1", "s2").alias("src_b"),
            F.col("j").alias("jd"),
        )
    )
    # mean of exact micro ints: bigint sum / count with one half-up floor
    return flows.groupBy("src_a", "src_b").agg(
        F.count("*").alias("n_pairs"),
        F.floor(F.sum("jd") / F.count("*") + F.lit(0.5)).cast("bigint")
        .alias("mean_j_micro"),
    )


def dq211_calibration_bins(t: Tables, n_bins: int = 10) -> DataFrame:
    """Reliability-diagram bins for a cheap probability-like score
    (normalized length, p̂ = n_chars/600) against the lang='en' label —
    the calibration audit run before using any heuristic score as a
    sampling weight: per bin, predicted mean vs empirical positive rate
    and their gap.

    Binning is pure integer arithmetic (bin = min(floor(n_chars/60),
    9)), and both the mean prediction and the positive rate are exact
    integer ratios — sums of bigints with one IEEE division each, so the
    gap column is bit-identical across engines before its final round.
    One map-side-combinable groupBy; nothing else.
    """
    d = t["documents"].select(
        F.least(F.floor(F.col("n_chars") / 60).cast("bigint"),
                F.lit(n_bins - 1).cast("bigint")).alias("bin"),
        F.col("n_chars").cast("bigint").alias("nc"),
        (F.col("lang") == "en").cast("bigint").alias("pos"),
    )
    g = d.groupBy("bin").agg(
        F.count("*").alias("n"),
        F.sum("nc").alias("snc"),
        F.sum("pos").alias("np"),
    )
    mean_pred = F.col("snc").cast("double") / (600.0 * F.col("n"))
    pos_rate = F.col("np").cast("double") / F.col("n")
    return g.select(
        "bin", "n",
        snap(mean_pred).alias("mean_pred_micro"),
        snap(pos_rate).alias("pos_rate_micro"),
        snap(F.abs(mean_pred - pos_rate)).alias("gap_micro"),
    )


def dq217_dedup_savings(t: Tables) -> DataFrame:
    """Dedup cost/benefit report per source: how many documents and tokens
    the near-dup keep-first policy (dq181's MinHash-LSH flags) would drop
    — the number a curation team quotes when deciding whether dedup
    compute pays for itself at the next scale-up.

    Composes the session-cached signature pipeline's flags with a
    map-only token count and one groupBy on source; everything after the
    flag join is source-cardinality-sized. Savings are exact integer
    ratios (one IEEE division each).
    """
    from multi_model_vectorsearch_spark.operators.textpipe import (
        dq181_neardup_first_occurrence,
    )

    flags = dq181_neardup_first_occurrence(t).select("doc_id", "is_dup")
    docs = t["documents"].select(
        "doc_id", "source",
        F.size(F.split("text", " ")).cast("bigint").alias("n_tok"),
    )
    j = docs.join(flags, "doc_id")
    return (
        j.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.col("is_dup").cast("bigint")).alias("n_dropped"),
            F.sum("n_tok").alias("tokens_total"),
            F.sum(F.when(F.col("is_dup"), F.col("n_tok"))
                  .otherwise(F.lit(0))).alias("tokens_dropped"),
        )
        .select(
            "source", "n_docs", "n_dropped", "tokens_total",
            "tokens_dropped",
            snap(
                F.col("tokens_dropped").cast("double")
                / F.col("tokens_total")).alias("savings_micro"),
        )
    )


def dq224_weighted_reservoir(t: Tables, k: int = 100) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement (Efraimidis-
    Spirakis A-RES): keep the top-``k`` docs by exponential key
    ln(u)/weight with u a content-stable hash uniform — the exact
    distributed analog of weighted reservoir sampling, and the primitive
    behind quality-weighted subset selection when dq112's independent
    per-doc keep-coins must not over/under-shoot the target count.

    The uniform comes from the same sha2 die as dq95 (stable across
    engines, runs, partitionings); ln(u)/w is monotone in u^(1/w), so
    top-k by it IS A-RES. One map-only projection + TakeOrderedAndProject
    — no shuffle of the corpus beyond the top-k merge. The sort key is
    rounded to 12 decimals so both engines compare identical doubles
    (ulp-level libm differences cannot reorder; genuine ties fall to the
    doc_id tie-break in both).
    """
    d = t["documents"].select(
        "doc_id",
        F.col("n_chars").cast("bigint").alias("w"),
    )
    h = F.conv(
        F.substring(F.sha2(F.concat(F.lit("ares:"),
                                    F.col("doc_id").cast("string")), 256),
                    1, 8), 16, 10).cast("bigint")
    u = (h + 1) / F.lit(4294967296.0)  # (0, 1]
    key = snap(F.log(u) / F.col("w"), 1_000_000_000_000)
    return (
        d.select("doc_id", "w", key.alias("skey_pico"))
        .orderBy(F.desc("skey_pico"), F.asc("doc_id"))
        .limit(k)
    )


def dq239_quantile_normalize(t: Tables) -> DataFrame:
    """Per-source quantile normalization of document length: map each
    doc's n_chars to its empirical CDF position within its source —
    the feature-engineering transform that makes a length signal
    comparable across sources whose raw distributions differ.

    dq199's domain-bounded pattern: lengths collapse to DISTINCT values
    per source, the cumulative count runs over that small table, and
    qnorm = cum/n is an exact integer ratio every doc of that (source,
    length) inherits via a broadcast-joinable lookup — no raw-row
    window anywhere.
    """
    d = t["documents"].select("doc_id", "source",
                              F.col("n_chars").alias("x"))
    per_v = d.groupBy("source", "x").agg(F.count("*").alias("c"))
    wp = Window.partitionBy("source")
    lut = (
        per_v
        .withColumn("cum", F.sum("c").over(wp.orderBy("x")))
        .withColumn("n", F.sum("c").over(wp))
        .select(
            "source", "x",
            snap(F.col("cum").cast("double") / F.col("n"))
            .alias("qnorm_micro"),
        )
    )
    return d.join(lut, ["source", "x"]).select(
        "doc_id", "source", "qnorm_micro")


def dq241_effective_sources(t: Tables) -> DataFrame:
    """Effective number of sources (inverse Simpson index) of the corpus
    mixture, by documents and by tokens — the single diversity number a
    mixture planner tracks release-over-release ('20 sources but
    effectively 3.2' flags concentration dq169's cap then fixes).

    Pure integer aggregates: inverse Simpson = (Σn)² / Σn² — both sums
    exact bigints from one map-side-combinable groupBy per weighting,
    one IEEE division each at the end.
    """
    docs = t["documents"].select(
        "source", F.size(F.split("text", " ")).cast("bigint").alias("n_tok"))
    per_src = docs.groupBy("source").agg(
        F.count("*").alias("nd"), F.sum("n_tok").alias("nt"))
    agg = per_src.agg(
        F.count("*").alias("n_sources"),
        F.sum("nd").alias("d_tot"),
        F.sum(F.col("nd") * F.col("nd")).alias("d_sq"),
        F.sum("nt").alias("t_tot"),
        F.sum(F.col("nt") * F.col("nt")).alias("t_sq"),
    )
    return agg.select(
        "n_sources", "d_tot", "t_tot",
        snap((F.col("d_tot") * F.col("d_tot")).cast("double")
             / F.col("d_sq")).alias("eff_sources_docs_micro"),
        snap((F.col("t_tot") * F.col("t_tot")).cast("double")
             / F.col("t_sq")).alias("eff_sources_tokens_micro"),
    )


def dq242_split_uniformity(t: Tables, mod: int = 100) -> DataFrame:
    """Uniformity audit of the dq95 hash-split die: chi-square of the
    observed bucket occupancy against uniform — the QA that certifies
    the content-stable splitter isn't biased before anyone trusts a
    90/5/5 split built on it.

    The bucket assignment is dq95's exact sha2 fold; counts are one
    groupBy over ``mod`` groups; chi-square terms accumulate as DECIMAL
    (order-independent) with expected = n/mod an exact integer ratio.
    """
    b = _hash_bucket(F.col("doc_id"), mod)
    counts = (
        t["documents"].select(b.alias("bucket"))
        .groupBy("bucket").agg(F.count("*").alias("n_obs"))
    )
    tot = counts.agg(F.sum("n_obs").alias("n_total"))
    exp = F.col("n_total").cast("double") / mod
    # per-bucket pico snap + exact integer sum (dq233's pattern)
    term = snap(
        (F.col("n_obs") - exp) * (F.col("n_obs") - exp) / exp,
        1_000_000_000_000)
    agg = (
        counts.crossJoin(F.broadcast(tot))
        .agg(
            F.count("*").alias("n_buckets_hit"),
            F.max("n_total").alias("n_total"),
            F.max("n_obs").alias("max_bucket"),
            F.min("n_obs").alias("min_bucket"),
            F.sum(term).alias("chi_sq_pico"),
        )
    )
    return agg


def dq246_span_dedup(t: Tables, span_words: int = 3,
                     max_df: int = 2) -> DataFrame:
    """C4-style cross-corpus span deduplication (per doc: drop every
    fixed-width word-span that occurs in more than ``max_df`` documents,
    then reassemble the survivors in order).

    The C4/RefinedWeb cleaning step is line-level ("drop any line that
    appears ≥3 times in the corpus"); the synthetic corpus has no line
    structure, so the unit here is the consecutive ``span_words``-word
    chunk — same global-frequency semantics, deterministic chunking.

    Scale shape (100 TB): spans explode map-side from the doc scan
    (~n_words/span rows, no state); the document-frequency table is one
    partial-aggregating groupBy on the span string; the drop decision is
    a LEFT ANTI join on span — both sides shuffle on the span key, no
    broadcast of anything corpus-sized, and AQE's skew handling splits
    pathological hot spans (boilerplate that appears everywhere is
    exactly the skewed key this op exists to find). Reassembly groups by
    doc_id — the same key the scan was partitioned by.

    Determinism: spans are exact strings, ``si`` is a per-doc ordinal
    from posexplode, and reassembly sorts the (si, span) structs — no
    floats anywhere, so the driver hash is stable. Docs whose every span
    is hot survive with ``clean_text = ''`` via the left join back to
    the corpus (an inner groupBy would silently drop them).
    """
    docs = t["documents"]
    words = F.split(F.col("text"), " ")
    n_spans = F.ceil(F.size(words) / F.lit(span_words)).cast("int")
    spans = F.transform(
        F.sequence(F.lit(0), n_spans - 1),
        lambda j: F.array_join(
            F.slice(words, j * span_words + 1, span_words), " "),
    )
    ex = docs.select("doc_id", F.posexplode(spans).alias("si", "span"))
    hot = (
        ex.groupBy("span")
        .agg(F.count_distinct("doc_id").alias("df"))
        .filter(F.col("df") > max_df)
        .select("span")
    )
    kept = ex.join(hot, "span", "left_anti")
    rebuilt = kept.groupBy("doc_id").agg(
        F.count("*").alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("si", "span"))),
                lambda s: s.span,
            ),
            " ",
        ).alias("clean_text"),
    )
    totals = ex.groupBy("doc_id").agg(F.count("*").alias("n_spans"))
    return (
        totals.join(rebuilt, "doc_id", "left")
        .select(
            "doc_id",
            "n_spans",
            F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
        )
    )
