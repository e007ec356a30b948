"""Text-analysis / dedup operators for LLM training-data pipelines.

North-star extensions (SURVEY.md §2.2 B53-B55): the reference dedups only by
exact SHA-256 (main.py:78-81); a 100 TB corpus pipeline also needs near-dup
detection and text quality signals. Everything here is expressed with
built-in functions (split/explode/higher-order/sha2/window) so it scales as
ordinary shuffles — no Python in the data path.

Determinism: hash families are built from sha2 (stable across engines and
runs, unlike ``xxhash``-based ``F.hash``), so even the MinHash/LSH operators
are exactly reproducible by the DuckDB oracle — approximation without
nondeterminism.

Shingling: word 3-grams over whitespace tokens, deduplicated per document.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from multi_model_vectorsearch_spark.functions.fixedpoint import snap

Tables = dict

N_MINHASH = 8  # permutations in the MinHash family
SHINGLE_W = 3  # words per shingle


_SHINGLE_CACHE: dict = {}


def _shingles(t: Tables) -> DataFrame:
    """Distinct (doc_id, shingle) pairs; word 3-grams. Session-cached —
    the shingle table feeds the MinHash, Jaccard, novelty, and
    contamination entries, each registered standalone.
    """
    return _session_cached(_SHINGLE_CACHE, t, _shingles_impl)


def word_ngrams(tok_col: str, n: int):
    """Space-joined word n-grams of an array column, as ONE codegen'd
    slice+transform expression: gram i = toks[i..i+n−1] joined by single
    spaces; docs shorter than ``n`` tokens yield an empty array. Output is
    element-for-element what MLlib's ``NGram`` transformer produces, but
    NGram evaluates through a Scala UDF (a codegen barrier) and costs an
    ``import pyspark.ml`` in every builder — the HOF form measured faster
    at sf0.1 (r14: 1.04 s → 0.63 s for the exploded 3-gram scan) and keeps
    the whole scan inside WholeStageCodegen."""
    joined = "x" + "".join(f", ' ', {tok_col}[i + {j}]" for j in range(1, n))
    return F.expr(
        f"transform(slice({tok_col}, 1, greatest(size({tok_col}) - {n - 1},"
        f" 0)), (x, i) -> concat({joined}))"
    )


def _shingles_impl(t: Tables) -> DataFrame:
    d = t["documents"]
    return (
        d.select("doc_id", F.split("text", " ").alias("toks"))
        .select("doc_id",
                F.explode(word_ngrams("toks", SHINGLE_W)).alias("shingle"))
        .distinct()
    )


#: Every _session_cached dict registers here so clear/size work globally.
_ALL_CACHES: list[dict] = []

#: Max memoized plans per cache dict; oldest is unpersisted and evicted.
#: A suite run touches one corpus per sf_dir, so 8 covers realistic use
#: while bounding executor storage memory across many corpora.
_CACHE_CAP = 8


def _session_token(session) -> str:
    """Stable per-SparkSession identity. ``id()`` can be recycled after an
    old session is GC'd (a stale persisted table would be served); a uuid
    pinned on the Python session object never is."""
    import uuid

    tok = getattr(session, "_mmvs_cache_token", None)
    if tok is None:
        tok = uuid.uuid4().hex
        try:
            session._mmvs_cache_token = tok
        except Exception:  # pragma: no cover - frozen session proxies
            return f"id{id(session)}"
    return tok


def session_cache_len() -> int:
    """Total memoized plans across every registered cache."""
    return sum(len(c) for c in _ALL_CACHES)


def clear_session_caches() -> None:
    """Unpersist and drop every memoized derived table.

    Call between table (re)loads: the cache key is the analyzed-plan
    semanticHash, which cannot see the files under an unchanged source path
    being rewritten mid-session."""
    for cache in _ALL_CACHES:
        for df in cache.values():
            try:
                df.unpersist()
            except Exception:  # pragma: no cover - session already stopped
                pass
        cache.clear()


def _session_cached(cache: dict, t: Tables, build, extra=(),
                    table: str = "documents") -> DataFrame:
    """Memoize a derived table per (session, source plan, extra) — the
    signature/fingerprint/edge tables feed many registry entries and each
    entry is standalone, so without sharing a suite run re-derives the
    same pipeline several times. Keyed on the analyzed-plan semanticHash
    of the source ``table`` so different sf_dirs/sessions never collide;
    falls back to an uncached build when the JVM plan handle is
    unavailable (e.g. Spark Connect). Capped at _CACHE_CAP entries with
    unpersist-on-evict so memory cannot grow unboundedly across corpora."""
    # identity, not equality: empty dicts are all ==, so an equality test
    # would skip registering a cache whose first population happens inside
    # another cache's build while a different empty cache is already listed
    if not any(c is cache for c in _ALL_CACHES):
        _ALL_CACHES.append(cache)
    src = t[table]
    try:
        key = (
            _session_token(src.sparkSession),
            src._jdf.queryExecution().analyzed().semanticHash(),
            *extra,
        )
    except Exception:  # pragma: no cover - non-JVM backends
        return build(t)
    hit = cache.get(key)
    if hit is None:
        hit = build(t).persist()
        while len(cache) >= _CACHE_CAP:  # insertion order = age
            old = cache.pop(next(iter(cache)))
            try:
                old.unpersist()
            except Exception:  # pragma: no cover - session already stopped
                pass
        cache[key] = hit
    return hit


_SIG_CACHE: dict = {}


def dq40_minhash_signatures(t: Tables) -> DataFrame:
    """B54: MinHash signatures — 8 independent 32-bit lanes of one sha256.

    One row per (doc_id, seed); seed ``i``'s hash of a shingle is hex chars
    ``[8i, 8i+8)`` of ``sha256(shingle)`` — eight independent uniform
    hashes for ONE digest computation (the 8-hashes-per-shingle form spent
    8× the CPU for the same min statistics). The per-seed minimum over the
    shingle set is the classic permutation surrogate; map-side partial min
    aggregation keeps the shuffle tiny at scale. Session-cached: the
    signature table feeds dq41 and the whole dedup chain.
    """
    return _session_cached(_SIG_CACHE, t, _minhash_signatures)


def _minhash_signatures(t: Tables) -> DataFrame:
    return signature_lanes(_shingles(t))


def signature_lanes(shingles: DataFrame) -> DataFrame:
    """(doc_id, seed, mh) MinHash lanes from a (doc_id, shingle) table —
    THE single definition of the lane packing (8 hex-substring lanes of
    one sha256), shared by the batch dq40 family and the streaming
    signature store so the two can never desynchronize."""
    per = shingles.select("doc_id", F.sha2(F.col("shingle"), 256).alias("h"))
    # 8 parallel min aggregates over one shuffle of N_shingle rows — vs the
    # seed-crossJoin form that shuffles N_MINHASH× the rows for the same mins
    agg = per.groupBy("doc_id").agg(
        *[F.min(F.substring("h", i * 8 + 1, 8)).alias(f"m{i}")
          for i in range(N_MINHASH)]
    )
    return agg.select(
        "doc_id",
        F.posexplode(F.array(*[f"m{i}" for i in range(N_MINHASH)])),
    ).toDF("doc_id", "seed", "mh")


def _pair_band_rows(sig: DataFrame, id_col: str) -> DataFrame:
    """(id, band, key) rows keyed by CONCATENATED 2-seed minhash values —
    one row per doc per seed pair (i<j), C(N_MINHASH, 2) = 28 bands.

    This is the scale form of the ``matches >= 2`` LSH join: a pair-band
    bucket collides with probability ~j² where a single-seed bucket
    collides with probability ~j, so the join fan-out between UNRELATED
    docs (background similarity) shrinks quadratically. The r7 100×
    scale probe measured the single-band join's candidate growth at
    exponent ~1.5 on doc count — the n²·j background term taking over —
    while the true-dup pair count grows linearly. One map-side explode of
    the per-doc lane array; no extra shuffle beyond the band join itself.
    """
    import itertools

    wide = (
        sig.groupBy(F.col(id_col).alias("_id"))
        .agg(F.sort_array(F.collect_list(F.struct("seed", "mh")))
             .alias("_sm"))
        .select("_id", F.col("_sm.mh").alias("_m"))
    )
    combos = list(itertools.combinations(range(N_MINHASH), 2))
    # one F.expr string for the 28-struct array (r14): the Column-by-Column
    # form built ~150 Column objects per call — pure py4j builder wall
    bands_sql = ", ".join(
        f"struct({i * N_MINHASH + j} AS band, "
        f"concat(element_at(_m, {i + 1}), element_at(_m, {j + 1})) AS key)"
        for i, j in combos)
    return wide.select(
        F.col("_id").alias(id_col),
        F.explode(F.expr(f"array({bands_sql})")).alias("_bk"),
    ).select(id_col, F.col("_bk.band").alias("band"),
             F.col("_bk.key").alias("key"))


def _matches_from_band_count(cnt: Column) -> Column:
    """Invert cnt = C(matches, 2): a pair sharing m seed lanes collides in
    exactly m·(m−1)/2 pair-bands. 8·cnt+1 is a perfect square (9, 25, 49,
    81, 121, 169, 225 for m = 2..8), so the double sqrt is exact."""
    return F.floor((F.lit(1.0) + F.sqrt(cnt * F.lit(8.0) + F.lit(1.0)))
                   / F.lit(2.0)).cast("int")


def dq41_minhash_lsh_pairs(t: Tables, min_matches: int = 2) -> DataFrame:
    """B54: LSH candidate pairs — docs sharing ≥min_matches signature rows.

    Joined on 2-seed pair-bands (``_pair_band_rows``): candidate SET and
    every output column are identical to the single-seed-band formulation
    (a pair matches ≥2 lanes iff it collides in ≥1 pair-band; ``matches``
    decodes exactly from the pair-band collision count), but background
    bucket collisions scale as j² instead of j. est_j = matches/8
    estimates Jaccard similarity.
    """
    assert min_matches >= 2, "pair-band join encodes the >=2 threshold"
    sig = dq40_minhash_signatures(t)
    bands = _pair_band_rows(sig, "doc_id")
    a = bands.alias("a")
    b = bands.alias("b")
    pairs = (
        a.join(b, (F.col("a.band") == F.col("b.band"))
               & (F.col("a.key") == F.col("b.key"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("d1"), F.col("b.doc_id").alias("d2"))
        .agg(_matches_from_band_count(F.count("*")).alias("matches"))
        .filter(F.col("matches") >= min_matches)
    )
    return pairs.select(
        "d1", "d2", "matches",
        snap(F.col("matches") / F.lit(float(N_MINHASH)))
        .alias("est_j_micro"),
    )


def dq245_lsh_pairs_strict(t: Tables) -> DataFrame:
    """B54 scale twin: the dq41 candidate list at min_matches = 3
    (est_j ≥ 0.375) — the threshold a larger corpus runs.

    A moderate-similarity pair (j ≈ 0.14) passes the ≥2-of-8 test with
    P ≈ 0.31 but ≥3-of-8 with P ≈ 0.07 — measured in the r7 100× probe
    as a ≈4× candidate cut at every scale factor (BASELINE.md r7 table;
    the probe corpus's growth exponent itself comes from its replica
    construction, not the threshold). dq153/dq222 measure the
    recall/precision trade the threshold buys. The ≥3 list is a subset of
    the session-shared ≥2 pair list, so this is a pure filter over that
    cached table — no second signature derivation or band join, and the
    threshold can rise further (4, 5, …) at the same zero marginal cost.
    """
    return minhash_lsh_pairs_shared(t).filter(F.col("matches") >= 3)


# session-scoped cache of the LSH pair list: dq133/dq135/dq137 all consume
# the same pairs, and each registry entry is standalone — without sharing,
# one suite run derives the full signature pipeline three extra times
# (~2 s each at sf0.1). Keyed on the analyzed-plan semanticHash of the
# documents scan, so different sf_dirs / sessions never collide.
_PAIR_CACHE: dict[tuple[int, int, int], DataFrame] = {}


def minhash_lsh_pairs_shared(t: Tables, min_matches: int = 2) -> DataFrame:
    """dq41's pair list, persisted once per (session, corpus, threshold).

    The cached object is the ≪corpus-sized pair list (docs sharing ≥2 of 8
    signatures) — with the signature table itself also session-cached
    (dq40), every downstream dedup entry skips the whole
    shingle→minhash→band-join chain after its first derivation.
    """
    return _session_cached(
        _PAIR_CACHE, t,
        lambda tt: dq41_minhash_lsh_pairs(tt, min_matches),
        extra=(min_matches,))


#: Document-frequency cap for the exact-Jaccard arms (dq42, dq153).
#: A shingle present in d docs contributes d·(d−1)/2 rows to the
#: inverted-index self-join: one corpus-wide stop-phrase 3-gram turns the
#: candidate join into a doc×doc square on that key. Shingles with df >
#: JACCARD_MAX_DF carry near-zero Jaccard discrimination (they're
#: boilerplate), so both engine and oracle compute Jaccard over the
#: df-capped shingle universe — the same max_df move dq168 applies to its
#: winnowing fingerprints. Bounds join fan-out per shingle at max_df².
JACCARD_MAX_DF = 20

_JPAIR_CACHE: dict = {}


def jaccard_pairs_shared(t: Tables, max_df: int = JACCARD_MAX_DF) -> DataFrame:
    """Exact df-capped Jaccard for every candidate pair:
    ``(d1, d2, i, na, nb)`` with ``i = |A∩B|`` and ``na/nb`` the capped
    shingle-set sizes. Session-cached — dq42's top-k and dq153's
    ground-truth arm are both projections of this one table, so the
    inverted-index build runs once per (session, corpus, cap).

    Shape at scale: the df count is a map-side-combinable aggregate (a
    corpus-wide stop-phrase costs one partial per partition, not a
    squared join); only shingles with 2 ≤ df ≤ max_df generate pairs, via
    per-shingle sorted ``collect_list`` + in-array combinations — bounded
    at max_df²/2 rows per shingle and ONE shuffle of the shingle table,
    where the naive self-join shuffles both sides then merges. Measured
    6.2 s → 2.3 s warm at sf0.1 for the pair build.
    """
    return _session_cached(
        _JPAIR_CACHE, t, lambda tt: _jaccard_pairs_impl(tt, max_df),
        extra=(max_df,))


def _jaccard_pairs_impl(t: Tables, max_df: int) -> DataFrame:
    sh = _shingles(t)
    # df via a count window instead of aggregate+join-back: ONE exchange
    # on shingle serves the cap filter AND the per-shingle grouping (the
    # groupBy below reuses the window's hash partitioning), where the
    # join-back form shuffled the shingle table three times. Measured
    # 3.2 s → 2.0 s warm at sf0.1 for the pair build. r15 re-test of the
    # partial-agg-count + join-back variant (r14 verdict item 6 —
    # map-side-combined df, AQE-skew-splittable join): rows identical,
    # but consistently ~0.5 s SLOWER at sf0.1 on a quiet host (window
    # 1.4-2.3 s vs join 2.1-2.8 s in suite-order A/B) — the second full
    # pass over the shingle table costs more than the window's funnel
    # saves at any measurable skew (the 100× audit's hottest key classes
    # stay count-only inside the window: bounded memory, no array until
    # after the cap). Declined again; revisit only if a real corpus
    # shows a stop-phrase so hot that one count-task stalls the stage.
    w = Window.partitionBy("shingle")
    capped = (
        sh.withColumn("df", F.count("*").over(w))
        .filter(F.col("df") <= max_df)
    )
    # |A| over the capped universe: df==1 shingles still count toward
    # sizes even though they can never appear in an intersection
    sizes = capped.groupBy("doc_id").agg(F.count("*").alias("n"))
    grouped = (
        capped.filter(F.col("df") >= 2)
        .groupBy("shingle")
        .agg(F.sort_array(F.collect_list("doc_id")).alias("ids"))
    )
    pairs = grouped.select(
        F.explode(F.expr(
            "flatten(transform(ids, (x, i) -> "
            "transform(slice(ids, i + 2, size(ids) - i - 1), "
            "y -> struct(x AS d1, y AS d2))))")).alias("p")
    ).select("p.d1", "p.d2")
    inter = pairs.groupBy("d1", "d2").agg(F.count("*").alias("i"))
    sa = sizes.select(F.col("doc_id").alias("d1"), F.col("n").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("d2"), F.col("n").alias("nb"))
    return inter.join(sa, "d1").join(sb, "d2").select("d1", "d2", "i", "na", "nb")


def dq42_ngram_jaccard_topk(t: Tables, k: int = 20) -> DataFrame:
    """B54: exact n-gram Jaccard — top-k most similar pairs.

    Inverted-index candidate generation (pairs must share ≥1 shingle),
    then |A∩B| / (|A| + |B| − |A∩B|) over the df-capped shingle universe
    (JACCARD_MAX_DF — one hot stop-phrase would otherwise square the
    join on that key). Never a doc×doc cross product; see
    jaccard_pairs_shared for the scale shape.
    """
    p = jaccard_pairs_shared(t)
    j = p.select(
        "d1", "d2",
        snap(F.col("i") / (F.col("na") + F.col("nb") - F.col("i")))
        .alias("j_micro"),
    )
    return j.orderBy(F.desc("j_micro"), F.asc("d1"), F.asc("d2")).limit(k)


_SIMHASH_CACHE: dict = {}


def dq43_simhash(t: Tables) -> DataFrame:
    """B54: 16-bit SimHash over the distinct token set.

    Each token votes ±1 on 16 bit positions taken from the first 4 hex chars
    of sha2(token); the signature bit is the vote sign. Near-dup docs differ
    in few bits (compare with hamming distance downstream). Session-cached
    (shared with dq128's banded join).
    """
    return _session_cached(_SIMHASH_CACHE, t, _simhash)


def _simhash(t: Tables) -> DataFrame:
    return _simhash_wide(t, bits=16)


#: Packed vote-counter geometry for every SimHash builder: 3 per-bit
#: ones-counters of 20 bits each per 64-bit accumulator (60 bits used, the
#: sign bit never touched). Exact while every doc feeds < 2^20 rows into
#: the vote — a doc would need a million DISTINCT whitespace tokens (> 5 MB
#: of unique words) to saturate a field. The per-bit-sum-lane form this
#: replaces (one ``F.sum`` per signature bit) was semantically identical
#: but built a 64-expression aggregate Column-by-Column: ~3 s of driver
#: py4j plan construction plus several seconds of optimizer/codegen per
#: session for dq248 — measured r14, guide §1.2/§7.3 (driver-side cost),
#: with the data itself executing in ~1 s.
_VOTE_FIELD_BITS = 20
_VOTE_FIELDS = 3


def _simhash_from_bits(toks: DataFrame, bit_sqls: list[str],
                       out_lanes: list[tuple[str, range]]) -> DataFrame:
    """Shared SimHash vote kernel: one groupBy(doc_id) over ``toks``.

    ``bit_sqls[b]`` is a SQL snippet evaluating to this row's 0/1 vote for
    signature bit ``b``; ``out_lanes`` maps output columns to the global
    bit indices they carry (MSB first). Votes are aggregated as packed
    ones-counters (``_VOTE_FIELDS`` fields of ``_VOTE_FIELD_BITS`` bits per
    bigint sum — 22 accumulators for 64 bits instead of 64), and a bit is
    set iff ``2·ones >= n`` — exactly ``sum(bit·2−1) >= 0``, the classic
    vote-sign rule, so signatures are bit-identical to the per-lane form
    (pinned by tests/test_approx.py's packing test). Expressions are built
    as whole SQL strings (one ``F.expr`` per aggregate/output column), not
    Column-by-Column: plan construction is O(columns), not O(bits), in
    py4j round trips.
    """
    field = 1 << _VOTE_FIELD_BITS
    n_sums = (len(bit_sqls) + _VOTE_FIELDS - 1) // _VOTE_FIELDS
    aggs = [F.count("*").alias("n")]
    for i in range(n_sums):
        terms = [f"({bit_sqls[_VOTE_FIELDS * i + j]}) * {field ** j}"
                 for j in range(_VOTE_FIELDS)
                 if _VOTE_FIELDS * i + j < len(bit_sqls)]
        aggs.append(F.sum(F.expr(" + ".join(terms))).alias(f"s{i}"))
    votes = toks.groupBy("doc_id").agg(*aggs)
    # r15 (r14 advice): the packed counters are exact only while each doc
    # contributes < 2^_VOTE_FIELD_BITS vote rows — past that a field would
    # carry into its neighbor and signatures would go silently wrong. The
    # per-doc row count is already aggregated, so the guard is one free
    # comparison that fails LOUDLY instead.
    guard = (f"IF(n < {field}, 0, raise_error(concat('simhash packed-vote "
             f"overflow: doc has ', n, ' >= {field} vote rows')))")
    outs = []
    for name, bits_list in out_lanes:
        terms = [guard]
        for w_exp, b in enumerate(reversed(list(bits_list))):
            i, j = b // _VOTE_FIELDS, b % _VOTE_FIELDS
            ones = f"((s{i} div {field ** j}) % {field})"
            terms.append(
                f"(CASE WHEN 2 * {ones} >= n THEN {1 << w_exp} ELSE 0 END)")
        outs.append(F.expr("CAST(" + " + ".join(terms) + " AS BIGINT)")
                    .alias(name))
    return votes.select("doc_id", *outs)


#: Tiny per-language stopword lexicons for the n-gram language-ID heuristic.
STOPWORDS = {
    "en": ["the", "a", "and", "of", "to", "in", "is", "it"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "es"],
    "de": ["der", "die", "und", "das", "ist", "von", "ein", "zu"],
    "fr": ["le", "la", "et", "les", "des", "un", "une", "est"],
}


def _stopword_df(spark):
    rows = [(lang, w) for lang, ws in STOPWORDS.items() for w in ws]
    return spark.createDataFrame(rows, "lang string, w string")


def stopwords_values_sql() -> str:
    """The same lexicon as a SQL VALUES list (for the DuckDB oracle)."""
    rows = ", ".join(
        f"('{lang}', '{w}')" for lang, ws in STOPWORDS.items() for w in ws
    )
    return f"(VALUES {rows}) AS sw(lang, w)"


def dq44_langid(t: Tables) -> DataFrame:
    """Language-ID heuristic: argmax of stopword hits per language.

    Docs with zero hits in every lexicon predict 'unknown'. Ties break on
    language code ascending (deterministic).
    """
    d = t["documents"]
    toks = d.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
    sw = _stopword_df(d.sparkSession)
    hits = (
        toks.join(F.broadcast(sw), toks.tok == sw.w)
        .groupBy("doc_id", "lang")
        .agg(F.count("*").alias("n_hits"))
    )
    # argmax via min_by over (-n_hits, lang) — identical tie rule to
    # orderBy(n_hits desc, lang asc), with map-side partial aggregation
    # instead of a per-doc window sort (r14)
    best = (
        hits.groupBy("doc_id")
        .agg(F.min_by(F.struct("lang", "n_hits"),
                      F.struct(-F.col("n_hits"), F.col("lang"))).alias("b"))
        .select("doc_id", F.col("b.lang").alias("pred"),
                F.col("b.n_hits").alias("n_hits"))
    )
    return (
        d.select("doc_id")
        .join(best, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("pred", F.lit("unknown")).alias("pred"),
            F.coalesce("n_hits", F.lit(0)).cast("bigint").alias("n_hits"),
        )
    )


BPE_PATTERN = "[a-z]+|[0-9]+|[^a-z0-9 ]"


def dq53_bpe_tokens(t: Tables) -> DataFrame:
    """Token counting with a BPE-ish regex (letters / digits / other).

    Whitespace tokenization (dq26) undercounts for BPE-style vocabularies;
    this is the standard cheap approximation for per-document token budgets.
    """
    d = t["documents"]
    toks = F.expr(f"regexp_extract_all(text, '{BPE_PATTERN}', 0)")
    return d.select(
        "doc_id",
        F.size(toks).cast("int").alias("n_bpe"),
        F.size(F.array_distinct(toks)).cast("int").alias("n_bpe_uniq"),
    )


WINNOW_W = 4  # winnowing window: one fingerprint per w consecutive k-grams


_WINNOW_CACHE: dict = {}


def _winnow_runs(t: Tables, w: int = WINNOW_W) -> DataFrame:
    """Run-length-encoded winnowed fingerprints: (doc_id, ps, pe, fp) — the
    contiguous position range over which one selected min persists. Classic
    winnowing records each selected min once per run; keeping the extent
    (not just the start) lets span merging measure coverage and bound gaps
    exactly (consecutive runs partition the position axis). One row per run
    is ~w× smaller than one row per position, which caps the dq168
    self-join fan-out. Session-cached: dq168 scans it three times
    (doc-frequency count + both self-join legs); dq62 is its DISTINCT
    (doc_id, fp) projection."""
    return _session_cached(_WINNOW_CACHE, t,
                           lambda tt: _winnow_runs_impl(tt, w), extra=(w,))


def _winnow_runs_impl(t: Tables, w: int) -> DataFrame:
    d = t["documents"]
    grams = d.select("doc_id", F.split("text", " ").alias("toks")).select(
        "doc_id", word_ngrams("toks", SHINGLE_W).alias("ngrams"))
    pe = grams.select("doc_id", F.posexplode("ngrams").alias("pos", "shingle"))
    h = F.conv(F.substring(F.sha2("shingle", 256), 1, 8), 16, 10).cast("bigint")
    win = (
        Window.partitionBy("doc_id").orderBy("pos").rowsBetween(0, w - 1)
    )
    wp = Window.partitionBy("doc_id").orderBy("pos")
    return (
        pe.withColumn("h", h)
        .withColumn("fp", F.min("h").over(win))
        .withColumn(
            "chg",
            (F.lag("fp").over(wp).isNull()
             | (F.lag("fp").over(wp) != F.col("fp"))).cast("int"),
        )
        .withColumn(
            "rid",
            F.sum("chg").over(
                wp.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
        )
        .groupBy("doc_id", "rid")
        .agg(
            F.min("pos").alias("ps"),
            F.max("pos").alias("pe"),
            F.first("fp").alias("fp"),  # constant within a run
        )
        .select("doc_id", "ps", "pe", "fp")
    )


def dq62_winnow_fingerprint(t: Tables, w: int = WINNOW_W) -> DataFrame:
    """Document fingerprinting by winnowing (local-min rolling hash).

    The MOSS scheme: hash every word 3-gram (stable sha2 fold → bigint),
    slide a window of ``w`` consecutive grams, keep each window's minimum,
    dedup. Guarantees shared fingerprints for any match of ≥ w+2 words
    while storing ~2/(w+1) of the grams — the sublinear fingerprint store
    a 100 TB plagiarism/near-dup index needs. Pure window functions: one
    shuffle by doc_id.
    """
    return _winnow_runs(t, w).select("doc_id", "fp").distinct()


def dq168_dup_spans(t: Tables, w: int = WINNOW_W, max_df: int = 20,
                    gap: int = WINNOW_W + SHINGLE_W) -> DataFrame:
    """Cross-document duplicated-span detection — the substring-dedup pass
    (train-data staple: long verbatim overlaps between pages) built on the
    positional winnowed fingerprints.

    Matching fingerprints anchor run pairs (d1 run × d2 run); anchors of
    one contiguous shared substring sit on one alignment diagonal
    (ps2 − ps1 ≈ constant) at adjacent positions, so islands over ps1 —
    split where the gap from the previous run's END exceeds ``gap`` or the
    diagonal jumps by more than ``w`` (run boundaries jitter up to the
    winnow window near match edges) — merge into spans. Per doc pair:
    anchor count, span count, and the longest span in grams — the evidence
    a dedup policy thresholds on.

    Scale shape: the fingerprint store is ~2/(w+1) of the grams; stop-grams
    (fingerprints in > ``max_df`` docs — boilerplate) are dropped before
    the self-join, which caps the join fan-out the way frequent-shingle
    pruning does for LSH. Everything is equi-join + window — no UDFs.
    """
    runs = _winnow_runs(t, w)
    df_count = runs.groupBy("fp").agg(
        F.count_distinct("doc_id").alias("ndocs"))
    rare = df_count.filter(
        (F.col("ndocs") >= 2) & (F.col("ndocs") <= max_df)).select("fp")
    r2 = runs.join(rare, "fp")
    a = r2.select(F.col("doc_id").alias("d1"), F.col("ps").alias("ps1"),
                  F.col("pe").alias("pe1"), "fp")
    b = r2.select(F.col("doc_id").alias("d2"), F.col("ps").alias("ps2"),
                  "fp")
    anchors = a.join(b, "fp").filter(F.col("d1") < F.col("d2")).select(
        "d1", "d2", "ps1", "pe1",
        (F.col("ps2") - F.col("ps1")).alias("diag"),
    )
    wd = Window.partitionBy("d1", "d2").orderBy("ps1", "diag")
    spans = (
        anchors.withColumn("prev_pe", F.lag("pe1").over(wd))
        .withColumn("prev_diag", F.lag("diag").over(wd))
        .withColumn(
            "new_span",
            (F.col("prev_pe").isNull()
             | (F.col("ps1") - F.col("prev_pe") > gap)
             | (F.abs(F.col("diag") - F.col("prev_diag")) > w)).cast("int"),
        )
        .withColumn(
            "span_id",
            F.sum("new_span").over(
                wd.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
        )
        .groupBy("d1", "d2", "span_id")
        .agg(
            F.count("*").alias("n_anchor"),
            (F.max("pe1") - F.min("ps1") + 1).alias("span_grams"),
        )
    )
    return (
        spans.groupBy("d1", "d2")
        .agg(
            F.sum("n_anchor").cast("bigint").alias("n_anchors"),
            F.count("*").cast("bigint").alias("n_spans"),
            F.max("span_grams").cast("bigint").alias("max_span_grams"),
        )
    )


def dq61_dedup_clusters(t: Tables, min_matches: int = 2,
                        max_iter: int = 20) -> DataFrame:
    """Near-dup clustering: connected components over LSH candidate pairs.

    The step a real dedup pipeline needs after pair generation (dq41):
    transitively group duplicates and elect the min doc_id as the canonical
    keeper. Min-label propagation — each round every node adopts the
    smallest component id among itself and its neighbors — converges in
    O(component diameter) rounds; near-dup clusters are shallow, so this is
    a handful of shuffles even at corpus scale. ``localCheckpoint`` between
    rounds keeps the plan from growing; the driver only sees one scalar
    (changed-count) per round.

    Round-count trade-off (measured): pointer jumping accelerates pure
    pointer chains exponentially but stalls at local-minima plateaus, so
    real graphs converge in ~diameter rounds either way (13→11 at sf0.1).
    If propagation hasn't converged within ``max_iter`` rounds (deep,
    adversarial components), ``connected_components`` falls back to
    alternating large-star/small-star contraction with an O(log²) round
    bound (graph.py:star_contract) — for shallow near-dup clusters the
    propagate+jump loop does fewer total shuffles, so it stays primary.
    """
    from multi_model_vectorsearch_spark.operators.graph import (
        connected_components,
    )

    # consume the session-shared LSH pair list (one signature pipeline per
    # suite run across dq61/dq133/dq135/dq137) instead of re-deriving the
    # shingle -> minhash -> band-join chain here
    pairs = minhash_lsh_pairs_shared(t, min_matches).select(
        F.col("d1").alias("src"), F.col("d2").alias("dst")
    )
    labels = connected_components(pairs, max_prop_rounds=max_iter)
    return labels.select(F.col("v").alias("doc_id"), "comp")


def dq56_bigram_udtf(t: Tables) -> DataFrame:
    """B58: real Python UDTF (Spark 4) — per-row bigram generation via LATERAL.

    dq26 covers the built-in ``explode`` UDTF shape; this is the arbitrary-
    Python table function surface (one row in → many rows out), which the
    reference has no analog for but a training-data pipeline needs for custom
    segmenters. Aggregated to per-doc counts so the oracle stays set-shaped.

    UDTFs run row-at-a-time in Python workers — keep them OFF the 100 TB hot
    path (prefer explode/transform); this exists as the escape-hatch surface.
    """
    from pyspark.sql.functions import udtf

    @udtf(returnType="bg: string")
    class Bigrams:
        def eval(self, text: str):
            toks = text.split(" ")
            for a, b in zip(toks, toks[1:]):
                yield (a + " " + b,)

    d = t["documents"]
    spark = d.sparkSession
    spark.udtf.register("bigrams", Bigrams)
    d.createOrReplaceTempView("_udtf_docs")
    return spark.sql(
        "SELECT doc_id, count(*) AS n_bg, count(DISTINCT bg) AS n_bg_uniq "
        "FROM _udtf_docs d, LATERAL bigrams(d.text) "
        "GROUP BY doc_id"
    )


def dq45_quality(t: Tables) -> DataFrame:
    """Text quality scoring: token stats + character-class + stopword ratios.

    score = 0.4·min(n_tok/100, 1) + 0.3·stopword_ratio + 0.3·min(avg_len/8, 1)
    — the standard cheap pre-filter shape for pretraining corpora.
    """
    d = t["documents"]
    toks = d.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
    en = [w for w in STOPWORDS["en"]]
    stats = toks.groupBy("doc_id").agg(
        F.count("*").alias("n_tok"),
        F.sum(F.length("tok")).cast("bigint").alias("tok_chars"),
        F.sum(F.when(F.col("tok").isin(en), 1).otherwise(0))
        .cast("bigint").alias("sw_hits"),
    )
    q = d.join(stats, "doc_id").select(
        "doc_id",
        "n_tok",
        snap(F.col("tok_chars") / F.col("n_tok")).alias("avg_len_micro"),
        snap(F.col("sw_hits") / F.col("n_tok")).alias("sw_ratio_micro"),
        snap(
            F.length(F.regexp_replace("text", "[^a-z]", ""))
            / F.length("text")
        ).alias("alpha_ratio_micro"),
    )
    # the ensemble composes the already-snapped micro ints (exact in
    # double), so both engines see identical inputs to the final snap
    return q.withColumn(
        "score_micro",
        snap(
            0.4 * F.least(F.col("n_tok") / 100.0, F.lit(1.0))
            + 0.3 * (F.col("sw_ratio_micro") / F.lit(1000000.0))
            + 0.3 * F.least(F.col("avg_len_micro") / F.lit(1000000.0)
                            / 8.0, F.lit(1.0)),
        ),
    )


def dq84_normalize_text(t: Tables) -> DataFrame:
    """Cleaning normalization: lowercase, strip non-alnum, collapse spaces.

    The canonicalization pass that runs before hashing/shingling in a real
    corpus pipeline so near-dup detection isn't defeated by punctuation or
    casing. Pure string expressions — whole-stage codegen keeps it in the
    scan stage.
    """
    d = t["documents"]
    cleaned = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower("text"), "[^a-z0-9 ]", " "),
            " +", " ",
        )
    )
    return d.select(
        "doc_id",
        cleaned.alias("clean"),
        F.sha2(cleaned, 256).alias("clean_sha"),
    )


def dq85_vocab_topk(t: Tables, k: int = 100) -> DataFrame:
    """Vocabulary extraction: top-k corpus terms by document frequency.

    The tokenizer-training primitive: one explode + two aggregations, with
    the final top-k fused into TakeOrderedAndProject. tf counts total
    occurrences; df counts distinct documents.
    """
    toks = t["documents"].select(
        "doc_id", F.explode(F.split("text", " ")).alias("tok")
    )
    # two-level agg (see dq130): avoids the Expand that count+countDistinct
    # in one pass would push through the shuffle
    per_doc = toks.groupBy("tok", "doc_id").agg(F.count("*").alias("c"))
    stats = per_doc.groupBy("tok").agg(
        F.sum("c").cast("bigint").alias("tf"),
        F.count("*").alias("df"),
    )
    return stats.orderBy(F.desc("tf"), F.asc("tok")).limit(k)


def dq86_length_filter(t: Tables, lo: float = 0.05,
                       hi: float = 0.95) -> DataFrame:
    """Quality gate: keep documents inside the [p5, p95] token-length band.

    Outlier-length removal — the standard first filter in training-data
    curation. The percentile bounds come from one tiny exact aggregate
    broadcast against the length table; no second scan of the text.
    """
    lens = t["documents"].select(
        "doc_id", F.size(F.split("text", " ")).cast("int").alias("n_tok")
    )
    bounds = lens.agg(
        F.expr(f"percentile(n_tok, {lo}D)").alias("plo"),
        F.expr(f"percentile(n_tok, {hi}D)").alias("phi"),
    )
    return (
        lens.crossJoin(F.broadcast(bounds))
        .filter((F.col("n_tok") >= F.col("plo"))
                & (F.col("n_tok") <= F.col("phi")))
        .select("doc_id", "n_tok")
    )


def dq111_word_entropy(t: Tables, n: int = 50) -> DataFrame:
    """Per-document word-distribution Shannon entropy (CCNet-style quality
    signal): low entropy flags repetitive/boilerplate docs, complementing
    dq102's dup-token fractions.

    Uses the identity H = log2(N) - (1/N)·Σ c·log2(c) so one shuffle on
    (doc_id, word) plus a partial-aggregated rollup computes it — no
    collect_list of per-word probabilities. At 100 TB the (doc_id, word)
    key is high-cardinality but unskewed, so the map-side combine absorbs
    most of the volume.
    """
    words = t["documents"].select(
        "doc_id", F.explode(F.split("text", " ")).alias("w")
    )
    wc = words.groupBy("doc_id", "w").agg(F.count("*").alias("c"))
    ent = wc.groupBy("doc_id").agg(
        F.sum("c").alias("n_words"),
        (F.log2(F.sum("c")) - F.sum(F.col("c") * F.log2("c")) / F.sum("c"))
        .alias("h"),
    )
    return (
        ent.select("doc_id", "n_words",
                   snap(F.col("h")).alias("entropy_micro"))
        .orderBy(F.desc("entropy_micro"), F.asc("doc_id"))
        .limit(n)
    )


def dq119_edit_distance_neighbors(t: Tables, prefix_len: int = 32,
                                  block_len: int = 2,
                                  max_docs: int = 200) -> DataFrame:
    """Levenshtein distance between consecutive same-block docs' normalized
    prefixes — the fuzzy-title-match primitive of record-linkage dedup.

    Edit distance is O(p²) per pair, so at scale you never run it all-pairs:
    this is the sorted-neighborhood method with a blocking key. The window
    partitions on the first ``block_len`` normalized chars (dq139's blocking
    key), so no single task ever sees more than one block — a global
    ``Window.orderBy`` would funnel the whole corpus through one partition.
    The lead() is one shuffle on the block key + a per-block linear scan;
    the builtin levenshtein stays JVM-side.
    """
    d = (
        t["documents"].filter(F.col("doc_id") < max_docs)
        .select("doc_id",
                F.lower(F.substring("text", 1, prefix_len)).alias("p"))
        .withColumn("blk", F.substring("p", 1, block_len))
    )
    w = Window.partitionBy("blk").orderBy("doc_id")
    nxt = F.lead("p").over(w)
    return (
        d.select("doc_id", F.levenshtein(F.col("p"), nxt).alias("lev"))
        .filter(F.col("lev").isNotNull())
        .orderBy("doc_id")
    )


def doc_surprisal(t: Tables) -> DataFrame:
    """Per-doc (doc_id, n_tok, bits): mean unigram surprisal under the
    corpus-global word distribution. Shared by dq127 (top-n view) and
    dq152 (per-language quality buckets)."""
    toks = t["documents"].select(
        "doc_id", F.explode(F.split("text", " ")).alias("tok")
    )
    freq = toks.groupBy("tok").agg(F.count("*").alias("c"))
    total = freq.agg(F.sum("c").alias("n_total"))
    tf = toks.groupBy("doc_id", "tok").agg(F.count("*").alias("tf"))
    return (
        tf.join(F.broadcast(freq), "tok")
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.sum("tf").cast("bigint").alias("n_tok"),
            (-F.sum(F.col("tf") * F.log2(F.col("c") / F.col("n_total")))
             / F.sum("tf")).alias("bits"),
        )
    )


def dq127_unigram_surprisal(t: Tables, n: int = 50) -> DataFrame:
    """Per-doc mean unigram surprisal (bits/token) under the corpus-global
    word distribution — the deterministic stand-in for the perplexity
    filter in quality pipelines (KenLM-style scorers plug into the same
    plan shape: per-token score, per-doc mean).

    The global frequency table is a groupBy on token broadcast back over
    the per-doc term counts, so scoring is one shuffle for tf plus a
    broadcast-hash join — the corpus is never re-shuffled by the model.
    High-surprisal docs are rare-token-heavy (gibberish or OOD), low ones
    boilerplate.
    """
    scored = doc_surprisal(t)
    return (
        scored.select("doc_id", "n_tok",
                      snap(F.col("bits")).alias("bits_per_tok_micro"))
        .orderBy(F.desc("bits_per_tok_micro"), F.asc("doc_id"))
        .limit(n)
    )


def dq128_simhash_band_pairs(t: Tables, max_hd: int = 3) -> DataFrame:
    """LSH over SimHash: band the 16-bit signatures into 4 nibbles, join
    docs sharing any (band, value) bucket, keep pairs within Hamming
    distance ``max_hd`` — the candidate-pair generator that makes SimHash
    near-dup detection subquadratic.

    The contract: any two signatures with hd <= 3 agree on at least one of
    4 nibbles (pigeonhole), so banding finds every such pair while joining
    only within buckets. Same shuffle discipline as dq41's MinHash LSH:
    one exchange on (band, value), candidate verification is a map-side
    bit_count.
    """
    sig = dq43_simhash(t)  # session-cached + persisted

    # Pair generation runs on SIGNATURE CLASSES, not documents: many docs
    # share a 16-bit signature (1112 classes for 5000 docs at sf0.1), so
    # banding the distinct signatures shrinks the LSH self-join ~(docs/
    # classes)^2 (measured 11.9 s -> 2.7 s with the sort dropped); doc
    # pairs are then emitted by
    # expanding each surviving class pair — the expansion's output volume
    # IS the result, so nothing larger than the answer ever shuffles.
    usig = sig.select("simhash").distinct()
    bands = usig.select(
        "simhash", F.explode(F.sequence(F.lit(0), F.lit(3))).alias("b")
    ).select(
        "simhash", "b",
        (F.floor(F.col("simhash") / F.pow(F.lit(16.0), F.col("b")))
         .cast("bigint") % 16).alias("bv"),
    )
    hd = F.bit_count(F.col("s1").bitwiseXOR(F.col("s2"))).cast("int")
    sig_pairs = (
        bands.select(F.col("simhash").alias("s1"), "b", "bv")
        .join(bands.select(F.col("simhash").alias("s2"), "b", "bv"),
              ["b", "bv"])
        .filter(F.col("s1") < F.col("s2"))
        .select("s1", "s2", hd.alias("hd"))
        .filter(F.col("hd") <= max_hd)
        .distinct()
    )
    # r15 fusion (same move as dq247/dq248): identical-signature doc pairs
    # ride the cross arm's two expand joins as diagonal class pairs
    # (hd = 0) instead of a separate full self-join of sig.
    # No presentation sort: result order is not part of the contract and a
    # global sort of millions of pairs is pure shuffle tax.
    allp = sig_pairs.unionByName(
        usig.select(F.col("simhash").alias("s1"),
                    F.col("simhash").alias("s2"),
                    F.lit(0).alias("hd")))
    return (
        allp
        .join(sig.select(F.col("doc_id").alias("da"),
                         F.col("simhash").alias("s1")), "s1")
        .join(sig.select(F.col("doc_id").alias("db"),
                         F.col("simhash").alias("s2")), "s2")
        .filter((F.col("hd") > 0) | (F.col("da") < F.col("db")))
        .select(F.least("da", "db").alias("d1"),
                F.greatest("da", "db").alias("d2"), "hd")
    )


#: 48-bit signatures for dq247's LSH (separate from dq43's 16-bit cache)
_SIMHASH48_CACHE: dict = {}


def _simhash_wide(t: Tables, bits: int = 48) -> DataFrame:
    """SimHash at width ``bits`` (multiple of 4, <= 60 so every bit weight
    and the hex prefix stay exact in signed 64-bit on BOTH engines): token
    hash = first bits/4 hex chars of sha2, one shuffle of distinct
    (doc, token) rows, votes aggregated through the packed-counter kernel
    (``_simhash_from_bits``)."""
    d = t["documents"]
    toks = (
        d.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
        .distinct()
        .withColumn(
            "thv",
            F.conv(F.substring(F.sha2("tok", 256), 1, bits // 4), 16, 10)
            .cast("bigint"),
        )
    )
    bit_sqls = [f"(shiftright(thv, {bits - 1 - b}) & 1)" for b in range(bits)]
    return _simhash_from_bits(toks, bit_sqls, [("simhash", range(bits))])


def dq247_simhash48_band_pairs(t: Tables, max_hd: int = 3,
                               bits: int = 48,
                               bands: int = 4) -> DataFrame:
    """SimHash LSH at the width scale actually needs — the fix for the
    cliff the sf1 gate caught in ``dq128``.

    dq128's 16-bit signatures band into 4 nibbles: 4 bands x 16 values
    = a FIXED 64 buckets, so once the corpus outgrows the signature
    space (the sf1 fixture's 50k docs >> 2^16/16) every bucket holds
    ~1/16 of all distinct signatures and the "subquadratic" candidate
    join degrades to ~sigs^2/16 — measured as the one wave-2 sf1 gate
    entry that ground for 25+ minutes on both engines. Width is the
    scale knob: ``bits=48`` (first 12 hex chars of sha2, exact in both
    engines' 64-bit integers) banded into 4 x 12-bit bands gives 4,096
    bucket values per band — selective through millions of docs; a
    100 TB corpus sizes up again (64-bit signatures, 16-bit bands) with
    the same pigeonhole contract: any pair within Hamming distance
    ``max_hd`` <= bands-1 agrees on at least one band, so banding finds
    every such pair while joining only within buckets.

    Same shuffle discipline as dq128: pair generation on SIGNATURE
    CLASSES (distinct signatures), one exchange on (band, value),
    verification a map-side bit_count, doc pairs emitted by expanding
    surviving class pairs — nothing larger than the answer shuffles."""
    width = bits // bands
    sig = _session_cached(_SIMHASH48_CACHE, t,
                          lambda tt: _simhash_wide(tt, bits),
                          extra=(bits,))
    usig = sig.select("simhash").distinct()
    bdf = usig.select(
        "simhash",
        F.explode(F.sequence(F.lit(0), F.lit(bands - 1))).alias("b"),
    ).select(
        "simhash", "b",
        (F.floor(F.col("simhash") / F.pow(F.lit(float(2 ** width)),
                                          F.col("b")))
         .cast("bigint") % (2 ** width)).alias("bv"),
    )
    hd = F.bit_count(F.col("s1").bitwiseXOR(F.col("s2"))).cast("int")
    sig_pairs = (
        bdf.select(F.col("simhash").alias("s1"), "b", "bv")
        .join(bdf.select(F.col("simhash").alias("s2"), "b", "bv"),
              ["b", "bv"])
        .filter(F.col("s1") < F.col("s2"))
        .select("s1", "s2", hd.alias("hd"))
        .filter(F.col("hd") <= max_hd)
        .distinct()
    )
    # r15 fusion: the identical-signature ("same") doc pairs used to be a
    # separate self-join of the full sig table. A class pair (s, s, hd=0)
    # per distinct signature folds them into the SAME two expand joins as
    # the cross pairs — one shuffle join on signature disappears. Class
    # pairs with s1 < s2 have hd >= 1, so `hd = 0` exactly marks the
    # diagonal, where both expansions come from one class and the d1 < d2
    # filter keeps each unordered pair once (cross pairs span two disjoint
    # classes: da never equals db and least/greatest cannot collide).
    allp = sig_pairs.unionByName(
        usig.select(F.col("simhash").alias("s1"),
                    F.col("simhash").alias("s2"),
                    F.lit(0).alias("hd")))
    return (
        allp
        .join(sig.select(F.col("doc_id").alias("da"),
                         F.col("simhash").alias("s1")), "s1")
        .join(sig.select(F.col("doc_id").alias("db"),
                         F.col("simhash").alias("s2")), "s2")
        .filter((F.col("hd") > 0) | (F.col("da") < F.col("db")))
        .select(F.least("da", "db").alias("d1"),
                F.greatest("da", "db").alias("d2"), "hd")
    )


_SIMHASH64_CACHE: dict = {}


def _simhash64_lanes(t: Tables) -> DataFrame:
    """64-bit SimHash carried as TWO 32-bit lanes — the representation
    that stays EXACT in both engines' signed 64-bit integers past the
    60-bit bound where a single hex-parse stops being safe (DuckDB
    parses ``'0x' || 15-hex-chars`` into BIGINT; 16 chars overflow, and
    a combined 64-bit signature would need sign-wrap semantics both
    engines would have to agree on). Token hash = sha2 hex chars 1-8
    (``hi`` lane, signature bits 63..32) and 9-16 (``lo`` lane, bits
    31..0); each lane is a value in [0, 2^32) so every bit weight,
    division, and XOR below is exact non-negative BIGINT arithmetic.
    One shuffle of distinct (doc, token) rows, votes aggregated through
    the packed-counter kernel (``_simhash_from_bits``): global bit b < 32
    comes from ``hi`` (shift 31−b), b >= 32 from ``lo`` (shift 63−b)."""
    d = t["documents"]
    toks = (
        d.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
        .distinct()
        .withColumn("h", F.sha2("tok", 256))
        .select(
            "doc_id",
            F.conv(F.substring("h", 1, 8), 16, 10).cast("bigint").alias("hi"),
            F.conv(F.substring("h", 9, 8), 16, 10).cast("bigint").alias("lo"),
        )
    )
    bit_sqls = (
        [f"(shiftright(hi, {31 - b}) & 1)" for b in range(32)]
        + [f"(shiftright(lo, {63 - b}) & 1)" for b in range(32, 64)]
    )
    return _simhash_from_bits(toks, bit_sqls,
                              [("sig_hi", range(32)),
                               ("sig_lo", range(32, 64))])


def dq248_simhash64_band_pairs(t: Tables, max_hd: int = 3) -> DataFrame:
    """The 100 TB turn of the SimHash width knob dq247's docstring
    names: 64-bit signatures in 4 x 16-bit bands — 65,536 bucket
    values per band, selective through billions of documents.

    Width selection (bands fixed at 4 for the hd<=3 pigeonhole; pick
    the width whose per-band bucket count keeps expected bucket
    occupancy ~O(1) at your distinct-signature count):

    ======================  ======  ==============================
    corpus (distinct sigs)  bits    buckets/band (2^(bits/4))
    ======================  ======  ==============================
    < ~10^3                 16      64        (dq128 — pinned small)
    10^3 .. ~10^7           48      4,096     (dq247)
    10^7 .. ~10^11 (100 TB) 64      65,536    (this operator)
    ======================  ======  ==============================

    Same pigeonhole contract as dq128/dq247, pinned by the same
    brute-force test: the 4 bands tile all 64 bits, so any pair within
    Hamming distance ``max_hd`` <= 3 agrees on at least one band and
    banding finds EVERY such pair while joining only within buckets.
    Same shuffle discipline too: pair generation on DISTINCT signature
    classes, one exchange on (band, value), verification a map-side
    two-lane bit_count, doc pairs emitted by expanding surviving class
    pairs — nothing larger than the answer shuffles.

    The signature itself is two 32-bit lanes (``_simhash64_lanes``):
    hi = bits 63..32, lo = 31..0. Bands 0/1 split hi, 2/3 split lo;
    Hamming distance = bit_count(hi XOR hi') + bit_count(lo XOR lo') —
    every step exact non-negative 64-bit arithmetic in BOTH engines,
    which is what lets the oracle stay bit-exact past DuckDB's 60-bit
    hex-parse bound."""
    sig = _session_cached(_SIMHASH64_CACHE, t, _simhash64_lanes)
    usig = sig.select("sig_hi", "sig_lo").distinct()
    bdf = usig.select(
        "sig_hi", "sig_lo",
        F.explode(F.sequence(F.lit(0), F.lit(3))).alias("b"),
    ).select(
        "sig_hi", "sig_lo", "b",
        F.when(F.col("b") == 0, F.floor(F.col("sig_hi") / 65536))
        .when(F.col("b") == 1, F.col("sig_hi") % 65536)
        .when(F.col("b") == 2, F.floor(F.col("sig_lo") / 65536))
        .otherwise(F.col("sig_lo") % 65536)
        .cast("bigint").alias("bv"),
    )
    hd = (F.bit_count(F.col("h1").bitwiseXOR(F.col("h2")))
          + F.bit_count(F.col("l1").bitwiseXOR(F.col("l2")))).cast("int")
    sig_pairs = (
        bdf.select(F.col("sig_hi").alias("h1"),
                   F.col("sig_lo").alias("l1"), "b", "bv")
        .join(bdf.select(F.col("sig_hi").alias("h2"),
                         F.col("sig_lo").alias("l2"), "b", "bv"),
              ["b", "bv"])
        .filter((F.col("h1") < F.col("h2"))
                | ((F.col("h1") == F.col("h2"))
                   & (F.col("l1") < F.col("l2"))))
        .select("h1", "l1", "h2", "l2", hd.alias("hd"))
        .filter(F.col("hd") <= max_hd)
        .distinct()
    )
    # r15 fusion (same move as dq247): identical-signature doc pairs ride
    # the cross arm's two expand joins as diagonal class pairs (hd = 0)
    # instead of a third full self-join of sig on both lanes.
    allp = sig_pairs.unionByName(
        usig.select(F.col("sig_hi").alias("h1"),
                    F.col("sig_lo").alias("l1"),
                    F.col("sig_hi").alias("h2"),
                    F.col("sig_lo").alias("l2"),
                    F.lit(0).cast("int").alias("hd")))
    return (
        allp
        .join(sig.select(F.col("doc_id").alias("da"),
                         F.col("sig_hi").alias("h1"),
                         F.col("sig_lo").alias("l1")), ["h1", "l1"])
        .join(sig.select(F.col("doc_id").alias("db"),
                         F.col("sig_hi").alias("h2"),
                         F.col("sig_lo").alias("l2")), ["h2", "l2"])
        .filter((F.col("hd") > 0) | (F.col("da") < F.col("db")))
        .select(F.least("da", "db").alias("d1"),
                F.greatest("da", "db").alias("d2"), "hd")
    )


def dq130_repeated_ngrams(t: Tables, n: int = 8, min_count: int = 3,
                          k: int = 40) -> DataFrame:
    """Cross-document repeated-span detection: word 8-grams occurring
    ``min_count``+ times corpus-wide, with total occurrences and distinct
    doc counts — the find-side of exact substring dedup (the
    "deduplicating training data makes LMs better" recipe, applied at
    n-gram granularity).

    Built with the codegen'd slice+transform n-gram expression
    (``word_ngrams``) and a single groupBy on the gram — at 100 TB the
    gram key is huge but uniform, and min_count pruning happens inside
    the aggregate so only the tiny repeated tail ever reaches the
    driver-bound top-k.
    """
    d = t["documents"]
    grams = (
        d.select("doc_id", F.split("text", " ").alias("toks"))
        .select("doc_id", F.explode(word_ngrams("toks", n)).alias("g"))
    )
    # two-level agg instead of count+countDistinct in one pass: the single
    # pass plans as an Expand (2x rows through the shuffle); aggregating
    # (g, doc_id) first gets full map-side combining on both levels
    per_doc = grams.groupBy("g", "doc_id").agg(F.count("*").alias("c"))
    return (
        per_doc.groupBy("g")
        .agg(
            F.sum("c").cast("bigint").alias("n_occ"),
            F.count("*").alias("n_docs"),
        )
        .filter(F.col("n_occ") >= min_count)
        .orderBy(F.desc("n_occ"), F.asc("g"))
        .limit(k)
    )


def dq131_quality_ensemble(t: Tables) -> DataFrame:
    """Composite quality verdict: z-score three independent signals
    (doc length, word entropy, max-token repetition) against corpus
    statistics and combine them into one keep/drop flag per document.

    The ensemble shape every production filter stack ends with: each
    signal is one pass over the corpus, the corpus mean/std are tiny
    broadcast aggregates, and the final verdict is a map-only expression
    — adding a signal adds a column, not a shuffle of the corpus. Keep
    rule: every |z| <= 2 (outliers in any dimension are dropped).
    """
    toks = t["documents"].select(
        "doc_id", F.explode(F.split("text", " ")).alias("w")
    )
    wc = toks.groupBy("doc_id", "w").agg(F.count("*").alias("c"))
    sig = wc.groupBy("doc_id").agg(
        F.sum("c").alias("n_words"),
        (F.log2(F.sum("c")) - F.sum(F.col("c") * F.log2("c")) / F.sum("c"))
        .alias("entropy"),
        (F.max("c") / F.sum("c")).alias("max_tok_frac"),
    )
    stats = sig.agg(
        F.avg("n_words").alias("m_n"), F.stddev_pop("n_words").alias("s_n"),
        F.avg("entropy").alias("m_e"), F.stddev_pop("entropy").alias("s_e"),
        F.avg("max_tok_frac").alias("m_r"),
        F.stddev_pop("max_tok_frac").alias("s_r"),
    )

    def z(col: str, m: str, s: str):
        # zero-variance signal (fully uniform corpus) → z = 0 on both
        # engines, instead of Spark null vs DuckDB inf/nan
        return F.when(F.col(s) == 0, F.lit(0.0)).otherwise(
            (F.col(col) - F.col(m)) / F.col(s))

    zn, ze, zr = z("n_words", "m_n", "s_n"), z("entropy", "m_e", "s_e"), \
        z("max_tok_frac", "m_r", "s_r")
    keep = (F.abs(zn) <= 2) & (F.abs(ze) <= 2) & (F.abs(zr) <= 2)
    return sig.crossJoin(F.broadcast(stats)).select(
        "doc_id",
        snap(zn).alias("z_len_micro"),
        snap(ze).alias("z_entropy_micro"),
        snap(zr).alias("z_rep_micro"),
        keep.cast("int").alias("keep"),
    )


def dq139_blocked_fuzzy_join(t: Tables, prefix_len: int = 24,
                             block_len: int = 8, max_lev: int = 8) -> DataFrame:
    """Blocked fuzzy self-join: docs whose normalized 24-char prefixes are
    within Levenshtein distance ``max_lev``, candidates generated by exact
    match on the first ``block_len`` normalized chars.

    The record-linkage pattern at scale: blocking turns the O(N²) edit-
    distance join into per-block squares (one shuffle on the block key),
    and the expensive levenshtein runs only inside blocks. Complements
    dq119's sorted-neighborhood form — blocking catches pairs that sort
    far apart; both miss pairs whose divergence is inside the blocking
    key (the standard trade, fixed in practice by multiple passes with
    different keys).
    """
    d = t["documents"].select(
        "doc_id",
        F.lower(F.substring("text", 1, prefix_len)).alias("p"),
    ).withColumn("blk", F.substring("p", 1, block_len))
    a = d.select(F.col("doc_id").alias("d1"), F.col("p").alias("p1"), "blk")
    b = d.select(F.col("doc_id").alias("d2"), F.col("p").alias("p2"), "blk")
    return (
        a.join(b, "blk")
        .filter(F.col("d1") < F.col("d2"))
        .select("d1", "d2", F.levenshtein("p1", "p2").alias("lev"))
        .filter(F.col("lev") <= max_lev)
    )


def dq150_doc_chunks(t: Tables, chunk_size: int = 200,
                     stride: int = 150) -> DataFrame:
    """Sliding-window document chunking: fixed-size character chunks with
    overlap (size 200, stride 150) — the standard pre-embedding splitter in
    retrieval/training pipelines (long docs -> bounded model inputs, the
    overlap preserving context across boundaries).

    Map-only at any scale: `sequence` builds the start offsets per row and
    `explode` fans them out — no shuffle, no UDF; chunk identity travels as
    sha256 so downstream dedup/embedding joins never carry chunk text.
    """
    d = t["documents"]
    starts = F.sequence(
        F.lit(0),
        F.greatest(F.length("text") - 1, F.lit(0)),
        F.lit(stride),
    )
    chunks = d.select(
        "doc_id", F.explode(starts).alias("s"), "text"
    ).select(
        "doc_id",
        (F.col("s") / stride).cast("int").alias("chunk_id"),
        F.substring(F.col("text"), F.col("s") + 1, F.lit(chunk_size))
        .alias("chunk"),
    )
    return chunks.select(
        "doc_id", "chunk_id",
        F.length("chunk").cast("int").alias("n_chars"),
        F.sha2(F.col("chunk"), 256).alias("chunk_sha"),
    )


def dq151_zipf_slope(t: Tables, top_n: int = 100) -> DataFrame:
    """Per-source Zipf slope: regr_slope(ln freq, ln rank) over the top-100
    terms — a one-number corpus-health signal (natural text tracks ~-1;
    template/boilerplate-heavy sources flatten, spam steepens).

    Two-level aggregation (term counts, then a built-in linear regression
    aggregate over <=100 rows per source) — the JVM-side regr_slope makes
    the fit free; no driver round-trip, no UDF.
    """
    toks = t["documents"].select(
        "source", F.explode(F.split("text", " ")).alias("tok")
    )
    counts = toks.groupBy("source", "tok").agg(F.count("*").alias("c"))
    w = Window.partitionBy("source").orderBy(F.desc("c"), F.asc("tok"))
    ranked = counts.withColumn("rank", F.row_number().over(w)) \
        .filter(F.col("rank") <= top_n)
    return ranked.groupBy("source").agg(
        F.count("*").cast("int").alias("n_terms"),
        snap(
            F.regr_slope(F.log(F.col("c").cast("double")),
                         F.log(F.col("rank").cast("double")))
        ).alias("zipf_slope_micro"),
    )


def dq153_lsh_recall(t: Tables, j_min: float = 0.25) -> DataFrame:
    """MinHash-LSH candidate quality vs exact n-gram Jaccard ground truth:
    recall/precision of the dq41 candidate pairs against all pairs with
    true Jaccard >= j_min — the eval loop that tunes band/threshold choices
    before a dedup run is trusted at scale.

    The exact arm is a filter over the shared df-capped Jaccard pair
    table (jaccard_pairs_shared — never the doc x doc square, and built
    once per session for dq42 and this entry together); both sides reduce
    to one-row aggregates before the final cross of two singleton frames.
    The threshold compares the UNROUNDED ratio in both engines (rounding
    first would flip pairs within half an ulp of the boundary).
    """
    truth = (
        jaccard_pairs_shared(t)
        .filter(F.col("i") / (F.col("na") + F.col("nb") - F.col("i"))
                >= F.lit(j_min))
        .select("d1", "d2")
    )
    cand = minhash_lsh_pairs_shared(t).select("d1", "d2")
    hit = truth.join(cand, ["d1", "d2"], "left_semi")
    n_true = truth.agg(F.count("*").cast("bigint").alias("n_true"))
    n_cand = cand.agg(F.count("*").cast("bigint").alias("n_cand"))
    n_hit = hit.agg(F.count("*").cast("bigint").alias("n_hit"))
    return n_true.crossJoin(n_cand).crossJoin(n_hit).select(
        "n_true", "n_cand", "n_hit",
        snap(F.col("n_hit") / F.col("n_true")).alias("recall_micro"),
        snap(F.col("n_hit") / F.col("n_cand")).alias("precision_micro"),
    )


def dq155_ngram_novelty(t: Tables) -> DataFrame:
    """Per-doc n-gram novelty: the share of a doc's distinct 3-gram shingles
    whose corpus-wide first occurrence (min doc_id, the ingest-order
    surrogate) is this doc — the freshness curve a crawl pipeline watches
    to decide when a source is mined out.

    Aggregate-only: a doc's novel-shingle count is just how many rows of
    the first-seen table name it — groupBy(min-doc) — so the per-doc sizes
    and the novelty counts reduce independently (both map-side combinable)
    and meet in a doc-count-sized join. The earlier form joined the full
    shingle table back on the wide string key (~9 s at sf0.1 → ~1 s).
    """
    sh = _shingles(t)
    sizes = sh.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("n_shingles"))
    novel = (
        sh.groupBy("shingle").agg(F.min("doc_id").alias("fd"))
        .groupBy("fd").agg(F.count("*").cast("bigint").alias("n_novel"))
    )
    return (
        sizes.join(novel, sizes.doc_id == novel.fd, "left")
        .select(
            "doc_id", "n_shingles",
            F.coalesce("n_novel", F.lit(0)).cast("bigint").alias("n_novel"),
            snap(F.coalesce("n_novel", F.lit(0))
                 / F.col("n_shingles")).alias("novelty_micro"),
        )
    )


def dq172_minhash_estimate_audit(t: Tables) -> DataFrame:
    """Sketch-quality audit: MinHash Jaccard estimate (matches/8) vs exact
    n-gram Jaccard, per LSH candidate pair — the companion to dq153 (which
    scores the candidate SET) that scores the ESTIMATOR itself; together
    they justify trusting matches/8 as the dedup-policy threshold.

    The exact arm only touches candidate pairs: the tiny pair list
    broadcasts against the shingle table twice (d1 leg, then (d2, shingle)
    equi-join), so cost scales with candidates × doc-shingles, never the
    corpus square.
    """
    pairs = minhash_lsh_pairs_shared(t)
    sh = _shingles(t)
    cand = pairs.select("d1", "d2")
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    s1 = sh.select(F.col("doc_id").alias("d1"), "shingle")
    s2 = sh.select(F.col("doc_id").alias("d2"), "shingle")
    inter = (
        F.broadcast(cand).join(s1, "d1")
        .join(s2, ["d2", "shingle"])
        .groupBy("d1", "d2")
        .agg(F.count("*").alias("i"))
    )
    est = F.col("matches") / F.lit(8.0)
    exact = F.col("i") / (F.col("na") + F.col("nb") - F.col("i"))
    return (
        pairs.join(inter, ["d1", "d2"])
        .join(F.broadcast(sizes.select(F.col("doc_id").alias("d1"),
                                       F.col("n").alias("na"))), "d1")
        .join(F.broadcast(sizes.select(F.col("doc_id").alias("d2"),
                                       F.col("n").alias("nb"))), "d2")
        .select(
            "d1", "d2", F.col("matches").cast("int").alias("matches"),
            snap(est).alias("est_j_micro"),
            snap(exact).alias("exact_j_micro"),
            snap(F.abs(est - exact)).alias("abs_err_micro"),
        )
    )


def dq180_tfidf_top_terms(t: Tables, top_n: int = 5) -> DataFrame:
    """Per-document top-``top_n`` TF-IDF terms — the keyword-extraction
    pass a curation pipeline runs for topic tagging, index previews, and
    lexical-drift monitoring. Smooth IDF (sklearn's formula):
    idf = ln((N + 1)/(df + 1)) + 1.

    Scale shape: term frequencies reduce map-side on (doc_id, tok); the
    document-frequency table derives FROM the tf aggregate (count of tf
    rows per tok — never a second pass over the corpus) and joins back
    co-partitioned on tok; the final per-doc top-n is one window on
    doc_id. Three shuffles total, all map-combinable or key-aligned; no
    broadcast of the vocabulary-sized df table is attempted.
    """
    d = t["documents"]
    toks = d.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
    tf = toks.groupBy("doc_id", "tok").agg(F.count("*").alias("tf"))
    dfs = tf.groupBy("tok").agg(F.count("*").alias("df"))
    n_docs = d.agg(F.count("*").alias("n"))
    idf = F.log((F.col("n") + 1.0) / (F.col("df") + 1.0)) + 1.0
    scored = (
        tf.join(dfs, "tok").crossJoin(F.broadcast(n_docs))
        .select("doc_id", "tok", "tf",
                snap(F.col("tf") * idf).alias("tfidf_micro"))
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("tfidf_micro"), F.asc("tok"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_n)
        .select("doc_id", "tok", "tf", "tfidf_micro",
                F.col("rank").cast("int").alias("rank"))
    )


def dq181_neardup_first_occurrence(t: Tables) -> DataFrame:
    """Per-document near-dup flag against every EARLIER document: is_dup
    iff some lower-doc_id doc shares ≥2 of the 8 MinHash lanes, with
    ``dup_of`` the earliest such predecessor — the flag table an
    ingest-ordered dedup pass publishes (flag-then-decide; signatures of
    flagged docs stay in the store, so the semantics are replay-order
    independent and IDENTICAL whether computed in one batch or
    incrementally per micro-batch — pinned by the streaming-equivalence
    test).

    One projection over the session-shared dq41 candidate pairs (banded
    LSH join — never doc×doc) plus a left join back to the corpus.
    """
    pairs = minhash_lsh_pairs_shared(t)  # (d1 < d2, matches >= 2)
    dupof = pairs.groupBy("d2").agg(F.min("d1").alias("dup_of"))
    docs = t["documents"].select("doc_id")
    return (
        docs.join(dupof, docs.doc_id == dupof.d2, "left")
        .select("doc_id", F.col("dup_of").isNotNull().alias("is_dup"),
                "dup_of")
    )


def neardup_flags_incremental(sig_fresh: DataFrame,
                              sig_store: DataFrame,
                              min_matches: int = 2) -> DataFrame:
    """Streaming form of dq181 for one micro-batch: flag each fresh doc
    against the signature STORE (all earlier docs) plus earlier docs
    within the same batch. Returns (doc_id, is_dup, dup_of); appending
    ``sig_fresh`` to the store afterwards reproduces dq181's batch
    output exactly, because flagged docs' signatures are retained.
    """
    assert min_matches >= 2, "pair-band join encodes the >=2 threshold"
    store_bands = _pair_band_rows(sig_store, "doc_id").select(
        F.col("doc_id").alias("d1"), "band", "key")
    fresh_bands = _pair_band_rows(sig_fresh, "doc_id")
    within = fresh_bands.select(F.col("doc_id").alias("d1"), "band", "key")
    mine = fresh_bands.select(F.col("doc_id").alias("d2"), "band", "key")
    cand = (
        store_bands.unionAll(within)
        .join(mine, ["band", "key"])
        .filter(F.col("d1") < F.col("d2"))
        .groupBy("d1", "d2")
        .agg(_matches_from_band_count(F.count("*")).alias("matches"))
        .filter(F.col("matches") >= min_matches)
    )
    dupof = cand.groupBy("d2").agg(F.min("d1").alias("dup_of"))
    docs = sig_fresh.select("doc_id").distinct()
    return (
        docs.join(dupof, docs.doc_id == dupof.d2, "left")
        .select("doc_id", F.col("dup_of").isNotNull().alias("is_dup"),
                "dup_of")
    )


def dq183_prefix_filter_join(t: Tables, tau: float = 0.6) -> DataFrame:
    """Set-similarity self-join with PREFIX FILTERING (the AllPairs/PPJoin
    family, Bayardo et al. 2007): all document pairs whose shingle-set
    Jaccard is >= ``tau``, found without ever comparing all pairs.

    Each doc orders its shingles by ascending global document frequency
    (rarest first) and keeps only the first ``n - ceil(tau*n) + 1`` as its
    *prefix*; two sets with Jaccard >= tau MUST share at least one prefix
    shingle, so joining on prefix shingles is a LOSSLESS candidate
    generator. The oracle is the brute-force all-pairs scan — equality
    with it is the losslessness proof.

    Scale story: the candidate join touches only the rare end of the df
    spectrum (a prefix shingle appears in few docs by construction), so
    the join fans out ~df_prefix^2 per shingle instead of d^2 per corpus —
    the pruning that df-capping (dq42) approximates, made exact. The df
    table is aggregated once and joined back by shingle (an equi-shuffle,
    never a crossJoin); verification joins only the surviving candidate
    pairs back to the per-doc shingle arrays.
    """
    cand = prefix_filter_candidates(t, tau)
    # Verify arrays come from the SAME per-doc aggregation the prefix
    # stage built (ordered carries every shingle, not just the prefix) —
    # no second corpus-wide collect.
    sets = _prefix_arrays(t, tau).select(
        "doc_id",
        F.expr("transform(ordered, p -> p.shingle)").alias("s"),
    )
    verified = (
        cand.join(sets.select(F.col("doc_id").alias("d1"),
                              F.col("s").alias("s1")), "d1")
        .join(sets.select(F.col("doc_id").alias("d2"),
                          F.col("s").alias("s2")), "d2")
        .select(
            "d1", "d2",
            F.size(F.array_intersect("s1", "s2")).alias("i"),
            "n1", "n2",
        )
        .select(
            "d1", "d2",
            snap(F.col("i") / (F.col("n1") + F.col("n2") - F.col("i")))
            .alias("jaccard_micro"),
        )
        .filter(F.col("jaccard_micro") >= int(tau * 1_000_000))
    )
    return verified


def prefix_filter_candidates(t: Tables, tau: float) -> DataFrame:
    """dq183's candidate generator: (d1, d2, n1, n2) pairs sharing a
    rarest-first prefix shingle, pruned by the PPJoin length AND
    positional filters. Exposed standalone so the pruning claim
    (|candidates| << all pairs) is testable.

    The positional filter (Xiao et al. 2008): a prefix match at sorted
    positions (i, j) can contribute at most ``1 + min(n1-i-1, n2-j-1)``
    to the overlap, while Jaccard >= tau needs overlap >=
    ``tau/(1+tau) * (n1+n2)``; matches whose upper bound falls short are
    dropped BEFORE the dedup/verify stages. Measured at sf0.1 this cuts
    the verified-candidate set ~6x vs the plain prefix filter, and both
    filters are per-row predicates on the join output — no extra shuffle.

    All three pruning filters use ``tau - 5e-7`` instead of ``tau``: the
    verify stage (and the oracle) accept ``round(jaccard, 6) >= tau``, so
    a pair whose true Jaccard sits in [tau − 5e-7, tau) still rounds in —
    pruning with exact tau would drop it from candidates and break
    losslessness for giant sets where the half-ulp band is reachable.
    """
    tau_eps = tau - 5e-7  # relax: candidates must be a SUPERSET of verify
    arrs = _prefix_arrays(t, tau)
    plen = (F.col("n") - F.ceil(F.lit(tau_eps) * F.col("n")) + 1).cast("int")
    pref = arrs.select(
        "doc_id", "n",
        F.posexplode(F.slice(F.col("ordered"), 1, plen)).alias("pos", "p"),
    ).select("doc_id", "n", "pos", F.col("p.shingle").alias("shingle"))
    a = pref.alias("a")
    b = pref.alias("b")
    alpha = F.ceil(F.lit(tau_eps / (1.0 + tau_eps))
                   * (F.col("a.n") + F.col("b.n")))
    ubound = 1 + F.least(F.col("a.n") - F.col("a.pos") - 1,
                         F.col("b.n") - F.col("b.pos") - 1)
    cand = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .filter(ubound >= alpha)
        .select(
            F.col("a.doc_id").alias("d1"), F.col("b.doc_id").alias("d2"),
            F.col("a.n").alias("n1"), F.col("b.n").alias("n2"),
        )
        .distinct()
        # Length filter: |y| >= tau*|x| is necessary for Jaccard >= tau.
        .filter(F.greatest("n1", "n2") * tau_eps <= F.least("n1", "n2"))
    )
    return cand


_PREFIX_ARR_CACHE: dict = {}


def _prefix_arrays(t: Tables, tau: float) -> DataFrame:
    """Per-doc rarest-first shingle arrays for the prefix-filter join:
    (doc_id, ordered: array<struct<df,shingle>>, n). Session-cached so
    the candidate and verify stages of one dq183 run (and repeat runs)
    share a single df-count + corpus collect. tau-independent (the prefix
    length is applied downstream), so every threshold shares one build."""
    del tau  # signature kept parallel with prefix_filter_candidates
    return _session_cached(_PREFIX_ARR_CACHE, t, _prefix_arrays_impl)


def _prefix_arrays_impl(t: Tables) -> DataFrame:
    sh = _shingles(t)
    dfs = sh.groupBy("shingle").agg(F.count("*").alias("df"))
    ranked = sh.join(dfs, "shingle")
    return (
        ranked.groupBy("doc_id")
        .agg(
            F.sort_array(F.collect_list(F.struct("df", "shingle")))
            .alias("ordered"),
            F.count("*").alias("n"),
        )
    )


def dq200_sorted_neighborhood(t: Tables, window: int = 5,
                              j_min: float = 0.2) -> DataFrame:
    """Sorted-neighborhood dedup (the classic SNM entity-resolution pass):
    sort docs by a normalized blocking key, compare each doc only to its
    ``window`` successors in sort order, and keep pairs whose token-set
    Jaccard clears ``j_min`` — the linear-candidate alternative to LSH
    when near-dups share prefixes (ingest batches, boilerplate headers).

    The sort runs WITHIN 2-char key blocks (partitionBy(blk)), so no
    global single-partition window exists at any scale; candidates come
    from a ``window``-row FOLLOWING frame collect — one linear window
    pass emitting exactly ≤ window · n pairs, never materialized as a
    block self-join (the equi-join-on-block form built n_blk² rows per
    block before the rn-range filter could prune: 6.9 s → 0.9 s warm at
    sf0.1). Token sets ride along as per-doc arrays inside the frame, so
    the verify step is a map-side array_intersect — the candidate pairs
    never re-join the corpus token table. Jaccard is an exact integer
    ratio: one IEEE division, identical on both engines.
    """
    d = t["documents"]
    keyed = d.select(
        "doc_id",
        F.substring(F.replace(F.col("text"), F.lit(" "), F.lit("")), 1, 24)
        .alias("key"),
        F.array_distinct(F.split("text", " ")).alias("toks"),
    ).withColumn("blk", F.substring("key", 1, 2))
    wf = (
        Window.partitionBy("blk").orderBy("key", "doc_id")
        .rowsBetween(1, window)
    )
    pairs = (
        keyed
        .withColumn("nxt", F.collect_list(F.struct("doc_id", "toks")).over(wf))
        .select(
            F.col("doc_id").alias("d1"), F.col("toks").alias("ta"),
            F.explode("nxt").alias("nb"),
        )
        .select(
            "d1", "ta",
            F.col("nb.doc_id").alias("d2"), F.col("nb.toks").alias("tb"),
        )
    )
    inter = F.size(F.array_intersect("ta", "tb"))
    return (
        pairs.select(
            "d1", "d2",
            snap(
                inter.cast("double")
                / (F.size("ta") + F.size("tb") - inter)).alias("jacc_micro"),
        )
        .filter(F.col("jacc_micro") >= int(j_min * 1_000_000))
    )


def dq202_bigram_lm(t: Tables, add_k: float = 0.5) -> DataFrame:
    """Bigram language-model scoring with add-k smoothing: train exact
    bigram/left-context counts on the corpus itself, then score every doc
    by its mean log P(w_i | w_{i-1}) — the trained upgrade of dq127's
    unigram surprisal and the deterministic stand-in for a KenLM-style
    perplexity filter (same plan shape: count tables broadcast onto a
    per-doc scan).

    Three count aggregates (bigrams, left contexts, vocab size — each
    map-side combinable) broadcast back over the per-doc bigram counts;
    the corpus is never re-shuffled by the model. Low scores flag
    improbable token transitions (gibberish), high ones boilerplate.
    """
    d = t["documents"]
    toks = d.select("doc_id", F.split("text", " ").alias("w"))
    bg = toks.select(
        "doc_id",
        # bracket indexing is 0-based in Spark SQL; x sits at 0-based
        # position i, so its successor is w[i + 1]
        F.explode(F.expr(
            "transform(slice(w, 1, size(w) - 1), "
            "(x, i) -> concat(x, ' ', w[i + 1]))")).alias("bg"),
    )
    per_doc = bg.groupBy("doc_id", "bg").agg(F.count("*").alias("tf"))
    # r15: corpus bigram counts and left-context counts fold FROM the
    # per-doc counts (sum of tf ≡ count of occurrences, exact integers)
    # instead of re-exploding the corpus — the bigram explode and its
    # exchange now appear once in the plan and are reused by all three
    # aggregates, where the old form ran three explode+shuffle passes.
    c2 = per_doc.groupBy("bg").agg(F.sum("tf").alias("c2"))
    c1 = (
        per_doc
        .groupBy(F.split_part(F.col("bg"), F.lit(" "), F.lit(1))
                 .alias("w1"))
        .agg(F.sum("tf").alias("c1"))
    )
    vocab = (
        d.select(F.explode(F.split("text", " ")).alias("tok"))
        .agg(F.count_distinct("tok").alias("v"))
    )
    # per-(doc, bigram) micro snap, then exact integer sums — the old
    # unordered double sum + round() was the r5 hazard class
    lp_micro = snap(
        F.col("tf")
        * F.log((F.col("c2") + add_k) / (F.col("c1") + add_k * F.col("v"))))
    return (
        per_doc.join(F.broadcast(c2), "bg")
        .withColumn("w1", F.split_part(F.col("bg"), F.lit(" "), F.lit(1)))
        .join(F.broadcast(c1), "w1")
        .crossJoin(F.broadcast(vocab))
        .groupBy("doc_id")
        .agg(
            F.sum("tf").cast("bigint").alias("n_bigrams"),
            F.floor(F.sum(lp_micro) / F.sum("tf") + F.lit(0.5))
            .cast("bigint").alias("mean_logp_micro"),
        )
    )


def dq203_containment_join(t: Tables, c_min: float = 0.5) -> DataFrame:
    """Asymmetric containment join: containment(A in B) = |S(A)∩S(B)| /
    |S(A)| over word shingles — the partial-duplication detector Jaccard
    misses (a short doc quoted inside a long one scores near-zero Jaccard
    but containment ≈ 1), the signal used for quote/boilerplate-inclusion
    curation.

    Pure projection of the session-cached df-capped pair table
    (jaccard_pairs_shared): candidates come from the same inverted-index
    build as dq42/dq153 — never a doc×doc product — and each symmetric
    candidate emits its two directed containments. Exact integer ratio,
    one IEEE division.
    """
    p = jaccard_pairs_shared(t)
    directed = p.select(
        F.col("d1").alias("src"), F.col("d2").alias("dst"),
        snap(F.col("i") / F.col("na")).alias("containment_micro"),
    ).unionAll(p.select(
        F.col("d2").alias("src"), F.col("d1").alias("dst"),
        snap(F.col("i") / F.col("nb")).alias("containment_micro"),
    ))
    return directed.filter(
        F.col("containment_micro") >= int(c_min * 1_000_000))


def dq221_langid_confusion(t: Tables) -> DataFrame:
    """Confusion matrix of the n-gram language identifier (dq44) against
    the ground-truth lang column — the eval that turns a heuristic into a
    measured component (which languages leak into 'en', what 'unknown'
    hides) before its output is trusted as a mixture key.

    Composes dq44's prediction (stopword-hit voting, one shuffle) with a
    broadcast-sized groupBy on (lang, pred); per-language recall is an
    exact integer ratio computed in the same pass via a windowed total.
    """
    pred = dq44_langid(t).select("doc_id", "pred")
    actual = t["documents"].select("doc_id", "lang")
    cells = (
        actual.join(pred, "doc_id")
        .groupBy("lang", "pred").agg(F.count("*").alias("n"))
    )
    wl = Window.partitionBy("lang")
    return cells.select(
        "lang", "pred", "n",
        F.sum("n").over(wl).alias("n_lang"),
        snap(F.col("n").cast("double") / F.sum("n").over(wl))
        .alias("frac_micro"),
    )


def dq222_lsh_pr_curve(t: Tables) -> DataFrame:
    """Precision/recall curve of the MinHash-LSH near-dup detector against
    the exact df-capped Jaccard ground truth, across a threshold grid —
    the tuning artifact (dq153 reports one operating point) that picks
    band/threshold settings before a full-corpus dedup run.

    Both arms are projections of session-cached tables (the signature
    band pairs and the exact pair table share the same shingle build);
    the full-outer pair join runs once and the threshold grid is an
    in-row explode, so the curve costs one pass over the candidate union
    regardless of grid size. Counts are exact integers; P/R are single
    IEEE divisions.
    """
    exact = jaccard_pairs_shared(t).select(
        "d1", "d2",
        snap(F.col("i") / (F.col("na") + F.col("nb") - F.col("i")))
        .alias("j"),
    )
    lsh = minhash_lsh_pairs_shared(t).select(
        "d1", "d2", snap(F.col("matches") / 8.0).alias("est_j"))
    u = exact.join(lsh, ["d1", "d2"], "full_outer").select(
        F.coalesce("j", F.lit(0).cast("bigint")).alias("j"),
        F.coalesce("est_j", F.lit(-1).cast("bigint")).alias("est_j"),
    )
    taus = F.explode(F.array(*[
        F.lit(int(x * 1_000_000)) for x in (0.2, 0.3, 0.4, 0.5)]))
    g = u.select("j", "est_j", taus.alias("tau"))
    agg = g.groupBy("tau").agg(
        F.sum(((F.col("j") >= F.col("tau"))
               & (F.col("est_j") >= F.col("tau"))).cast("bigint"))
        .alias("tp"),
        F.sum((F.col("est_j") >= F.col("tau")).cast("bigint")).alias("pp"),
        F.sum((F.col("j") >= F.col("tau")).cast("bigint")).alias("ap"),
    )
    return agg.select(
        # tau is a micro-unit grid literal; /10000 is exact → e2 units
        (F.col("tau") / F.lit(10000)).cast("bigint").alias("tau_e2"),
        "tp", "pp", "ap",
        F.when(F.col("pp") > 0,
               snap(F.col("tp").cast("double") / F.col("pp")))
        .otherwise(F.lit(None)).alias("precision_micro"),
        F.when(F.col("ap") > 0,
               snap(F.col("tp").cast("double") / F.col("ap")))
        .otherwise(F.lit(None)).alias("recall_micro"),
    )


def dq227_vocab_coverage_curve(t: Tables) -> DataFrame:
    """Token coverage curve: what fraction of the corpus token stream the
    top-k vocabulary covers, for a grid of k — the tokenizer-budget
    audit (how big must the vocab be before <unk> is rare) run before
    committing to a vocab size.

    The whole computation happens on the VOCAB table (one groupBy of the
    stream, map-side combinable): rank by (count desc, token), running
    covered-count over the vocab rows, then one probe per grid point.
    Counts are exact bigints; coverage is one IEEE division per row.
    Round-8 migration: the rank AND the running covered-count come from
    one ``global_order_scalable`` pass (range-partition + offset
    broadcast) — a whitespace-token vocab over a 100 TB web corpus is
    NOT domain-bounded (billions of distinct tokens), so the old
    partitionless window was a genuine single-task funnel. Output is
    row-identical to the window form.
    """
    from multi_model_vectorsearch_spark.operators.scale import (
        global_order_scalable,
    )

    toks = t["documents"].select(
        F.explode(F.split("text", " ")).alias("tok"))
    vocab = toks.groupBy("tok").agg(F.count("*").alias("c"))
    ranked, _n = global_order_scalable(
        vocab, [("c", "desc"), "tok"], rank_col="r",
        cum_sums=(("cum", "c"),))
    total = vocab.agg(F.sum("c").alias("n_total"),
                      F.count("*").alias("vocab_size"))
    ks = [2, 5, 10, 20, 30]
    grid = ranked.filter(F.col("r").isin(ks))
    return (
        grid.crossJoin(F.broadcast(total))
        .select(
            F.col("r").alias("k"),
            F.col("cum").alias("covered"),
            "n_total", "vocab_size",
            snap(F.col("cum").cast("double") / F.col("n_total"))
            .alias("coverage_micro"),
        )
    )


def dq230_template_mining(t: Tables, prefix_len: int = 2,
                          min_docs: int = 3) -> DataFrame:
    """Prompt-template mining: group documents by their first
    ``prefix_len`` tokens and surface prefixes shared by ≥ ``min_docs``
    docs — the instruction-dataset audit that catches template-generated
    text (one boilerplate stem, thousands of fills) which dedup by
    whole-document similarity under-counts.

    One map-side-combinable groupBy on the token prefix; coverage joins
    a one-row total broadcast. Exact counts, one IEEE division per row.
    """
    d = t["documents"].select(
        "doc_id",
        F.concat_ws(" ", F.slice(F.split("text", " "), 1, prefix_len))
        .alias("tpl"),
    )
    g = d.groupBy("tpl").agg(
        F.count("*").alias("n_docs"),
        F.min("doc_id").alias("first_doc"),
    )
    tot = d.agg(F.count("*").alias("n_total"))
    return (
        g.filter(F.col("n_docs") >= min_docs)
        .crossJoin(F.broadcast(tot))
        .select(
            "tpl", "n_docs", "first_doc",
            snap(F.col("n_docs").cast("double") / F.col("n_total"))
            .alias("coverage_micro"),
        )
    )
