"""Shared DuckDB oracle SQL fragments (split out of dq.py).\n\nDialect shims and CTE bodies reused across registration modules.\n"""

from __future__ import annotations

from multi_model_vectorsearch_spark.operators import textpipe as T


# --- DuckDB oracle SQL fragments for the vector/graph suite -----------------

def _cos(e: str, q: str) -> str:
    return f"list_cosine_similarity(CAST({e}.embedding AS DOUBLE[]), CAST({q}.qv AS DOUBLE[]))"


# 16-bit SimHash signatures (dq43's pipeline, shared with dq128's LSH bands)
_SIMHASH_CTE = (
    "toks AS (SELECT DISTINCT doc_id, tok FROM "
    "(SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents) u), "
    "hv AS (SELECT doc_id, "
    "((strpos('0123456789abcdef', substr(h4, 1, 1)) - 1) * 4096 + "
    "(strpos('0123456789abcdef', substr(h4, 2, 1)) - 1) * 256 + "
    "(strpos('0123456789abcdef', substr(h4, 3, 1)) - 1) * 16 + "
    "(strpos('0123456789abcdef', substr(h4, 4, 1)) - 1)) AS thv FROM "
    "(SELECT doc_id, substr(sha256(tok), 1, 4) AS h4 FROM toks) t2), "
    "bits AS (SELECT doc_id, p, "
    "CAST(CAST(floor(thv / pow(2, 15 - p)) AS BIGINT) % 2 AS INT) AS bit "
    "FROM hv CROSS JOIN (SELECT CAST(range AS INT) AS p FROM range(0, 16)) pos), "
    "votes AS (SELECT doc_id, p, sum(bit * 2 - 1) AS v FROM bits "
    "GROUP BY doc_id, p), "
    "sig AS (SELECT doc_id, CAST(sum(CASE WHEN v >= 0 THEN "
    "CAST(pow(2, 15 - p) AS BIGINT) ELSE 0 END) AS BIGINT) AS simhash "
    "FROM votes GROUP BY doc_id)"
)


# 48-bit SimHash signatures (dq247's scale-width LSH; 12 hex chars of
# sha256 parse exactly into signed 64-bit on both engines, and every
# bit weight pow(2, 47-p) is an exact double)
_SIMHASH48_CTE = (
    "toks AS (SELECT DISTINCT doc_id, tok FROM "
    "(SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents) u), "
    "hv AS (SELECT doc_id, "
    "CAST(('0x' || substr(sha256(tok), 1, 12)) AS BIGINT) AS thv FROM toks), "
    "bits AS (SELECT doc_id, p, "
    "CAST(CAST(floor(thv / pow(2, 47 - p)) AS BIGINT) % 2 AS INT) AS bit "
    "FROM hv CROSS JOIN (SELECT CAST(range AS INT) AS p FROM range(0, 48)) pos), "
    "votes AS (SELECT doc_id, p, sum(bit * 2 - 1) AS v FROM bits "
    "GROUP BY doc_id, p), "
    "sig48 AS (SELECT doc_id, CAST(sum(CASE WHEN v >= 0 THEN "
    "CAST(pow(2, 47 - p) AS BIGINT) ELSE 0 END) AS BIGINT) AS simhash "
    "FROM votes GROUP BY doc_id)"
)


# 64-bit SimHash signatures as TWO 32-bit lanes (dq248's 100 TB width
# step): 8 hex chars per lane parse exactly into BIGINT, every bit
# weight pow(2, 31-p) is exact, and both lanes stay non-negative —
# bit-exact past DuckDB's 60-bit single-hex-parse bound
_SIMHASH64_CTE = (
    "toks AS (SELECT DISTINCT doc_id, tok FROM "
    "(SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents) u), "
    "hv AS (SELECT doc_id, "
    "CAST(('0x' || substr(sha256(tok), 1, 8)) AS BIGINT) AS hi, "
    "CAST(('0x' || substr(sha256(tok), 9, 8)) AS BIGINT) AS lo FROM toks), "
    "bits AS (SELECT doc_id, p, "
    "CAST(CAST(floor(CASE WHEN p < 32 THEN hi / pow(2, 31 - p) "
    "ELSE lo / pow(2, 63 - p) END) AS BIGINT) % 2 AS INT) AS bit "
    "FROM hv CROSS JOIN (SELECT CAST(range AS INT) AS p FROM range(0, 64)) pos), "
    "votes AS (SELECT doc_id, p, sum(bit * 2 - 1) AS v FROM bits "
    "GROUP BY doc_id, p), "
    "sig64 AS (SELECT doc_id, "
    "CAST(sum(CASE WHEN p < 32 AND v >= 0 THEN "
    "CAST(pow(2, 31 - p) AS BIGINT) ELSE 0 END) AS BIGINT) AS sig_hi, "
    "CAST(sum(CASE WHEN p >= 32 AND v >= 0 THEN "
    "CAST(pow(2, 63 - p) AS BIGINT) ELSE 0 END) AS BIGINT) AS sig_lo "
    "FROM votes GROUP BY doc_id)"
)


_SEEDS_CTE = (
    "qq AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0), "
    "seeds AS (SELECT e.vec_id, CAST(floor(("
    + _cos("e", "qq")
    + ") * 1000000.0 + 0.5) AS BIGINT) AS s_micro "
    "FROM embeddings e CROSS JOIN qq "
    "ORDER BY s_micro DESC, vec_id LIMIT 10)"
)

_EDGES_CTE = (
    "q AS (SELECT vec_id AS qid, embedding AS qv, label % 3 AS qm FROM embeddings "
    "WHERE vec_id < 20), "
    "sims AS (SELECT q.qid, q.qm, e.vec_id, e.label % 3 AS em, "
    "CAST(floor((CASE WHEN e.vec_id = q.qid THEN 1.0 ELSE "
    + _cos("e", "q") + " END) * 1000000.0 + 0.5) AS BIGINT) AS s_micro "
    "FROM embeddings e CROSS JOIN q), "
    "ranked AS (SELECT *, row_number() OVER "
    "(PARTITION BY qid ORDER BY s_micro DESC, vec_id) "
    "AS rnk FROM sims), "
    "pairs AS (SELECT * FROM ranked WHERE rnk <= 5 AND vec_id <> qid), "
    "edges AS (SELECT least(qid, vec_id) AS src, greatest(qid, vec_id) AS dst, "
    "max(CASE WHEN qm <> em THEN greatest(s_micro, 800000) "
    "ELSE s_micro END) AS score_micro "
    "FROM pairs GROUP BY src, dst)"
)


# --- DuckDB oracle fragments for the retrieval suite ------------------------

_BM25_CTE = (
    "toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok "
    "FROM documents), "
    "dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id), "
    "stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl), "
    "tf AS (SELECT doc_id, tok, count(*) AS tf FROM toks "
    "WHERE tok IN ('vector','merge','stream') GROUP BY doc_id, tok), "
    "dfs AS (SELECT tok, count(*) AS df FROM tf GROUP BY tok), "
    "bm25 AS (SELECT tf.doc_id, sum("
    "ln((stats.n - dfs.df + 0.5) / (dfs.df + 0.5) + 1.0) * tf.tf * 2.2 / "
    "(tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / stats.avgdl))) AS raw "
    "FROM tf JOIN dfs USING (tok) JOIN dl USING (doc_id) CROSS JOIN stats "
    "GROUP BY tf.doc_id)"
)


# --- DuckDB oracle fragments for the text-pipeline suite --------------------

# word 3-gram shingles, distinct per doc (mirrors textpipe._shingles)
_SH_CTE = (
    "sh AS (SELECT DISTINCT doc_id, shingle FROM ("
    "SELECT doc_id, unnest(list_transform(range(1, len(toks) - 1), "
    "i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS shingle "
    "FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents) d) s)"
)

# df-capped shingles for the exact-Jaccard arms (mirrors
# textpipe.jaccard_pairs_shared / JACCARD_MAX_DF): stop-grams present in more
# than max_df docs are dropped before the inverted-index self-join.
_SHC_CTE = (
    _SH_CTE + ", "
    "shk AS (SELECT shingle FROM sh GROUP BY shingle "
    f"HAVING count(*) <= {T.JACCARD_MAX_DF}), "
    "shc AS (SELECT sh.doc_id, sh.shingle FROM sh JOIN shk USING (shingle))"
)

_SIG_CTE = (
    _SH_CTE + ", "
    "seeds AS (SELECT CAST(range AS INT) AS seed FROM range(0, 8)), "
    "sig AS (SELECT doc_id, seed, "
    "min(substr(sha256(shingle), seed * 8 + 1, 8)) AS mh "
    "FROM sh CROSS JOIN seeds GROUP BY doc_id, seed)"
)

# value of the first 8 hex chars of column h (hash_embed fold, exact in DOUBLE)
_HEXFOLD = " + ".join(
    f"(strpos('0123456789abcdef', substr(h, {c}, 1)) - 1) * {16 ** (8 - c)}"
    for c in range(1, 9)
)

# partsupp surrogate for the Q2/Q9/Q11/Q16/Q20 shapes (the fixtures ship no
# partsupp table): availqty = total quantity shipped for the pair,
# supplycost = min observed unit price as exact integer cents.
_PS_CTE = (
    "ps AS (SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey, "
    "CAST(sum(l_quantity) AS BIGINT) AS ps_availqty, "
    "CAST(min(floor(CAST(round(l_extendedprice * 100) AS BIGINT) "
    "/ CAST(l_quantity AS BIGINT))) AS BIGINT) AS ps_cost_cents "
    "FROM lineitem GROUP BY l_partkey, l_suppkey)"
)

# hash_embed pseudo-embeddings per (doc_id, p), normalized
_EMB_CTE = (
    "pos AS (SELECT CAST(range AS INT) AS p FROM range(0, 16)), "
    # lane p of the stub embedding = hex chars [8*(p%8), 8*(p%8)+8) of
    # sha256(text || ':' || p//8) — mirrors hash_embed_text's digest lanes
    "hx AS (SELECT doc_id, p, "
    "substr(sha256(text || ':' || CAST(p // 8 AS VARCHAR)), "
    "(p % 8) * 8 + 1, 8) AS h "
    "FROM documents CROSS JOIN pos), "
    "v AS (SELECT doc_id, p, ((" + _HEXFOLD + ") / 4294967296.0) * 2 - 1 AS vj "
    "FROM hx), "
    "norms AS (SELECT doc_id, sqrt(sum(vj*vj)) AS nrm FROM v GROUP BY doc_id), "
    "nv AS (SELECT v.doc_id, p, vj / nrm AS x FROM v JOIN norms n "
    "ON v.doc_id = n.doc_id)"
)


def _kcore_sql(k: int = 2, rounds: int = 3) -> str:
    """DuckDB oracle for dq190: the identical unrolled peeling rounds."""
    parts = ["e0 AS (SELECT src, dst FROM edges)"]
    for r in range(1, rounds + 1):
        p = r - 1
        parts.append(
            f"d{r} AS (SELECT v, count(*) AS d FROM "
            f"(SELECT src AS v FROM e{p} UNION ALL SELECT dst FROM e{p}) u "
            f"GROUP BY v)")
        parts.append(f"k{r} AS (SELECT v FROM d{r} WHERE d >= {k})")
        parts.append(
            f"e{r} AS (SELECT e.src, e.dst FROM e{p} e "
            f"JOIN k{r} a ON e.src = a.v JOIN k{r} b ON e.dst = b.v)")
    parts.append(
        f"fd AS (SELECT v, count(*) AS core_deg FROM "
        f"(SELECT src AS v FROM e{rounds} UNION ALL "
        f"SELECT dst FROM e{rounds}) u GROUP BY v)")
    parts.append(
        "nodes AS (SELECT DISTINCT v AS id FROM "
        "(SELECT src AS v FROM e0 UNION ALL SELECT dst FROM e0) u)")
    return (
        ", ".join(parts)
        + " SELECT id, CAST(coalesce(fd.core_deg, 0) AS BIGINT) AS core_deg, "
        "fd.core_deg IS NOT NULL AS in_kcore "
        "FROM nodes LEFT JOIN fd ON nodes.id = fd.v"
    )


def _spread_sql(x: str, bits: int = 10) -> str:
    """DuckDB expression: Morton bit-spread of ``x`` (mirrors
    scale.dq189_zorder_layout's magic-mask interleave)."""
    e = f"({x} & {(1 << bits) - 1})"
    for sh, m in ((8, 0x00FF00FF), (4, 0x0F0F0F0F),
                  (2, 0x33333333), (1, 0x55555555)):
        e = f"((({e}) | (({e}) << {sh})) & {m})"
    return e
