"""Declared-query registrations for operators/textpipe.py (split from dq.py)."""

from __future__ import annotations

from multi_model_vectorsearch_spark.operators import textpipe as T
from multi_model_vectorsearch_spark.operators.registrations.base import DQ
from multi_model_vectorsearch_spark.operators.registrations.fragments import (
    _HEXFOLD,
    _SHC_CTE,
    _SH_CTE,
    _SIG_CTE,
    _SIMHASH48_CTE,
    _SIMHASH64_CTE,
    _SIMHASH_CTE,
)

DQS: list[DQ] = [
    DQ("dq56_bigram_udtf", T.dq56_bigram_udtf,
       "SELECT doc_id, count(*) AS n_bg, count(DISTINCT bg) AS n_bg_uniq FROM ("
       "SELECT doc_id, unnest(list_transform(range(1, len(toks)), "
       "i -> toks[i] || ' ' || toks[i+1])) AS bg "
       "FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents) d"
       ") t GROUP BY doc_id"),
    DQ("dq84_normalize_text", T.dq84_normalize_text,
       "WITH c AS (SELECT doc_id, trim(regexp_replace(regexp_replace("
       "lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS clean "
       "FROM documents) "
       "SELECT doc_id, clean, sha256(clean) AS clean_sha FROM c"),
    DQ("dq85_vocab_topk", T.dq85_vocab_topk,
       "SELECT tok, count(*) AS tf, count(DISTINCT doc_id) AS df FROM "
       "(SELECT doc_id, unnest(string_split(text, ' ')) AS tok "
       "FROM documents) t GROUP BY tok ORDER BY tf DESC, tok LIMIT 100"),
    DQ("dq86_length_filter", T.dq86_length_filter,
       "WITH lens AS (SELECT doc_id, CAST(len(string_split(text, ' ')) AS INT) "
       "AS n_tok FROM documents), "
       "b AS (SELECT quantile_cont(n_tok, 0.05) AS plo, "
       "quantile_cont(n_tok, 0.95) AS phi FROM lens) "
       "SELECT doc_id, n_tok FROM lens CROSS JOIN b "
       "WHERE n_tok >= plo AND n_tok <= phi"),
    DQ("dq62_winnow_fingerprint", T.dq62_winnow_fingerprint,
       "WITH toks AS (SELECT doc_id, string_split(text, ' ') AS tk "
       "FROM documents), "
       "grams AS (SELECT doc_id, p, sha256(tk[p] || ' ' || tk[p+1] || ' ' "
       "|| tk[p+2]) AS h FROM toks, UNNEST(range(1, len(tk) - 1)) AS u(p)), "
       "hv AS (SELECT doc_id, p, " + _HEXFOLD + " AS hb FROM grams), "
       "wins AS (SELECT doc_id, CAST(min(hb) OVER (PARTITION BY doc_id "
       "ORDER BY p ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS BIGINT) "
       "AS fp FROM hv) "
       "SELECT DISTINCT doc_id, fp FROM wins"),
    DQ("dq61_dedup_clusters", T.dq61_dedup_clusters,
       "WITH RECURSIVE " + _SIG_CTE + ", "
       "p AS (SELECT a.doc_id AS d1, b.doc_id AS d2 "
       "FROM sig a JOIN sig b ON a.seed = b.seed AND a.mh = b.mh "
       "AND a.doc_id < b.doc_id GROUP BY d1, d2 HAVING count(*) >= 2), "
       "adj AS (SELECT d1 AS v, d2 AS n FROM p "
       "UNION SELECT d2, d1 FROM p), "
       "reach AS (SELECT v, v AS r FROM (SELECT DISTINCT v FROM adj) base "
       "UNION SELECT e.v, reach.r FROM adj e JOIN reach ON e.n = reach.v) "
       "SELECT v AS doc_id, min(r) AS comp FROM reach GROUP BY v"),
    DQ("dq40_minhash_signatures", T.dq40_minhash_signatures,
       "WITH " + _SIG_CTE + " SELECT doc_id, seed, mh FROM sig"),
    DQ("dq41_minhash_lsh_pairs", T.dq41_minhash_lsh_pairs,
       "WITH " + _SIG_CTE + ", "
       "p AS (SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS matches "
       "FROM sig a JOIN sig b ON a.seed = b.seed AND a.mh = b.mh "
       "AND a.doc_id < b.doc_id GROUP BY d1, d2) "
       "SELECT d1, d2, matches, CAST(floor((matches / 8.0) * 1000000.0 + 0.5) AS BIGINT) AS est_j_micro FROM p "
       "WHERE matches >= 2"),
    DQ("dq42_ngram_jaccard_topk", T.dq42_ngram_jaccard_topk,
       "WITH " + _SHC_CTE + ", "
       "sizes AS (SELECT doc_id, count(*) AS n FROM shc GROUP BY doc_id), "
       "inter AS (SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS i "
       "FROM shc a JOIN shc b ON a.shingle = b.shingle AND a.doc_id < b.doc_id "
       "GROUP BY d1, d2) "
       "SELECT d1, d2, CAST(floor((i / (sa.n + sb.n - i)) * 1000000.0 + 0.5) AS BIGINT) AS j_micro "
       "FROM inter JOIN sizes sa ON sa.doc_id = d1 "
       "JOIN sizes sb ON sb.doc_id = d2 "
       "ORDER BY j_micro DESC, d1, d2 LIMIT 20"),
    DQ("dq43_simhash", T.dq43_simhash,
       "WITH " + _SIMHASH_CTE + " SELECT doc_id, simhash FROM sig"),
    DQ("dq44_langid", T.dq44_langid,
       "WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok "
       "FROM documents), "
       "hits AS (SELECT doc_id, lang, count(*) AS n_hits FROM toks "
       "JOIN " + T.stopwords_values_sql() + " ON tok = w "
       "GROUP BY doc_id, lang), "
       "best AS (SELECT doc_id, lang AS pred, n_hits, row_number() OVER "
       "(PARTITION BY doc_id ORDER BY n_hits DESC, lang) AS rn FROM hits) "
       "SELECT d.doc_id, coalesce(b.pred, 'unknown') AS pred, "
       "CAST(coalesce(b.n_hits, 0) AS BIGINT) AS n_hits "
       "FROM documents d LEFT JOIN (SELECT * FROM best WHERE rn = 1) b "
       "ON d.doc_id = b.doc_id"),
    DQ("dq45_quality", T.dq45_quality,
       "WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok "
       "FROM documents), "
       "stats AS (SELECT doc_id, count(*) AS n_tok, "
       "CAST(sum(length(tok)) AS BIGINT) AS tok_chars, "
       "CAST(sum(CASE WHEN tok IN ('the','a','and','of','to','in','is','it') "
       "THEN 1 ELSE 0 END) AS BIGINT) AS sw_hits FROM toks GROUP BY doc_id), "
       "q AS (SELECT d.doc_id, n_tok, "
       "CAST(floor((tok_chars / n_tok) * 1000000.0 + 0.5) AS BIGINT) AS avg_len_micro, "
       "CAST(floor((sw_hits / n_tok) * 1000000.0 + 0.5) AS BIGINT) AS sw_ratio_micro, "
       "CAST(floor((length(regexp_replace(text, '[^a-z]', '', 'g')) / length(text)) * 1000000.0 + 0.5) AS BIGINT) "
       "AS alpha_ratio_micro "
       "FROM documents d JOIN stats ON d.doc_id = stats.doc_id) "
       "SELECT doc_id, n_tok, avg_len_micro, sw_ratio_micro, "
       "alpha_ratio_micro, "
       "CAST(floor((0.4 * least(n_tok / 100.0, 1.0) + 0.3 * (sw_ratio_micro / 1000000.0) + 0.3 * least(avg_len_micro / 1000000.0 / 8.0, 1.0)) * 1000000.0 + 0.5) AS BIGINT) "
       "AS score_micro FROM q"),
    DQ("dq53_bpe_tokens", T.dq53_bpe_tokens,
       "SELECT doc_id, "
       "CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS INT) "
       "AS n_bpe, "
       "CAST(len(list_distinct(regexp_extract_all(text, "
       "'[a-z]+|[0-9]+|[^a-z0-9 ]'))) AS INT) AS n_bpe_uniq FROM documents"),
    DQ("dq111_word_entropy", T.dq111_word_entropy,
       "WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w "
       "FROM documents), "
       "wc AS (SELECT doc_id, w, count(*) AS c FROM w GROUP BY doc_id, w) "
       "SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_words, "
       "CAST(floor((log2(sum(c)) - sum(c * log2(c)) / sum(c)) * 1000000.0 + 0.5) AS BIGINT) AS entropy_micro "
       "FROM wc GROUP BY doc_id "
       "ORDER BY entropy_micro DESC, doc_id LIMIT 50"),
    DQ("dq119_edit_distance_neighbors", T.dq119_edit_distance_neighbors,
       "WITH d AS (SELECT doc_id, lower(substr(text, 1, 32)) AS p "
       "FROM documents WHERE doc_id < 200), "
       "x AS (SELECT doc_id, levenshtein(p, lead(p) OVER "
       "(PARTITION BY substr(p, 1, 2) ORDER BY doc_id)) AS lev FROM d) "
       "SELECT doc_id, lev FROM x WHERE lev IS NOT NULL ORDER BY doc_id"),
    DQ("dq127_unigram_surprisal", T.dq127_unigram_surprisal,
       "WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok "
       "FROM documents), "
       "freq AS (SELECT tok, count(*) AS c FROM toks GROUP BY tok), "
       "tot AS (SELECT sum(c) AS n_total FROM freq), "
       "tf AS (SELECT doc_id, tok, count(*) AS tf FROM toks "
       "GROUP BY doc_id, tok) "
       "SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_tok, "
       "CAST(floor((-sum(tf * log2(c / n_total)) / sum(tf)) * 1000000.0 + 0.5) AS BIGINT) AS bits_per_tok_micro "
       "FROM tf JOIN freq USING (tok) CROSS JOIN tot "
       "GROUP BY doc_id ORDER BY bits_per_tok_micro DESC, doc_id LIMIT 50"),
    DQ("dq128_simhash_band_pairs", T.dq128_simhash_band_pairs,
       "WITH " + _SIMHASH_CTE + ", "
       "bands AS (SELECT doc_id, simhash, i AS b, "
       "CAST(CAST(floor(simhash / pow(16, i)) AS BIGINT) % 16 AS BIGINT) "
       "AS bv FROM sig CROSS JOIN range(4) r(i)), "
       "cand AS (SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2, "
       "a.simhash AS s1, b.simhash AS s2 FROM bands a JOIN bands b "
       "ON a.b = b.b AND a.bv = b.bv AND a.doc_id < b.doc_id) "
       "SELECT d1, d2, CAST(bit_count(xor(s1, s2)) AS INT) AS hd "
       "FROM cand WHERE bit_count(xor(s1, s2)) <= 3 ORDER BY d1, d2",
       scale_cap="16-bit signature space is the DEFINITION of this "
                 "entry (4 nibble bands, 64 fixed buckets): past "
                 "~2^16/16 distinct signatures every bucket saturates "
                 "and candidates grow ~sigs^2/16 on BOTH engines (the "
                 "r13 sf1-gate find) — kept as the pinned small-scale "
                 "contract; the scale paths are dq247 (48-bit) and "
                 "dq248 (64-bit)"),
    DQ("dq247_simhash48_band_pairs", T.dq247_simhash48_band_pairs,
       "WITH " + _SIMHASH48_CTE + ", "
       "bands AS (SELECT doc_id, simhash, i AS b, "
       "CAST(CAST(floor(simhash / pow(4096, i)) AS BIGINT) % 4096 AS BIGINT) "
       "AS bv FROM sig48 CROSS JOIN range(4) r(i)), "
       "cand AS (SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2, "
       "a.simhash AS s1, b.simhash AS s2 FROM bands a JOIN bands b "
       "ON a.b = b.b AND a.bv = b.bv AND a.doc_id < b.doc_id) "
       "SELECT d1, d2, CAST(bit_count(xor(s1, s2)) AS INT) AS hd "
       "FROM cand WHERE bit_count(xor(s1, s2)) <= 3 ORDER BY d1, d2",
       note="scale-width SimHash LSH: the sf1 gate showed dq128's "
            "16-bit banding saturating (64 fixed buckets); 48-bit/"
            "12-bit-band keeps buckets selective through millions of "
            "docs"),
    DQ("dq248_simhash64_band_pairs", T.dq248_simhash64_band_pairs,
       "WITH " + _SIMHASH64_CTE + ", "
       "bands AS (SELECT doc_id, sig_hi, sig_lo, i AS b, "
       "CASE WHEN i = 0 THEN CAST(floor(sig_hi / 65536) AS BIGINT) "
       "WHEN i = 1 THEN sig_hi % 65536 "
       "WHEN i = 2 THEN CAST(floor(sig_lo / 65536) AS BIGINT) "
       "ELSE sig_lo % 65536 END AS bv "
       "FROM sig64 CROSS JOIN range(4) r(i)), "
       "cand AS (SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2, "
       "a.sig_hi AS ha, a.sig_lo AS la, b.sig_hi AS hb, b.sig_lo AS lb "
       "FROM bands a JOIN bands b "
       "ON a.b = b.b AND a.bv = b.bv AND a.doc_id < b.doc_id) "
       "SELECT d1, d2, CAST(bit_count(xor(ha, hb)) + "
       "bit_count(xor(la, lb)) AS INT) AS hd FROM cand "
       "WHERE bit_count(xor(ha, hb)) + bit_count(xor(la, lb)) <= 3 "
       "ORDER BY d1, d2",
       note="the 100 TB SimHash width step dq247 names: 64-bit "
            "signatures (two exact 32-bit lanes) in 4 x 16-bit bands "
            "— 65,536 buckets/band, selective through billions of "
            "docs; oracle exact past DuckDB's 60-bit hex-parse bound"),
    DQ("dq130_repeated_ngrams", T.dq130_repeated_ngrams,
       "WITH g AS (SELECT doc_id, unnest(list_transform("
       "range(1, len(toks) - 6), i -> toks[i] || ' ' || toks[i+1] || ' ' || "
       "toks[i+2] || ' ' || toks[i+3] || ' ' || toks[i+4] || ' ' || "
       "toks[i+5] || ' ' || toks[i+6] || ' ' || toks[i+7])) AS g FROM "
       "(SELECT doc_id, string_split(text, ' ') AS toks FROM documents) d) "
       "SELECT g, CAST(count(*) AS BIGINT) AS n_occ, "
       "CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs "
       "FROM g GROUP BY g HAVING count(*) >= 3 "
       "ORDER BY n_occ DESC, g LIMIT 40"),
    DQ("dq131_quality_ensemble", T.dq131_quality_ensemble,
       "WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w "
       "FROM documents), "
       "wc AS (SELECT doc_id, w, count(*) AS c FROM w GROUP BY doc_id, w), "
       "sig AS (SELECT doc_id, sum(c) AS n_words, "
       "log2(sum(c)) - sum(c * log2(c)) / sum(c) AS entropy, "
       "max(c) / sum(c) AS max_tok_frac FROM wc GROUP BY doc_id), "
       "st AS (SELECT avg(n_words) AS m_n, stddev_pop(n_words) AS s_n, "
       "avg(entropy) AS m_e, stddev_pop(entropy) AS s_e, "
       "avg(max_tok_frac) AS m_r, stddev_pop(max_tok_frac) AS s_r FROM sig), "
       "zs AS (SELECT doc_id, "
       "CASE WHEN s_n = 0 THEN 0.0 ELSE (n_words - m_n) / s_n END AS zn, "
       "CASE WHEN s_e = 0 THEN 0.0 ELSE (entropy - m_e) / s_e END AS ze, "
       "CASE WHEN s_r = 0 THEN 0.0 ELSE (max_tok_frac - m_r) / s_r END "
       "AS zr FROM sig CROSS JOIN st) "
       "SELECT doc_id, CAST(floor((zn) * 1000000.0 + 0.5) AS BIGINT) AS z_len_micro, "
       "CAST(floor((ze) * 1000000.0 + 0.5) AS BIGINT) AS z_entropy_micro, "
       "CAST(floor((zr) * 1000000.0 + 0.5) AS BIGINT) AS z_rep_micro, "
       "CAST(CASE WHEN abs(zn) <= 2 AND abs(ze) <= 2 AND abs(zr) <= 2 "
       "THEN 1 ELSE 0 END AS INT) AS keep FROM zs"),
    DQ("dq139_blocked_fuzzy_join", T.dq139_blocked_fuzzy_join,
       "WITH d AS (SELECT doc_id, lower(substr(text, 1, 24)) AS p, "
       "lower(substr(text, 1, 8)) AS blk FROM documents) "
       "SELECT a.doc_id AS d1, b.doc_id AS d2, levenshtein(a.p, b.p) AS lev "
       "FROM d a JOIN d b ON a.blk = b.blk AND a.doc_id < b.doc_id "
       "WHERE levenshtein(a.p, b.p) <= 8"),
    DQ("dq150_doc_chunks", T.dq150_doc_chunks,
       "WITH st AS (SELECT doc_id, text, "
       "unnest(range(0, greatest(length(text), 1), 150)) AS s FROM documents) "
       "SELECT doc_id, CAST(s // 150 AS INT) AS chunk_id, "
       "CAST(length(substr(text, CAST(s AS INT) + 1, 200)) AS INT) AS n_chars, "
       "sha256(substr(text, CAST(s AS INT) + 1, 200)) AS chunk_sha FROM st"),
    DQ("dq151_zipf_slope", T.dq151_zipf_slope,
       "WITH toks AS (SELECT source, unnest(string_split(text, ' ')) AS tok "
       "FROM documents), "
       "counts AS (SELECT source, tok, count(*) AS c FROM toks "
       "GROUP BY source, tok), "
       "ranked AS (SELECT source, c, row_number() OVER "
       "(PARTITION BY source ORDER BY c DESC, tok) AS rank FROM counts "
       "QUALIFY rank <= 100) "
       "SELECT source, CAST(count(*) AS INT) AS n_terms, "
       "CAST(floor((regr_slope(ln(CAST(c AS DOUBLE)), ln(CAST(rank AS DOUBLE)))) * 1000000.0 + 0.5) AS BIGINT) "
       "AS zipf_slope_micro FROM ranked GROUP BY source"),
    DQ("dq153_lsh_recall", T.dq153_lsh_recall,
       "WITH " + _SIG_CTE + ", "
       "shk AS (SELECT shingle FROM sh GROUP BY shingle "
       f"HAVING count(*) <= {T.JACCARD_MAX_DF}), "
       "shc AS (SELECT sh.doc_id, sh.shingle FROM sh JOIN shk USING (shingle)), "
       "sizes AS (SELECT doc_id, count(*) AS n FROM shc GROUP BY doc_id), "
       "inter AS (SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS i "
       "FROM shc a JOIN shc b ON a.shingle = b.shingle AND a.doc_id < b.doc_id "
       "GROUP BY d1, d2), "
       "truth AS (SELECT d1, d2 FROM inter "
       "JOIN sizes sa ON sa.doc_id = d1 JOIN sizes sb ON sb.doc_id = d2 "
       "WHERE i / (sa.n + sb.n - i) >= 0.25), "
       "cand AS (SELECT a.doc_id AS d1, b.doc_id AS d2 FROM sig a JOIN sig b "
       "ON a.seed = b.seed AND a.mh = b.mh AND a.doc_id < b.doc_id "
       "GROUP BY d1, d2 HAVING count(*) >= 2), "
       "hit AS (SELECT t.d1, t.d2 FROM truth t "
       "JOIN cand c ON t.d1 = c.d1 AND t.d2 = c.d2) "
       "SELECT CAST((SELECT count(*) FROM truth) AS BIGINT) AS n_true, "
       "CAST((SELECT count(*) FROM cand) AS BIGINT) AS n_cand, "
       "CAST((SELECT count(*) FROM hit) AS BIGINT) AS n_hit, "
       "CAST(floor(((SELECT count(*) FROM hit) * 1.0 / "
       "(SELECT count(*) FROM truth)) * 1000000.0 + 0.5) AS BIGINT) "
       "AS recall_micro, "
       "CAST(floor(((SELECT count(*) FROM hit) * 1.0 / "
       "(SELECT count(*) FROM cand)) * 1000000.0 + 0.5) AS BIGINT) "
       "AS precision_micro"),
    DQ("dq155_ngram_novelty", T.dq155_ngram_novelty,
       "WITH " + _SH_CTE + ", "
       "fs AS (SELECT shingle, min(doc_id) AS fd FROM sh GROUP BY shingle), "
       "agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shingles, "
       "CAST(sum(CASE WHEN fd = doc_id THEN 1 ELSE 0 END) AS BIGINT) "
       "AS n_novel FROM sh JOIN fs USING (shingle) GROUP BY doc_id) "
       "SELECT doc_id, n_shingles, n_novel, "
       "CAST(floor((n_novel * 1.0 / n_shingles) * 1000000.0 + 0.5) AS BIGINT) AS novelty_micro FROM agg"),
    DQ("dq168_dup_spans", T.dq168_dup_spans,
       "WITH toks AS (SELECT doc_id, string_split(text, ' ') AS tk "
       "FROM documents), "
       "grams AS (SELECT doc_id, p, sha256(tk[p] || ' ' || tk[p+1] || ' ' "
       "|| tk[p+2]) AS h FROM toks, UNNEST(range(1, len(tk) - 1)) AS u(p)), "
       "hv AS (SELECT doc_id, p, " + _HEXFOLD + " AS hb FROM grams), "
       "wins AS (SELECT doc_id, p, CAST(min(hb) OVER (PARTITION BY doc_id "
       "ORDER BY p ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS BIGINT) "
       "AS fp FROM hv), "
       "marked AS (SELECT doc_id, p, fp, CASE WHEN lag(fp) OVER "
       "(PARTITION BY doc_id ORDER BY p) IS NULL OR lag(fp) OVER "
       "(PARTITION BY doc_id ORDER BY p) != fp THEN 1 ELSE 0 END AS chg "
       "FROM wins), "
       "rid AS (SELECT doc_id, p, fp, sum(chg) OVER (PARTITION BY doc_id "
       "ORDER BY p ROWS UNBOUNDED PRECEDING) AS r FROM marked), "
       "runs AS (SELECT doc_id, min(p) AS ps, max(p) AS pe, min(fp) AS fp "
       "FROM rid GROUP BY doc_id, r), "
       "rare AS (SELECT fp FROM (SELECT fp, count(DISTINCT doc_id) AS nd "
       "FROM runs GROUP BY fp) t WHERE nd BETWEEN 2 AND 20), "
       "r2 AS (SELECT r.doc_id, r.ps, r.pe, r.fp FROM runs r "
       "JOIN rare USING (fp)), "
       "anchors AS (SELECT a.doc_id AS d1, b.doc_id AS d2, a.ps AS ps1, "
       "a.pe AS pe1, b.ps - a.ps AS diag "
       "FROM r2 a JOIN r2 b ON a.fp = b.fp AND a.doc_id < b.doc_id), "
       "flagged AS (SELECT d1, d2, ps1, pe1, diag, "
       "CASE WHEN lag(pe1) OVER w IS NULL OR ps1 - lag(pe1) OVER w > 7 "
       "OR abs(diag - lag(diag) OVER w) > 4 THEN 1 ELSE 0 END AS new_span "
       "FROM anchors WINDOW w AS (PARTITION BY d1, d2 ORDER BY ps1, diag)), "
       "sp AS (SELECT d1, d2, ps1, pe1, sum(new_span) OVER "
       "(PARTITION BY d1, d2 ORDER BY ps1, diag ROWS UNBOUNDED PRECEDING) "
       "AS span_id FROM flagged), "
       "spans AS (SELECT d1, d2, span_id, count(*) AS n_anchor, "
       "max(pe1) - min(ps1) + 1 AS span_grams FROM sp "
       "GROUP BY d1, d2, span_id) "
       "SELECT d1, d2, CAST(sum(n_anchor) AS BIGINT) AS n_anchors, "
       "CAST(count(*) AS BIGINT) AS n_spans, "
       "CAST(max(span_grams) AS BIGINT) AS max_span_grams "
       "FROM spans GROUP BY d1, d2"),
    DQ("dq180_tfidf_top_terms", T.dq180_tfidf_top_terms,
       "WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok "
       "FROM documents), "
       "tf AS (SELECT doc_id, tok, count(*) AS tf FROM toks "
       "GROUP BY doc_id, tok), "
       "dfs AS (SELECT tok, count(*) AS df FROM tf GROUP BY tok), "
       "nn AS (SELECT count(*) AS n FROM documents), "
       "scored AS (SELECT doc_id, tok, tf, "
       "CAST(floor((tf * (ln((n + 1.0) / (df + 1.0)) + 1.0)) * 1000000.0 + 0.5) AS BIGINT) AS tfidf_micro "
       "FROM tf JOIN dfs USING (tok) CROSS JOIN nn) "
       "SELECT doc_id, tok, tf, tfidf_micro, CAST(rank AS INT) AS rank FROM "
       "(SELECT *, row_number() OVER (PARTITION BY doc_id "
       "ORDER BY tfidf_micro DESC, tok) AS rank FROM scored) r WHERE rank <= 5"),
    DQ("dq181_neardup_first_occurrence", T.dq181_neardup_first_occurrence,
       "WITH " + _SIG_CTE + ", "
       "p AS (SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS matches "
       "FROM sig a JOIN sig b ON a.seed = b.seed AND a.mh = b.mh "
       "AND a.doc_id < b.doc_id GROUP BY d1, d2 HAVING count(*) >= 2), "
       "dup AS (SELECT d2, min(d1) AS dup_of FROM p GROUP BY d2) "
       "SELECT d.doc_id, dup.dup_of IS NOT NULL AS is_dup, dup.dup_of "
       "FROM documents d LEFT JOIN dup ON d.doc_id = dup.d2"),
    DQ("dq172_minhash_estimate_audit", T.dq172_minhash_estimate_audit,
       "WITH " + _SIG_CTE + ", "
       "p AS (SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS matches "
       "FROM sig a JOIN sig b ON a.seed = b.seed AND a.mh = b.mh "
       "AND a.doc_id < b.doc_id GROUP BY d1, d2 HAVING count(*) >= 2), "
       "sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id), "
       "iv AS (SELECT p.d1, p.d2, count(*) AS i FROM p "
       "JOIN sh x ON x.doc_id = p.d1 "
       "JOIN sh y ON y.doc_id = p.d2 AND y.shingle = x.shingle "
       "GROUP BY p.d1, p.d2) "
       "SELECT p.d1, p.d2, CAST(p.matches AS INT) AS matches, "
       "CAST(floor((p.matches / 8.0) * 1000000.0 + 0.5) AS BIGINT) AS est_j_micro, "
       "CAST(floor((iv.i * 1.0 / (sa.n + sb.n - iv.i)) * 1000000.0 + 0.5) AS BIGINT) AS exact_j_micro, "
       "CAST(floor((abs(p.matches / 8.0 - iv.i * 1.0 / (sa.n + sb.n - iv.i))) * 1000000.0 + 0.5) AS BIGINT) "
       "AS abs_err_micro "
       "FROM p JOIN iv ON p.d1 = iv.d1 AND p.d2 = iv.d2 "
       "JOIN sz sa ON sa.doc_id = p.d1 JOIN sz sb ON sb.doc_id = p.d2"),
    DQ("dq183_prefix_filter_join", T.dq183_prefix_filter_join,
       # Oracle = brute-force all-pairs: equality proves the prefix filter
       # is lossless.
       "WITH " + _SH_CTE + ", "
       "sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id), "
       "iv AS (SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS i "
       "FROM sh a JOIN sh b ON a.shingle = b.shingle "
       "AND a.doc_id < b.doc_id GROUP BY d1, d2), "
       "j AS (SELECT d1, d2, CAST(floor((i * 1.0 / (sa.n + sb.n - i)) * 1000000.0 + 0.5) AS BIGINT) "
       "AS jaccard_micro FROM iv JOIN sz sa ON sa.doc_id = d1 "
       "JOIN sz sb ON sb.doc_id = d2) "
       "SELECT d1, d2, jaccard_micro FROM j WHERE jaccard_micro >= 600000"),
    DQ("dq200_sorted_neighborhood", T.dq200_sorted_neighborhood,
       "WITH k AS (SELECT doc_id, "
       "substr(replace(text, ' ', ''), 1, 24) AS key, "
       "list_distinct(string_split(text, ' ')) AS toks FROM documents), "
       "r AS (SELECT doc_id, key, toks, substr(key, 1, 2) AS blk, "
       "row_number() OVER (PARTITION BY substr(key, 1, 2) "
       "ORDER BY key, doc_id) AS rn FROM k), "
       "p AS (SELECT a.doc_id AS d1, b.doc_id AS d2, "
       "len(list_intersect(a.toks, b.toks)) AS i, "
       "len(a.toks) AS na, len(b.toks) AS nb "
       "FROM r a JOIN r b ON a.blk = b.blk "
       "AND b.rn > a.rn AND b.rn <= a.rn + 5) "
       # filter on the ROUNDED value, same as the engine: the round output
       # is bit-identical across engines, the raw ratio comparison is not
       "SELECT d1, d2, CAST(floor((CAST(i AS DOUBLE) / (na + nb - i)) * 1000000.0 + 0.5) AS BIGINT) "
       "AS jacc_micro FROM p "
       "WHERE CAST(floor((CAST(i AS DOUBLE) / (na + nb - i)) * 1000000.0 + 0.5) AS BIGINT) >= 200000"),
    DQ("dq202_bigram_lm", T.dq202_bigram_lm,
       "WITH tk AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok, "
       "generate_subscripts(string_split(text, ' '), 1) AS idx "
       "FROM documents), "
       "bg AS (SELECT a.doc_id, a.tok || ' ' || b.tok AS bg, a.tok AS w1 "
       "FROM tk a JOIN tk b ON a.doc_id = b.doc_id AND b.idx = a.idx + 1), "
       "per_doc AS (SELECT doc_id, bg, w1, count(*) AS tf "
       "FROM bg GROUP BY doc_id, bg, w1), "
       "c2 AS (SELECT bg, count(*) AS c2 FROM bg GROUP BY bg), "
       "c1 AS (SELECT w1, count(*) AS c1 FROM bg GROUP BY w1), "
       "v AS (SELECT count(DISTINCT tok) AS v FROM tk) "
       "SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_bigrams, "
       "CAST(floor(sum(CAST(floor((tf * ln((c2.c2 + 0.5) "
       "/ (c1.c1 + 0.5 * v.v))) * 1000000.0 + 0.5) AS BIGINT)) "
       "/ sum(tf) + 0.5) AS BIGINT)"
       " AS mean_logp_micro "
       "FROM per_doc JOIN c2 USING (bg) JOIN c1 USING (w1) CROSS JOIN v "
       "GROUP BY doc_id"),
    DQ("dq203_containment_join", T.dq203_containment_join,
       "WITH " + _SHC_CTE + ", "
       "sizes AS (SELECT doc_id, count(*) AS n FROM shc GROUP BY doc_id), "
       "inter AS (SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS i "
       "FROM shc a JOIN shc b ON a.shingle = b.shingle AND a.doc_id < b.doc_id "
       "GROUP BY d1, d2), "
       "p AS (SELECT d1, d2, i, sa.n AS na, sb.n AS nb "
       "FROM inter JOIN sizes sa ON sa.doc_id = d1 "
       "JOIN sizes sb ON sb.doc_id = d2), "
       "directed AS (SELECT d1 AS src, d2 AS dst, "
       "CAST(floor((CAST(i AS DOUBLE) / na) * 1000000.0 + 0.5) AS BIGINT) AS containment_micro FROM p "
       "UNION ALL SELECT d2 AS src, d1 AS dst, "
       "CAST(floor((CAST(i AS DOUBLE) / nb) * 1000000.0 + 0.5) AS BIGINT) AS containment_micro FROM p) "
       "SELECT src, dst, containment_micro FROM directed "
       "WHERE containment_micro >= 500000"),
    DQ("dq221_langid_confusion", T.dq221_langid_confusion,
       "WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok "
       "FROM documents), "
       "hits AS (SELECT doc_id, lang, count(*) AS n_hits FROM toks "
       "JOIN " + T.stopwords_values_sql() + " ON tok = w "
       "GROUP BY doc_id, lang), "
       "best AS (SELECT doc_id, lang AS pred, row_number() OVER "
       "(PARTITION BY doc_id ORDER BY n_hits DESC, lang) AS rn FROM hits), "
       "pred AS (SELECT d.doc_id, coalesce(b.pred, 'unknown') AS pred "
       "FROM documents d LEFT JOIN (SELECT * FROM best WHERE rn = 1) b "
       "ON d.doc_id = b.doc_id), "
       "cells AS (SELECT d.lang, p.pred, count(*) AS n "
       "FROM documents d JOIN pred p ON d.doc_id = p.doc_id "
       "GROUP BY d.lang, p.pred) "
       "SELECT lang, pred, n, "
       "CAST(SUM(n) OVER (PARTITION BY lang) AS BIGINT) AS n_lang, "
       "CAST(floor((CAST(n AS DOUBLE) / SUM(n) OVER (PARTITION BY lang)) "
       "* 1000000.0 + 0.5) AS BIGINT) "
       "AS frac_micro FROM cells"),
    DQ("dq222_lsh_pr_curve", T.dq222_lsh_pr_curve,
       # _SHC_CTE already carries sh; append the sig legs without
       # re-declaring it
       "WITH " + _SHC_CTE + ", "
       "seeds AS (SELECT CAST(range AS INT) AS seed FROM range(0, 8)), "
       "sig AS (SELECT doc_id, seed, "
       "min(substr(sha256(shingle), seed * 8 + 1, 8)) AS mh "
       "FROM sh CROSS JOIN seeds GROUP BY doc_id, seed), "
       "sizes AS (SELECT doc_id, count(*) AS n FROM shc GROUP BY doc_id), "
       "inter AS (SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS i "
       "FROM shc a JOIN shc b ON a.shingle = b.shingle AND a.doc_id < b.doc_id "
       "GROUP BY d1, d2), "
       "exact AS (SELECT d1, d2, "
       "CAST(floor((CAST(i AS DOUBLE) / (sa.n + sb.n - i)) "
       "* 1000000.0 + 0.5) AS BIGINT) AS j "
       "FROM inter JOIN sizes sa ON sa.doc_id = d1 "
       "JOIN sizes sb ON sb.doc_id = d2), "
       "lsh AS (SELECT a.doc_id AS d1, b.doc_id AS d2, "
       "CAST(floor((count(*) / 8.0) * 1000000.0 + 0.5) AS BIGINT) AS est_j "
       "FROM sig a JOIN sig b ON a.seed = b.seed AND a.mh = b.mh "
       "AND a.doc_id < b.doc_id GROUP BY d1, d2 HAVING count(*) >= 2), "
       "u AS (SELECT COALESCE(e.j, 0) AS j, "
       "COALESCE(l.est_j, -1) AS est_j FROM exact e "
       "FULL OUTER JOIN lsh l ON e.d1 = l.d1 AND e.d2 = l.d2), "
       "g AS (SELECT j, est_j, "
       "unnest([200000, 300000, 400000, 500000]) AS tau FROM u), "
       "agg AS (SELECT tau, "
       "CAST(SUM(CASE WHEN j >= tau AND est_j >= tau THEN 1 ELSE 0 END) "
       "AS BIGINT) AS tp, "
       "CAST(SUM(CASE WHEN est_j >= tau THEN 1 ELSE 0 END) AS BIGINT) "
       "AS pp, "
       "CAST(SUM(CASE WHEN j >= tau THEN 1 ELSE 0 END) AS BIGINT) AS ap "
       "FROM g GROUP BY tau) "
       "SELECT CAST(tau / 10000 AS BIGINT) AS tau_e2, tp, pp, ap, "
       "CASE WHEN pp > 0 THEN CAST(floor((CAST(tp AS DOUBLE) / pp) "
       "* 1000000.0 + 0.5) AS BIGINT) END "
       "AS precision_micro, "
       "CASE WHEN ap > 0 THEN CAST(floor((CAST(tp AS DOUBLE) / ap) "
       "* 1000000.0 + 0.5) AS BIGINT) END "
       "AS recall_micro FROM agg"),
    DQ("dq227_vocab_coverage_curve", T.dq227_vocab_coverage_curve,
       "WITH toks AS (SELECT unnest(string_split(text, ' ')) AS tok "
       "FROM documents), "
       "vocab AS (SELECT tok, count(*) AS c FROM toks GROUP BY tok), "
       "ranked AS (SELECT tok, c, "
       "row_number() OVER (ORDER BY c DESC, tok) AS r, "
       "SUM(c) OVER (ORDER BY c DESC, tok "
       "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum "
       "FROM vocab), "
       "tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n_total, "
       "count(*) AS vocab_size FROM vocab) "
       "SELECT r AS k, CAST(cum AS BIGINT) AS covered, n_total, "
       "vocab_size, CAST(floor((CAST(cum AS DOUBLE) / n_total) * 1000000.0 + 0.5) AS BIGINT) AS coverage_micro "
       "FROM ranked CROSS JOIN tot WHERE r IN (2, 5, 10, 20, 30)"),
    DQ("dq230_template_mining", T.dq230_template_mining,
       "WITH d AS (SELECT doc_id, "
       "array_to_string(string_split(text, ' ')[1:2], ' ') AS tpl "
       "FROM documents), "
       "g AS (SELECT tpl, count(*) AS n_docs, min(doc_id) AS first_doc "
       "FROM d GROUP BY tpl), "
       "tot AS (SELECT count(*) AS n_total FROM d) "
       "SELECT tpl, n_docs, first_doc, "
       "CAST(floor((CAST(n_docs AS DOUBLE) / n_total) * 1000000.0 + 0.5) AS BIGINT) AS coverage_micro "
       "FROM g CROSS JOIN tot WHERE n_docs >= 3"),
    DQ("dq245_lsh_pairs_strict", T.dq245_lsh_pairs_strict,
       "WITH " + _SIG_CTE + ", "
       "p AS (SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS matches "
       "FROM sig a JOIN sig b ON a.seed = b.seed AND a.mh = b.mh "
       "AND a.doc_id < b.doc_id GROUP BY d1, d2) "
       "SELECT d1, d2, matches, "
       "CAST(floor((matches / 8.0) * 1000000.0 + 0.5) AS BIGINT) "
       "AS est_j_micro FROM p WHERE matches >= 3"),
]
