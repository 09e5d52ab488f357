"""oracle_sql(): the DuckDB oracle for every graded query (split from __spark_entry__)."""

from __future__ import annotations

import os
import sys
from collections.abc import Callable
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T
from margaret_spark.functions.numeric import dsum, pround
from margaret_spark.functions.vectors import cosine_sim
from margaret_spark.operators.dedup import (
    embedding_dedup_pairs,
    exact_dedup,
    minhash_dedup_pairs,
    ngram_jaccard_pairs,
    simhash_dedup_pairs,
)
from margaret_spark.operators.similarity import brute_force_topk, lsh_bucketed_topk
from margaret_spark.operators.temporal import asof_join, range_join
from margaret_spark.operators.text import (
    bpe_ish_token_count,
    doc_fingerprint,
    lang_id,
    quality_score,
    token_stats,
)
from margaret_spark.qry import Gt, Gte, Limit, Lte, Reverse, build_plan, apply_plan
from margaret_spark.indexes import latest_by_key, fanout
from margaret_spark.entry.oracle_builders import _lsh_plan_sql, _scaled_k_limit
from margaret_spark.entry.oracle_builders import _kmeans_ctes
from margaret_spark.entry.oracle_builders import _hier_incr_sql, _hier_ivf_sql, _hier_semdedup_sql, _icbrt_limit
from margaret_spark.entry.oracle_builders import _gopher_battery_sql, _line_repetition_sql, _ngram_coverage_sql
from margaret_spark.entry.oracle_builders import _SHINGLES
from margaret_spark.entry.oracle_builders import _CAPPED_SHINGLE_CTES, _CLUSTER_CTES, _CUT_HIT_FIRST_DOC, _CUT_HIT_FIRST_OCCURRENCE, _CUT_SPAN_SELECT, _DOT, _DUP_SPAN_CTES, _TRIANGLE_CTES, _WORDS, _bm25_sql, _bpe_doc_tokens_cte, _bpe_tokens_sql, _contrastive_sql, _cosine_sql, _cut_span_ctes, _decon_sem_sql, _hashembed_ctes, _ivfpq_sql, _kcore_sql, _kmeans_sql, _langid_sql, _pagerank_sql, _pq_ctes, _pq_sql, _pr, _quality_rules_sql, _quality_sql, _repetition_sql, _semdedup_incr_sql, _semdedup_sql, _tfidf_sql
from margaret_spark.entry.q_data import _PII_REDACT_SQL, _PII_SALT_SQL
from margaret_spark.entry.q_stream_media import _PSL_FIXTURE, _PSL_HOSTS, _WEB_BLOCKLIST, _WEB_HOSTS



def oracle_sql() -> dict[str, str]:
    d = _oracle_sql_base()
    # the persisted IVF index must return bit-identical results to the
    # in-flight IVF plan over the same (lowest-id) centroids
    d["ann_ivf_indexed"] = d["ann_ivf"]
    # int8 IVF: the ann_ivf cell/probe CTEs (float cosine against the
    # seeded centroids) feeding the ann_topk_int8 quantized-cosine
    # scorer — assignment and arithmetic each re-derived independently
    _qz_cte = (
        "qz AS (SELECT vec_id, codes, "
        "sqrt(CAST(list_sum(list_transform(codes, x -> x * x)) AS DOUBLE)) "
        "AS nrm FROM ("
        "SELECT vec_id, CASE WHEN ma > 0 THEN "
        "list_transform(xd, x -> CAST(floor(x / (ma / 127.0) + 0.5) AS INT)) "
        "ELSE list_transform(xd, x -> 0) END AS codes FROM ("
        "SELECT vec_id, xd, "
        "list_max(list_transform(xd, x -> abs(x))) AS ma FROM ("
        "SELECT vec_id, list_transform(embedding, "
        "x -> CAST(x AS DOUBLE)) AS xd FROM embeddings))))"
    )
    _int8_qcos = (
        "CAST(list_sum(list_transform(range(1, len(qq.codes) + 1), "
        "i -> qq.codes[i] * cq.codes[i])) AS DOUBLE) / (qq.nrm * cq.nrm)"
    )
    d["ann_ivf_int8"] = (
        "WITH cents AS (SELECT vec_id AS cent_id, embedding AS cent "
        "FROM embeddings ORDER BY vec_id LIMIT 16), "
        + _qz_cte + ", "
        "cell AS (SELECT neighbor_id, cent_id FROM ("
        "SELECT e.vec_id AS neighbor_id, c.cent_id, "
        "row_number() OVER (PARTITION BY e.vec_id ORDER BY "
        + _pr(_cosine_sql("e.embedding", "c.cent"))
        + " DESC, c.cent_id ASC) AS cr "
        "FROM embeddings e CROSS JOIN cents c) WHERE cr = 1), "
        "probe AS (SELECT query_id, cent_id FROM ("
        "SELECT q.vec_id AS query_id, c.cent_id, "
        "row_number() OVER (PARTITION BY q.vec_id ORDER BY "
        + _pr(_cosine_sql("q.embedding", "c.cent"))
        + " DESC, c.cent_id ASC) AS cr "
        "FROM (SELECT * FROM embeddings WHERE vec_id < 5) q "
        "CROSS JOIN cents c) WHERE cr <= 4) "
        "SELECT query_id, neighbor_id, qcosine, rank FROM ("
        "SELECT p.query_id, l.neighbor_id, "
        + _pr(_int8_qcos) + " AS qcosine, "
        "CAST(row_number() OVER (PARTITION BY p.query_id ORDER BY "
        + _pr(_int8_qcos) + " DESC, l.neighbor_id ASC) AS INT) AS rank "
        "FROM probe p JOIN cell l ON p.cent_id = l.cent_id "
        "JOIN qz qq ON qq.vec_id = p.query_id "
        "JOIN qz cq ON cq.vec_id = l.neighbor_id "
        "WHERE p.query_id <> l.neighbor_id "
        "AND qq.nrm > 0 AND cq.nrm > 0) WHERE rank <= 5"
    )
    # the stateful-streaming as-of operator must reproduce the batch
    # as-of join exactly — same DuckDB native ASOF JOIN oracle
    d["stream_events_asof"] = d["events_asof"]
    # the at-ingest decontamination scorer must reproduce the batch
    # containment scoring exactly (same split, shingles, arithmetic)
    d["stream_decontaminate"] = d["decontaminate"]
    # the at-ingest SEMANTIC gate must reproduce the batch composition
    # exactly (same split, hashembed, frozen test-side fit, threshold)
    d["stream_semantic_decontaminate"] = d["decontaminate_semantic"]
    # the Bloom-prefiltered scale path must be value-identical to the
    # baseline (no false negatives + exact verify of positives)
    d["decontaminate_bloom"] = d["decontaminate"]
    d["stream_decontaminate_spans"] = d["decontaminate_spans"]
    # the streaming SCD2 ingest publishes the identical history the
    # batch merge produces — same closed-form oracle
    d["stream_docs_scd2"] = d["docs_scd2"]
    # the point-in-time lookup composes the SCD2 expected history as a
    # CTE and probes every key at both versions
    d["docs_scd2_lookup"] = (
        "WITH h AS (" + d["docs_scd2"] + "), "
        "ks AS (SELECT doc_id FROM documents "
        "UNION ALL SELECT doc_id + 1000000 FROM documents "
        "WHERE doc_id % 11 = 0), "
        "p AS (SELECT doc_id, 1 AS probe_v FROM ks "
        "UNION ALL SELECT doc_id, 2 FROM ks) "
        "SELECT p.doc_id, p.probe_v, h.source, h.n_chars "
        "FROM p LEFT JOIN h ON p.doc_id = h.doc_id "
        "AND p.probe_v >= h.valid_from "
        "AND (h.valid_to IS NULL OR p.probe_v < h.valid_to)"
    )
    # recall@5: compose the brute-force and IVF oracles as CTEs and
    # count the per-query neighbor overlap — same parameterization,
    # so the metric is exact-integer + one IEEE division
    d["ann_recall"] = (
        f"WITH bf AS ({d['ann_topk']}), ivf AS ({d['ann_ivf']}), "
        "ex AS (SELECT query_id, CAST(count(*) AS BIGINT) AS n_exact "
        "FROM bf GROUP BY query_id), "
        "hits AS (SELECT i.query_id, CAST(count(*) AS BIGINT) AS n_hits "
        "FROM ivf i JOIN bf b ON i.query_id = b.query_id "
        "AND i.neighbor_id = b.neighbor_id GROUP BY i.query_id) "
        "SELECT ex.query_id, ex.n_exact, "
        "CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_hits, "
        "floor((COALESCE(h.n_hits, 0) / ex.n_exact) * 1000000 + 0.5) "
        "/ 1000000 AS recall "
        "FROM ex LEFT JOIN hits h ON ex.query_id = h.query_id"
    )
    d["embeddings_pca"] = _pca_sql(iters=12)
    d["embeddings_pca_project"] = (
        # the transform half: signed component list from the 4-round
        # fit, projection = the same fixed-order left fold per vector
        f"WITH pc AS ({_pca_sql(iters=4)}), "
        "wl AS (SELECT list(component ORDER BY pos) AS wa FROM pc) "
        "SELECT e.vec_id, "
        + _pr(
            "list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
            "list_transform(range(1, 65), j -> "
            + _pr("CAST(e.embedding[j] AS DOUBLE) * wa[j]", 9)
            + ")), (acc, x) -> acc + x)"
        )
        + " AS proj FROM embeddings e, wl"
    )
    # Matryoshka: the same brute-force shape over the 16-dim prefix
    # (DuckDB list slicing is 1-based INCLUSIVE: [1:16] = first 16)
    d["ann_matryoshka"] = (
        "SELECT query_id, neighbor_id, cosine, rank FROM ("
        "SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, "
        + _pr(_cosine_sql("q.embedding[1:16]", "c.embedding[1:16]"))
        + " AS cosine, "
        "CAST(row_number() OVER (PARTITION BY q.vec_id ORDER BY "
        + _pr(_cosine_sql("q.embedding[1:16]", "c.embedding[1:16]"))
        + " DESC, c.vec_id ASC) AS INT) AS rank "
        "FROM (SELECT * FROM embeddings WHERE vec_id < 5) q "
        "JOIN embeddings c ON q.vec_id <> c.vec_id"
        ") WHERE rank <= 5"
    )
    # recall of the prefix search vs the full-width exact top-k —
    # the ann_recall composition with the truncated arm swapped in
    d["ann_matryoshka_recall"] = (
        f"WITH bf AS ({d['ann_topk']}), tr AS ({d['ann_matryoshka']}), "
        "ex AS (SELECT query_id, CAST(count(*) AS BIGINT) AS n_exact "
        "FROM bf GROUP BY query_id), "
        "hits AS (SELECT t.query_id, CAST(count(*) AS BIGINT) AS n_hits "
        "FROM tr t JOIN bf b ON t.query_id = b.query_id "
        "AND t.neighbor_id = b.neighbor_id GROUP BY t.query_id) "
        "SELECT ex.query_id, ex.n_exact, "
        "CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_hits, "
        "floor((COALESCE(h.n_hits, 0) / ex.n_exact) * 1000000 + 0.5) "
        "/ 1000000 AS recall "
        "FROM ex LEFT JOIN hits h ON ex.query_id = h.query_id"
    )
    # recall@5 of ADC-over-PQ-codes vs brute force: the same metric
    # tail as ann_matryoshka_recall; the PQ arm asks for 6, drops the
    # self-match (brute force excludes self, PQ scores every code) and
    # re-ranks to 5 — both engines replay the same deterministic rank
    _pq6 = (
        "SELECT query_id, vec_id AS neighbor_id FROM ("
        "SELECT query_id, vec_id, row_number() OVER ("
        "PARTITION BY query_id ORDER BY rank) AS rr FROM ("
        + _pq_sql("topk", topk=6)
        + ") WHERE vec_id <> query_id) WHERE rr <= 5"
    )
    d["ann_pq_recall"] = (
        f"WITH bf AS ({d['ann_topk']}), tr AS ({_pq6}), "
        "ex AS (SELECT query_id, CAST(count(*) AS BIGINT) AS n_exact "
        "FROM bf GROUP BY query_id), "
        "hits AS (SELECT t.query_id, CAST(count(*) AS BIGINT) AS n_hits "
        "FROM tr t JOIN bf b ON t.query_id = b.query_id "
        "AND t.neighbor_id = b.neighbor_id GROUP BY t.query_id) "
        "SELECT ex.query_id, ex.n_exact, "
        "CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_hits, "
        "floor((COALESCE(h.n_hits, 0) / ex.n_exact) * 1000000 + 0.5) "
        "/ 1000000 AS recall "
        "FROM ex LEFT JOIN hits h ON ex.query_id = h.query_id"
    )
    # hierarchical-index recall: the shared metric tail over the full
    # (nested-WITH) ann_hier chain vs the brute-force arm
    d["ann_hier_recall"] = (
        f"WITH bf AS ({d['ann_topk']}), tr AS ({d['ann_hier']}), "
        "ex AS (SELECT query_id, CAST(count(*) AS BIGINT) AS n_exact "
        "FROM bf GROUP BY query_id), "
        "hits AS (SELECT t.query_id, CAST(count(*) AS BIGINT) AS n_hits "
        "FROM tr t JOIN bf b ON t.query_id = b.query_id "
        "AND t.neighbor_id = b.neighbor_id GROUP BY t.query_id) "
        "SELECT ex.query_id, ex.n_exact, "
        "CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_hits, "
        "floor((COALESCE(h.n_hits, 0) / ex.n_exact) * 1000000 + 0.5) "
        "/ 1000000 AS recall "
        "FROM ex LEFT JOIN hits h ON ex.query_id = h.query_id"
    )
    # reciprocal-rank fusion of the three approximate-index chains:
    # fixed-order IEEE score tree over left-joined rank tables
    d["ann_rrf"] = (
        f"WITH a1 AS (SELECT query_id, neighbor_id, rank FROM ("
        + d["ann_ivf"]
        + ") z1), a2 AS (SELECT query_id, neighbor_id, rank FROM ("
        + d["ann_hier"]
        + ") z2), a3 AS (SELECT query_id, neighbor_id, rank FROM ("
        + d["ann_matryoshka"]
        + ") z3), "
        "u AS (SELECT query_id, neighbor_id FROM a1 "
        "UNION SELECT query_id, neighbor_id FROM a2 "
        "UNION SELECT query_id, neighbor_id FROM a3), "
        "f AS (SELECT u.query_id, u.neighbor_id, "
        + _pr(
            "0.0 + COALESCE(1.0 / (60.0 + r1.rank), 0.0) "
            "+ COALESCE(1.0 / (60.0 + r2.rank), 0.0) "
            "+ COALESCE(1.0 / (60.0 + r3.rank), 0.0)"
        )
        + " AS rrf FROM u "
        "LEFT JOIN a1 r1 ON r1.query_id = u.query_id "
        "AND r1.neighbor_id = u.neighbor_id "
        "LEFT JOIN a2 r2 ON r2.query_id = u.query_id "
        "AND r2.neighbor_id = u.neighbor_id "
        "LEFT JOIN a3 r3 ON r3.query_id = u.query_id "
        "AND r3.neighbor_id = u.neighbor_id) "
        "SELECT query_id, neighbor_id, rrf, rank FROM ("
        "SELECT query_id, neighbor_id, rrf, "
        "CAST(row_number() OVER (PARTITION BY query_id "
        "ORDER BY rrf DESC, neighbor_id ASC) AS INT) AS rank FROM f) "
        "WHERE rank <= 5"
    )
    # the stateful streaming top-k must reproduce the batch ranking
    # window exactly (incremental bounded-heap merge is exact)
    d["stream_topk"] = (
        "SELECT event_type, event_id, score, rank FROM ("
        "SELECT event_type, event_id, value AS score, "
        "CAST(row_number() OVER (PARTITION BY event_type "
        "ORDER BY value DESC, event_id) AS INT) AS rank "
        "FROM events WHERE value IS NOT NULL) WHERE rank <= 5"
    )
    # windowed variant: the state key is (day, type) — batch twin is
    # the ranking window partitioned the same way
    d["stream_topk_windowed"] = (
        "SELECT day, event_type, event_id, score, rank FROM ("
        "SELECT strftime(ts, '%Y-%m-%d') AS day, event_type, event_id, "
        "value AS score, "
        "CAST(row_number() OVER (PARTITION BY strftime(ts, '%Y-%m-%d'), "
        "event_type ORDER BY value DESC, event_id) AS INT) AS rank "
        "FROM events WHERE value IS NOT NULL) WHERE rank <= 3"
    )
    # web curation: the oracle re-derives the synthetic URL AND the
    # full canonicalization (scheme/host lowering, default-port strip,
    # tracking-param removal + sort, fragment drop) and the registered-
    # domain heuristic — every string branch hash-checked
    d["web_canonical_urls"] = (
        "WITH " + _web_sql() + " "
        "SELECT doc_id, url, canon AS url_canonical, host AS url_host_name, "
        "dom AS url_domain FROM dws"
    )
    d["web_domain_stats"] = (
        "WITH " + _web_sql() + " "
        "SELECT dom AS domain, CAST(count(*) AS BIGINT) AS n_docs, "
        "CAST(sum(n_chars) AS BIGINT) AS total_size, "
        "CAST(count(DISTINCT host) AS BIGINT) AS n_hosts, "
        "CAST(count(DISTINCT lang) AS BIGINT) AS n_lang "
        "FROM dws GROUP BY dom"
    )
    d["web_blocklist"] = (
        "WITH " + _web_sql() + " "
        "SELECT source, CAST(count(*) AS BIGINT) AS kept_docs, "
        "CAST(sum(n_chars) AS BIGINT) AS kept_chars FROM dws "
        "WHERE dom NOT IN ("
        + ",".join(f"'{b}'" for b in _WEB_BLOCKLIST)
        + ") GROUP BY source"
    )
    # Count-Min sketch: deterministic md5 hash family, so the whole
    # (sketch -> probe -> min) pipeline is restated exactly in SQL
    d["events_cms"] = (
        "WITH k AS (SELECT CAST(user_id AS VARCHAR) AS ks, user_id "
        "FROM events WHERE user_id IS NOT NULL), "
        "b AS (SELECT r, CAST(CAST('0x' || substr(md5(r || '#' || ks), 1, 8) "
        "AS BIGINT) % 64 AS BIGINT) AS bucket FROM k "
        "CROSS JOIN (SELECT unnest(range(4)) AS r)), "
        "s AS (SELECT r, bucket, CAST(count(*) AS BIGINT) AS cnt "
        "FROM b GROUP BY 1, 2), "
        "p AS (SELECT DISTINCT user_id, CAST(user_id AS VARCHAR) AS ks "
        "FROM events WHERE user_id IS NOT NULL), "
        "pb AS (SELECT user_id, r, "
        "CAST(CAST('0x' || substr(md5(r || '#' || ks), 1, 8) AS BIGINT) % 64 "
        "AS BIGINT) AS bucket FROM p "
        "CROSS JOIN (SELECT unnest(range(4)) AS r)), "
        "est AS (SELECT user_id, CAST(min(COALESCE(s.cnt, 0)) AS BIGINT) "
        "AS est_n FROM pb LEFT JOIN s ON s.r = pb.r AND s.bucket = pb.bucket "
        "GROUP BY user_id), "
        "ex AS (SELECT user_id, CAST(count(*) AS BIGINT) AS exact_n "
        "FROM events WHERE user_id IS NOT NULL GROUP BY user_id) "
        "SELECT est.user_id, est_n, exact_n, "
        "CAST(est_n - exact_n AS BIGINT) AS overcount "
        "FROM est JOIN ex USING (user_id)"
    )
    # histogram quantiles: the bucket grid, integer cumsums, ceil(q·N)
    # ranks and the interpolation tree restated term-for-term
    d["events_hist_quantiles"] = (
        "WITH b AS (SELECT min(CAST(value AS DOUBLE)) AS lo, "
        "max(CAST(value AS DOUBLE)) AS hi, "
        "(max(CAST(value AS DOUBLE)) - min(CAST(value AS DOUBLE))) "
        "/ CAST(64 AS DOUBLE) AS w FROM events), "
        "h AS (SELECT event_type, "
        "CAST(CASE WHEN b.w = 0.0 THEN 0 ELSE "
        "least(floor((CAST(value AS DOUBLE) - b.lo) / b.w), 63) END AS INT) "
        "AS bucket, CAST(count(*) AS BIGINT) AS n "
        "FROM events, b WHERE value IS NOT NULL "
        "AND CAST(value AS DOUBLE) >= b.lo AND CAST(value AS DOUBLE) <= b.hi "
        "GROUP BY event_type, bucket), "
        "c AS (SELECT *, CAST(SUM(n) OVER (PARTITION BY event_type "
        "ORDER BY bucket ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum, "
        "CAST(SUM(n) OVER (PARTITION BY event_type) AS BIGINT) AS tot "
        "FROM h), "
        "x AS (SELECT c.*, q, CAST(ceil(q * CAST(tot AS DOUBLE)) AS BIGINT) "
        "AS r, cum - n AS prev FROM c "
        "CROSS JOIN (SELECT unnest([0.1, 0.5, 0.9, 0.99]) AS q)) "
        "SELECT event_type, q, "
        + _pr(
            "b.lo + b.w * (CAST(bucket AS DOUBLE) + "
            "CAST(r - prev AS DOUBLE) / CAST(n AS DOUBLE))"
        )
        + " AS est FROM x, b WHERE prev < r AND r <= cum"
    )
    # HLL: the register table and the raw estimator restated exactly —
    # 60-bit hex hash, first-1-bit rank via the same lpad(bin())/strpos
    # string ops, integer harmonic sum, one literal α·m²·2^K
    _hll_regs = (
        "SELECT CAST(b AS INT) AS bucket, CAST(max(CASE WHEN "
        "strpos(s, '1') = 0 THEN 53 ELSE strpos(s, '1') END) AS INT) "
        "AS maxrank FROM ("
        "SELECT h % 256 AS b, lpad(bin(h // 256), 52, '0') AS s FROM ("
        "SELECT CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15) "
        "AS BIGINT) AS h FROM events WHERE user_id IS NOT NULL)) "
        "GROUP BY b"
    )
    d["events_hll"] = _hll_regs
    _hll_num = repr((0.7213 / (1.0 + 1.079 / 256)) * 256 * 256 * float(1 << 53))
    d["events_hll_estimate"] = (
        f"WITH regs AS ({_hll_regs}), "
        "s AS (SELECT CAST(COALESCE(SUM(CAST(pow(2.0, 53 - maxrank) "
        "AS BIGINT)), 0) AS BIGINT) AS ssum, count(*) AS n FROM regs) "
        "SELECT floor((" + _hll_num + " / "
        "(ssum + (256 - n) * 9007199254740992)) * 10000 + 0.5) / 10000 "
        "AS est, "
        "(SELECT CAST(count(DISTINCT user_id) AS BIGINT) FROM events "
        "WHERE user_id IS NOT NULL) AS exact_n FROM s"
    )
    # per-group HLL: the register derivation keyed by event_type, the
    # same literal α·m²·2^K numerator, per-group integer harmonic sums
    d["events_zorder_key"] = 'SELECT event_id, ub, hb, CAST(((((ub >> 0) & 1) << 0) + (((hb >> 0) & 1) << 1)) + ((((ub >> 1) & 1) << 2) + (((hb >> 1) & 1) << 3)) + ((((ub >> 2) & 1) << 4) + (((hb >> 2) & 1) << 5)) + ((((ub >> 3) & 1) << 6) + (((hb >> 3) & 1) << 7)) + ((((ub >> 4) & 1) << 8) + (((hb >> 4) & 1) << 9)) + ((((ub >> 5) & 1) << 10) + (((hb >> 5) & 1) << 11)) + ((((ub >> 6) & 1) << 12) + (((hb >> 6) & 1) << 13)) + ((((ub >> 7) & 1) << 14) + (((hb >> 7) & 1) << 15)) AS BIGINT) AS zkey FROM (SELECT event_id, CAST(user_id % 256 AS BIGINT) AS ub, CAST(EXTRACT(hour FROM ts) AS BIGINT) AS hb FROM events)'
    d["events_kmv"] = "WITH td AS (SELECT DISTINCT CAST(CAST('0x' || substr(md5('k#' || CAST(user_id AS VARCHAR)), 1, 12) AS BIGINT) AS BIGINT) AS h FROM (SELECT user_id FROM events) WHERE user_id IS NOT NULL), t AS (SELECT h FROM td ORDER BY h LIMIT 64) SELECT CAST(row_number() OVER (ORDER BY h) AS BIGINT) AS rk, h FROM t"
    d["events_kmv_estimate"] = "WITH td AS (SELECT DISTINCT CAST(CAST('0x' || substr(md5('k#' || CAST(user_id AS VARCHAR)), 1, 12) AS BIGINT) AS BIGINT) AS h FROM (SELECT user_id FROM events) WHERE user_id IS NOT NULL), t AS (SELECT h FROM td ORDER BY h LIMIT 64), agg AS (SELECT CAST(count(*) AS BIGINT) AS n_sketch, max(h) AS kth FROM t) SELECT n_sketch, kth, CASE WHEN n_sketch < 64 THEN CAST(n_sketch AS DOUBLE) ELSE (FLOOR((63e0 * 281474976710656e0 / CAST(kth AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0) END AS estimate FROM agg"
    d["events_kmv_intersect"] = "WITH ad AS (SELECT DISTINCT CAST(CAST('0x' || substr(md5('k#' || CAST(user_id AS VARCHAR)), 1, 12) AS BIGINT) AS BIGINT) AS h FROM (SELECT user_id FROM events WHERE event_type = 'purchase' AND user_id % 3 <> 0) WHERE user_id IS NOT NULL), a AS (SELECT h FROM ad ORDER BY h LIMIT 64), bd AS (SELECT DISTINCT CAST(CAST('0x' || substr(md5('k#' || CAST(user_id AS VARCHAR)), 1, 12) AS BIGINT) AS BIGINT) AS h FROM (SELECT user_id FROM events WHERE user_id % 2 = 0) WHERE user_id IS NOT NULL), b AS (SELECT h FROM bd ORDER BY h LIMIT 64), xu AS (SELECT h FROM (SELECT h FROM a UNION SELECT h FROM b) ORDER BY h LIMIT 64), fl AS (SELECT x.h, (a.h IS NOT NULL) AS ina, (b.h IS NOT NULL) AS inb FROM xu x LEFT JOIN a ON a.h = x.h LEFT JOIN b ON b.h = x.h), agg AS (SELECT CAST(count(*) AS BIGINT) AS n_union_sketch, max(h) AS kth, CAST(sum(CASE WHEN ina AND inb THEN 1 ELSE 0 END) AS BIGINT) AS k_common FROM fl) SELECT n_union_sketch, k_common, CASE WHEN n_union_sketch < 64 THEN CAST(n_union_sketch AS DOUBLE) ELSE (FLOOR((63e0 * 281474976710656e0 / CAST(kth AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0) END AS est_union, (FLOOR(((CAST(k_common AS DOUBLE) / n_union_sketch) * (CASE WHEN n_union_sketch < 64 THEN CAST(n_union_sketch AS DOUBLE) ELSE (FLOOR((63e0 * 281474976710656e0 / CAST(kth AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0) END)) * 1000000.0 + 0.5) / 1000000.0) AS est_intersection FROM agg"
    d["events_hll_groups"] = (
        "WITH regs AS (SELECT event_type, CAST(b AS INT) AS bucket, "
        "max(CASE WHEN strpos(s, '1') = 0 THEN 53 ELSE strpos(s, '1') END) "
        "AS maxrank FROM ("
        "SELECT event_type, h % 256 AS b, lpad(bin(h // 256), 52, '0') AS s "
        "FROM (SELECT event_type, CAST('0x' || "
        "substr(md5(CAST(user_id AS VARCHAR)), 1, 15) AS BIGINT) AS h "
        "FROM events WHERE user_id IS NOT NULL)) GROUP BY event_type, b), "
        "s AS (SELECT event_type, CAST(SUM(CAST(pow(2.0, 53 - maxrank) "
        "AS BIGINT)) AS BIGINT) AS ssum, count(*) AS n FROM regs "
        "GROUP BY event_type), "
        "ex AS (SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) "
        "AS exact_n FROM events WHERE user_id IS NOT NULL "
        "GROUP BY event_type) "
        "SELECT s.event_type, floor((" + _hll_num + " / "
        "(ssum + (256 - n) * 9007199254740992)) * 10000 + 0.5) / 10000 "
        "AS est, ex.exact_n FROM s JOIN ex USING (event_type)"
    )
    # streaming histogram: additive counts on a fixed [0, 4096]/32
    # grid make the micro-batch merge equal the batch histogram
    d["stream_histogram"] = (
        "SELECT CAST(least(floor(CAST(n_chars AS DOUBLE) / 128.0), 31) "
        "AS INT) AS bucket, CAST(count(*) AS BIGINT) AS n FROM documents "
        "WHERE n_chars IS NOT NULL AND CAST(n_chars AS DOUBLE) >= 0.0 "
        "AND CAST(n_chars AS DOUBLE) <= 4096.0 GROUP BY 1"
    )
    # Bloom filter: deterministic md5 hash family (same as the CMS),
    # so bit table and every membership verdict restate exactly in SQL
    d["events_bloom"] = (
        "WITH ins AS (SELECT DISTINCT CAST(user_id AS VARCHAR) AS ks "
        "FROM events WHERE user_id IS NOT NULL AND user_id % 2 = 0), "
        "bits AS (SELECT DISTINCT CAST(CAST('0x' || "
        "substr(md5(i || '#' || ks), 1, 8) AS BIGINT) % 512 AS BIGINT) AS bit "
        "FROM ins CROSS JOIN (SELECT unnest(range(4)) AS i)), "
        "probe AS (SELECT DISTINCT user_id, CAST(user_id AS VARCHAR) AS ks "
        "FROM events WHERE user_id IS NOT NULL), "
        "pb AS (SELECT user_id, CAST(CAST('0x' || "
        "substr(md5(i || '#' || ks), 1, 8) AS BIGINT) % 512 AS BIGINT) AS bit "
        "FROM probe CROSS JOIN (SELECT unnest(range(4)) AS i)) "
        "SELECT user_id, CAST(count(b.bit) = 4 AS BOOLEAN) AS member, "
        "CAST(user_id % 2 = 0 AS BOOLEAN) AS actual "
        "FROM pb LEFT JOIN bits b USING (bit) GROUP BY user_id"
    )
    # streaming HLL: max-mergeable registers make the micro-batch
    # merge equal the batch register table of the whole corpus
    d["stream_kmv"] = d["events_kmv"]
    d["stream_hll"] = (
        "SELECT CAST(b AS INT) AS bucket, CAST(max(CASE WHEN "
        "strpos(s, '1') = 0 THEN 53 ELSE strpos(s, '1') END) AS INT) "
        "AS maxrank FROM ("
        "SELECT h % 256 AS b, lpad(bin(h // 256), 52, '0') AS s FROM ("
        "SELECT CAST('0x' || substr(md5(source), 1, 15) AS BIGINT) AS h "
        "FROM documents)) GROUP BY b"
    )
    # streaming Bloom: OR-mergeable bits make the micro-batch merge
    # equal the batch filter of the whole corpus
    d["stream_bloom"] = (
        "SELECT DISTINCT CAST(CAST('0x' || "
        "substr(md5(i || '#' || source), 1, 8) AS BIGINT) % 256 AS BIGINT) "
        "AS bit FROM documents "
        "CROSS JOIN (SELECT unnest(range(4)) AS i)"
    )
    # URL dedup: the oracle states the canonical key as a CLOSED FORM
    # of doc_id (lowered host, no default port, tracking param gone) —
    # an independent statement, not a SQL re-derivation
    _hosts_sql = ",".join(f"'{h}'" for h in _WEB_HOSTS)
    d["web_domain_psl"] = _psl_sql()
    d["text_lm_surprise"] = _lm_surprise_sql()
    # trainable NB quality classifier: scores under every class, then
    # the argmin classification (ties -> label ascending; zero-token
    # docs surface as NULL)
    d["text_nb_quality"] = (
        "WITH " + _nb_sql_core() + ", "
        "ids AS (SELECT d.doc_id, l.label FROM documents d "
        "CROSS JOIN labels l) "
        "SELECT i.doc_id, i.label, "
        "CAST(COALESCE(a.n_toks, 0) AS BIGINT) AS n_tokens, a.score "
        "FROM ids i LEFT JOIN agg a "
        "ON a.doc_id = i.doc_id AND a.label = i.label"
    )
    d["text_nb_classify"] = (
        "WITH " + _nb_sql_core() + ", "
        "rk AS (SELECT doc_id, label, score, row_number() OVER "
        "(PARTITION BY doc_id ORDER BY score ASC, label ASC) AS rnk "
        "FROM agg WHERE score IS NOT NULL) "
        "SELECT d.doc_id, r.label AS pred, r.score FROM documents d "
        "LEFT JOIN (SELECT * FROM rk WHERE rnk = 1) r USING (doc_id)"
    )
    # winnowing: per-window packed argmin re-derived over DuckDB lists
    # (1-based inclusive slicing: window j = grams[j : j+len-1])
    _WB = 1 << 22
    d["text_winnow"] = (
        f"WITH toks AS (SELECT doc_id, {_WORDS} AS t FROM documents), "
        "gr AS (SELECT doc_id, len(t) - 3 AS g, "
        "list_transform(range(1, len(t) - 2), i -> "
        "CAST(CAST('0x' || substr(md5(array_to_string(t[i:i+3], ' ')), "
        f"1, 8) AS BIGINT) * {_WB} + ({_WB} - i) AS BIGINT)) AS grams "
        "FROM toks WHERE len(t) >= 4), "
        "sel AS (SELECT doc_id, unnest(list_distinct(list_transform("
        "range(1, greatest(g - 3, 1) + 1), "
        "j -> list_min(grams[j:j + least(4, g) - 1])))) AS p FROM gr) "
        f"SELECT doc_id, CAST({_WB} - p % {_WB} AS BIGINT) AS pos, "
        f"CAST(p // {_WB} AS BIGINT) AS fp FROM sel"
    )
    # the at-ingest gate: same scorer, LM fitted on the even-doc
    # reference corpus, keep surprise <= 190 (~the corpus median —
    # the gate demonstrably drops, not rubber-stamps)
    d["stream_lm_filter"] = (
        "SELECT doc_id AS seq, n_bigrams, surprise FROM ("
        + _lm_surprise_sql("WHERE doc_id % 2 = 0")
        + ") WHERE surprise IS NOT NULL AND surprise <= 190.0"
    )
    # the at-ingest trained-classifier gate: same NB recipe, keep
    # score under the 'long' class <= 3000 (~the corpus median — the
    # GPT-3 threshold recipe; zero-token docs score NULL and drop)
    # at-ingest Gopher repetition gate: the battery + cut restated
    # over the batch table (stateless projection, so per-batch ==
    # whole-log); seq == doc_id under the dense append mapping
    d["stream_gopher_filter"] = (
        "WITH gb AS ("
        + _gopher_battery_sql(top_ns=(2,), dup_ns=(3,))
        + ") SELECT doc_id AS seq, top_2gram_frac, dup_3gram_frac "
        "FROM gb WHERE top_2gram_frac <= 0.09 AND dup_3gram_frac <= 0.02"
    )
    d["stream_nb_filter"] = (
        "WITH " + _nb_sql_core() + " "
        "SELECT doc_id AS seq, label AS pred, score FROM agg "
        "WHERE label = 'long' AND score IS NOT NULL AND score <= 3000.0"
    )
    # DSIR distribution matching: per-doc mean hashed-bigram
    # target/raw probability ratio, then the deterministic top-50
    d["corpus_dsir_weights"] = (
        "WITH " + _dsir_sql_core() + " "
        "SELECT d.doc_id, "
        "CAST(COALESCE(a.n_grams, 0) AS BIGINT) AS n_grams, a.weight "
        "FROM documents d LEFT JOIN agg a USING (doc_id)"
    )
    d["corpus_dsir_select"] = (
        "WITH " + _dsir_sql_core() + " "
        "SELECT doc_id, n_grams, weight FROM agg "
        "WHERE weight IS NOT NULL "
        "ORDER BY weight DESC, doc_id ASC LIMIT 50"
    )
    # the at-ingest distribution-matching gate: same DSIR recipe,
    # keep weight >= 1.0 (~median; no-feature docs weigh NULL, drop)
    d["stream_dsir_filter"] = (
        "WITH " + _dsir_sql_core() + " "
        "SELECT doc_id AS seq, n_grams, weight FROM agg "
        "WHERE weight IS NOT NULL AND weight >= 1.0"
    )
    # streaming ANN intake: nearest frozen centroid per embedding,
    # the house (rounded cosine desc, cent_id asc) tiebreak
    d["stream_hash_embed"] = (
        "WITH " + ", ".join(_hashembed_ctes())
        + " SELECT doc_id AS seq, CAST(pos AS BIGINT) AS pos, val FROM hemb"
    )
    d["stream_pq_assign"] = (
        "WITH " + ", ".join(_pq_ctes())
        + " SELECT vec_id AS seq, CAST(sub AS BIGINT) AS sub, "
        "code_id, dist2 FROM enc"
    )
    d["stream_ivf_assign"] = (
        "WITH cents AS (SELECT vec_id AS cent_id, embedding AS cent "
        "FROM embeddings ORDER BY vec_id LIMIT 16), "
        "rk AS (SELECT e.vec_id AS seq, c.cent_id AS cell, "
        + _pr(_cosine_sql("e.embedding", "c.cent"))
        + " AS cos, row_number() OVER (PARTITION BY e.vec_id ORDER BY "
        + _pr(_cosine_sql("e.embedding", "c.cent"))
        + " DESC, c.cent_id ASC) AS cr "
        "FROM embeddings e CROSS JOIN cents c) "
        "SELECT seq, CAST(cell AS BIGINT) AS cell, cos "
        "FROM rk WHERE cr = 1"
    )
    d["web_url_dedup"] = (
        "SELECT 'https://' || lower(([" + _hosts_sql + "])"
        "[CAST(doc_id % 8 AS INT) + 1]) || '/item-' || (doc_id % 50) "
        "AS url_canonical, "
        "CAST(min(doc_id) AS BIGINT) AS keep_doc_id, "
        "CAST(count(*) AS BIGINT) AS n_dups "
        "FROM documents GROUP BY 1"
    )
    # mixing weights: sqrt + pround + DECIMAL window sum — the exact
    # expression tree of operators.sampling.mixture_weights
    d["corpus_mixture"] = (
        "WITH per AS (SELECT doc_id, source, "
        f"CAST(len({_WORDS}) AS BIGINT) AS n_tokens FROM documents), "
        "a AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs, "
        "CAST(sum(n_tokens) AS BIGINT) AS n_tokens FROM per GROUP BY source), "
        "s AS (SELECT *, " + _pr("sqrt(CAST(n_tokens AS DOUBLE))")
        + " AS tokens_scaled FROM a), "
        "t AS (SELECT *, CAST(SUM(CAST(tokens_scaled AS DECIMAL(38,6))) "
        "OVER () AS DOUBLE) AS tot FROM s) "
        "SELECT source, n_docs, n_tokens, tokens_scaled, "
        + _pr("tokens_scaled / tot") + " AS weight FROM t"
    )
    # UniMax waterfilling: ascending-cap ranks, DECIMAL cap prefix
    # sums, per-rank equal share, transition rank star, θ at star —
    # the exact window program of sampling.unimax_allocation
    _UNIMAX_ORDER = "ORDER BY cap ASC, source ASC"
    d["corpus_unimax"] = (
        "WITH per AS (SELECT doc_id, source, "
        f"CAST(len({_WORDS}) AS BIGINT) AS n_tokens FROM documents), "
        "a AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs, "
        "CAST(sum(n_tokens) AS BIGINT) AS n_tokens FROM per GROUP BY source), "
        "c AS (SELECT *, " + _pr("CAST(n_tokens AS DOUBLE) * 1.0")
        + " AS cap FROM a), "
        "r AS (SELECT *, "
        f"CAST(row_number() OVER ({_UNIMAX_ORDER}) AS BIGINT) AS rk, "
        "CAST(count(*) OVER () AS BIGINT) AS L, "
        "CAST(SUM(CAST(cap AS DECIMAL(38,6))) OVER "
        f"({_UNIMAX_ORDER} ROWS UNBOUNDED PRECEDING) "
        "- CAST(cap AS DECIMAL(38,6)) AS DOUBLE) AS pfx FROM c), "
        "s AS (SELECT *, "
        + _pr("(26000.0 - pfx) / CAST(L - rk + 1 AS DOUBLE)")
        + " AS share FROM r), "
        "t AS (SELECT *, min(CASE WHEN cap > share THEN rk END) OVER () "
        "AS star FROM s), "
        "u AS (SELECT *, max(CASE WHEN rk = star THEN share END) OVER () "
        "AS theta FROM t) "
        "SELECT source, n_docs, n_tokens, cap, "
        + _pr("CASE WHEN star IS NULL OR rk < star THEN cap ELSE theta END")
        + " AS alloc FROM u"
    )
    d["corpus_unimax_materialize"] = (
        "WITH um AS (SELECT * FROM (" + d["corpus_unimax"] + ") x), "
        "b AS (SELECT source, CAST(floor(alloc) AS BIGINT) AS budget "
        "FROM um), "
        "per AS (SELECT doc_id, source, "
        f"CAST(len({_WORDS}) AS BIGINT) AS n_tokens FROM documents), "
        "c AS (SELECT doc_id, source, n_tokens, "
        "CAST(SUM(n_tokens) OVER (PARTITION BY source "
        "ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id "
        "ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum FROM per) "
        "SELECT c.doc_id, c.source, c.n_tokens, c.cum AS cum_tokens, "
        "b.budget FROM c JOIN b USING (source) "
        "WHERE c.cum - c.n_tokens < b.budget"
    )
    # length-bucketed batching: global (n_tokens, md5, id) order via
    # row_number, fixed-rows batches — the exact order the two-pass
    # position assignment reproduces
    _LB_POS = (
        "WITH per AS (SELECT doc_id, "
        f"CAST(len({_WORDS}) AS BIGINT) AS n_tokens FROM documents), "
        "p AS (SELECT doc_id, n_tokens, "
        "CAST(row_number() OVER (ORDER BY n_tokens, "
        "md5(CAST(doc_id AS VARCHAR)), doc_id) - 1 AS BIGINT) AS pos "
        "FROM per)"
    )
    d["pack_length_batches"] = (
        _LB_POS + " SELECT doc_id, n_tokens, "
        "CAST(pos // 16 AS BIGINT) AS batch_id, "
        "CAST(pos % 16 AS BIGINT) AS pos_in_batch FROM p"
    )
    d["pack_padding_report"] = (
        _LB_POS + ", b AS (SELECT CAST(pos // 16 AS BIGINT) AS batch_id, "
        "CAST(count(*) AS BIGINT) AS n_docs, "
        "CAST(max(n_tokens) AS BIGINT) AS max_tokens, "
        "CAST(sum(n_tokens) AS BIGINT) AS sum_tokens FROM p GROUP BY 1) "
        "SELECT batch_id, n_docs, max_tokens, sum_tokens, "
        "CAST(n_docs * max_tokens AS BIGINT) AS padded_tokens, "
        "CASE WHEN n_docs * max_tokens = 0 THEN 0.0 ELSE "
        + _pr(
            "1.0 - CAST(sum_tokens AS DOUBLE) / "
            "CAST(n_docs * max_tokens AS DOUBLE)"
        )
        + " END AS padding_waste FROM b"
    )
    # best-fit-decreasing whole-doc packing: the oracle REPLAYS the
    # chunk-local BFD sequentially with a recursive CTE — state is the
    # open-bin list encoded rem*1e5+idx (distinct idx keeps encodings
    # unique; list_min over the fits-filtered list IS best-fit with
    # the lowest-id tie-break), reset at each 256-doc chunk boundary
    _BFD = (
        # MATERIALIZED: the recursive term re-evaluates plain CTEs on
        # every iteration — without the hint each of the N steps would
        # re-tokenize the whole corpus (measured 13.6s -> ~0.2s at 500)
        "WITH RECURSIVE per AS MATERIALIZED (SELECT doc_id, "
        f"CAST(len({_WORDS}) AS BIGINT) AS n FROM documents), "
        "fits AS MATERIALIZED (SELECT doc_id, n, "
        "CAST(row_number() OVER (ORDER BY n DESC, "
        "md5(CAST(doc_id AS VARCHAR)), doc_id) - 1 AS BIGINT) AS pos "
        "FROM per WHERE n > 0 AND n <= 2048), "
        "steps AS ("
        "SELECT CAST(-1 AS BIGINT) AS pos, CAST(NULL AS BIGINT) AS doc_id, "
        "CAST(NULL AS BIGINT) AS n, CAST(NULL AS BIGINT) AS bid, "
        "CAST([] AS BIGINT[]) AS bins "
        "UNION ALL "
        "SELECT o.pos, o.doc_id, o.n, "
        "CASE WHEN chosen IS NULL THEN len(eff) "
        "ELSE chosen % 100000 END AS bid, "
        "CASE WHEN chosen IS NULL "
        "THEN list_append(eff, (2048 - o.n) * 100000 + len(eff)) "
        "ELSE list_transform(eff, b -> CASE WHEN b = chosen "
        "THEN b - o.n * 100000 ELSE b END) END AS bins "
        "FROM (SELECT o.pos, o.doc_id, o.n, eff, "
        "list_min(list_filter(eff, b -> b // 100000 >= o.n)) AS chosen "
        "FROM steps s JOIN fits o ON o.pos = s.pos + 1 "
        "CROSS JOIN LATERAL (SELECT CASE WHEN o.pos % 256 = 0 "
        "THEN CAST([] AS BIGINT[]) ELSE s.bins END AS eff) e) o), "
        "packed AS (SELECT doc_id, n AS n_tokens, "
        "CAST((pos // 256) * 256 + bid AS BIGINT) AS pack_id, pos "
        "FROM steps WHERE pos >= 0), "
        "oversize AS (SELECT doc_id, n AS n_tokens, "
        "-CAST(row_number() OVER (ORDER BY md5(CAST(doc_id AS VARCHAR)), "
        "doc_id) AS BIGINT) AS pack_id, "
        "CAST(-1 AS BIGINT) AS pos FROM per WHERE n > 2048), "
        "allp AS (SELECT doc_id, n_tokens, pack_id, "
        "CAST(row_number() OVER (PARTITION BY pack_id ORDER BY pos) - 1 "
        "AS BIGINT) AS pack_pos FROM "
        "(SELECT * FROM packed UNION ALL SELECT * FROM oversize) u)"
    )
    d["pack_bfd"] = (
        _BFD + " SELECT doc_id, n_tokens, pack_id, pack_pos FROM allp"
    )
    d["pack_bfd_report"] = (
        _BFD + ", agg AS (SELECT pack_id, "
        "CAST(count(*) AS BIGINT) AS n_docs, "
        "CAST(sum(n_tokens) AS BIGINT) AS sum_tokens FROM allp GROUP BY 1) "
        "SELECT pack_id, n_docs, sum_tokens, "
        + _pr(
            "1.0 - CAST(least(sum_tokens, 2048) AS DOUBLE) / 2048.0"
        )
        + " AS padding_waste FROM agg"
    )
    # at-ingest online best-fit packing: arrival (seq) order, bins
    # reset on chunk change (chunk = seq div 125 — computed over ALL
    # seqs, so the fits recursion compares chunk columns instead of
    # a position modulus); oversize rows take the window-free
    # pack_id = -(seq+1). Same encoded-bin-list recursion as pack_bfd.
    d["stream_pack_bfd"] = (
        "WITH RECURSIVE per AS MATERIALIZED (SELECT "
        "CAST(row_number() OVER (ORDER BY doc_id) - 1 AS BIGINT) AS seq, "
        f"CAST(len({_WORDS}) AS BIGINT) AS n FROM documents), "
        "fits AS MATERIALIZED (SELECT seq, n, seq // 125 AS ch, "
        "CAST(row_number() OVER (ORDER BY seq) - 1 AS BIGINT) AS r "
        "FROM per WHERE n > 0 AND n <= 2048), "
        "steps AS ("
        "SELECT CAST(-1 AS BIGINT) AS r, CAST(NULL AS BIGINT) AS seq, "
        "CAST(NULL AS BIGINT) AS n, CAST(-1 AS BIGINT) AS ch, "
        "CAST(NULL AS BIGINT) AS bid, CAST([] AS BIGINT[]) AS bins "
        "UNION ALL "
        "SELECT o.r, o.seq, o.n, o.ch, "
        "CASE WHEN chosen IS NULL THEN len(eff) "
        "ELSE chosen % 100000 END AS bid, "
        "CASE WHEN chosen IS NULL "
        "THEN list_append(eff, (2048 - o.n) * 100000 + len(eff)) "
        "ELSE list_transform(eff, b -> CASE WHEN b = chosen "
        "THEN b - o.n * 100000 ELSE b END) END AS bins "
        "FROM (SELECT o.r, o.seq, o.n, o.ch, eff, "
        "list_min(list_filter(eff, b -> b // 100000 >= o.n)) AS chosen "
        "FROM steps s JOIN fits o ON o.r = s.r + 1 "
        "CROSS JOIN LATERAL (SELECT CASE WHEN o.ch <> s.ch "
        "THEN CAST([] AS BIGINT[]) ELSE s.bins END AS eff) e) o), "
        "packed AS (SELECT seq, n AS n_tokens, "
        "CAST(ch * 125 + bid AS BIGINT) AS pack_id, r "
        "FROM steps WHERE r >= 0), "
        "oversize AS (SELECT seq, n AS n_tokens, "
        "CAST(-(seq + 1) AS BIGINT) AS pack_id, "
        "CAST(-1 AS BIGINT) AS r FROM per WHERE n > 2048), "
        "allp AS (SELECT seq, n_tokens, pack_id, "
        "CAST(row_number() OVER (PARTITION BY pack_id ORDER BY r) - 1 "
        "AS BIGINT) AS pack_pos FROM "
        "(SELECT * FROM packed UNION ALL SELECT * FROM oversize) u) "
        "SELECT seq, n_tokens, pack_id, pack_pos FROM allp"
    )
    # --- dedup-quality eval harness (operators/dedupeval.py) -------
    # planted corpus: md5-first-hex-selected 3/16 of docs get a copy
    # at id+1e9; 'none' = exact copy, 'token' = one appended token
    _PLANT_SEL = "substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ('0','1','2')"

    def _pdocs(mutate: str) -> str:
        mtext = (
            "text"
            if mutate == "none"
            else "text || ' zqdup' || CAST(doc_id AS VARCHAR)"
        )
        return (
            "pdocs AS (SELECT doc_id, text FROM documents UNION ALL "
            f"SELECT doc_id + 1000000000 AS doc_id, {mtext} AS text "
            f"FROM documents WHERE {_PLANT_SEL}), "
            "truth AS (SELECT doc_id AS id_a, doc_id + 1000000000 AS id_b "
            f"FROM documents WHERE {_PLANT_SEL})"
        )

    # metrics: normalized-distinct pair sets, full-outer join, exact
    # integer counts, the same single-division trees as pair_metrics
    _METRICS = (
        ", np AS (SELECT DISTINCT least(id_a, id_b) AS a, "
        "greatest(id_a, id_b) AS b FROM pred), "
        "nt AS (SELECT DISTINCT least(id_a, id_b) AS a, "
        "greatest(id_a, id_b) AS b FROM truth), "
        "m AS (SELECT CAST(count(p.a) AS BIGINT) AS n_pred, "
        "CAST(count(t.a) AS BIGINT) AS n_truth, "
        "CAST(count(CASE WHEN p.a IS NOT NULL AND t.a IS NOT NULL "
        "THEN 1 END) AS BIGINT) AS tp "
        "FROM np p FULL OUTER JOIN nt t ON p.a = t.a AND p.b = t.b) "
        "SELECT n_pred, n_truth, tp, "
        "CASE WHEN n_pred > 0 THEN "
        + _pr("CAST(tp AS DOUBLE) / CAST(n_pred AS DOUBLE)")
        + ' ELSE 0.0 END AS "precision", '
        "CASE WHEN n_truth > 0 THEN "
        + _pr("CAST(tp AS DOUBLE) / CAST(n_truth AS DOUBLE)")
        + " ELSE 0.0 END AS recall, "
        "CASE WHEN n_pred + n_truth > 0 THEN "
        + _pr("2.0 * CAST(tp AS DOUBLE) / CAST(n_pred + n_truth AS DOUBLE)")
        + " ELSE 0.0 END AS f1 FROM m"
    )
    d["dedup_eval_exact"] = (
        "WITH " + _pdocs("none") + ", "
        "ph AS (SELECT doc_id, md5(text) AS h FROM pdocs), "
        "pred AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b "
        "FROM ph a JOIN ph b ON a.h = b.h AND a.doc_id < b.doc_id)"
        + _METRICS
    )
    d["dedup_eval_jaccard"] = (
        "WITH " + _pdocs("token") + ", "
        + _CAPPED_SHINGLE_CTES.replace("FROM documents", "FROM pdocs")
        + ", sz AS (SELECT doc_id, count(*) AS n FROM s GROUP BY doc_id), "
        "inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS c "
        "FROM s a JOIN s b ON a.sh = b.sh AND a.doc_id < b.doc_id "
        "GROUP BY a.doc_id, b.doc_id), "
        "pred AS (SELECT id_a, id_b FROM inter "
        "JOIN sz x ON x.doc_id = id_a JOIN sz y ON y.doc_id = id_b "
        "WHERE " + _pr("c / (x.n + y.n - c)") + " >= 0.2)"
        + _METRICS
    )
    # doc-level twin of the pair metric tail (id_metrics)
    _ID_METRICS = (
        ", np AS (SELECT DISTINCT doc_id AS k FROM pred), "
        "nt AS (SELECT DISTINCT doc_id AS k FROM truth), "
        "m2 AS (SELECT CAST(count(p.k) AS BIGINT) AS n_pred, "
        "CAST(count(t.k) AS BIGINT) AS n_truth, "
        "CAST(count(CASE WHEN p.k IS NOT NULL AND t.k IS NOT NULL "
        "THEN 1 END) AS BIGINT) AS tp "
        "FROM np p FULL OUTER JOIN nt t ON p.k = t.k) "
        "SELECT n_pred, n_truth, tp, "
        "CASE WHEN n_pred > 0 THEN "
        + _pr("CAST(tp AS DOUBLE) / CAST(n_pred AS DOUBLE)")
        + ' ELSE 0.0 END AS "precision", '
        "CASE WHEN n_truth > 0 THEN "
        + _pr("CAST(tp AS DOUBLE) / CAST(n_truth AS DOUBLE)")
        + " ELSE 0.0 END AS recall, "
        "CASE WHEN n_pred + n_truth > 0 THEN "
        + _pr("2.0 * CAST(tp AS DOUBLE) / CAST(n_pred + n_truth AS DOUBLE)")
        + " ELSE 0.0 END AS f1 FROM m2"
    )
    # planted-contamination eval: span = first 6 tokens of the
    # lowest-id >=10-token eval doc, appended to the md5-selected 3/16
    # of the train half; detector = the graded trigram containment
    # (same CTE shapes as d['decontaminate']) at bar n_matched >= 4
    d["decontaminate_eval"] = (
        "WITH tk AS (SELECT doc_id, "
        f"{_WORDS} AS toks, text FROM documents), "
        "donor AS (SELECT toks FROM tk "
        "WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) < '0ccccccc' "
        "AND len(toks) >= 10 ORDER BY doc_id LIMIT 1), "
        "sp AS (SELECT array_to_string(toks[1:6], ' ') AS s FROM donor), "
        "corpus AS (SELECT doc_id, CASE WHEN "
        f"{_PLANT_SEL} THEN text || ' ' || (SELECT s FROM sp) "
        "ELSE text END AS text FROM tk "
        "WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) >= '0ccccccc'), "
        "truth AS (SELECT doc_id FROM tk "
        "WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) >= '0ccccccc' "
        f"AND {_PLANT_SEL}), "
        "ct AS (SELECT doc_id, "
        f"{_WORDS} AS toks FROM corpus), "
        "cs AS (SELECT doc_id, list_distinct("
        "list_transform(range(1, greatest(len(toks) - 1, 1)), "
        "i -> array_to_string(toks[i:i+2], ' '))) AS shs FROM ct), "
        "e AS (SELECT DISTINCT unnest(list_distinct("
        "list_transform(range(1, greatest(len(toks) - 1, 1)), "
        "i -> array_to_string(toks[i:i+2], ' ')))) AS shingle FROM tk "
        "WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) < '0ccccccc'), "
        "f AS (SELECT doc_id, unnest(shs) AS shingle FROM cs), "
        "m AS (SELECT f.doc_id, count(*) AS n_matched FROM f "
        "JOIN e USING (shingle) GROUP BY f.doc_id), "
        "pred AS (SELECT doc_id FROM m WHERE n_matched >= 4)"
        + _ID_METRICS
    )
    # threshold-calibration histogram: the dedup_jaccard pair CTE at
    # bar 0.1, bucketed by floor(jaccard*10) — same double bits, same
    # IEEE mul/floor, so buckets replay exactly
    d["dedup_threshold_histogram"] = (
        f"WITH {_CAPPED_SHINGLE_CTES}, "
        "sz AS (SELECT doc_id, count(*) AS n FROM s GROUP BY doc_id), "
        "inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS c "
        "FROM s a JOIN s b ON a.sh = b.sh AND a.doc_id < b.doc_id "
        "GROUP BY a.doc_id, b.doc_id), "
        "p AS (SELECT " + _pr("c / (x.n + y.n - c)") + " AS jaccard "
        "FROM inter JOIN sz x ON x.doc_id = id_a "
        "JOIN sz y ON y.doc_id = id_b "
        "WHERE " + _pr("c / (x.n + y.n - c)") + " >= 0.1) "
        "SELECT CAST(floor(jaccard * 10) AS INT) AS bucket, "
        "CAST(count(*) AS BIGINT) AS n_pairs FROM p GROUP BY 1"
    )
    # cluster-size distribution over the connected components
    d["dedup_cluster_sizes"] = (
        "WITH RECURSIVE " + _CLUSTER_CTES + ", "
        "cl AS (SELECT node AS doc_id, CAST(min(root) AS BIGINT) AS cid "
        "FROM reach GROUP BY node), "
        "sz2 AS (SELECT cid, CAST(count(*) AS BIGINT) AS cluster_size "
        "FROM cl GROUP BY cid) "
        "SELECT cluster_size, CAST(count(*) AS BIGINT) AS n_clusters "
        "FROM sz2 GROUP BY 1"
    )
    # span-family eval: plant one shared 12-token span (5 interior
    # 8-grams per victim) and replay the graded span detector over
    # the planted corpus; truth = victims ∪ donor
    d["dedup_eval_spans"] = (
        "WITH donor AS (SELECT doc_id, "
        f"{_WORDS} AS toks FROM documents "
        f"WHERE len({_WORDS}) >= 12 ORDER BY doc_id LIMIT 1), "
        "sp AS (SELECT doc_id AS did, "
        "array_to_string(toks[1:12], ' ') AS s FROM donor), "
        "pdocs AS (SELECT doc_id, CASE WHEN "
        f"{_PLANT_SEL} THEN text || ' ' || (SELECT s FROM sp) "
        "ELSE text END AS text FROM documents), "
        + _DUP_SPAN_CTES[len("WITH "):].replace("FROM documents", "FROM pdocs")
        + ", pred AS (SELECT DISTINCT doc_id FROM isl), "
        "truth AS (SELECT doc_id FROM documents "
        f"WHERE {_PLANT_SEL} UNION SELECT did FROM sp)"
        + _ID_METRICS
    )
    _PLANT_SEL_V = _PLANT_SEL.replace("doc_id", "vec_id")
    d["dedup_eval_embedding"] = (
        "WITH pemb AS (SELECT vec_id, "
        "list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v "
        "FROM embeddings UNION ALL "
        "SELECT vec_id + 1000000000 AS vec_id, "
        "list_transform(embedding, x -> CAST(x AS DOUBLE) "
        "+ CAST(0.01 AS DOUBLE)) AS v "
        f"FROM embeddings WHERE {_PLANT_SEL_V}), "
        "truth AS (SELECT vec_id AS id_a, vec_id + 1000000000 AS id_b "
        f"FROM embeddings WHERE {_PLANT_SEL_V}), "
        "cents AS (SELECT vec_id AS cent_id, v AS cent "
        "FROM pemb ORDER BY vec_id LIMIT 16), "
        "cell AS (SELECT id, cent_id, v FROM ("
        "SELECT e.vec_id AS id, c.cent_id, e.v, "
        "row_number() OVER (PARTITION BY e.vec_id ORDER BY "
        + _pr(_cosine_sql("e.v", "c.cent"))
        + " DESC, c.cent_id ASC) AS cr "
        "FROM pemb e CROSS JOIN cents c) WHERE cr = 1), "
        "pred AS (SELECT a.id AS id_a, b.id AS id_b "
        "FROM cell a JOIN cell b ON a.cent_id = b.cent_id AND a.id < b.id "
        "WHERE " + _pr(_cosine_sql("a.v", "b.v")) + " >= 0.45)"
        + _METRICS
    )
    # hierarchical-SemDeDup eval arm: the full two-level Lloyd pair
    # chain re-sourced onto the planted embeddings (nested WITH in a
    # subquery — outer CTEs are visible inside it), scored against the
    # planted truth with the standard pair-metric tail
    d["dedup_eval_semantic_hier"] = (
        "WITH pemb2 AS (SELECT vec_id, "
        "list_transform(embedding, x -> CAST(x AS DOUBLE)) AS embedding "
        "FROM embeddings UNION ALL "
        "SELECT vec_id + 1000000000 AS vec_id, "
        "list_transform(embedding, x -> CAST(x AS DOUBLE) "
        "+ CAST(0.01 AS DOUBLE)) AS embedding "
        f"FROM embeddings WHERE {_PLANT_SEL_V}), "
        "truth AS (SELECT vec_id AS id_a, vec_id + 1000000000 AS id_b "
        f"FROM embeddings WHERE {_PLANT_SEL_V}), "
        "pred AS (SELECT id_a, id_b FROM ("
        + _hier_semdedup_sql(
            "pairs",
            k1=_icbrt_limit("pemb2", 4),
            k2=_icbrt_limit("pemb2", 4),
            threshold=0.45,
            src="pemb2",
        )
        + ") z)" + _METRICS
    )
    # materialized mixture: the corpus_mixture oracle (as a subquery
    # CTE) feeds floor(weight·total) budgets into the per-source
    # (md5(id), id) cumsum admission rule
    d["corpus_mixture_materialize"] = (
        "WITH cm AS (SELECT * FROM (" + d["corpus_mixture"] + ") x), "
        "b AS (SELECT source, CAST(floor(weight * 20000.0) AS BIGINT) "
        "AS budget FROM cm), "
        "per AS (SELECT doc_id, source, "
        f"CAST(len({_WORDS}) AS BIGINT) AS n_tokens FROM documents), "
        "c AS (SELECT doc_id, source, n_tokens, "
        "CAST(SUM(n_tokens) OVER (PARTITION BY source "
        "ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id "
        "ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum FROM per) "
        "SELECT c.doc_id, c.source, c.n_tokens, c.cum AS cum_tokens, "
        "b.budget FROM c JOIN b USING (source) "
        "WHERE c.cum - c.n_tokens < b.budget"
    )
    # streaming web filter: the batch canonicalization restated over
    # the same synthetic URLs, minus the blocklisted domains
    d["stream_web_filter"] = (
        "WITH " + _web_sql() + " "
        "SELECT doc_id, canon AS url_canonical, dom AS url_domain "
        "FROM dws WHERE dom NOT IN ("
        + ",".join(f"'{b}'" for b in _WEB_BLOCKLIST)
        + ")"
    )
    # streaming CMS: additive counters make the micro-batch merge
    # equal the batch sketch of the whole corpus
    d["stream_cms"] = (
        "WITH b AS (SELECT r, CAST(CAST('0x' || "
        "substr(md5(r || '#' || source), 1, 8) AS BIGINT) % 16 AS BIGINT) "
        "AS bucket FROM documents "
        "CROSS JOIN (SELECT unnest(range(4)) AS r)) "
        "SELECT CAST(r AS BIGINT) AS row, bucket, "
        "CAST(count(*) AS BIGINT) AS cnt FROM b GROUP BY 1, 2"
    )
    # md5 shard draw: same first-8-hex-digits value, '0x'-cast in
    # DuckDB vs conv(,16,10) in Spark — both exact 32-bit integers
    # size-balanced export: global (size desc, id) rank dealt mod 64.
    # COALESCE in the ORDER BY mirrors the operator's documented
    # NULL-as-0 rule (assign_shards_balanced ranks NULL sizes as 0,
    # interleaved with genuine zeros by id; a bare DESC would place
    # NULLs after ALL non-null rows — ADVICE r9).
    d["export_shards_balanced"] = (
        "SELECT doc_id, n_chars, "
        "CAST((row_number() OVER (ORDER BY COALESCE(n_chars, 0) DESC, "
        "doc_id ASC) - 1) % 64 AS BIGINT) AS shard FROM documents"
    )
    d["export_shards"] = (
        "SELECT CAST(CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) "
        "AS BIGINT) % 64 AS BIGINT) AS shard, "
        "CAST(count(*) AS BIGINT) AS n_rows, "
        "CAST(sum(n_chars) AS BIGINT) AS total_size "
        "FROM documents GROUP BY 1"
    )
    # incremental-ingest eval: planted batch = exact copies of the
    # selected 3/16 (+1e9) + guaranteed-fresh docs (disjoint md5
    # selection, +2e9, unique ' zqnew<id>' suffix); the detector
    # mirror is text-equality membership in the existing corpus
    # (IS NOT DISTINCT FROM — the NULL-safe twin of the sentinel hash)
    _FRESH_SEL = "substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ('3','4')"
    d["dedup_eval_incremental"] = (
        "WITH newd AS ("
        "SELECT doc_id + 1000000000 AS doc_id, text FROM documents "
        f"WHERE {_PLANT_SEL} "
        "UNION ALL "
        "SELECT doc_id + 2000000000 AS doc_id, "
        "text || ' zqnew' || CAST(doc_id AS VARCHAR) AS text "
        f"FROM documents WHERE {_FRESH_SEL}), "
        "pred AS (SELECT n.doc_id FROM newd n WHERE EXISTS ("
        "SELECT 1 FROM documents e "
        "WHERE e.text IS NOT DISTINCT FROM n.text)), "
        "truth AS (SELECT doc_id + 1000000000 AS doc_id FROM documents "
        f"WHERE {_PLANT_SEL})" + _ID_METRICS
    )
    # containment eval: planted half-doc excerpts, overlap detector
    # at 0.9 over the capped universe resolved on the planted corpus
    d["dedup_eval_overlap"] = (
        "WITH pdocs AS (SELECT doc_id, text FROM documents UNION ALL "
        "SELECT doc_id + 1000000000 AS doc_id, "
        f"array_to_string(({_WORDS})[1:CAST(ceil(len({_WORDS}) / 2.0) "
        "AS BIGINT)], ' ') AS text "
        f"FROM documents WHERE {_PLANT_SEL}), "
        "truth AS (SELECT doc_id AS id_a, doc_id + 1000000000 AS id_b "
        f"FROM documents WHERE {_PLANT_SEL}), "
        + _CAPPED_SHINGLE_CTES.replace("FROM documents", "FROM pdocs")
        + ", sz AS (SELECT doc_id, count(*) AS n FROM s GROUP BY doc_id), "
        "inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, "
        "count(*) AS c FROM s a JOIN s b ON a.sh = b.sh "
        "AND a.doc_id < b.doc_id GROUP BY a.doc_id, b.doc_id), "
        "pred AS (SELECT id_a, id_b FROM inter "
        "JOIN sz x ON x.doc_id = id_a JOIN sz y ON y.doc_id = id_b "
        "WHERE " + _pr("c / least(x.n, y.n)") + " >= 0.9)" + _METRICS
    )
    # quality-aware-collapse eval: the overlap clusters over the
    # planted-excerpt corpus, the quality argmax keep, and the dropped
    # set scored against the planted excerpt ids
    d["dedup_eval_keep_best"] = (
        "WITH RECURSIVE pdocs AS (SELECT doc_id, text FROM documents "
        "UNION ALL "
        "SELECT doc_id + 1000000000 AS doc_id, "
        f"array_to_string(({_WORDS})[1:CAST(ceil(len({_WORDS}) / 2.0) "
        "AS BIGINT)], ' ') AS text "
        f"FROM documents WHERE {_PLANT_SEL}), "
        "truth AS (SELECT doc_id + 1000000000 AS doc_id FROM documents "
        f"WHERE {_PLANT_SEL}), "
        + _CAPPED_SHINGLE_CTES.replace("FROM documents", "FROM pdocs")
        + ", sz AS (SELECT doc_id, count(*) AS n FROM s GROUP BY doc_id), "
        "inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, "
        "count(*) AS c FROM s a JOIN s b ON a.sh = b.sh "
        "AND a.doc_id < b.doc_id GROUP BY a.doc_id, b.doc_id), "
        "opairs AS (SELECT id_a, id_b FROM inter "
        "JOIN sz x ON x.doc_id = id_a JOIN sz y ON y.doc_id = id_b "
        "WHERE " + _pr("c / least(x.n, y.n)") + " >= 0.9), "
        "edges AS (SELECT id_a AS src, id_b AS dst FROM opairs "
        "UNION SELECT id_b, id_a FROM opairs), "
        "reach(node, root) AS (SELECT doc_id, doc_id FROM pdocs "
        "UNION SELECT e.dst, r.root FROM reach r "
        "JOIN edges e ON e.src = r.node), "
        "clusters AS (SELECT node AS doc_id, "
        "CAST(min(root) AS BIGINT) AS cluster_id FROM reach GROUP BY node), "
        "q AS (" + _quality_sql().replace("FROM documents", "FROM pdocs")
        + "), "
        "kept AS (SELECT doc_id FROM ("
        "SELECT c.doc_id, row_number() OVER (PARTITION BY c.cluster_id "
        "ORDER BY q.quality DESC, c.doc_id ASC) AS r "
        "FROM clusters c JOIN q USING (doc_id)) WHERE r = 1), "
        "pred AS (SELECT doc_id FROM pdocs "
        "WHERE doc_id NOT IN (SELECT doc_id FROM kept))" + _ID_METRICS
    )
    # cross-corpus eval: even ids = existing, incoming = odd ids +
    # token-mutated copies of the selected EVEN docs; detector = the
    # graded jaccard JOIN with max_df='auto' resolved over the
    # COMBINED planted corpora (cap CTE reads pdocs)
    d["dedup_eval_cross"] = (
        "WITH pdocs AS (SELECT doc_id, text FROM documents UNION ALL "
        "SELECT doc_id + 1000000000 AS doc_id, "
        "text || ' zqdup' || CAST(doc_id AS VARCHAR) AS text "
        f"FROM documents WHERE doc_id % 2 = 0 AND {_PLANT_SEL}), "
        "truth AS (SELECT doc_id AS id_a, doc_id + 1000000000 AS id_b "
        f"FROM documents WHERE doc_id % 2 = 0 AND {_PLANT_SEL}), "
        + _CAPPED_SHINGLE_CTES.replace("FROM documents", "FROM pdocs")
        + ", l AS (SELECT * FROM s "
        "WHERE doc_id % 2 = 0 AND doc_id < 1000000000), "
        "r AS (SELECT * FROM s "
        "WHERE doc_id % 2 = 1 OR doc_id >= 1000000000), "
        "szl AS (SELECT doc_id, count(*) AS n FROM l GROUP BY doc_id), "
        "szr AS (SELECT doc_id, count(*) AS n FROM r GROUP BY doc_id), "
        "inter AS (SELECT l.doc_id AS id_a, r.doc_id AS id_b, "
        "count(*) AS c FROM l JOIN r ON l.sh = r.sh GROUP BY 1, 2), "
        "pred AS (SELECT id_a, id_b FROM inter "
        "JOIN szl x ON x.doc_id = id_a JOIN szr y ON y.doc_id = id_b "
        "WHERE " + _pr("c / (x.n + y.n - c)") + " >= 0.2)" + _METRICS
    )
    return d


def _web_sql() -> str:
    """The web-curation oracle pipeline as DuckDB CTEs ending in
    ``dws(doc_id, source, n_chars, lang, url, scheme, host, port,
    rawpath, cq, dom, canon)`` — an independent SQL restatement of
    operators.web's canonicalization over the same synthetic URLs."""
    hosts = ",".join(f"'{h}'" for h in _WEB_HOSTS)
    trk = ",".join(
        f"'{k}'" for k in ("fbclid", "gclid", "msclkid", "ref", "mc_cid", "mc_eid")
    )
    sld = ",".join(
        f"'{l}'" for l in ("co", "com", "net", "org", "gov", "ac", "edu", "or", "ne")
    )
    return (
        "u AS (SELECT doc_id, source, n_chars, lang, "
        "(CASE WHEN doc_id % 2 = 0 THEN 'https' ELSE 'HTTP' END) || '://' || "
        f"([{hosts}])[CAST(doc_id % 8 AS INT) + 1] || "
        "(CASE WHEN doc_id % 3 = 0 THEN "
        "(CASE WHEN doc_id % 2 = 0 THEN ':443' ELSE ':80' END) "
        "WHEN doc_id % 5 = 0 THEN ':8080' ELSE '' END) || "
        "'/' || source || '/item-' || doc_id || "
        "(CASE WHEN doc_id % 4 = 0 THEN '?utm_source=feed&id=' || (doc_id % 100) "
        "WHEN doc_id % 4 = 1 THEN '?b=2&a=1&utm_campaign=x' "
        "WHEN doc_id % 4 = 2 THEN '?gclid=abc' ELSE '' END) || "
        "(CASE WHEN doc_id % 2 = 1 THEN '#section-2' ELSE '' END) AS url "
        "FROM documents), "
        "pw AS (SELECT *, "
        "lower(regexp_extract(url, '^([a-zA-Z][a-zA-Z0-9+.\\-]*)://', 1)) AS scheme, "
        "regexp_replace(regexp_extract(url, "
        "'^[a-zA-Z][a-zA-Z0-9+.\\-]*://([^/?#]*)', 1), '^[^@]*@', '') AS hp, "
        "regexp_extract(url, '^[a-zA-Z][a-zA-Z0-9+.\\-]*://[^/?#]*([^?#]*)', 1) "
        "AS rawpath, "
        "regexp_extract(url, '\\?([^#]*)', 1) AS rawq FROM u), "
        "hw AS (SELECT *, lower(string_split(hp, ':')[1]) AS host, "
        "CASE WHEN len(string_split(hp, ':')) > 1 THEN string_split(hp, ':')[2] "
        "ELSE '' END AS port FROM pw), "
        "cw AS (SELECT *, array_to_string(list_sort(list_filter("
        "string_split(rawq, '&'), "
        "x -> x <> '' AND NOT (substr(string_split(x, '=')[1], 1, 4) = 'utm_' "
        f"OR string_split(x, '=')[1] IN ({trk})))), '&') AS cq, "
        "string_split(host, '.') AS labels FROM hw), "
        "dws AS (SELECT *, "
        f"CASE WHEN len(labels) >= 3 AND labels[len(labels)-1] IN ({sld}) "
        "AND length(labels[len(labels)]) <= 3 "
        "THEN labels[len(labels)-2] || '.' || labels[len(labels)-1] || '.' || "
        "labels[len(labels)] "
        "WHEN len(labels) >= 2 THEN labels[len(labels)-1] || '.' || "
        "labels[len(labels)] "
        "ELSE host END AS dom, "
        "CASE WHEN scheme <> '' THEN scheme || '://' || host || "
        "(CASE WHEN port <> '' AND NOT ((scheme = 'https' AND port = '443') "
        "OR (scheme = 'http' AND port = '80')) THEN ':' || port ELSE '' END) || "
        "(CASE WHEN rawpath = '' THEN '/' ELSE rawpath END) || "
        "(CASE WHEN cq <> '' THEN '?' || cq ELSE '' END) END AS canon FROM cw)"
    )


def _psl_sql() -> str:
    """The web_domain_psl oracle: an independent SQL re-derivation of
    public-suffix resolution over the same embedded fixture — the rule
    table is regenerated from parse_suffix_rules (shared driver-side
    CONFIG, not shared computation), then per-depth LEFT joins on the
    host's last-d-labels string and a greatest/coalesce resolution
    (exception > longest plain/wildcard match > implicit '*'). DuckDB
    list slicing is 1-based inclusive: last d labels = ls[n-d+1:n].
    GREATEST NULL handling differs across engines, so matches are
    folded through COALESCE(-1)/NULLIF — exact integer arithmetic
    either way."""
    from margaret_spark.operators.web import parse_suffix_rules

    parsed = parse_suffix_rules(_PSL_FIXTURE)
    depths = sorted({d for _k, d, _p, _w, _e in parsed})
    hosts = ",".join(f"'{h}'" for h in _PSL_HOSTS)
    ctes = [
        "hosts AS (SELECT doc_id, "
        f"([{hosts}])[CAST(doc_id % {len(_PSL_HOSTS)} AS INT) + 1] AS host "
        "FROM documents)",
        "hl AS (SELECT doc_id, host, string_split(host, '.') AS ls, "
        "len(string_split(host, '.')) AS n FROM hosts)",
    ]
    joins, norm, exc = [], [], []
    for d in depths:
        rows = ", ".join(
            "('{}', {}, {}, {})".format(
                k,
                "CAST(NULL AS INT)" if p is None else p,
                "true" if w else "false",
                "CAST(NULL AS INT)" if e is None else e,
            )
            for k, kd, p, w, e in parsed
            if kd == d
        )
        ctes.append(
            f"r{d}(key{d}, plain{d}, wild{d}, exc{d}) AS "
            f"(SELECT * FROM (VALUES {rows}) v)"
        )
        joins.append(
            f"LEFT JOIN r{d} ON hl.n >= {d} AND "
            f"array_to_string(hl.ls[hl.n-{d}+1:hl.n], '.') = r{d}.key{d}"
        )
        norm.append(f"COALESCE(plain{d}, -1)")
        norm.append(
            f"CASE WHEN COALESCE(wild{d}, false) AND n >= {d + 1} "
            f"THEN {d + 1} ELSE -1 END"
        )
        exc.append(f"COALESCE(exc{d}, -1)")
    sel = ", ".join(
        f"r{d}.plain{d}, r{d}.wild{d}, r{d}.exc{d}" for d in depths
    )
    ctes.append(
        f"j AS (SELECT hl.*, {sel} FROM hl " + " ".join(joins) + ")"
    )
    ctes.append(
        "p AS (SELECT *, COALESCE("
        f"NULLIF(GREATEST({', '.join(exc)}), -1), "
        f"NULLIF(GREATEST({', '.join(norm)}), -1), 1) AS ps FROM j)"
    )
    return (
        "WITH " + ", ".join(ctes) + " "
        "SELECT doc_id, host, "
        "CASE WHEN n > ps THEN array_to_string(ls[n-ps:n], '.') END "
        "AS domain_psl, CAST(ps AS INT) AS psl_len FROM p"
    )


def _lm_surprise_sql(fit_where: str = "") -> str:
    """The text_lm_surprise / stream_lm_filter oracle: the pruned
    bigram LM and the mean-inverse-probability score re-derived in
    SQL — same top-512 (count desc, gram asc) cut, same add-one
    smoothing with V = the unigram table's row count, same
    pround-per-term + DECIMAL-sum mean. All integer ratios under IEEE
    division: hash-exact. ``fit_where`` restricts the FIT corpus (the
    reference-corpus recipe) while every document is scored."""
    return (
        f"WITH toks AS (SELECT doc_id, {_WORDS} AS t FROM documents), "
        f"fit AS (SELECT * FROM toks {fit_where}), "
        "u AS (SELECT gram, CAST(count(*) AS BIGINT) AS n FROM ("
        "SELECT unnest(t) AS gram FROM fit) GROUP BY gram "
        "ORDER BY n DESC, gram ASC LIMIT 512), "
        "fitbig AS (SELECT doc_id, t FROM fit WHERE len(t) >= 2), "
        "big AS (SELECT doc_id, t FROM toks WHERE len(t) >= 2), "
        "b AS (SELECT gram, CAST(count(*) AS BIGINT) AS n FROM ("
        "SELECT t[i] || ' ' || t[i + 1] AS gram FROM fitbig "
        "CROSS JOIN LATERAL unnest(range(1, len(t))) AS p(i)) "
        "GROUP BY gram ORDER BY n DESC, gram ASC LIMIT 512), "
        "v AS (SELECT count(*) AS v FROM u), "
        "pairs AS (SELECT doc_id, t[i] AS w1, "
        "t[i] || ' ' || t[i + 1] AS w12 FROM big "
        "CROSS JOIN LATERAL unnest(range(1, len(t))) AS p(i)), "
        "terms AS (SELECT doc_id, "
        + _pr(
            "CAST(COALESCE(u.n, 0) + v.v AS DOUBLE) / "
            "(COALESCE(b.n, 0) + 1)"
        )
        + " AS s FROM pairs "
        "LEFT JOIN u ON u.gram = pairs.w1 "
        "LEFT JOIN b ON b.gram = pairs.w12 CROSS JOIN v), "
        "agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams, "
        + _pr(
            "CAST(SUM(CAST(s AS DECIMAL(38,4))) AS DOUBLE) / count(*)"
        )
        + " AS surprise FROM terms GROUP BY doc_id) "
        "SELECT d.doc_id, "
        "CAST(COALESCE(a.n_bigrams, 0) AS BIGINT) AS n_bigrams, "
        "a.surprise FROM documents d LEFT JOIN agg a USING (doc_id)"
    )


def _dsir_sql_core() -> str:
    """The corpus_dsir_* oracle core (CTE body, no WITH): re-derives
    ``operators.dsir`` end-to-end in SQL — word-bigram occurrences,
    the md5-prefix 64-bucket feature hash (the house CMS convention),
    per-corpus bucket counts and totals, the add-one probability
    ratio ((cnt_t+1)/(N_t+B)) / ((cnt_r+1)/(N_r+B)) with the exact
    Spark expression tree (two exact integer-ratio divisions, one
    more exactly-rounded division), and the pround + DECIMAL mean.
    Hash-exact."""
    term = _pr(
        "(CAST(COALESCE(ct.n_t, 0) + 1 AS DOUBLE) / CAST(tot.ntd AS DOUBLE))"
        " / "
        "(CAST(COALESCE(cr.n_r, 0) + 1 AS DOUBLE) / CAST(tot.nrd AS DOUBLE))"
    )
    mean = _pr("CAST(SUM(CAST(s AS DECIMAL(38,4))) AS DOUBLE) / count(*)")
    return (
        f"toks AS (SELECT doc_id, {_WORDS} AS t FROM documents), "
        "g AS (SELECT doc_id, t[i] || ' ' || t[i + 1] AS gram FROM toks "
        "CROSS JOIN LATERAL unnest(range(1, len(t))) AS p(i) "
        "WHERE len(t) >= 2), "
        "bk AS (SELECT doc_id, CAST(CAST('0x' || substr(md5(gram), 1, 8) "
        "AS BIGINT) % 64 AS BIGINT) AS bucket FROM g), "
        "ct AS (SELECT bucket, CAST(count(*) AS BIGINT) AS n_t FROM bk "
        "WHERE doc_id % 2 = 0 GROUP BY bucket), "
        "cr AS (SELECT bucket, CAST(count(*) AS BIGINT) AS n_r FROM bk "
        "WHERE doc_id % 2 = 1 GROUP BY bucket), "
        "tot AS (SELECT "
        "(SELECT COALESCE(SUM(n_t), 0) FROM ct) + 64 AS ntd, "
        "(SELECT COALESCE(SUM(n_r), 0) FROM cr) + 64 AS nrd), "
        "terms AS (SELECT bk.doc_id, "
        f"{term} AS s FROM bk "
        "LEFT JOIN ct USING (bucket) LEFT JOIN cr USING (bucket) "
        "CROSS JOIN tot), "
        "agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams, "
        f"{mean} AS weight FROM terms GROUP BY doc_id)"
    )


def _nb_sql_core() -> str:
    """The text_nb_quality / text_nb_classify oracle core (CTE body,
    no WITH): re-derives ``operators.nbayes`` end-to-end in SQL —
    the doc_id % 3 training slice with its length-derived labels, the
    per-(token, label) counts, the top-16 (count desc, token asc)
    vocab cut, V as the cut's distinct-token count, in-vocab class
    token totals + class priors, then every per-token term
    pround((N_c + V) / (cnt + 1)) and the prior-scaled DECIMAL mean.
    Every quantity is a ratio of exact integers under one IEEE
    division (the lm_surprise construction): hash-exact."""
    term = _pr(
        "CAST(l.n_tokens + v.v AS DOUBLE) / "
        "CAST(COALESCE(c.n, 0) + 1 AS DOUBLE)"
    )
    mean = _pr("CAST(SUM(CAST(s AS DECIMAL(38,4))) AS DOUBLE) / count(*)")
    score = _pr(f"{mean} * (CAST(total AS DOUBLE) / CAST(n_docs AS DOUBLE))")
    return (
        f"toks AS (SELECT doc_id, {_WORDS} AS t FROM documents), "
        "train AS (SELECT doc_id, t, CASE WHEN len(t) >= 40 THEN 'long' "
        "ELSE 'short' END AS label FROM toks WHERE doc_id % 3 = 0), "
        "tl AS (SELECT label, unnest(t) AS token FROM train), "
        "per_label AS (SELECT token, label, "
        "CAST(count(*) AS BIGINT) AS n FROM tl GROUP BY token, label), "
        "vocab AS (SELECT token FROM (SELECT token, SUM(n) AS tot "
        "FROM per_label GROUP BY token "
        "ORDER BY tot DESC, token ASC LIMIT 16)), "
        "counts AS (SELECT p.token, p.label, p.n FROM per_label p "
        "JOIN vocab USING (token)), "
        "v AS (SELECT CAST(count(DISTINCT token) AS BIGINT) AS v "
        "FROM counts), "
        "dl AS (SELECT label, CAST(count(*) AS BIGINT) AS n_docs "
        "FROM train GROUP BY label), "
        "tt AS (SELECT label, CAST(SUM(n) AS BIGINT) AS n_tokens "
        "FROM counts GROUP BY label), "
        "labels AS (SELECT dl.label, "
        "CAST(COALESCE(tt.n_tokens, 0) AS BIGINT) AS n_tokens, dl.n_docs, "
        "(SELECT CAST(SUM(n_docs) AS BIGINT) FROM dl) AS total "
        "FROM dl LEFT JOIN tt USING (label)), "
        "dt AS (SELECT doc_id, unnest(t) AS token FROM toks), "
        "terms AS (SELECT dt.doc_id, l.label, l.n_docs, l.total, "
        f"{term} AS s FROM dt CROSS JOIN labels l CROSS JOIN v "
        "LEFT JOIN counts c ON c.token = dt.token AND c.label = l.label), "
        "agg AS (SELECT doc_id, label, "
        "CAST(count(*) AS BIGINT) AS n_toks, "
        f"{score} AS score FROM terms GROUP BY doc_id, label, n_docs, total)"
    )


def _image_dhash_sql() -> str:
    """The multimodal_image_dhash / _image_dedup oracle core: re-derive
    every dHash bit arithmetically — grid cell (gy, gx) samples flat
    pixel index j = (gy·h div 8)·w + (gx·w div 9) of the quadratic
    closed form (seed·31 + j²) mod 256; bit gy·8+gx set iff
    left < right; packed two's-complement (bit 63 = −2⁶³). Pure
    integer arithmetic — hash-exact against the real
    encode→decode→hash pipeline."""
    return (
        "d AS (SELECT doc_id, doc_id % 25 AS seed, "
        "CAST((doc_id % 25) % 5 + 16 AS BIGINT) AS w, "
        "CAST((doc_id % 25) % 3 + 12 AS BIGINT) AS h FROM documents), "
        "g AS (SELECT doc_id, seed, w, h, CAST(t.range AS BIGINT) AS b, "
        "CAST(t.range AS BIGINT) // 8 AS gy, "
        "CAST(t.range AS BIGINT) % 8 AS gx FROM d CROSS JOIN range(64) t), "
        "cells AS (SELECT doc_id, b, "
        "((gy * h) // 8) * w + ((gx * w) // 9) AS j1, "
        "((gy * h) // 8) * w + (((gx + 1) * w) // 9) AS j2, "
        "seed FROM g), "
        "bits AS (SELECT doc_id, b, "
        "(seed * 31 + j1 * j1) % 256 AS g1, "
        "(seed * 31 + j2 * j2) % 256 AS g2 FROM cells), "
        "sig AS (SELECT doc_id, CAST(SUM(CASE WHEN g1 < g2 THEN "
        "(CASE WHEN b = 63 THEN (-9223372036854775807 - 1) "
        "ELSE (CAST(1 AS BIGINT) << b) END) ELSE 0 END) AS BIGINT) "
        "AS dhash FROM bits GROUP BY doc_id)"
    )


def _pca_sql(iters: int = 12, d: int = 64, cd: int = 9, ss: int = 12, rd: int = 6) -> str:
    """PCA power-iteration oracle, one exactness tool per phase (the
    operators.pca split): means and covariance entries are pround'd
    products under order-independent DECIMAL sums; the bounded
    iteration is sequential LEFT FOLDS of pround'd terms in ascending
    index order (list_reduce — the _DOT portability pattern), exactly
    the nested-HOF expression the Spark operator compiles. The
    covariance list and every iterate live in MATERIALIZED one-row
    CTEs (DuckDB re-inlines multiply-referenced CTEs — the k-core
    gotcha); sign convention and Rayleigh eigenvalue replayed
    identically."""

    def ds(expr):
        return f"CAST(SUM(CAST({expr} AS DECIMAL(38,{ss}))) AS DOUBLE)"

    def fold(terms):
        return (
            f"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), {terms}), "
            "(acc, e) -> acc + e)"
        )

    n = "(SELECT count(*) FROM embeddings)"
    x0v = _pr(f"1.0 / sqrt({d}.0)", cd)
    mean_expr = _pr(ds(_pr("x", cd)) + f" / {n}", cd)
    prod_expr = _pr(ds(_pr("a.v * b.v", cd)) + f" / {n}", cd)
    mv_terms = (
        f"list_transform(range(0, {d}), j -> "
        + _pr(f"ca[i.range * {d} + j + 1] * xa[j + 1]", cd)
        + ")"
    )
    matvec = (
        f"list_transform(range(0, {d}), i -> " + fold(mv_terms) + ")"
    ).replace("i.range", "i")
    sq_terms = "list_transform(ya, v -> " + _pr("v * v", cd) + ")"
    ctes = [
        f"comp AS (SELECT vec_id, CAST(t.range AS BIGINT) AS i, "
        f"CAST(embedding[t.range + 1] AS DOUBLE) AS x "
        f"FROM embeddings CROSS JOIN range({d}) t)",
        f"mean AS (SELECT i, {mean_expr} AS m FROM comp GROUP BY i)",
        "cen AS (SELECT c.vec_id, c.i, " + _pr("c.x - mean.m", cd)
        + " AS v FROM comp c JOIN mean ON mean.i = c.i)",
        f"cov AS MATERIALIZED (SELECT a.i AS i, b.i AS j, {prod_expr} AS c "
        "FROM cen a JOIN cen b ON a.vec_id = b.vec_id GROUP BY a.i, b.i)",
        "covl AS MATERIALIZED (SELECT list(c ORDER BY i, j) AS ca FROM cov)",
        f"x0 AS (SELECT list_transform(range(0, {d}), i -> {x0v}) AS xa)",
    ]
    for t in range(1, iters + 1):
        ctes.append(
            f"y{t} AS MATERIALIZED (SELECT {matvec} AS ya "
            f"FROM covl, x{t - 1})"
        )
        ctes.append(
            f"n{t} AS MATERIALIZED (SELECT ya, sqrt({fold(sq_terms)}) "
            f"AS nrm FROM y{t})"
        )
        ctes.append(
            f"x{t} AS MATERIALIZED (SELECT list_transform(ya, v -> "
            + _pr("v / nrm", cd)
            + f") AS xa FROM n{t})"
        )
    ctes.append(
        f"yf AS MATERIALIZED (SELECT {matvec} AS ya FROM covl, x{iters})"
    )
    lam_terms = (
        f"list_transform(range(1, {d} + 1), j -> "
        + _pr("xa[j] * ya[j]", cd)
        + ")"
    )
    ctes.append(
        "lam AS MATERIALIZED (SELECT "
        + _pr(fold(lam_terms), rd)
        + f" AS l FROM x{iters}, yf)"
    )
    ctes.append(
        f"sgn AS (SELECT CASE WHEN list_filter(xa, v -> v <> 0)[1] < 0 "
        f"THEN -1.0 ELSE 1.0 END AS s FROM x{iters})"
    )
    comp_out = _pr("xa[CAST(t.range AS BIGINT) + 1] * sgn.s", cd)
    return (
        "WITH " + ", ".join(ctes)
        + f" SELECT CAST(t.range AS BIGINT) AS pos, {comp_out} AS component, "
        f"lam.l AS eigenvalue FROM x{iters} CROSS JOIN sgn CROSS JOIN lam "
        f"CROSS JOIN range({d}) t"
    )


def _image_phash_sql() -> str:
    """The multimodal_image_phash / _phash_dedup oracle core:
    re-derive every pHash bit arithmetically from the closed-form
    pixel stream. Per-pixel greys (the quadratic closed form) box-
    floor-mean into the 16×16 grid (pixel (y, x) → cell
    (y·16 div h, x·16 div w); cell grey = sum div count; empty cells —
    h < 16 here — are 0 via the full cell spine); the two separable
    DCT passes join against a VALUES table of the SAME hardcoded
    integer basis the Spark operator uses (imported here, so the two
    sides can never drift); the 64 AC coefficients (row-major
    k = u·8+v in 1..64 — k = 0 is the excluded DC term) threshold
    against the exact middle-pair sum (2·c > m32 + m33, order stats
    via row_number); packed two's-complement (bit 63 = −2⁶³). Pure
    integer arithmetic — hash-exact against the real
    encode→decode→box-mean→DCT pipeline."""
    from margaret_spark.operators.imagehash import _PHASH_B16

    b16_rows = ", ".join(
        f"({u}, {x}, {_PHASH_B16[u][x]})" for u in range(9) for x in range(16)
    )
    return (
        "d AS (SELECT doc_id, doc_id % 25 AS seed, "
        "CAST((doc_id % 25) % 5 + 16 AS BIGINT) AS w, "
        "CAST((doc_id % 25) % 3 + 12 AS BIGINT) AS h FROM documents), "
        "px AS (SELECT doc_id, "
        "((CAST(t.range AS BIGINT) // w) * 16) // h AS gy, "
        "((CAST(t.range AS BIGINT) % w) * 16) // w AS gx, "
        "(seed * 31 + CAST(t.range AS BIGINT) * CAST(t.range AS BIGINT)) "
        "% 256 AS g FROM d CROSS JOIN range(320) t "
        "WHERE t.range < w * h), "
        "cm AS (SELECT doc_id, gy, gx, SUM(g) // COUNT(*) AS g "
        "FROM px GROUP BY doc_id, gy, gx), "
        "spine AS (SELECT doc_id, CAST(t.range AS BIGINT) // 16 AS gy, "
        "CAST(t.range AS BIGINT) % 16 AS gx FROM d CROSS JOIN range(256) t), "
        "grid AS (SELECT spine.doc_id, spine.gy, spine.gx, "
        "COALESCE(cm.g, 0) AS g FROM spine LEFT JOIN cm "
        "ON cm.doc_id = spine.doc_id AND cm.gy = spine.gy "
        "AND cm.gx = spine.gx), "
        f"b16 AS (SELECT * FROM (VALUES {b16_rows}) AS t(u, x, val)), "
        # column pass first (contract over gy — u is the VERTICAL
        # frequency, matching the operator's B·G·B[:8]ᵀ), then the row
        # pass over gx with v < 8
        "tmat AS (SELECT grid.doc_id, b16.u, grid.gx AS xx, "
        "SUM(grid.g * b16.val) AS t FROM grid JOIN b16 ON b16.x = grid.gy "
        "GROUP BY grid.doc_id, b16.u, grid.gx), "
        "co AS (SELECT tmat.doc_id, tmat.u * 8 + bv.u AS k, "
        "SUM(tmat.t * bv.val) AS c FROM tmat JOIN b16 bv ON bv.x = tmat.xx "
        "AND bv.u < 8 GROUP BY tmat.doc_id, tmat.u, bv.u), "
        "ac AS (SELECT doc_id, k - 1 AS j, c FROM co "
        "WHERE k BETWEEN 1 AND 64), "
        "med AS (SELECT doc_id, SUM(CASE WHEN rn IN (32, 33) THEN c "
        "ELSE 0 END) AS msum FROM (SELECT doc_id, c, ROW_NUMBER() OVER "
        "(PARTITION BY doc_id ORDER BY c) AS rn FROM ac) GROUP BY doc_id), "
        "sig AS (SELECT ac.doc_id, CAST(SUM(CASE WHEN 2 * ac.c > med.msum "
        "THEN (CASE WHEN ac.j = 63 THEN (-9223372036854775807 - 1) "
        "ELSE (CAST(1 AS BIGINT) << ac.j) END) ELSE 0 END) AS BIGINT) "
        "AS phash FROM ac JOIN med ON med.doc_id = ac.doc_id "
        "GROUP BY ac.doc_id)"
    )


def _audio_afp_sql() -> str:
    """The multimodal_audio_fp / _audio_dedup oracle core: re-derive
    every energy-gradient bit arithmetically — sample j of doc's clip
    is ((seed·997 + j²·29 + j·17) mod 4096) − 2048 + (32·v iff
    j mod 5 = 0); its
    frame is the exact bucket inverse (65·(j+1) − 1) div n of the
    floor-div boundaries f·n div 65 (identity verified for all
    n ≤ 299); frame energy = Σ|s|; bit f set iff e[f] < e[f+1]
    (empty frames — n < 65 — carry energy 0); packed two's-complement
    (bit 63 = −2⁶³). Pure integer arithmetic — hash-exact against the
    real encode→decode→fingerprint pipeline."""
    return (
        "d AS (SELECT doc_id, doc_id % 25 AS seed, "
        "(doc_id // 25) % 3 AS v, "
        "CAST((doc_id % 25) % 5 * 16 + 64 AS BIGINT) AS n FROM documents), "
        "sm AS (SELECT d.doc_id, "
        "abs(((d.seed * 997 + i.range * i.range * 29 + i.range * 17) "
        "% 4096) - 2048 "
        "+ (CASE WHEN i.range % 5 = 0 THEN d.v * 32 ELSE 0 END)) AS m, "
        "(65 * (i.range + 1) - 1) // d.n AS f "
        "FROM d CROSS JOIN range(128) i WHERE i.range < d.n), "
        "en AS (SELECT doc_id, f, CAST(SUM(m) AS BIGINT) AS e "
        "FROM sm GROUP BY doc_id, f), "
        "fr AS (SELECT doc_id, CAST(t.range AS BIGINT) AS f "
        "FROM d CROSS JOIN range(65) t), "
        "ee AS (SELECT fr.doc_id, fr.f, COALESCE(en.e, 0) AS e FROM fr "
        "LEFT JOIN en ON en.doc_id = fr.doc_id AND en.f = fr.f), "
        "sig AS (SELECT a.doc_id, CAST(SUM(CASE WHEN a.e < c.e THEN "
        "(CASE WHEN a.f = 63 THEN (-9223372036854775807 - 1) "
        "ELSE (CAST(1 AS BIGINT) << a.f) END) ELSE 0 END) AS BIGINT) "
        "AS afp FROM ee a JOIN ee c ON c.doc_id = a.doc_id "
        "AND c.f = a.f + 1 WHERE a.f < 64 GROUP BY a.doc_id)"
    )


def _oracle_sql_base() -> dict[str, str]:
    from margaret_spark.operators.bpe import PRETOKEN_RE as _BPE_PAT

    return {
        "log_scan": (
            "SELECT event_id AS seq, event_type, value FROM events"
        ),
        "log_get": (
            "SELECT event_id AS seq, user_id, event_type, value "
            "FROM events WHERE event_id = 999"
        ),
        "log_seq": "SELECT COALESCE(MAX(event_id), -1) AS seq FROM events",
        "log_range": (
            "SELECT event_id AS seq, value FROM events "
            "WHERE event_id > 99 AND event_id <= 299"
        ),
        "log_limit": (
            "SELECT event_id AS seq, event_type FROM events "
            "ORDER BY event_id LIMIT 100"
        ),
        "log_reverse": (
            "SELECT event_id AS seq, event_type, value FROM events "
            "ORDER BY event_id DESC LIMIT 100"
        ),
        "log_append_seq": (
            "SELECT CAST(row_number() OVER (ORDER BY doc_id) - 1 AS BIGINT) AS seq, "
            "doc_id FROM documents"
        ),
        "log_nulled_overlay": (
            "SELECT e.event_id AS seq, "
            "CASE WHEN p.op = 'null' THEN NULL ELSE e.value END AS value, "
            "COALESCE(p.op = 'null', FALSE) AS nulled "
            "FROM events e LEFT JOIN "
            "(SELECT event_id, 'null' AS op FROM events WHERE event_type = 'error') p "
            "ON e.event_id = p.event_id"
        ),
        "log_replace_overlay": (
            "SELECT e.event_id AS seq, "
            "COALESCE(p.pv, e.value) AS value, "
            "p.pv IS NOT NULL AS replaced "
            "FROM events e LEFT JOIN "
            "(SELECT event_id, value * 2 AS pv FROM events "
            "WHERE event_type = 'purchase') p "
            "ON e.event_id = p.event_id"
        ),
        # the as-of view pins the pre-mutation state: first 500 events,
        # nothing nulled (the null landed after the snapshot)
        "log_snapshot_read": (
            "SELECT event_id AS seq, value AS v, FALSE AS nulled "
            "FROM events WHERE event_id < 500"
        ),
        "log_check_consistency": (
            "SELECT count(*) AS n, count(DISTINCT event_id) AS n_distinct, "
            "min(event_id) AS min_seq, max(event_id) AS max_seq, "
            "(count(*) = count(DISTINCT event_id) AND min(event_id) = 0 "
            "AND max(event_id) = count(*) - 1) AS dense FROM events"
        ),
        "mlog_list": "SELECT DISTINCT o_custkey AS addr FROM orders",
        "mlog_ranks": (
            "SELECT o_custkey AS addr, o_orderkey AS main_seq, "
            "CAST(row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderkey) - 1 AS BIGINT) AS rank "
            "FROM orders QUALIFY o_custkey <= 20"
        ),
        "mlog_sublog_get": (
            "SELECT addr, rank, main_seq FROM ("
            "SELECT o_custkey AS addr, o_orderkey AS main_seq, "
            "CAST(row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderkey) - 1 AS BIGINT) AS rank "
            "FROM orders) WHERE addr = 7 AND rank = 2"
        ),
        "mlog_sublog_query": (
            "SELECT rank, main_seq FROM ("
            "SELECT o_custkey AS addr, o_orderkey AS main_seq, "
            "CAST(row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderkey) - 1 AS BIGINT) AS rank "
            "FROM orders) WHERE addr = 7 AND rank >= 1 AND rank <= 4"
        ),
        "mlog_cardinalities": (
            "SELECT o_custkey AS addr, count(*) - 1 AS sublog_seq "
            "FROM orders GROUP BY o_custkey"
        ),
        "mlog_has": (
            "SELECT t.addr, count(o.o_orderkey) > 0 AS has "
            "FROM (VALUES (7), (999999999)) t(addr) "
            "LEFT JOIN orders o ON o.o_custkey = t.addr GROUP BY t.addr"
        ),
        "mlog_delete": (
            "SELECT DISTINCT o_custkey AS addr FROM orders "
            "WHERE o_custkey NOT IN (1, 2, 3)"
        ),
        "mlog_set_ops": (
            "SELECT addr FROM ("
            "SELECT DISTINCT o_custkey AS addr FROM orders "
            "INTERSECT "
            "SELECT c_custkey AS addr FROM customer WHERE c_acctbal > 5000"
            ") EXCEPT ALL (SELECT addr FROM (VALUES (7), (11)) t(addr))"
        ),
        "kvidx_latest": (
            "SELECT user_id AS addr, event_id AS upd_seq, value, event_type "
            "FROM events QUALIFY row_number() OVER "
            "(PARTITION BY user_id ORDER BY event_id DESC) = 1"
        ),
        "kvidx_point": (
            "SELECT user_id AS addr, event_id AS upd_seq, value, event_type "
            "FROM events WHERE user_id = 7 QUALIFY row_number() OVER "
            "(PARTITION BY user_id ORDER BY event_id DESC) = 1"
        ),
        "sink_fanout": (
            "SELECT event_type AS addr, count(*) AS card, "
            "min(event_id) AS min_seq, max(event_id) AS max_seq "
            "FROM events GROUP BY event_type"
        ),
        "sink_fanout_multi": (
            "SELECT addr, count(*) AS card FROM ("
            "SELECT event_type AS addr FROM events "
            "UNION ALL "
            "SELECT 'u' || CAST(user_id % 10 AS VARCHAR) AS addr FROM events"
            ") GROUP BY addr"
        ),
        "tpch_q1": (
            "SELECT l_returnflag, l_linestatus, "
            "CAST(SUM(CAST(l_quantity AS DECIMAL(38,4))) AS DOUBLE) AS sum_qty, "
            "CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,4))) AS DOUBLE) AS sum_base_price, "
            "CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS sum_disc_price, "
            "CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(38,6))) AS DOUBLE) AS sum_charge, "
            + _pr("CAST(SUM(CAST(l_quantity AS DECIMAL(38,4))) AS DOUBLE) / COUNT(*)") + " AS avg_qty, "
            + _pr("CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,4))) AS DOUBLE) / COUNT(*)") + " AS avg_price, "
            + _pr("CAST(SUM(CAST(l_discount AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*)") + " AS avg_disc, "
            "COUNT(*) AS count_order "
            "FROM lineitem WHERE CAST(l_shipdate AS DATE) <= DATE '1998-09-02' "
            "GROUP BY l_returnflag, l_linestatus"
        ),
        "tpch_q3": (
            "SELECT l_orderkey, CAST(o_orderdate AS DATE) AS o_orderdate, o_orderpriority, "
            "CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS revenue "
            "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
            "JOIN customer ON o_custkey = c_custkey "
            "WHERE c_mktsegment = 'BUILDING' "
            "AND CAST(o_orderdate AS DATE) < DATE '1998-01-01' "
            "AND CAST(l_shipdate AS DATE) > DATE '1998-01-01' "
            "GROUP BY l_orderkey, CAST(o_orderdate AS DATE), o_orderpriority "
            "ORDER BY revenue DESC, l_orderkey ASC LIMIT 10"
        ),
        "tpch_q5": (
            "SELECT n_name, "
            "CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS revenue "
            "FROM lineitem "
            "JOIN orders ON l_orderkey = o_orderkey "
            "JOIN customer ON o_custkey = c_custkey "
            "JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey "
            "JOIN nation ON s_nationkey = n_nationkey "
            "JOIN region ON n_regionkey = r_regionkey "
            "WHERE r_name = 'ASIA' "
            "AND CAST(o_orderdate AS DATE) >= DATE '1996-01-01' "
            "AND CAST(o_orderdate AS DATE) < DATE '1997-01-01' "
            "GROUP BY n_name"
        ),
        "tpch_q6": (
            "SELECT "
            "CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(38,6))) AS DOUBLE) AS revenue, "
            "COUNT(*) AS n FROM lineitem "
            "WHERE CAST(l_shipdate AS DATE) >= DATE '1996-01-01' "
            "AND CAST(l_shipdate AS DATE) < DATE '1997-01-01' "
            "AND l_discount >= 0.05 AND l_discount <= 0.07 "
            "AND l_quantity < 24"
        ),
        "tpch_q14": (
            "SELECT "
            "CAST(SUM(CAST(CASE WHEN p_type LIKE 'PROMO%' "
            "THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END "
            "AS DECIMAL(38,6))) AS DOUBLE) AS promo_revenue, "
            "CAST(SUM(CAST(l_extendedprice * (1 - l_discount) "
            "AS DECIMAL(38,6))) AS DOUBLE) AS total_revenue "
            "FROM lineitem JOIN part ON l_partkey = p_partkey "
            "WHERE CAST(l_shipdate AS DATE) >= DATE '1996-03-01' "
            "AND CAST(l_shipdate AS DATE) < DATE '1996-04-01'"
        ),
        "tpch_q4": (
            "SELECT o_orderpriority, count(*) AS order_count FROM orders o "
            "WHERE CAST(o_orderdate AS DATE) >= DATE '1996-01-01' "
            "AND CAST(o_orderdate AS DATE) < DATE '1996-04-01' "
            "AND EXISTS (SELECT 1 FROM lineitem l "
            "WHERE l.l_orderkey = o.o_orderkey "
            "AND CAST(l.l_shipdate AS DATE) > DATE '1997-01-01') "
            "GROUP BY o_orderpriority"
        ),
        "tpch_q7": (
            "SELECT supp_nation, cust_nation, l_year, "
            "CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS revenue "
            "FROM (SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation, "
            "year(CAST(l_shipdate AS DATE)) AS l_year, l_extendedprice, l_discount "
            "FROM lineitem "
            "JOIN orders ON l_orderkey = o_orderkey "
            "JOIN customer ON o_custkey = c_custkey "
            "JOIN supplier ON l_suppkey = s_suppkey "
            "JOIN nation sn ON s_nationkey = sn.n_nationkey "
            "JOIN nation cn ON c_nationkey = cn.n_nationkey "
            "WHERE (sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2') "
            "OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1')) "
            "GROUP BY supp_nation, cust_nation, l_year"
        ),
        "tpch_q19": (
            "SELECT "
            "CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS revenue, "
            "COUNT(*) AS n "
            "FROM lineitem JOIN part ON l_partkey = p_partkey "
            "WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 "
            "AND l_quantity BETWEEN 1 AND 11) "
            "OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 30 "
            "AND l_quantity BETWEEN 10 AND 25)"
        ),
        "tpch_q17": (
            "WITH avg_qty AS (SELECT l_partkey, "
            + _pr(
                "(CAST(SUM(CAST(l_quantity AS DECIMAL(38,4))) AS DOUBLE) / COUNT(*)) * 0.2"
            )
            + " AS thresh FROM lineitem GROUP BY l_partkey) "
            "SELECT "
            "CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,4))) AS DOUBLE) AS sum_price, "
            "COUNT(*) AS n "
            "FROM lineitem JOIN avg_qty USING (l_partkey) "
            "WHERE l_quantity < thresh"
        ),
        "tpch_q2": (
            "SELECT s_acctbal, s_name, n_name, p_partkey, s_suppkey FROM ("
            "SELECT s_acctbal, s_name, n_name, p_partkey, s_suppkey, "
            "min(s_acctbal) OVER (PARTITION BY p_partkey) AS mb "
            "FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps "
            "JOIN part ON p_partkey = ps.l_partkey "
            "JOIN supplier ON s_suppkey = ps.l_suppkey "
            "JOIN nation ON s_nationkey = n_nationkey "
            "JOIN region ON n_regionkey = r_regionkey "
            "WHERE r_name = 'EUROPE' AND p_size = 15 AND p_type = 'LARGE'"
            ") WHERE s_acctbal = mb "
            "ORDER BY s_acctbal DESC, p_partkey, s_suppkey LIMIT 100"
        ),
        "tpch_q8": (
            "SELECT o_year, "
            + _pr(
                "CAST(SUM(CAST(CASE WHEN supp_nation = 'NATION_2' "
                "THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END "
                "AS DECIMAL(38,6))) AS DOUBLE) / "
                "CAST(SUM(CAST(l_extendedprice * (1 - l_discount) "
                "AS DECIMAL(38,6))) AS DOUBLE)"
            )
            + " AS mkt_share FROM ("
            "SELECT year(CAST(o_orderdate AS DATE)) AS o_year, "
            "l_extendedprice, l_discount, sn.n_name AS supp_nation "
            "FROM lineitem "
            "JOIN orders ON l_orderkey = o_orderkey "
            "JOIN customer ON o_custkey = c_custkey "
            "JOIN nation cn ON c_nationkey = cn.n_nationkey "
            "JOIN region ON cn.n_regionkey = r_regionkey "
            "JOIN supplier ON l_suppkey = s_suppkey "
            "JOIN nation sn ON s_nationkey = sn.n_nationkey "
            "JOIN part ON l_partkey = p_partkey "
            "WHERE r_name = 'ASIA' AND p_type = 'PROMO'"
            ") GROUP BY o_year"
        ),
        "tpch_q9": (
            "SELECT n_name AS nation, year(CAST(o_orderdate AS DATE)) AS o_year, "
            "CAST(SUM(CAST(l_extendedprice * (1 - l_discount) "
            "- p_retailprice * l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sum_profit "
            "FROM lineitem "
            "JOIN part ON l_partkey = p_partkey "
            "JOIN orders ON l_orderkey = o_orderkey "
            "JOIN supplier ON l_suppkey = s_suppkey "
            "JOIN nation ON s_nationkey = n_nationkey "
            "WHERE p_name LIKE '%gear%' "
            "GROUP BY n_name, year(CAST(o_orderdate AS DATE))"
        ),
        "tpch_q11": (
            "WITH base AS (SELECT l_partkey, l_extendedprice * l_quantity AS val "
            "FROM lineitem JOIN supplier ON l_suppkey = s_suppkey "
            "JOIN nation ON s_nationkey = n_nationkey WHERE n_name = 'NATION_3') "
            "SELECT l_partkey, "
            "CAST(SUM(CAST(val AS DECIMAL(38,6))) AS DOUBLE) AS value FROM base "
            "GROUP BY l_partkey "
            "HAVING CAST(SUM(CAST(val AS DECIMAL(38,6))) AS DOUBLE) > "
            "(SELECT CAST(SUM(CAST(val AS DECIMAL(38,6))) AS DOUBLE) * 0.001 FROM base)"
        ),
        "tpch_q12": (
            "SELECT l_linestatus, "
            "CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') "
            "THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count, "
            "CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') "
            "THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count "
            "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
            "WHERE CAST(l_shipdate AS DATE) >= DATE '1996-01-01' "
            "AND CAST(l_shipdate AS DATE) < DATE '1997-01-01' "
            "GROUP BY l_linestatus"
        ),
        "tpch_q13": (
            "SELECT c_count, count(*) AS custdist FROM ("
            "SELECT c_custkey, count(o_orderkey) AS c_count "
            "FROM customer LEFT JOIN orders ON c_custkey = o_custkey "
            "AND o_orderpriority <> '4-NOT SPECIFIED' "
            "GROUP BY c_custkey) GROUP BY c_count"
        ),
        "tpch_q15": (
            "WITH revenue AS (SELECT l_suppkey, "
            "CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) "
            "AS total_revenue FROM lineitem "
            "WHERE CAST(l_shipdate AS DATE) >= DATE '1996-01-01' "
            "AND CAST(l_shipdate AS DATE) < DATE '1996-07-01' "
            "GROUP BY l_suppkey) "
            "SELECT s_suppkey, s_name, total_revenue "
            "FROM revenue JOIN supplier ON l_suppkey = s_suppkey "
            "WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)"
        ),
        "tpch_q16": (
            "SELECT p_brand, p_type, p_size, "
            "count(DISTINCT l_suppkey) AS supplier_cnt "
            "FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps "
            "JOIN part ON p_partkey = ps.l_partkey "
            "WHERE p_brand <> 'Brand#1' AND p_size IN (1, 5, 10, 15, 20, 25) "
            "AND l_suppkey NOT IN "
            "(SELECT s_suppkey FROM supplier WHERE s_acctbal < 1000) "
            "GROUP BY p_brand, p_type, p_size"
        ),
        "tpch_q20": (
            "WITH li96 AS (SELECT l_partkey, l_suppkey, l_quantity FROM lineitem "
            "WHERE CAST(l_shipdate AS DATE) >= DATE '1996-01-01' "
            "AND CAST(l_shipdate AS DATE) < DATE '1997-01-01' "
            "AND l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'small%')), "
            "per_ps AS (SELECT l_partkey, l_suppkey, "
            "CAST(SUM(CAST(l_quantity AS DECIMAL(38,4))) AS DOUBLE) AS qty "
            "FROM li96 GROUP BY l_partkey, l_suppkey), "
            "per_part AS (SELECT l_partkey, "
            "CAST(SUM(CAST(l_quantity AS DECIMAL(38,4))) AS DOUBLE) * 0.3 AS thresh "
            "FROM li96 GROUP BY l_partkey) "
            "SELECT s_suppkey, s_name FROM supplier "
            "JOIN nation ON s_nationkey = n_nationkey "
            "WHERE n_name = 'NATION_2' AND s_suppkey IN ("
            "SELECT DISTINCT per_ps.l_suppkey FROM per_ps "
            "JOIN per_part ON per_ps.l_partkey = per_part.l_partkey "
            "WHERE qty > thresh)"
        ),
        "tpch_q21": (
            "SELECT s_name, count(*) AS numwait "
            "FROM lineitem l1 "
            "JOIN supplier ON l1.l_suppkey = s_suppkey "
            "JOIN nation ON s_nationkey = n_nationkey "
            "WHERE l1.l_returnflag = 'R' AND n_name = 'NATION_1' "
            "AND l1.l_orderkey IN "
            "(SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F') "
            "AND EXISTS (SELECT 1 FROM lineitem l2 "
            "WHERE l2.l_orderkey = l1.l_orderkey "
            "AND l2.l_suppkey <> l1.l_suppkey) "
            "AND NOT EXISTS (SELECT 1 FROM lineitem l3 "
            "WHERE l3.l_orderkey = l1.l_orderkey "
            "AND l3.l_suppkey <> l1.l_suppkey AND l3.l_returnflag = 'R') "
            "GROUP BY s_name "
            "ORDER BY numwait DESC, s_name ASC LIMIT 100"
        ),
        "customers_without_orders": (
            "SELECT c_mktsegment, count(*) AS n_customers FROM customer c "
            "WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey "
            "AND CAST(o.o_orderdate AS DATE) >= DATE '1997-07-01') "
            "GROUP BY c_mktsegment"
        ),
        "orders_topn_per_cust": (
            "SELECT o_custkey, o_orderkey, o_totalprice, rn FROM ("
            "SELECT o_custkey, o_orderkey, o_totalprice, "
            "CAST(row_number() OVER (PARTITION BY o_custkey "
            "ORDER BY o_totalprice DESC, o_orderkey ASC) AS INT) AS rn "
            "FROM orders WHERE o_custkey <= 50) WHERE rn <= 3"
        ),
        "events_daily": (
            "SELECT CAST(ts AS DATE) AS day, event_type, count(*) AS n, "
            "CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS sum_value, "
            + _pr("CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*)") + " AS avg_value "
            "FROM events GROUP BY CAST(ts AS DATE), event_type"
        ),
        "events_sessions": (
            # both sides work on integer microseconds (Spark:
            # unix_micros, DuckDB: epoch_us)
            "SELECT user_id, session_idx, count(*) AS n_events, "
            "min(tsu) AS start_ts, max(tsu) AS end_ts, "
            "CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS sum_value "
            "FROM ("
            "SELECT user_id, tsu, value, "
            "CAST(SUM(CASE WHEN prev_ts IS NULL "
            "OR tsu - prev_ts > 1800000000 THEN 1 ELSE 0 END) "
            "OVER (PARTITION BY user_id ORDER BY tsu, event_id "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) "
            "AS session_idx "
            "FROM (SELECT user_id, event_id, epoch_us(ts) AS tsu, value, "
            "lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS prev_ts "
            "FROM events)"
            ") GROUP BY user_id, session_idx"
        ),
        "events_asof": (
            # native ASOF LEFT JOIN: for each purchase, the most recent
            # at-or-before click of the same user; gaps in integer µs
            "WITH p AS (SELECT user_id, epoch_us(ts) AS tsu FROM events "
            "WHERE event_type = 'purchase'), "
            "c AS (SELECT user_id, epoch_us(ts) AS tsu FROM events "
            "WHERE event_type = 'click') "
            "SELECT p.user_id AS user_id, count(*) AS n_purchases, "
            "count(c.tsu) AS n_matched, "
            "CAST(sum(p.tsu - c.tsu) AS BIGINT) AS sum_gap_us "
            "FROM p ASOF LEFT JOIN c "
            "ON p.user_id = c.user_id AND p.tsu >= c.tsu "
            "GROUP BY p.user_id"
        ),
        "events_range_join": (
            "SELECT e.user_id AS user_id, count(*) AS n_pairs, "
            "count(DISTINCT e.event_id) AS n_errors, "
            "CAST(SUM(CAST(c.value AS DECIMAL(38,4))) AS DOUBLE) AS click_value "
            "FROM (SELECT user_id, event_id, epoch_us(ts) AS tsu "
            "FROM events WHERE event_type = 'error') e "
            "JOIN (SELECT user_id, epoch_us(ts) AS tsu, value "
            "FROM events WHERE event_type = 'click') c "
            "ON e.user_id = c.user_id AND c.tsu > e.tsu "
            "AND c.tsu <= e.tsu + 86400000000 "
            "GROUP BY e.user_id"
        ),
        "events_rollup": (
            "SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n, "
            "CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS sum_value "
            "FROM events GROUP BY ROLLUP(event_type, CAST(ts AS DATE))"
        ),
        "tpch_q10": (
            "SELECT c_custkey, c_name, c_acctbal, n_name, "
            "CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS revenue "
            "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
            "JOIN customer ON o_custkey = c_custkey "
            "JOIN nation ON c_nationkey = n_nationkey "
            "WHERE l_returnflag = 'R' "
            "AND CAST(o_orderdate AS DATE) >= DATE '1996-01-01' "
            "AND CAST(o_orderdate AS DATE) < DATE '1996-04-01' "
            "GROUP BY c_custkey, c_name, c_acctbal, n_name "
            "ORDER BY revenue DESC, c_custkey ASC LIMIT 20"
        ),
        "tpch_q18": (
            "SELECT c_name, c_custkey, o_orderkey, "
            "CAST(o_orderdate AS DATE) AS o_orderdate, o_totalprice, total_qty "
            "FROM orders "
            "JOIN (SELECT l_orderkey, "
            "CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS total_qty "
            "FROM lineitem GROUP BY l_orderkey "
            "HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) > 200) big "
            "ON o_orderkey = big.l_orderkey "
            "JOIN customer ON o_custkey = c_custkey "
            "ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 100"
        ),
        "tpch_q22": (
            "SELECT CAST(c_nationkey AS BIGINT) AS nationkey, "
            "count(*) AS numcust, "
            "CAST(SUM(CAST(c_acctbal AS DECIMAL(38,6))) AS DOUBLE) AS totacctbal "
            "FROM customer "
            "WHERE c_acctbal > ("
            "SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(38,6))) AS DOUBLE) / count(*) "
            "FROM customer WHERE c_acctbal > 0) "
            "AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey "
            "AND CAST(o_orderdate AS DATE) >= DATE '1999-01-01') "
            "GROUP BY CAST(c_nationkey AS BIGINT)"
        ),
        "events_window_funcs": (
            "SELECT user_id, event_id, value, "
            "value - lag(value) OVER w AS delta_prev, "
            + _pr(
                "CAST(SUM(CAST(value AS DECIMAL(38,6))) OVER w3 AS DOUBLE)"
                " / COUNT(*) OVER w3"
            )
            + " AS move_avg3, "
            "CAST(SUM(CAST(value AS DECIMAL(38,6))) OVER wrun AS DOUBLE) AS running_sum "
            "FROM events WHERE user_id % 53 = 7 "
            "WINDOW w AS (PARTITION BY user_id ORDER BY event_id), "
            "w3 AS (PARTITION BY user_id ORDER BY event_id "
            "ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), "
            "wrun AS (PARTITION BY user_id ORDER BY event_id "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
        ),
        "events_cube": (
            "SELECT event_type, CAST(user_id % 10 AS BIGINT) AS user_shard, "
            "count(*) AS n FROM events "
            "GROUP BY CUBE(event_type, CAST(user_id % 10 AS BIGINT))"
        ),
        "events_quantiles": (
            "SELECT event_type, "
            + _pr("quantile_cont(value, 0.5)") + " AS p50, "
            + _pr("quantile_cont(value, 0.95)") + " AS p95 "
            "FROM events GROUP BY event_type"
        ),
        "events_distinct_users": (
            "SELECT event_type, count(DISTINCT user_id) AS distinct_count "
            "FROM events GROUP BY event_type"
        ),
        "stream_events_daily": (
            "SELECT CAST(ts AS DATE) AS day, event_type, count(*) AS n "
            "FROM events GROUP BY CAST(ts AS DATE), event_type"
        ),
        # stacked per-user window minima: stage k binds to the
        # earliest qualifying event strictly after stage k-1's
        "events_funnel": (
            "WITH e AS (SELECT user_id, epoch_us(ts) AS tsu, event_type "
            "FROM events), "
            "a AS (SELECT *, min(CASE WHEN event_type = 'view' THEN tsu END) "
            "OVER (PARTITION BY user_id) AS t0 FROM e), "
            "b AS (SELECT *, min(CASE WHEN event_type = 'click' AND tsu > t0 "
            "THEN tsu END) OVER (PARTITION BY user_id) AS t1 FROM a), "
            "c AS (SELECT *, min(CASE WHEN event_type = 'purchase' AND tsu > t1 "
            "THEN tsu END) OVER (PARTITION BY user_id) AS t2 FROM b) "
            "SELECT user_id, CAST(CASE WHEN min(t2) IS NOT NULL THEN 3 "
            "WHEN min(t1) IS NOT NULL THEN 2 "
            "WHEN min(t0) IS NOT NULL THEN 1 ELSE 0 END AS INT) AS stage, "
            "min(t0) AS view_ts, min(t1) AS click_ts, min(t2) AS purchase_ts "
            "FROM c GROUP BY user_id"
        ),
        "stream_events_sessions": (
            # gap-based sessionization; >= breaks a session, matching
            # session_window's strict before-last+gap containment;
            # session_end = last event + gap
            "SELECT user_id, min(tsu) AS start_us, "
            "max(tsu) + 1800000000 AS end_us, count(*) AS n_events "
            "FROM ("
            "SELECT user_id, tsu, "
            "SUM(CASE WHEN prev IS NULL OR tsu - prev >= 1800000000 "
            "THEN 1 ELSE 0 END) OVER (PARTITION BY user_id "
            "ORDER BY tsu, event_id ROWS UNBOUNDED PRECEDING) AS sid "
            "FROM (SELECT user_id, event_id, epoch_us(ts) AS tsu, "
            "lag(epoch_us(ts)) OVER (PARTITION BY user_id "
            "ORDER BY epoch_us(ts), event_id) AS prev FROM events)"
            ") GROUP BY user_id, sid"
        ),
        "events_anomaly": (
            "WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day, "
            "count(*) AS n FROM events GROUP BY event_type, CAST(ts AS DATE)), "
            "t AS (SELECT event_type, day, n, "
            "count(*) OVER w AS c, "
            "CAST(sum(n) OVER w AS DOUBLE) / count(*) OVER w AS m, "
            "CAST(sum(n * n) OVER w AS DOUBLE) / count(*) OVER w AS m2 "
            "FROM daily WINDOW w AS (PARTITION BY event_type ORDER BY day "
            "ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)) "
            "SELECT event_type, day, n, "
            "CASE WHEN c >= 3 THEN " + _pr("m") + " END AS trail_mean, "
            "CASE WHEN c >= 3 THEN "
            + _pr("sqrt(greatest(m2 - m * m, 0.0))")
            + " END AS trail_sigma, "
            "COALESCE(CASE WHEN c >= 3 THEN "
            "CAST(n AS DOUBLE) > m + 2.0 * sqrt(greatest(m2 - m * m, 0.0)) "
            "END, FALSE) AS is_anomaly FROM t"
        ),
        "orders_constraints": (
            "WITH t AS (SELECT count(*) AS total FROM orders) "
            "SELECT rule, col AS \"column\", violations, total, "
            "violations = 0 AS ok FROM ("
            "SELECT 'not_null' AS rule, 'o_custkey' AS col, "
            "CAST((SELECT count(*) FROM orders WHERE o_custkey IS NULL) AS BIGINT) "
            "AS violations, total FROM t "
            "UNION ALL SELECT 'unique', 'o_orderkey', "
            "CAST((SELECT count(o_orderkey) - count(DISTINCT o_orderkey) + "
            "greatest(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) - 1, 0) "
            "FROM orders) AS BIGINT), total FROM t "
            "UNION ALL SELECT 'in_range', 'o_totalprice', "
            "CAST((SELECT count(*) FROM orders WHERE o_totalprice < 0.0 "
            "OR o_totalprice > 1000000000.0) AS BIGINT), total FROM t "
            "UNION ALL SELECT 'in_set', 'o_orderstatus', "
            "CAST((SELECT count(*) FROM orders WHERE o_orderstatus IS NOT NULL "
            "AND o_orderstatus NOT IN ('O','F','P')) AS BIGINT), total FROM t "
            "UNION ALL SELECT 'foreign_key', 'o_custkey', "
            "CAST((SELECT count(*) FROM orders o WHERE o.o_custkey IS NOT NULL "
            "AND o.o_custkey NOT IN (SELECT c_custkey FROM customer)) AS BIGINT), "
            "total FROM t)"
        ),
        "customers_rfm": (
            "WITH mx AS (SELECT CAST(MAX(o_orderdate) AS DATE) AS maxd FROM orders), "
            "pc AS (SELECT o_custkey, "
            "CAST(MIN(date_diff('day', CAST(o_orderdate AS DATE), maxd)) AS BIGINT) AS recency_days, "
            "count(*) AS frequency, "
            "CAST(SUM(CAST(o_totalprice AS DECIMAL(38,2))) AS DOUBLE) AS monetary "
            "FROM orders CROSS JOIN mx GROUP BY o_custkey) "
            "SELECT o_custkey AS custkey, recency_days, frequency, monetary, "
            "CASE WHEN recency_days <= 30 AND frequency >= 10 THEN 'champion' "
            "WHEN recency_days <= 30 THEN 'recent' "
            "WHEN frequency >= 10 THEN 'loyal' "
            "ELSE 'at_risk' END AS segment FROM pc"
        ),
        "events_pivot": (
            "SELECT CAST(ts AS DATE) AS day, "
            + ", ".join(
                f"CAST(sum(CASE WHEN event_type = '{c}' THEN 1 ELSE 0 END) "
                f"AS BIGINT) AS {c}"
                for c in ["click", "error", "purchase", "signup", "view"]
            )
            + " FROM events GROUP BY CAST(ts AS DATE)"
        ),
        "stream_events_enriched": (
            "SELECT CAST(c.c_nationkey AS BIGINT) AS c_nationkey, "
            "count(*) AS n_events FROM events e "
            "JOIN customer c ON e.user_id = c.c_custkey "
            "GROUP BY c.c_nationkey"
        ),
        # dense-grid resample: integer µs bucket arithmetic, per-key
        # spine via range(), exact DECIMAL sums, SQL-standard
        # last_value IGNORE NULLS forward fill
        "events_resample": (
            "WITH ev AS (SELECT event_type AS key, epoch_us(ts) AS us, value "
            "FROM events WHERE value >= 150.0), "
            "agg AS (SELECT key, "
            "CAST(floor(us / 21600000000) * 21600000000 AS BIGINT) AS b, "
            "CAST(count(*) AS BIGINT) AS n_events, "
            "CAST(sum(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS sum_value "
            "FROM ev GROUP BY 1, 2), "
            "spine AS (SELECT key, unnest(range(lo, hi + 1, 21600000000)) AS b "
            "FROM (SELECT key, min(b) AS lo, max(b) AS hi FROM agg GROUP BY key)), "
            "dense AS (SELECT s.key, s.b, COALESCE(a.n_events, 0) AS n_events, "
            "a.sum_value FROM spine s LEFT JOIN agg a ON s.key = a.key AND s.b = a.b) "
            "SELECT key AS event_type, make_timestamp(b) AS bucket_start, "
            "n_events, sum_value, "
            "last_value(sum_value IGNORE NULLS) OVER (PARTITION BY key "
            "ORDER BY b ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) "
            "AS sum_value_ffill FROM dense"
        ),
        # heavy-hitter diagnostic: counts are exact integers, shares
        # are double(n)/double(total) — identical IEEE trees both
        # engines; ties rank by key so top-20 is deterministic
        "events_skew_report": (
            "SELECT user_id, n, "
            + _pr("CAST(n AS DOUBLE) / (SELECT CAST(count(*) AS DOUBLE) FROM events)")
            + " AS share, rank FROM ("
            "SELECT user_id, CAST(count(*) AS BIGINT) AS n, "
            "CAST(row_number() OVER (ORDER BY count(*) DESC, user_id ASC) AS INT) "
            "AS rank FROM events GROUP BY user_id) WHERE rank <= 20"
        ),
        "events_json": (
            "SELECT event_type, "
            "CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k, "
            "COUNT(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS n_with_k "
            "FROM events GROUP BY event_type"
        ),
        "dedup_exact": (
            "SELECT MIN(doc_id) AS keep_id, COUNT(*) AS dup_count "
            "FROM documents GROUP BY text"
        ),
        "dedup_jaccard": (
            f"WITH {_CAPPED_SHINGLE_CTES}, "
            "sz AS (SELECT doc_id, count(*) AS n FROM s GROUP BY doc_id), "
            "inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS c "
            "FROM s a JOIN s b ON a.sh = b.sh AND a.doc_id < b.doc_id "
            "GROUP BY a.doc_id, b.doc_id) "
            "SELECT id_a, id_b, " + _pr("c / (x.n + y.n - c)") + " AS jaccard "
            "FROM inter JOIN sz x ON x.doc_id = id_a JOIN sz y ON y.doc_id = id_b "
            "WHERE " + _pr("c / (x.n + y.n - c)") + " >= 0.2"
        ),
        # containment-dup pairs: same capped universe and candidate
        # set as dedup_jaccard, scored by the overlap coefficient
        "dedup_overlap": (
            f"WITH {_CAPPED_SHINGLE_CTES}, "
            "sz AS (SELECT doc_id, count(*) AS n FROM s GROUP BY doc_id), "
            "inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS c "
            "FROM s a JOIN s b ON a.sh = b.sh AND a.doc_id < b.doc_id "
            "GROUP BY a.doc_id, b.doc_id) "
            "SELECT id_a, id_b, " + _pr("c / least(x.n, y.n)") + " AS overlap "
            "FROM inter JOIN sz x ON x.doc_id = id_a JOIN sz y ON y.doc_id = id_b "
            "WHERE " + _pr("c / least(x.n, y.n)") + " >= 0.3"
        ),
        # cross-corpus near-dup join: SAME capped shingle universe
        # (the cap resolves over the combined corpora = documents),
        # split into the even/odd halves after the stop filter
        "dedup_cross_corpus": (
            f"WITH {_CAPPED_SHINGLE_CTES}, "
            "l AS (SELECT * FROM s WHERE doc_id % 2 = 0), "
            "r AS (SELECT * FROM s WHERE doc_id % 2 = 1), "
            "szl AS (SELECT doc_id, count(*) AS n FROM l GROUP BY doc_id), "
            "szr AS (SELECT doc_id, count(*) AS n FROM r GROUP BY doc_id), "
            "inter AS (SELECT l.doc_id AS left_id, r.doc_id AS right_id, "
            "count(*) AS c FROM l JOIN r ON l.sh = r.sh GROUP BY 1, 2) "
            "SELECT left_id, right_id, " + _pr("c / (x.n + y.n - c)")
            + " AS jaccard FROM inter "
            "JOIN szl x ON x.doc_id = left_id JOIN szr y ON y.doc_id = right_id "
            "WHERE " + _pr("c / (x.n + y.n - c)") + " >= 0.2"
        ),
        # suffix-array-bar repeat enumeration: the oracle is the pure
        # DEFINITION — enumerate every substring of length in
        # [5, 127] (the operator's 2^cap_log2 - 1 cap, r11 ADVICE:
        # both engines share one upper bound), count occurrences,
        # keep counts >= 2, test
        # right-maximality (no single-token extension with the same
        # count) and left-maximality (an occurrence at doc start, or
        # two occurrences with different preceding tokens), top-20 by
        # (length desc, text asc). Spark builds the same set through
        # the prefix-doubling suffix order instead.
        "dedup_lsh_plan": _lsh_plan_sql(
            num_hashes=128, threshold=0.8, steps=200
        ),
        "dedup_repeated_substrings": (
            r"WITH tok AS (SELECT doc_id, "
            r"string_split_regex(trim(text), '\s+') AS ts FROM documents "
            r"WHERE text IS NOT NULL AND trim(text) <> ''), "
            "sub AS (SELECT t.doc_id, p.pos, l.l, "
            "t.ts[p.pos : p.pos + l.l - 1] AS w, "
            "CASE WHEN p.pos = 1 THEN NULL ELSE t.ts[p.pos - 1] END AS prev "
            "FROM tok t, "
            "LATERAL (SELECT unnest(range(1, len(t.ts) + 1)) AS pos) p, "
            "LATERAL (SELECT unnest(range(5, 128)) AS l) l "
            "WHERE p.pos + l.l - 1 <= len(t.ts)), "
            "grp AS (SELECT w, l, CAST(count(*) AS BIGINT) AS c, "
            "CAST(count(DISTINCT doc_id) AS BIGINT) AS nd, "
            "bool_or(pos = 1) AS at_start, min(prev) AS mn, max(prev) AS mx "
            "FROM sub GROUP BY w, l HAVING count(*) >= 2), "
            "maximal AS (SELECT * FROM grp g "
            "WHERE (g.at_start OR g.mn <> g.mx) "
            "AND NOT EXISTS (SELECT 1 FROM grp g2 WHERE g2.l = g.l + 1 "
            "AND g2.c = g.c AND g2.w[1:g.l] = g.w)) "
            "SELECT CAST(row_number() OVER (ORDER BY l DESC, "
            "array_to_string(w, ' ') ASC) AS BIGINT) AS rank, "
            "array_to_string(w, ' ') AS text, CAST(l AS BIGINT) AS n_tokens, "
            "c AS n_occurrences, nd AS n_docs "
            "FROM maximal ORDER BY l DESC, text ASC LIMIT 20"
        ),
        # the cross-corpus leakage twin: same definitional chain plus
        # per-tag (test-side) counts and the both-sides filter;
        # maximality tested over the UNION's repeat set, as in Spark
        "decontaminate_longest_overlaps": (
            r"WITH tok AS (SELECT doc_id, "
            r"string_split_regex(trim(text), '\s+') AS ts FROM documents "
            r"WHERE text IS NOT NULL AND trim(text) <> ''), "
            "sub AS (SELECT t.doc_id, p.pos, l.l, "
            "t.ts[p.pos : p.pos + l.l - 1] AS w, "
            "CASE WHEN p.pos = 1 THEN NULL ELSE t.ts[p.pos - 1] END AS prev "
            "FROM tok t, "
            "LATERAL (SELECT unnest(range(1, len(t.ts) + 1)) AS pos) p, "
            "LATERAL (SELECT unnest(range(5, 128)) AS l) l "
            "WHERE p.pos + l.l - 1 <= len(t.ts)), "
            "grp AS (SELECT w, l, CAST(count(*) AS BIGINT) AS c, "
            "CAST(count(DISTINCT doc_id) AS BIGINT) AS nd, "
            "CAST(count(*) FILTER (doc_id % 10 = 0) AS BIGINT) AS ct, "
            "CAST(count(DISTINCT doc_id) FILTER (doc_id % 10 = 0) "
            "AS BIGINT) AS ndt, "
            "bool_or(pos = 1) AS at_start, min(prev) AS mn, max(prev) AS mx "
            "FROM sub GROUP BY w, l HAVING count(*) >= 2), "
            "maximal AS (SELECT * FROM grp g "
            "WHERE (g.at_start OR g.mn <> g.mx) "
            "AND g.ct > 0 AND g.c > g.ct "
            "AND NOT EXISTS (SELECT 1 FROM grp g2 WHERE g2.l = g.l + 1 "
            "AND g2.c = g.c AND g2.w[1:g.l] = g.w)) "
            "SELECT CAST(row_number() OVER (ORDER BY l DESC, "
            "array_to_string(w, ' ') ASC) AS BIGINT) AS rank, "
            "array_to_string(w, ' ') AS text, CAST(l AS BIGINT) AS n_tokens, "
            "c AS n_occurrences, nd AS n_docs, "
            "ct AS n_occurrences_tagged, ndt AS n_docs_tagged "
            "FROM maximal ORDER BY l DESC, text ASC LIMIT 20"
        ),
        "dedup_spans": (_DUP_SPAN_CTES + " "
            "SELECT doc_id, CAST(MIN(pos) AS INT) AS span_start, "
            "CAST(MAX(pos) + 7 AS INT) AS span_end, "
            "CAST(MAX(pos) + 7 - MIN(pos) + 1 AS INT) AS n_tokens "
            "FROM isl GROUP BY doc_id, i"
        ),
        "dedup_span_stats": (_DUP_SPAN_CTES + ", "
            "spans AS (SELECT doc_id, MIN(pos) AS s, MAX(pos) + 7 AS e "
            "FROM isl GROUP BY doc_id, i), "
            "per_doc AS (SELECT doc_id, SUM(e - s + 1) AS dup_tokens "
            "FROM spans GROUP BY doc_id), "
            f"totals AS (SELECT doc_id, COALESCE(len({_WORDS}), 0) AS n_tokens "
            "FROM documents) "
            "SELECT t.doc_id, CAST(t.n_tokens AS BIGINT) AS n_tokens, "
            "CAST(COALESCE(p.dup_tokens, 0) AS BIGINT) AS dup_tokens, "
            + _pr(
                "CASE WHEN t.n_tokens > 0 THEN "
                "COALESCE(p.dup_tokens, 0) / CAST(t.n_tokens AS DOUBLE) "
                "ELSE 0.0 END"
            )
            + " AS dup_fraction "
            "FROM totals t LEFT JOIN per_doc p ON t.doc_id = p.doc_id"
        ),
        "dedup_span_cut": (_cut_span_ctes(_CUT_HIT_FIRST_DOC) + " "
            + _CUT_SPAN_SELECT
        ),
        "dedup_span_cut_all": (
            _cut_span_ctes(_CUT_HIT_FIRST_OCCURRENCE) + " " + _CUT_SPAN_SELECT
        ),
        # span decontamination: corpus = the >=5% hash-sample rest,
        # hit rule = trigram occurs anywhere in the eval split
        "decontaminate_spans": (
            "WITH tk AS (SELECT doc_id, "
            f"COALESCE({_WORDS}, []) AS ws FROM documents "
            "WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) >= '0ccccccc'), "
            "ev AS (SELECT DISTINCT array_to_string(toks[i:i+2], ' ') AS gr "
            "FROM (SELECT toks, "
            "unnest(range(1, greatest(len(toks) - 2, 0) + 1)) AS i "
            f"FROM (SELECT {_WORDS} AS toks FROM documents "
            "WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) < '0ccccccc')))"
            ", g AS (SELECT doc_id, CAST(i AS INT) AS pos, "
            "array_to_string(ws[i:i+2], ' ') AS gr "
            "FROM (SELECT doc_id, ws, "
            "unnest(range(1, greatest(len(ws) - 2, 0) + 1)) AS i FROM tk)), "
            "h AS (SELECT doc_id, pos FROM g JOIN ev USING (gr)), "
            "flg AS (SELECT doc_id, pos, "
            "CASE WHEN lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) IS NULL "
            "OR pos > lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) + 3 "
            "THEN 1 ELSE 0 END AS flag FROM h), "
            "isl AS (SELECT doc_id, pos, SUM(flag) OVER ("
            "PARTITION BY doc_id ORDER BY pos ROWS UNBOUNDED PRECEDING) AS i "
            "FROM flg), "
            "spans AS (SELECT doc_id, MIN(pos) AS s, MAX(pos) + 2 AS e "
            "FROM isl GROUP BY doc_id, i), "
            "pos_tok AS (SELECT doc_id, unnest(range(1, len(ws) + 1)) AS p, ws "
            "FROM tk), "
            "kept AS (SELECT t.doc_id, t.p, t.ws[t.p] AS tok FROM pos_tok t "
            "WHERE NOT EXISTS (SELECT 1 FROM spans s "
            "WHERE s.doc_id = t.doc_id AND t.p BETWEEN s.s AND s.e)) "
            + _CUT_SPAN_SELECT
        ),
        "docs_kcore": _kcore_sql(),
        "dedup_clusters": (
            "WITH RECURSIVE " + _CLUSTER_CTES + " "
            "SELECT node AS doc_id, CAST(min(root) AS BIGINT) AS cluster_id "
            "FROM reach GROUP BY node"
        ),
        # quality-aware collapse: clusters + the quality arithmetic,
        # one (quality desc, doc_id asc) argmax per cluster
        "dedup_keep_best": (
            "WITH RECURSIVE " + _CLUSTER_CTES + ", "
            "clusters AS (SELECT node AS doc_id, "
            "CAST(min(root) AS BIGINT) AS cluster_id FROM reach GROUP BY node), "
            "q AS (" + _quality_sql() + ") "
            "SELECT doc_id, cluster_id, quality FROM ("
            "SELECT c.doc_id, c.cluster_id, q.quality, "
            "row_number() OVER (PARTITION BY c.cluster_id "
            "ORDER BY q.quality DESC, c.doc_id ASC) AS r "
            "FROM clusters c JOIN q USING (doc_id)) WHERE r = 1"
        ),
        # per-doc n-gram novelty: df=1 share over the distinct-shingle
        # inverted index
        "text_novelty": (
            f"WITH s0 AS ({_SHINGLES}), "
            "dfc AS (SELECT sh, count(*) AS df FROM s0 GROUP BY sh), "
            "per AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams, "
            "CAST(sum(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS BIGINT) "
            "AS n_unique FROM s0 JOIN dfc USING (sh) GROUP BY doc_id) "
            "SELECT d.doc_id, "
            "CAST(COALESCE(p.n_grams, 0) AS BIGINT) AS n_grams, "
            "CAST(COALESCE(p.n_unique, 0) AS BIGINT) AS n_unique, "
            + _pr(
                "CASE WHEN COALESCE(p.n_grams, 0) > 0 THEN "
                "CAST(p.n_unique AS DOUBLE) / p.n_grams ELSE 0.0 END"
            )
            + " AS novelty FROM documents d LEFT JOIN per p USING (doc_id)"
        ),
        # cross-source near-dup matrix over the capped pair chain
        "dedup_source_matrix": (
            f"WITH {_CAPPED_SHINGLE_CTES}, "
            "sz AS (SELECT doc_id, count(*) AS n FROM s GROUP BY doc_id), "
            "inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, "
            "count(*) AS c FROM s a JOIN s b ON a.sh = b.sh "
            "AND a.doc_id < b.doc_id GROUP BY a.doc_id, b.doc_id), "
            "pairs AS (SELECT id_a, id_b FROM inter "
            "JOIN sz x ON x.doc_id = id_a JOIN sz y ON y.doc_id = id_b "
            "WHERE " + _pr("c / (x.n + y.n - c)") + " >= 0.2) "
            "SELECT least(sa.source, sb.source) AS source_a, "
            "greatest(sa.source, sb.source) AS source_b, "
            "CAST(count(*) AS BIGINT) AS n_pairs "
            "FROM pairs JOIN documents sa ON sa.doc_id = id_a "
            "JOIN documents sb ON sb.doc_id = id_b GROUP BY 1, 2"
        ),
        # the round-9-continuation end-to-end pipeline: gopher gate ->
        # survivor clusters -> quality argmax keep -> balanced deal
        "training_data_v2": (
            "WITH RECURSIVE gb AS (SELECT * FROM ("
            + _gopher_battery_sql(top_ns=(2,), dup_ns=(3,))
            + ") z), "
            "surv AS (SELECT d.doc_id, d.text, d.n_chars "
            "FROM documents d JOIN gb USING (doc_id) "
            "WHERE gb.top_2gram_frac <= 0.09 "
            "AND gb.dup_3gram_frac <= 0.02), "
            + _CAPPED_SHINGLE_CTES.replace("FROM documents", "FROM surv")
            + ", sz AS (SELECT doc_id, count(*) AS n FROM s GROUP BY doc_id), "
            "inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, "
            "count(*) AS c FROM s a JOIN s b ON a.sh = b.sh "
            "AND a.doc_id < b.doc_id GROUP BY a.doc_id, b.doc_id), "
            "jpairs AS (SELECT id_a, id_b FROM inter "
            "JOIN sz x ON x.doc_id = id_a JOIN sz y ON y.doc_id = id_b "
            "WHERE " + _pr("c / (x.n + y.n - c)") + " >= 0.2), "
            "edges AS (SELECT id_a AS src, id_b AS dst FROM jpairs "
            "UNION SELECT id_b, id_a FROM jpairs), "
            "reach(node, root) AS (SELECT doc_id, doc_id FROM surv "
            "UNION SELECT e.dst, r.root FROM reach r "
            "JOIN edges e ON e.src = r.node), "
            "clusters AS (SELECT node AS doc_id, "
            "CAST(min(root) AS BIGINT) AS cluster_id FROM reach "
            "GROUP BY node), "
            "q AS (" + _quality_sql().replace("FROM documents", "FROM surv")
            + "), "
            "kept AS (SELECT doc_id, cluster_id, quality FROM ("
            "SELECT c.doc_id, c.cluster_id, q.quality, "
            "row_number() OVER (PARTITION BY c.cluster_id "
            "ORDER BY q.quality DESC, c.doc_id ASC) AS r "
            "FROM clusters c JOIN q USING (doc_id)) WHERE r = 1) "
            "SELECT k.doc_id, k.cluster_id, k.quality, v.n_chars, "
            "CAST((row_number() OVER (ORDER BY COALESCE(v.n_chars, 0) DESC, "
            "k.doc_id ASC) - 1) % 16 AS BIGINT) AS shard "
            "FROM kept k JOIN surv v USING (doc_id)"
        ),
        # per-source duplication report over the same cluster chain
        "dedup_rates_by_source": (
            "WITH RECURSIVE " + _CLUSTER_CTES + ", "
            "clusters AS (SELECT node AS doc_id, "
            "CAST(min(root) AS BIGINT) AS cluster_id FROM reach GROUP BY node) "
            "SELECT d.source, CAST(count(*) AS BIGINT) AS n_docs, "
            "CAST(sum(CASE WHEN c.doc_id <> c.cluster_id THEN 1 ELSE 0 END) "
            "AS BIGINT) AS n_collapsed, "
            + _pr(
                "CAST(sum(CASE WHEN c.doc_id <> c.cluster_id THEN 1 ELSE 0 "
                "END) AS DOUBLE) / count(*)"
            )
            + " AS dup_frac "
            "FROM clusters c JOIN documents d USING (doc_id) GROUP BY d.source"
        ),
        "corpus_curation": (
            "WITH RECURSIVE " + _CLUSTER_CTES + ", "
            "clusters AS (SELECT node AS doc_id, CAST(min(root) AS BIGINT) AS cluster_id "
            "FROM reach GROUP BY node), "
            "quality AS (" + _quality_sql() + ") "
            "SELECT q.doc_id, q.quality, c.cluster_id, "
            "(q.quality >= 0.5 AND q.doc_id = c.cluster_id) AS keep "
            "FROM quality q JOIN clusters c ON q.doc_id = c.doc_id"
        ),
        "dedup_embedding": (
            # mirrors embedding_dedup_pairs_ivf: nearest-cell assignment
            # (seeded centroids = 16 lowest-id vectors, rounded-cosine
            # rank with cent_id tiebreak — the same CTE as ann_ivf),
            # then within-cell pairs only
            "WITH cents AS (SELECT vec_id AS cent_id, embedding AS cent "
            "FROM embeddings ORDER BY vec_id LIMIT 16), "
            "cell AS (SELECT id, cent_id, v FROM ("
            "SELECT e.vec_id AS id, c.cent_id, e.embedding AS v, "
            "row_number() OVER (PARTITION BY e.vec_id ORDER BY "
            + _pr(_cosine_sql("e.embedding", "c.cent"))
            + " DESC, c.cent_id ASC) AS cr "
            "FROM embeddings e CROSS JOIN cents c) WHERE cr = 1) "
            "SELECT a.id AS id_a, b.id AS id_b, "
            + _pr(_cosine_sql("a.v", "b.v")) + " AS cosine "
            "FROM cell a JOIN cell b ON a.cent_id = b.cent_id AND a.id < b.id "
            "WHERE " + _pr(_cosine_sql("a.v", "b.v")) + " >= 0.45"
        ),
        "ann_topk": (
            "SELECT query_id, neighbor_id, cosine, rank FROM ("
            "SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, "
            + _pr(_cosine_sql("q.embedding", "c.embedding")) + " AS cosine, "
            "CAST(row_number() OVER (PARTITION BY q.vec_id ORDER BY "
            + _pr(_cosine_sql("q.embedding", "c.embedding")) + " DESC, c.vec_id ASC) AS INT) AS rank "
            "FROM (SELECT * FROM embeddings WHERE vec_id < 5) q "
            "JOIN embeddings c ON q.vec_id <> c.vec_id"
            ") WHERE rank <= 5"
        ),
        # int8 scalar quantization re-derived per vector: the same
        # max|x|/127 scale and half-up-floor codes, summarized as
        # exact integer stats (codes match bit-for-bit or every sum,
        # min, max drifts)
        "embeddings_quantize_int8": (
            "SELECT vec_id, "
            + _pr("ma / 127.0", 9)
            + " AS scale, "
            "CAST(COALESCE(list_sum(codes), 0) AS BIGINT) AS code_sum, "
            "CAST(COALESCE(list_sum(list_transform(codes, x -> abs(x))), 0) "
            "AS BIGINT) AS code_abs_sum, "
            "CAST(list_min(codes) AS INT) AS code_min, "
            "CAST(list_max(codes) AS INT) AS code_max, "
            "CAST(len(codes) AS INT) AS n_codes FROM ("
            "SELECT vec_id, ma, CASE WHEN ma > 0 THEN "
            "list_transform(xd, x -> CAST(floor(x / (ma / 127.0) + 0.5) AS INT)) "
            "ELSE list_transform(xd, x -> 0) END AS codes FROM ("
            "SELECT vec_id, xd, "
            "list_max(list_transform(xd, x -> abs(x))) AS ma FROM ("
            "SELECT vec_id, list_transform(embedding, "
            "x -> CAST(x AS DOUBLE)) AS xd FROM embeddings)))"
        ),
        # quantized-cosine top-k: scales cancel, so the score is the
        # integer code dot over the product of integer code norms —
        # the one similarity surface that is exact by construction
        "ann_topk_int8": (
            "WITH qz AS (SELECT vec_id, codes, "
            "sqrt(CAST(list_sum(list_transform(codes, x -> x * x)) AS DOUBLE)) "
            "AS nrm FROM ("
            "SELECT vec_id, CASE WHEN ma > 0 THEN "
            "list_transform(xd, x -> CAST(floor(x / (ma / 127.0) + 0.5) AS INT)) "
            "ELSE list_transform(xd, x -> 0) END AS codes FROM ("
            "SELECT vec_id, xd, "
            "list_max(list_transform(xd, x -> abs(x))) AS ma FROM ("
            "SELECT vec_id, list_transform(embedding, "
            "x -> CAST(x AS DOUBLE)) AS xd FROM embeddings)))) "
            "SELECT query_id, neighbor_id, qcosine, rank FROM ("
            "SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, "
            + _pr(
                "CAST(list_sum(list_transform(range(1, len(q.codes) + 1), "
                "i -> q.codes[i] * c.codes[i])) AS DOUBLE) / (q.nrm * c.nrm)"
            )
            + " AS qcosine, "
            "CAST(row_number() OVER (PARTITION BY q.vec_id ORDER BY "
            + _pr(
                "CAST(list_sum(list_transform(range(1, len(q.codes) + 1), "
                "i -> q.codes[i] * c.codes[i])) AS DOUBLE) / (q.nrm * c.nrm)"
            )
            + " DESC, c.vec_id ASC) AS INT) AS rank "
            "FROM (SELECT * FROM qz WHERE vec_id < 5 AND nrm > 0) q "
            "JOIN (SELECT * FROM qz WHERE nrm > 0) c "
            "ON q.vec_id <> c.vec_id) WHERE rank <= 5"
        ),
        "ann_range": (
            "SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, "
            + _pr(_cosine_sql("q.embedding", "c.embedding")) + " AS cosine "
            "FROM (SELECT * FROM embeddings WHERE vec_id < 5) q "
            "JOIN embeddings c ON q.vec_id <> c.vec_id "
            "WHERE " + _pr(_cosine_sql("q.embedding", "c.embedding")) + " >= 0.25"
        ),
        "ann_ivf": (
            "WITH cents AS (SELECT vec_id AS cent_id, embedding AS cent "
            "FROM embeddings ORDER BY vec_id LIMIT 16), "
            "cell AS (SELECT neighbor_id, cent_id, cv FROM ("
            "SELECT e.vec_id AS neighbor_id, c.cent_id, e.embedding AS cv, "
            "row_number() OVER (PARTITION BY e.vec_id ORDER BY "
            + _pr(_cosine_sql("e.embedding", "c.cent"))
            + " DESC, c.cent_id ASC) AS cr "
            "FROM embeddings e CROSS JOIN cents c) WHERE cr = 1), "
            "probe AS (SELECT query_id, cent_id, qv FROM ("
            "SELECT q.vec_id AS query_id, c.cent_id, q.embedding AS qv, "
            "row_number() OVER (PARTITION BY q.vec_id ORDER BY "
            + _pr(_cosine_sql("q.embedding", "c.cent"))
            + " DESC, c.cent_id ASC) AS cr "
            "FROM (SELECT * FROM embeddings WHERE vec_id < 5) q "
            "CROSS JOIN cents c) WHERE cr <= 4) "
            "SELECT query_id, neighbor_id, cosine, rank FROM ("
            "SELECT p.query_id, l.neighbor_id, "
            + _pr(_cosine_sql("p.qv", "l.cv"))
            + " AS cosine, "
            "CAST(row_number() OVER (PARTITION BY p.query_id ORDER BY "
            + _pr(_cosine_sql("p.qv", "l.cv"))
            + " DESC, l.neighbor_id ASC) AS INT) AS rank "
            "FROM probe p JOIN cell l ON p.cent_id = l.cent_id "
            "WHERE p.query_id <> l.neighbor_id) WHERE rank <= 5"
        ),
        # vocabulary cut by (count desc, token asc); per-source OOV
        # mass anchored on the distinct source set; rate = one IEEE
        # division of exact integers (NULL when a source has no
        # tokens), pround'd like the Spark tree
        "text_simpson": (
            f"WITH toks AS (SELECT doc_id, unnest({_WORDS}) AS token "
            "FROM documents), "
            "pt AS (SELECT doc_id, token, CAST(count(*) AS BIGINT) AS n "
            "FROM toks GROUP BY doc_id, token), "
            "pd AS (SELECT doc_id, CAST(SUM(n) AS BIGINT) AS n_tokens, "
            "CAST(count(*) AS BIGINT) AS n_distinct, "
            "CAST(SUM(n * n) AS BIGINT) AS sumsq FROM pt GROUP BY doc_id) "
            "SELECT d.doc_id, "
            "CAST(COALESCE(pd.n_tokens, 0) AS BIGINT) AS n_tokens, "
            "CAST(COALESCE(pd.n_distinct, 0) AS BIGINT) AS n_distinct, "
            "CASE WHEN COALESCE(pd.n_tokens, 0) > 0 THEN "
            + _pr("pd.sumsq / (pd.n_tokens * pd.n_tokens)")
            + " ELSE NULL END AS simpson "
            "FROM documents d LEFT JOIN pd ON pd.doc_id = d.doc_id"
        ),
        "text_vocab_oov": (
            f"WITH toks AS (SELECT source, unnest({_WORDS}) AS token "
            "FROM documents), "
            "vocab AS (SELECT token FROM (SELECT token, count(*) AS tot "
            "FROM toks GROUP BY token ORDER BY tot DESC, token ASC "
            "LIMIT 16)), "
            "flagged AS (SELECT t.source, t.token, "
            "v.token IS NOT NULL AS inv FROM toks t "
            "LEFT JOIN vocab v ON v.token = t.token), "
            "per AS (SELECT source, CAST(count(*) AS BIGINT) AS n_tokens, "
            "CAST(sum(CASE WHEN inv THEN 0 ELSE 1 END) AS BIGINT) AS n_oov, "
            "CAST(count(DISTINCT CASE WHEN inv THEN NULL ELSE token END) "
            "AS BIGINT) AS n_distinct_oov FROM flagged GROUP BY source), "
            "grps AS (SELECT DISTINCT source FROM documents) "
            "SELECT g.source, "
            "CAST(COALESCE(p.n_tokens, 0) AS BIGINT) AS n_tokens, "
            "CAST(COALESCE(p.n_oov, 0) AS BIGINT) AS n_oov, "
            "CAST(COALESCE(p.n_distinct_oov, 0) AS BIGINT) AS n_distinct_oov, "
            "CASE WHEN COALESCE(p.n_tokens, 0) > 0 THEN "
            + _pr("p.n_oov / p.n_tokens")
            + " ELSE NULL END AS oov_rate "
            "FROM grps g LEFT JOIN per p ON p.source = g.source"
        ),
        "text_topterms": (
            "SELECT token, doc_freq, total_count FROM ("
            "SELECT token, count(*) AS doc_freq, "
            "CAST(sum(n) AS BIGINT) AS total_count FROM ("
            f"SELECT doc_id, tok AS token, count(*) AS n FROM "
            f"(SELECT doc_id, unnest({_WORDS}) AS tok FROM documents) "
            "GROUP BY doc_id, tok"
            ") GROUP BY token) ORDER BY doc_freq DESC, token ASC LIMIT 50"
        ),
        "search_bm25": _bm25_sql(),
        "search_tfidf": _tfidf_sql(),
        "dedup_incremental": (
            # NULL-safe joins (IS NOT DISTINCT FROM) mirror
            # incremental_exact_dedup's sentinel hash: a NULL-text doc
            # must still classify, not drop out of the equi-join.
            "WITH newd AS (SELECT doc_id AS id, text FROM documents "
            "WHERE doc_id % 2 = 1), "
            "ex AS (SELECT DISTINCT text FROM documents WHERE doc_id % 2 = 0), "
            "first AS (SELECT text, MIN(id) AS first_id FROM newd GROUP BY text) "
            "SELECT n.id AS doc_id, "
            "CASE WHEN EXISTS (SELECT 1 FROM ex "
            "WHERE ex.text IS NOT DISTINCT FROM n.text) THEN 'dup_of_existing' "
            "WHEN n.id <> f.first_id THEN 'dup_in_batch' "
            "ELSE 'new' END AS status "
            "FROM newd n JOIN first f ON n.text IS NOT DISTINCT FROM f.text"
        ),
        # the SCD2 expected history in closed form: untouched-open /
        # closed-at-v2 / re-opened / inserted, from the same arithmetic
        "docs_scd2": (
            "SELECT doc_id, source, n_chars, 1 AS valid_from, "
            "CAST(NULL AS INTEGER) AS valid_to FROM documents "
            "WHERE doc_id % 13 = 0 OR doc_id % 7 <> 0 "
            "UNION ALL "
            "SELECT doc_id, source, n_chars, 1, 2 FROM documents "
            "WHERE doc_id % 13 <> 0 AND doc_id % 7 = 0 "
            "UNION ALL "
            "SELECT doc_id, source, n_chars + 1, 2, NULL FROM documents "
            "WHERE doc_id % 13 <> 0 AND doc_id % 7 = 0 "
            "UNION ALL "
            "SELECT doc_id + 1000000, source, n_chars, 2, NULL "
            "FROM documents WHERE doc_id % 11 = 0"
        ),
        "orders_diff": (
            "SELECT o_orderkey, 'removed' AS status FROM orders "
            "WHERE o_orderkey % 97 = 0 "
            "UNION ALL "
            "SELECT o_orderkey, 'changed' AS status FROM orders "
            "WHERE o_orderkey % 97 <> 0 AND o_orderkey % 89 = 0 "
            "UNION ALL "
            "SELECT o_orderkey + 10000000 AS o_orderkey, 'added' AS status "
            "FROM orders WHERE o_orderkey % 101 = 0"
        ),
        "text_quality_rules": _quality_rules_sql(),
        "events_cohorts": (
            "WITH weekly AS (SELECT DISTINCT user_id AS u, "
            "CAST(date_trunc('week', ts) AS DATE) AS wk FROM events), "
            "first AS (SELECT u, MIN(wk) AS cohort_week FROM weekly GROUP BY u) "
            "SELECT w.cohort_week, CAST((x.wk - w.cohort_week) / 7 AS INT) "
            "AS week_offset, count(*) AS n_users "
            "FROM weekly x JOIN first w ON x.u = w.u "
            "GROUP BY w.cohort_week, CAST((x.wk - w.cohort_week) / 7 AS INT)"
        ),
        "pack_sequences_grouped": (
            f"WITH toks AS (SELECT doc_id, source, len({_WORDS}) AS n_tokens "
            "FROM documents), "
            "c AS (SELECT doc_id, source, n_tokens, "
            "CAST(SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id "
            "ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum "
            "FROM toks WHERE n_tokens > 0) "
            "SELECT source, doc_id, n_tokens, "
            "(cum - n_tokens) // 256 AS pack_first, "
            "(cum - 1) // 256 AS pack_last, "
            "(cum - n_tokens) % 256 AS offset_in_first FROM c"
        ),
        # semantic packing: hashembed CTEs -> re-sourced k-means fin ->
        # per-cent_id partitioned cumsum with the shared pack arithmetic
        "pack_semantic": (
            "WITH "
            + ", ".join(_hashembed_ctes(64))
            + ", "
            + ", ".join(
                _kmeans_ctes(_scaled_k_limit("documents", 32), 2, src="hvec")[0]
            )
            + ", fin AS ("
            + _kmeans_ctes(_scaled_k_limit("documents", 32), 2, src="hvec")[1]
            + "), "
            f"toks AS (SELECT doc_id, len({_WORDS}) AS n_tokens "
            "FROM documents), "
            "c AS (SELECT f.cent_id, t.doc_id, t.n_tokens, "
            "CAST(SUM(t.n_tokens) OVER (PARTITION BY f.cent_id "
            "ORDER BY t.doc_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum "
            "FROM toks t JOIN fin f ON f.vec_id = t.doc_id "
            "WHERE t.n_tokens > 0) "
            "SELECT cent_id, doc_id, n_tokens, "
            "(cum - n_tokens) // 256 AS pack_first, "
            "(cum - 1) // 256 AS pack_last, "
            "(cum - n_tokens) % 256 AS offset_in_first FROM c"
        ),
        "sample_token_budget": (
            f"WITH toks AS (SELECT doc_id, source, len({_WORDS}) AS n_tokens "
            "FROM documents), "
            "c AS (SELECT doc_id, source, n_tokens, "
            "CAST(SUM(n_tokens) OVER (PARTITION BY source "
            "ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id "
            "ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens FROM toks) "
            "SELECT doc_id, source, n_tokens, cum_tokens FROM c "
            "WHERE cum_tokens - n_tokens < 1500"
        ),
        # the lossless join's oracle is the NAIVE QUADRATIC TRUTH —
        # any blocking false negative hash-mismatches
        "edit_pairs_part_names": (
            "SELECT a.p_partkey AS id_a, b.p_partkey AS id_b, "
            "CAST(levenshtein(a.p_name, b.p_name) AS INT) AS dist "
            "FROM part a JOIN part b ON a.p_partkey < b.p_partkey "
            "AND abs(length(a.p_name) - length(b.p_name)) <= 1 "
            "AND levenshtein(a.p_name, b.p_name) <= 1"
        ),
        "fuzzy_part_names": (
            "WITH p AS (SELECT p_partkey, p_name, "
            "lower(substr(p_name, 1, 1)) AS c, "
            "CAST(length(p_name) // 4 AS BIGINT) AS b FROM part) "
            "SELECT a.p_partkey AS id_a, x.p_partkey AS id_b, "
            "CAST(levenshtein(a.p_name, x.p_name) AS INT) AS dist "
            "FROM p a JOIN p x ON a.c = x.c AND a.b = x.b "
            "AND a.p_partkey < x.p_partkey "
            "AND levenshtein(a.p_name, x.p_name) <= 2"
        ),
        "text_stats": (
            f"SELECT doc_id, length(text) AS n_chars, len({_WORDS}) AS n_tokens, "
            + _pr(
                "CASE WHEN len(" + _WORDS + ") > 0 THEN "
                "CAST(length(regexp_replace(text, '\\s', '', 'g')) AS DOUBLE) / len(" + _WORDS + ") "
                "ELSE 0.0 END",
                4,
            ) + " AS avg_token_len, "
            "length(text) - length(regexp_replace(text, '[.,;:!?''\"()\\[\\]{}-]', '', 'g')) AS n_punct, "
            "length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS n_digits, "
            f"len(list_distinct({_WORDS})) AS n_distinct_tokens "
            "FROM documents"
        ),
        "text_quality": _quality_sql(),
        "docs_pagerank": _pagerank_sql(),
        "embeddings_kmeans": _kmeans_sql(),
        # the SemDeDup family derives k = max(floor, ceil(sqrt(N)))
        # from its FIT corpus on both engines (semdedup.scaled_k /
        # _scaled_k_limit): fixed k measured superlinear in the r9
        # 10x probe (cells grow with N, pair stage N^2/k)
        "decontaminate_semantic": _decon_sem_sql(
            k=_scaled_k_limit(
                "(SELECT 1 AS x FROM documents WHERE doc_id % 10 = 0)", 8
            )
        ),
        "dedup_semantic_pairs": _semdedup_sql(
            "pairs", k=_scaled_k_limit("embeddings", 8)
        ),
        "dedup_semantic": _semdedup_sql(
            "prune", k=_scaled_k_limit("embeddings", 8)
        ),
        "ann_hier": _hier_ivf_sql(
            k=5,
            k1=_icbrt_limit("embeddings", 4),
            k2=_icbrt_limit("embeddings", 4),
            nprobe1=2,
            nprobe2=4,
        ),
        # the persisted serving twin ranks through the same probe/topk
        # code under the same frozen model, so the oracle is identical
        "ann_hier_indexed": _hier_ivf_sql(
            k=5,
            k1=_icbrt_limit("embeddings", 4),
            k2=_icbrt_limit("embeddings", 4),
            nprobe1=2,
            nprobe2=4,
        ),
        "stream_hier_assign": _hier_semdedup_sql(
            "assign",
            k1=_icbrt_limit("embeddings", 4),
            k2=_icbrt_limit("embeddings", 4),
        ),
        "dedup_semantic_hier_pairs": _hier_semdedup_sql(
            "pairs",
            k1=_icbrt_limit("embeddings", 4),
            k2=_icbrt_limit("embeddings", 4),
        ),
        "dedup_semantic_hier": _hier_semdedup_sql(
            "prune",
            k1=_icbrt_limit("embeddings", 4),
            k2=_icbrt_limit("embeddings", 4),
        ),
        "dedup_semantic_incremental_hier": _hier_incr_sql(
            k1=_icbrt_limit(
                "(SELECT 1 AS x FROM embeddings WHERE vec_id % 2 = 0)", 4
            ),
            k2=_icbrt_limit(
                "(SELECT 1 AS x FROM embeddings WHERE vec_id % 2 = 0)", 4
            ),
        ),
        "dedup_semantic_incremental": _semdedup_incr_sql(
            k=_scaled_k_limit(
                "(SELECT 1 AS x FROM embeddings WHERE vec_id % 2 = 0)", 8
            )
        ),
        "embeddings_contrastive": _contrastive_sql(
            k=_scaled_k_limit("embeddings", 8)
        ),
        "ann_pq_codes": _pq_sql("codes"),
        "ann_pq_distortion": (
            f'WITH enc AS ({_pq_sql("codes")}) '
            "SELECT sub, CAST(count(*) AS BIGINT) AS n, "
            + _pr("CAST(SUM(CAST(dist2 AS DECIMAL(38,12))) AS DOUBLE) / count(*)")
            + " AS mean_dist2, max(dist2) AS max_dist2 "
            "FROM enc GROUP BY sub"
        ),
        "ann_pq_topk": _pq_sql("topk"),
        "ann_ivf_pq": _ivfpq_sql(),
        "ann_ivf_pq_indexed": _ivfpq_sql(),
        "docs_hash_embed": (
            "WITH " + ", ".join(_hashembed_ctes())
            + " SELECT doc_id, CAST(pos AS INT) AS pos, val FROM hemb"
        ),
        "docs_semantic_dedup": _semdedup_sql(
            "prune", k=_scaled_k_limit("documents", 32),
            iters=1, threshold=0.88,
            src="hvec", id_name="doc_id", pre_ctes=_hashembed_ctes(),
        ),
        # bounds/width recomputed in-engine: min/max of doubles are the
        # exact same IEEE values Spark's driver aggregation found, and
        # every downstream tree is single-op IEEE arithmetic
        "events_histogram": (
            "WITH b AS (SELECT min(CAST(value AS DOUBLE)) AS lo, "
            "max(CAST(value AS DOUBLE)) AS hi, "
            "(max(CAST(value AS DOUBLE)) - min(CAST(value AS DOUBLE))) "
            "/ CAST(20 AS DOUBLE) AS w FROM events), "
            "h AS (SELECT event_type, "
            "CAST(CASE WHEN b.w = 0.0 THEN 0 ELSE "
            "least(floor((CAST(value AS DOUBLE) - b.lo) / b.w), 19) END AS INT) "
            "AS bucket, count(*) AS n "
            "FROM events, b WHERE value IS NOT NULL "
            "AND CAST(value AS DOUBLE) >= b.lo AND CAST(value AS DOUBLE) <= b.hi "
            "GROUP BY event_type, bucket) "
            "SELECT event_type, bucket, "
            "b.lo + CAST(bucket AS DOUBLE) * b.w AS lo_edge, "
            "b.lo + (CAST(bucket AS DOUBLE) + 1.0) * b.w AS hi_edge, "
            "CAST(n AS BIGINT) AS n FROM h, b"
        ),
        "docs_triangles": ("WITH " + _TRIANGLE_CTES + " "
            "SELECT n.node AS doc_id, CAST(d.degree AS BIGINT) AS degree, "
            "CAST(COALESCE(c.triangles, 0) AS BIGINT) AS triangles, "
            + _pr(
                "CASE WHEN d.degree >= 2 THEN "
                "2.0 * COALESCE(c.triangles, 0) / "
                "(CAST(d.degree AS DOUBLE) * (CAST(d.degree AS DOUBLE) - 1.0)) "
                "ELSE 0.0 END"
            )
            + " AS clustering_coeff "
            "FROM nodes n JOIN deg d ON d.node = n.node "
            "LEFT JOIN corners c ON c.node = n.node"
        ),
        # the composition reuses the graded quality + pagerank CTEs;
        # prior is computed from the ROUNDED rank_norm in both engines
        "corpus_prior": (
            "WITH q AS (" + _quality_sql() + "), "
            "p AS (" + _pagerank_sql() + ") "
            "SELECT q.doc_id, q.quality, "
            + _pr("p.rank * CAST((SELECT count(*) FROM documents) AS DOUBLE)")
            + " AS rank_norm, "
            + _pr(
                "(q.quality + "
                + _pr("p.rank * CAST((SELECT count(*) FROM documents) AS DOUBLE)")
                + ") / 2.0"
            )
            + " AS prior FROM q JOIN p ON q.doc_id = p.doc_id"
        ),
        # rational PMI over adjacent-token bigrams: exact integer
        # counts into one IEEE ratio — identical tree both engines
        "text_collocations": (
            "WITH t AS (SELECT doc_id, "
            f"{_WORDS} AS toks FROM documents), "
            "u AS (SELECT unnest(toks) AS w FROM t), "
            "uc AS (SELECT w, count(*) AS c FROM u GROUP BY w), "
            "tot AS (SELECT CAST(count(*) AS DOUBLE) AS T FROM u), "
            "b AS (SELECT toks[i] AS w1, toks[i+1] AS w2 FROM t, "
            "LATERAL (SELECT unnest(range(1, len(toks))) AS i)), "
            "bc AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c_pair "
            "FROM b GROUP BY w1, w2 HAVING count(*) >= 5), "
            "sc AS (SELECT w1, w2, c_pair, "
            + _pr(
                "(CAST(c_pair AS DOUBLE) * (SELECT T FROM tot)) / "
                "(CAST(u1.c AS DOUBLE) * CAST(u2.c AS DOUBLE))"
            )
            + " AS score FROM bc JOIN uc u1 ON bc.w1 = u1.w "
            "JOIN uc u2 ON bc.w2 = u2.w) "
            "SELECT w1, w2, c_pair, score, rank FROM ("
            "SELECT *, CAST(row_number() OVER ("
            "ORDER BY score DESC, w1 ASC, w2 ASC) AS INT) AS rank FROM sc) "
            "WHERE rank <= 50"
        ),
        # percent_rank is SQL-standard in both engines (ties share a
        # rank); the quality input is the shared _quality_sql CTE
        "quality_pctile": (
            "WITH q AS (" + _quality_sql() + ") "
            "SELECT q.doc_id, d.source, q.quality, "
            "floor(percent_rank() OVER (PARTITION BY d.source "
            "ORDER BY q.quality) * 1000000 + 0.5) / 1000000 AS pctile "
            "FROM q JOIN documents d ON q.doc_id = d.doc_id"
        ),
        "text_langid": _langid_sql(),
        "text_langid_eval": (
            "WITH pred AS (" + _langid_sql() + ") "
            "SELECT d.lang, count(*) AS n, "
            "CAST(sum(CASE WHEN p.pred_lang = d.lang THEN 1 ELSE 0 END) AS BIGINT) AS n_correct, "
            + _pr(
                "CAST(sum(CASE WHEN p.pred_lang = d.lang THEN 1 ELSE 0 END) AS DOUBLE)"
                " / count(*)",
                4,
            )
            + " AS accuracy "
            "FROM documents d JOIN pred p ON d.doc_id = p.doc_id GROUP BY d.lang"
        ),
        "text_bpe_fertility": (
            _bpe_doc_tokens_cte()
            + ", per AS (SELECT d.source, "
            "CAST(COALESCE(length(d.text), 0) AS BIGINT) AS ch, "
            "CAST(COALESCE(len(t.toks), 0) AS BIGINT) AS nt, "
            "CAST(CASE WHEN d.text IS NULL THEN 0 ELSE "
            "len(list_filter(string_split_regex(trim(lower(d.text)), "
            "'\\s+'), x -> x <> '')) END AS BIGINT) AS nw "
            "FROM documents d LEFT JOIN doc_tokens t ON t.doc_id = d.doc_id) "
            "SELECT source, CAST(count(*) AS BIGINT) AS n_docs, "
            "CAST(sum(ch) AS BIGINT) AS total_chars, "
            "CAST(sum(nt) AS BIGINT) AS total_tokens, "
            "CAST(sum(nw) AS BIGINT) AS total_words, "
            "CASE WHEN sum(nt) > 0 THEN "
            "(FLOOR((CAST(sum(ch) AS DOUBLE) / sum(nt)) * 1000000.0 + 0.5) "
            "/ 1000000.0) ELSE 0.0 END AS chars_per_token, "
            "CASE WHEN sum(nw) > 0 THEN "
            "(FLOOR((CAST(sum(nt) AS DOUBLE) / sum(nw)) * 1000000.0 + 0.5) "
            "/ 1000000.0) ELSE 0.0 END AS tokens_per_word "
            "FROM per GROUP BY source"
        ),
        "text_bpe_count": (
            "SELECT doc_id, len(regexp_extract_all(text, "
            "'[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS n_bpe_tokens FROM documents"
        ),
        "text_fingerprint": (
            "SELECT doc_id, list_reduce("
            "list_prepend(CAST(0 AS BIGINT), "
            "list_transform(range(1, length(lower(text)) + 1), "
            "i -> CAST(unicode(lower(text)[i:i]) AS BIGINT))), "
            "(a, c) -> (a * 31 + c) % 1000000007) AS fingerprint "
            "FROM documents"
        ),
        "multimodal_meta": (
            "SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes, "
            "CAST(unicode(text[1:1]) AS BIGINT) AS first_cp FROM documents"
        ),
        # the fake blob wire format is arithmetic-deterministic:
        # 16-byte header + min(w*h*c, 4096) payload bytes
        "multimodal_image_meta": (
            "SELECT doc_id, 'fimg' AS format, "
            "CAST(n_chars % 512 + 16 AS INT) AS width, "
            "CAST(doc_id % 256 + 16 AS INT) AS height, "
            "CAST(3 AS INT) AS channels, "
            "CAST(16 + least((n_chars % 512 + 16) * (doc_id % 256 + 16) * 3, "
            "4096) AS BIGINT) AS n_bytes "
            "FROM documents"
        ),
        # REAL codec round-trips: the blob content is the closed form
        # pixel[i] = (doc_id*31+i) mod 256 / s[i] = ((doc_id*7+i*13)
        # mod 4096) - 2048, so the oracle recomputes the decoded
        # statistics arithmetically — Spark must encode AND decode the
        # real PNG/WAV bytes correctly to match.
        "multimodal_decode_png": (
            "SELECT doc_id, CAST(w AS INT) AS width, CAST(h AS INT) AS height, "
            "CAST(w * h AS BIGINT) AS n_pixels, "
            "CAST(list_sum(list_transform(range(0, w * h), "
            "i -> (doc_id * 31 + i) % 256)) AS BIGINT) AS px_sum, "
            "CAST(list_sum(list_transform(range(0, w * h), "
            "i -> ((doc_id * 31 + i) % 256) * (i + 1))) AS BIGINT) AS px_checksum "
            "FROM (SELECT doc_id, n_chars % 24 + 4 AS w, doc_id % 16 + 4 AS h "
            "FROM documents)"
        ),
        "multimodal_decode_jpeg": (
            "SELECT doc_id, CAST(n_chars % 24 + 8 AS INT) AS width, "
            "CAST(doc_id % 16 + 8 AS INT) AS height, "
            "CAST((n_chars % 24 + 8) * (doc_id % 16 + 8) AS BIGINT) AS n_pixels "
            "FROM documents"
        ),
        "multimodal_decode_wav": (
            "SELECT doc_id, CAST(rate AS INT) AS sample_rate, "
            "CAST(1 AS INT) AS channels, CAST(n AS BIGINT) AS n_samples, "
            "CAST(list_sum(list_transform(range(0, n), "
            "i -> ((doc_id * 7 + i * 13) % 4096) - 2048)) AS BIGINT) AS sample_sum, "
            "CAST(list_sum(list_transform(range(0, n), "
            "i -> abs(((doc_id * 7 + i * 13) % 4096) - 2048))) AS BIGINT) AS sample_abs_sum "
            "FROM (SELECT doc_id, 8000 + (doc_id % 8) * 1000 AS rate, "
            "n_chars % 128 + 16 AS n FROM documents)"
        ),
        # the MP4/AVI container encode→parse round trip recomputed
        # arithmetically from the id closed form (see
        # video_containers.attach_synthetic_video_blobs); division by
        # the timescale / 1e6 is IEEE-exact in both engines
        "multimodal_video_meta": (
            "SELECT doc_id, "
            "CASE WHEN doc_id % 3 = 0 THEN 'mp4' "
            "WHEN doc_id % 3 = 1 THEN 'avi' END AS container, "
            "CASE WHEN doc_id % 3 = 0 THEN (doc_id % 9000 + 500) / 1000.0 "
            "WHEN doc_id % 3 = 1 THEN "
            "((doc_id % 1000 + 25) * 40000) / 1000000.0 END AS duration_s, "
            "CASE WHEN doc_id % 3 = 0 THEN "
            "CAST(CASE WHEN doc_id % 2 = 0 THEN 2 ELSE 1 END AS INT) "
            "WHEN doc_id % 3 = 1 THEN CAST(doc_id % 2 + 1 AS INT) "
            "END AS n_tracks, "
            "CASE WHEN doc_id % 3 = 0 THEN CAST((doc_id % 80) * 8 + 128 AS INT) "
            "WHEN doc_id % 3 = 1 THEN CAST((doc_id % 96) * 4 + 160 AS INT) "
            "END AS width, "
            "CASE WHEN doc_id % 3 = 0 THEN CAST((doc_id % 45) * 8 + 96 AS INT) "
            "WHEN doc_id % 3 = 1 THEN CAST((doc_id % 54) * 4 + 120 AS INT) "
            "END AS height "
            "FROM documents"
        ),
        # the MJPEG-in-AVI frame pipeline's structural surface: the
        # every-2nd-frame stride fan-out and per-frame dims / pixel
        # counts from the id closed form (nf = doc_id % 5 + 2 <= 6, so
        # sampled frame_idx ∈ {0, 2, 4}); decoded pixel VALUES are
        # lossy-JPEG and pinned by PSNR in pytest instead
        "multimodal_decode_video": (
            "SELECT doc_id, CAST(f AS INT) AS frame_idx, "
            "CAST(w AS INT) AS width, CAST(h AS INT) AS height, "
            "CAST(w * h AS BIGINT) AS n_pixels "
            "FROM (SELECT doc_id, n_chars % 24 + 8 AS w, "
            "doc_id % 16 + 8 AS h, doc_id % 5 + 2 AS nf FROM documents) "
            "CROSS JOIN UNNEST(range(0, 16, 2)) AS t(f) WHERE f < nf"
        ),
        "multimodal_image_dhash": (
            f"WITH {_image_dhash_sql()} SELECT doc_id, dhash FROM sig"
        ),
        "multimodal_image_dedup": (
            f"WITH {_image_dhash_sql()} "
            "SELECT a.doc_id AS id_a, b.doc_id AS id_b, "
            "CAST(bit_count(xor(a.dhash, b.dhash)) AS INT) AS hamming "
            "FROM sig a JOIN sig b ON a.doc_id < b.doc_id "
            "AND bit_count(xor(a.dhash, b.dhash)) <= 6"
        ),
        "multimodal_image_phash": (
            f"WITH {_image_phash_sql()} SELECT doc_id, phash FROM sig"
        ),
        # the at-ingest twin: seq = the append rank (append_df orders
        # by doc_id), hash = the identical pHash arithmetic
        "stream_image_phash": (
            f"WITH {_image_phash_sql()}, "
            "rk AS (SELECT doc_id, CAST(row_number() OVER "
            "(ORDER BY doc_id) - 1 AS BIGINT) AS seq FROM documents) "
            "SELECT rk.seq, sig.phash FROM sig "
            "JOIN rk ON rk.doc_id = sig.doc_id"
        ),
        "multimodal_image_phash_dedup": (
            f"WITH {_image_phash_sql()} "
            "SELECT a.doc_id AS id_a, b.doc_id AS id_b, "
            "CAST(bit_count(xor(a.phash, b.phash)) AS INT) AS hamming "
            "FROM sig a JOIN sig b ON a.doc_id < b.doc_id "
            "AND bit_count(xor(a.phash, b.phash)) <= 10"
        ),
        "multimodal_audio_fp": (
            f"WITH {_audio_afp_sql()} SELECT doc_id, afp FROM sig"
        ),
        "multimodal_audio_dedup": (
            f"WITH {_audio_afp_sql()} "
            "SELECT a.doc_id AS id_a, b.doc_id AS id_b, "
            "CAST(bit_count(xor(a.afp, b.afp)) AS INT) AS hamming "
            "FROM sig a JOIN sig b ON a.doc_id < b.doc_id "
            "AND bit_count(xor(a.afp, b.afp)) <= 6"
        ),
        # cross-modal: image pHash pairs UNION audio pairs -> one
        # reachability pass (each hash chain wrapped as a derived
        # table so the two generated sig CTEs cannot collide)
        "multimodal_dedup_clusters_all": (
            "WITH RECURSIVE "
            "isig AS (SELECT * FROM ("
            f"WITH {_image_phash_sql()} SELECT doc_id, phash FROM sig)), "
            "asig AS (SELECT * FROM ("
            f"WITH {_audio_afp_sql()} SELECT doc_id, afp FROM sig)), "
            "mpairs AS ("
            "SELECT a.doc_id AS id_a, b.doc_id AS id_b FROM isig a "
            "JOIN isig b ON a.doc_id < b.doc_id "
            "AND bit_count(xor(a.phash, b.phash)) <= 10 "
            "UNION "
            "SELECT a.doc_id, b.doc_id FROM asig a JOIN asig b "
            "ON a.doc_id < b.doc_id "
            "AND bit_count(xor(a.afp, b.afp)) <= 6), "
            "medges AS (SELECT id_a AS src, id_b AS dst FROM mpairs "
            "UNION SELECT id_b, id_a FROM mpairs), "
            "mreach(node, root) AS ("
            "SELECT doc_id, doc_id FROM documents "
            "UNION "
            "SELECT e.dst, r.root FROM mreach r JOIN medges e "
            "ON e.src = r.node) "
            "SELECT node AS doc_id, CAST(min(root) AS BIGINT) "
            "AS cluster_id FROM mreach GROUP BY node"
        ),
        "multimodal_dedup_clusters": (
            f"WITH RECURSIVE {_audio_afp_sql()}, "
            "mpairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b "
            "FROM sig a JOIN sig b ON a.doc_id < b.doc_id "
            "AND bit_count(xor(a.afp, b.afp)) <= 6), "
            "medges AS (SELECT id_a AS src, id_b AS dst FROM mpairs "
            "UNION SELECT id_b, id_a FROM mpairs), "
            "mreach(node, root) AS ("
            "SELECT doc_id, doc_id FROM documents "
            "UNION "
            "SELECT e.dst, r.root FROM mreach r JOIN medges e "
            "ON e.src = r.node) "
            "SELECT node AS doc_id, CAST(min(root) AS BIGINT) "
            "AS cluster_id FROM mreach GROUP BY node"
        ),
        # sampling: md5 is engine-identical; fixed-width lowercase-hex
        # compares in numeric order, so the row sets match exactly.
        # Thresholds are format(int(f * 16**8), '08x').
        "sample_docs": (
            "SELECT doc_id, lang, source, n_chars FROM documents "
            "WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) < '33333333'"
        ),
        "sample_split": (
            "SELECT source, CASE WHEN h < 'cccccccc' THEN 'train' "
            "WHEN h < 'e6666666' THEN 'val' ELSE 'test' END AS split, "
            "count(*) AS n, CAST(sum(doc_id) AS BIGINT) AS id_sum "
            "FROM (SELECT source, doc_id, "
            "substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS h FROM documents) "
            "GROUP BY 1, 2"
        ),
        "sample_stratified": (
            "SELECT doc_id, source, n_chars FROM ("
            "SELECT doc_id, source, n_chars, row_number() OVER ("
            "PARTITION BY source "
            "ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn "
            "FROM documents) WHERE rn <= 10"
        ),
        # the epoch shuffle's distributed position assignment must
        # reproduce the naive global row_number over (md5(id#seed), id)
        "sample_shuffle": (
            "SELECT doc_id, CAST(row_number() OVER ("
            "ORDER BY md5(CAST(doc_id AS VARCHAR) || '#7'), doc_id) - 1 "
            "AS BIGINT) AS shuffle_pos FROM documents"
        ),
        # curation keep-set -> md5 train/test split -> 512-token
        # packing of the train stream in doc_id order
        "training_data": (
            "WITH RECURSIVE " + _CLUSTER_CTES + ", "
            "clusters AS (SELECT node AS doc_id, CAST(min(root) AS BIGINT) AS cluster_id "
            "FROM reach GROUP BY node), "
            "quality AS (" + _quality_sql() + "), "
            "kept AS (SELECT q.doc_id FROM quality q JOIN clusters c "
            "ON q.doc_id = c.doc_id "
            "WHERE q.quality >= 0.5 AND q.doc_id = c.cluster_id), "
            "toks AS (SELECT d.doc_id, "
            f"CAST(len({_WORDS}) AS INT) AS n_tokens "
            "FROM documents d JOIN kept k ON d.doc_id = k.doc_id), "
            "base AS (SELECT t.doc_id, CASE WHEN "
            "substr(md5(CAST(t.doc_id AS VARCHAR)), 1, 8) < '19999999' "
            "THEN 'test' ELSE 'train' END AS split, t.n_tokens FROM toks t), "
            "packed AS (SELECT doc_id, "
            "(cum - n_tokens) // 512 AS pack_first, "
            "(cum - 1) // 512 AS pack_last, "
            "(cum - n_tokens) % 512 AS offset_in_first "
            "FROM (SELECT doc_id, n_tokens, "
            "CAST(SUM(n_tokens) OVER (ORDER BY doc_id "
            "ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum "
            "FROM base WHERE split = 'train' AND n_tokens > 0)) "
            "SELECT b.doc_id, b.split, b.n_tokens, "
            "p.pack_first, p.pack_last, p.offset_in_first "
            "FROM base b LEFT JOIN packed p ON b.doc_id = p.doc_id"
        ),
        # PII surface: patterns live in the Java-regex ∩ RE2 dialect,
        # both engines scan the identical salted text (see
        # _PII_SALT_SQL); redaction order email → ip → phone
        "pii_scan": (
            "SELECT doc_id, "
            "CAST(len(regexp_extract_all(text, "
            "'[A-Za-z0-9._%+-]+@[A-Za-z0-9-]+(?:\\.[A-Za-z]{2,})+')) AS INT) "
            "AS n_emails, "
            "CAST(len(regexp_extract_all(text, "
            "'\\b(?:[0-9]{1,3}\\.){3}[0-9]{1,3}\\b')) AS INT) AS n_ipv4, "
            "CAST(len(regexp_extract_all(text, "
            "'\\+?[0-9][0-9()\\-\\s]{6,}[0-9]')) AS INT) AS n_phones, "
            "(len(regexp_extract_all(text, "
            "'[A-Za-z0-9._%+-]+@[A-Za-z0-9-]+(?:\\.[A-Za-z]{2,})+')) > 0 "
            "OR len(regexp_extract_all(text, "
            "'\\b(?:[0-9]{1,3}\\.){3}[0-9]{1,3}\\b')) > 0 "
            "OR len(regexp_extract_all(text, "
            "'\\+?[0-9][0-9()\\-\\s]{6,}[0-9]')) > 0) AS has_pii "
            f"FROM ({_PII_SALT_SQL})"
        ),
        "pii_redact": _PII_REDACT_SQL,
        # the streaming at-ingest scrub shares the batch redaction
        # chain (operators/pii.redact_expr), so its sink contents must
        # match the batch oracle exactly; seq == doc_id (dense ids
        # appended in doc_id order)
        "stream_pii_redact": _PII_REDACT_SQL,
        # chunk boundaries are a closed form of the token count; the
        # chunk text re-slices the SAME whitespace tokenization
        # (1-based inclusive list slicing on the DuckDB side)
        "chunk_documents": (
            "SELECT doc_id, CAST(i AS INT) AS chunk_idx, "
            "CAST(i * 48 AS INT) AS start_tok, "
            "CAST(least(i * 48 + 64, n) AS INT) AS end_tok, "
            "CAST(least(i * 48 + 64, n) - i * 48 AS INT) AS n_tokens, "
            "array_to_string(toks[i * 48 + 1 : least(i * 48 + 64, n)], ' ') "
            "AS chunk_text FROM ("
            "SELECT doc_id, toks, n, "
            "unnest(range(CAST(1 + ceil(greatest(n - 64, 0) / 48.0) AS BIGINT))) AS i "
            f"FROM (SELECT doc_id, {_WORDS} AS toks, "
            f"len({_WORDS}) AS n FROM documents))"
        ),
        "source_quality_report": (
            "WITH q AS (" + _quality_sql() + "), "
            "r AS (" + _repetition_sql() + ") "
            "SELECT d.source, count(*) AS n_docs, "
            + _pr("CAST(SUM(CAST(q.quality AS DECIMAL(38,6))) AS DOUBLE) / count(*)", 6)
            + " AS avg_quality, "
            + _pr(
                "CAST(SUM(CAST(r.repetition AS DECIMAL(38,6))) AS DOUBLE) / count(*)",
                6,
            )
            + " AS avg_repetition, "
            "CAST(SUM(CASE WHEN q.quality < 0.5 THEN 1 ELSE 0 END) AS BIGINT) "
            "AS n_below_bar "
            "FROM documents d JOIN q ON d.doc_id = q.doc_id "
            "JOIN r ON d.doc_id = r.doc_id GROUP BY d.source"
        ),
        "docs_length_histogram": (
            "SELECT lang, n_chars // 100 AS bucket, count(*) AS n, "
            "min(n_chars) AS min_chars, max(n_chars) AS max_chars "
            "FROM documents GROUP BY lang, n_chars // 100"
        ),
        "text_repetition": _repetition_sql(),
        "text_ngram_coverage": _ngram_coverage_sql(n=2),
        "text_gopher_battery": _gopher_battery_sql(
            top_ns=(2, 3, 4), dup_ns=(3, 4)
        ),
        "text_line_repetition": _line_repetition_sql(),
        "text_bpe_tokens": _bpe_tokens_sql(),
        # train_bpe's distributed word-count stage: the same
        # pre-tokenizer regex in RE2, top-50 by (count desc, token asc)
        "text_bpe_wordcounts": (
            "SELECT w, CAST(count(*) AS BIGINT) AS c FROM ("
            "SELECT unnest(regexp_extract_all(text, '"
            + _BPE_PAT.replace("'", "''")
            + "')) AS w FROM documents) GROUP BY w "
            "ORDER BY c DESC, w LIMIT 50"
        ),
        # packing over REAL BPE counts: the recursive-CTE encoder
        # supplies n_tokens, then the same integer cumsum/div layout
        # arithmetic as the pack_sequences oracle (seq_len 512)
        "pack_sequences_bpe": (
            _bpe_doc_tokens_cte()
            + ", counts AS (SELECT d.doc_id, "
            "CAST(COALESCE(len(dt.toks), 0) AS BIGINT) AS n_tokens "
            "FROM documents d LEFT JOIN doc_tokens dt USING (doc_id)) "
            "SELECT doc_id, n_tokens, "
            "CAST((cum - n_tokens) // 512 AS BIGINT) AS pack_first, "
            "CAST((cum - 1) // 512 AS BIGINT) AS pack_last, "
            "CAST((cum - n_tokens) % 512 AS BIGINT) AS offset_in_first "
            "FROM (SELECT doc_id, n_tokens, "
            "CAST(SUM(n_tokens) OVER (ORDER BY doc_id "
            "ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum "
            "FROM counts WHERE n_tokens > 0)"
        ),
        # eval set = deterministic 5% hash sample (md5 < 0ccccccc);
        # contamination = matched distinct trigrams / doc trigrams
        "decontaminate": (
            "WITH t AS (SELECT doc_id, "
            f"{_WORDS} AS toks FROM documents), "
            "s AS (SELECT doc_id, list_distinct("
            "list_transform(range(1, greatest(len(toks) - 1, 1)), "
            "i -> array_to_string(toks[i:i+2], ' '))) AS shs FROM t), "
            "e AS (SELECT DISTINCT unnest(shs) AS shingle FROM s "
            "WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) < '0ccccccc'), "
            "c AS (SELECT doc_id, shs FROM s "
            "WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) >= '0ccccccc'), "
            "f AS (SELECT doc_id, unnest(shs) AS shingle FROM c), "
            "m AS (SELECT f.doc_id, count(*) AS n_matched FROM f "
            "JOIN e USING (shingle) GROUP BY f.doc_id) "
            "SELECT c.doc_id, CAST(len(c.shs) AS INT) AS n_shingles, "
            "CAST(coalesce(m.n_matched, 0) AS BIGINT) AS n_matched, "
            + _pr(
                "CASE WHEN len(c.shs) > 0 THEN "
                "CAST(coalesce(m.n_matched, 0) AS DOUBLE) / len(c.shs) "
                "ELSE 0.0 END",
                6,
            )
            + " AS contamination FROM c LEFT JOIN m USING (doc_id)"
        ),
        # the Spark side round-trips every payload through msgpack AND
        # cbor; a corrupt round-trip yields ok=false and a hash mismatch
        "codec_roundtrip": "SELECT doc_id, TRUE AS ok FROM documents",
        # per-row norm = the same sequential fold as Spark's aggregate
        # HOF; rounded per row, then exact decimal aggregation
        "embedding_label_stats": (
            "SELECT label, count(*) AS n, "
            "min(nr) AS min_norm, max(nr) AS max_norm, "
            + _pr("CAST(SUM(CAST(nr AS DECIMAL(38,6))) AS DOUBLE) / count(*)", 6)
            + " AS avg_norm FROM (SELECT label, "
            + _pr("sqrt(" + _DOT.format(a="embedding", b="embedding") + ")", 6)
            + " AS nr FROM embeddings) GROUP BY label"
        ),
        # contiguous token-stream packing: inclusive cumsum in doc_id
        # order, integer div/mod into 2048-token packs
        "pack_sequences": (
            "SELECT doc_id, n_tokens, "
            "(cum - n_tokens) // 2048 AS pack_first, "
            "(cum - 1) // 2048 AS pack_last, "
            "(cum - n_tokens) % 2048 AS offset_in_first "
            "FROM (SELECT doc_id, n_tokens, "
            "CAST(SUM(n_tokens) OVER (ORDER BY doc_id "
            "ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum "
            f"FROM (SELECT doc_id, len({_WORDS}) AS n_tokens FROM documents) "
            "WHERE n_tokens > 0)"
        ),
        # per-row Bernoulli keyed by the pround'ed quality score:
        # threshold = floor(quality * 16^8) as fixed-width hex
        # seq == doc_id (dense ids appended in order); the state key
        # sha2-256 is engine-identical to DuckDB's sha256
        "stream_dedup_exact": (
            "SELECT sha256(text) AS content_hash, "
            "CAST(min(doc_id) AS BIGINT) AS keep_seq "
            "FROM documents GROUP BY text"
        ),
        # at-ingest budget gate: kept set = the maximal per-source
        # prefix (doc_id order) whose tokens-before-it stay under 500
        "stream_token_budget": (
            "SELECT source AS stratum, doc_id AS seq, n_tokens, "
            "cum AS cum_tokens FROM ("
            "SELECT source, doc_id, n_tokens, "
            "CAST(SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id "
            "ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum "
            f"FROM (SELECT source, doc_id, CAST(len({_WORDS}) AS BIGINT) "
            "AS n_tokens FROM documents)) "
            "WHERE cum - n_tokens < 500"
        ),
        # the BPE-fed gate: n_tokens re-derived by the recursive-CTE
        # SQL BPE encoder, then the same per-source cumsum rule
        "stream_token_budget_bpe": (
            _bpe_doc_tokens_cte()
            + ", nt AS (SELECT d.source, d.doc_id, "
            "CAST(COALESCE(len(dt.toks), 0) AS BIGINT) AS n_tokens "
            "FROM documents d LEFT JOIN doc_tokens dt USING (doc_id)) "
            "SELECT source AS stratum, doc_id AS seq, n_tokens, "
            "cum AS cum_tokens FROM ("
            "SELECT source, doc_id, n_tokens, "
            "CAST(SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id "
            "ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum FROM nt) "
            "WHERE cum - n_tokens < 800"
        ),
        # the bounded-horizon rule as one lag window: keep iff no
        # prior occurrence of the content within the trailing 40 seqs
        "stream_dedup_window": (
            "SELECT sha256(content) AS content_hash, "
            "CAST(doc_id AS BIGINT) AS keep_seq FROM ("
            "SELECT doc_id, content, "
            "lag(doc_id) OVER (PARTITION BY content ORDER BY doc_id) AS prev "
            "FROM (SELECT doc_id, CAST((doc_id * doc_id) % 53 AS VARCHAR) "
            "AS content FROM documents)) "
            "WHERE prev IS NULL OR doc_id - prev > 40"
        ),
        "sample_weighted": (
            "SELECT doc_id, quality FROM (" + _quality_sql() + ") "
            "WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) < "
            "CASE WHEN quality >= 1 THEN 'g' ELSE "
            "lower(lpad(to_hex(CAST(floor(quality * 4294967296) AS BIGINT)), 8, '0')) "
            "END"
        ),
    }
