"""DuckDB oracle SQL fragment builders shared by oracle_sql() (split from __spark_entry__)."""

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



# Shared SQL fragments for the oracles (kept identical to the Spark
# expression trees so double results are bit-identical).
_WORDS = "list_filter(string_split_regex(trim(lower(text)), '\\s+'), x -> x <> '')"

#: Shared CTE chain for the duplicate-span oracles (word 8-grams,
#: cross-doc scope): positional grams → grams seen in ≥2 documents →
#: duplicated positions → gaps-and-islands span ids. Groups on the
#: gram TEXT where the Spark operator groups on its sha2 — equal iff
#: the hashes are equal. Mirrors dedup.duplicate_spans(n=8).
_DUP_SPAN_CTES = (
    "WITH g AS ("
    "SELECT doc_id, CAST(idx AS INT) AS pos, "
    "array_to_string(toks[idx:idx+7], ' ') AS gr "
    "FROM (SELECT doc_id, toks, "
    "unnest(range(1, greatest(len(toks) - 7, 0) + 1)) AS idx "
    f"FROM (SELECT doc_id, {_WORDS} AS toks FROM documents))), "
    "d AS (SELECT gr FROM g GROUP BY gr HAVING min(doc_id) <> max(doc_id)), "
    "h AS (SELECT doc_id, pos FROM g JOIN d USING (gr)), "
    "flg AS (SELECT doc_id, pos, "
    "CASE WHEN lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) IS NULL "
    "OR pos > lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) + 8 "
    "THEN 1 ELSE 0 END AS flag FROM h), "
    "isl AS (SELECT doc_id, pos, SUM(flag) OVER ("
    "PARTITION BY doc_id ORDER BY pos ROWS UNBOUNDED PRECEDING) AS i FROM flg)"
)

#: CTE chains for the span CUT oracles: same positional-gram build,
#: with the hit rule swapped per keep mode — 'first_doc' cuts
#: positions whose gram has an earlier owner DOCUMENT;
#: 'first_occurrence' cuts every occurrence after the global first in
#: (doc_id, pos) order (also within the owner). Islands merge as in
#: the span report; surviving positions rebuild the text with an
#: ordered string_agg. Mirrors dedup.cut_duplicate_spans(n=8, keep=…).
_CUT_HIT_FIRST_DOC = (
    "own AS (SELECT gr, min(doc_id) AS o FROM g GROUP BY gr), "
    "h AS (SELECT doc_id, pos FROM g JOIN own USING (gr) WHERE doc_id > o)"
)
_CUT_HIT_FIRST_OCCURRENCE = (
    "h AS (SELECT doc_id, pos FROM ("
    "SELECT doc_id, pos, row_number() OVER ("
    "PARTITION BY gr ORDER BY doc_id, pos) AS rn FROM g) WHERE rn > 1)"
)


def _cut_span_ctes(hit: str) -> str:
    return (
    "WITH g AS ("
    "SELECT doc_id, CAST(idx AS INT) AS pos, "
    "array_to_string(toks[idx:idx+7], ' ') AS gr "
    "FROM (SELECT doc_id, toks, "
    "unnest(range(1, greatest(len(toks) - 7, 0) + 1)) AS idx "
    f"FROM (SELECT doc_id, {_WORDS} AS toks FROM documents))), "
    + hit + ", "
    "flg AS (SELECT doc_id, pos, "
    "CASE WHEN lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) IS NULL "
    "OR pos > lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) + 8 "
    "THEN 1 ELSE 0 END AS flag FROM h), "
    "isl AS (SELECT doc_id, pos, SUM(flag) OVER ("
    "PARTITION BY doc_id ORDER BY pos ROWS UNBOUNDED PRECEDING) AS i FROM flg), "
    "spans AS (SELECT doc_id, MIN(pos) AS s, MAX(pos) + 7 AS e "
    "FROM isl GROUP BY doc_id, i), "
    f"tk AS (SELECT doc_id, COALESCE({_WORDS}, []) AS ws FROM documents), "
    "pos_tok AS (SELECT doc_id, unnest(range(1, len(ws) + 1)) AS p, ws FROM tk), "
    "kept AS (SELECT t.doc_id, t.p, t.ws[t.p] AS tok FROM pos_tok t "
    "WHERE NOT EXISTS (SELECT 1 FROM spans s "
    "WHERE s.doc_id = t.doc_id AND t.p BETWEEN s.s AND s.e))"
)
#: Final projection shared by both cut oracles.
_CUT_SPAN_SELECT = (
    "SELECT x.doc_id, COALESCE(k.clean_text, '') AS clean_text, "
    "CAST(len(x.ws) AS BIGINT) AS n_tokens, "
    "CAST(len(x.ws) - COALESCE(k.cnt, 0) AS BIGINT) AS removed_tokens "
    "FROM tk x LEFT JOIN ("
    "SELECT doc_id, string_agg(tok, ' ' ORDER BY p) AS clean_text, "
    "count(*) AS cnt FROM kept GROUP BY doc_id) k "
    "ON x.doc_id = k.doc_id"
)

_SHINGLES = f"""
SELECT doc_id, sh FROM (
  SELECT doc_id, toks, unnest(range(1, greatest(len(toks) - 1, 1))) AS i
  FROM (SELECT doc_id, {_WORDS} AS toks FROM documents)
), LATERAL (SELECT array_to_string(toks[i:i+2], ' ') AS sh)
GROUP BY doc_id, sh
"""
_DOT = (
    "list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
    "list_transform(range(1, len({a}) + 1), i -> "
    "CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE))), (x, y) -> x + y)"
)

# max_df="auto" mirror: cap = max(100, n_docs // 2); shingles whose
# document frequency exceeds the cap are dropped from the universe
# BEFORE posting lists / set sizes form — the same deterministic
# stop-shingle filter the Spark side applies as a broadcast anti-join
# (margaret_spark/operators/dedup.py: _resolve_max_df/_stop_shingles).
_CAPPED_SHINGLE_CTES = (
    f"s0 AS ({_SHINGLES}), "
    "cap AS (SELECT greatest(100, count(*) // 2) AS v FROM documents), "
    "stop AS (SELECT sh FROM s0 GROUP BY sh "
    "HAVING count(*) > (SELECT v FROM cap)), "
    "s AS (SELECT doc_id, sh FROM s0 "
    "WHERE sh NOT IN (SELECT sh FROM stop))"
)


def _scaled_k_limit(src: str, floor: int) -> str:
    """LIMIT expression mirroring ``semdedup.scaled_k``: the cluster
    count k = max(floor, ceil(√N)) is derived FROM THE DATA on both
    engines (a fixed k is superlinear — cells grow with N, so the
    within-cell pair stage grows N²/k; √N balances assignment and
    pairs at N^1.5). ``src`` is the FROM clause of the fit corpus —
    a table name or a parenthesized subquery."""
    return (
        f"(SELECT greatest({int(floor)}, "
        f"CAST(ceil(sqrt(count(*))) AS BIGINT)) FROM {src})"
    )


def _cosine_sql(a: str, b: str) -> str:
    dot = _DOT.format(a=a, b=b)
    na = _DOT.format(a=a, b=a)
    nb = _DOT.format(a=b, b=b)
    return f"({dot}) / (sqrt({na}) * sqrt({nb}))"


def _pr(expr: str, digits: int = 6) -> str:
    """SQL twin of margaret_spark.functions.numeric.pround — the same
    IEEE expression tree, so results are bit-identical to Spark's."""
    scale = f"{float(10**digits):.1f}"
    return f"(FLOOR(({expr}) * {scale} + 0.5) / {scale})"


# clusters-over-jaccard-pairs CTE chain (shared by dedup_clusters and
# corpus_curation): capped shingle universe, pairs at threshold 0.2,
# undirected edges, min reachable id per node via recursive closure
_CLUSTER_CTES = (
    f"{_CAPPED_SHINGLE_CTES}, "
    "sz AS (SELECT doc_id, count(*) AS n FROM s GROUP BY doc_id), "
    "inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS c "
    "FROM s a JOIN s b ON a.sh = b.sh AND a.doc_id < b.doc_id "
    "GROUP BY a.doc_id, b.doc_id), "
    "pairs AS (SELECT id_a, id_b FROM inter "
    "JOIN sz x ON x.doc_id = id_a JOIN sz y ON y.doc_id = id_b "
    "WHERE " + _pr("c / (x.n + y.n - c)") + " >= 0.2), "
    "edges AS (SELECT id_a AS src, id_b AS dst FROM pairs "
    "UNION SELECT id_b, id_a FROM pairs), "
    "reach(node, root) AS ("
    "SELECT doc_id, doc_id FROM documents "
    "UNION "
    "SELECT e.dst, r.root FROM reach r JOIN edges e ON e.src = r.node)"
)

# triangle census over the same capped-jaccard pairs: ordered
# node-iterator join (each {a<b<c} found once), per-corner credit,
# rational clustering coefficient — mirrors graph.triangle_stats
_TRIANGLE_CTES = (
    f"{_CAPPED_SHINGLE_CTES}, "
    "sz AS (SELECT doc_id, count(*) AS n FROM s GROUP BY doc_id), "
    "inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS c "
    "FROM s a JOIN s b ON a.sh = b.sh AND a.doc_id < b.doc_id "
    "GROUP BY a.doc_id, b.doc_id), "
    "pairs AS (SELECT id_a, id_b FROM inter "
    "JOIN sz x ON x.doc_id = id_a JOIN sz y ON y.doc_id = id_b "
    "WHERE " + _pr("c / (x.n + y.n - c)") + " >= 0.2), "
    "nodes AS (SELECT id_a AS node FROM pairs UNION SELECT id_b FROM pairs), "
    "deg AS (SELECT node, count(*) AS degree FROM ("
    "SELECT id_a AS node FROM pairs UNION ALL SELECT id_b FROM pairs) "
    "GROUP BY node), "
    "tri AS (SELECT e1.id_a AS x, e1.id_b AS y, e2.id_b AS z "
    "FROM pairs e1 JOIN pairs e2 ON e2.id_a = e1.id_b "
    "JOIN pairs e3 ON e3.id_a = e1.id_a AND e3.id_b = e2.id_b), "
    "corners AS (SELECT node, count(*) AS triangles FROM ("
    "SELECT x AS node FROM tri UNION ALL SELECT y FROM tri "
    "UNION ALL SELECT z FROM tri) GROUP BY node)"
)


def _repetition_sql() -> str:
    return (
        "SELECT doc_id, "
        + _pr(
            "CASE WHEN len(toks) >= 3 THEN "
            "CAST(len(sh) - len(list_distinct(sh)) AS DOUBLE) / len(sh) "
            "ELSE 0.0 END",
            4,
        )
        + " AS repetition FROM ("
        "SELECT doc_id, toks, "
        "list_transform(range(1, greatest(len(toks) - 1, 1)), "
        "i -> array_to_string(toks[i:i+2], ' ')) AS sh "
        f"FROM (SELECT doc_id, {_WORDS} AS toks FROM documents))"
    )


def _bpe_tokens_sql() -> str:
    """The text_bpe_tokens oracle: an INDEPENDENT SQL re-derivation of
    byte-level BPE. Token state is a list of ids; each recursion step
    applies exactly one merge — the (lowest-rank, leftmost) candidate,
    encoded as min(rank·2²⁰ + pos) — to every still-reducible
    distinct pre-token; a pre-token leaves the recursion when no
    adjacent pair is in the merge table, and the terminal states join
    back to the per-document pre-token sequence. Equivalent to the
    Python sweep encoder because any pair a merge CREATES contains the
    new token, whose own merges were learned later and rank strictly
    higher (operators/bpe.py module docstring). ``ord()`` equals the
    UTF-8 byte for the ASCII corpus the graded tables hold; multibyte
    byte-level behavior is pinned in pytest instead. The merge-table
    literal is generated from operators.bpe.DEFAULT_MERGES (itself
    derived from the embedded seed corpus)."""
    return (
        _bpe_doc_tokens_cte()
        + " SELECT d.doc_id, "
        "CAST(COALESCE(len(dt.toks), 0) AS BIGINT) AS n_tokens, "
        "CAST(COALESCE(list_sum(dt.toks), 0) AS BIGINT) AS token_sum, "
        + ", ".join(
            f"CAST(dt.toks[{i}] AS INT) AS t{i}" for i in range(1, 9)
        )
        + " FROM documents d LEFT JOIN doc_tokens dt USING (doc_id)"
    )


def _bpe_doc_tokens_cte() -> str:
    """The shared WITH-RECURSIVE prefix ending in ``doc_tokens``
    (doc_id, toks list<int>) — composed by the text_bpe_tokens and
    pack_sequences_bpe oracles."""
    from margaret_spark.operators.bpe import DEFAULT_MERGES, PRETOKEN_RE

    rows = ", ".join(
        f"({r}, {a}, {b}, {256 + r})" for r, (a, b) in enumerate(DEFAULT_MERGES)
    )
    pat = PRETOKEN_RE.replace("'", "''")
    return (
        "WITH RECURSIVE "
        f"merges(rnk, l, r, nid) AS (SELECT * FROM (VALUES {rows}) v), "
        "pre AS (SELECT doc_id, unnest(toks) AS tok, "
        "generate_subscripts(toks, 1) AS pno "
        f"FROM (SELECT doc_id, regexp_extract_all(text, '{pat}') AS toks "
        "FROM documents)), "
        "vocab AS (SELECT DISTINCT tok FROM pre), "
        "steps(tok, ids) AS ("
        "SELECT tok, list_transform(range(1, length(tok) + 1), "
        "i -> ord(tok[i])) FROM vocab "
        "UNION ALL "
        # the (rank, pos) argmin packs as rank·2²⁰ + pos: BIGINT
        # arithmetic with a base far above any real pre-token id
        # count (the regex pre-tokenizer caps runs well below 2²⁰
        # bytes; the old 4096 base could alias pos into rank on
        # pathological whitespace/punct runs)
        "SELECT t.tok, t.ids[1:t.pos - 1] || [t.nid] || "
        "t.ids[t.pos + 2:len(t.ids)] "
        "FROM (SELECT c.tok, c.ids, CAST(c.best % 1048576 AS INT) AS pos, "
        "mm.nid FROM ("
        "SELECT s.tok, s.ids, "
        "min(CAST(m.rnk AS BIGINT) * 1048576 + p.i) AS best "
        "FROM steps s "
        "CROSS JOIN LATERAL unnest(range(1, len(s.ids))) AS p(i) "
        "JOIN merges m ON m.l = s.ids[p.i] AND m.r = s.ids[p.i + 1] "
        "GROUP BY s.tok, s.ids) c "
        "JOIN merges mm ON mm.rnk = c.best // 1048576) t), "
        "final AS (SELECT s.tok, s.ids FROM steps s "
        "WHERE NOT EXISTS (SELECT 1 FROM merges m, "
        "LATERAL unnest(range(1, len(s.ids))) AS p(i) "
        "WHERE m.l = s.ids[p.i] AND m.r = s.ids[p.i + 1])), "
        "doc_tokens AS (SELECT p.doc_id, "
        "flatten(list(f.ids ORDER BY p.pno)) AS toks "
        "FROM pre p JOIN final f ON f.tok = p.tok GROUP BY p.doc_id)"
    )


def _quality_sql() -> str:
    pr = _pr(
        "0.4 * least(CAST(n_tokens AS DOUBLE) / 64.0, 1.0) + "
        "0.4 * (CASE WHEN n_tokens > 0 THEN CAST(n_distinct AS DOUBLE) / n_tokens ELSE 0.0 END) + "
        "0.2 * (1.0 - least("
        "(CASE WHEN n_chars > 0 THEN CAST(n_punct AS DOUBLE) / n_chars ELSE 0.0 END) + "
        "(CASE WHEN n_chars > 0 THEN CAST(n_digits AS DOUBLE) / n_chars ELSE 0.0 END), 1.0))",
        4,
    )
    return (
        "SELECT doc_id, " + pr + " AS quality "
        "FROM (SELECT doc_id, length(text) AS n_chars, "
        f"len({_WORDS}) AS n_tokens, len(list_distinct({_WORDS})) AS n_distinct, "
        "length(text) - length(regexp_replace(text, '[.,;:!?''\"()\\[\\]{}-]', '', 'g')) AS n_punct, "
        "length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS n_digits "
        "FROM documents)"
    )


def _bm25_sql(
    query: str = "spark table hash scan",
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> str:
    """BM25 oracle mirroring operators.search.bm25_search in rational
    idf mode — the identical expression tree (same literal constants
    via repr round-trip, same DECIMAL term summation, same tie order),
    with corpus stats computed in-SQL exactly as the Spark side's
    driver collect (CAST(sum AS DOUBLE)/count is the same IEEE
    division as Python float(total)/float(n))."""
    terms = ",".join(f"'{t}'" for t in sorted(set(query.lower().split())))
    k1p1, omb = repr(k1 + 1.0), repr(1.0 - b)
    ts = _pr(
        f"((CAST(s.n AS DOUBLE) + 1.0) / (w.df + 0.5)) * "
        f"((m.tf * {k1p1}) / (m.tf + {k1!r} * ({omb} + {b!r} * (dl.dl / s.avgdl))))"
    )
    return (
        f"WITH toks AS (SELECT doc_id, unnest({_WORDS}) AS token FROM documents), "
        "tf AS (SELECT doc_id, token, count(*) AS tf FROM toks GROUP BY doc_id, token), "
        "dl AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl FROM tf GROUP BY doc_id), "
        "s AS (SELECT count(*) AS n, CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl FROM dl), "
        f"m AS (SELECT * FROM tf WHERE token IN ({terms})), "
        "w AS (SELECT token, count(*) AS df FROM m GROUP BY token), "
        f"scored AS (SELECT m.doc_id, {ts} AS ts "
        "FROM m JOIN w ON m.token = w.token JOIN dl ON m.doc_id = dl.doc_id CROSS JOIN s), "
        "agg AS (SELECT doc_id, CAST(SUM(CAST(ts AS DECIMAL(38,6))) AS DOUBLE) AS score, "
        "count(*) AS n_terms FROM scored GROUP BY doc_id) "
        "SELECT doc_id, score, n_terms, rank FROM ("
        "SELECT doc_id, score, n_terms, CAST(row_number() OVER "
        "(ORDER BY score DESC, doc_id ASC) AS INT) AS rank FROM agg) "
        f"WHERE rank <= {k}"
    )


def _tfidf_sql(vocab_size: int = 50) -> str:
    w = _pr(
        "(tf.tf / dl.dl) * ((CAST((SELECT count(*) FROM documents) AS DOUBLE) + 1.0)"
        " / (v.df + 0.5))"
    )
    return (
        f"WITH toks AS (SELECT doc_id, unnest({_WORDS}) AS token FROM documents), "
        "tf AS (SELECT doc_id, token, count(*) AS tf FROM toks GROUP BY doc_id, token), "
        "dl AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl FROM tf GROUP BY doc_id), "
        "v AS (SELECT token, df FROM (SELECT token, count(*) AS df FROM tf "
        f"GROUP BY token ORDER BY df DESC, token ASC LIMIT {vocab_size})) "
        f"SELECT tf.doc_id, tf.token, {w} AS weight "
        "FROM tf JOIN v ON tf.token = v.token JOIN dl ON tf.doc_id = dl.doc_id"
    )


def _pagerank_sql(iters: int = 6, d: float = 0.85, rd: int = 9, cd: int = 12) -> str:
    """Generated fixed-iteration PageRank oracle: one CTE per round,
    each evaluating the IDENTICAL pround/DECIMAL-sum trees as
    operators.graph.pagerank (see its module doc). N comes from the
    engine's own count, so no scale constant is baked in."""
    ni = "(SELECT count(*) FROM documents)"
    nd = f"CAST({ni} AS DOUBLE)"
    ctes = [
        (
            f"e AS (SELECT doc_id AS src, (doc_id*7+1) % {ni} AS dst FROM documents "
            f"UNION ALL SELECT doc_id, (doc_id*13+3) % {ni} FROM documents "
            f"UNION ALL SELECT doc_id, (doc_id*31+5) % {ni} FROM documents)"
        ),
        "deg AS (SELECT src, count(*) AS deg FROM e GROUP BY src)",
        "ed AS (SELECT e.src, e.dst, deg.deg FROM e JOIN deg USING (src))",
        (
            "nodes AS (SELECT DISTINCT node FROM "
            "(SELECT src AS node FROM e UNION ALL SELECT dst FROM e))"
        ),
        f"r0 AS (SELECT node, {_pr(f'1.0 / {nd}', rd)} AS rank FROM nodes)",
    ]
    for i in range(1, iters + 1):
        contrib = _pr("r.rank / CAST(ed.deg AS DOUBLE)", cd)
        s = (
            f"SELECT ed.dst AS node, "
            f"CAST(sum(CAST({contrib} AS DECIMAL(38,{cd}))) AS DOUBLE) AS v "
            f"FROM ed JOIN r{i - 1} r ON ed.src = r.node GROUP BY ed.dst"
        )
        newr = _pr(f"(1.0 - {d}) / {nd} + {d} * coalesce(s.v, 0.0)", rd)
        ctes.append(
            f"r{i} AS (SELECT n.node, {newr} AS rank "
            f"FROM nodes n LEFT JOIN ({s}) s USING (node))"
        )
    return (
        "WITH " + ", ".join(ctes) + f" SELECT node AS doc_id, rank FROM r{iters}"
    )


def _kcore_sql(k: int = 2, rounds: int = 4) -> str:
    """k-core oracle: the jaccard pair CTEs (shared with
    dedup_clusters) + ``rounds`` unrolled peel steps, each
    MATERIALIZED (DuckDB would otherwise re-inline the whole chain
    per reference — exponential), ending in degrees >= k over the
    surviving edge set — the exact fixed-round semantics of
    graph.k_core(rounds=N)."""
    cut = _CLUSTER_CTES.index(", edges AS (")
    chain = _CLUSTER_CTES[:cut] + (
        ", e0 AS MATERIALIZED (SELECT id_a AS a, id_b AS b FROM pairs)"
    )
    prev = "e0"
    for i in range(1, rounds + 1):
        chain += (
            f", d{i} AS MATERIALIZED (SELECT node, count(*) AS c FROM ("
            f"SELECT a AS node FROM {prev} UNION ALL SELECT b FROM {prev}) "
            "GROUP BY node)"
            f", e{i} AS MATERIALIZED (SELECT a, b FROM {prev} "
            f"WHERE a IN (SELECT node FROM d{i} WHERE c >= {k}) "
            f"AND b IN (SELECT node FROM d{i} WHERE c >= {k}))"
        )
        prev = f"e{i}"
    return (
        "WITH " + chain + " SELECT node, CAST(c AS BIGINT) AS core_degree "
        "FROM (SELECT node, count(*) AS c FROM ("
        f"SELECT a AS node FROM {prev} UNION ALL SELECT b FROM {prev}) "
        f"GROUP BY node) WHERE c >= {k}"
    )


def _kmeans_ctes(
    k: int | str = 8, iters: int = 2, rd: int = 6, cd: int = 9, ds: int = 12,
    src: str = "embeddings",
) -> tuple[list[str], str]:
    """The fixed-iteration Lloyd CTE chain mirroring
    similarity.kmeans_assign_deterministic, returned as (ctes,
    final-assignment SELECT body) so callers can either emit the
    assignment directly (_kmeans_sql) or build on it (the SemDeDup
    oracle). Per round one assignment CTE (rounded-cosine rank,
    cent_id tiebreak — the ann_ivf pattern) and one means CTE
    (pround'ed components, exact DECIMAL sum / count, pround again —
    the pagerank recipe), empty cells keeping the previous centroid;
    the final body re-assigns every vector."""

    def cos(a: str, b: str) -> str:
        return _pr(_cosine_sql(a, b), rd)

    ctes = [
        f"cents0 AS (SELECT vec_id AS cent_id, embedding AS cent "
        f"FROM {src} ORDER BY vec_id LIMIT {k})"
    ]
    for i in range(1, iters + 1):
        prev = f"cents{i - 1}"
        ctes.append(
            f"a{i} AS (SELECT vec_id, cent_id, embedding FROM ("
            f"SELECT e.vec_id, c.cent_id, e.embedding, "
            f"row_number() OVER (PARTITION BY e.vec_id ORDER BY "
            + cos("e.embedding", "c.cent")
            + f" DESC, c.cent_id ASC) AS cr "
            f"FROM {src} e CROSS JOIN {prev} c) WHERE cr = 1)"
        )
        contrib = _pr("CAST(embedding[d] AS DOUBLE)", cd)
        ctes.append(
            f"m{i} AS (SELECT cent_id, d, "
            + _pr(
                f"CAST(sum(CAST({contrib} AS DECIMAL(38,{ds}))) AS DOUBLE)"
                f" / count(*)",
                cd,
            )
            + f" AS m FROM (SELECT cent_id, embedding, "
            f"unnest(range(1, len(embedding) + 1)) AS d FROM a{i}) "
            f"GROUP BY cent_id, d)"
        )
        ctes.append(
            f"cents{i} AS (SELECT c.cent_id, COALESCE(g.cent, c.cent) AS cent "
            f"FROM {prev} c LEFT JOIN (SELECT cent_id, list(m ORDER BY d) AS cent "
            f"FROM m{i} GROUP BY cent_id) g ON g.cent_id = c.cent_id)"
        )
    fc = cos("e.embedding", "c.cent")
    fin = (
        "SELECT vec_id, cent_id, cosine FROM ("
        f"SELECT e.vec_id, c.cent_id, {fc} AS cosine, "
        f"row_number() OVER (PARTITION BY e.vec_id ORDER BY {fc} DESC, "
        f"c.cent_id ASC) AS cr FROM {src} e CROSS JOIN cents{iters} c) "
        "WHERE cr = 1"
    )
    return ctes, fin


def _kmeans_sql(k: int | str = 8, iters: int = 2, rd: int = 6, cd: int = 9, ds: int = 12) -> str:
    """Generated Lloyd-assignment oracle (see _kmeans_ctes)."""
    ctes, fin = _kmeans_ctes(k, iters, rd, cd, ds)
    return "WITH " + ", ".join(ctes) + " " + fin


def _semdedup_sql(
    kind: str,
    k: int | str = 8,
    iters: int = 2,
    threshold: float = 0.4,
    rd: int = 6,
    src: str = "embeddings",
    id_name: str = "vec_id",
    pre_ctes: list[str] | None = None,
) -> str:
    """SemDeDup oracle (operators.semdedup): the Lloyd assignment CTEs
    (re-sourced onto ``src`` — the raw embeddings table, or a derived
    vector CTE from ``pre_ctes`` such as the hashed-doc-embedding
    chain) plus a within-cluster self-join at the pround'ed pair
    cosine, and for kind='prune' the dominance anti-filter (drop
    every id_b). ``id_name`` renames the output id column."""
    ctes, fin = _kmeans_ctes(k, iters, rd, src=src)
    ctes = (list(pre_ctes) if pre_ctes else []) + list(ctes)
    ctes.append(f"fin AS ({fin})")
    sim = _pr(_cosine_sql("ea.embedding", "eb.embedding"), rd)
    ctes.append(
        "pairs AS (SELECT id_a, id_b, cent_id, cosine FROM ("
        "SELECT a.vec_id AS id_a, b.vec_id AS id_b, a.cent_id, "
        f"{sim} AS cosine "
        "FROM fin a JOIN fin b ON a.cent_id = b.cent_id "
        "AND a.vec_id < b.vec_id "
        f"JOIN {src} ea ON ea.vec_id = a.vec_id "
        f"JOIN {src} eb ON eb.vec_id = b.vec_id) "
        f"WHERE cosine >= {threshold})"
    )
    if kind == "pairs":
        return (
            "WITH " + ", ".join(ctes)
            + " SELECT id_a"
            + ("" if id_name == "vec_id" else f" AS {id_name}_a")
            + ", id_b"
            + ("" if id_name == "vec_id" else f" AS {id_name}_b")
            + ", cent_id, cosine FROM pairs"
        )
    return (
        "WITH " + ", ".join(ctes)
        + f" SELECT vec_id AS {id_name}, cent_id, cosine AS cent_cosine"
        " FROM fin WHERE vec_id NOT IN (SELECT id_b FROM pairs)"
    )


#: hashed-doc-embedding oracle chain (operators.hashembed): one md5
#: per token feeds both the bucket (first 8 hex digits) and the sign
#: (9th digit's parity); signed integer bucket sums densify against
#: the full bucket range and L2-normalize (integer-valued doubles sum
#: exactly in any order, so the fold needs no DECIMAL)
def _hashembed_ctes(dim: int = 64) -> list[str]:
    b = (
        "CAST(CAST('0x' || substr(md5('e#' || tok), 1, 8) AS BIGINT) "
        f"% {dim} AS INT)"
    )
    s = (
        "(CAST(CAST('0x' || substr(md5('e#' || tok), 9, 1) AS BIGINT) "
        "% 2 AS BIGINT) * 2 - 1)"
    )
    return [
        f"htoks AS (SELECT doc_id, unnest({_WORDS}) AS tok FROM documents)",
        f"hsums AS (SELECT doc_id, {b} AS b, CAST(sum({s}) AS BIGINT) AS v "
        "FROM htoks GROUP BY 1, 2)",
        "hdense AS (SELECT d.doc_id, p.pos, "
        "CAST(COALESCE(s.v, 0) AS DOUBLE) AS rawval "
        "FROM (SELECT doc_id FROM documents) d "
        f"CROSS JOIN (SELECT unnest(range(0, {dim})) AS pos) p "
        "LEFT JOIN hsums s ON s.doc_id = d.doc_id AND s.b = p.pos)",
        "hnorm AS (SELECT doc_id, sqrt(sum(rawval * rawval)) AS nrm "
        "FROM hdense GROUP BY doc_id)",
        "hemb AS (SELECT d.doc_id, d.pos, CASE WHEN n.nrm > 0.0 "
        "THEN d.rawval / n.nrm ELSE d.rawval END AS val "
        "FROM hdense d JOIN hnorm n ON n.doc_id = d.doc_id)",
        "hvec AS (SELECT doc_id AS vec_id, list(val ORDER BY pos) "
        "AS embedding FROM hemb GROUP BY doc_id)",
    ]




def _contrastive_sql(
    k: int | str = 8,
    iters: int = 2,
    pos_t: float = 0.4,
    neg_t: float = 0.3,
    n_neg: int = 1,
    rd: int = 6,
) -> str:
    """Contrastive-triplet oracle (semdedup.contrastive_triplets):
    the Lloyd CTEs + the UNthresholded within-cluster pair pass,
    split at the two bars, hardest-negative window per anchor."""
    ctes, fin = _kmeans_ctes(k, iters, rd)
    ctes = list(ctes) + [f"fin AS ({fin})"]
    sim = _pr(_cosine_sql("ea.embedding", "eb.embedding"), rd)
    ctes.append(
        "allp AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b, "
        f"{sim} AS cosine "
        "FROM fin a JOIN fin b ON a.cent_id = b.cent_id "
        "AND a.vec_id < b.vec_id "
        "JOIN embeddings ea ON ea.vec_id = a.vec_id "
        "JOIN embeddings eb ON eb.vec_id = b.vec_id)"
    )
    ctes.append(
        "pos AS (SELECT id_a AS anchor, id_b AS positive, "
        f"cosine AS pos_cos FROM allp WHERE cosine >= {pos_t})"
    )
    ctes.append(
        "neg AS (SELECT anchor, negative, neg_cos FROM ("
        "SELECT id_a AS anchor, id_b AS negative, cosine AS neg_cos, "
        "row_number() OVER (PARTITION BY id_a ORDER BY cosine DESC, "
        f"id_b ASC) AS rn FROM allp WHERE cosine < {neg_t}) "
        f"WHERE rn <= {n_neg})"
    )
    return (
        "WITH " + ", ".join(ctes)
        + " SELECT anchor, positive, negative, pos_cos, neg_cos "
        "FROM pos JOIN neg USING (anchor)"
    )


def _decon_sem_sql(
    k: int | str = 8, iters: int = 1, threshold: float = 0.88, rd: int = 6
) -> str:
    """Semantic-decontamination oracle: the hashembed CTE chain feeds
    the frozen-model incremental matcher (centroids fitted on the
    test split of hvec), contaminated = a same-cell test vector
    within the threshold cosine."""
    pre = list(_hashembed_ctes()) + [
        "exv AS (SELECT vec_id, embedding FROM hvec WHERE vec_id % 10 = 0)"
    ]
    ctes, _fin = _kmeans_ctes(k, iters, rd, src="exv")
    cn = f"cents{iters}"

    def assign(name: str, src: str) -> str:
        c = _pr(_cosine_sql("e.embedding", "c.cent"), rd)
        return (
            f"{name} AS (SELECT vec_id, cent_id FROM ("
            f"SELECT e.vec_id, c.cent_id, row_number() OVER ("
            f"PARTITION BY e.vec_id ORDER BY {c} DESC, c.cent_id ASC) AS cr "
            f"FROM ({src}) e CROSS JOIN {cn} c) WHERE cr = 1)"
        )

    sim = _pr(_cosine_sql("en.embedding", "eo.embedding"), rd)
    post = [
        assign("aex", "SELECT vec_id, embedding FROM exv"),
        assign(
            "anew",
            "SELECT vec_id, embedding FROM hvec WHERE vec_id % 10 <> 0",
        ),
        "dupex AS (SELECT DISTINCT n.vec_id FROM anew n "
        "JOIN aex o ON o.cent_id = n.cent_id "
        "JOIN hvec en ON en.vec_id = n.vec_id "
        "JOIN hvec eo ON eo.vec_id = o.vec_id "
        f"WHERE {sim} >= {threshold})",
    ]
    return (
        "WITH " + ", ".join(pre + list(ctes) + post)
        + " SELECT n.vec_id AS doc_id, n.cent_id, "
        "n.vec_id IN (SELECT vec_id FROM dupex) AS contaminated "
        "FROM anew n"
    )


def _semdedup_incr_sql(
    k: int | str = 8, iters: int = 1, threshold: float = 0.4, rd: int = 6
) -> str:
    """Incremental SemDeDup oracle (semdedup.semantic_dedup_incremental):
    centroids fitted on the EXISTING (even-id) half and frozen, both
    halves assigned under the house rule, pair checks equality-joined
    on the cell, the three-way status CASE."""
    pre = [
        "exv AS (SELECT vec_id, embedding FROM embeddings "
        "WHERE vec_id % 2 = 0)"
    ]
    ctes, _fin = _kmeans_ctes(k, iters, rd, src="exv")
    cn = f"cents{iters}"

    def assign(name: str, src: str) -> str:
        c = _pr(_cosine_sql("e.embedding", "c.cent"), rd)
        return (
            f"{name} AS (SELECT vec_id, cent_id FROM ("
            f"SELECT e.vec_id, c.cent_id, row_number() OVER ("
            f"PARTITION BY e.vec_id ORDER BY {c} DESC, c.cent_id ASC) AS cr "
            f"FROM ({src}) e CROSS JOIN {cn} c) WHERE cr = 1)"
        )

    sim = _pr(_cosine_sql("en.embedding", "eo.embedding"), rd)
    post = [
        assign("aex", "SELECT vec_id, embedding FROM exv"),
        assign(
            "anew",
            "SELECT vec_id, embedding FROM embeddings WHERE vec_id % 2 = 1",
        ),
        "dupex AS (SELECT DISTINCT n.vec_id FROM anew n "
        "JOIN aex o ON o.cent_id = n.cent_id "
        "JOIN embeddings en ON en.vec_id = n.vec_id "
        "JOIN embeddings eo ON eo.vec_id = o.vec_id "
        f"WHERE {sim} >= {threshold})",
        "dupb AS (SELECT DISTINCT n.vec_id FROM anew n "
        "JOIN anew o ON o.cent_id = n.cent_id AND o.vec_id < n.vec_id "
        "JOIN embeddings en ON en.vec_id = n.vec_id "
        "JOIN embeddings eo ON eo.vec_id = o.vec_id "
        f"WHERE {sim} >= {threshold})",
    ]
    return (
        "WITH " + ", ".join(pre + list(ctes) + post)
        + " SELECT n.vec_id, n.cent_id, CASE "
        "WHEN n.vec_id IN (SELECT vec_id FROM dupex) THEN 'dup_of_existing' "
        "WHEN n.vec_id IN (SELECT vec_id FROM dupb) THEN 'dup_in_batch' "
        "ELSE 'new' END AS status FROM anew n"
    )


def _pq_ctes(
    m: int = 4,
    width: int = 16,
    k: int = 8,
    iters: int = 1,
    rd: int = 6,
    cd: int = 9,
    ds: int = 12,
    src: str = "SELECT vec_id, embedding FROM embeddings",
) -> list[str]:
    """Product-quantization oracle CTEs mirroring operators.pq: the
    subvector table (over ``src``, a SELECT producing (vec_id,
    embedding) — the raw corpus for ann_pq_*, the IVF residual table
    for ann_ivf_pq), per-subspace Lloyd codebooks (squared L2 via the
    dot identity a·a + c·c − 2·a·c, pround'ed, code-id tiebreak;
    pround/DECIMAL means; empty codes keep their centroid), and the
    final per-(vector, subspace) encoding."""

    def d2(a: str, b: str) -> str:
        da = _DOT.format(a=a, b=a)
        db = _DOT.format(a=b, b=b)
        dab = _DOT.format(a=a, b=b)
        return _pr(f"({da} + {db}) - (2.0 * {dab})", rd)

    ctes = [
        f"sv AS (SELECT vec_id, sub, "
        f"list_slice(embedding, sub*{width}+1, sub*{width}+{width}) AS sv "
        f"FROM (SELECT vec_id, embedding, unnest(range(0, {m})) AS sub "
        f"FROM ({src})))",
        f"cb0 AS (SELECT sub, vec_id AS code_id, sv AS cent FROM sv "
        f"WHERE vec_id IN (SELECT vec_id FROM embeddings "
        f"ORDER BY vec_id LIMIT {k}))",
    ]
    for i in range(1, iters + 1):
        prev = f"cb{i - 1}"
        dd = d2("s.sv", "c.cent")
        ctes.append(
            f"a{i} AS (SELECT vec_id, sub, code_id, sv FROM ("
            f"SELECT s.vec_id, s.sub, c.code_id, s.sv, "
            f"row_number() OVER (PARTITION BY s.vec_id, s.sub "
            f"ORDER BY {dd} ASC, c.code_id ASC) AS rn "
            f"FROM sv s JOIN {prev} c ON c.sub = s.sub) WHERE rn = 1)"
        )
        comp = _pr("CAST(sv[d] AS DOUBLE)", cd)
        ctes.append(
            f"m{i} AS (SELECT sub, code_id, d, "
            + _pr(
                f"CAST(sum(CAST({comp} AS DECIMAL(38,{ds}))) AS DOUBLE)"
                " / count(*)",
                cd,
            )
            + f" AS mval FROM (SELECT sub, code_id, sv, "
            f"unnest(range(1, len(sv)+1)) AS d FROM a{i}) "
            "GROUP BY sub, code_id, d)"
        )
        ctes.append(
            f"cb{i} AS (SELECT c.sub, c.code_id, "
            "COALESCE(g.cent, c.cent) AS cent "
            f"FROM {prev} c LEFT JOIN (SELECT sub, code_id, "
            f"list(mval ORDER BY d) AS cent FROM m{i} "
            "GROUP BY sub, code_id) g "
            "ON g.sub = c.sub AND g.code_id = c.code_id)"
        )
    fdd = d2("s.sv", "c.cent")
    ctes.append(
        "enc AS (SELECT vec_id, sub, code_id, dist2 FROM ("
        f"SELECT s.vec_id, s.sub, c.code_id, {fdd} AS dist2, "
        "row_number() OVER (PARTITION BY s.vec_id, s.sub "
        f"ORDER BY {fdd} ASC, c.code_id ASC) AS rn "
        f"FROM sv s JOIN cb{iters} c ON c.sub = s.sub) WHERE rn = 1)"
    )
    return ctes


def _pq_sql(
    kind: str,
    m: int = 4,
    width: int = 16,
    k: int = 8,
    iters: int = 1,
    topk: int = 5,
    rd: int = 6,
    ds: int = 12,
) -> str:
    """PQ oracle: kind='codes' emits the encoding table; kind='topk'
    builds the per-query ADC lookup table and ranks the DECIMAL-exact
    subspace-distance sums (distance asc, id asc)."""
    ctes = _pq_ctes(m, width, k, iters, rd=rd, ds=ds)
    if kind == "codes":
        return (
            "WITH " + ", ".join(ctes)
            + " SELECT vec_id, sub, code_id, dist2 FROM enc"
        )

    def d2(a: str, b: str) -> str:
        da = _DOT.format(a=a, b=a)
        db = _DOT.format(a=b, b=b)
        dab = _DOT.format(a=a, b=b)
        return _pr(f"({da} + {db}) - (2.0 * {dab})", rd)

    qdd = d2("q.sv", "c.cent")
    ctes.append(
        f"lut AS (SELECT q.vec_id AS query_id, q.sub, c.code_id, "
        f"{qdd} AS dist2 FROM sv q JOIN cb{iters} c ON c.sub = q.sub "
        "WHERE q.vec_id < 5)"
    )
    ctes.append(
        "score AS (SELECT l.query_id, e.vec_id, "
        f"CAST(sum(CAST(l.dist2 AS DECIMAL(38,{ds}))) AS DOUBLE) AS adist "
        "FROM enc e JOIN lut l ON l.sub = e.sub AND l.code_id = e.code_id "
        "GROUP BY l.query_id, e.vec_id)"
    )
    return (
        "WITH " + ", ".join(ctes)
        + " SELECT query_id, vec_id, adist, rank FROM ("
        "SELECT query_id, vec_id, adist, row_number() OVER ("
        "PARTITION BY query_id ORDER BY adist ASC, vec_id ASC) AS rank "
        f"FROM score) WHERE rank <= {topk}"
    )


def _ivfpq_sql(
    nlist: int = 16,
    nprobe: int = 4,
    m: int = 4,
    width: int = 16,
    k: int = 8,
    iters: int = 1,
    topk: int = 5,
    rd: int = 6,
    ds: int = 12,
) -> str:
    """IVFADC oracle (operators.pq.ivfpq_topk): the ann_ivf cell /
    probe CTEs (seeded lowest-id centroids, rounded-cosine rank),
    residuals v − cent(cell) per element, the PQ chain over the
    residual table, per-(query, probed cell) residual lookup tables,
    and the DECIMAL-exact subspace-distance sum ranked (asc, id asc)
    with self-matches excluded."""
    resid = (
        "list_transform(range(1, len({v}) + 1), i -> "
        "CAST({v}[i] AS DOUBLE) - CAST({c}[i] AS DOUBLE))"
    )
    pre = [
        f"cents AS (SELECT vec_id AS cent_id, embedding AS cent "
        f"FROM embeddings ORDER BY vec_id LIMIT {nlist})",
        "cell AS (SELECT neighbor_id, cent_id, cv, cent FROM ("
        "SELECT e.vec_id AS neighbor_id, c.cent_id, e.embedding AS cv, "
        "c.cent, row_number() OVER (PARTITION BY e.vec_id ORDER BY "
        + _pr(_cosine_sql("e.embedding", "c.cent"))
        + " DESC, c.cent_id ASC) AS cr "
        "FROM embeddings e CROSS JOIN cents c) WHERE cr = 1)",
        "res AS (SELECT neighbor_id AS vec_id, cent_id AS cell, "
        + resid.format(v="cv", c="cent")
        + " AS rv FROM cell)",
    ]
    pq = _pq_ctes(
        m, width, k, iters, rd=rd, ds=ds,
        src="SELECT vec_id, rv AS embedding FROM res",
    )

    def d2(a: str, b: str) -> str:
        da = _DOT.format(a=a, b=a)
        db = _DOT.format(a=b, b=b)
        dab = _DOT.format(a=a, b=b)
        return _pr(f"({da} + {db}) - (2.0 * {dab})", rd)

    qdd = d2("q.sv", "c.cent")
    post = [
        "probe AS (SELECT query_id, cent_id, qv, cent FROM ("
        "SELECT q.vec_id AS query_id, c.cent_id, q.embedding AS qv, "
        "c.cent, row_number() OVER (PARTITION BY q.vec_id ORDER BY "
        + _pr(_cosine_sql("q.embedding", "c.cent"))
        + " DESC, c.cent_id ASC) AS cr "
        "FROM (SELECT * FROM embeddings WHERE vec_id < 5) q "
        f"CROSS JOIN cents c) WHERE cr <= {nprobe})",
        "qres AS (SELECT query_id, cent_id AS cell, "
        + resid.format(v="qv", c="cent")
        + " AS rv FROM probe)",
        f"qsv AS (SELECT query_id, cell, sub, "
        f"list_slice(rv, sub*{width}+1, sub*{width}+{width}) AS sv "
        f"FROM (SELECT query_id, cell, rv, unnest(range(0, {m})) AS sub "
        "FROM qres))",
        f"lut AS (SELECT q.query_id, q.cell, q.sub, c.code_id, "
        f"{qdd} AS dist2 FROM qsv q JOIN cb{iters} c ON c.sub = q.sub)",
        "score AS (SELECT l.query_id, e.vec_id, "
        f"CAST(sum(CAST(l.dist2 AS DECIMAL(38,{ds}))) AS DOUBLE) AS adist "
        "FROM enc e JOIN res r ON r.vec_id = e.vec_id "
        "JOIN lut l ON l.cell = r.cell AND l.sub = e.sub "
        "AND l.code_id = e.code_id "
        "WHERE l.query_id <> e.vec_id "
        "GROUP BY l.query_id, e.vec_id)",
    ]
    return (
        "WITH " + ", ".join(pre + pq + post)
        + " SELECT query_id, vec_id, adist, rank FROM ("
        "SELECT query_id, vec_id, adist, row_number() OVER ("
        "PARTITION BY query_id ORDER BY adist ASC, vec_id ASC) AS rank "
        f"FROM score) WHERE rank <= {topk}"
    )




def _quality_rules_sql() -> str:
    """Mirror of operators.text.quality_rule_flags at its default
    thresholds — same pround'ed ratios, stopword union generated from
    the same STOPWORDS table."""
    from margaret_spark.operators.text import STOPWORDS

    all_stop = ",".join(
        f"'{w}'" for w in sorted({w for sw in STOPWORDS.values() for w in sw})
    )
    mean_tl = _pr(
        "CASE WHEN len(toks) > 0 THEN "
        "CAST(length(regexp_replace(text, '\\s', '', 'g')) AS DOUBLE) / len(toks) "
        "ELSE 0.0 END",
        4,
    )
    sym = _pr(
        "CASE WHEN length(text) > 0 THEN CAST("
        "(length(text) - length(regexp_replace(text, '[.,;:!?''\"()\\[\\]{}-]', '', 'g'))) + "
        "(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')))"
        " AS DOUBLE) / length(text) ELSE 0.0 END",
        4,
    )
    dr = _pr(
        "CASE WHEN len(toks) > 0 THEN "
        "CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) ELSE 0.0 END",
        4,
    )
    return (
        "SELECT doc_id, n_tokens, mean_token_len, symbol_ratio, distinct_ratio, "
        "stopword_hits, ok_length, ok_token_len, ok_symbols, ok_diversity, "
        "ok_stopwords, (ok_length AND ok_token_len AND ok_symbols AND "
        "ok_diversity AND ok_stopwords) AS keep FROM ("
        "SELECT doc_id, n_tokens, mean_token_len, symbol_ratio, distinct_ratio, "
        "stopword_hits, "
        "(n_tokens >= 8 AND n_tokens <= 100000) AS ok_length, "
        "(mean_token_len >= 2.0 AND mean_token_len <= 12.0) AS ok_token_len, "
        "(symbol_ratio <= 0.3) AS ok_symbols, "
        "(distinct_ratio >= 0.2) AS ok_diversity, "
        "(stopword_hits >= 1) AS ok_stopwords FROM ("
        "SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens, "
        f"{mean_tl} AS mean_token_len, {sym} AS symbol_ratio, "
        f"{dr} AS distinct_ratio, "
        f"CAST(len(list_filter(toks, t -> list_contains([{all_stop}], t))) AS BIGINT) "
        "AS stopword_hits "
        f"FROM (SELECT doc_id, text, {_WORDS} AS toks FROM documents)))"
    )


def _langid_sql() -> str:
    """The lang_id oracle, GENERATED from the same SCRIPTS/STOPWORDS
    tables the Spark operator reads — widening the language table is a
    one-place change that keeps both engines in lockstep."""
    from margaret_spark.operators.text import SCRIPTS, STOPWORDS

    langs = list(STOPWORDS)
    g = "greatest(" + ", ".join(f"s_{l}" for l in langs) + ")"
    case = ["CASE"]
    for lang, pat in SCRIPTS.items():
        case.append(f"WHEN regexp_matches(text, '{pat}') THEN '{lang}'")
    case.append(f"WHEN {g} <= 0 THEN 'und'")
    for lang in langs[:-1]:
        case.append(f"WHEN s_{lang} = {g} THEN '{lang}'")
    case.append(f"ELSE '{langs[-1]}' END")
    scores = ", ".join(
        "len(list_filter(toks, t -> list_contains(["
        + ",".join(f"'{w}'" for w in sw)
        + f"], t))) AS s_{lang}"
        for lang, sw in STOPWORDS.items()
    )
    return (
        "SELECT doc_id, " + " ".join(case) + " AS pred_lang FROM ("
        f"SELECT doc_id, text, {_WORDS} AS toks, {scores} FROM documents)"
    )


def _ngram_cov_ctes(n: int, alias: str) -> str:
    """CTE chain ``{alias}`` → (doc_id, total, n_grams, z, top) for
    word ``n``-grams: ``z`` is the (gram, count) struct list over the
    distinct grams, ``top`` the (-count, gram) struct minimum — the
    same count-desc/gram-asc tie-break the Spark operator applies via
    ``array_min``. Assumes a prior ``t AS (SELECT doc_id, toks …)``."""
    return (
        f"g_{alias} AS (SELECT doc_id, "
        f"list_transform(range(1, greatest(len(toks) - {n - 1}, 0) + 1), "
        f"i -> array_to_string(toks[i:i+{n - 1}], ' ')) AS g, "
        "length(array_to_string(toks, ' ')) AS total FROM t), "
        f"z_{alias} AS (SELECT doc_id, total, len(g) AS n_grams, "
        "[{'g': d, 'c': len(list_filter(g, x -> x = d))} "
        f"for d in list_distinct(g)] AS z FROM g_{alias}), "
        f"{alias} AS (SELECT doc_id, total, n_grams, z, "
        "list_min([{'nc': -s.c, 'g': s.g} for s in z]) AS top "
        f"FROM z_{alias})"
    )


def _ngram_top_frac(digits: int = 4) -> str:
    return _pr(
        "CASE WHEN total > 0 THEN "
        "CAST(COALESCE(-top.nc, 0) * length(COALESCE(top.g, '')) AS DOUBLE)"
        " / total ELSE 0.0 END",
        digits,
    )


def _ngram_dup_frac(digits: int = 4) -> str:
    return _pr(
        "CASE WHEN total > 0 THEN "
        "CAST(COALESCE(list_sum([s.c * length(s.g) for s in z if s.c >= 2])"
        ", 0) AS DOUBLE) / total ELSE 0.0 END",
        digits,
    )


def _ngram_coverage_sql(n: int = 2, digits: int = 4) -> str:
    """text_ngram_coverage oracle: the single-n detailed report."""
    return (
        f"WITH t AS (SELECT doc_id, {_WORDS} AS toks FROM documents), "
        + _ngram_cov_ctes(n, "m")
        + " SELECT doc_id, CAST(n_grams AS BIGINT) AS n_grams, "
        "COALESCE(top.g, '') AS top_gram, "
        "CAST(COALESCE(-top.nc, 0) AS BIGINT) AS top_count, "
        + _ngram_top_frac(digits)
        + " AS top_frac, "
        + _ngram_dup_frac(digits)
        + " AS dup_frac FROM m"
    )


def _gopher_battery_sql(
    top_ns: tuple[int, ...] = (2, 3, 4),
    dup_ns: tuple[int, ...] = (3, 4),
    digits: int = 4,
) -> str:
    """text_gopher_battery oracle: one CTE chain per n, joined on
    doc_id (every chain emits one row per document)."""
    ctes = [f"t AS (SELECT doc_id, {_WORDS} AS toks FROM documents)"]
    selects = []
    joins = []
    for n in top_ns:
        a = f"top{n}"
        ctes.append(_ngram_cov_ctes(n, f"m_{a}"))
        ctes.append(
            f"{a} AS (SELECT doc_id, "
            + _ngram_top_frac(digits)
            + f" AS top_{n}gram_frac FROM m_{a})"
        )
        selects.append(f"top_{n}gram_frac")
        joins.append(a)
    for n in dup_ns:
        a = f"dup{n}"
        ctes.append(_ngram_cov_ctes(n, f"m_{a}"))
        ctes.append(
            f"{a} AS (SELECT doc_id, "
            + _ngram_dup_frac(digits)
            + f" AS dup_{n}gram_frac FROM m_{a})"
        )
        selects.append(f"dup_{n}gram_frac")
        joins.append(a)
    sql = "WITH " + ", ".join(ctes)
    sql += f" SELECT doc_id, {', '.join(selects)} FROM {joins[0]}"
    for j in joins[1:]:
        sql += f" JOIN {j} USING (doc_id)"
    return sql


def _line_repetition_sql(digits: int = 4) -> str:
    """text_line_repetition oracle: replay the planted 6-token-line
    construction (first line appended again for doc_id % 3 = 0) on the
    token LIST directly — equivalent to the Spark side's
    join-with-newlines-then-resplit because chunk lines are never
    empty and never contain the separator."""
    return (
        f"WITH t AS (SELECT doc_id, {_WORDS} AS toks FROM documents), "
        "l0 AS (SELECT doc_id, "
        "[array_to_string(toks[(i-1)*6+1:(i-1)*6+6], ' ') "
        "for i in range(1, CAST(ceil(len(toks) / 6.0) AS BIGINT) + 1)]"
        " AS lines FROM t), "
        "l1 AS (SELECT doc_id, CASE WHEN doc_id % 3 = 0 THEN "
        "list_concat(lines, lines[1:1]) ELSE lines END AS lines FROM l0), "
        "z AS (SELECT doc_id, len(lines) AS n_lines, "
        "list_sum([length(x)::BIGINT for x in lines]) AS char_total, "
        "[{'g': d, 'c': len(list_filter(lines, x -> x = d))} "
        "for d in list_distinct(lines)] AS z FROM l1) "
        "SELECT doc_id, CAST(n_lines AS BIGINT) AS n_lines, "
        "CAST(len(z) AS BIGINT) AS n_distinct_lines, "
        + _pr(
            "CASE WHEN n_lines > 0 THEN "
            "CAST(n_lines - len(z) AS DOUBLE) / n_lines ELSE 0.0 END",
            digits,
        )
        + " AS dup_line_frac, "
        + _pr(
            "CASE WHEN COALESCE(char_total, 0) > 0 THEN "
            "CAST(COALESCE(list_sum("
            "[s.c * length(s.g) for s in z if s.c >= 2]), 0) AS DOUBLE)"
            " / char_total ELSE 0.0 END",
            digits,
        )
        + " AS dup_char_frac FROM z"
    )


def _icbrt_limit(src: str, floor: int) -> str:
    """LIMIT/bound expression mirroring ``semdedup.icbrt_ceil``: the
    per-level branching factor k = max(floor, ceil(∛N)) derived FROM
    THE DATA. Float cbrt can sit 1 ulp off at perfect cubes, so the
    integer correction CASE makes the value exact — bit-agreed with
    the Python exact loop on every N."""
    return (
        f"(SELECT greatest({int(floor)}, "
        "CASE WHEN r * r * r < n THEN r + 1 "
        "WHEN (r - 1) * (r - 1) * (r - 1) >= n THEN r - 1 "
        "ELSE r END) FROM (SELECT CAST(ceil(cbrt(count(*))) AS BIGINT) "
        f"AS r, count(*) AS n FROM {src}))"
    )


def _hier_fit_assign_ctes(
    k1: int | str,
    k2: int | str,
    iters: int,
    rd: int,
    cd: int,
    ds: int,
    src: str,
) -> list[str]:
    """The shared hierarchical-quantizer CTE chain: coarse Lloyd
    (_kmeans_ctes) → coarse assignment (``coarse``/``av``) → per-cell
    sub-level Lloyd (``sub0..sub{iters}``) → the full corpus
    assignment ``hfin`` (vec_id, cent_id, sub_id, cosine). Pure
    extraction from _hier_semdedup_sql — byte-identical output — so
    the pair/prune/assign/search oracles all build on one chain."""

    def cos(a: str, b: str) -> str:
        return _pr(_cosine_sql(a, b), rd)

    ctes, fin = _kmeans_ctes(k1, iters, rd, cd, ds, src=src)
    ctes = list(ctes)
    ctes.append(f"coarse AS ({fin})")
    ctes.append(
        f"av AS (SELECT f.vec_id, f.cent_id, e.embedding "
        f"FROM coarse f JOIN {src} e ON e.vec_id = f.vec_id)"
    )
    # Mirror semdedup.hier_centroids' empty-cell seed: a coarse cell
    # with no fit-corpus member (Lloyd keeps stale centroids for empty
    # cells) gets sub_id=1 = the coarse centroid itself, so the frozen
    # model assigns EVERY arrival a (cent, sub) cell.
    ctes.append(
        "sub0 AS (SELECT cent_id, CAST(sub_id AS INT) AS sub_id, "
        "embedding AS cent FROM ("
        "SELECT cent_id, embedding, row_number() OVER ("
        "PARTITION BY cent_id ORDER BY vec_id) AS sub_id FROM av) "
        f"WHERE sub_id <= {k2} "
        f"UNION ALL SELECT c.cent_id, CAST(1 AS INT) AS sub_id, c.cent "
        f"FROM cents{iters} c "
        "WHERE c.cent_id NOT IN (SELECT cent_id FROM av))"
    )
    for i in range(1, iters + 1):
        prev = f"sub{i - 1}"
        ctes.append(
            f"sa{i} AS (SELECT vec_id, cent_id, sub_id, embedding FROM ("
            "SELECT a.vec_id, a.cent_id, c.sub_id, a.embedding, "
            "row_number() OVER (PARTITION BY a.vec_id ORDER BY "
            + cos("a.embedding", "c.cent")
            + " DESC, c.sub_id ASC) AS cr "
            f"FROM av a JOIN {prev} c ON c.cent_id = a.cent_id) "
            "WHERE cr = 1)"
        )
        contrib = _pr("CAST(embedding[d] AS DOUBLE)", cd)
        ctes.append(
            f"sm{i} AS (SELECT cent_id, sub_id, d, "
            + _pr(
                f"CAST(sum(CAST({contrib} AS DECIMAL(38,{ds}))) AS DOUBLE)"
                " / count(*)",
                cd,
            )
            + " AS m FROM (SELECT cent_id, sub_id, embedding, "
            f"unnest(range(1, len(embedding) + 1)) AS d FROM sa{i}) "
            "GROUP BY cent_id, sub_id, d)"
        )
        ctes.append(
            f"sub{i} AS (SELECT c.cent_id, c.sub_id, "
            "COALESCE(g.cent, c.cent) AS cent "
            f"FROM {prev} c LEFT JOIN (SELECT cent_id, sub_id, "
            f"list(m ORDER BY d) AS cent FROM sm{i} "
            "GROUP BY cent_id, sub_id) g "
            "ON g.cent_id = c.cent_id AND g.sub_id = c.sub_id)"
        )
    fc = cos("a.embedding", "c.cent")
    ctes.append(
        "hfin AS (SELECT vec_id, cent_id, sub_id, cosine FROM ("
        f"SELECT a.vec_id, a.cent_id, c.sub_id, {fc} AS cosine, "
        f"row_number() OVER (PARTITION BY a.vec_id ORDER BY {fc} DESC, "
        f"c.sub_id ASC) AS cr FROM av a JOIN sub{iters} c "
        "ON c.cent_id = a.cent_id) WHERE cr = 1)"
    )
    return ctes


def _hier_semdedup_sql(
    kind: str,
    k1: int | str = 4,
    k2: int | str = 4,
    iters: int = 2,
    threshold: float = 0.4,
    rd: int = 6,
    cd: int = 9,
    ds: int = 12,
    src: str = "embeddings",
) -> str:
    """Hierarchical SemDeDup oracle (operators.semdedup
    .semantic_dedup_pairs_hier / semantic_prune_hier): the shared
    fit+assignment chain (_hier_fit_assign_ctes) plus the pair join
    keyed on (cent_id, sub_id), and for kind='prune' the dominance
    anti-filter; kind='assign' emits the assignment alone under the
    keeper-sink names (the streaming at-ingest twin)."""
    ctes = _hier_fit_assign_ctes(k1, k2, iters, rd, cd, ds, src)
    sim = _pr(_cosine_sql("ea.embedding", "eb.embedding"), rd)
    ctes.append(
        "pairs AS (SELECT id_a, id_b, cent_id, sub_id, cosine FROM ("
        "SELECT a.vec_id AS id_a, b.vec_id AS id_b, a.cent_id, "
        f"a.sub_id, {sim} AS cosine "
        "FROM hfin a JOIN hfin b ON a.cent_id = b.cent_id "
        "AND a.sub_id = b.sub_id AND a.vec_id < b.vec_id "
        f"JOIN {src} ea ON ea.vec_id = a.vec_id "
        f"JOIN {src} eb ON eb.vec_id = b.vec_id) "
        f"WHERE cosine >= {threshold})"
    )
    if kind == "assign":
        # the frozen-model assignment alone (streaming at-ingest twin):
        # drop the pair CTE, emit hfin under the keeper-sink names
        return (
            "WITH " + ", ".join(ctes[:-1])
            + " SELECT vec_id AS seq, cent_id AS cell, sub_id AS sub, "
            "cosine AS cos FROM hfin"
        )
    if kind == "pairs":
        return (
            "WITH " + ", ".join(ctes)
            + " SELECT id_a, id_b, cent_id, sub_id, cosine FROM pairs"
        )
    return (
        "WITH " + ", ".join(ctes)
        + " SELECT vec_id, cent_id, sub_id, cosine AS cent_cosine "
        "FROM hfin WHERE vec_id NOT IN (SELECT id_b FROM pairs)"
    )


def _hier_incr_sql(
    k1: int | str = 4,
    k2: int | str = 4,
    iters: int = 1,
    threshold: float = 0.4,
    rd: int = 6,
    cd: int = 9,
    ds: int = 12,
) -> str:
    """Incremental hierarchical SemDeDup oracle (semdedup
    .semantic_dedup_incremental_hier): the two-level quantizer fitted
    on the EXISTING (even-id) half and frozen — coarse Lloyd CTEs +
    the per-cell sub-level chain, both re-sourced onto ``exv`` — then
    both halves assigned coarse→sub under the house rule, pair checks
    equality-joined on the (cent_id, sub_id) cell, the three-way
    status CASE."""

    def cos(a: str, b: str) -> str:
        return _pr(_cosine_sql(a, b), rd)

    pre = [
        "exv AS (SELECT vec_id, embedding FROM embeddings "
        "WHERE vec_id % 2 = 0)"
    ]
    ctes, fin = _kmeans_ctes(k1, iters, rd, cd, ds, src="exv")
    ctes = pre + list(ctes)
    ctes.append(f"coarse AS ({fin})")
    ctes.append(
        "av AS (SELECT f.vec_id, f.cent_id, e.embedding "
        "FROM coarse f JOIN exv e ON e.vec_id = f.vec_id)"
    )
    # Same empty-cell seed as _hier_fit_assign_ctes (see there): new
    # arrivals (odd vec_ids) may land nearest to a coarse cell no
    # fit-corpus vector chose; without the seed both engines would
    # drop them (ADVICE r9) — with it, both keep them.
    ctes.append(
        "sub0 AS (SELECT cent_id, CAST(sub_id AS INT) AS sub_id, "
        "embedding AS cent FROM ("
        "SELECT cent_id, embedding, row_number() OVER ("
        "PARTITION BY cent_id ORDER BY vec_id) AS sub_id FROM av) "
        f"WHERE sub_id <= {k2} "
        f"UNION ALL SELECT c.cent_id, CAST(1 AS INT) AS sub_id, c.cent "
        f"FROM cents{iters} c "
        "WHERE c.cent_id NOT IN (SELECT cent_id FROM av))"
    )
    for i in range(1, iters + 1):
        prev = f"sub{i - 1}"
        ctes.append(
            f"sa{i} AS (SELECT vec_id, cent_id, sub_id, embedding FROM ("
            "SELECT a.vec_id, a.cent_id, c.sub_id, a.embedding, "
            "row_number() OVER (PARTITION BY a.vec_id ORDER BY "
            + cos("a.embedding", "c.cent")
            + " DESC, c.sub_id ASC) AS cr "
            f"FROM av a JOIN {prev} c ON c.cent_id = a.cent_id) "
            "WHERE cr = 1)"
        )
        contrib = _pr("CAST(embedding[d] AS DOUBLE)", cd)
        ctes.append(
            f"sm{i} AS (SELECT cent_id, sub_id, d, "
            + _pr(
                f"CAST(sum(CAST({contrib} AS DECIMAL(38,{ds}))) AS DOUBLE)"
                " / count(*)",
                cd,
            )
            + " AS m FROM (SELECT cent_id, sub_id, embedding, "
            f"unnest(range(1, len(embedding) + 1)) AS d FROM sa{i}) "
            "GROUP BY cent_id, sub_id, d)"
        )
        ctes.append(
            f"sub{i} AS (SELECT c.cent_id, c.sub_id, "
            "COALESCE(g.cent, c.cent) AS cent "
            f"FROM {prev} c LEFT JOIN (SELECT cent_id, sub_id, "
            f"list(m ORDER BY d) AS cent FROM sm{i} "
            "GROUP BY cent_id, sub_id) g "
            "ON g.cent_id = c.cent_id AND g.sub_id = c.sub_id)"
        )
    cn, sn = f"cents{iters}", f"sub{iters}"

    def assign(name: str, src: str) -> str:
        c1 = cos("e.embedding", "c.cent")
        c2 = cos("e.embedding", "s.cent")
        return (
            f"{name}_c AS (SELECT vec_id, cent_id FROM ("
            f"SELECT e.vec_id, c.cent_id, row_number() OVER ("
            f"PARTITION BY e.vec_id ORDER BY {c1} DESC, c.cent_id ASC) AS cr "
            f"FROM ({src}) e CROSS JOIN {cn} c) WHERE cr = 1), "
            f"{name} AS (SELECT vec_id, cent_id, sub_id FROM ("
            f"SELECT v.vec_id, v.cent_id, s.sub_id, row_number() OVER ("
            f"PARTITION BY v.vec_id ORDER BY {c2} DESC, s.sub_id ASC) AS cr "
            f"FROM {name}_c v JOIN {sn} s ON s.cent_id = v.cent_id "
            f"JOIN embeddings e ON e.vec_id = v.vec_id) WHERE cr = 1)"
        )

    sim = _pr(_cosine_sql("en.embedding", "eo.embedding"), rd)
    ctes.append(assign("aex", "SELECT vec_id, embedding FROM exv"))
    ctes.append(
        assign(
            "anew",
            "SELECT vec_id, embedding FROM embeddings WHERE vec_id % 2 = 1",
        )
    )
    ctes.append(
        "dupex AS (SELECT DISTINCT n.vec_id FROM anew n "
        "JOIN aex o ON o.cent_id = n.cent_id AND o.sub_id = n.sub_id "
        "JOIN embeddings en ON en.vec_id = n.vec_id "
        "JOIN embeddings eo ON eo.vec_id = o.vec_id "
        f"WHERE {sim} >= {threshold})"
    )
    ctes.append(
        "dupb AS (SELECT DISTINCT n.vec_id FROM anew n "
        "JOIN anew o ON o.cent_id = n.cent_id AND o.sub_id = n.sub_id "
        "AND o.vec_id < n.vec_id "
        "JOIN embeddings en ON en.vec_id = n.vec_id "
        "JOIN embeddings eo ON eo.vec_id = o.vec_id "
        f"WHERE {sim} >= {threshold})"
    )
    return (
        "WITH " + ", ".join(ctes)
        + " SELECT n.vec_id, n.cent_id, n.sub_id, CASE "
        "WHEN n.vec_id IN (SELECT vec_id FROM dupex) THEN 'dup_of_existing' "
        "WHEN n.vec_id IN (SELECT vec_id FROM dupb) THEN 'dup_in_batch' "
        "ELSE 'new' END AS status FROM anew n"
    )


def _hier_ivf_sql(
    k: int = 5,
    k1: int | str = 4,
    k2: int | str = 4,
    iters: int = 2,
    nprobe1: int = 2,
    nprobe2: int = 4,
    rd: int = 6,
    cd: int = 9,
    ds: int = 12,
    src: str = "embeddings",
    query_pred: str = "vec_id < 5",
) -> str:
    """Two-level IVF search oracle (semdedup.hier_ivf_topk): the
    shared fit+assignment chain, then per query the nprobe1 nearest
    COARSE cells (rounded cosine desc, cent_id asc), the nprobe2
    nearest SUB-cells among those cells' sub-centroids (tie-break
    cent_id asc, sub_id asc), and exact cosine top-k over the probed
    sub-cells' members (self excluded)."""

    def cos(a: str, b: str) -> str:
        return _pr(_cosine_sql(a, b), rd)

    ctes = _hier_fit_assign_ctes(k1, k2, iters, rd, cd, ds, src)
    cn, sn = f"cents{iters}", f"sub{iters}"
    ctes.append(
        "probe1 AS (SELECT query_id, cent_id, embedding FROM ("
        "SELECT e.vec_id AS query_id, c.cent_id, e.embedding, "
        "row_number() OVER (PARTITION BY e.vec_id ORDER BY "
        + cos("e.embedding", "c.cent")
        + " DESC, c.cent_id ASC) AS cr "
        f"FROM (SELECT vec_id, embedding FROM {src} "
        f"WHERE {query_pred}) e CROSS JOIN {cn} c) "
        f"WHERE cr <= {nprobe1})"
    )
    ctes.append(
        "probe2 AS (SELECT query_id, cent_id, sub_id FROM ("
        "SELECT p.query_id, p.cent_id, s.sub_id, "
        "row_number() OVER (PARTITION BY p.query_id ORDER BY "
        + cos("p.embedding", "s.cent")
        + " DESC, p.cent_id ASC, s.sub_id ASC) AS cr "
        f"FROM probe1 p JOIN {sn} s ON s.cent_id = p.cent_id) "
        f"WHERE cr <= {nprobe2})"
    )
    qc = cos("qe.embedding", "ne.embedding")
    return (
        "WITH " + ", ".join(ctes)
        + " SELECT query_id, neighbor_id, cosine, rank FROM ("
        f"SELECT p.query_id, h.vec_id AS neighbor_id, {qc} AS cosine, "
        "CAST(row_number() OVER (PARTITION BY p.query_id "
        f"ORDER BY {qc} DESC, h.vec_id ASC) AS INT) AS rank "
        "FROM probe2 p "
        "JOIN hfin h ON h.cent_id = p.cent_id AND h.sub_id = p.sub_id "
        f"JOIN {src} qe ON qe.vec_id = p.query_id "
        f"JOIN {src} ne ON ne.vec_id = h.vec_id "
        "WHERE h.vec_id <> p.query_id) "
        f"WHERE rank <= {k}"
    )


def _lsh_plan_sql(
    num_hashes: int = 128,
    threshold: float = 0.8,
    steps: int = 200,
    rd: int = 6,
) -> str:
    """LSH banding-design oracle (dedup.lsh_parameter_plan): one row
    per divisor split of num_hashes, the S-curve p(s) = 1-(1-s^r)^b
    with every power an explicit left-fold of multiplications
    (list_reduce — Spark's aggregate-over-array_repeat twin; the
    leading 1.0*s identity fold step is IEEE-exact, so both chains
    are bit-identical), and the fp/fn integrals as composite Simpson
    on the same fixed grid."""
    t = float(threshold)
    n = int(steps)
    h1 = f"CAST({(t - 0.0) / n!r} AS DOUBLE)"
    h2 = f"CAST({(1.0 - t) / n!r} AS DOUBLE)"

    def ipow(x: str, cnt: str, tag: str) -> str:
        return (
            f"list_reduce(list_transform(range({cnt}), "
            f"j{tag} -> ({x})), (a{tag}, v{tag}) -> a{tag} * v{tag})"
        )

    def p_of(s: str) -> str:
        inner = ipow(s, "rows_per_band", "r")
        outer = ipow(f"CAST(1.0 AS DOUBLE) - {inner}", "bands", "b")
        return f"(CAST(1.0 AS DOUBLE) - {outer})"

    def simpson(lo: str, h: str, integrand) -> str:
        w = (
            f"(CASE WHEN i = 0 OR i = {n} THEN CAST(1.0 AS DOUBLE) "
            f"WHEN i % 2 = 1 THEN CAST(4.0 AS DOUBLE) ELSE CAST(2.0 AS DOUBLE) END)"
        )
        s = f"({lo} + i * {h})"  # lo/h carry their own DOUBLE casts
        return (
            f"((list_reduce(list_transform(range(0, {n + 1}), "
            f"i -> {w} * ({integrand(s)})), (sa, sx) -> sa + sx) "
            f"* {h}) / CAST(3.0 AS DOUBLE))"
        )

    fp = simpson("CAST(0.0 AS DOUBLE)", h1, p_of)
    fn = simpson(f"CAST({t!r} AS DOUBLE)", h2, lambda s: f"CAST(1.0 AS DOUBLE) - {p_of(s)}")
    return (
        f"WITH splits AS (SELECT CAST(b AS INT) AS bands, "
        f"CAST({num_hashes} // b AS INT) AS rows_per_band "
        f"FROM (SELECT unnest(range(1, {num_hashes + 1})) AS b) "
        f"WHERE {num_hashes} % b = 0) "
        f"SELECT bands, rows_per_band, "
        + _pr(p_of(f"CAST({t!r} AS DOUBLE)"), rd)
        + " AS p_at_threshold, "
        + _pr(fp, rd)
        + " AS fp_mass, "
        + _pr(fn, rd)
        + " AS fn_mass, "
        + _pr(f"{fp} + {fn}", rd)
        + " AS total_error FROM splits"
    )
