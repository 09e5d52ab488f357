"""Corpus-wide exact-substring repeat enumeration at the suffix-array
bar (Lee et al. 2022, "Deduplicating Training Data Makes Language
Models Better" — the ExactSubstr family; Manber & Myers 1990 for the
prefix-doubling construction — both public).

The span family (``dedup.duplicate_spans`` / ``cut_duplicate_spans``)
already DETECTS and CUTS duplicated passages of any length ≥ n via
positional n-gram islands; what a suffix array adds is the
ENUMERATION: the distinct maximal repeated substrings themselves, with
exact occurrence counts — the memorization-audit artifact ("these
exact strings each appear k times in the corpus"), length-descending.

Spark-first construction (no per-node recursion, no UDFs — every
stage is joins + the house two-pass dense-id assignment):

1. **Prefix doubling (base 4, singleton-frozen)**: level-j rank
   r_j(doc, pos) is the FIRST-INDEX rank (1 + count of suffixes with
   strictly smaller level-j capped window — Larsson & Sadakane 1999's
   convention) such that two suffixes share r_j iff their first 4^j
   tokens (capped at doc end) are equal, and r_j order =
   lexicographic order of those prefixes. Level 0 ranks the single
   token; level j+1 refines the 4-tuple (r_j(p), r_j(p + 4^j),
   r_j(p + 2·4^j), r_j(p + 3·4^j)), absent windows → 0 (sorts before
   every real rank: a proper prefix precedes its extensions). Under
   the first-index convention a SINGLETON rank is final, so each
   round re-ranks only the rows of multi-member classes
   (``seqassign.with_class_rank_total`` — class-relative, no
   offsets pass) + one groupBy rebuilding the arrays — ⌈cap_log2/2⌉
   rounds whose rank exchange carries only the still-ambiguous rows,
   the classic distributed suffix-array recipe with the quadrupled
   radix halving the round count. Binary levels 2j+1, where the LCP
   descend or an equality key needs them, are the PAIR of level-j
   windows at offsets 0 and 4^j (the doubling invariant read
   backwards).
2. **Suffix order**: order by (r_top, doc, pos) — r_top is unique per
   distinct (capped) suffix, so this IS the suffix array (ties =
   identical suffixes, ordered by position for determinism).
3. **Adjacent LCP**: per-document rank matrices (array[pos][level],
   bounded by the doc-length cap) turn the classic rank-descend into
   one codegen ``aggregate`` over levels — lcp(a, b) in O(cap_log2)
   array reads per adjacent pair.
4. **Right-maximal repeats** are exactly the distinct adjacent-LCP
   prefixes {prefix(sa[i], lcp[i])} (standard suffix-array fact: an
   equal-prefix run that never branches would extend; the adjacent
   pair that realizes the LCP is the branch witness). Dedup of equal
   strings uses the O(1) two-window equality key
   (r_k̂(p), r_k̂(p + ℓ − 2^k̂)) with k̂ = ⌊log2 ℓ⌋.
5. **Counts + left-maximality**: every suffix position is tested
   against every candidate length class via the same equality key —
   occurrences, distinct docs, and the preceding-token profile in one
   keyed join; ``w`` is left-maximal iff some occurrence starts its
   document or two occurrences disagree on the preceding token.

Scale shape: rounds scale with log2(max document tokens) — documents
are length-bounded by pipeline policy, so the round count is a
constant, NOT a function of corpus size; every round shuffles
fixed-width integer rows. The candidate text materialization and the
per-length-class probe multiply by ≤ (cap − min_len) — bounded by the
cap, logged, never silent. This is an AUDIT operator: run it on the
corpus snapshot, not in a serving path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from margaret_spark.functions.shingling import bind1, words

#: level-0 vocabulary rows collected to the driver when ranking the
#: distinct tokens directly (suffix_repeats); past this the level-0
#: ranks fall back to the distributed rank-on-rows recipe.
_VOCAB_COLLECT_CAP = 65536


def _dense_sorted_ids(
    keys: DataFrame,
    key_cols: list[str],
    out_col: str,
    bucket: Column | None = None,
) -> DataFrame:
    """Assign dense 1-based ids to ``keys`` rows in (key_cols) sort
    order — range partition + narrow in-partition sort + the two-pass
    partition-offset prefix sum (``with_dense_seq``); no global
    window anywhere. ``bucket`` (see ``seqassign._bucket_exchange``)
    replaces the range partitioner's sampling pass with an arithmetic
    order-preserving exchange when the caller can compute one."""
    return _dense_sorted_ids_total(keys, key_cols, out_col, bucket)[0]


def _dense_sorted_ids_total(
    keys: DataFrame,
    key_cols: list[str],
    out_col: str,
    bucket: Column | None = None,
) -> tuple[DataFrame, int]:
    """:func:`_dense_sorted_ids` plus the assigned-id count, free from
    the two-pass technique's already-collected partition counts."""
    from margaret_spark.functions.seqassign import (
        _bucket_exchange,
        with_dense_seq_total,
    )

    n = max(keys.sparkSession.sparkContext.defaultParallelism, 1)
    if bucket is not None:
        staged = _bucket_exchange(keys, n, bucket).sortWithinPartitions(
            *key_cols
        )
    else:
        staged = keys.repartitionByRange(
            n, *[F.col(c) for c in key_cols]
        ).sortWithinPartitions(*key_cols)
    return with_dense_seq_total(staged, seq_col=out_col, start=1)


def _rank_bucket(col: Column, n_keys: int, n_parts: int) -> Column:
    """Partition bucket ``floor((col − 1)·n_parts / n_keys)`` for a
    dense 1-based integer rank of known cardinality ``n_keys``,
    clamped into [0, n_parts). Order-safe under double rounding: the
    subtraction, the multiply, the divide and ``floor`` are each
    monotone non-decreasing maps of the true value, so buckets never
    invert the rank order, and equal ranks share a bucket by
    determinism; the clamp guards the one representable top-end
    round-up. Distributes DISTINCT ranks evenly — a heavy rank's rows
    stay together (no partitioner splits equal keys; the range
    sampler would merely have isolated them)."""
    b = F.floor(
        (col - 1) * F.lit(float(n_parts)) / F.lit(float(max(n_keys, 1)))
    )
    return F.least(F.greatest(b, F.lit(0)), F.lit(n_parts - 1))


def suffix_repeats(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_len: int = 5,
    top_k: int = 20,
    cap_log2: int = 7,
    tag_col: str | None = None,
    require_cross: bool = False,
) -> DataFrame:
    """(rank, text, n_tokens, n_occurrences, n_docs): the ``top_k``
    LONGEST maximal repeated token substrings of the corpus, ordered
    (length desc, text asc). A substring is reported iff it

    - is at least ``min_len`` tokens and occurs ≥ 2 times
      (occurrences are (doc, pos) positions; same-doc repeats count),
    - is RIGHT-maximal: no token t with count(w·t) = count(w)
      (every extension loses occurrences; an occurrence ending its
      document qualifies w automatically), and
    - is LEFT-maximal: some occurrence starts its document, or two
      occurrences disagree on the preceding token.

    Tokenization is whitespace (``words``, case preserved — the
    audit reports the strings as written). Repeat lengths are capped
    at 2^``cap_log2`` − 1 tokens (the prefix-doubling depth); the
    default 127 exceeds every graded document, and corpora with
    longer documents raise the cap by one round per doubling.

    Determinism: ranks are dense ids in deterministic sort order,
    every tiebreak is explicit, and the output is integer counts +
    verbatim text — the oracle replays the DEFINITION (enumerate all
    substrings, count, test maximality) rather than the suffix-array
    construction, so agreement checks the semantics, not the method.

    Cross-corpus leakage audit: pass ``tag_col`` (a boolean column —
    e.g. "is a test-set document") to additionally report
    ``n_occurrences_tagged`` / ``n_docs_tagged``, and
    ``require_cross=True`` to keep only repeats occurring on BOTH
    sides of the tag — "the longest test-set strings appearing
    verbatim in the training corpus", the ExactSubstr leakage report.
    Maximality stays corpus-union-wide, which is safe: if every
    occurrence of a cross string extends identically, the extension
    is itself cross and is reported instead."""
    if min_len < 2:
        raise ValueError(f"min_len must be >= 2: {min_len}")
    if top_k < 1:
        raise ValueError(f"top_k must be >= 1: {top_k}")
    if not 2 <= cap_log2 <= 12:
        raise ValueError(f"cap_log2 must be in [2, 12]: {cap_log2}")
    K = cap_log2
    cap = (1 << K) - 1
    if min_len > cap:
        raise ValueError(f"min_len {min_len} exceeds the cap {cap}")

    if require_cross and tag_col is None:
        raise ValueError("require_cross needs tag_col")
    tag_expr = (
        F.col(tag_col).cast("boolean")
        if tag_col is not None
        else F.lit(False)
    )
    tdf = (
        df.select(
            F.col(id_col).alias("__id"),
            words(F.col(text_col), lower=False).alias("__ts"),
            tag_expr.alias("__tag"),
        )
        .where(F.size("__ts") > 0)
        .localCheckpoint(eager=False)
    )
    toks = tdf.select(
        "__id",
        F.posexplode("__ts").alias("__p0", "__tok"),
    ).select("__id", (F.col("__p0") + 1).alias("pos"), "__tok")

    # Levels are carried as PER-DOCUMENT RANK ARRAYS (ra[pos-1] =
    # r_k(doc, pos)) rather than (doc, pos, r) rows — r11 optimization
    # round. The row form paid, per doubling round: a positional
    # SELF-JOIN to fetch r(pos + 2^k) (two hash exchanges), a
    # distinct() exchange (evaluated twice — once more under the range
    # partitioner's sampling pass), and a join-back shuffle attaching
    # the dense ids. In array form r(pos + 2^k) is an O(1) in-row
    # ``F.get`` and the dense ids are computed ON the rows
    # (with_dense_rank_total — identical ids: dense, 1-based, same
    # (r, r2) sort order), so one round = one range exchange + one
    # groupBy(__id) exchange rebuilding the arrays. The arrays are
    # bounded by the doc-length cap (the same bound the final rank
    # matrices already rely on).
    # r12 (singleton freezing): the arrays carry a parallel BOOLEAN
    # array ua[pos-1] — True while the position's rank class still has
    # ≥ 2 members ("unresolved"). Frozen (singleton) positions keep
    # their rank value forever under the first-index rank convention
    # (see the loop comment), so later rounds re-rank ONLY the
    # unresolved rows.
    def _to_arrays(rows: DataFrame) -> DataFrame:
        return (
            rows.groupBy("__id")
            .agg(
                F.array_sort(
                    F.collect_list(F.struct("pos", "r", "u"))
                ).alias("__pr")
            )
            .select(
                "__id",
                F.transform(F.col("__pr"), lambda s: s["r"]).alias("ra"),
                F.transform(F.col("__pr"), lambda s: s["u"]).alias("ua"),
            )
            .localCheckpoint(eager=False)
        )

    from margaret_spark.functions.seqassign import (
        with_class_rank_total,
        with_first_index_rank_total,
    )

    # BASE-4 prefix doubling (r11 optimization round): level j ranks
    # 4^j-token capped windows, built from FOUR level-(j-1) ranks per
    # round — ceil(K/2) ranking rounds instead of K, and at this
    # operator's scale each round is a fixed two-exchange cost, so
    # halving the rounds halves the loop. Order/equality correctness
    # is the same induction as binary doubling: a 4s-prefix is the
    # concatenation of four s-windows, the 4-tuple of their ranks
    # sorts lexicographically exactly as the concatenation does, and
    # the absent-window sentinel 0 (a window starting past the doc
    # end) sorts before every real rank — proper prefixes precede
    # extensions, and partial (doc-capped) windows inherit the same
    # property from the previous level. Binary levels 2j+1 needed by
    # the LCP descend and the two-window equality keys are emulated
    # as PAIRS of level-j ranks (the prefix-doubling invariant run
    # backwards: r_{2j+1} ≡ (r_{2j}·, r_{2j}·shifted)), see _w_eq /
    # the __q1a/__q1b key columns below.
    R = (K + 1) // 2  # base-4 rounds; top span 4^R = 2^2R >= 2^K > cap

    # level-0 ranks: dense ids of the distinct tokens in sort order.
    # The VOCABULARY is usually tiny next to the position count
    # (words repeat — that is the operator's whole premise), so rank
    # the distinct tokens instead of the rows: one map-side-combined
    # aggregation (shuffles ≤V keys, not N positions), a driver sort
    # of ≤cap vocab rows, and a broadcast join-back that never
    # exchanges the positions — replacing a range-sampling pass plus
    # a full skewed string exchange of every position (r11: measured
    # 6.4 s of the 17 s loop at sf0.1, V=31). Rank values are
    # identical: dense, 1-based, in Spark's string sort order
    # (UTF8String compares unsigned bytes; UTF-8 byte order == code
    # point order, pinned here by sorting the encoded bytes). Corpora
    # with vocabularies past the broadcast cap keep the rank-on-rows
    # path.
    # r12 (singleton freezing, Larsson & Sadakane 1999 distributed):
    # ranks use the FIRST-INDEX convention — r_j(p) = 1 + |suffixes
    # whose level-j capped window is strictly smaller| — instead of
    # dense distinct-key ids. Same order, same equality classes
    # (downstream only ever compares ranks of one level for equality
    # or sorts by them), but the convention makes singleton ranks
    # FINAL: a position whose window is unique at level j keeps the
    # same rank value at every later level (its smaller-window count
    # never changes — no other suffix shares its prefix again), so
    # each round re-ranks ONLY the rows of multi-member classes
    # (with_class_rank_total refines class-relatively: new rank =
    # class rank + in-class first-index). On repeat-bearing corpora
    # unresolved rows collapse geometrically after round 1 — the rank
    # exchange shrinks from ALL N positions per round to the
    # still-ambiguous tail, and the sort keys stay the same width.
    vrows = (
        toks.groupBy("__tok")
        .agg(F.count(F.lit(1)).alias("__c"))
        .limit(_VOCAB_COLLECT_CAP + 1)
        .collect()
    )
    if len(vrows) <= _VOCAB_COLLECT_CAP:
        vrows.sort(key=lambda r: r["__tok"].encode("utf-8"))
        n_sfx = sum(int(r["__c"]) for r in vrows)
        # first-index rank = 1 + count of positions holding smaller
        # tokens; a token occurring once is resolved already
        vocab_rows = []
        acc = 1
        unresolved = 0
        for r in vrows:
            c = int(r["__c"])
            vocab_rows.append((r["__tok"], acc, c >= 2))
            acc += c
            unresolved += c if c >= 2 else 0
        vocab = F.broadcast(
            df.sparkSession.createDataFrame(
                vocab_rows, "__tok string, r long, u boolean"
            )
        )
        ranked0 = toks.join(vocab, "__tok")
    else:
        ranked0, unresolved, n_sfx = with_first_index_rank_total(
            toks, ["__tok"], "r", "u"
        )
    lvl = _to_arrays(ranked0.select("__id", "pos", "r", "u"))
    levels = [lvl]
    n_part = max(df.sparkSession.sparkContext.defaultParallelism, 1)
    for j in range(R):
        # EARLY TERMINATION: no unresolved rows means every suffix's
        # capped window is already unique at the last computed level,
        # so every later round is the identity (each refinement class
        # is a singleton and keeps its rank). Padding the remaining
        # levels with the converged level is bit-identical to running
        # the rounds — the LCP descend and the two-window equality
        # keys read the same values (no two distinct suffixes can
        # test equal at or above the converged level).
        if unresolved == 0:
            levels.extend(lvl for _ in range(j, R))
            break
        s = 4 ** j
        base = lvl.select(
            "__id", "ra", "ua", F.posexplode("ra").alias("__p0", "r")
        )
        # frozen rows keep their rank (and stay frozen) — they skip
        # the rank exchange entirely and only rejoin for the array
        # rebuild
        frozen = base.where(~F.get("ua", F.col("__p0"))).select(
            "__id",
            (F.col("__p0") + 1).alias("pos"),
            "r",
            F.lit(False).alias("u"),
        )
        rows = base.where(F.get("ua", F.col("__p0"))).select(
            "__id",
            (F.col("__p0") + 1).alias("pos"),
            "r",
            # absent windows → 0 (sorts before every real rank); the
            # sentinel pattern is monotone (0s only at the tuple
            # tail), consistent with prefix-precedes-extension
            F.coalesce(F.get("ra", F.col("__p0") + s), F.lit(0)).alias(
                "r2"
            ),
            F.coalesce(
                F.get("ra", F.col("__p0") + 2 * s), F.lit(0)
            ).alias("r3"),
            F.coalesce(
                F.get("ra", F.col("__p0") + 3 * s), F.lit(0)
            ).alias("r4"),
        )
        # the class key r is a first-index rank ∈ [1, n_sfx] whose
        # VALUE is (1 + positions sorting earlier), so the arithmetic
        # bucket splits by row MASS, not class id — no range-sampling
        # pass, and better balance than dense ids gave (r11 note).
        # materialize=False: the round's ONLY materialization is the
        # arrays checkpoint below — a second lazy checkpoint here
        # would pay one more full JVM planning pass per round (r12:
        # ~0.4 s each at sf0.1; the rank pipeline is evaluated exactly
        # once either way, inside the arrays checkpoint job)
        ranked, _, _ = with_class_rank_total(
            rows,
            "r",
            ["r2", "r3", "r4"],
            "nr",
            "__u",
            bucket=_rank_bucket(F.col("r"), n_sfx, n_part),
            materialize=False,
        )
        merged = ranked.select(
            "__id", "pos", F.col("nr").alias("r"), F.col("__u").alias("u")
        ).unionByName(frozen)
        lvl = _to_arrays(merged)
        levels.append(lvl)
        # the round's convergence stat, read off the round's own
        # checkpoint (this collect is ALSO what materializes it)
        unresolved = int(
            lvl.agg(
                F.sum(
                    F.size(F.filter("ua", lambda x: x)).cast("long")
                ).alias("__u")
            ).collect()[0]["__u"]
            or 0
        )

    # per-document rank matrices: mat[pos-1][j] = base-4 rank of the
    # 4^j-token capped window at pos. Only the DISTINCT computed
    # levels are materialized: once ranks converge at level j*, every
    # later level repeats level j*'s values, and no consumer can
    # observe them — the max adjacent LCP is < 4^j* (two suffixes
    # sharing a 4^j*-token prefix would share a rank), so the
    # two-window keys read levels <= j*-1 only, and the LCP descend's
    # reads above j* come back NULL (F.get past the array end)
    # exactly where the padded value could never test equal between
    # two distinct suffixes — the descend adds 0 either way. With
    # array-form levels the matrices are a union of n_docs·j* ARRAY
    # rows (one per (doc, level), not one per (doc, pos, level)) +
    # one groupBy(__id) + an in-row transpose — the r10 (K+1)·n-row
    # union and its two keyed exchanges collapse to one exchange of
    # level-count·docs rows.
    n_uniq = len(levels)
    for i in range(1, len(levels)):
        if levels[i] is levels[i - 1]:  # first padded copy
            n_uniq = i
            break
    lv_union = None
    for k, lv in enumerate(levels[:n_uniq]):
        tagged = lv.select("__id", F.lit(k).alias("__k"), "ra")
        lv_union = tagged if lv_union is None else lv_union.unionByName(tagged)
    per_doc = lv_union.groupBy("__id").agg(
        F.array_sort(F.collect_list(F.struct("__k", "ra"))).alias("__kr")
    )
    # transpose (level, pos) → (pos, level): mat[i][k] = __kr[k].ra[i]
    mats = (
        per_doc.select(
            "__id",
            F.transform(
                F.col("__kr")[0]["ra"],
                lambda _x, i: F.transform(
                    F.col("__kr"), lambda s: F.get(s["ra"], i)
                ),
            ).alias("mat"),
        )
        .localCheckpoint(eager=False)
    )

    # suffix order + adjacent pairs (top-level ranks back to rows via
    # one narrow explode of the checkpointed arrays)
    top = levels[R].select(
        "__id", F.posexplode("ra").alias("__p0", "r")
    ).select("__id", (F.col("__p0") + 1).alias("pos"), "r")
    # top-level first-index ranks live in [1, n_sfx] and are spread by
    # row mass, so the suffix-order exchange is also
    # arithmetic-bucketed — nearly one row per rank at this level
    sa = _dense_sorted_ids(
        top,
        ["r", "__id", "pos"],
        "idx",
        bucket=_rank_bucket(F.col("r"), n_sfx, n_part),
    ).select("__id", "pos", "idx")
    a = sa.select(
        F.col("idx").alias("__i"),
        F.col("__id").alias("__ida"),
        F.col("pos").alias("__pa"),
    )
    b = sa.select(
        (F.col("idx") - 1).alias("__i"),
        F.col("__id").alias("__idb"),
        F.col("pos").alias("__pb"),
    )
    pairs = (
        a.join(b, "__i")
        .join(mats.select(F.col("__id").alias("__ida"), F.col("mat").alias("__ma")), "__ida")
        .join(mats.select(F.col("__id").alias("__idb"), F.col("mat").alias("__mb")), "__idb")
    )

    # LCP descend: binary levels K-1..0, acc += 2^k when the 2^k-token
    # capped windows agree at the shifted positions. F.get is 0-based
    # and NULL out of range (ANSI-safe), so doc ends terminate
    # naturally. Over base-4 matrices, the window at an EVEN binary
    # level 2j is level-j's rank directly; an ODD level 2j+1 window is
    # the PAIR of level-j windows at offset 0 and 4^j — equal iff both
    # halves are equal, with an absent half treated as the 0 sentinel
    # on both sides (both docs end before it — the doubling key's own
    # convention). Each step struct carries (p = 2^k, j = k//2,
    # h = 4^j, odd) as literals.
    # literal struct arrays are built as ONE sql expression string:
    # the F.array(F.struct(F.lit...)) form costs 5-7 py4j round trips
    # per element (r12: the class array alone measured 1.7 s of driver
    # wall at ~0.5 ms per round trip); F.expr is a single call and
    # yields the same typed literal
    steps = F.expr(
        "array(%s)"
        % ",".join(
            "named_struct('p',%d,'j',%d,'h',%d,'odd',%d)"
            % (1 << k, k // 2, 1 << (2 * (k // 2)), k % 2)
            for k in range(K - 1, -1, -1)
        )
    )

    def _lcp(ma: Column, pa: Column, mb: Column, pb: Column) -> Column:
        def step(acc: Column, s: Column) -> Column:
            ra = F.get(F.get(ma, pa - 1 + acc), s["j"])
            rb = F.get(F.get(mb, pb - 1 + acc), s["j"])
            eq = ra.isNotNull() & rb.isNotNull() & (ra == rb)
            # second half of an odd-level window: equal capped first
            # halves have equal LENGTH, so either both second halves
            # exist (compare ranks) or both are absent (0 == 0)
            ra2 = F.coalesce(
                F.get(F.get(ma, pa - 1 + acc + s["h"]), s["j"]), F.lit(0)
            )
            rb2 = F.coalesce(
                F.get(F.get(mb, pb - 1 + acc + s["h"]), s["j"]), F.lit(0)
            )
            eq = F.when(s["odd"] == 1, eq & (ra2 == rb2)).otherwise(eq)
            # capped-window equality means "equal up to min(2^k, suffix
            # end)": for two suffixes that are identical to their ends
            # the windows agree at EVERY level, so the advance must be
            # clamped to the shorter remaining length or the lcp would
            # overshoot past both documents (r10 property test caught
            # exactly this on planted end-identical suffixes)
            adv = F.least(
                s["p"].cast("int"),
                (F.size(ma) - (pa - 1 + acc)).cast("int"),
                (F.size(mb) - (pb - 1 + acc)).cast("int"),
            )
            return acc + F.when(eq, adv).otherwise(F.lit(0))

        return F.aggregate(steps, F.lit(0), step)

    with_l = pairs.select(
        "__ida",
        "__pa",
        "__ma",
        _lcp(
            F.col("__ma"), F.col("__pa"), F.col("__mb"), F.col("__pb")
        ).alias("l"),
    ).where(F.col("l") >= F.lit(int(min_len)))

    # dedup identical candidate strings via the two-window equality
    # key at k̂ = floor(log2 l): windows [0, 2^k̂) and [l−2^k̂, l)
    # cover [0, l). Over base-4 matrices each window rank is one
    # level-(k̂//2) rank (k̂ even) or the PAIR of level-(k̂//2) ranks
    # at offsets 0 and 4^(k̂//2) (k̂ odd; unused pair slots are the 0
    # sentinel — l is part of the key, so slot meaning is fixed).
    # Every window lies inside the length-l occurrence (2·2^k̂ ≥ l ≥
    # the window spans), so the ranks are non-null and depend only on
    # the string content. The k̂-derived constants are parallel
    # descending when-chains over l — first match wins (l ≥ min_len ≥
    # 2, so some branch always fires).
    khat, kj, kh4, kodd, k2 = None, None, None, None, None
    for k in range(K - 1, -1, -1):
        cond = F.col("l") >= F.lit(1 << k)
        vals = (k, k // 2, 1 << (2 * (k // 2)), k % 2, 1 << k)
        cur = [F.when(cond, F.lit(v)) for v in vals] if khat is None else [
            c.when(cond, F.lit(v))
            for c, v in zip((khat, kj, kh4, kodd, k2), vals)
        ]
        khat, kj, kh4, kodd, k2 = cur

    def _wkey(m: Column, p: Column) -> tuple[Column, Column]:
        """(primary, secondary) rank key of the 2^k̂ window at 1-based
        position ``p`` of matrix ``m`` — secondary is 0 for even k̂."""
        w1 = F.get(F.get(m, p - 1), kj)
        w2 = F.when(
            kodd == 1,
            F.coalesce(F.get(F.get(m, p - 1 + kh4), kj), F.lit(0)),
        ).otherwise(F.lit(0))
        return w1, w2

    a1, a2 = _wkey(F.col("__ma"), F.col("__pa"))
    b1, b2 = _wkey(F.col("__ma"), F.col("__pa") + F.col("l") - k2)
    cand_occ = with_l.select(
        "__ida",
        "__pa",
        "l",
        khat.alias("__kh"),
        a1.alias("__r1a"),
        a2.alias("__r1b"),
        b1.alias("__r2a"),
        b2.alias("__r2b"),
    )
    cands = (
        cand_occ.groupBy("l", "__kh", "__r1a", "__r1b", "__r2a", "__r2b")
        .agg(F.min(F.struct("__ida", "__pa")).alias("__rep"))
        .localCheckpoint(eager=False)
    )

    # counts + left-maximality: probe every suffix against every
    # candidate length class (bounded ≤ cap − min_len + 1 classes)
    lclasses = [
        (int(r["l"]), int(r["__kh"]))
        for r in cands.select("l", "__kh").distinct().collect()
    ]
    if not lclasses:
        spark = df.sparkSession
        schema = (
            "rank long, text string, n_tokens long, "
            "n_occurrences long, n_docs long"
        )
        if tag_col is not None:
            schema += ", n_occurrences_tagged long, n_docs_tagged long"
        return spark.createDataFrame([], schema)
    # one sql-string literal build — see the `steps` comment
    lc_arr = F.expr(
        "array(%s)"
        % ",".join(
            "named_struct('l',%d,'kh',%d,'j',%d,'h',%d,'odd',%d,'k2',%d)"
            % (l, kh, kh // 2, 1 << (2 * (kh // 2)), kh % 2, 1 << kh)
            for l, kh in sorted(lclasses)
        )
    )
    # The probe's suffix set is every (doc, pos) — exactly the
    # positions 1..len(mat) of each rank matrix, so enumerate them
    # FROM mats (one narrow explode) instead of joining the suffix
    # array back onto mats (r11: that join was a 2-exchange
    # sort-merge of every suffix row, carrying nothing the matrices
    # don't already hold). Classes that cannot fit at this position
    # (l > remaining tokens) are pruned BEFORE the class explode —
    # the old __fits filter ran after, so every suffix paid the full
    # |classes| fan-out.
    sfx = (
        mats
        .join(
            tdf.select(
                F.col("__id"),
                F.col("__ts").alias("__tsq"),
                F.col("__tag"),
            ),
            "__id",
        )
        .select(
            "__id",
            "mat",
            "__tag",
            "__tsq",
            F.explode(
                F.sequence(F.lit(1), F.size(F.col("mat")))
            ).alias("pos"),
        )
        .select(
            "__id",
            "pos",
            "mat",
            "__tag",
            (F.col("pos") == 1).alias("__at_start"),
            F.get(F.col("__tsq"), F.col("pos") - 2).alias("__prev"),
            F.explode(
                F.filter(
                    lc_arr,
                    lambda s: s["l"]
                    <= F.size(F.col("mat")) - F.col("pos") + 1,
                )
            ).alias("__lc"),
        )
        .select(
            "__id",
            "pos",
            "__tag",
            "__at_start",
            "__prev",
            F.col("__lc.l").alias("l"),
            F.col("__lc.kh").alias("__kh"),
            # the same (primary, secondary) window keys as the
            # candidate side, with the class constants read from the
            # literal struct instead of the k̂ when-chains
            F.get(F.get(F.col("mat"), F.col("pos") - 1), F.col("__lc.j")).alias(
                "__q1a"
            ),
            F.when(
                F.col("__lc.odd") == 1,
                F.coalesce(
                    F.get(
                        F.get(F.col("mat"), F.col("pos") - 1 + F.col("__lc.h")),
                        F.col("__lc.j"),
                    ),
                    F.lit(0),
                ),
            )
            .otherwise(F.lit(0))
            .alias("__q1b"),
            F.get(
                F.get(
                    F.col("mat"),
                    F.col("pos") - 1 + F.col("__lc.l") - F.col("__lc.k2"),
                ),
                F.col("__lc.j"),
            ).alias("__q2a"),
            F.when(
                F.col("__lc.odd") == 1,
                F.coalesce(
                    F.get(
                        F.get(
                            F.col("mat"),
                            F.col("pos")
                            - 1
                            + F.col("__lc.l")
                            - F.col("__lc.k2")
                            + F.col("__lc.h"),
                        ),
                        F.col("__lc.j"),
                    ),
                    F.lit(0),
                ),
            )
            .otherwise(F.lit(0))
            .alias("__q2b"),
        )
        # the fit test moved into the class-array filter above; the
        # null guards stay (they are free and document the contract)
        .where(F.col("__q1a").isNotNull() & F.col("__q2a").isNotNull())
    )
    matched = (
        sfx.join(
            cands.select(
                "l",
                "__kh",
                F.col("__r1a").alias("__q1a"),
                F.col("__r1b").alias("__q1b"),
                F.col("__r2a").alias("__q2a"),
                F.col("__r2b").alias("__q2b"),
                "__rep",
            ),
            ["l", "__kh", "__q1a", "__q1b", "__q2a", "__q2b"],
        )
        .groupBy("l", "__kh", "__q1a", "__q1b", "__q2a", "__q2b", "__rep")
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.countDistinct("__id").alias("n_docs"),
            F.sum(F.col("__tag").cast("long")).alias("n_occurrences_tagged"),
            F.countDistinct(
                F.when(F.col("__tag"), F.col("__id"))
            ).alias("n_docs_tagged"),
            F.max(F.col("__at_start").cast("int")).alias("__any_start"),
            F.min("__prev").alias("__mnp"),
            F.max("__prev").alias("__mxp"),
        )
        .where(
            (F.col("__any_start") == 1) | (F.col("__mnp") != F.col("__mxp"))
        )
    )
    if require_cross:
        matched = matched.where(
            (F.col("n_occurrences_tagged") > 0)
            & (F.col("n_occurrences") > F.col("n_occurrences_tagged"))
        )

    # text for the surviving candidates, then the bounded top-k
    out = (
        matched.join(
            tdf.select(
                F.col("__id").alias("__rid"), F.col("__ts").alias("__rts")
            ),
            matched["__rep"]["__ida"] == F.col("__rid"),
        )
        .select(
            F.concat_ws(
                " ",
                F.slice(
                    F.col("__rts"), matched["__rep"]["__pa"], F.col("l")
                ),
            ).alias("text"),
            F.col("l").cast("long").alias("n_tokens"),
            F.col("n_occurrences").cast("long").alias("n_occurrences"),
            F.col("n_docs").cast("long").alias("n_docs"),
            F.col("n_occurrences_tagged").cast("long").alias(
                "n_occurrences_tagged"
            ),
            F.col("n_docs_tagged").cast("long").alias("n_docs_tagged"),
        )
        .orderBy(F.col("n_tokens").desc(), F.col("text").asc())
        .limit(int(top_k))
    )
    w = Window.orderBy(F.col("n_tokens").desc(), F.col("text").asc())
    # the unpartitioned window runs over ≤ top_k rows (the TakeOrdered
    # limit above) — the bounded-set exception to the no-global-window
    # rule, same as search.py's top-k survivors
    cols = ["rank", "text", "n_tokens", "n_occurrences", "n_docs"]
    if tag_col is not None:
        cols += ["n_occurrences_tagged", "n_docs_tagged"]
    return out.withColumn(
        "rank", F.row_number().over(w).cast("long")
    ).select(*cols)
