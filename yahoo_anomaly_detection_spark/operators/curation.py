"""Corpus-curation quality operators: repetition profiling, benchmark
decontamination, collocation mining, and unigram-LM perplexity scoring.

The four filters a large-scale training-data pipeline runs between raw
text and the dedup/sampling stages already in ``textstats``/``dedup``:

- ``doc_repetition`` — the published Gopher repetition rules (Rae et
  al. 2021, "Scaling Language Models", table A1): documents dominated
  by a single repeated n-gram or by duplicated n-grams are low-quality
  boilerplate (nav bars, SEO spam) and measurably hurt LM training.
- ``decontaminate`` — n-gram-collision benchmark decontamination (the
  GPT-3 appendix-C / PaLM procedure): any training document sharing an
  n-gram with the held-out evaluation set is flagged so eval numbers
  stay honest.
- ``pmi_bigrams`` — pointwise-mutual-information collocations (Church
  & Hanks 1990): the corpus-level phrase vocabulary (tokenizer merge
  candidates, stop-phrase lists).
- ``unigram_logppl`` — CCNet-style (Wenzek et al. 2019) perplexity
  quality scoring, reduced to the unigram LM that needs no external
  model artifact: mean token surprisal under the corpus's own unigram
  distribution; gibberish and rare-token soup score high, repetitive
  boilerplate scores low.

All tokenization is ``split(text, ' ')`` on the word level (the same
whitespace tokenizer as ``quality_score``) — JVM-side higher-order
functions, no Python anywhere. Every operator has an exact DuckDB
mirror in ``ORACLE_SQL``.

No reference counterpart (the reference has no text layer); engine
extension per SURVEY §2.11.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from yahoo_anomaly_detection_spark.functions.portable import portable_round

_R = 4


def _ngrams(n: int, arr: str = "_t") -> str:
    """SQL expression: array of space-joined word n-grams of ``arr``
    (empty array when the doc is shorter than n — guarded because
    ``sequence(1, 0)`` would DESCEND, not return empty)."""
    if n == 1:
        return arr
    parts = ", ".join(
        f"element_at({arr}, i + {j})" if j else f"element_at({arr}, i)"
        for j in range(n)
    )
    return (
        f"IF(size({arr}) >= {n}, "
        f"transform(sequence(1, size({arr}) - {n - 1}), "
        f"i -> concat_ws(' ', {parts})), "
        f"array())"
    )


# ------------------------------------------------------------------
# Gopher repetition rules
# ------------------------------------------------------------------

def doc_repetition(docs: DataFrame, top2_max: float = 0.20,
                   dup3_max: float = 0.30) -> DataFrame:
    """Per-document repetition profile + the Gopher repetitive flag.

    Signals (word-level, same tokenizer as ``quality_score``):

    - ``uniq_token_ratio`` — type/token ratio (distinct / total).
    - ``top2gram_frac`` — fraction of tokens claimed by the single
      most frequent 2-gram: ``2 · max_count(2-gram) / n_tokens``
      (Gopher's "top n-gram fraction"; NULL when the doc has < 2
      tokens).
    - ``dup3gram_frac`` — duplicate-occurrence share of 3-grams:
      ``(total − distinct) / total`` 3-gram occurrences (the
      order-free formulation of Gopher's "duplicate n-gram fraction";
      NULL when the doc has < 3 tokens).
    - ``repetitive`` — 1 when either fraction exceeds its threshold
      (defaults echo Gopher's published 0.20 / ~0.30 band), NULL
      signals treated as passing.

    Scale shape: one explode of the (1,2,3)-gram stream tagged with
    its n, then TWO shrinking map-side-combined exchanges —
    ``groupBy(doc_id, n, gram)`` (the only one the exploded corpus
    crosses; map-side combine collapses each doc's repeats before the
    wire) and ``groupBy(doc_id)`` over the already-deduped gram
    relation. No window, no sort, no per-row Python; per-task state is
    bounded by hash-aggregate spill, never by document length.
    """
    base = docs.select("doc_id", F.expr("split(text, ' ')").alias("_t"))
    ng = base.select(
        "doc_id",
        F.explode(F.expr(
            "flatten(array("
            f"transform({_ngrams(1)}, g -> named_struct('n', 1, 'g', g)), "
            f"transform({_ngrams(2)}, g -> named_struct('n', 2, 'g', g)), "
            f"transform({_ngrams(3)}, g -> named_struct('n', 3, 'g', g))"
            "))"
        )).alias("_ng"),
    ).select("doc_id", F.col("_ng.n").alias("_n"), F.col("_ng.g").alias("_g"))
    cnt = ng.groupBy("doc_id", "_n", "_g").agg(
        F.count(F.lit(1)).alias("_c"))
    one = F.lit(1)
    prof = cnt.groupBy("doc_id").agg(
        F.sum(F.when(F.col("_n") == 1, F.col("_c"))).alias("_tok"),
        F.sum(F.when(F.col("_n") == 1, one)).alias("_typ"),
        F.max(F.when(F.col("_n") == 2, F.col("_c"))).alias("_max2"),
        F.sum(F.when(F.col("_n") == 3, F.col("_c"))).alias("_tot3"),
        F.sum(F.when(F.col("_n") == 3, one)).alias("_dst3"),
    )
    top2 = F.lit(2.0) * F.col("_max2") / F.col("_tok")
    dup3 = (F.col("_tot3") - F.col("_dst3")) / F.col("_tot3").cast("double")
    flag = (
        F.coalesce(top2 > F.lit(top2_max), F.lit(False))
        | F.coalesce(dup3 > F.lit(dup3_max), F.lit(False))
    )
    return prof.select(
        "doc_id",
        F.col("_tok").cast("long").alias("n_tokens"),
        portable_round(F.col("_typ") / F.col("_tok").cast("double"),
                       _R).alias("uniq_token_ratio"),
        portable_round(top2, _R).alias("top2gram_frac"),
        portable_round(dup3, _R).alias("dup3gram_frac"),
        flag.cast("int").alias("repetitive"),
    )


def _repetition_sql(top2_max: float, dup3_max: float) -> str:
    return f"""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
g AS (
    SELECT doc_id, 1 AS n, unnest(tk) AS gram FROM t
    UNION ALL
    SELECT doc_id, 2, unnest(list_transform(range(1, len(tk)),
        i -> tk[i] || ' ' || tk[i + 1])) FROM t
    UNION ALL
    SELECT doc_id, 3, unnest(list_transform(range(1, len(tk) - 1),
        i -> tk[i] || ' ' || tk[i + 1] || ' ' || tk[i + 2])) FROM t
),
cnt AS (SELECT doc_id, n, gram, count(*) AS c FROM g GROUP BY 1, 2, 3),
prof AS (
    SELECT doc_id,
           sum(CASE WHEN n = 1 THEN c END) AS tok,
           sum(CASE WHEN n = 1 THEN 1 END) AS typ,
           max(CASE WHEN n = 2 THEN c END) AS max2,
           sum(CASE WHEN n = 3 THEN c END) AS tot3,
           sum(CASE WHEN n = 3 THEN 1 END) AS dst3
    FROM cnt GROUP BY 1
)
SELECT doc_id,
       CAST(tok AS BIGINT) AS n_tokens,
       round(typ / CAST(tok AS DOUBLE), 4) AS uniq_token_ratio,
       round(2.0 * max2 / tok, 4) AS top2gram_frac,
       round((tot3 - dst3) / CAST(tot3 AS DOUBLE), 4) AS dup3gram_frac,
       CAST(coalesce(2.0 * max2 / tok > {top2_max}, false)
            OR coalesce((tot3 - dst3) / CAST(tot3 AS DOUBLE) > {dup3_max},
                        false) AS INT) AS repetitive
FROM prof
"""


# ------------------------------------------------------------------
# benchmark decontamination
# ------------------------------------------------------------------

def decontaminate(docs: DataFrame, n: int = 3,
                  eval_mod: int = 20) -> DataFrame:
    """Flag training documents that collide with the held-out eval
    set on any word n-gram (the GPT-3/PaLM decontamination check,
    which uses n=13 on real corpora; n is a parameter).

    The eval set here is carved deterministically from the same table
    (``doc_id % eval_mod == 0``) — in production it is the benchmark
    suite. Output: one row per NON-eval document with the count of
    distinct n-grams it shares with any eval document and the
    contaminated flag (docs with zero collisions are kept via the
    left join — a decontamination report must list the clean docs).

    Scale shape: per-doc grams are ``array_distinct``-ed BEFORE the
    explode (JVM-side, so the join input is one row per (doc, gram)
    and the final count is a plain map-side-combinable ``count``, not
    a count-distinct). The eval gram set is distinct-ed on the tiny
    eval slice and broadcast — the 100 TB training side never
    shuffles for the probe (for benchmark suites too big to broadcast
    whole, ship a Bloom filter of the gram hashes and verify the few
    candidate hits exactly; the corpus side of the plan is unchanged).
    One corpus exchange total: the ``groupBy(doc_id)`` hit count.
    """
    base = docs.select("doc_id", F.expr("split(text, ' ')").alias("_t"))
    grams = base.select(
        "doc_id",
        F.explode(F.expr(f"array_distinct({_ngrams(n)})")).alias("gram"),
    )
    is_eval = F.col("doc_id") % eval_mod == 0
    bench = grams.where(is_eval).select("gram").distinct()
    train = docs.where(~is_eval).select("doc_id")
    hits = (
        grams.where(~is_eval)
        .join(F.broadcast(bench), "gram")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("_hits"))
    )
    return train.join(hits, "doc_id", "left").select(
        "doc_id",
        F.coalesce(F.col("_hits"), F.lit(0)).cast("long")
        .alias("n_shared_grams"),
        (F.coalesce(F.col("_hits"), F.lit(0)) > 0).cast("int")
        .alias("contaminated"),
    )


def _decontaminate_sql(n: int, eval_mod: int) -> str:
    joined = " || ' ' || ".join(f"tk[i + {j}]" if j else "tk[i]"
                                for j in range(n))
    return f"""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
g AS (
    SELECT DISTINCT doc_id, gram FROM (
        SELECT doc_id,
               unnest(list_transform(range(1, len(tk) - {n - 2}),
                                     i -> {joined})) AS gram
        FROM t)
),
bench AS (SELECT DISTINCT gram FROM g WHERE doc_id % {eval_mod} = 0),
hits AS (
    SELECT doc_id, count(*) AS h
    FROM g JOIN bench USING (gram)
    WHERE doc_id % {eval_mod} <> 0
    GROUP BY 1
)
SELECT d.doc_id,
       CAST(coalesce(h.h, 0) AS BIGINT) AS n_shared_grams,
       CAST(coalesce(h.h, 0) > 0 AS INT) AS contaminated
FROM documents d LEFT JOIN hits h ON d.doc_id = h.doc_id
WHERE d.doc_id % {eval_mod} <> 0
"""


# ------------------------------------------------------------------
# PMI collocations
# ------------------------------------------------------------------

def pmi_bigrams(docs: DataFrame, k: int = 40,
                min_count: int = 5) -> DataFrame:
    """Top-k word-bigram collocations by pointwise mutual information
    (Church & Hanks 1990): ``pmi = ln(p(xy) / (p(x) · p(y)))`` with
    ``p(xy) = c_xy / T₂`` over bigram occurrences and
    ``p(x) = c_x / T₁`` over unigram occurrences. ``min_count`` drops
    the rare-pair noise PMI is notorious for (a 1-occurrence pair of
    two rare words maxes the score).

    Scale shape: two map-side-combined count exchanges (bigram- and
    vocab-sized outputs — the exploded corpus crosses each once);
    both totals ride 1-row broadcast cross joins (no collect); the
    unigram relation is broadcast twice into the bigram relation
    (vocab-sized — the same ``broadcast_vocab`` caveat as
    ``tfidf_topk`` applies at web-tokenizer scale); final top-k is
    ``orderBy().limit(k)`` = TakeOrderedAndProject (per-partition
    heap, never a global sort). Ordering ties break on the ROUNDED
    pmi then bigram text, so both engines rank identically.
    """
    toks = docs.select("doc_id", F.expr("split(text, ' ')").alias("_t"))
    uni = (
        toks.select(F.explode("_t").alias("w"))
        .groupBy("w").agg(F.count(F.lit(1)).alias("cw"))
    )
    t1 = uni.agg(F.sum("cw").cast("double").alias("_t1"))
    bi_all = (
        toks.select(F.explode(F.expr(_ngrams(2))).alias("bigram"))
        .groupBy("bigram").agg(F.count(F.lit(1)).alias("cnt"))
    )
    # T2 = ALL bigram occurrences (the probability denominator is the
    # corpus, not the surviving pairs) — computed before min_count
    t2 = bi_all.agg(F.sum("cnt").cast("double").alias("_t2"))
    bi = bi_all.where(F.col("cnt") >= min_count)
    w1 = F.expr("split(bigram, ' ')[0]")
    w2 = F.expr("split(bigram, ' ')[1]")
    u1 = uni.select(F.col("w").alias("_w1"), F.col("cw").alias("_c1"))
    u2 = uni.select(F.col("w").alias("_w2"), F.col("cw").alias("_c2"))
    scored = (
        bi.withColumn("_w1", w1).withColumn("_w2", w2)
        .join(F.broadcast(u1), "_w1")
        .join(F.broadcast(u2), "_w2")
        .crossJoin(F.broadcast(t1))
        .crossJoin(F.broadcast(t2))
        .select(
            "bigram", "cnt",
            portable_round(
                F.log((F.col("cnt") / F.col("_t2"))
                      / ((F.col("_c1") / F.col("_t1"))
                         * (F.col("_c2") / F.col("_t1")))),
                _R,
            ).alias("pmi"),
        )
    )
    return scored.orderBy(F.desc("pmi"), F.asc("bigram")).limit(k)


def _pmi_sql(k: int, min_count: int) -> str:
    return f"""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
uni AS (
    SELECT w, count(*) AS cw
    FROM (SELECT unnest(tk) AS w FROM t) GROUP BY 1
),
t1 AS (SELECT CAST(sum(cw) AS DOUBLE) AS t1 FROM uni),
bi_all AS (
    SELECT bigram, count(*) AS cnt
    FROM (SELECT unnest(list_transform(range(1, len(tk)),
                        i -> tk[i] || ' ' || tk[i + 1])) AS bigram
          FROM t)
    GROUP BY 1
),
t2 AS (SELECT CAST(sum(cnt) AS DOUBLE) AS t2 FROM bi_all),
bi AS (SELECT * FROM bi_all WHERE cnt >= {min_count}),
scored AS (
    SELECT bi.bigram, bi.cnt,
           round(ln((bi.cnt / t2.t2)
                    / ((u1.cw / t1.t1) * (u2.cw / t1.t1))), 4) AS pmi
    FROM bi
    JOIN uni u1 ON u1.w = string_split(bi.bigram, ' ')[1]
    JOIN uni u2 ON u2.w = string_split(bi.bigram, ' ')[2]
    CROSS JOIN t1 CROSS JOIN t2
)
SELECT bigram, cnt, pmi FROM scored
ORDER BY pmi DESC, bigram ASC LIMIT {k}
"""


# ------------------------------------------------------------------
# unigram-LM perplexity scoring
# ------------------------------------------------------------------

def unigram_logppl(docs: DataFrame) -> DataFrame:
    """Per-document mean token surprisal under the corpus's own
    unigram distribution: ``logppl = −(1/n) Σ ln(c_w / T)`` — the
    model-free core of CCNet-style perplexity filtering (high =
    rare-token soup / gibberish, low = common-word boilerplate; real
    pipelines threshold both tails).

    Scale shape: ONE map-side-combined corpus exchange total. Per-doc
    term frequencies come from the same ``groupBy(doc_id, token)``
    exchange pattern as ``tfidf_topk`` stage 1; the unigram LM is the
    vocab-sized rollup OF that relation (sum of tf — no second corpus
    pass), its total rides a 1-row broadcast cross join, and the
    surprisal join is broadcast vocab into the (doc, token, tf)
    relation followed by a ``groupBy(doc_id)`` of the deduped
    relation.
    """
    toks = docs.select(
        "doc_id", F.explode(F.expr("split(text, ' ')")).alias("w"))
    tf = toks.groupBy("doc_id", "w").agg(F.count(F.lit(1)).alias("tf"))
    uni = tf.groupBy("w").agg(F.sum("tf").alias("cw"))
    tot = uni.agg(F.sum("cw").cast("double").alias("_tot"))
    lm = F.broadcast(
        uni.crossJoin(F.broadcast(tot))
        .select("w", F.log(F.col("cw") / F.col("_tot")).alias("_lp"))
    )
    return (
        tf.join(lm, "w")
        .groupBy("doc_id")
        .agg(
            F.sum("tf").cast("long").alias("n_tokens"),
            (-F.sum(F.col("tf") * F.col("_lp"))
             / F.sum("tf")).alias("_lppl"),
        )
        .select("doc_id", "n_tokens",
                portable_round(F.col("_lppl"), _R).alias("logppl"))
    )


_LOGPPL_SQL = """
WITH toks AS (
    SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
),
tf AS (SELECT doc_id, w, count(*) AS tf FROM toks GROUP BY 1, 2),
uni AS (SELECT w, sum(tf) AS cw FROM tf GROUP BY 1),
tot AS (SELECT CAST(sum(cw) AS DOUBLE) AS tot FROM uni)
SELECT tf.doc_id,
       CAST(sum(tf.tf) AS BIGINT) AS n_tokens,
       round(-sum(tf.tf * ln(uni.cw / tot.tot)) / sum(tf.tf), 4) AS logppl
FROM tf JOIN uni USING (w) CROSS JOIN tot
GROUP BY tf.doc_id, tot.tot
"""


def bigram_logppl(docs: DataFrame, smoothing: float = 0.5) -> DataFrame:
    """Per-document mean bigram surprisal under the corpus's own
    Laplace-smoothed bigram LM:
    ``logppl = −(1/m) Σ ln((c(w1,w2) + a) / (c(w1·) + a·V))`` over the
    doc's m word transitions. The word-ORDER-sensitive step beyond
    :func:`unigram_logppl`: a document built from globally common
    words in an incoherent order (shuffled text, word-salad spam, SEO
    keyword stuffing) has normal unigram perplexity but high bigram
    perplexity — this is the signal that separates them. ``c(w1·)`` is
    the context count (Σ_w2 c(w1, w2), i.e. occurrences of w1 that
    HAVE a successor), V the distinct-token vocabulary, ``a`` the
    Laplace constant so unseen transitions never hit log(0).

    Scale shape: the (doc, w1, w2) transition relation collapses
    map-side per doc before its ONE corpus-sized exchange; the bigram
    LM (c12) is a rollup OF that relation, the context counts a
    rollup of the LM, and V rides a 1-row broadcast cross join (no
    collect). The surprisal join keys on (w1, w2): at web scale the
    bigram vocabulary does NOT broadcast, so both sides hash-exchange
    on the bigram key (the LM side is bigram-vocab-sized) and the
    final rollup shuffles doc-keyed counts. Single-token documents
    have no transitions and are absent from the output (documented —
    left-join against the corpus to surface them as NULL).
    """
    s = float(smoothing)
    if s <= 0:
        raise ValueError(f"smoothing must be > 0, got {smoothing}")
    toks = docs.select("doc_id", F.split(F.col("text"), " ").alias("_t"))
    bg = toks.select(
        "doc_id",
        F.explode(F.expr(
            "CASE WHEN size(_t) >= 2 THEN transform(sequence(1, "
            "size(_t) - 1), i -> struct(element_at(_t, i) AS w1, "
            "element_at(_t, i + 1) AS w2)) ELSE array() END"
        )).alias("_b"),
    ).select("doc_id", "_b.w1", "_b.w2")
    bf = bg.groupBy("doc_id", "w1", "w2").agg(
        F.count(F.lit(1)).alias("_k"))
    big = bf.groupBy("w1", "w2").agg(F.sum("_k").alias("_c12"))
    ctx = big.groupBy("w1").agg(F.sum("_c12").alias("_c1"))
    vdf = (
        docs.select(F.explode(F.split(F.col("text"), " ")).alias("_w"))
        .agg(F.countDistinct("_w").cast("double").alias("_v"))
    )
    lp = (
        big.join(ctx, "w1")
        .crossJoin(F.broadcast(vdf))
        .select(
            "w1", "w2",
            F.log((F.col("_c12") + F.lit(s))
                  / (F.col("_c1") + F.lit(s) * F.col("_v"))).alias("_lp"),
        )
    )
    return (
        bf.join(lp, ["w1", "w2"])
        .groupBy("doc_id")
        .agg(
            F.sum("_k").cast("long").alias("n_bigrams"),
            portable_round(
                -F.sum(F.col("_k") * F.col("_lp")) / F.sum("_k"), _R
            ).alias("logppl"),
        )
    )


def _bigram_logppl_sql(smoothing: float) -> str:
    s = float(smoothing)
    return f"""
WITH toks AS (
    SELECT doc_id, string_split(text, ' ') AS t FROM documents
),
bg AS (
    SELECT doc_id, t[i] AS w1, t[i + 1] AS w2
    FROM toks, unnest(range(1, len(t))) AS u(i)
),
bf AS (SELECT doc_id, w1, w2, count(*) AS k FROM bg GROUP BY 1, 2, 3),
big AS (SELECT w1, w2, sum(k) AS c12 FROM bf GROUP BY 1, 2),
ctx AS (SELECT w1, sum(c12) AS c1 FROM big GROUP BY 1),
v AS (
    SELECT CAST(count(DISTINCT w) AS DOUBLE) AS v
    FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
),
lp AS (
    SELECT big.w1, big.w2,
           ln((big.c12 + {s}) / (ctx.c1 + {s} * v.v)) AS lp
    FROM big JOIN ctx USING (w1) CROSS JOIN v
)
SELECT bf.doc_id, CAST(sum(bf.k) AS BIGINT) AS n_bigrams,
       round(-sum(bf.k * lp.lp) / sum(bf.k), 4) AS logppl
FROM bf JOIN lp ON bf.w1 = lp.w1 AND bf.w2 = lp.w2
GROUP BY 1
"""


# ------------------------------------------------------------------
# sequence packing
# ------------------------------------------------------------------

def segmented_next_fit(tokens, seg_starts, capacity: int):
    """Vectorized next-fit packing over many variable-length streams:
    fill' = fill + n if it fits else n (new bin); bin id increments on
    overflow. An oversized doc (n > capacity) takes a bin alone —
    next-fit never splits a document. Same position-major block-scan
    layout as ``stats.segmented_ewma`` (two int state vectors)."""
    import numpy as np
    from yahoo_anomaly_detection_spark.operators.stats import (
        position_major_layout,
    )

    n = len(tokens)
    if n == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    x = np.asarray(tokens, np.int64)
    perm, k, bs, _, max_len = position_major_layout(seg_starts, n)
    xs = x[perm]
    fills = xs.copy()
    bins = np.zeros(n, np.int64)
    for t in range(1, max_len):
        kt = k[t]
        lo, plo = bs[t], bs[t - 1]
        pf = fills[plo: plo + kt]
        cur = xs[lo: lo + kt]
        over = pf + cur > capacity
        fills[lo: lo + kt] = np.where(over, cur, pf + cur)
        bins[lo: lo + kt] = bins[plo: plo + kt] + over
    out_b = np.empty(n, np.int64)
    out_f = np.empty(n, np.int64)
    out_b[perm] = bins
    out_f[perm] = fills
    return out_b, out_f


def seq_pack(docs: DataFrame, capacity: int = 256,
             keys: tuple[str, ...] = ("source",),
             order_col: str = "doc_id") -> DataFrame:
    """Sequence packing for LLM training: assign documents to
    fixed-token-budget training sequences by NEXT-FIT in a
    deterministic stream order — the step between a curated corpus
    and the batch loader (packing several short documents per context
    window instead of padding each to full length; T5 / GPT-3 style).

    Next-fit (close the bin on first overflow, never revisit) is the
    streaming-friendly packing discipline: one sequential pass per
    stream, O(1) state, deterministic under (keys, order_col) — unlike
    first-fit-decreasing it needs no global sort by size and no
    open-bin index. Documents longer than ``capacity`` get a bin
    alone (never split). Packing runs per ``keys`` stream (per-shard
    packing, the production shape) via the shared
    ``stats.segmented_scan`` scaffold — ONE key exchange, one
    vectorized mapInPandas pass.

    Output per doc: ``n_tokens`` (whitespace tokens), ``bin_id``
    (0-based within the stream), ``bin_fill`` (stream-bin occupancy
    AFTER placing the doc — the last doc of a bin reports its final
    fill, giving the packing-efficiency rollup for free:
    ``sum(n_tokens) / (count(distinct bins) · capacity)``).
    """
    if capacity < 1:
        raise ValueError(f"capacity must be >= 1, got {capacity}")
    import numpy as np
    from pyspark.sql import types as T
    from yahoo_anomaly_detection_spark.operators.stats import segmented_scan

    base = docs.select(
        *keys, order_col,
        F.expr("size(split(text, ' '))").cast("long").alias("n_tokens"),
    )

    def kernel(pdf, starts):
        bins, fills = segmented_next_fit(
            pdf["n_tokens"].to_numpy(np.int64), starts, capacity)
        return {"bin_id": bins, "bin_fill": fills}

    return segmented_scan(
        base, keys, order_col,
        [("bin_id", T.LongType(), "int64"),
         ("bin_fill", T.LongType(), "int64")],
        kernel,
    )


def _seq_pack_sql(capacity: int) -> str:
    return f"""
WITH RECURSIVE t AS (
    SELECT source, doc_id,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
           row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
    FROM documents
),
pack AS (
    SELECT source, doc_id, n_tokens, rn,
           CAST(0 AS BIGINT) AS bin_id, n_tokens AS bin_fill
    FROM t WHERE rn = 1
    UNION ALL
    SELECT s.source, s.doc_id, s.n_tokens, s.rn,
           CASE WHEN p.bin_fill + s.n_tokens <= {capacity}
                THEN p.bin_id ELSE p.bin_id + 1 END,
           CASE WHEN p.bin_fill + s.n_tokens <= {capacity}
                THEN p.bin_fill + s.n_tokens ELSE s.n_tokens END
    FROM pack p JOIN t s ON s.source = p.source AND s.rn = p.rn + 1
)
SELECT source, doc_id, n_tokens, bin_id, bin_fill FROM pack
"""


# ------------------------------------------------------------------
# BPE pair statistics (tokenizer training, merge round 0)
# ------------------------------------------------------------------

def bpe_pair_counts(docs: DataFrame, k: int = 30) -> DataFrame:
    """Adjacent-character-pair counts over all word occurrences — the
    statistic byte-pair encoding (Sennrich et al. 2016) maximizes to
    pick each merge: the top-k pairs here ARE the first k candidate
    merges of a character-level BPE tokenizer trained on this corpus
    (before any merge is applied).

    Scale shape: explode words (narrow), expand each word occurrence
    to its length-1 adjacent pairs via a JVM ``transform(sequence)``
    (whole-stage codegen, no Python), then ONE map-side-combined
    ``groupBy(pair)`` whose output is pair-vocabulary-sized (≤ a few
    thousand for any natural-language byte alphabet — the reason BPE
    training scales at all), finished with distributed top-k
    (TakeOrderedAndProject, never a global sort). Pair counts are
    per-OCCURRENCE (a corpus word appearing 1000× contributes 1000×),
    matching the BPE objective, not the distinct-word vocabulary.
    """
    words = docs.select(
        F.explode(
            F.expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)")
        ).alias("w")
    ).where(F.length("w") >= 2)
    pairs = words.select(
        F.explode(
            F.expr("transform(sequence(1, length(w) - 1), "
                   "i -> substring(w, i, 2))")
        ).alias("pair")
    )
    counts = pairs.groupBy("pair").agg(F.count(F.lit(1)).alias("cnt"))
    top = counts.orderBy(F.desc("cnt"), F.asc("pair")).limit(k)
    return top.select(
        "pair", "cnt",
        F.row_number().over(
            Window.orderBy(F.desc("cnt"), F.asc("pair"))
        ).cast("int").alias("rank"),
    )


def _bpe_pairs_sql(k: int) -> str:
    return f"""
WITH w AS (
    SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS w
    FROM documents
),
p AS (
    SELECT unnest(list_transform(range(1, length(w)),
                                 i -> substr(w, i, 2))) AS pair
    FROM w WHERE length(w) >= 2
),
c AS (SELECT pair, count(*) AS cnt FROM p GROUP BY 1)
SELECT pair, cnt,
       CAST(row_number() OVER (ORDER BY cnt DESC, pair ASC) AS INT) AS rank
FROM c ORDER BY cnt DESC, pair ASC LIMIT {k}
"""


# ------------------------------------------------------------------
# Token-budget mixture sampling (data mixing)
# ------------------------------------------------------------------

def mixture_sample(docs: DataFrame, weights: dict[str, float],
                   budget_tokens: int, salt: str = "mx0") -> DataFrame:
    """Token-budget data mixing: sample each source stream at the rate
    that makes the EXPECTED token mass of the sampled corpus hit a
    target mixture (the "data mixing" step every LLM training-data
    pipeline runs between curation and packing — e.g. The Pile /
    LLaMA-style source weighting). Given target weights ``{source:
    w}`` and a total token ``budget``, source s is Bernoulli-sampled
    at ``frac_s = min(1, budget · w_s / Σw / T_s)`` where ``T_s`` is
    the source's total token count; sources absent from ``weights``
    are excluded. Over-asked sources (desired > available) cap at 1.0
    — the realized mixture then under-delivers that source, visible in
    the returned ``frac`` column (= the epochs<1 signal; a real
    pipeline would re-normalize or repeat-sample such sources).

    Sampling is a salted md5 of doc_id (the :func:`~..textstats.
    stratified_sample` idiom): bit-for-bit reproducible across engines
    and runs, independent draws per salt, no RNG state.

    Scale shape: per-source totals are ONE map-side-combined
    ``groupBy(source)`` whose output is source-cardinality-sized
    (tens to thousands of rows at 100 TB — never corpus-sized); the
    frac relation broadcasts back onto the corpus, and the sampling
    decision is pure map-side column math. No window, no sort, no
    driver-side data state (weights are config, not data).
    """
    wsum = float(sum(weights.values()))
    wexpr = F.lit(None).cast("double")
    for src, w in weights.items():
        wexpr = F.when(F.col("source") == src,
                       F.lit(float(w) / wsum)).otherwise(wexpr)
    tok = docs.select(
        "doc_id", "source",
        F.expr("size(split(text, ' '))").cast("long").alias("n_tokens"),
    )
    frac = (
        tok.groupBy("source")
        .agg(F.sum("n_tokens").alias("total_tokens"))
        .withColumn("w", wexpr)
        .where(F.col("w").isNotNull())
        .select(
            "source",
            F.least(
                F.lit(1.0),
                F.lit(float(budget_tokens)) * F.col("w")
                / F.col("total_tokens"),
            ).alias("frac"),
        )
    )
    u = (
        F.conv(F.substring(F.md5(F.concat_ws(":", F.lit(salt),
                                             F.col("doc_id"))), 1, 8),
               16, 10).cast("long")
        / F.lit(4294967296.0)
    )
    return (
        tok.join(F.broadcast(frac), "source")
        .where(u < F.col("frac"))
        .select("doc_id", "source", "n_tokens",
                portable_round(F.col("frac"), _R).alias("frac"))
    )


def _mixture_sql(weights: dict[str, float], budget_tokens: int,
                 salt: str) -> str:
    wsum = float(sum(weights.values()))
    cases = " ".join(
        f"WHEN '{s}' THEN {float(w) / wsum!r}" for s, w in weights.items()
    )
    return f"""
WITH tok AS (
    SELECT doc_id, source,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
    FROM documents
),
frac AS (
    SELECT source,
           least(1.0, {float(budget_tokens)} * (CASE source {cases} END)
                 / sum(n_tokens)) AS frac
    FROM tok GROUP BY source
    HAVING (CASE source {cases} END) IS NOT NULL
)
SELECT t.doc_id, t.source, t.n_tokens, round(f.frac, 4) AS frac
FROM tok t JOIN frac f USING (source)
WHERE CAST(concat('0x', substr(md5(concat('{salt}', ':',
           CAST(t.doc_id AS VARCHAR))), 1, 8)) AS BIGINT)
      / 4294967296.0 < f.frac
"""


def shingle_novelty(docs: DataFrame, n: int = 3) -> DataFrame:
    """Per-document contribution novelty: of the doc's distinct word
    n-gram shingles, the fraction whose FIRST corpus occurrence (min
    doc_id over all docs containing the shingle) is this doc —
    (doc_id, n_shingles, n_novel, novelty).

    The greedy-dedup ordering signal: processing a corpus in doc_id
    order (the usual crawl-snapshot convention), ``novelty`` is
    exactly the share of a doc's shingles that survive an
    already-seen-shingle Bloom/set filter — near-0 docs are
    boilerplate re-crawls contributing nothing new; near-1 docs are
    fresh content. Complements pairwise dedup (``minhash_lsh_pairs``
    finds twins; this scores *marginal contribution* even when no
    single twin exists — e.g. a mashup of ten seen pages).

    Shingles are the same 32-bit-md5-hashed distinct word n-grams as
    :func:`dedup.shingles` (and hash-collision semantics match the
    oracle exactly). Scale shape: ONE shingle-keyed exchange (the
    min-doc_id window — no groupBy+join round trip) + ONE doc-keyed
    map-side-combined rollup; no self-join, no corpus×corpus
    anywhere. Docs with < n tokens have no shingles: n_shingles = 0,
    novelty NULL.
    """
    from yahoo_anomaly_detection_spark.operators.dedup import shingles

    sh = shingles(docs.select("doc_id", "text"), n)
    first = sh.withColumn(
        "first_doc", F.min("doc_id").over(Window.partitionBy("shingle")))
    per_doc = first.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_shingles"),
        F.sum((F.col("doc_id") == F.col("first_doc")).cast("long"))
        .alias("n_novel"),
    )
    return docs.select("doc_id").join(per_doc, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_shingles", F.lit(0)).cast("long").alias("n_shingles"),
        F.coalesce("n_novel", F.lit(0)).cast("long").alias("n_novel"),
        F.when(
            F.col("n_shingles") > 0,
            portable_round(
                F.col("n_novel") / F.col("n_shingles").cast("double"), _R),
        ).alias("novelty"),
    )


def _novelty_sql(n: int) -> str:
    from yahoo_anomaly_detection_spark.operators.dedup import HEXINT_SQL

    g = HEXINT_SQL.format(x="g")
    return f"""
WITH tok AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
gram AS (
    SELECT doc_id,
           unnest(CASE WHEN len(w) >= {n}
                       THEN list_transform(
                               generate_series(1, len(w) - {n - 1}),
                               i -> array_to_string(w[i:i + {n - 1}], ' '))
                       ELSE [] END) AS g
    FROM tok
),
sh AS (SELECT DISTINCT doc_id, {g} AS shingle FROM gram),
fo AS (
    SELECT doc_id,
           min(doc_id) OVER (PARTITION BY shingle) AS first_doc
    FROM sh
),
pd AS (
    SELECT doc_id,
           count(*) AS n_shingles,
           CAST(sum(CASE WHEN doc_id = first_doc THEN 1 ELSE 0 END)
                AS BIGINT) AS n_novel
    FROM fo GROUP BY 1
)
SELECT d.doc_id,
       COALESCE(pd.n_shingles, 0) AS n_shingles,
       COALESCE(pd.n_novel, 0) AS n_novel,
       CASE WHEN pd.n_shingles > 0
            THEN round(pd.n_novel / CAST(pd.n_shingles AS DOUBLE), 4)
       END AS novelty
FROM documents d LEFT JOIN pd USING (doc_id)
"""


# the driver query's mixture: one deliberately over-asked source
# (src0 desired 1500 > its ~1435 available tokens -> frac caps at
# 1.0), two fractional sources, all other sources excluded
MIXTURE_WEIGHTS = {"src0": 6.0, "src1": 1.0, "src2": 1.0}
MIXTURE_BUDGET = 2000


ORACLE_SQL = {
    "mixture_sample": _mixture_sql(MIXTURE_WEIGHTS, MIXTURE_BUDGET, "mx0"),
    "doc_repetition": _repetition_sql(0.20, 0.30),
    # n=4 on the ~30-word synthetic vocabulary ≈ the selectivity a
    # 13-gram check has on real text (3-grams flag ~87% of this
    # corpus — the false-positive flood longer n exists to avoid)
    "decontaminate": _decontaminate_sql(4, 20),
    "pmi_bigrams": _pmi_sql(40, 5),
    "unigram_logppl": _LOGPPL_SQL,
    "bigram_logppl": _bigram_logppl_sql(0.5),
    "seq_pack": _seq_pack_sql(256),
    "bpe_pairs": _bpe_pairs_sql(30),
    "shingle_novelty": _novelty_sql(3),
}


PII_PATTERNS = {
    "email": r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}",
    "phone": r"\+?[0-9][0-9 ()-]{7,}[0-9]",
    "long_id": r"\b[0-9]{9,}\b",
}


def pii_scan(docs: DataFrame,
             patterns: dict[str, str] = PII_PATTERNS) -> DataFrame:
    """Data-governance PII audit per source: how many documents (and
    total hits) match each sensitive-data pattern — the scrub-or-drop
    decision a curation pipeline makes BEFORE text ships to training
    (emails, phone-like runs, long numeric identifiers; the pattern
    dict is caller-extensible). Patterns stay in the RE2 ∩ Java-regex
    common subset so the Spark plan and the DuckDB oracle read the
    same language.

    Output per source: (source, n_docs, then per pattern
    ``docs_<name>`` and ``hits_<name>``) — exact integers.

    Scale shape: pure map-side ``regexp_extract_all`` over the text
    column (whole-stage codegen, no Python), ONE map-side-combined
    groupBy(source); output is |sources| rows. At 100 TB the regex
    scan is bandwidth-bound — exactly the shape you want (no
    shuffle, no second pass; add patterns without adding scans).
    """
    cols = []
    for name, pat in patterns.items():
        # Spark's SQL string literal consumes backslashes ('\b' ->
        # 'b'); double them so the regex engine sees the original.
        # DuckDB's standard SQL literals pass backslashes through
        # untouched, so the oracle embeds the pattern verbatim.
        spat = pat.replace("\\", "\\\\")
        hits = F.size(F.expr(
            f"regexp_extract_all(lower(text), '{spat}', 0)"))
        cols.append(F.sum((hits > 0).cast("long"))
                    .alias(f"docs_{name}"))
        cols.append(F.sum(hits.cast("long")).alias(f"hits_{name}"))
    return docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"), *cols)


def _pii_sql(patterns: dict[str, str] = PII_PATTERNS) -> str:
    parts = []
    for name, pat in patterns.items():
        sq = pat.replace("'", "''")
        h = f"len(regexp_extract_all(lower(text), '{sq}'))"
        parts.append(
            f"CAST(sum(CASE WHEN {h} > 0 THEN 1 ELSE 0 END) AS BIGINT)"
            f" AS docs_{name}")
        parts.append(f"CAST(sum({h}) AS BIGINT) AS hits_{name}")
    cols = ",\n       ".join(parts)
    return f"""
SELECT source, count(*) AS n_docs,
       {cols}
FROM documents GROUP BY 1
"""


ORACLE_SQL["pii_scan"] = _pii_sql()


def time_folds(events: DataFrame, k: int = 5,
               ts_col: str = "ts") -> DataFrame:
    """Walk-forward (time-ordered) cross-validation folds — the
    eval-splitter for temporal data where the random/hashed splits
    (``cluster_split``, ``ingest``'s train/val/test) would LEAK the
    future into training: distinct days are ordered and dealt into
    ``k`` contiguous folds with ``ntile`` (SQL-standard even split,
    remainder to the leading folds — deterministic on every engine);
    fold i is the eval window when training on folds < i.

    Output: (fold, fold_start, fold_end, n_days, n_events).

    Scale shape: the fold assignment runs entirely on the DISTINCT
    day relation (≤ span-days rows — metadata-sized; the only global
    window in the operator sorts THAT, never events); events take
    one broadcast join onto their day and one map-side-combined
    rollup.
    """
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    from pyspark.sql.window import Window as _W

    day = F.date_trunc("day", F.col(ts_col))
    days = events.select(day.alias("day")).distinct()
    folds = days.withColumn(
        "fold", F.ntile(k).over(_W.orderBy("day")))
    tagged = events.select(day.alias("day")).join(
        F.broadcast(folds), "day")
    return (tagged.groupBy("fold")
            .agg(F.min("day").alias("fold_start"),
                 F.max("day").alias("fold_end"),
                 F.countDistinct("day").alias("n_days"),
                 F.count(F.lit(1)).alias("n_events")))


def _time_folds_sql(k: int = 5) -> str:
    return f"""
WITH d AS (
    SELECT DISTINCT date_trunc('day', ts) AS day FROM events
),
f AS (
    SELECT day, ntile({k}) OVER (ORDER BY day) AS fold FROM d
),
t AS (
    SELECT f.fold, f.day
    FROM events e JOIN f ON f.day = date_trunc('day', e.ts)
)
SELECT fold, min(day) AS fold_start, max(day) AS fold_end,
       count(DISTINCT day) AS n_days, count(*) AS n_events
FROM t GROUP BY 1
"""


ORACLE_SQL["time_folds"] = _time_folds_sql()
