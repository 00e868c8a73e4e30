"""Corpus-filtering queries: repetition, domain blocklist, PII, sampling.

Training-data-pipeline operators beyond the reference's surface
(BASELINE.json north star): Gopher-style repetition screening, C4-style
domain blocklist filtering with per-domain rollups, PII detection and
redaction, and deterministic stratified sampling. All JVM-side (array
lambdas + regexp built-ins, no Python UDFs), all oracle-checked.

The `documents` corpus is synthetic word-salad with no real URLs or PII,
so `pii_detect_redact` injects a deterministic synthetic email + phone
derived from `doc_id` before detection — the detection/redaction
machinery (regexp_extract_all / regexp_replace) is the thing under test,
and it stays exactly oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tracy_matdb_spark.catalog import (
    gated_local_checkpoint,
    load,
    spread_unsplittable_scan,
)
from tracy_matdb_spark.functions import prng
from tracy_matdb_spark.operators import textops
from tracy_matdb_spark.operators.rank import grouped_prefix_sum, grouped_value_rank
from tracy_matdb_spark.queries import register

# ---------------------------------------------------------------------------
# Repetition / token-diversity screening (Gopher-style quality rule)
# ---------------------------------------------------------------------------


def _rep_layers(dialect: str) -> tuple[list[str], list[str]]:
    """(tokenize layer, metric layer): __t / __d are materialized ONCE —
    inlining the tokenizer into top_freq's lambda would re-lex the text
    once per DISTINCT TOKEN per row (the evaluation trap the round-4
    sweep caught)."""
    toks = textops.toks_expr(dialect)
    if dialect == "spark":
        layer0 = ["doc_id", f"{toks} AS __t", f"array_distinct({toks}) AS __d"]
        n_tok = "cast(size(__t) as bigint)"
        n_distinct = "cast(size(__d) as bigint)"
        top_freq = "cast(array_max(transform(__d, t -> size(filter(__t, x -> x = t)))) as bigint)"
    else:
        layer0 = ["doc_id", f"{toks} AS __t", f"list_distinct({toks}) AS __d"]
        n_tok = "cast(len(__t) as bigint)"
        n_distinct = "cast(len(__d) as bigint)"
        top_freq = "cast(list_max(list_transform(__d, t -> len(list_filter(__t, x -> x = t)))) as bigint)"
    distinct_q = textops.quant_ratio_expr(n_distinct, n_tok)
    top_q = textops.quant_ratio_expr(top_freq, n_tok)
    return layer0, [
        "doc_id",
        f"{n_tok} AS n_tokens",
        f"{n_distinct} AS n_distinct",
        f"{top_freq} AS top_freq",
        f"{distinct_q} AS distinct_ratio_q",
        f"{top_q} AS top_frac_q",
        f"(CASE WHEN {distinct_q} >= 200000 AND {top_q} <= 300000 "
        f"THEN true ELSE false END) AS rep_ok",
    ]


@register(
    "repetition_ratio",
    oracle=(
        lambda layers: f"""
    SELECT {', '.join(layers[1])}
    FROM (SELECT {', '.join(layers[0])} FROM documents WHERE n_chars > 0) t
    ORDER BY doc_id
    """
    )(_rep_layers("duckdb")),
)
def repetition_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-diversity screening (Gopher repetition rules): distinct-token
    ratio and top-token frequency fraction per document, with a keep/drop
    flag. Map-only array lambdas — zero shuffles, trivially parallel.

    The top-frequency term is O(distinct x tokens) per row, which is the
    right trade for bounded-length web documents (no shuffle at all); for
    book-length documents the explode -> groupBy(doc_id, tok) -> max form
    is the scale path (one shuffle keyed on doc_id, map-side combine)."""
    docs = load(spark, sf_dir, ("documents",))["documents"]
    layer0, layer1 = _rep_layers("spark")
    return (
        docs.filter(F.col("n_chars") > 0)
        .selectExpr(*layer0)
        .selectExpr(*layer1)
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Domain blocklist filter + per-domain rollup (C4-style source curation)
# ---------------------------------------------------------------------------

BLOCKED_SOURCES = ("src3", "src7", "src11", "src15", "src19")


@register(
    "domain_blocklist_rollup",
    oracle=f"""
    SELECT source,
           cast(count(*) as bigint)      AS n_docs,
           cast(sum(n_chars) as bigint)  AS sum_chars,
           cast(min(doc_id) as bigint)   AS first_doc
    FROM documents
    WHERE source NOT IN ({', '.join(repr(s) for s in BLOCKED_SOURCES)})
    GROUP BY source
    ORDER BY source
    """,
)
def domain_blocklist_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocklist filter + per-domain corpus stats. The blocklist is a small
    curated dimension: broadcast LEFT ANTI join (no shuffle of the corpus
    side beyond the final rollup), then one hash aggregation keyed on
    source with map-side partials. At 100 TB the blocklist stays
    KB-sized — the broadcast is bounded by construction, unlike the
    per-document tables the plan sweep forbids broadcasting."""
    docs = load(spark, sf_dir, ("documents",))["documents"]
    blocklist = spark.createDataFrame(
        [(s,) for s in BLOCKED_SOURCES], "source string"
    )
    return (
        docs.join(F.broadcast(blocklist), "source", "left_anti")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("sum_chars"),
            F.min("doc_id").cast("bigint").alias("first_doc"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# PII detection + redaction (regexp built-ins, map-only)
# ---------------------------------------------------------------------------

_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PHONE_RE = r"\+1-555-[0-9]{4}"


@register(
    "pii_detect_redact",
    oracle=f"""
    SELECT doc_id,
           cast(len(regexp_extract_all(aug, '{_EMAIL_RE}')) as bigint) AS n_emails,
           cast(len(regexp_extract_all(aug, '{_PHONE_RE}')) as bigint) AS n_phones,
           md5(regexp_replace(regexp_replace(aug, '{_EMAIL_RE}', '[EMAIL]', 'g'),
                              '{_PHONE_RE}', '[PHONE]', 'g')) AS red_md5
    FROM (SELECT doc_id,
                 concat(text, ' contact user', cast(doc_id as varchar),
                        '@example.com +1-555-',
                        lpad(cast(doc_id % 10000 as varchar), 4, '0')) AS aug
          FROM documents)
    ORDER BY doc_id
    """,
)
def pii_detect_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII detection + redaction over the corpus: count email/phone matches
    and emit the md5 of the redacted text. Pure regexp built-ins in one
    narrow map stage — no shuffle, no Python. The corpus is synthetic, so
    a deterministic email+phone derived from doc_id is injected first
    (documented above); on real data the injection step disappears and
    the detection plan is unchanged."""
    docs = load(spark, sf_dir, ("documents",))["documents"]
    aug = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com +1-555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
    )
    redacted = F.regexp_replace(
        F.regexp_replace(aug, _EMAIL_RE, "[EMAIL]"), _PHONE_RE, "[PHONE]"
    )
    return (
        docs.select(
            "doc_id",
            F.size(F.regexp_extract_all(aug, F.lit(_EMAIL_RE), F.lit(0)))
            .cast("bigint")
            .alias("n_emails"),
            F.size(F.regexp_extract_all(aug, F.lit(_PHONE_RE), F.lit(0)))
            .cast("bigint")
            .alias("n_phones"),
            F.md5(redacted).alias("red_md5"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Deterministic stratified sampling (sampleBy, reproducibly)
# ---------------------------------------------------------------------------

# rate 0.5 for the head strata, 0.2 for the tail, as exact integer
# thresholds against hash60's [0, 2^60) range — no float on either side.
_HEAD_SOURCES = ("src0", "src1", "src2", "src3", "src4")
_THRESH_HEAD = 2**59  # 0.5 * 2^60
_THRESH_TAIL = (2**60) // 5  # 0.2 * 2^60, floored


@register(
    "stratified_sample",
    oracle=f"""
    SELECT doc_id, source
    FROM documents
    WHERE ('0x' || substr(md5(concat_ws('|', 'strat', cast(doc_id as varchar), source)), 1, 15))::bigint
          < (CASE WHEN source IN ({', '.join(repr(s) for s in _HEAD_SOURCES)})
                  THEN {_THRESH_HEAD} ELSE {_THRESH_TAIL} END)
    ORDER BY doc_id
    """,
)
def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-stratum sampling (`df.sampleBy` semantics) made reproducible:
    keep a row iff hash60(seed, doc_id, source) clears the stratum's
    integer threshold. Unlike `sampleBy`'s seeded Bernoulli (partition-
    order dependent under retries), this is a pure row function — the
    same rows survive at any parallelism, so resampling a 100 TB corpus
    is restartable and auditable. Map-only, integer compare, no floats
    (mirrors the portable PRNG contract in functions/prng.py)."""
    docs = load(spark, sf_dir, ("documents",))["documents"]
    thresh = (
        F.when(F.col("source").isin(*_HEAD_SOURCES), F.lit(_THRESH_HEAD))
        .otherwise(F.lit(_THRESH_TAIL))
    )
    return (
        docs.filter(prng.hash60("strat", F.col("doc_id"), F.col("source")) < thresh)
        .select("doc_id", "source")
        .orderBy("doc_id")
    )


@register(
    "repetition_ratio_exploded",
    oracle=(
        lambda layers: f"""
    SELECT {', '.join(layers[1])}
    FROM (SELECT {', '.join(layers[0])} FROM documents WHERE n_chars > 0) t
    ORDER BY doc_id
    """
    )(_rep_layers("duckdb")),
)
def repetition_ratio_exploded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale variant of repetition_ratio for long documents: explode tokens,
    count per (doc_id, token), then roll up per doc — O(tokens) work in
    two shuffles (both keyed on doc_id so AQE coalesces them; map-side
    combine shrinks the first to distinct-token cardinality) instead of
    the map-only O(distinct x tokens) array scan. Same output, same
    oracle — which one wins is a per-corpus cost decision."""
    docs = load(spark, sf_dir, ("documents",))["documents"]
    toks = docs.filter(F.col("n_chars") > 0).select(
        "doc_id", F.explode(F.expr(textops.toks_expr("spark"))).alias("tok")
    )
    per_tok = toks.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("cnt"))
    agg = per_tok.groupBy("doc_id").agg(
        F.sum("cnt").cast("bigint").alias("n_tokens"),
        F.count(F.lit(1)).cast("bigint").alias("n_distinct"),
        F.max("cnt").cast("bigint").alias("top_freq"),
    )
    distinct_q = textops.quant_ratio_expr("n_distinct", "n_tokens")
    top_q = textops.quant_ratio_expr("top_freq", "n_tokens")
    return agg.selectExpr(
        "doc_id",
        "n_tokens",
        "n_distinct",
        "top_freq",
        f"{distinct_q} AS distinct_ratio_q",
        f"{top_q} AS top_frac_q",
        f"(CASE WHEN {distinct_q} >= 200000 AND {top_q} <= 300000 "
        f"THEN true ELSE false END) AS rep_ok",
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# Document chunking + sequence packing (training-sequence preparation)
# ---------------------------------------------------------------------------

CHUNK_W = 32  # window length (tokens)
CHUNK_S = 24  # stride (tokens; W - S = 8-token overlap)
PACK_BUDGET = 1024  # tokens per packed training sequence


@register(
    "doc_chunk_windows",
    oracle=f"""
    WITH d AS (SELECT doc_id, {{toks}} AS toks FROM documents WHERE n_chars > 0)
    SELECT doc_id,
           cast((i - 1) // {CHUNK_S} as bigint) AS chunk_id,
           cast(len(list_slice(toks, i, i + {CHUNK_W - 1})) as bigint) AS n_chunk_toks,
           md5(array_to_string(list_slice(toks, i, i + {CHUNK_W - 1}), ' ')) AS chunk_md5
    FROM d CROSS JOIN (SELECT unnest(generate_series(1,
        (SELECT max(len(toks)) FROM d), {CHUNK_S})) AS i) g
    WHERE i <= len(toks)
    ORDER BY doc_id, chunk_id
    """.format(toks=textops.toks_expr("duckdb")),
)
def doc_chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping token-window chunking (context-length preparation):
    each document explodes into stride-{CHUNK_S} windows of {CHUNK_W}
    tokens (final windows truncated). One narrow explode stage — fan-out
    is len/stride per document, no shuffle before the output sort. The
    chunk md5 stands in for the chunk text to keep the verified output
    compact."""
    toks = textops.toks_expr("spark")
    docs = load(spark, sf_dir, ("documents",))["documents"]
    chunks = (
        docs.filter(F.col("n_chars") > 0)
        .selectExpr("doc_id", f"{toks} AS toks")
        .select(
            "doc_id",
            F.explode(F.expr(f"sequence(1, size(toks), {CHUNK_S})")).alias("i"),
            "toks",
        )
        .selectExpr(
            "doc_id",
            f"cast((i - 1) div {CHUNK_S} as bigint) AS chunk_id",
            f"cast(size(slice(toks, i, {CHUNK_W})) as bigint) AS n_chunk_toks",
            f"md5(array_join(slice(toks, i, {CHUNK_W}), ' ')) AS chunk_md5",
        )
    )
    # checkpoint (corpus-gated) before the global sort: tokenize+explode
    # +md5 feeds orderBy with no shuffle boundary, so the
    # range-partitioner's sampling job would re-run the whole chunking
    # pipeline (the entity_resolution_pairs double-execution, r8); above
    # the gate the 2x recompute is the scale-safe trade
    return gated_local_checkpoint(chunks, sf_dir).orderBy("doc_id", "chunk_id")


@register(
    "pack_sequences",
    oracle=f"""
    WITH d AS (SELECT doc_id, source,
                      cast(len({textops.toks_expr('duckdb')}) as bigint) AS n_tokens
               FROM documents WHERE n_chars > 0)
    SELECT doc_id, source, n_tokens,
           cast((sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 - n_tokens) // {PACK_BUDGET} as bigint) AS bin_id
    FROM d
    ORDER BY doc_id
    """,
)
def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic sequence packing: assign documents to fixed
    token-budget bins ({PACK_BUDGET} tokens) by prefix-sum — a document
    starts in the bin its cumulative offset falls in. With only ~20
    sources a per-source running-sum window would scan each whole
    source in ONE task, so the cumulative offset comes from the
    two-phase range-sliced prefix sum (operators/rank.py
    grouped_prefix_sum: parallel per-slice running sums + O(slices)
    broadcast offsets) — the property that lets a 100 TB corpus pack
    in one pass. Order within a source is doc_id: reproducible,
    restart-safe, no RNG."""
    toks = textops.toks_expr("spark")
    docs = load(spark, sf_dir, ("documents",))["documents"]
    d = docs.filter(F.col("n_chars") > 0).selectExpr(
        "doc_id", "source", f"cast(size({toks}) as bigint) AS n_tokens"
    )
    summed = grouped_prefix_sum(d, ["source"], ["doc_id"], "n_tokens", out_col="__csum")
    return (
        summed.withColumn(
            "bin_id",
            ((F.col("__csum") - F.col("n_tokens")) / PACK_BUDGET).cast("bigint"),
        )
        .select("doc_id", "source", "n_tokens", "bin_id")
        .orderBy("doc_id")
    )


N_SHARDS = 8  # output shards for the balanced-shard assignment


@register(
    "shard_token_budget",
    oracle=f"""
    WITH d AS (SELECT doc_id,
                      cast(len({textops.toks_expr('duckdb')}) as bigint) AS n_tokens
               FROM documents WHERE n_chars > 0),
    r AS (SELECT doc_id, n_tokens,
                 row_number() OVER (ORDER BY n_tokens DESC, doc_id) - 1 AS rk
          FROM d),
    s AS (SELECT n_tokens,
                 CASE WHEN (rk // {N_SHARDS}) % 2 = 0 THEN rk % {N_SHARDS}
                      ELSE {N_SHARDS} - 1 - (rk % {N_SHARDS}) END AS shard_id
          FROM r)
    SELECT cast(shard_id as bigint) AS shard_id,
           cast(count(*) as bigint) AS n_docs,
           cast(sum(n_tokens) as bigint) AS tokens_total,
           cast(max(n_tokens) as bigint) AS max_doc_tokens
    FROM s GROUP BY shard_id ORDER BY shard_id
    """,
)
def shard_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Balanced output sharding: assign every document to one of
    {N_SHARDS} training shards by SNAKE order over the global
    token-count rank (rank docs largest-first; deal them out
    boustrophedon — 0..N-1 then N-1..0), the classic deterministic
    approximation of longest-processing-time balancing. Per-shard token
    totals then differ by at most one document's tokens per dealing
    pass, so shard skew is bounded without any greedy driver loop.

    Scale shape: the global largest-first rank is the two-phase
    range-sliced rank (operators/rank.py grouped_value_rank under a
    constant group: repartitionByRange slices + parallel per-slice
    windows + O(slices) broadcast offsets) — NEVER a bare
    row_number() OVER (ORDER BY ...) single-task sort; the snake
    arithmetic is a map-only expression on the rank and the rollup is
    one keyed aggregation with map-side combine. This is the write-side
    twin of pack_sequences: packing fills fixed budgets in corpus
    order, sharding balances totals across a fixed shard count."""
    toks = textops.toks_expr("spark")
    docs = load(spark, sf_dir, ("documents",))["documents"]
    d = (
        docs.filter(F.col("n_chars") > 0)
        .selectExpr("doc_id", f"cast(size({toks}) as bigint) AS n_tokens")
        .withColumn("__g", F.lit(0))
        .withColumn("__negt", -F.col("n_tokens"))
    )
    ranked = grouped_value_rank(
        d, ["__g"], ["__negt", "doc_id"], out_col="__rk", single_scan=True
    ).withColumn("__rk", F.col("__rk") - 1)
    snake = ranked.selectExpr(
        "n_tokens",
        f"CASE WHEN (__rk div {N_SHARDS}) % 2 = 0 THEN __rk % {N_SHARDS} "
        f"ELSE {N_SHARDS} - 1 - (__rk % {N_SHARDS}) END AS shard_id",
    )
    return (
        snake.groupBy(F.col("shard_id").cast("long").alias("shard_id"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("tokens_total"),
            F.max("n_tokens").cast("long").alias("max_doc_tokens"),
        )
        .orderBy("shard_id")
    )


# ---------------------------------------------------------------------------
# Benchmark decontamination, TF-IDF, domain-mixture weights
# ---------------------------------------------------------------------------

DECON_N = 4  # n-gram length for train/eval overlap detection
EVAL_SOURCE = "src0"  # the synthetic 'benchmark' slice of the corpus


@register(
    "decontam_ngram_overlap",
    oracle=f"""
    WITH d AS (SELECT doc_id, source, {{toks}} AS toks
               FROM documents WHERE n_chars > 0),
    sh AS (SELECT DISTINCT doc_id, source,
                  md5(array_to_string(list_slice(toks, i, i + {DECON_N - 1}), ' ')) AS ng
           FROM d CROSS JOIN (SELECT unnest(generate_series(1,
               (SELECT max(len(toks)) FROM d))) AS i) g
           WHERE i + {DECON_N - 1} <= len(toks))
    SELECT c.doc_id,
           cast(count(DISTINCT c.ng) as bigint) AS n_ngrams_hit,
           cast(count(DISTINCT e.doc_id) as bigint) AS n_eval_docs
    FROM sh c JOIN sh e ON c.ng = e.ng
    WHERE e.source = '{EVAL_SOURCE}' AND c.source <> '{EVAL_SOURCE}'
    GROUP BY c.doc_id
    ORDER BY c.doc_id
    """.format(toks=textops.toks_expr("duckdb")),
)
def decontam_ngram_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/eval decontamination: flag corpus documents sharing any
    word-{DECON_N}-gram with the held-out benchmark slice (source =
    {EVAL_SOURCE}), the standard n-gram-collision contamination check
    run before training. Both sides dedupe (doc, n-gram) BEFORE the
    join, so the equi join is keyed on an md5'd fixed-width n-gram hash
    whose per-key fan-out is bounded by doc count, never raw token
    positions — no cartesian anywhere. At 100 TB the eval side is tiny
    (benchmarks are ~1e5 rows) and broadcastable; here it rides the
    same hash shuffle."""
    toks = textops.toks_expr("spark")
    docs = load(spark, sf_dir, ("documents",))["documents"]
    sh = (
        docs.filter(F.col("n_chars") > 0)
        .selectExpr("doc_id", "source", f"{toks} AS toks")
        .select(
            "doc_id",
            "source",
            F.explode(F.expr(f"sequence(1, size(toks) - {DECON_N - 1})")).alias("i"),
            "toks",
        )
        .selectExpr("doc_id", "source", f"md5(array_join(slice(toks, i, {DECON_N}), ' ')) AS ng")
        .distinct()
    )
    ev = sh.filter(F.col("source") == EVAL_SOURCE).select(
        F.col("ng"), F.col("doc_id").alias("eval_doc")
    )
    return (
        sh.filter(F.col("source") != EVAL_SOURCE)
        .join(ev, "ng")
        .groupBy("doc_id")
        .agg(
            F.countDistinct("ng").alias("n_ngrams_hit"),
            F.countDistinct("eval_doc").alias("n_eval_docs"),
        )
        .orderBy("doc_id")
    )


@register(
    "tfidf_top_terms",
    oracle=f"""
    WITH d AS (SELECT doc_id, {{toks}} AS toks FROM documents WHERE n_chars > 0),
    t AS (SELECT doc_id, unnest(toks) AS term FROM d),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM t GROUP BY doc_id, term),
    df AS (SELECT term, count(DISTINCT doc_id) AS df FROM t GROUP BY term),
    n AS (SELECT count(*) AS n_docs FROM d),
    scored AS (SELECT tf.doc_id, tf.term,
                      round(tf.tf * ln(cast(n.n_docs as double) / df.df), 6) AS tfidf,
                      row_number() OVER (PARTITION BY tf.doc_id
                          ORDER BY tf.tf * ln(cast(n.n_docs as double) / df.df) DESC,
                                   tf.term) AS rnk
               FROM tf JOIN df ON tf.term = df.term CROSS JOIN n)
    SELECT doc_id, cast(rnk as int) AS rnk, term, tfidf
    FROM scored WHERE rnk <= 3
    ORDER BY doc_id, rnk
    """.format(toks=textops.toks_expr("duckdb")),
)
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document top-3 TF-IDF terms. Two aggregations (term frequency
    per doc, document frequency per term) meet in an equi join on term,
    then a per-doc window rank — every shuffle is keyed on a
    high-cardinality column (doc_id or term), partial aggregation
    applies to both, and the window partitions by doc_id so no global
    sort exists. The corpus size N is a single count() scalar folded
    into the idf literal (one job, not a row-wise broadcast)."""
    toks = textops.toks_expr("spark")
    from pyspark.sql import Window

    docs = load(spark, sf_dir, ("documents",))["documents"].filter(F.col("n_chars") > 0)
    n_docs = docs.count()
    terms = docs.selectExpr("doc_id", f"explode({toks}) AS term")
    tf = terms.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df = terms.distinct().groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = tf.join(df, "term").withColumn(
        "score", F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df"))
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), "term")
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select(
            "doc_id",
            F.col("rnk").cast("int").alias("rnk"),
            "term",
            F.round("score", 6).alias("tfidf"),
        )
        .orderBy("doc_id", "rnk")
    )


@register(
    "mixture_weights",
    oracle=f"""
    WITH s AS (SELECT source,
                      cast(count(*) as bigint) AS n_docs,
                      cast(sum(len({{toks}})) as bigint) AS n_tokens
               FROM documents WHERE n_chars > 0 GROUP BY source)
    SELECT source, n_docs, n_tokens,
           round((cast(sum(n_tokens) OVER () as double) / count(*) OVER ())
                 / n_tokens, 6) AS weight
    FROM s
    ORDER BY source
    """.format(toks=textops.toks_expr("duckdb")),
)
def mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mixture reweighting: per-source sampling weights that
    equalize the token share of every source (weight = uniform-target
    tokens / actual tokens), the arithmetic behind training-mixture
    rebalancing. The corpus-wide totals come from an unpartitioned
    window over the ALREADY-AGGREGATED per-source table — 20 rows, so
    the single-partition window is on the rollup, never the corpus."""
    from pyspark.sql import Window

    toks = textops.toks_expr("spark")
    docs = load(spark, sf_dir, ("documents",))["documents"]
    s = (
        docs.filter(F.col("n_chars") > 0)
        .selectExpr("source", f"cast(size({toks}) as bigint) AS n_toks")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_toks").alias("n_tokens"),
        )
    )
    w = Window.partitionBy()
    return s.select(
        "source",
        "n_docs",
        "n_tokens",
        F.round(
            (F.sum("n_tokens").over(w).cast("double") / F.count(F.lit(1)).over(w))
            / F.col("n_tokens"),
            6,
        ).alias("weight"),
    ).orderBy("source")


VOCAB_K = 20  # corpus-wide top-k vocabulary entries


@register(
    "vocab_top_terms",
    oracle=f"""
    WITH t AS (SELECT unnest({{toks}}) AS term FROM documents WHERE n_chars > 0),
    tot AS (SELECT count(*) AS n FROM t)
    SELECT term, cast(count(*) as bigint) AS n_occ,
           round(count(*) / (SELECT cast(n as double) FROM tot), 6) AS share
    FROM t
    GROUP BY term
    ORDER BY n_occ DESC, term
    LIMIT {VOCAB_K}
    """.format(toks=textops.toks_expr("duckdb")),
)
def vocab_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide top-{VOCAB_K} vocabulary with occurrence share — the
    frequency table a tokenizer build starts from. One explode + one
    term-keyed aggregation (map-side partials absorb the Zipf head
    before the shuffle, so hot terms cost one partial row per task, not
    one shuffle row per occurrence), then TakeOrdered for the top-k —
    no global sort. The total token count folds in as a scalar from the
    same aggregate pass."""
    toks = textops.toks_expr("spark")
    docs = load(spark, sf_dir, ("documents",))["documents"]
    terms = docs.filter(F.col("n_chars") > 0).selectExpr(f"explode({toks}) AS term")
    counts = terms.groupBy("term").agg(F.count(F.lit(1)).alias("n_occ"))
    total = counts.agg(F.sum("n_occ")).first()[0]
    return (
        counts.select(
            "term",
            "n_occ",
            F.round(F.col("n_occ") / F.lit(float(total)), 6).alias("share"),
        )
        .orderBy(F.col("n_occ").desc(), "term")
        .limit(VOCAB_K)
    )


# ---------------------------------------------------------------------------
# Per-source relative quality gate (keep the top half within each domain)
# ---------------------------------------------------------------------------


def _qscore(dialect: str) -> str:
    toks = textops.toks_expr(dialect)
    n_tok = f"cast({'size' if dialect == 'spark' else 'len'}({toks}) as bigint)"
    n_stop = f"cast({textops.count_in_expr(dialect, toks, textops.STOPWORDS)} as bigint)"
    return textops.quant_ratio_expr(n_stop, n_tok)


@register(
    "quality_percentile_gate",
    oracle=f"""
    WITH scored AS (
        SELECT doc_id, source, {_qscore('duckdb')} AS score,
               row_number() OVER (PARTITION BY source
                                  ORDER BY {_qscore('duckdb')} DESC, doc_id) AS rn,
               count(*) OVER (PARTITION BY source) AS n_src
        FROM documents WHERE n_chars > 0
    )
    SELECT doc_id, source, score,
           (rn * 2 <= n_src) AS kept
    FROM scored
    ORDER BY doc_id
    """,
)
def quality_percentile_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relative quality gate: within each source, keep the top half of
    documents by stopword-density score — the per-domain percentile
    filtering used when absolute thresholds would empty some domains
    and pass everything in others. With ~20 sources a per-source
    window would sort each whole source in ONE task, so the in-source
    rank comes from the two-phase range-sliced rank (operators/rank.py
    grouped_value_rank; score negated for descending order, doc_id
    tie-break) and per-source sizes are a tiny broadcast aggregate.
    Score is the integer-quantized ratio (exact in both engines), so
    the gate is fully reproducible."""
    docs = load(spark, sf_dir, ("documents",))["documents"]
    scored = docs.filter(F.col("n_chars") > 0).selectExpr(
        "doc_id", "source", f"{_qscore('spark')} AS score"
    )
    neg = scored.withColumn("__negscore", -F.col("score"))
    # per-source sizes ride the rank's own offsets broadcast (total_col)
    # instead of a second scan+groupBy+join; single_scan materializes
    # the sliced rows once for the offsets and window branches
    ranked = grouped_value_rank(
        neg, ["source"], ["__negscore", "doc_id"], out_col="rn",
        single_scan=True, total_col="n_src",
    )
    return (
        ranked.select(
            "doc_id",
            "source",
            "score",
            (F.col("rn") * 2 <= F.col("n_src")).alias("kept"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Corpus statistics: length histogram + unigram entropy
# ---------------------------------------------------------------------------


@register(
    "doc_length_histogram",
    oracle="""
    SELECT cast(length(bin(n_chars)) as int) AS bucket_pow2,
           cast(count(*) as bigint) AS n_docs,
           cast(min(n_chars) as bigint) AS min_chars,
           cast(max(n_chars) as bigint) AS max_chars
    FROM documents WHERE n_chars > 0
    GROUP BY bucket_pow2
    ORDER BY bucket_pow2
    """,
    doc="Power-of-two document-length histogram (bucket = bit length of "
    "n_chars, i.e. floor(log2)+1, computed with integer bit arithmetic "
    "— no float log, so bucketing is exact in both engines). Map-only "
    "+ a tiny rollup; the distribution dashboard every corpus build "
    "starts with.",
)
def doc_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, ("documents",))["documents"]
    return (
        docs.filter(F.col("n_chars") > 0)
        .selectExpr("cast(length(bin(n_chars)) as int) AS bucket_pow2", "n_chars")
        .groupBy("bucket_pow2")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("n_chars").cast("bigint").alias("min_chars"),
            F.max("n_chars").cast("bigint").alias("max_chars"),
        )
        .orderBy("bucket_pow2")
    )


@register(
    "token_entropy",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, unnest({{toks}}) AS term FROM documents WHERE n_chars > 0
    ),
    tf AS (SELECT doc_id, term, count(*) AS c FROM t GROUP BY doc_id, term),
    n AS (SELECT doc_id, sum(c) AS n FROM tf GROUP BY doc_id)
    SELECT tf.doc_id,
           round(-sum((c / cast(n.n as double)) * ln(c / cast(n.n as double))), 6)
               AS entropy,
           cast(count(*) as bigint) AS n_distinct
    FROM tf JOIN n ON tf.doc_id = n.doc_id
    GROUP BY tf.doc_id
    ORDER BY tf.doc_id
    """.format(toks=textops.toks_expr("duckdb")),
)
def token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document unigram entropy — the information-density quality
    signal that separates word-salad from templated/repetitive text
    (low entropy = repetition, complements repetition_ratio's top-token
    rule). Explode -> (doc, term) count -> per-doc normalize: two
    aggregations keyed on high-cardinality columns, map-side partials
    on both, no window and no join with anything unbounded."""
    toks = textops.toks_expr("spark")
    docs = load(spark, sf_dir, ("documents",))["documents"]
    tf = (
        docs.filter(F.col("n_chars") > 0)
        .selectExpr("doc_id", f"explode({toks}) AS term")
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    from pyspark.sql import Window

    n = Window.partitionBy("doc_id")
    p = F.col("c") / F.sum("c").over(n)
    return (
        tf.withColumn("p", p)
        .groupBy("doc_id")
        .agg(
            F.round(-F.sum(F.col("p") * F.log(F.col("p"))), 6).alias("entropy"),
            F.count(F.lit(1)).alias("n_distinct"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Cross-source vocabulary overlap (domain-mixing diagnostic)
# ---------------------------------------------------------------------------


@register(
    "source_vocab_overlap",
    oracle=f"""
    WITH tv AS (
        SELECT DISTINCT source, unnest({{toks}}) AS term
        FROM documents WHERE n_chars > 0
    ),
    sizes AS (SELECT source, count(*) AS nv FROM tv GROUP BY source),
    common AS (
        SELECT a.source AS src_a, b.source AS src_b, count(*) AS n_common
        FROM tv a JOIN tv b ON a.term = b.term AND a.source < b.source
        GROUP BY src_a, src_b
    )
    SELECT src_a, src_b, cast(n_common as bigint) AS n_common,
           {textops.quant_ratio_expr('n_common', '(sa.nv + sb.nv - n_common)')} AS jaccard_q
    FROM common
    JOIN sizes sa ON sa.source = src_a
    JOIN sizes sb ON sb.source = src_b
    ORDER BY src_a, src_b
    """.format(toks=textops.toks_expr("duckdb")),
)
def source_vocab_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise vocabulary Jaccard between sources — the domain-overlap
    matrix behind mixing decisions (near-identical domains waste
    mixture weight; disjoint ones justify it). The per-source vocab
    dedupe happens BEFORE the term self-join, so per-term fan-out is
    bounded by the number of sources (a constant), never document
    counts; the quantized ratio keeps parity integer-exact."""
    toks = textops.toks_expr("spark")
    docs = load(spark, sf_dir, ("documents",))["documents"]
    tv = (
        docs.filter(F.col("n_chars") > 0)
        .selectExpr("source", f"explode({toks}) AS term")
        .distinct()
    )
    sizes = tv.groupBy("source").agg(F.count(F.lit(1)).alias("nv"))
    b = tv.select(F.col("source").alias("src_b"), F.col("term").alias("term_b"))
    common = (
        tv.join(b, (F.col("term") == F.col("term_b")) & (F.col("source") < F.col("src_b")))
        .groupBy(F.col("source").alias("src_a"), "src_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col("source").alias("src_a"), F.col("nv").alias("nv_a"))
    sb = sizes.select(F.col("source").alias("src_b"), F.col("nv").alias("nv_b"))
    return (
        common.join(F.broadcast(sa), "src_a")
        .join(F.broadcast(sb), "src_b")
        .selectExpr(
            "src_a",
            "src_b",
            "cast(n_common as bigint) AS n_common",
            f"{textops.quant_ratio_expr('n_common', '(nv_a + nv_b - n_common)')} AS jaccard_q",
        )
        .orderBy("src_a", "src_b")
    )


# ---------------------------------------------------------------------------
# Inverted-index build (term -> posting list)
# ---------------------------------------------------------------------------


@register(
    "inverted_index_postings",
    oracle=f"""
    WITH tv AS (
        SELECT DISTINCT unnest({{toks}}) AS term, doc_id
        FROM documents WHERE n_chars > 0
    )
    SELECT term,
           cast(count(*) as bigint) AS df,
           array_to_string(list_sort(list(doc_id)), ',') AS postings
    FROM tv
    GROUP BY term
    HAVING count(*) >= 300
    ORDER BY term
    """.format(toks=textops.toks_expr("duckdb")),
)
def inverted_index_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index build: term -> sorted posting list (emitted as a
    comma string for exact cross-engine comparison) for high-df terms.
    One (term, doc) dedupe then a term-keyed aggregation — map-side
    partials absorb the Zipf head; at 100 TB the posting lists write
    out partitioned by term hash (bounded per-term memory via the df
    cutoff shown, or positional chunking for the true long tail)."""
    toks = textops.toks_expr("spark")
    docs = load(spark, sf_dir, ("documents",))["documents"]
    tv = (
        docs.filter(F.col("n_chars") > 0)
        .selectExpr(f"explode({toks}) AS term", "doc_id")
        .distinct()
    )
    return (
        tv.groupBy("term")
        .agg(
            F.count(F.lit(1)).alias("df"),
            F.array_join(F.array_sort(F.collect_list("doc_id")), ",").alias("postings"),
        )
        .filter(F.col("df") >= 300)
        .orderBy("term")
    )


# ---------------------------------------------------------------------------
# HTML -> text extraction (the C4/CCNet boilerplate-removal stage)
# ---------------------------------------------------------------------------


def _html_wrap(dialect: str) -> str:
    """Deterministic HTML page per document row (same construction in
    both engines): headline from `source`, body from `text`, plus
    script/style/comment boilerplate the extractor must drop."""
    nl = "chr(10)"
    return (
        "concat('<html><head><title>x</title><script>var a = 1 < 2 && 3 > 2;</script>"
        "<style>p {margin: 0}</style></head><body><h1>', source, '</h1>', "
        f"{nl}, '<p>', text, '</p><!-- tracker -->"
        "<div>footer &amp; legal</div></body></html>')"
    )


@register(
    "html_extract_text",
    oracle=f"""
    WITH pages AS (
        SELECT doc_id, text, {_html_wrap('duckdb')} AS html FROM documents
    )
    SELECT doc_id,
           cast(length({textops.html_to_text_expr('duckdb')}) as bigint) AS n_extracted,
           {textops.html_to_text_expr('duckdb')} LIKE
               '%' || trim(regexp_replace(text, '\\s+', ' ', 'g')) || '%' AS recovered
    FROM pages
    ORDER BY doc_id
    """,
    doc="HTML boilerplate removal (the C4/CCNet extraction stage) as "
    "one JVM regex chain — drop script/style/comments, tags to "
    "whitespace/newlines, entity decode, whitespace collapse — spec'd "
    "to the common subset of Java regex and RE2 so the DuckDB twin "
    "computes identical bytes (operators/textops.py:html_to_text_expr). "
    "Map-only, no shuffle; `recovered` pins that the body text "
    "survives extraction verbatim.",
)
def html_extract_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, ("documents",))["documents"]
    pages = docs.selectExpr("doc_id", "text", f"{_html_wrap('spark')} AS html")
    ext = textops.html_to_text_expr("spark")
    return pages.selectExpr(
        "doc_id",
        f"cast(length({ext}) as bigint) AS n_extracted",
        f"({ext}) LIKE concat('%', trim(regexp_replace(text, '\\\\s+', ' ')), '%') AS recovered",
    ).orderBy("doc_id")



# ---------------------------------------------------------------------------
# Gopher quality rules (Rae et al. 2021, arXiv:2112.11446 Appendix A1.1;
# adopted by Dolma/FineWeb) — the published rule-based document filter.
# ---------------------------------------------------------------------------


def _gopher_exprs(dialect: str) -> list[str]:
    """The rule metrics as engine-shared SQL. Whitespace tokenization
    (the paper's unit), alphabetic-word fraction, mean word length,
    ellipsis density, stopword presence. Thresholds follow the paper
    except the word-count floor (50 -> 10: the synthetic docs are
    short; the comparison operators are what is under test)."""
    if dialect == "spark":
        split = "split(trim(text), '\\\\s+')"
    else:
        split = "regexp_split_to_array(trim(text), '\\s+')"
    size = "size" if dialect == "spark" else "len"
    n_words = f"cast({size}({split}) as bigint)"
    n_alpha = (
        f"cast({size}(filter({split}, w -> w rlike '[a-zA-Z]')) as bigint)"
        if dialect == "spark"
        else f"cast(len(list_filter({split}, w -> regexp_matches(w, '[a-zA-Z]'))) as bigint)"
    )
    sum_len = (
        f"aggregate({split}, cast(0 as bigint), (a, w) -> a + length(w))"
        if dialect == "spark"
        else f"list_reduce(list_transform({split}, w -> cast(length(w) as bigint)), (a, b) -> a + b)"
    )
    n_ellipsis = (
        f"cast(size(split(text, '\\\\.\\\\.\\\\.')) - 1 as bigint)"
        if dialect == "spark"
        else "cast(len(regexp_split_to_array(text, '\\.\\.\\.')) - 1 as bigint)"
    )
    if dialect == "spark":
        n_stop = (
            f"cast(size(filter({split}, w -> w in ('the','and','of','to','in'))) as bigint)"
        )
    else:
        n_stop = (
            f"cast(len(list_filter({split}, w -> w in ('the','and','of','to','in'))) as bigint)"
        )
    mean_len_q = f"cast(floor(cast({sum_len} as double) * 1000 / {n_words}) as bigint)"
    alpha_q = f"cast(floor(cast({n_alpha} as double) * 1000000 / {n_words}) as bigint)"
    return [
        "doc_id",
        f"{n_words} AS n_words",
        f"{mean_len_q} AS mean_word_len_milli",
        f"{alpha_q} AS alpha_frac_ppm",
        f"{n_ellipsis} AS n_ellipsis",
        f"{n_stop} AS n_stop",
        f"(CASE WHEN {n_words} BETWEEN 10 AND 100000"
        f" AND {mean_len_q} BETWEEN 3000 AND 10000"
        f" AND {alpha_q} >= 800000"
        f" AND {n_ellipsis} * 10 <= {n_words}"
        f" AND {n_stop} >= 2 THEN true ELSE false END) AS gopher_ok",
    ]


@register(
    "gopher_quality_rules",
    oracle=f"""
    SELECT {', '.join(_gopher_exprs('duckdb'))}
    FROM documents
    ORDER BY doc_id
    """,
    doc="Gopher rule-based document filter (arXiv:2112.11446 A1.1, the "
    "Dolma/FineWeb heuristic set): word-count bounds, mean word "
    "length, alphabetic-word fraction, ellipsis density, stopword "
    "presence — one codegen'd map-only projection per document, "
    "integer-quantized ratios identical in both engines.",
)
def gopher_quality_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, ("documents",))["documents"]
    return docs.selectExpr(*_gopher_exprs("spark")).orderBy("doc_id")


# ---------------------------------------------------------------------------
# Capstone: the corpus pipeline END-TO-END in one lazy plan
# ---------------------------------------------------------------------------


@register(
    "corpus_e2e_rollup",
    headline=True,  # perf-track the flagship two-shuffle integration plan
    # The oracle is the SAME pipeline as composed DuckDB CTEs — every
    # stage reuses the dual-dialect expression that already has its own
    # green row (html_to_text_expr, _gopher_exprs, the dedup fp), so a
    # break here isolates stage *composition*, not stage logic.
    oracle=f"""
    WITH pages AS (
        SELECT doc_id, lang, {_html_wrap('duckdb')} AS html FROM documents
    ),
    extracted AS (
        SELECT doc_id, lang, {textops.html_to_text_expr('duckdb')} AS text
        FROM pages
    ),
    scored AS (
        SELECT doc_id, lang, text,
               length(text) > 0 AS nonempty,
               {_gopher_exprs('duckdb')[-1].rsplit(' AS ', 1)[0]} AS gopher_ok
        FROM extracted
    ),
    keyed AS (
        SELECT *,
               CASE WHEN gopher_ok
                    THEN md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g')))
                    ELSE concat('u#', cast(doc_id as varchar)) END AS fp,
               cast(len(regexp_split_to_array(trim(text), '\\s+')) as bigint) AS n_tok
        FROM scored
    ),
    ranked AS (
        SELECT *, doc_id = min(doc_id) OVER (PARTITION BY fp) AS first_of_fp
        FROM keyed
    )
    SELECT lang,
           cast(count(*) as bigint) AS n_raw,
           cast(sum(CASE WHEN nonempty THEN 1 ELSE 0 END) as bigint) AS n_nonempty,
           cast(sum(CASE WHEN gopher_ok THEN 1 ELSE 0 END) as bigint) AS n_quality,
           cast(sum(CASE WHEN gopher_ok AND first_of_fp THEN 1 ELSE 0 END) as bigint)
               AS n_unique,
           cast(sum(CASE WHEN gopher_ok AND first_of_fp THEN n_tok ELSE 0 END) as bigint)
               AS sum_tokens_kept
    FROM ranked
    GROUP BY lang ORDER BY lang
    """,
    doc="The LLM corpus pipeline end-to-end as ONE lazy Spark plan: "
    "HTML extraction -> Gopher quality rules -> exact dedup "
    "(min-doc_id per fingerprint, non-quality rows excluded via "
    "per-row unique keys) -> per-language rollup with stage-by-stage "
    "survival counts. Stages are map-only until the dedup window "
    "(keyed on the high-cardinality fingerprint) and the final keyed "
    "agg — two shuffles total at any scale.",
)
def corpus_e2e_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = spread_unsplittable_scan(
        load(spark, sf_dir, ("documents",))["documents"], sf_dir, "documents"
    )
    pages = docs.selectExpr("doc_id", "lang", f"{_html_wrap('spark')} AS html")
    extracted = pages.selectExpr(
        "doc_id", "lang", f"{textops.html_to_text_expr('spark')} AS text"
    )
    gopher_ok = _gopher_exprs("spark")[-1].rsplit(" AS ", 1)[0]
    scored = extracted.selectExpr(
        "doc_id", "lang", "text", "length(text) > 0 AS nonempty", f"{gopher_ok} AS gopher_ok"
    )
    keyed = scored.selectExpr(
        "*",
        "CASE WHEN gopher_ok"
        " THEN md5(lower(regexp_replace(trim(text), '\\\\s+', ' ')))"
        " ELSE concat('u#', cast(doc_id as string)) END AS fp",
        "cast(size(split(trim(text), '\\\\s+')) as bigint) AS n_tok",
    )
    ranked = keyed.withColumn(
        "first_of_fp", F.col("doc_id") == F.min("doc_id").over(Window.partitionBy("fp"))
    )
    return (
        ranked.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_raw"),
            F.sum(F.col("nonempty").cast("int")).cast("bigint").alias("n_nonempty"),
            F.sum(F.col("gopher_ok").cast("int")).cast("bigint").alias("n_quality"),
            F.sum((F.col("gopher_ok") & F.col("first_of_fp")).cast("int"))
            .cast("bigint")
            .alias("n_unique"),
            F.sum(
                F.when(F.col("gopher_ok") & F.col("first_of_fp"), F.col("n_tok")).otherwise(0)
            )
            .cast("bigint")
            .alias("sum_tokens_kept"),
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# Unicode text normalization (the pre-tokenization cleanup stage)
# ---------------------------------------------------------------------------

_NBSP, _ENQUAD, _ZWSP = " ", " ", "​"
_LDQ, _RDQ, _EMD = "“", "”", "—"


def _tn_messy() -> str:
    """Deterministic unicode mess injected from doc_id (same expression
    text in both dialects): a leading NBSP / EN QUAD / ZWSP by doc_id%4,
    word separators swapped to NBSP or TAB by doc_id%3, and a curly-
    quoted, em-dashed suffix on doc_id%5 == 0."""
    return (
        f"concat(CASE WHEN doc_id % 4 = 0 THEN '{_NBSP}' "
        f"WHEN doc_id % 4 = 1 THEN '{_ENQUAD}' "
        f"WHEN doc_id % 4 = 2 THEN '{_ZWSP}' ELSE '' END, "
        f"replace(text, ' ', CASE WHEN doc_id % 3 = 1 THEN '{_NBSP}' "
        f"WHEN doc_id % 3 = 2 THEN '\t' ELSE ' ' END), "
        f"CASE WHEN doc_id % 5 = 0 THEN '{_LDQ}q{_RDQ}{_EMD}' ELSE '' END)"
    )


def _tn_norm(expr: str, dialect: str) -> str:
    """The normalizer chain: ZWSP removed, NBSP/EN QUAD/TAB to space,
    curly quotes and em dash to ASCII, space runs collapsed, trim.
    regexp_replace is global in Spark, needs 'g' in DuckDB; the char
    classes carry real multi-byte codepoints through both regex engines."""
    g = ", 'g'" if dialect == "duckdb" else ""
    e = f"regexp_replace({expr}, '[{_ZWSP}]', ''{g})"
    e = f"regexp_replace({e}, '[{_NBSP}{_ENQUAD}\t]', ' '{g})"
    e = (
        f"replace(replace(replace({e}, '{_LDQ}', '\"'), "
        f"'{_RDQ}', '\"'), '{_EMD}', '-')"
    )
    return f"trim(regexp_replace({e}, '  +', ' '{g}))"


@register(
    "text_normalize",
    oracle=f"""
    WITH m AS (SELECT doc_id, {_tn_messy()} AS mt FROM documents),
    n AS (SELECT doc_id, mt, {_tn_norm("mt", "duckdb")} AS nt FROM m)
    SELECT doc_id, (mt <> nt) AS changed,
           cast(length(mt) - length(nt) as bigint) AS chars_removed,
           md5(nt) AS norm_md5
    FROM n ORDER BY doc_id
    """,
)
def text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unicode normalization ahead of tokenization: zero-width chars
    removed, NBSP/EN-QUAD/tabs to plain space, curly quotes and em
    dashes to ASCII, space runs collapsed, trimmed — the C4/CCNet-style
    cleanup every web corpus runs before counting a single token. The
    synthetic corpus is clean ASCII, so deterministic mess is injected
    first from doc_id (same construction in the oracle), exactly like
    url_canonicalize's synthetic URLs: the normalizer chain is the
    thing under test, over real multi-byte codepoints in both engines.

    Map-only (regexp/replace chain pushed against the scan, no shuffle
    before the output sort); at 100 TB this fuses into one
    whole-stage-codegen projection. Character counts use length() over
    CODEPOINTS (identical in both engines for UTF-8), so chars_removed
    is byte-order independent."""
    docs = load(spark, sf_dir, ("documents",))["documents"]
    m = docs.selectExpr("doc_id", f"{_tn_messy()} AS mt")
    return (
        m.selectExpr("doc_id", "mt", f"{_tn_norm('mt', 'spark')} AS nt")
        .selectExpr(
            "doc_id",
            "(mt <> nt) AS changed",
            "cast(length(mt) - length(nt) as bigint) AS chars_removed",
            "md5(nt) AS norm_md5",
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# BM25 passage ranking (the retrieval scorer over the inverted index)
# ---------------------------------------------------------------------------

BM25_QUERY = ("scan", "join", "merge")  # fixed 3-term query
BM25_K1 = "cast(1.2 as double)"
BM25_B_DL = "cast(0.75 as double)"  # b, applied to dl*N/total_tokens


def _bm25_sql(dialect: str, n: str = "N", tot: str = "tot") -> str:
    """Okapi BM25 (Lucene idf form) with every input an exact integer
    (tf, df, dl, N, total tokens) so both engines run the identical
    double-precision expression tree: no avgdl pre-division — the
    length normalizer is b * dl * N / tot, algebraically equal to
    b * dl / avgdl but computed integer-first. `n`/`tot` are the corpus
    scalars: column refs in the oracle, folded integer literals in the
    Spark plan."""
    idf = f"ln((cast({n} - df as double) + 0.5) / (cast(df as double) + 0.5) + 1.0)"
    denom = (
        f"cast(tf as double) + {BM25_K1} * "
        f"(1.0 - {BM25_B_DL} + {BM25_B_DL} * cast(dl as double) * "
        f"cast({n} as double) / cast({tot} as double))"
    )
    return f"{idf} * cast(tf as double) * ({BM25_K1} + 1.0) / ({denom})"


@register(
    "bm25_top_docs",
    oracle=f"""
    WITH d AS (SELECT doc_id, {textops.toks_expr('duckdb')} AS toks
               FROM documents WHERE n_chars > 0),
    dl AS (SELECT doc_id, cast(len(toks) as bigint) AS dl FROM d),
    n AS (SELECT cast(count(*) as bigint) AS N,
                 cast(sum(len(toks)) as bigint) AS tot FROM d),
    t AS (SELECT doc_id, unnest(toks) AS term FROM d),
    qt AS (SELECT doc_id, term, cast(count(*) as bigint) AS tf FROM t
           WHERE term IN ({', '.join(repr(t) for t in BM25_QUERY)})
           GROUP BY doc_id, term),
    df AS (SELECT term, cast(count(DISTINCT doc_id) as bigint) AS df
           FROM t WHERE term IN ({', '.join(repr(t) for t in BM25_QUERY)})
           GROUP BY term),
    scored AS (SELECT qt.doc_id,
                      round(sum({_bm25_sql('duckdb')}), 6) AS bm25
               FROM qt JOIN df ON qt.term = df.term
               JOIN dl ON dl.doc_id = qt.doc_id
               CROSS JOIN n
               GROUP BY qt.doc_id)
    SELECT doc_id, bm25 FROM scored
    ORDER BY bm25 DESC, doc_id LIMIT 15
    """,
)
def bm25_top_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 retrieval over the corpus for a fixed 3-term query —
    the ranking function a distributed search/RAG index serves, on top
    of the same (term, doc, tf) substrate as inverted_index_postings.

    Scale shape: tokens explode once; tf and df are keyed aggregations
    RESTRICTED to the query terms before any join (the scan-side IN
    filter makes the scored row count O(docs containing query terms),
    not O(corpus)); df is a 3-row broadcast; corpus scalars N / total
    tokens fold in as literals (one bounded aggregate job, the
    tfidf_top_terms convention). The score expression uses integer
    inputs only (tf, df, dl, N, tot) under identical double ops, so
    round(.., 6) hashes identically in both engines. Top-15 runs as
    TakeOrdered, no global sort."""
    toks = textops.toks_expr("spark")
    docs = load(spark, sf_dir, ("documents",))["documents"].filter(F.col("n_chars") > 0)
    d = docs.selectExpr("doc_id", f"{toks} AS toks")
    scalars = d.selectExpr("count(*) AS N", "sum(size(toks)) AS tot").first()
    n_docs, tot = int(scalars["N"]), int(scalars["tot"])
    inlist = ", ".join(repr(t) for t in BM25_QUERY)
    terms = d.selectExpr(
        "doc_id", "cast(size(toks) as bigint) AS dl", "explode(toks) AS term"
    ).filter(F.expr(f"term IN ({inlist})"))
    qt = terms.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).cast("long").alias("tf"), F.first("dl").alias("dl")
    )
    df_ = (
        terms.select("doc_id", "term").distinct()
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("long").alias("df"))
    )
    score = _bm25_sql("spark", n=str(n_docs), tot=str(tot))
    return (
        qt.join(F.broadcast(df_), "term")
        .groupBy("doc_id")
        .agg(F.round(F.sum(F.expr(score)), 6).alias("bm25"))
        .orderBy(F.col("bm25").desc(), "doc_id")
        .limit(15)
    )


# ---------------------------------------------------------------------------
# Capstone: training-data export manifest (the curation chain end-to-end)
# ---------------------------------------------------------------------------


@register(
    "corpus_export_manifest",
    headline=True,
    oracle=f"""
    WITH d AS (SELECT doc_id, source, trim(text) AS t, {textops.toks_expr('duckdb')} AS toks
               FROM documents WHERE n_chars > 0),
    q AS (SELECT doc_id, source, t, toks,
                 cast(len(toks) as bigint) AS n_tok,
                 cast({textops.count_in_expr('duckdb', 'toks', textops.STOPWORDS)} as bigint) AS n_stop
          FROM d),
    keepq AS (SELECT * FROM q
              WHERE n_tok >= 10 AND n_tok <= 500
                AND {textops.quant_ratio_expr('n_stop', 'n_tok')} < 500000),
    ded AS (SELECT *, min(doc_id) OVER (
                PARTITION BY md5(lower(regexp_replace(t, '\\s+', ' ', 'g')))) AS keep_id
            FROM keepq),
    keptd AS (SELECT doc_id, source, toks, n_tok FROM ded
              WHERE doc_id = keep_id AND source <> '{EVAL_SOURCE}'),
    evg AS (SELECT DISTINCT md5(array_to_string(list_slice(toks, i, i + {DECON_N - 1}), ' ')) AS ng
            FROM d CROSS JOIN (SELECT unnest(generate_series(1,
                (SELECT max(len(toks)) FROM d))) AS i) g
            WHERE source = '{EVAL_SOURCE}' AND i + {DECON_N - 1} <= len(toks)),
    sh AS (SELECT DISTINCT doc_id,
                  md5(array_to_string(list_slice(toks, i, i + {DECON_N - 1}), ' ')) AS ng
           FROM keptd CROSS JOIN (SELECT unnest(generate_series(1,
               (SELECT max(len(toks)) FROM d))) AS i) g
           WHERE i + {DECON_N - 1} <= len(toks)),
    contaminated AS (SELECT DISTINCT doc_id FROM sh JOIN evg USING (ng)),
    surv AS (SELECT doc_id, source, n_tok FROM keptd
             WHERE doc_id NOT IN (SELECT doc_id FROM contaminated)),
    r AS (SELECT source, n_tok,
                 row_number() OVER (ORDER BY n_tok DESC, doc_id) - 1 AS rk
          FROM surv),
    s AS (SELECT source, n_tok,
                 CASE WHEN (rk // {N_SHARDS}) % 2 = 0 THEN rk % {N_SHARDS}
                      ELSE {N_SHARDS} - 1 - (rk % {N_SHARDS}) END AS shard_id
          FROM r)
    SELECT cast(shard_id as bigint) AS shard_id, source,
           cast(count(*) as bigint) AS n_docs,
           cast(sum(n_tok) as bigint) AS n_tokens
    FROM s GROUP BY shard_id, source
    ORDER BY shard_id, source
    """,
)
def corpus_export_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The curation chain END-TO-END as one lazy plan: quality gate
    (token count + stopword ratio) -> exact dedup keep-min ->
    benchmark-slice exclusion + n-gram decontamination against the
    eval source -> snake-balanced shard assignment -> per-(shard,
    source) export manifest. This is the manifest a training job reads;
    every stage is the registered single-purpose operator's exact logic
    (text_quality / dedup_exact / decontam_ngram_overlap /
    shard_token_budget), so the capstone verifies their COMPOSITION —
    filters feeding joins feeding the global rank — not new semantics.

    Scale: tokenization materializes once per doc; the dedup keep-min
    is a window over the md5 fingerprint (high cardinality — parallel);
    decontamination is a hashed n-gram semi-join (eval side tiny and
    broadcastable at real scale); the shard rank is the two-phase
    range-sliced rank; the manifest is one keyed rollup. Shuffles:
    fingerprint, n-gram hash, range slice, rollup — all keyed, no
    quadratic stage.

    r15 reshape (results bit-identical, verified against the unchanged
    oracle): (a) the dedup fingerprint and token stats are computed
    BEFORE the corpus checkpoint so the stored frame carries a 16-byte
    `unhex(md5)` column instead of the raw text — the worst storage
    tenant is gone and the fingerprint window shuffles half the bytes
    (binary vs hex-string equality is 1:1, so the keep-min groups are
    unchanged); (b) the shingle feeds drop their per-(doc, ng) distinct
    pass — `evg` only needs the distinct ng set and `contaminated` only
    the distinct doc set, so the inner distinct was a full shingle-table
    exchange that changed nothing downstream (the eval join is
    broadcast, so duplicate ngrams only repeat a broadcast probe)."""
    toks = textops.toks_expr("spark")
    docs = load(spark, sf_dir, ("documents",))["documents"]
    # tok layer feeds quality + both shingle sides; corpus-gated
    fp = "unhex(md5(lower(regexp_replace(trim(text), '\\\\s+', ' '))))"
    d = gated_local_checkpoint(
        docs.filter(F.col("n_chars") > 0)
        .selectExpr("doc_id", "source", f"{toks} AS toks", f"{fp} AS fp")
        .selectExpr(
            "doc_id", "source", "toks", "fp",
            "cast(size(toks) as bigint) AS n_tok",
            f"cast({textops.count_in_expr('spark', 'toks', textops.STOPWORDS)} as bigint) AS n_stop",
        ),
        sf_dir,
    )
    keepq = d.filter(
        (F.col("n_tok") >= 10) & (F.col("n_tok") <= 500)
        & (F.expr(textops.quant_ratio_expr("n_stop", "n_tok")) < 500000)
    )
    w = Window.partitionBy("fp")
    keptd = (
        keepq.withColumn("keep_id", F.min("doc_id").over(w))
        .filter((F.col("doc_id") == F.col("keep_id")) & (F.col("source") != EVAL_SOURCE))
        .select("doc_id", "source", "toks", "n_tok")
    )
    def shingles(df):
        return (
            df.select(
                "doc_id",
                F.explode(F.expr(f"sequence(1, size(toks) - {DECON_N - 1})")).alias("i"),
                "toks",
            )
            .selectExpr("doc_id", f"md5(array_join(slice(toks, i, {DECON_N}), ' ')) AS ng")
        )
    evg = shingles(d.filter(F.col("source") == EVAL_SOURCE)).select("ng").distinct()
    contaminated = shingles(keptd).join(evg, "ng").select("doc_id").distinct()
    surv = keptd.join(contaminated, "doc_id", "left_anti").select(
        "doc_id", "source", "n_tok"
    ).withColumn("__g", F.lit(0)).withColumn("__negt", -F.col("n_tok"))
    ranked = grouped_value_rank(
        surv, ["__g"], ["__negt", "doc_id"], out_col="__rk", single_scan=True
    ).withColumn("__rk", F.col("__rk") - 1)
    return (
        ranked.selectExpr(
            "source", "n_tok",
            f"CASE WHEN (__rk div {N_SHARDS}) % 2 = 0 THEN __rk % {N_SHARDS} "
            f"ELSE {N_SHARDS} - 1 - (__rk % {N_SHARDS}) END AS shard_id",
        )
        .groupBy(F.col("shard_id").cast("long").alias("shard_id"), "source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_tok").cast("long").alias("n_tokens"),
        )
        .orderBy("shard_id", "source")
    )


# ---------------------------------------------------------------------------
# Quantile normalization across sources (batch-effect correction)
# ---------------------------------------------------------------------------


@register(
    "quantile_normalize_sources",
    oracle="""
    WITH d AS (SELECT doc_id, source, cast(n_chars as bigint) AS v
               FROM documents WHERE n_chars > 0),
    s AS (SELECT doc_id, source, v,
                 row_number() OVER (PARTITION BY source ORDER BY v, doc_id) AS r,
                 count(*) OVER (PARTITION BY source) AS ns
          FROM d),
    g AS (SELECT v AS gv, row_number() OVER (ORDER BY v, doc_id) AS gr FROM d),
    n AS (SELECT cast(count(*) as bigint) AS nn FROM d),
    pos AS (SELECT doc_id, source, v,
                   CASE WHEN ns > 1 THEN (r - 1) * 1000000 // (ns - 1) ELSE 0 END AS p
            FROM s)
    SELECT pos.doc_id, pos.source, pos.v AS orig,
           g.gv AS normalized
    FROM pos CROSS JOIN n
    JOIN g ON g.gr = 1 + (pos.p * (n.nn - 1)) // 1000000
    ORDER BY pos.doc_id
    """,
)
def quantile_normalize_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile normalization of a per-document metric (n_chars) across
    sources: each document's value maps to the GLOBAL value at its
    within-source quantile position — the batch-effect correction that
    makes per-source length/quality distributions comparable before
    mixing (the bioinformatics quantile-normalize, applied to corpus
    stats). Positions are ppm-quantized integers, so the rank lookup is
    exact in both engines.

    Scale shape: the within-source rank is the two-phase range-sliced
    rank (low source cardinality — a naive per-source window is the
    single-task hazard); the global sorted table is the same primitive
    under a constant group; the quantile lookup is a hash equi join on
    the computed global rank (no interpolation, floor semantics); N
    folds from a bounded count. Three range shuffles + one join — no
    global single-task sort anywhere."""
    docs = load(spark, sf_dir, ("documents",))["documents"]
    d = docs.filter(F.col("n_chars") > 0).selectExpr(
        "doc_id", "source", "cast(n_chars as bigint) AS v"
    )
    s = grouped_value_rank(
        d, ["source"], ["v", "doc_id"], out_col="__r", single_scan=True,
        total_col="__ns",
    )
    g = grouped_value_rank(
        d.withColumn("__g", F.lit(0)), ["__g"], ["v", "doc_id"], out_col="gr",
        single_scan=True,
    ).selectExpr("v AS gv", "gr")
    nn = d.count()
    pos = s.selectExpr(
        "doc_id", "source", "v",
        "CASE WHEN __ns > 1 THEN (__r - 1) * 1000000 div (__ns - 1) ELSE 0 END AS p",
    )
    return (
        pos.withColumn("__t", F.expr(f"1 + (p * ({nn} - 1)) div 1000000"))
        .join(g, F.col("__t") == g["gr"])
        .select("doc_id", "source", F.col("v").alias("orig"),
                F.col("gv").alias("normalized"))
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# BPE tokenizer training (Sennrich et al. 2016) as an iterative
# relational plan — the argmax merge of each round is computed IN the
# plan (1-row broadcast), and greedy left-to-right merge application is
# pure windows + gaps-and-islands. No arrays, no UDFs, no driver state.
# ---------------------------------------------------------------------------

BPE_ROUNDS = 5
BPE_TOP_WORDS = 1000


def _bpe_sql(docs_rel: str, dialect: str) -> str:
    """One CTE chain, K rounds of: pair-count -> argmax (deterministic
    tie-break: count DESC, then lexicographic pair) -> greedy
    non-overlapping merge. Overlaps only arise for self-pairs (l == r):
    within each maximal run of consecutive candidate positions, the
    odd island-ranks are the greedy merge starts (floor(run/2) merges —
    exactly Sennrich's left-to-right semantics). Dialect differences
    are confined to tokenize + char-explode fragments."""
    if dialect == "spark":
        tokens = (
            f"SELECT w FROM {docs_rel} "
            "LATERAL VIEW explode(split(lower(text), '[^a-z]+')) tt AS w"
        )
        chars = (
            "SELECT w, freq, pos, substring(w, pos, 1) AS sym FROM words "
            "LATERAL VIEW explode(sequence(1, length(w))) pp AS pos"
        )
    else:
        tokens = (
            "SELECT unnest(regexp_split_to_array(lower(text), '[^a-z]+')) AS w "
            f"FROM {docs_rel}"
        )
        chars = (
            "SELECT w, freq, pos, substring(w, pos, 1) AS sym FROM ("
            "SELECT w, freq, unnest(generate_series(1, length(w))) AS pos FROM words) t"
        )
    ctes = [
        f"words AS (SELECT w, cast(count(*) as bigint) AS freq FROM ({tokens}) t "
        f"WHERE length(w) >= 2 GROUP BY w ORDER BY freq DESC, w LIMIT {BPE_TOP_WORDS})",
        f"syms0 AS ({chars})",
    ]
    for k in range(1, BPE_ROUNDS + 1):
        p = f"syms{k - 1}"
        ctes.append(
            f"paired{k} AS (SELECT w, freq, pos, sym, "
            f"lead(sym) OVER (PARTITION BY w ORDER BY pos) AS nxt FROM {p})"
        )
        ctes.append(
            f"best{k} AS (SELECT sym AS l, nxt AS r, cnt FROM ("
            f"SELECT sym, nxt, cast(sum(freq) as bigint) AS cnt FROM paired{k} "
            f"WHERE nxt IS NOT NULL GROUP BY sym, nxt) b "
            f"ORDER BY cnt DESC, l, r LIMIT 1)"
        )
        ctes.append(
            f"cand{k} AS (SELECT s.w, s.freq, s.pos, s.sym, b.l, b.r, "
            f"CASE WHEN s.sym = b.l AND s.nxt = b.r THEN 1 ELSE 0 END AS c "
            f"FROM paired{k} s CROSS JOIN best{k} b)"
        )
        ctes.append(
            f"isl{k} AS (SELECT *, pos - row_number() OVER "
            f"(PARTITION BY w, c ORDER BY pos) AS isl FROM cand{k})"
        )
        ctes.append(
            f"marked{k} AS (SELECT *, CASE WHEN c = 1 AND (row_number() OVER "
            f"(PARTITION BY w, c, isl ORDER BY pos) % 2) = 1 THEN 1 ELSE 0 END "
            f"AS mstart FROM isl{k})"
        )
        ctes.append(
            f"syms{k} AS (SELECT w, freq, row_number() OVER "
            f"(PARTITION BY w ORDER BY pos) AS pos, "
            f"CASE WHEN mstart = 1 THEN l || r ELSE sym END AS sym FROM ("
            f"SELECT *, lag(mstart) OVER (PARTITION BY w ORDER BY pos) AS prevm "
            f"FROM marked{k}) z WHERE coalesce(prevm, 0) = 0)"
        )
    unions = " UNION ALL ".join(
        f"SELECT cast({k} as bigint) AS merge_rank, l AS left_sym, "
        f"r AS right_sym, cnt AS pair_count FROM best{k}"
        for k in range(1, BPE_ROUNDS + 1)
    )
    return "WITH " + ",\n".join(ctes) + f"\nSELECT * FROM ({unions}) u ORDER BY merge_rank"


def _bpe_build_views(spark: SparkSession, sf_dir: str) -> None:
    """Materialize the BPE training chain as temp views __bpe_*.

    Spark INLINES CTEs at every reference, so running the whole chain
    as one statement re-expands each round's prefix quadratically
    (measured: 26 nested-loop joins / 31 exchanges for 5 rounds).
    Execute round-by-round instead, cutting lineage with lazy
    localCheckpoints (the operators/rank.py single_scan pattern):
    every stage materializes exactly once, total work linear in K.
    The DuckDB oracles keep the single CTE chain — same semantics."""
    import re

    docs = load(spark, sf_dir, ("documents",))["documents"]
    docs.createOrReplaceTempView("__bpe_docs")
    full = _bpe_sql("__bpe_docs", "spark")
    ctes: dict[str, str] = {}
    body = full[len("WITH ") : full.rindex("\nSELECT ")]
    depth = 0
    start = 0
    for i, ch in enumerate(body):
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif ch == "," and depth == 0:
            frag = body[start:i].strip()
            name, _, sql = frag.partition(" AS (")
            ctes[name.strip()] = sql[: sql.rindex(")")]
            start = i + 1
    frag = body[start:].strip()
    name, _, sql = frag.partition(" AS (")
    ctes[name.strip()] = sql[: sql.rindex(")")]
    defined: list[str] = []
    for cte_name, cte_sql in ctes.items():
        for earlier in defined:
            cte_sql = re.sub(rf"\b{earlier}\b", f"__bpe_{earlier}", cte_sql)
        df = spark.sql(cte_sql)
        if cte_name.startswith(("syms", "best", "words")):
            df = df.localCheckpoint(eager=False)
        df.createOrReplaceTempView(f"__bpe_{cte_name}")
        defined.append(cte_name)


@register(
    "bpe_train_merges",
    oracle=_bpe_sql("documents", "duckdb"),
    doc="BPE tokenizer training (Sennrich et al. 2016, arXiv:1508.07909) "
    f"as {BPE_ROUNDS} merge rounds over the top-{BPE_TOP_WORDS} word "
    "frequency table: per round, pair counts are a keyed aggregation, "
    "the winning merge is a deterministic in-plan argmax (1-row "
    "broadcast, tie-break count DESC then lexicographic), and greedy "
    "left-to-right merge application is windows + gaps-and-islands "
    "parity (self-pair runs merge at odd island ranks). At 100 TB the "
    "word-frequency table is the bounded training substrate (vocab "
    "cardinality, not corpus size), so every round is a handful of "
    "keyed shuffles over O(vocab * avg_len) rows — the standard "
    "map-reduce BPE formulation, here as one lazy Catalyst plan.",
)
def bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    _bpe_build_views(spark, sf_dir)
    unions = " UNION ALL ".join(
        f"SELECT cast({k} as bigint) AS merge_rank, l AS left_sym, "
        f"r AS right_sym, cnt AS pair_count FROM __bpe_best{k}"
        for k in range(1, BPE_ROUNDS + 1)
    )
    return spark.sql(f"SELECT * FROM ({unions}) u ORDER BY merge_rank")


BPE_VOCAB_TOP = 30


def _bpe_vocab_sql_duckdb() -> str:
    full = _bpe_sql("documents", "duckdb")
    body = full[: full.rindex("\nSELECT ")]
    return (
        body
        + f"""
    SELECT sym, cast(sum(freq) as bigint) AS occurrences,
           cast(count(*) as bigint) AS n_positions,
           cast(length(sym) as bigint) AS sym_len
    FROM syms{BPE_ROUNDS} GROUP BY sym
    ORDER BY occurrences DESC, sym LIMIT {BPE_VOCAB_TOP}"""
    )


@register(
    "bpe_vocab_usage",
    oracle=_bpe_vocab_sql_duckdb(),
    doc=f"BPE merge APPLICATION verified end-to-end: after the "
    f"{BPE_ROUNDS} learned merges, the corpus-weighted frequency of "
    f"every surviving symbol (top {BPE_VOCAB_TOP}) — this checks the "
    "greedy left-to-right merge rewrite itself (the syms table), a "
    "stronger surface than bpe_train_merges' winning pairs alone; "
    "same round-by-round execution, same single-chain DuckDB oracle.",
)
def bpe_vocab_usage(spark: SparkSession, sf_dir: str) -> DataFrame:
    _bpe_build_views(spark, sf_dir)
    return spark.sql(
        f"""
        SELECT sym, cast(sum(freq) as bigint) AS occurrences,
               cast(count(*) as bigint) AS n_positions,
               cast(length(sym) as bigint) AS sym_len
        FROM __bpe_syms{BPE_ROUNDS} GROUP BY sym
        ORDER BY occurrences DESC, sym LIMIT {BPE_VOCAB_TOP}
        """
    )


# ---------------------------------------------------------------------------
# DSIR: data selection via importance resampling (hashed n-gram features)
# ---------------------------------------------------------------------------

DSIR_B = 512  # hashed n-gram feature buckets (paper uses 10k; bounded)
DSIR_TOP = 60  # report the N raw docs most target-like


@register(
    "dsir_importance_weights",
    headline=False,
    oracle=f"""
    WITH d AS (SELECT doc_id, source, {{toks}} AS toks
               FROM documents WHERE n_chars > 0),
    g AS (SELECT doc_id, source, unnest(list_concat(
              toks,
              list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i + 1])
          )) AS gram FROM d),
    f AS (SELECT doc_id, source, {{h}} % {DSIR_B} AS b FROM g),
    tc AS (SELECT b, count(*) AS cnt_t FROM f WHERE source = '{{ev}}' GROUP BY b),
    rc AS (SELECT b, count(*) AS cnt_r FROM f WHERE source <> '{{ev}}' GROUP BY b),
    tots AS (SELECT (SELECT count(*) FROM f WHERE source = '{{ev}}') AS tot_t,
                    (SELECT count(*) FROM f WHERE source <> '{{ev}}') AS tot_r),
    lr AS (SELECT coalesce(tc.b, rc.b) AS b,
                  cast(floor(1000000.0 * ln(
                      (cast(coalesce(cnt_t, 0) + 1 as double) * cast(tot_r + {DSIR_B} as double))
                      / (cast(coalesce(cnt_r, 0) + 1 as double) * cast(tot_t + {DSIR_B} as double))
                  )) as bigint) AS lr_ppm
           FROM tc FULL JOIN rc ON tc.b = rc.b CROSS JOIN tots)
    SELECT f.doc_id,
           cast(count(*) as bigint) AS n_features,
           cast(sum(lr.lr_ppm) as bigint) AS dsir_weight_ppm
    FROM f JOIN lr ON f.b = lr.b
    WHERE f.source <> '{{ev}}'
    GROUP BY f.doc_id
    ORDER BY dsir_weight_ppm DESC, doc_id
    LIMIT {DSIR_TOP}
    """.format(
        toks=textops.toks_expr("duckdb"),
        h=textops.tok_hash60("duckdb", "gram"),
        ev=EVAL_SOURCE,
    ),
)
def dsir_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR (Data Selection via Importance Resampling, Xie et al. 2023,
    arXiv:2302.03169): score every raw document by how much more likely
    its hashed n-gram features are under the target distribution (the
    '{EVAL_SOURCE}' benchmark-like slice, the same convention as
    decontam) than under the raw pool, estimated by two bag-of-hashed-
    ngram multinomials with +1 smoothing over {DSIR_B} buckets. The
    standard pretraining-data selection operator: resample raw docs
    with probability ∝ exp(weight) to shift the corpus toward the
    target domain.

    Features are word unigrams + bigrams hashed to 60 bits
    (textops.tok_hash60 — cross-engine-identical md5 prefix) mod
    {DSIR_B}; unigrams cannot collide with bigrams (bigrams contain a
    space, unigrams never do) so one salt serves both. Per-bucket
    log-ratios are ppm-quantized BEFORE the per-doc sum, making the
    document weight an exact INTEGER sum — no float summation-order
    hazard at all (one step stricter than bigram_perplexity, which
    quantizes after the sum).

    Plan shape at 100 TB: one explode -> two keyed aggregations whose
    output is bounded by {DSIR_B} buckets -> the log-ratio table is a
    guaranteed-broadcast dim (512 rows) joined back to the exploded
    features -> one doc-keyed agg -> TakeOrderedAndProject. The only
    full-data shuffles are the bucket aggs (map-side partial over
    {DSIR_B} keys — near-zero reduce) and the final doc_id agg; the
    scalar totals ride a 1-row broadcast crossJoin."""
    toks = textops.toks_expr("spark")
    h = textops.tok_hash60("spark", "gram")
    docs = load(spark, sf_dir, ("documents",))["documents"]
    feats = (
        docs.filter(F.col("n_chars") > 0)
        .selectExpr("doc_id", "source", f"{toks} AS toks")
        .select(
            "doc_id",
            "source",
            # sequence(1, 0) steps DOWNWARD in Spark, so a single-token
            # doc must short-circuit to an empty bigram array (DuckDB's
            # range(1, 1) is empty on its own)
            F.explode(
                F.expr(
                    "concat(toks, CASE WHEN size(toks) >= 2 THEN "
                    "transform(sequence(1, size(toks) - 1),"
                    " i -> concat(toks[i - 1], ' ', toks[i])) "
                    "ELSE array() END)"
                )
            ).alias("gram"),
        )
        .selectExpr("doc_id", "source", f"{h} % {DSIR_B} AS b")
    )
    # feeds the bucket agg + scoring; corpus-gated (~2 gram rows/token)
    feats = gated_local_checkpoint(feats, sf_dir)
    is_t = F.col("source") == EVAL_SOURCE
    # ONE keyed agg yields both per-bucket counts; the scalar totals are
    # then a rollup of the B-row result, not a third scan of the grams
    bc = feats.groupBy("b").agg(
        F.sum(is_t.cast("long")).alias("cnt_t"),
        F.sum((~is_t).cast("long")).alias("cnt_r"),
    )
    tots = bc.groupBy().agg(
        F.sum("cnt_t").alias("tot_t"), F.sum("cnt_r").alias("tot_r")
    )
    lr = (
        bc.crossJoin(F.broadcast(tots))
        .selectExpr(
            "b",
            f"""cast(floor(1000000.0 * ln(
                (cast(cnt_t + 1 as double) * cast(tot_r + {DSIR_B} as double))
                / (cast(cnt_r + 1 as double) * cast(tot_t + {DSIR_B} as double))
            )) as bigint) AS lr_ppm""",
        )
    )
    return (
        feats.filter(~is_t)
        .join(F.broadcast(lr), "b")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_features"),
            F.sum("lr_ppm").cast("long").alias("dsir_weight_ppm"),
        )
        .orderBy(F.col("dsir_weight_ppm").desc(), "doc_id")
        .limit(DSIR_TOP)
    )


# ---------------------------------------------------------------------------
# Hybrid retrieval: BM25 + dense kNN fused by reciprocal-rank fusion
# (Cormack, Clarke, Buettcher, "Reciprocal Rank Fusion outperforms
# Condorcet and individual rank learning methods", SIGIR 2009). The
# modern RAG-serving shape: a sparse lexical list and a dense vector
# list, fused on rank alone (no score calibration needed). Contribution
# = floor(1e9 / (K + rank)) — integer division in both engines, so the
# fused scores are hash-exact.
# ---------------------------------------------------------------------------

RRF_K = 60  # the SIGIR-2009 constant
RRF_TOP = 10


def _rrf_sql() -> str:
    from tracy_matdb_spark.queries.llm import _dot_expr, _norm_expr

    sim = (
        f"cast(floor(({_dot_expr('duckdb', 'embedding', 'qv')} /"
        f" ({_norm_expr('duckdb', 'embedding')} * {_norm_expr('duckdb', 'qv')}))"
        f" * cast(1000000 as double)) as bigint)"
    )
    inlist = ", ".join(repr(t) for t in BM25_QUERY)
    return f"""
    WITH d AS (SELECT doc_id, {textops.toks_expr('duckdb')} AS toks
               FROM documents WHERE n_chars > 0),
    dl AS (SELECT doc_id, cast(len(toks) as bigint) AS dl FROM d),
    n AS (SELECT cast(count(*) as bigint) AS N,
                 cast(sum(len(toks)) as bigint) AS tot FROM d),
    t AS (SELECT doc_id, unnest(toks) AS term FROM d),
    qt AS (SELECT doc_id, term, cast(count(*) as bigint) AS tf FROM t
           WHERE term IN ({inlist}) GROUP BY doc_id, term),
    tdf AS (SELECT term, cast(count(DISTINCT doc_id) as bigint) AS df
            FROM t WHERE term IN ({inlist}) GROUP BY term),
    scored AS (SELECT qt.doc_id, round(sum({_bm25_sql('duckdb')}), 6) AS bm25
               FROM qt JOIN tdf ON qt.term = tdf.term
               JOIN dl ON dl.doc_id = qt.doc_id
               CROSS JOIN n GROUP BY qt.doc_id),
    bm AS (SELECT doc_id, bm25 FROM scored ORDER BY bm25 DESC, doc_id LIMIT 15),
    bmr AS (SELECT doc_id,
                   cast(row_number() OVER (ORDER BY bm25 DESC, doc_id) as bigint)
                       AS bm25_rank FROM bm),
    q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
    sims AS (SELECT vec_id, {sim} AS sim_q
             FROM embeddings CROSS JOIN q WHERE vec_id <> 0),
    kn AS (SELECT vec_id, sim_q FROM sims ORDER BY sim_q DESC, vec_id LIMIT 10),
    knr AS (SELECT vec_id AS doc_id,
                   cast(row_number() OVER (ORDER BY sim_q DESC, vec_id) as bigint)
                       AS cos_rank FROM kn),
    fused AS (SELECT coalesce(bmr.doc_id, knr.doc_id) AS doc_id,
                     bm25_rank, cos_rank
              FROM bmr FULL OUTER JOIN knr ON bmr.doc_id = knr.doc_id)
    SELECT doc_id,
           cast(coalesce(1000000000 // ({RRF_K} + bm25_rank), 0)
              + coalesce(1000000000 // ({RRF_K} + cos_rank), 0) as bigint)
               AS rrf_score,
           bm25_rank, cos_rank
    FROM fused
    ORDER BY rrf_score DESC, doc_id LIMIT {RRF_TOP}
    """


@register("hybrid_rrf_retrieval", oracle=_rrf_sql())
def hybrid_rrf_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid sparse+dense retrieval fused by reciprocal-rank fusion:
    the BM25 top-15 (bm25_top_docs' exact plan) and the brute-force
    cosine top-10 (knn_embeddings' exact plan; vec_id IS the doc_id of
    the embedded corpus prefix — the driver tables share the key space
    at sf<=0.01 and the embedded subset below it), full-outer joined on
    doc_id with contribution floor(1e9/({RRF_K}+rank)) per list.

    Scale shape: both retrieval branches keep their own optimal plans
    (query-term-restricted agg + TakeOrdered; broadcast query vector +
    TakeOrdered); everything after the two top-k cuts touches <= 25
    rows total, so the rank windows and the full-outer fusion join are
    O(k) driver-adjacent work, not data-scale work — fusion cost is
    independent of corpus size by construction."""
    sparse = bm25_top_docs(spark, sf_dir)
    from tracy_matdb_spark.queries.llm import knn_embeddings

    dense = knn_embeddings(spark, sf_dir)
    bmr = sparse.select(
        "doc_id",
        F.row_number()
        .over(Window.orderBy(F.col("bm25").desc(), "doc_id"))
        .cast("long")
        .alias("bm25_rank"),
    )
    knr = dense.select(
        F.col("vec_id").alias("doc_id"),
        F.row_number()
        .over(Window.orderBy(F.col("sim_q").desc(), "vec_id"))
        .cast("long")
        .alias("cos_rank"),
    )
    contrib = (
        f"cast(coalesce(1000000000 div ({RRF_K} + bm25_rank), 0)"
        f" + coalesce(1000000000 div ({RRF_K} + cos_rank), 0) as bigint)"
    )
    return (
        bmr.join(knr, "doc_id", "full_outer")
        .selectExpr("doc_id", f"{contrib} AS rrf_score", "bm25_rank", "cos_rank")
        .orderBy(F.col("rrf_score").desc(), "doc_id")
        .limit(RRF_TOP)
    )


SAMPLING_TAU_MILLI = 500  # tau = 0.5, the XLM-R / mT5 multilingual standard


@register(
    "temperature_sampling_weights",
    oracle=f"""
    WITH s AS (SELECT source,
                      cast(count(*) as bigint) AS n_docs,
                      cast(sum(len({{toks}})) as bigint) AS n_tokens
               FROM documents WHERE n_chars > 0 GROUP BY source),
    sc AS (SELECT source, n_docs, n_tokens,
                  cast(floor(sqrt(cast(n_tokens as double)) * 1000.0) as bigint)
                      AS score
           FROM s)
    SELECT source, n_docs, n_tokens,
           cast(n_tokens * 1000000 // (SELECT sum(n_tokens) FROM sc) as bigint)
               AS prop_ppm,
           cast(score * 1000000 // (SELECT sum(score) FROM sc) as bigint)
               AS temp_ppm
    FROM sc ORDER BY source
    """.format(toks=textops.toks_expr("duckdb")),
)
def temperature_sampling_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled source sampling (tau = 0.5): the multilingual
    pre-training standard (XLM-R, mT5) that interpolates between
    proportional (tau=1) and uniform (tau=0) sampling — q(s) is
    proportional to p(s)^tau, i.e. sqrt(token count) at tau=0.5, which
    up-samples small sources without drowning large ones. Complements
    mixture_weights (the uniform-equalizing limit). Integer-exact
    cross-engine: score = floor(sqrt(n_tokens) * 1000) (identical IEEE
    sqrt on identical integers in both engines), then ppm shares via
    integer division over the integer score sum — the
    quantize-before-normalize discipline, no float summation anywhere.

    Scale shape: ONE keyed aggregation over the corpus (map-side
    combined) to a per-source rollup (O(sources) ~ 20 rows); the
    normalizing totals ride an unpartitioned window over that rollup,
    never the corpus."""
    from pyspark.sql import Window

    toks = textops.toks_expr("spark")
    docs = load(spark, sf_dir, ("documents",))["documents"]
    s = (
        docs.filter(F.col("n_chars") > 0)
        .selectExpr("source", f"cast(size({toks}) as bigint) AS n_toks")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_toks").alias("n_tokens"),
        )
        .withColumn(
            "score",
            F.expr("cast(floor(sqrt(cast(n_tokens as double)) * 1000.0) as bigint)"),
        )
    )
    w = Window.partitionBy()
    return (
        s.select(
            "source",
            "n_docs",
            "n_tokens",
            F.expr("n_tokens * 1000000").alias("__pnum"),
            F.expr("score * 1000000").alias("__tnum"),
            F.sum("n_tokens").over(w).alias("__ptot"),
            F.sum("score").over(w).alias("__ttot"),
        )
        .selectExpr(
            "source",
            "n_docs",
            "n_tokens",
            "cast(__pnum div __ptot as bigint) AS prop_ppm",
            "cast(__tnum div __ttot as bigint) AS temp_ppm",
        )
        .orderBy("source")
    )


# Batched hybrid retrieval: 4 queries, each a (term set, embedding) pair;
# embedding qid = vec_id 0..3 (the knn_batch_embeddings convention).
RRF_BATCH_TERMS: dict[int, tuple[str, ...]] = {
    0: ("scan", "join", "merge"),  # == BM25_QUERY, for continuity
    1: ("filter", "sort", "group"),
    2: ("stream", "window", "batch"),
    3: ("hash", "vector", "query"),
}
BM25_BATCH_TOP = 15


def _rrf_batch_sql() -> str:
    from tracy_matdb_spark.queries.llm import (
        BATCH_NQ,
        _dot_expr,
        _norm_expr,
    )

    sim = (
        f"cast(floor(({_dot_expr('duckdb', 'e.embedding', 'q.qv')} /"
        f" ({_norm_expr('duckdb', 'e.embedding')} * {_norm_expr('duckdb', 'q.qv')}))"
        f" * cast(1000000 as double)) as bigint)"
    )
    union_terms = sorted({t for ts in RRF_BATCH_TERMS.values() for t in ts})
    inlist = ", ".join(repr(t) for t in union_terms)
    values = ", ".join(
        f"({qid}, {t!r})" for qid, ts in RRF_BATCH_TERMS.items() for t in ts
    )
    return f"""
    WITH qmap AS (SELECT cast(v.q as bigint) AS qid, v.term
                  FROM (VALUES {values}) v(q, term)),
    d AS (SELECT doc_id, {textops.toks_expr('duckdb')} AS toks
          FROM documents WHERE n_chars > 0),
    dl AS (SELECT doc_id, cast(len(toks) as bigint) AS dl FROM d),
    n AS (SELECT cast(count(*) as bigint) AS N,
                 cast(sum(len(toks)) as bigint) AS tot FROM d),
    t AS (SELECT doc_id, unnest(toks) AS term FROM d),
    qt AS (SELECT doc_id, term, cast(count(*) as bigint) AS tf FROM t
           WHERE term IN ({inlist}) GROUP BY doc_id, term),
    tdf AS (SELECT term, cast(count(DISTINCT doc_id) as bigint) AS df
            FROM t WHERE term IN ({inlist}) GROUP BY term),
    scored AS (SELECT qmap.qid, qt.doc_id,
                      round(sum({_bm25_sql('duckdb')}), 6) AS bm25
               FROM qt JOIN tdf ON qt.term = tdf.term
               JOIN qmap ON qmap.term = qt.term
               JOIN dl ON dl.doc_id = qt.doc_id
               CROSS JOIN n GROUP BY qmap.qid, qt.doc_id),
    bmr AS (SELECT qid, doc_id, bm25_rank FROM
              (SELECT qid, doc_id,
                      cast(row_number() OVER (PARTITION BY qid
                           ORDER BY bm25 DESC, doc_id) as bigint) AS bm25_rank
               FROM scored)
            WHERE bm25_rank <= {BM25_BATCH_TOP}),
    q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings
          WHERE vec_id < {BATCH_NQ}),
    sims AS (SELECT q.qid, e.vec_id, {sim} AS sim_q
             FROM embeddings e CROSS JOIN q WHERE e.vec_id >= {BATCH_NQ}),
    knr AS (SELECT qid, doc_id, cos_rank FROM
              (SELECT qid, vec_id AS doc_id,
                      cast(row_number() OVER (PARTITION BY qid
                           ORDER BY sim_q DESC, vec_id) as bigint) AS cos_rank
               FROM sims)
            WHERE cos_rank <= 10),
    fused AS (SELECT coalesce(b.qid, k.qid) AS qid,
                     coalesce(b.doc_id, k.doc_id) AS doc_id,
                     bm25_rank, cos_rank
              FROM bmr b FULL OUTER JOIN knr k
                ON b.qid = k.qid AND b.doc_id = k.doc_id),
    r AS (SELECT qid, doc_id,
                 cast(coalesce(1000000000 // ({RRF_K} + bm25_rank), 0)
                    + coalesce(1000000000 // ({RRF_K} + cos_rank), 0) as bigint)
                     AS rrf_score,
                 bm25_rank, cos_rank
          FROM fused)
    SELECT qid, doc_id, rrf_score, bm25_rank, cos_rank, rrf_rank FROM
      (SELECT *, cast(row_number() OVER (PARTITION BY qid
                      ORDER BY rrf_score DESC, doc_id) as bigint) AS rrf_rank
       FROM r)
    WHERE rrf_rank <= {RRF_TOP}
    ORDER BY qid, rrf_rank
    """


@register("hybrid_rrf_batch", oracle=_rrf_batch_sql())
def hybrid_rrf_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batched hybrid retrieval: {len(RRF_BATCH_TERMS)} queries, each a
    (term set, embedding) pair, fused by reciprocal-rank fusion — the
    serving-tier shape where BOTH branches amortize one corpus pass
    across the whole query batch.

    Sparse branch: tf/df/per-term BM25 contributions are computed ONCE
    over the union of all query terms (scan-side IN filter), then a
    12-row broadcast (qid, term) map fans contributions out to queries
    — term stats are never recomputed per query. Dense branch is
    knn_batch_embeddings' plan verbatim. Per-query top-k on both
    branches and on the fused list uses the two-phase sharded rank;
    the fusion join touches <= Q * 25 rows. Integer-exact RRF."""
    from tracy_matdb_spark.operators.rank import per_group_topk
    from tracy_matdb_spark.queries.llm import knn_batch_embeddings

    toks = textops.toks_expr("spark")
    docs = load(spark, sf_dir, ("documents",))["documents"].filter(F.col("n_chars") > 0)
    d = docs.selectExpr("doc_id", f"{toks} AS toks")
    scalars = d.selectExpr("count(*) AS N", "sum(size(toks)) AS tot").first()
    n_docs, tot = int(scalars["N"]), int(scalars["tot"])
    union_terms = sorted({t for ts in RRF_BATCH_TERMS.values() for t in ts})
    inlist = ", ".join(repr(t) for t in union_terms)
    terms = d.selectExpr(
        "doc_id", "cast(size(toks) as bigint) AS dl", "explode(toks) AS term"
    ).filter(F.expr(f"term IN ({inlist})"))
    qt = terms.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).cast("long").alias("tf"), F.first("dl").alias("dl")
    )
    df_ = (
        terms.select("doc_id", "term").distinct()
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("long").alias("df"))
    )
    qmap = spark.createDataFrame(
        [(qid, t) for qid, ts in RRF_BATCH_TERMS.items() for t in ts],
        "qid long, term string",
    )
    contrib = qt.join(F.broadcast(df_), "term").withColumn(
        "c", F.expr(_bm25_sql("spark", n=str(n_docs), tot=str(tot)))
    )
    scored = (
        contrib.join(F.broadcast(qmap), "term")
        .groupBy("qid", "doc_id")
        .agg(F.round(F.sum("c"), 6).alias("bm25"))
    )
    bmr = per_group_topk(
        scored, ["qid"], [F.col("bm25").desc()], ["doc_id"],
        BM25_BATCH_TOP, shard_on="doc_id", rank_col="bm25_rank",
    ).select("qid", "doc_id", "bm25_rank")
    knr = knn_batch_embeddings(spark, sf_dir).selectExpr(
        "qid", "vec_id AS doc_id", "rnk AS cos_rank"
    )
    fused = bmr.join(knr, ["qid", "doc_id"], "full_outer")
    rrf = fused.selectExpr(
        "qid",
        "doc_id",
        f"cast(coalesce(1000000000 div ({RRF_K} + bm25_rank), 0)"
        f" + coalesce(1000000000 div ({RRF_K} + cos_rank), 0) as bigint)"
        " AS rrf_score",
        "bm25_rank",
        "cos_rank",
    )
    return per_group_topk(
        rrf, ["qid"], [F.col("rrf_score").desc()], ["doc_id"],
        RRF_TOP, shard_on="doc_id", rank_col="rrf_rank",
    ).orderBy("qid", "rrf_rank")
