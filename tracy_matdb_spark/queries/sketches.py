"""Sketches, sampling, and statistical modeling over the corpus/fact
tables: count-min heavy hitters, Markov transitions, weighted sampling,
closed-form OLS, bigram-LM perplexity.

Five more pieces of the large-scale toolkit (BASELINE.json north star),
all exactly oracle-checked — hashes are the deterministic md5-60-bit
shared with the DuckDB dialect, and every float-derived output is
fixed-point-quantized before comparison:

- ``countmin_heavy_hitters``: a count-min sketch (Cormode & Muthukrishnan
  2005) built as a (depth x width) count table — the sublinear-memory
  answer when the key universe (trillions of n-grams at 100 TB) is too
  large for an exact groupBy. The estimate (min over depth rows) is
  reported NEXT TO the exact count, so the query also measures the
  sketch's overestimation bias on real data.
- ``markov_event_transitions``: first-order transition counts +
  micro-probabilities between consecutive events per user — the
  sequence-model feed (session modeling, next-event prediction).
- ``weighted_sample_docs``: Efraimidis-Spirakis weighted sampling
  without replacement via TakeOrderedAndProject — the distributed
  weighted reservoir.
- ``ols_qty_price_by_flag``: per-group linear regression closed-form
  from raw moments, one aggregation pass.
- ``bigram_perplexity``: CCNet-style LM quality scoring — corpus bigram
  MLE + per-doc mean negative log-probability.
- ``basket_pair_pmi``: pointwise mutual information over basket
  co-occurrence — the association matrix SGNS embeddings factorize.
- ``unigram_sampling_table``: word2vec negative-sampling table
  (unigram^0.75 with inverse-CDF cumulative) via the range-sliced
  prefix-sum primitive.

No Python UDFs; everything is keyed aggregations + hash equi joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tracy_matdb_spark.catalog import load, load_events
from tracy_matdb_spark.operators import textops
from tracy_matdb_spark.queries import register

# ---------------------------------------------------------------------------
# Count-min sketch heavy hitters
# ---------------------------------------------------------------------------

CM_DEPTH = 3  # rows (independent hash functions)
CM_WIDTH = 64  # counters per row — deliberately narrow so collisions are
# observable in the fixture (vocab ~2.7k terms into 64 buckets); the
# production setting is w = ceil(e/eps) for an eps*N additive bound
CM_TOP = 15  # report the top-N exact-frequency terms


def _cm_col_expr(dialect: str, row: int) -> str:
    """Column index of `term` in sketch row `row`: independent 60-bit
    md5 hash per row, mod width — identical arithmetic both dialects."""
    h = textops.tok_hash60(dialect, "term", salt=f"cm{row}")
    return f"({h}) % {CM_WIDTH}"


@register(
    "countmin_heavy_hitters",
    oracle=f"""
    WITH t AS (SELECT unnest({{toks}}) AS term FROM documents WHERE n_chars > 0),
    exact AS (SELECT term, count(*) AS n_exact FROM t GROUP BY term),
    sketch AS (
        SELECT r, c, sum(n_exact) AS cnt FROM exact
        CROSS JOIN (SELECT unnest(generate_series(0, {CM_DEPTH - 1})) AS r) g
        CROSS JOIN LATERAL (SELECT CASE
            {{cases}}
        END AS c) x
        GROUP BY r, c),
    top AS (SELECT term, n_exact,
                   row_number() OVER (ORDER BY n_exact DESC, term) AS rnk
            FROM exact QUALIFY rnk <= {CM_TOP}),
    est AS (
        SELECT top.term, top.n_exact, top.rnk, min(sketch.cnt) AS n_est
        FROM top
        CROSS JOIN (SELECT unnest(generate_series(0, {CM_DEPTH - 1})) AS r) g
        CROSS JOIN LATERAL (SELECT CASE
            {{cases}}
        END AS c) x
        JOIN sketch ON sketch.r = g.r AND sketch.c = x.c
        GROUP BY top.term, top.n_exact, top.rnk)
    SELECT cast(rnk as int) AS rnk, term,
           cast(n_exact as bigint) AS n_exact,
           cast(n_est as bigint) AS n_est,
           cast(n_est - n_exact as bigint) AS overcount
    FROM est ORDER BY rnk
    """.format(
        toks=textops.toks_expr("duckdb"),
        cases=" ".join(
            f"WHEN r = {r} THEN {_cm_col_expr('duckdb', r)}" for r in range(CM_DEPTH)
        ),
    ),
)
def countmin_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch over the corpus vocabulary: build the
    {CM_DEPTH}x{CM_WIDTH} counter table, then report the top-{CM_TOP}
    exact-frequency terms with their sketch estimate (min over rows) and
    the overcount the narrow width induces.

    Scale story: the sketch build is token explode -> groupBy(row, col)
    — the shuffle carries at most DEPTH x WIDTH = {CM_DEPTH}x{CM_WIDTH}
    distinct keys with map-side partial sums, so memory is O(d*w)
    regardless of vocabulary size. Point estimates then need only the
    tiny sketch table (broadcast). The exact side here exists to
    MEASURE the sketch against truth; at 100 TB you'd keep only the
    sketch and a candidate heavy-hitter stream."""
    docs = load(spark, sf_dir, ("documents",))["documents"]
    toks = textops.toks_expr("spark")
    t = (
        docs.filter(F.col("n_chars") > 0)
        .selectExpr(f"explode({toks}) AS term")
    )
    exact = t.groupBy("term").agg(F.count(F.lit(1)).alias("n_exact"))
    # one (row, col, weight) triple per term occurrence per sketch row;
    # counts ride from the exact aggregate so the explode is x|vocab|,
    # not x|tokens|
    rows = exact.select(
        "term",
        "n_exact",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("r"),
                        F.expr(_cm_col_expr("spark", r)).alias("c"),
                    )
                    for r in range(CM_DEPTH)
                ]
            )
        ).alias("rc"),
    ).select("term", "n_exact", "rc.r", "rc.c")
    sketch = rows.groupBy("r", "c").agg(F.sum("n_exact").alias("cnt"))
    # top-N FIRST via orderBy+limit (TakeOrderedAndProject: per-partition
    # heaps + driver merge, no global sort); the rank window then runs
    # over the <= CM_TOP surviving rows — bounded by construction, which
    # is why this query sits in the window auditor's allowlist
    top = (
        exact.orderBy(F.col("n_exact").desc(), "term")
        .limit(CM_TOP)
        .withColumn(
            "rnk",
            F.row_number().over(Window.orderBy(F.col("n_exact").desc(), "term")),
        )
    )
    top_cells = top.select(
        "term",
        "n_exact",
        "rnk",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("r"),
                        F.expr(_cm_col_expr("spark", r)).alias("c"),
                    )
                    for r in range(CM_DEPTH)
                ]
            )
        ).alias("rc"),
    ).select("term", "n_exact", "rnk", "rc.r", "rc.c")
    return (
        top_cells.join(F.broadcast(sketch), ["r", "c"])
        .groupBy("term", "n_exact", "rnk")
        .agg(F.min("cnt").alias("n_est"))
        .selectExpr(
            "cast(rnk as int) AS rnk",
            "term",
            "cast(n_exact as bigint) AS n_exact",
            "cast(n_est as bigint) AS n_est",
            "cast(n_est - n_exact as bigint) AS overcount",
        )
        .orderBy("rnk")
    )


# ---------------------------------------------------------------------------
# Markov event transitions
# ---------------------------------------------------------------------------


@register(
    "markov_event_transitions",
    oracle="""
    WITH seq AS (SELECT user_id, event_type,
                        lead(event_type) OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS next_type
                 FROM events),
    cnt AS (SELECT event_type AS from_type, next_type AS to_type,
                   count(*) AS n
            FROM seq WHERE next_type IS NOT NULL
            GROUP BY event_type, next_type),
    tot AS (SELECT from_type, sum(n) AS n_from FROM cnt GROUP BY from_type)
    SELECT cnt.from_type, cnt.to_type, cast(cnt.n as bigint) AS n,
           cast(floor(cnt.n * 1000000.0 / tot.n_from) as bigint) AS microprob
    FROM cnt JOIN tot USING (from_type)
    ORDER BY from_type, to_type
    """,
)
def markov_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences: counts and floor-micro-probabilities of event_type ->
    next event_type (deterministic (ts, event_id) ordering).

    Scale shape: ONE shuffle keyed on user_id for the lead() window
    (per-user partitions — never a global window), then a keyed
    aggregation over at most |event_type|^2 cells with map-side combine.
    Probabilities are fixed-point (floor of 1e6 * n / n_from) so both
    engines agree exactly."""
    ev = load_events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    cnt = (
        ev.withColumn("next_type", F.lead("event_type").over(w))
        .filter(F.col("next_type").isNotNull())
        .groupBy(F.col("event_type").alias("from_type"), F.col("next_type").alias("to_type"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tot = cnt.groupBy("from_type").agg(F.sum("n").alias("n_from"))
    return (
        cnt.join(tot, "from_type")
        .selectExpr(
            "from_type",
            "to_type",
            "cast(n as bigint) AS n",
            "cast(floor(n * 1000000.0 / n_from) as bigint) AS microprob",
        )
        .orderBy("from_type", "to_type")
    )


# ---------------------------------------------------------------------------
# Deterministic weighted sampling (Efraimidis-Spirakis)
# ---------------------------------------------------------------------------

WS_N = 25


def _ws_key_expr(dialect: str) -> str:
    """Efraimidis-Spirakis sort key ln(u)/w: u uniform-(0,1) derived
    deterministically from the doc_id's 60-bit md5 hash, w = n_chars.
    Taking the WS_N LARGEST keys draws a weighted sample without
    replacement — the distributed weighted reservoir."""
    styp = "string" if dialect == "spark" else "varchar"
    h = textops.tok_hash60(dialect, f"cast(doc_id as {styp})", salt="ws")
    u = f"((cast({h} as double) + 0.5) / 1152921504606846976.0)"  # 2^60
    return f"(ln({u}) / cast(n_chars as double))"


@register(
    "weighted_sample_docs",
    oracle=f"""
    SELECT doc_id, source, cast(n_chars as bigint) AS n_chars
    FROM documents WHERE n_chars > 0
    ORDER BY {_ws_key_expr('duckdb')} DESC, doc_id
    LIMIT {WS_N}
    """,
)
def weighted_sample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sample of {WS_N} documents, probability proportional to
    length, WITHOUT replacement — Efraimidis-Spirakis 2006: draw
    u~U(0,1) per item (here deterministically from md5(doc_id), so the
    'sample' is reproducible and oracle-checkable), keep the top-N by
    u^(1/w), compared in log space.

    Scale shape: the top-N-by-key compiles to TakeOrderedAndProject —
    per-partition heaps of N rows + a driver merge of the per-partition
    tops, NO global sort and no single-partition window, which is how a
    weighted reservoir distributes. The key is map-side arithmetic on a
    pruned 3-column scan."""
    docs = load(spark, sf_dir, ("documents",))["documents"]
    return (
        docs.filter(F.col("n_chars") > 0)
        .select("doc_id", "source", F.col("n_chars").cast("long").alias("n_chars"))
        .orderBy(F.expr(_ws_key_expr("spark")).desc(), "doc_id")
        .limit(WS_N)
    )


# ---------------------------------------------------------------------------
# Per-group closed-form OLS (distributed linear regression)
# ---------------------------------------------------------------------------


@register(
    "ols_qty_price_by_flag",
    # slope/intercept from raw moments with IDENTICAL formulas in both
    # engines (same rationale as qty_price_moment_stats: never the
    # engines' built-in regr_* whose accumulation differs); ppm floor
    # absorbs the float tail of the big double sums.
    oracle="""
    WITH m AS (
        SELECT l_returnflag,
               cast(count(*) as double) AS n,
               sum(l_quantity) AS sx, sum(l_extendedprice) AS sy,
               sum(l_quantity * l_quantity) AS sxx,
               sum(l_quantity * l_extendedprice) AS sxy
        FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, cast(n as bigint) AS n_rows,
           cast(floor(1000000.0 * (n * sxy - sx * sy) / (n * sxx - sx * sx))
                as bigint) AS slope_ppm,
           cast(floor((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n)
                as bigint) AS intercept_floor
    FROM m ORDER BY l_returnflag
    """,
)
def ols_qty_price_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group simple linear regression price ~ quantity by
    l_returnflag, closed-form from raw moments: slope = (n*sxy - sx*sy)
    / (n*sxx - sx^2), intercept = mean residual. ONE map-side-partial
    aggregation pass per group — the distributed form of a per-segment
    sklearn LinearRegression fit, with no second data pass and no
    driver math. Fixed-point floors make the cross-engine comparison
    exact despite float-sum accumulation-order tails."""
    li = load(spark, sf_dir, ("lineitem",))["lineitem"]
    m = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("l_quantity").alias("sx"),
        F.sum("l_extendedprice").alias("sy"),
        F.sum(F.col("l_quantity") * F.col("l_quantity")).alias("sxx"),
        F.sum(F.col("l_quantity") * F.col("l_extendedprice")).alias("sxy"),
    )
    return (
        m.selectExpr(
            "l_returnflag",
            "cast(n as bigint) AS n_rows",
            "cast(floor(1000000.0 * (n * sxy - sx * sy) / (n * sxx - sx * sx)) as bigint) AS slope_ppm",
            "cast(floor((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n) as bigint) AS intercept_floor",
        )
        .orderBy("l_returnflag")
    )


# ---------------------------------------------------------------------------
# Bigram LM perplexity scoring (CCNet-style quality signal)
# ---------------------------------------------------------------------------

PPLX_TOP = 30  # report the N highest-perplexity (lowest-quality) docs


@register(
    "bigram_perplexity",
    oracle=f"""
    WITH d AS (SELECT doc_id, {{toks}} AS toks FROM documents WHERE n_chars > 0),
    bg AS (SELECT doc_id, toks[i] AS w1, toks[i + 1] AS w2
           FROM d CROSS JOIN (SELECT unnest(generate_series(1,
               (SELECT max(len(toks)) FROM d))) AS i) g
           WHERE i + 1 <= len(toks)),
    bgc AS (SELECT w1, w2, count(*) AS n12 FROM bg GROUP BY w1, w2),
    uc AS (SELECT w1, sum(n12) AS n1 FROM bgc GROUP BY w1),
    lp AS (SELECT bgc.w1, bgc.w2,
                  ln(cast(bgc.n12 as double) / cast(uc.n1 as double)) AS logp
           FROM bgc JOIN uc USING (w1)),
    score AS (SELECT bg.doc_id,
                     cast(count(*) as bigint) AS n_bigrams,
                     sum(lp.logp) AS sum_logp
              FROM bg JOIN lp ON bg.w1 = lp.w1 AND bg.w2 = lp.w2
              GROUP BY bg.doc_id)
    SELECT doc_id, n_bigrams,
           cast(floor(-1000000.0 * sum_logp / n_bigrams) as bigint)
               AS neg_logp_ppm
    FROM score
    ORDER BY neg_logp_ppm DESC, doc_id
    LIMIT {PPLX_TOP}
    """.format(toks=textops.toks_expr("duckdb")),
)
def bigram_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style LM quality signal: train a bigram MLE model on the
    corpus itself, score every document by mean negative log-probability
    (log-perplexity), report the {PPLX_TOP} worst. Docs full of rare
    transitions float to the top — the distributed form of the
    'perplexity bucket' filter used by CCNet/FineWeb (there the LM is
    pretrained KenLM; the estimation + scoring dataflow is identical).

    Plan shape: bigram counts are two chained keyed aggregations (map
    -side partial); the model join back to doc bigrams is a hash equi
    join keyed on (w1, w2) — model size is O(distinct bigrams), never
    broadcast blindly. Mean log-prob is an associative SUM; the ppm
    floor absorbs float-accumulation tails. Top-N compiles to
    TakeOrderedAndProject.

    Exact cross-engine trap this dodges: summing ln() doubles in
    different orders diverges in the last bits, so the score is
    quantized to ppm BEFORE the top-N cut; a tie at the boundary is
    broken by doc_id in both engines."""
    docs = load(spark, sf_dir, ("documents",))["documents"]
    toks = textops.toks_expr("spark")
    bg = (
        docs.filter(F.col("n_chars") > 0)
        .selectExpr("doc_id", f"{toks} AS toks")
        .select(
            "doc_id",
            F.explode(F.expr("sequence(1, size(toks) - 1)")).alias("i"),
            "toks",
        )
        .selectExpr("doc_id", "toks[i - 1] AS w1", "toks[i] AS w2")
    )
    bgc = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("n12"))
    uc = bgc.groupBy("w1").agg(F.sum("n12").alias("n1"))
    lp = bgc.join(uc, "w1").selectExpr(
        "w1", "w2", "ln(cast(n12 as double) / cast(n1 as double)) AS logp"
    )
    score = (
        bg.join(lp, ["w1", "w2"])
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bigrams"),
            F.sum("logp").alias("sum_logp"),
        )
    )
    return (
        score.selectExpr(
            "doc_id",
            "n_bigrams",
            "cast(floor(-1000000.0 * sum_logp / n_bigrams) as bigint) AS neg_logp_ppm",
        )
        .orderBy(F.col("neg_logp_ppm").desc(), "doc_id")
        .limit(PPLX_TOP)
    )


# ---------------------------------------------------------------------------
# PMI association scores (embedding-pretraining signal)
# ---------------------------------------------------------------------------

PMI_MIN_CO = 3
PMI_TOP = 40


@register(
    "basket_pair_pmi",
    oracle=f"""
    WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    nb AS (SELECT count(DISTINCT l_orderkey) AS n FROM items),
    marg AS (SELECT l_partkey, count(*) AS n_a FROM items GROUP BY l_partkey),
    pairs AS (
        SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
               count(*) AS n_ab
        FROM items a JOIN items b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY part_a, part_b
        HAVING count(*) >= {PMI_MIN_CO})
    SELECT part_a, part_b, cast(n_ab as bigint) AS n_ab,
           cast(floor(1000000.0 * ln((cast(n_ab as double) * nb.n)
                / (cast(ma.n_a as double) * mb.n_a))) as bigint) AS pmi_ppm
    FROM pairs
    JOIN marg ma ON ma.l_partkey = part_a
    JOIN marg mb ON mb.l_partkey = part_b
    CROSS JOIN nb
    ORDER BY pmi_ppm DESC, part_a, part_b
    LIMIT {PMI_TOP}
    """,
)
def basket_pair_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pointwise mutual information over basket co-occurrence: for part
    pairs sharing >= {PMI_MIN_CO} orders, pmi = ln(p(a,b) / (p(a)p(b)))
    — the association signal word2vec-family embedding pretraining
    factorizes (Levy & Goldberg 2014: SGNS ~ shifted-PMI matrix).

    Same bounded self-join as basket_part_pairs (dedup before join,
    per-basket fan-out C(items,2)); the marginals join is keyed on
    part (AQE broadcasts the small side); N rides along as a broadcast
    scalar aggregate. The ln() input is a ratio of exact integers cast
    to double IDENTICALLY in both engines, so the ppm floor is exact —
    no accumulation-order tail anywhere. Top-{PMI_TOP} via
    TakeOrderedAndProject."""
    li = load(spark, sf_dir, ("lineitem",))["lineitem"]
    items = li.select("l_orderkey", "l_partkey").distinct()
    nb = items.select(F.countDistinct("l_orderkey").alias("n"))
    marg = items.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("n_a"))
    b = items.select(
        F.col("l_orderkey").alias("ok_b"), F.col("l_partkey").alias("part_b")
    )
    pairs = (
        items.join(
            b,
            (F.col("l_orderkey") == F.col("ok_b"))
            & (F.col("l_partkey") < F.col("part_b")),
        )
        .select(F.col("l_partkey").alias("part_a"), "part_b")
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .filter(F.col("n_ab") >= PMI_MIN_CO)
    )
    return (
        pairs.join(marg.selectExpr("l_partkey AS part_a", "n_a AS na_a"), "part_a")
        .join(marg.selectExpr("l_partkey AS part_b", "n_a AS na_b"), "part_b")
        .crossJoin(F.broadcast(nb))
        .selectExpr(
            "part_a",
            "part_b",
            "cast(n_ab as bigint) AS n_ab",
            "cast(floor(1000000.0 * ln((cast(n_ab as double) * n) "
            "/ (cast(na_a as double) * na_b))) as bigint) AS pmi_ppm",
        )
        .orderBy(F.col("pmi_ppm").desc(), "part_a", "part_b")
        .limit(PMI_TOP)
    )


# ---------------------------------------------------------------------------
# Unigram^0.75 negative-sampling table (word2vec prep)
# ---------------------------------------------------------------------------


@register(
    "unigram_sampling_table",
    oracle=f"""
    WITH t AS (SELECT unnest({{toks}}) AS term FROM documents WHERE n_chars > 0),
    c AS (SELECT term, count(*) AS n FROM t GROUP BY term),
    w AS (SELECT term, n,
                 cast(floor(1000000.0 * pow(cast(n as double), 0.75)) as bigint) AS wq
          FROM c),
    z AS (SELECT sum(wq) AS wz FROM w)
    SELECT term, cast(n as bigint) AS n,
           cast((1000000 * wq) // wz as bigint) AS prob_ppm,
           cast((1000000 * sum(wq) OVER (ORDER BY term
                 ROWS UNBOUNDED PRECEDING)) // wz as bigint) AS cum_ppm
    FROM w CROSS JOIN z
    ORDER BY term
    """.format(toks=textops.toks_expr("duckdb")),
)
def unigram_sampling_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """word2vec negative-sampling table: unigram counts raised to the
    3/4 power (Mikolov et al. 2013), normalized, with an inclusive
    cumulative distribution for inverse-CDF sampling.

    Exactness: pow() is quantized PER TERM to integer micro-units
    FIRST; the normalizer and the cumulative are then integer sums —
    order-independent, so both engines agree exactly (summing raw pow()
    doubles would diverge in the last bits across accumulation orders).

    Scale: the cumulative is grouped_prefix_sum (operators/rank.py) —
    the two-phase range-sliced prefix sum, NOT a single-partition
    window: per-slice parallel running sums + broadcast exclusive
    offsets, so a 10M-term vocabulary still computes on all cores."""
    from tracy_matdb_spark.operators.rank import grouped_prefix_sum

    docs = load(spark, sf_dir, ("documents",))["documents"]
    toks = textops.toks_expr("spark")
    c = (
        docs.filter(F.col("n_chars") > 0)
        .selectExpr(f"explode({toks}) AS term")
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = c.selectExpr(
        "term",
        "n",
        "cast(floor(1000000.0 * pow(cast(n as double), 0.75)) as bigint) AS wq",
    ).withColumn("__g", F.lit(1))
    # single_scan: w sits downstream of the term-count shuffle, so its
    # row order is nondeterministic across evaluations — without the
    # one-copy checkpoint the offsets branch and the window branch can
    # range-slice DIFFERENT samples and mis-assign offsets (the bug
    # class reproduced by ks_source_drift on an 8-thread session;
    # deterministic-scan inputs like pack_sequences don't need it)
    cum = grouped_prefix_sum(
        w, ["__g"], ["term"], "wq", out_col="cum_wq", single_scan=True
    )
    z = w.select(F.sum("wq").alias("wz"))
    return (
        cum.crossJoin(F.broadcast(z))
        .selectExpr(
            "term",
            "cast(n as bigint) AS n",
            "cast((1000000 * wq) div wz as bigint) AS prob_ppm",
            "cast((1000000 * cum_wq) div wz as bigint) AS cum_ppm",
        )
        .orderBy("term")
    )


# ---------------------------------------------------------------------------
# Poisson bootstrap confidence interval (the distributed bootstrap)
# ---------------------------------------------------------------------------

BOOT_B = 32  # bootstrap replicas

# Inverse-CDF thresholds for Poisson(1): P(X <= k), k = 0..5. A row's
# replica weight is the smallest k whose cumulative probability exceeds
# the row's deterministic uniform — identical double literals in both
# engines, so weights are bit-identical.
_POIS1_CDF = (
    "0.36787944117144233", "0.7357588823428847", "0.9196986029286058",
    "0.9810118431238462", "0.9963401531726563", "0.9994058151824183",
)


def _pois1_expr(u: str) -> str:
    arms = " ".join(
        f"WHEN {u} < {p} THEN {k}" for k, p in enumerate(_POIS1_CDF)
    )
    return f"(CASE {arms} ELSE 6 END)"


def _boot_u(dialect: str) -> str:
    """Deterministic uniform per (orderkey, replica) — counter-based,
    so any executor recomputes the same weight for the same row."""
    cast = "varchar" if dialect == "duckdb" else "string"
    h = (
        f"('0x' || substr(md5(concat_ws('|', 'boot', cast(o_orderkey as {cast}), "
        f"cast(b as {cast}))), 1, 15))::bigint"
        if dialect == "duckdb"
        else f"cast(conv(substr(md5(concat_ws('|', 'boot', cast(o_orderkey as {cast}), "
        f"cast(b as {cast}))), 1, 15), 16, 10) as bigint)"
    )
    return f"(cast({h} as double) / cast(1152921504606846976 as double))"


@register(
    "bootstrap_ci_revenue",
    oracle=f"""
    WITH reps AS (SELECT unnest(generate_series(0, {BOOT_B - 1})) AS b),
    w AS (SELECT o_orderkey, o_totalprice, b,
                 {_pois1_expr(_boot_u("duckdb"))} AS wt
          FROM orders CROSS JOIN reps),
    means AS (SELECT b,
                     sum(wt * o_totalprice) / sum(wt) AS m
              FROM w GROUP BY b HAVING sum(wt) > 0),
    sorted AS (SELECT list_sort(list(m)) AS ms FROM means)
    SELECT round((SELECT avg(o_totalprice) FROM orders), 6) AS point_mean,
           round(ms[2], 6)  AS ci_lo,
           round(ms[{BOOT_B - 1}], 6) AS ci_hi
    FROM sorted
    """,
)
def bootstrap_ci_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson bootstrap (the distributed bootstrap: each row enters
    replica b with weight ~ Poisson(1), drawn from a counter-based
    uniform keyed on (row, replica) — no resampling pass, no shared
    state, embarrassingly parallel) for a 95%-ish CI on mean order
    price: {BOOT_B} replica means, CI = 2nd and {BOOT_B - 1}th order
    statistics. This is how a 100 TB pipeline attaches uncertainty to
    a metric in ONE scan: the replica axis explodes x{BOOT_B} map-side
    and reduces by replica with map-side combine; the final CI sorts
    {BOOT_B} numbers inside one aggregate row (array_sort over a
    collected list — a bounded O(B) object, never a data-scale sort).

    Classical n-out-of-n bootstrap needs the whole sample per replica;
    Poisson(1) weights give the same first-order distribution and
    decompose over partitions — the standard trade (Chamandy et al.,
    'Estimating Uncertainty for Massive Data Streams')."""
    o = load(spark, sf_dir, ("orders",))["orders"]
    reps = F.explode(F.expr(f"sequence(0, {BOOT_B - 1})")).alias("b")
    w = o.select("o_orderkey", "o_totalprice", reps).selectExpr(
        "o_totalprice", "b", f"{_pois1_expr(_boot_u('spark'))} AS wt"
    )
    means = (
        w.groupBy("b")
        .agg(F.expr("sum(wt * o_totalprice) / sum(wt)").alias("m"))
        .filter(F.expr("m IS NOT NULL"))
    )
    point = o.agg(F.round(F.avg("o_totalprice"), 6).alias("point_mean"))
    ci = means.agg(F.expr("array_sort(collect_list(m))").alias("ms")).selectExpr(
        f"round(ms[1], 6) AS ci_lo", f"round(ms[{BOOT_B - 2}], 6) AS ci_hi"
    )
    return point.withColumn("__k", F.lit(1)).join(
        F.broadcast(ci.withColumn("__k", F.lit(1))), "__k"
    ).select("point_mean", "ci_lo", "ci_hi")
