"""Corpus drift & monitoring queries: KS / PSI distribution drift,
chi-square term-source association, and cross-snapshot n-gram novelty.

Training-data-pipeline operators beyond the reference's surface
(BASELINE.json north star): a production corpus is re-crawled and
re-mixed continuously, and the curation pipeline needs distribution
monitors that answer "did source X drift away from the rest of the
mix?" (KS / PSI — the two standard drift statistics), "which terms are
most source-distinctive?" (chi-square feature selection, the classic
pre-classifier screen), and "how much genuinely NEW content does each
crawl snapshot add?" (n-gram novelty curve — the CommonCrawl-style
freshness measurement). All JVM-side built-ins, all oracle-checked.

Determinism across engines: every statistic is either exact integer
arithmetic or a SINGLE-expression IEEE-754 double computation on
exactly-representable integers (one division / subtraction / floor
chain, no accumulation-order dependence). PSI's multi-term sum is made
order-free by quantizing EACH term to micro units first (one double
expression + floor per term, bit-identical across engines) and summing
the resulting integers — exact arithmetic on both sides, immune to an
engine switching its float fold to pairwise/SIMD summation (round-12
ADVICE; the previous ordered-list-fold approach assumed DuckDB's
list_sum stays a sequential in-order fold forever).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tracy_matdb_spark.catalog import load
from tracy_matdb_spark.operators import textops
from tracy_matdb_spark.operators.rank import grouped_prefix_sum, grouped_value_rank
from tracy_matdb_spark.queries import register


def _nonfoldable_one(col: str):
    """A constant-1 join key Catalyst cannot constant-fold: ``col*0+1``
    on a non-nullable source column. Two plain ``lit(1)`` keys get
    folded into a ``true`` join condition and the equi join DEGENERATES
    to a nested-loop cross product — this helper is what keeps the
    dense-grid builds below on a BroadcastHashJoin. The plan-audit
    tests pin the resulting shape; if a future Spark optimizer rule
    learns to simplify x*0+1, those tests fail and this ONE site is
    where the trick gets re-engineered (round-12 ADVICE: keep the
    invariant and its rationale in one place)."""
    return F.expr(f"cast({col} * 0 + 1 as int)")


# ---------------------------------------------------------------------------
# Two-sample Kolmogorov-Smirnov drift: each source vs the rest of the mix
# ---------------------------------------------------------------------------


@register(
    "ks_source_drift",
    oracle="""
    WITH d AS (SELECT source, cast(n_chars as bigint) AS v
               FROM documents WHERE n_chars > 0),
    c AS (SELECT source, v, cast(count(*) as bigint) AS n_sv
          FROM d GROUP BY source, v),
    s AS (SELECT source, cast(count(*) as bigint) AS n_s FROM d GROUP BY source),
    n AS (SELECT cast(count(*) as bigint) AS n_all FROM d),
    vs AS (SELECT DISTINCT v FROM d),
    grid AS (SELECT s.source, s.n_s, n.n_all, vs.v
             FROM s CROSS JOIN n CROSS JOIN vs),
    f AS (SELECT g.source, g.n_s, g.n_all, g.v,
                 coalesce(c.n_sv, 0) AS n_sv
          FROM grid g LEFT JOIN c ON c.source = g.source AND c.v = g.v),
    cum AS (SELECT source, n_s, n_all, v,
                   sum(n_sv) OVER (PARTITION BY source ORDER BY v
                       ROWS UNBOUNDED PRECEDING) AS cum_s
            FROM f),
    tot AS (SELECT v, sum(cum_s) AS cum_all FROM cum GROUP BY v),
    diff AS (SELECT cum.source, cum.n_s,
                    cast(floor(1000000.0 * abs(
                        cast(cum.cum_s as double) / cast(cum.n_s as double)
                        - cast(tot.cum_all - cum.cum_s as double)
                          / cast(cum.n_all - cum.n_s as double))) as bigint)
                        AS dppm
             FROM cum JOIN tot ON cum.v = tot.v
             WHERE cum.n_s < cum.n_all)
    SELECT source, n_s, cast(max(dppm) as bigint) AS ks_ppm
    FROM diff GROUP BY source, n_s ORDER BY source
    """,
)
def ks_source_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact two-sample Kolmogorov-Smirnov statistic of the document-
    length distribution, each source vs ALL OTHER sources pooled:
    ks_ppm = floor(1e6 * sup_v |F_src(v) - F_rest(v)|) — the standard
    nonparametric drift alarm for "this feed changed shape" (length
    here; any bounded-domain integer metric slots in).

    Both ECDFs jump only at observed values, so the sup is the max over
    the DENSE (source x distinct-value) grid of the inclusive-CDF gap.
    The grid is built with a constant-key broadcast HASH join (the
    per-source totals frame is catalog-bounded — |sources| rows, never
    the corpus), NOT a nested-loop cross join; per-source cumulative
    counts use the two-phase range-sliced prefix sum (a naive
    per-source window would funnel |values| rows into one task), and
    the global CDF is the same primitive over the per-value counts
    (constant group — far cheaper than re-deriving it from the grid).
    Each gap is ONE division/subtraction chain on exactly-representable
    ints, so the double is bit-identical across engines. Scale: grid =
    |distinct values| x |sources| — for unbounded/continuous metrics,
    quantize to a fixed-width grid first (psi_source_drift is the
    binned sibling)."""
    docs = load(spark, sf_dir, ("documents",))["documents"]
    d = docs.filter(F.col("n_chars") > 0).selectExpr(
        "source", "cast(n_chars as bigint) AS v"
    )
    c = d.groupBy("source", "v").agg(F.count(F.lit(1)).cast("long").alias("n_sv"))
    srcs = d.groupBy("source").agg(F.count(F.lit(1)).cast("long").alias("n_s"))
    n_all = d.agg(F.count(F.lit(1)).cast("long").alias("n_all"))
    vs = d.select("v").distinct()
    # constant-key equi join => BroadcastHashJoin on the tiny per-source
    # frame (the dense grid without a CartesianProduct/BNL in the plan);
    # see _nonfoldable_one for why the key is not a plain lit(1)
    grid = (
        vs.withColumn("__k", _nonfoldable_one("v"))
        .join(
            F.broadcast(
                srcs.crossJoin(F.broadcast(n_all)).withColumn(
                    "__k", _nonfoldable_one("n_s")
                )
            ),
            "__k",
        )
        .drop("__k")
    )
    filled = grid.join(c, ["source", "v"], "left").na.fill(0, ["n_sv"])
    # single_scan is REQUIRED here, not a perf knob: the grid sits
    # downstream of shuffles, so its row order is nondeterministic
    # across evaluations — without the one-copy checkpoint the offsets
    # branch and the window branch can range-slice DIFFERENT samples
    # and mis-assign offsets (reproduced: wrong cum_s on an 8-thread
    # session at sf0.001)
    cum = grouped_prefix_sum(
        filled, ["source"], ["v"], "n_sv", out_col="cum_s", single_scan=True
    )
    # global CDF from the per-value counts directly (constant group) —
    # NOT groupBy(v).sum(cum_s) over the grid, which would recompute the
    # whole grid+prefix pipeline a second time for the join's other side
    cnt_v = d.groupBy("v").agg(F.count(F.lit(1)).cast("long").alias("n_v"))
    tot = grouped_prefix_sum(
        cnt_v, [], ["v"], "n_v", out_col="cum_all", single_scan=True
    ).drop("n_v")
    # n_s < n_all guard: a single-source corpus has an empty "rest"
    # sample and no KS statistic — without it the gap divides by zero
    # (double inf), which DuckDB and Spark cast differently
    diff = (
        cum.filter(F.col("n_s") < F.col("n_all"))
        .join(tot, "v")
        .selectExpr(
            "source",
            "n_s",
            "cast(floor(1000000.0 * abs("
            "cast(cum_s as double) / cast(n_s as double)"
            " - cast(cum_all - cum_s as double) / cast(n_all - n_s as double)"
            ")) as bigint) AS dppm",
        )
    )
    return (
        diff.groupBy("source", "n_s")
        .agg(F.max("dppm").cast("long").alias("ks_ppm"))
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Population Stability Index per source (binned drift, the KS sibling)
# ---------------------------------------------------------------------------

PSI_BINS = 10  # equal-width bins over the observed value range


@register(
    "psi_source_drift",
    oracle=f"""
    WITH d AS (SELECT source, cast(n_chars as bigint) AS v
               FROM documents WHERE n_chars > 0),
    mm AS (SELECT min(v) AS lo, max(v) AS hi,
                  cast(count(*) as bigint) AS n_all FROM d),
    b AS (SELECT d.source,
                 least({PSI_BINS - 1}, (d.v - mm.lo) * {PSI_BINS}
                       // (mm.hi - mm.lo + 1)) AS bin
          FROM d CROSS JOIN mm),
    cnt AS (SELECT source, bin, cast(count(*) as bigint) AS n_sb
            FROM b GROUP BY source, bin),
    s AS (SELECT source, cast(count(*) as bigint) AS n_s FROM d GROUP BY source),
    dense AS (SELECT s.source, s.n_s, g.bin
              FROM s CROSS JOIN (SELECT unnest(generate_series(0,
                   {PSI_BINS - 1})) AS bin) g),
    f AS (SELECT dense.source, dense.n_s, dense.bin,
                 coalesce(cnt.n_sb, 0) AS n_sb
          FROM dense LEFT JOIN cnt
            ON cnt.source = dense.source AND cnt.bin = dense.bin),
    gb AS (SELECT bin, sum(n_sb) AS n_b FROM f GROUP BY bin),
    term AS (SELECT f.source, f.n_s, f.bin,
                    cast(floor(1000000.0 *
                    ((cast(f.n_sb + 1 as double) / cast(f.n_s + {PSI_BINS} as double)
                      - cast(gb.n_b - f.n_sb + 1 as double)
                        / cast(mm.n_all - f.n_s + {PSI_BINS} as double))
                     * ln((cast(f.n_sb + 1 as double) / cast(f.n_s + {PSI_BINS} as double))
                          / (cast(gb.n_b - f.n_sb + 1 as double)
                             / cast(mm.n_all - f.n_s + {PSI_BINS} as double)))))
                        as bigint) AS t_micro
             FROM f JOIN gb ON f.bin = gb.bin CROSS JOIN mm)
    SELECT source, n_s, cast(sum(t_micro) as bigint) AS psi_micro
    FROM term GROUP BY source, n_s ORDER BY source
    """,
)
def psi_source_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index of document length, each source vs the
    pooled rest, over {PSI_BINS} equal-width bins with Laplace add-one
    smoothing: PSI = sum_b (p_b - q_b) * ln(p_b / q_b), reported as the
    sum of per-bin floor-micro terms (each term quantized to micro
    units BEFORE the sum — at most {PSI_BINS} micro below the unrounded
    PSI, irrelevant at the 0.25 alarm threshold). PSI is the binned,
    bounded-work sibling of ks_source_drift — the right form when the
    metric is continuous or heavy-tailed (bin first, compare shares),
    and the industry-standard "population shifted" scorecard alarm
    (>0.25 = major shift).

    Scale shape: ONE (source, bin) keyed aggregation with map-side
    combine over a pruned 2-column scan; the dense source x {PSI_BINS}
    grid comes from exploding a literal bin sequence on the per-source
    totals (catalog-bounded, no nested-loop join); the global range
    [lo, hi] and n_all ride a 1-row scalar-aggregate broadcast. Each
    PSI term is ONE double expression + floor on exact ints
    (bit-identical across engines); the final sum is INTEGER arithmetic
    — order-free by construction, so neither engine's float-fold
    strategy can perturb the result (round-12 ADVICE; the only
    cross-engine wobble left is ln()'s final ulp on identical doubles,
    which the micro floor absorbs except exactly at a quantization
    boundary)."""
    docs = load(spark, sf_dir, ("documents",))["documents"]
    d = docs.filter(F.col("n_chars") > 0).selectExpr(
        "source", "cast(n_chars as bigint) AS v"
    )
    mm = d.agg(
        F.min("v").alias("lo"),
        F.max("v").alias("hi"),
        F.count(F.lit(1)).cast("long").alias("n_all"),
    )
    b = d.crossJoin(F.broadcast(mm.select("lo", "hi"))).selectExpr(
        "source",
        f"least({PSI_BINS - 1}, (v - lo) * {PSI_BINS} div (hi - lo + 1)) AS bin",
    )
    cnt = b.groupBy("source", "bin").agg(
        F.count(F.lit(1)).cast("long").alias("n_sb")
    )
    srcs = d.groupBy("source").agg(F.count(F.lit(1)).cast("long").alias("n_s"))
    dense = srcs.crossJoin(F.broadcast(mm.select("n_all"))).select(
        "source",
        "n_s",
        "n_all",
        F.explode(F.expr(f"sequence(0, {PSI_BINS - 1})")).alias("bin"),
    )
    f = dense.join(cnt, ["source", "bin"], "left").na.fill(0, ["n_sb"])
    gb = f.groupBy("bin").agg(F.sum("n_sb").alias("n_b"))
    p = f"(cast(n_sb + 1 as double) / cast(n_s + {PSI_BINS} as double))"
    q = (
        f"(cast(n_b - n_sb + 1 as double) / "
        f"cast(n_all - n_s + {PSI_BINS} as double))"
    )
    # per-term micro quantization BEFORE the sum: integer addition is
    # order-free, so the aggregation needs no ordered fold and stays a
    # plain codegen'd sum with map-side combine
    term = f.join(gb, "bin").selectExpr(
        "source",
        "n_s",
        f"cast(floor(1000000.0 * (({p} - {q}) * ln({p} / {q}))) as bigint)"
        " AS t_micro",
    )
    return (
        term.groupBy("source", "n_s")
        .agg(F.sum("t_micro").cast("long").alias("psi_micro"))
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Chi-square term-source association (feature selection for quality models)
# ---------------------------------------------------------------------------

CHI2_TOP = 3  # most-distinctive terms reported per source
CHI2_MIN_DF = 5  # ignore ultra-rare terms (chi2 is unstable below this)


def _chi2_expr() -> str:
    """chi2 = n_all * (ad - bc)^2 / ((a+b)(c+d)(a+c)(b+d)) on the
    2x2 document-frequency table (a = df in source, b = df in rest,
    c/d = absent counts), floored to milli units. One identically-
    parenthesized double expression over exact ints on both engines."""
    return (
        "cast(floor(1000.0 * cast(n_all as double)"
        " * (cast(a as double) * cast(d as double)"
        "    - cast(b as double) * cast(c as double))"
        " * (cast(a as double) * cast(d as double)"
        "    - cast(b as double) * cast(c as double))"
        " / (cast(a + b as double) * cast(c + d as double)"
        "    * cast(a + c as double) * cast(b + d as double))) as bigint)"
    )


@register(
    "chi2_term_source",
    oracle=f"""
    WITH d AS (SELECT DISTINCT doc_id, source, unnest({textops.toks_expr('duckdb')}) AS term
               FROM documents WHERE n_chars > 0),
    ns AS (SELECT source, cast(count(DISTINCT doc_id) as bigint) AS n_s
           FROM d GROUP BY source),
    n AS (SELECT cast(count(DISTINCT doc_id) as bigint) AS n_all FROM d),
    st AS (SELECT term, source, cast(count(*) as bigint) AS a
           FROM d GROUP BY term, source),
    t AS (SELECT term, cast(sum(a) as bigint) AS df_all FROM st GROUP BY term),
    cells AS (SELECT st.source, st.term, st.a,
                     t.df_all - st.a AS b,
                     ns.n_s - st.a AS c,
                     n.n_all - ns.n_s - (t.df_all - st.a) AS d,
                     n.n_all
              FROM st JOIN t ON st.term = t.term
                   JOIN ns ON st.source = ns.source CROSS JOIN n
              WHERE t.df_all >= {CHI2_MIN_DF} AND t.df_all < n.n_all
                AND ns.n_s < n.n_all),
    scored AS (SELECT source, term, a AS df_src, {_chi2_expr()} AS chi2_milli
               FROM cells),
    r AS (SELECT source, term, df_src, chi2_milli,
                 row_number() OVER (PARTITION BY source
                     ORDER BY chi2_milli DESC, term) AS rk
          FROM scored)
    SELECT source, term, df_src, chi2_milli
    FROM r WHERE rk <= {CHI2_TOP} ORDER BY source, chi2_milli DESC, term
    """,
)
def chi2_term_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{CHI2_TOP} most source-distinctive terms per source by the
    chi-square statistic on the 2x2 document-frequency contingency
    table (term-in-source vs term-in-rest) — the classic feature-
    selection screen run before training a source/quality classifier,
    and a drift monitor in its own right (a feed whose top-chi2 terms
    churn is changing vocabulary).

    Scale shape: doc-term pairs are distinct-deduped once, then
    everything is keyed aggregation — (term, source) df, per-term
    totals (equi join on term), per-source totals (equi join on
    source), one scalar n_all broadcast. The 2x2 cells stay exact
    bigints; chi2 is ONE identically-parenthesized double expression
    (bit-identical across engines, no accumulation). Per-source top-k
    uses the two-phase range-sliced rank over the |vocab| x |sources|
    scored frame, never a naive low-cardinality window."""
    docs = load(spark, sf_dir, ("documents",))["documents"]
    toks = textops.toks_expr("spark")
    d = (
        docs.filter(F.col("n_chars") > 0)
        .selectExpr("doc_id", "source", f"explode({toks}) AS term")
        .distinct()
    )
    ns = d.groupBy("source").agg(
        F.countDistinct("doc_id").cast("long").alias("n_s")
    )
    n = d.agg(F.countDistinct("doc_id").cast("long").alias("n_all"))
    st = d.groupBy("term", "source").agg(F.count(F.lit(1)).cast("long").alias("a"))
    t = st.groupBy("term").agg(F.sum("a").cast("long").alias("df_all"))
    cells = (
        st.join(t, "term")
        .join(ns, "source")
        .crossJoin(F.broadcast(n))
        # df_all < n_all keeps the 2x2 table non-degenerate (a term in
        # EVERY doc has an empty absent column); n_s < n_all guards the
        # single-source corpus, whose "rest" margin b+d is zero — both
        # would divide by zero into a double inf that the two engines
        # cast differently
        .filter(
            (F.col("df_all") >= CHI2_MIN_DF)
            & (F.col("df_all") < F.col("n_all"))
            & (F.col("n_s") < F.col("n_all"))
        )
        .selectExpr(
            "source",
            "term",
            "a",
            "df_all - a AS b",
            "n_s - a AS c",
            "n_all - n_s - (df_all - a) AS d",
            "n_all",
        )
    )
    scored = cells.selectExpr(
        "source", "term", "a AS df_src", f"{_chi2_expr()} AS chi2_milli"
    ).withColumn("__neg", -F.col("chi2_milli"))
    ranked = grouped_value_rank(
        scored, ["source"], ["__neg", "term"], out_col="__rk", single_scan=True
    )
    return (
        ranked.filter(F.col("__rk") <= CHI2_TOP)
        .select("source", "term", "df_src", "chi2_milli")
        .orderBy("source", F.col("chi2_milli").desc(), "term")
    )


# ---------------------------------------------------------------------------
# Cross-snapshot n-gram novelty curve (how much NEW content per crawl?)
# ---------------------------------------------------------------------------

NOV_BATCHES = 8  # synthetic crawl snapshots: doc_id % NOV_BATCHES
NOV_N = 3  # shingle width (trigrams, the decontam convention)


@register(
    "ngram_novelty_curve",
    oracle=f"""
    WITH d AS (SELECT doc_id % {NOV_BATCHES} AS batch,
                      {textops.toks_expr('duckdb')} AS toks
               FROM documents WHERE n_chars > 0),
    sh AS (SELECT DISTINCT batch,
                  md5(array_to_string(list_slice(toks, i, i + {NOV_N - 1}), ' ')) AS ng
           FROM d CROSS JOIN (SELECT unnest(generate_series(1,
               (SELECT max(len(toks)) FROM d))) AS i) g
           WHERE i + {NOV_N - 1} <= len(toks)),
    first AS (SELECT ng, min(batch) AS fb FROM sh GROUP BY ng),
    per AS (SELECT batch, cast(count(*) as bigint) AS n_distinct
            FROM sh GROUP BY batch),
    new AS (SELECT fb AS batch, cast(count(*) as bigint) AS n_new
            FROM first GROUP BY fb),
    j AS (SELECT per.batch, per.n_distinct, coalesce(new.n_new, 0) AS n_new
          FROM per LEFT JOIN new ON per.batch = new.batch)
    SELECT cast(batch as bigint) AS batch, n_distinct, n_new,
           cast(floor(1000000.0 * cast(n_new as double)
                / cast(n_distinct as double)) as bigint) AS novelty_ppm,
           cast(sum(n_new) OVER (ORDER BY batch
                ROWS UNBOUNDED PRECEDING) as bigint) AS cum_new
    FROM j ORDER BY batch
    """,
)
def ngram_novelty_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Novelty curve across {NOV_BATCHES} synthetic crawl snapshots
    (batch = doc_id % {NOV_BATCHES}): per batch, the distinct
    {NOV_N}-gram count, how many of those shingles appear for the FIRST
    time in that batch, the novelty share in ppm, and the cumulative
    new-shingle count — the freshness measurement behind "is re-crawling
    still adding content?" decisions (the CommonCrawl novelty question)
    and the saturation signal for dedup budgeting.

    Scale shape: shingles are hashed (fixed-width md5 keys, never raw
    n-gram strings on the wire), distinct-deduped per (batch, shingle),
    then BOTH readouts are keyed aggregations over the same frame:
    first-occurrence batch = min(batch) per shingle, per-batch distinct
    = count per batch — one equi join stitches them. The cumulative sum
    is a window over the per-batch ROLLUP (O({NOV_BATCHES}) rows, the
    bounded-aggregate window class; events_daily_anomaly precedent)."""
    docs = load(spark, sf_dir, ("documents",))["documents"]
    toks = textops.toks_expr("spark")
    # the size guard matters beyond dropping useless docs: Spark's
    # sequence(1, stop) with stop < 1 generates a DESCENDING sequence
    # (1, 0, ...), and slice(toks, 0, n) then errors — a sub-shingle-
    # length doc must never reach the explode (the oracle's
    # i + NOV_N - 1 <= len(toks) predicate is the same guard)
    d = (
        docs.filter(F.col("n_chars") > 0)
        .selectExpr(f"doc_id % {NOV_BATCHES} AS batch", f"{toks} AS toks")
        .filter(F.expr(f"size(toks) >= {NOV_N}"))
    )
    sh = (
        d.select(
            "batch",
            F.explode(F.expr(f"sequence(1, size(toks) - {NOV_N - 1})")).alias("i"),
            "toks",
        )
        .selectExpr("batch", f"md5(array_join(slice(toks, i, {NOV_N}), ' ')) AS ng")
        .distinct()
    )
    first = sh.groupBy("ng").agg(F.min("batch").alias("fb"))
    per = sh.groupBy("batch").agg(F.count(F.lit(1)).cast("long").alias("n_distinct"))
    new = first.groupBy(F.col("fb").alias("batch")).agg(
        F.count(F.lit(1)).cast("long").alias("n_new")
    )
    w = Window.orderBy("batch").rowsBetween(Window.unboundedPreceding, 0)
    return (
        per.join(new, "batch", "left")
        .na.fill(0, ["n_new"])
        .selectExpr(
            "cast(batch as bigint) AS batch",
            "n_distinct",
            "n_new",
            "cast(floor(1000000.0 * cast(n_new as double)"
            " / cast(n_distinct as double)) as bigint) AS novelty_ppm",
        )
        .withColumn("cum_new", F.sum("n_new").over(w).cast("long"))
        .orderBy("batch")
    )


# ---------------------------------------------------------------------------
# Streaming drift monitor: per-window event-type PSI vs the global mix
# ---------------------------------------------------------------------------


@register(
    "events_type_psi_stream",
    oracle=f"""
    WITH wt AS (SELECT (epoch_us(ts) // 3600000000) * 3600 AS ws, event_type,
                       cast(count(*) as bigint) AS n_wt
                FROM events GROUP BY 1, 2),
    t AS (SELECT event_type, cast(sum(n_wt) as bigint) AS n_t
          FROM wt GROUP BY event_type),
    n AS (SELECT cast(sum(n_t) as bigint) AS n_all,
                 cast(count(*) as bigint) AS n_types FROM t),
    w AS (SELECT ws, cast(sum(n_wt) as bigint) AS n_w FROM wt GROUP BY ws),
    grid AS (SELECT w.ws, w.n_w, t.event_type, t.n_t, n.n_all, n.n_types
             FROM w CROSS JOIN t CROSS JOIN n),
    f AS (SELECT g.ws, g.n_w, g.event_type, g.n_t, g.n_all, g.n_types,
                 coalesce(wt.n_wt, 0) AS n_wt
          FROM grid g LEFT JOIN wt
            ON wt.ws = g.ws AND wt.event_type = g.event_type),
    term AS (SELECT ws, n_w, event_type,
                    cast(floor(1000000.0 *
                    ((cast(n_wt + 1 as double) / cast(n_w + n_types as double)
                      - cast(n_t - n_wt + 1 as double)
                        / cast(n_all - n_w + n_types as double))
                     * ln((cast(n_wt + 1 as double) / cast(n_w + n_types as double))
                          / (cast(n_t - n_wt + 1 as double)
                             / cast(n_all - n_w + n_types as double)))))
                        as bigint) AS tm_micro
             FROM f)
    SELECT cast(ws as bigint) AS window_start_s, n_w AS n_events,
           cast(sum(tm_micro) as bigint) AS drift_micro
    FROM term GROUP BY ws, n_w ORDER BY window_start_s
    """,
    doc="Streaming distribution-drift monitor: the watermarked tumbling "
    "windowed count stream feeds a per-window PSI of the event-type mix "
    "against the whole-run mix (SURVEY 2.11 incremental surface + the "
    "drift family's smoothed-PSI readout)",
)
def events_type_psi_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-tumbling-window drift alarm over the event stream: for each
    1-hour window, the Laplace-smoothed PSI of that window's event-type
    share distribution against the pooled run, in floor-micro units —
    'did THIS hour's traffic mix shift?', the streaming sibling of
    psi_source_drift. The windowed (window, type) counts come from the
    REAL watermarked streaming aggregation (streaming/windows.py
    tumbling_agg driven to completion over the finite file source,
    exactly the production counts table a drift dashboard tails); the
    PSI readout is the downstream batch view over that sink.

    Scale shape: the stream side is ONE watermarked keyed aggregation
    (state = live windows x types); the readout is keyed rollups over
    the O(windows x types) counts table — window totals, type totals, a
    1-row scalar broadcast — then a dense windows x types grid built
    with a non-foldable-constant-key HASH join (types frame is
    catalog-bounded); each PSI term is floored to micro units before an
    order-free INTEGER sum, so neither engine's float-fold strategy can
    perturb the result (psi_source_drift precedent)."""
    from tracy_matdb_spark.streaming.windows import (
        read_events_stream,
        run_to_completion,
        tumbling_agg,
    )

    ev = read_events_stream(spark, sf_dir)
    agg = run_to_completion(
        tumbling_agg(ev), "type_psi_stream_q", registry_name="events_type_psi_stream"
    )
    return psi_readout_from_counts(agg)


def psi_readout_from_counts(agg: DataFrame) -> DataFrame:
    """The batch PSI view over a (window_start_s, event_type, n_events)
    counts table — factored out of events_type_psi_stream so the
    streaming-recovery test (tests/test_streaming.py) can assert the
    readout is identical over an uninterrupted run and a
    killed-and-restarted-from-checkpoint run of the SAME stream."""
    # checkpoint the O(windows x types) counts table once: the memory
    # sink's MemoryPlan reuses the SAME attribute ids on every
    # reference, and the readout below self-joins it three ways —
    # Spark's analyzer fails with INTERNAL_ERROR on MemoryPlan
    # self-joins (and a drift dashboard reads a STORED counts table
    # anyway, which is exactly what the checkpoint is)
    wt = agg.select(
        "window_start_s", "event_type", F.col("n_events").cast("long").alias("n_wt")
    ).localCheckpoint()
    t = wt.groupBy("event_type").agg(F.sum("n_wt").cast("long").alias("n_t"))
    n = t.agg(
        F.sum("n_t").cast("long").alias("n_all"),
        F.count(F.lit(1)).cast("long").alias("n_types"),
    )
    w = wt.groupBy("window_start_s").agg(F.sum("n_wt").cast("long").alias("n_w"))
    # non-foldable constant keys (see _nonfoldable_one)
    grid = (
        w.withColumn("__k", _nonfoldable_one("n_w"))
        .join(
            F.broadcast(
                t.crossJoin(F.broadcast(n)).withColumn(
                    "__k", _nonfoldable_one("n_t")
                )
            ),
            "__k",
        )
        .drop("__k")
    )
    f = grid.join(wt, ["window_start_s", "event_type"], "left").na.fill(0, ["n_wt"])
    p = "(cast(n_wt + 1 as double) / cast(n_w + n_types as double))"
    q = (
        "(cast(n_t - n_wt + 1 as double) / "
        "cast(n_all - n_w + n_types as double))"
    )
    # per-term micro quantization before the sum (psi_source_drift
    # precedent): integer addition is order-free on both engines
    term = f.selectExpr(
        "window_start_s",
        "n_w",
        f"cast(floor(1000000.0 * (({p} - {q}) * ln({p} / {q}))) as bigint)"
        " AS tm_micro",
    )
    return (
        term.groupBy("window_start_s", F.col("n_w").alias("n_events"))
        .agg(F.sum("tm_micro").cast("long").alias("drift_micro"))
        .orderBy("window_start_s")
    )
