"""Domain operators from the reference, as registered queries.

Covers SURVEY.md §2: reproducible splits (§2.9), the AFLOW filter DSL
(§2.4), generator transformations (§2.3), MD frame subsampling (§2.1),
status rollups and content-hash verification (§2.6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tracy_matdb_spark.catalog import load
from tracy_matdb_spark.functions.prng import hash60
from tracy_matdb_spark.operators import generators
from tracy_matdb_spark.operators.aflow_dsl import aflow_query
from tracy_matdb_spark.operators.split import assign_split, oracle_split_sql
from tracy_matdb_spark.queries import register


@register(
    "split_assign_orders",
    headline=True,
    oracle=oracle_split_sql("orders", "o_orderkey", 0.4, seed=42) + " ORDER BY o_orderkey",
    doc="Reproducible split assignment (matdb/database/utility.py:42-165)",
)
def split_assign_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/holdout/super assignment over orders; exact
    ceil-based counts and counter-hash shuffle per SURVEY.md §2.9."""
    orders = load(spark, sf_dir, ("orders",))["orders"].select("o_orderkey")
    return assign_split(orders, "o_orderkey", 0.4, seed=42).select("o_orderkey", "label").orderBy("o_orderkey")


@register(
    "aflow_dsl_filter",
    oracle="""
    SELECT p_partkey, p_name, p_brand, p_type, p_size
    FROM part
    WHERE ((p_type LIKE '%ECO%' AND p_size > 20) OR p_brand = 'Brand#13')
      AND NOT p_type LIKE 'PROMO%'
    ORDER BY p_retailprice DESC, p_partkey
    LIMIT 25
    """,
    doc="AFLOW filter DSL compiled to Catalyst (matdb/database/aflux.py:84-129)",
)
def aflow_dsl_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's remote-query shape — filter DSL -> select -> orderby ->
    limit (aflux.py:263-316) — compiled to one pushdown-friendly plan."""
    part = load(spark, sf_dir, ("part",))["part"]
    spec = [
        "&",
        ["|", ["&", ["p_type", "%", "ECO"], ["p_size", ">", 20]], ["p_brand", "==", "Brand#13"]],
        ["~", ["p_type", ">", "PROMO"]],
    ]
    return aflow_query(
        part,
        filters=spec,
        select=["p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice"],
        orderby="p_retailprice",
        reverse=True,
        limit=25,
        tiebreak="p_partkey",
    ).drop("p_retailprice")


@register(
    "distortion_generate",
    headline=True,
    oracle=generators.distortion_oracle_sql(),
    doc="Volume-preserving lattice distortion generator (distortion.py:220-263)",
)
def distortion_generate(spark: SparkSession, sf_dir: str) -> DataFrame:
    return generators.distortion_generate(spark)


@register(
    "vacancy_enumerate",
    oracle=generators.vacancy_oracle_sql(),
    doc="Vacancy index-set enumeration + vuid hash (vacancy.py:254-318)",
)
def vacancy_enumerate(spark: SparkSession, sf_dir: str) -> DataFrame:
    return generators.vacancy_enumerate(spark)


@register(
    "substitution_generate",
    oracle=generators.substitution_oracle_sql(),
    doc="Exact-stoichiometry relabeling generator (substitution.py:196-302)",
)
def substitution_generate(spark: SparkSession, sf_dir: str) -> DataFrame:
    return generators.substitution_generate(spark)


@register(
    "param_grid_expand",
    oracle=generators.param_grid_oracle_sql(),
    doc="ParameterGrid cartesian expansion + suffix naming (utility.py:766-819)",
)
def param_grid_expand(spark: SparkSession, sf_dir: str) -> DataFrame:
    return generators.param_grid_expand(spark)


@register(
    "md_frame_subsample",
    oracle="""
    SELECT event_id AS frame, epoch_us(ts) AS ts_us, user_id AS run_id, value AS energy
    FROM events
    WHERE event_id % 100 = 0
    ORDER BY frame
    """,
    doc="MD trajectory subsampling: keep every samplerate-th frame (md.py:204-209)",
)
def md_frame_subsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every-Nth-frame trajectory subsampling (md.py:204-209). The modulo
    predicate is pushed into the scan; no shuffle at any scale."""
    from tracy_matdb_spark.catalog import load_events

    ev = load_events(spark, sf_dir)
    return (
        ev.filter(F.col("event_id") % 100 == 0)
        .select(
            F.col("event_id").alias("frame"),
            F.expr("ts_ns div 1000").alias("ts_us"),
            F.col("user_id").alias("run_id"),
            F.col("value").alias("energy"),
        )
        .orderBy("frame")
    )


@register(
    "status_rollup",
    oracle="""
    SELECT o_orderstatus AS status,
           count(*) AS n_total,
           sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS n_ready,
           sum(CASE WHEN o_totalprice > 150000 THEN 1 ELSE 0 END) AS n_done
    FROM orders
    GROUP BY o_orderstatus
    ORDER BY status
    """,
    doc="Conditional-count status rollup (matdb/database/__init__.py:930-982)",
)
def status_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's `status()` — per-group ready/done counts — as a single
    conditional aggregation (one scan, map-side partials)."""
    orders = load(spark, sf_dir, ("orders",))["orders"]
    return (
        orders.groupBy(F.col("o_orderstatus").alias("status"))
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.sum(F.when(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1).otherwise(0)).alias("n_ready"),
            F.sum(F.when(F.col("o_totalprice") > 150000, 1).otherwise(0)).alias("n_done"),
        )
        .orderBy("status")
    )


@register(
    "hessian_eigen",
    oracle=None,  # eigh is not SQL-expressible; pytest asserts eigen identities
    doc="Hessian eigenpair UDTF: applyInPandas eigh + explode (hessian.py:243-269)",
)
def hessian_eigen(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tracy_matdb_spark.operators.hessian import eigen_explode

    seeds = spark.createDataFrame(
        [("fcc", 2), ("bcc", 3), ("hcp", 4)], "seed_id string, n_atoms int"
    )
    return (
        eigen_explode(seeds)
        .select("seed_id", "n", "eig_index", F.round("eigenvalue", 6).alias("eigenvalue"))
        .orderBy("seed_id", "eig_index")
    )


@register(
    "validation_rms",
    oracle="""
    SELECT o_orderstatus AS status,
           round(sqrt(avg((o_totalprice - (o_totalprice * 0.98 + 500)) *
                          (o_totalprice - (o_totalprice * 0.98 + 500)))), 2) AS rms,
           round(avg(o_totalprice - (o_totalprice * 0.98 + 500)), 2) AS residual_mean,
           count(*) AS n
    FROM orders
    GROUP BY o_orderstatus
    ORDER BY status
    """,
    doc="Trainer validation RMS aggregation (fitting/basic.py:450-488)",
)
def validation_rms_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RMS of (ref - predicted) per group; `predicted` synthesized from the
    ref column so the oracle can reproduce it."""
    orders = load(spark, sf_dir, ("orders",))["orders"]
    df = orders.withColumn("pred", F.col("o_totalprice") * 0.98 + 500)
    delta = F.col("o_totalprice") - F.col("pred")
    return (
        df.groupBy(F.col("o_orderstatus").alias("status"))
        .agg(
            F.round(F.sqrt(F.avg(delta * delta)), 2).alias("rms"),
            F.round(F.avg(delta), 2).alias("residual_mean"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("status")
    )


@register(
    "dbfilter_exclude",
    oracle="""
    SELECT l_returnflag, count(*) AS n_kept,
           round(sum(l_quantity), 2) AS sum_qty
    FROM lineitem
    WHERE NOT (l_quantity > 45)
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    doc="Trainer dbfilter exclusion semantics (fitting/basic.py:164-204, 347-391)",
)
def dbfilter_exclude_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tracy_matdb_spark.operators.fitting import dbfilter_exclude

    li = load(spark, sf_dir, ("lineitem",))["lineitem"]
    kept = dbfilter_exclude(li, "l_quantity", ">", 45)
    return (
        kept.groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n_kept"), F.round(F.sum("l_quantity"), 2).alias("sum_qty"))
        .orderBy("l_returnflag")
    )


@register(
    "active_learning_iterations",
    oracle=None,  # driver-loop operator; invariants asserted in tests
    doc="Active-learning append + anti-join dedupe loop (active.py:158-205)",
)
def active_learning_iterations(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tracy_matdb_spark.operators.active import generate_until_count
    from tracy_matdb_spark.operators.generators import _seeds_df, distortion_transform

    seeds = _seeds_df(spark)

    def make_batch(it: int) -> DataFrame:
        return distortion_transform(seeds, nconfigs=10, ran_seed=42, group=f"al-{it}")

    history, iters = generate_until_count(make_batch, target=75, uid="duid")
    return (
        history.groupBy("iteration")
        .agg(F.count(F.lit(1)).alias("n_configs"))
        .orderBy("iteration")
    )


@register(
    "multimodal_features",
    oracle=None,  # payload decode is stubbed (no codec libs); plumbing rows-only
    doc="Multimodal binary columns: mapInPandas decode/feature sketch (north star)",
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tracy_matdb_spark.operators.multimodal import extract_features, synth_media

    media = synth_media(spark, n=48)
    return (
        extract_features(media)
        .select("media_id", "kind", "content_sha", "n_bytes")
        .orderBy("media_id")
    )


@register(
    "group_content_hash",
    oracle="""
    SELECT l_returnflag AS grp,
           bit_xor(('0x' || substr(md5(concat_ws('|', cast(42 as varchar),
                    cast(l_orderkey as varchar), cast(l_linenumber as varchar))), 1, 15))::bigint)
               AS content_hash,
           count(*) AS n_rows
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY grp
    """,
    doc="Order-independent group content hash / verify (database/__init__.py:461-470, 1944-1976)",
)
def group_content_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-hash integrity per group. The reference hashes a sorted
    concatenation (utility.py:985-1002) — an inherently sequential fold; the
    scale-safe redesign is an order-independent XOR of per-row counter hashes,
    which Spark computes with map-side partial aggregation and no sort."""
    li = load(spark, sf_dir, ("lineitem",))["lineitem"]
    row_hash = hash60(F.lit(42), F.col("l_orderkey"), F.col("l_linenumber"))
    return (
        li.select(F.col("l_returnflag").alias("grp"), row_hash.alias("h"))
        .groupBy("grp")
        .agg(F.expr("bit_xor(h)").alias("content_hash"), F.count(F.lit(1)).alias("n_rows"))
        .orderBy("grp")
    )
