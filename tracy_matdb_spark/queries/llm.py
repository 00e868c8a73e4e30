"""LLM-data-pipeline queries: dedup, text analysis, similarity search.

North-star additions beyond the reference's surface (BASELINE.json):
exact + near dedup (minhash-LSH, simhash, n-gram Jaccard), embedding
similarity (brute-force + LSH-bucketed), language-ID, quality scoring,
token counting, fingerprinting — all on the driver's `documents` and
`embeddings` tables, all JVM-side (no Python UDFs), all oracle-checked
except the explicitly-approximate LSH scale path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tracy_matdb_spark.catalog import load
from tracy_matdb_spark.operators import textops
from tracy_matdb_spark.queries import register

# ---------------------------------------------------------------------------
# Exact dedup (hash-groupBy; SURVEY.md §2.8 uid-set dedupe at scale)
# ---------------------------------------------------------------------------


@register(
    "dedup_exact",
    headline=True,
    oracle="""
    SELECT md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))) AS fp,
           min(doc_id) AS keep_id,
           count(*)    AS n_dups
    FROM documents
    GROUP BY 1
    ORDER BY keep_id
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact near-identity dedup: normalize whitespace/case, md5, keep the
    min doc_id per fingerprint. One shuffle on the fingerprint; map-side
    partial agg makes this linear at 100 TB. Mirrors the reference's
    content-hash dedupe (e.g. active.py:181-198) on documents."""
    docs = load(spark, sf_dir, ("documents",))["documents"]
    fp = F.md5(F.lower(F.regexp_replace(F.trim(F.col("text")), r"\s+", " ")))
    return (
        docs.select(fp.alias("fp"), "doc_id")
        .groupBy("fp")
        .agg(F.min("doc_id").alias("keep_id"), F.count(F.lit(1)).alias("n_dups"))
        .orderBy("keep_id")
    )


# ---------------------------------------------------------------------------
# Text quality + token counting
# ---------------------------------------------------------------------------


def _quality_sql(dialect: str) -> list[str]:
    toks = textops.toks_expr(dialect)
    n_tok = f"cast({'size' if dialect == 'spark' else 'len'}({toks}) as bigint)"
    n_stop = f"cast({textops.count_in_expr(dialect, toks, textops.STOPWORDS)} as bigint)"
    sum_len = textops.sum_len_expr(dialect, toks)
    return [
        "doc_id",
        f"{n_tok} AS n_tokens",
        f"{n_stop} AS n_stop",
        f"{textops.quant_ratio_expr(n_stop, n_tok)} AS stop_ratio_q",
        f"{textops.quant_ratio_expr(sum_len, n_tok)} AS avg_token_len_q",
        f"(CASE WHEN {n_tok} >= 10 AND {n_tok} <= 500 "
        f"AND {textops.quant_ratio_expr(n_stop, n_tok)} < 500000 THEN true ELSE false END) AS quality_ok",
    ]


@register(
    "text_quality",
    headline=True,
    oracle=f"""
    SELECT {', '.join(_quality_sql('duckdb'))}
    FROM documents
    WHERE n_chars > 0
    ORDER BY doc_id
    """,
)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document quality metrics (token count, stopword ratio, mean token
    length, keep/drop flag) with built-in array lambdas — a narrow map-only
    stage, no shuffle, trivially parallel at any scale."""
    docs = load(spark, sf_dir, ("documents",))["documents"]
    return (
        docs.filter(F.col("n_chars") > 0)
        .selectExpr(*_quality_sql("spark"))
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Language ID (marker-word heuristic)
# ---------------------------------------------------------------------------


def _langid_sql(dialect: str) -> tuple[str, str]:
    toks = textops.toks_expr(dialect)
    scores = textops.lang_score_exprs(dialect, toks)
    langs = sorted(scores)
    inner = ["doc_id", "lang AS lang_actual"] + [f"{scores[lang]} AS s_{lang}" for lang in langs]
    best = f"greatest({', '.join('s_' + lang for lang in langs)})"
    cases = " ".join(f"WHEN s_{lang} = {best} THEN '{lang}'" for lang in langs)
    outer = f"doc_id, lang_actual, (CASE {cases} END) AS lang_pred"
    return ", ".join(inner), outer


@register(
    "lang_id_markers",
    oracle=(
        lambda inner_outer: f"""
    SELECT {inner_outer[1]}
    FROM (SELECT {inner_outer[0]} FROM documents) scored
    ORDER BY doc_id
    """
    )(_langid_sql("duckdb")),
)
def lang_id_markers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic marker-word language ID (argmax of per-language marker
    counts, ties to first lang). The synthetic corpus shares one vocabulary,
    so this demonstrates the operator shape, not classifier accuracy."""
    docs = load(spark, sf_dir, ("documents",))["documents"]
    inner, outer = _langid_sql("spark")
    scored = docs.selectExpr(*_split_exprs(inner))
    return scored.selectExpr(*_split_exprs(outer)).orderBy("doc_id")


def _split_exprs(joined: str) -> list[str]:
    """Split a comma-joined expr list, respecting parens/quotes."""
    out, depth, cur, in_q = [], 0, [], False
    for ch in joined:
        if ch == "'":
            in_q = not in_q
        elif not in_q:
            if ch in "([":
                depth += 1
            elif ch in ")]":
                depth -= 1
            elif ch == "," and depth == 0:
                out.append("".join(cur).strip())
                cur = []
                continue
        cur.append(ch)
    if cur:
        out.append("".join(cur).strip())
    return out


# ---------------------------------------------------------------------------
# Fingerprint + simhash
# ---------------------------------------------------------------------------


@register(
    "doc_fingerprint",
    oracle=f"""
    SELECT doc_id,
           md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))) AS fp,
           {textops.simhash_expr('duckdb', textops.toks_expr('duckdb'))} AS simhash16
    FROM documents
    ORDER BY doc_id
    """,
)
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content fingerprint (md5 of normalized text) + 16-bit simhash for
    near-dup bucketing; map-only, no shuffle."""
    docs = load(spark, sf_dir, ("documents",))["documents"]
    return docs.selectExpr(
        "doc_id",
        "md5(lower(regexp_replace(trim(text), '\\\\s+', ' '))) AS fp",
        f"{textops.simhash_expr('spark', textops.toks_expr('spark'))} AS simhash16",
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# MinHash + LSH candidate pairs (word-3-gram shingles)
# ---------------------------------------------------------------------------

N_PERM = 6
BAND_SIZE = 2  # -> 3 bands


def _minhash_sql_duckdb() -> str:
    toks = textops.toks_expr("duckdb")
    return f"""
    WITH docs_t AS (
        SELECT doc_id, {toks} AS toks FROM documents
        WHERE len({toks}) >= 3
    ),
    shingles AS (
        SELECT DISTINCT doc_id,
               array_to_string(list_slice(toks, i, i + 2), ' ') AS sh
        FROM docs_t
        CROSS JOIN (SELECT unnest(generate_series(1, 600)) AS i) g
        WHERE i <= len(toks) - 2
    ),
    mh AS (
        SELECT doc_id, p.perm, min(md5(concat(cast(p.perm as varchar), '|', sh))) AS mh
        FROM shingles CROSS JOIN (SELECT unnest(generate_series(0, {N_PERM - 1})) AS perm) p
        GROUP BY doc_id, p.perm
    ),
    bands AS (
        SELECT doc_id, cast(floor(perm / cast({BAND_SIZE} as double)) as int) AS band,
               md5(string_agg(mh, '|' ORDER BY perm)) AS sig
        FROM mh
        GROUP BY doc_id, cast(floor(perm / cast({BAND_SIZE} as double)) as int)
    )
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM bands a JOIN bands b ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
    ORDER BY doc_a, doc_b
    """


@register("minhash_lsh_pairs", headline=True, oracle=_minhash_sql_duckdb())
def minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash + LSH near-dup candidate pairs over word-3-gram shingles.

    Pipeline: shingle (explode, distinct) -> per-permutation minhash
    (md5 hex min — identical total order in both engines) -> band
    signatures -> self-join on (band, sig). At 100 TB the only wide ops
    are the two groupBys and the final band-bucket join, all on keys
    whose cardinality grows with the corpus — classic shuffle-balanced
    LSH. Candidate pairs would then be verified by exact Jaccard
    (ngram_jaccard_pairs) on the tiny candidate set."""
    docs = load(spark, sf_dir, ("documents",))["documents"]
    toks = textops.toks_expr("spark")
    docs_t = docs.selectExpr("doc_id", f"{toks} AS toks").filter(F.expr("size(toks) >= 3"))
    shingles = (
        docs_t.select("doc_id", F.explode(F.expr("sequence(1, size(toks) - 2)")).alias("i"), "toks")
        .selectExpr("doc_id", "array_join(slice(toks, i, 3), ' ') AS sh")
        .distinct()
    )
    perms = spark.range(N_PERM).select(F.col("id").cast("int").alias("perm"))
    mh = (
        shingles.crossJoin(F.broadcast(perms))
        .select("doc_id", "perm", F.expr("md5(concat(cast(perm as string), '|', sh))").alias("mh_in"))
        .groupBy("doc_id", "perm")
        .agg(F.min("mh_in").alias("mh"))
    )
    bands = (
        mh.withColumn("band", F.expr(f"cast(floor(perm / cast({BAND_SIZE} as double)) as int)"))
        .groupBy("doc_id", "band")
        .agg(F.md5(F.concat_ws("|", F.array_sort(F.collect_list(F.struct("perm", "mh")))["mh"])).alias("sig"))
    )
    a = bands.alias("a")
    b = bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.sig") == F.col("b.sig"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
        .orderBy("doc_a", "doc_b")
    )


# ---------------------------------------------------------------------------
# Exact n-gram Jaccard pairs
# ---------------------------------------------------------------------------

JACCARD_MIN_Q = 200_000  # 0.2 quantized


def _jaccard_sql_duckdb() -> str:
    toks = textops.toks_expr("duckdb")
    jac = textops.quant_ratio_expr("common", "(na + nb - common)")
    return f"""
    WITH docs_t AS (
        SELECT doc_id, {toks} AS toks FROM documents WHERE len({toks}) >= 3
    ),
    shingles AS (
        SELECT DISTINCT doc_id, array_to_string(list_slice(toks, i, i + 2), ' ') AS sh
        FROM docs_t
        CROSS JOIN (SELECT unnest(generate_series(1, 600)) AS i) g
        WHERE i <= len(toks) - 2
    ),
    sizes AS (SELECT doc_id, count(*) AS nsh FROM shingles GROUP BY doc_id),
    common AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS common
        FROM shingles a JOIN shingles b ON a.sh = b.sh AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
    )
    SELECT doc_a, doc_b, {jac} AS jaccard_q
    FROM (
        SELECT doc_a, doc_b, common, sa.nsh AS na, sb.nsh AS nb
        FROM common
        JOIN sizes sa ON sa.doc_id = doc_a
        JOIN sizes sb ON sb.doc_id = doc_b
    )
    WHERE {jac} >= {JACCARD_MIN_Q}
    ORDER BY doc_a, doc_b
    """


@register("ngram_jaccard_pairs", oracle=_jaccard_sql_duckdb())
def ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact word-3-gram Jaccard similarity pairs (>= 0.2). The shingle
    equi-join is the scale risk (hot shingles fan out quadratically) — at
    100 TB this runs only on LSH candidates (minhash_lsh_pairs) or drops
    stop-shingles; AQE skew-join splits residual hot keys."""
    docs = load(spark, sf_dir, ("documents",))["documents"]
    toks = textops.toks_expr("spark")
    docs_t = docs.selectExpr("doc_id", f"{toks} AS toks").filter(F.expr("size(toks) >= 3"))
    shingles = (
        docs_t.select("doc_id", F.explode(F.expr("sequence(1, size(toks) - 2)")).alias("i"), "toks")
        .selectExpr("doc_id", "array_join(slice(toks, i, 3), ' ') AS sh")
        .distinct()
    )
    sizes = shingles.groupBy("doc_id").agg(F.count(F.lit(1)).alias("nsh"))
    a = shingles.alias("a")
    b = shingles.alias("b")
    common = (
        a.join(b, (F.col("a.sh") == F.col("b.sh")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("common"))
    )
    jac = textops.quant_ratio_expr("common", "(na + nb - common)")
    return (
        common.join(F.broadcast(sizes.selectExpr("doc_id AS doc_a", "nsh AS na")), "doc_a")
        .join(F.broadcast(sizes.selectExpr("doc_id AS doc_b", "nsh AS nb")), "doc_b")
        .withColumn("jaccard_q", F.expr(jac))
        .filter(F.col("jaccard_q") >= JACCARD_MIN_Q)
        .select("doc_a", "doc_b", "jaccard_q")
        .orderBy("doc_a", "doc_b")
    )


# ---------------------------------------------------------------------------
# Embedding similarity: brute-force kNN + exact near-dup + LSH scale path
# ---------------------------------------------------------------------------


def _dot_expr(dialect: str, a: str, b: str) -> str:
    if dialect == "spark":
        return (
            f"aggregate(zip_with({a}, {b}, (x, y) -> cast(x as double) * cast(y as double)), "
            f"cast(0 as double), (acc, v) -> acc + v)"
        )
    return (
        f"list_reduce(list_transform(list_zip({a}, {b}), "
        f"x -> cast(x[1] as double) * cast(x[2] as double)), (p, q) -> p + q)"
    )


def _norm_expr(dialect: str, a: str) -> str:
    return f"sqrt({_dot_expr(dialect, a, a)})"


@register(
    "knn_embeddings",
    headline=True,
    oracle=f"""
    WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
    sims AS (
        SELECT vec_id,
               cast(floor(({_dot_expr('duckdb', 'embedding', 'qv')} /
                    ({_norm_expr('duckdb', 'embedding')} * {_norm_expr('duckdb', 'qv')}))
                    * cast(1000000 as double)) as bigint) AS sim_q
        FROM embeddings CROSS JOIN q
        WHERE vec_id <> 0
    )
    SELECT vec_id, sim_q FROM sims ORDER BY sim_q DESC, vec_id LIMIT 10
    """,
)
def knn_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k for one query vector: broadcast the query,
    one narrow map + a global top-k (TakeOrderedAndProject — no full sort).
    The IVF/LSH scale path is embedding_lsh_near_dup."""
    emb = load(spark, sf_dir, ("embeddings",))["embeddings"]
    q = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qv"))
    sim = (
        f"cast(floor(({_dot_expr('spark', 'embedding', 'qv')} / "
        f"({_norm_expr('spark', 'embedding')} * {_norm_expr('spark', 'qv')})) "
        f"* cast(1000000 as double)) as bigint)"
    )
    return (
        emb.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
        .selectExpr("vec_id", f"{sim} AS sim_q")
        .orderBy(F.col("sim_q").desc(), "vec_id")
        .limit(10)
    )


NEAR_DUP_MIN_Q = 400_000  # cosine >= 0.4 (synthetic embeddings are near-orthogonal)


@register(
    "embedding_near_dup",
    oracle=f"""
    WITH n AS (
        SELECT vec_id, embedding, {_norm_expr('duckdb', 'embedding')} AS nrm
        FROM embeddings
    )
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           cast(floor(({_dot_expr('duckdb', 'a.embedding', 'b.embedding')} / (a.nrm * b.nrm))
                * cast(1000000 as double)) as bigint) AS sim_q
    FROM n a JOIN n b ON a.vec_id < b.vec_id
    WHERE cast(floor(({_dot_expr('duckdb', 'a.embedding', 'b.embedding')} / (a.nrm * b.nrm))
                * cast(1000000 as double)) as bigint) >= {NEAR_DUP_MIN_Q}
    ORDER BY vec_a, vec_b
    """,
)
def embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact embedding near-dup pairs (cosine >= 0.4) via self-join. O(n^2) —
    correct baseline at correctness scale; the LSH-bucketed variant below is
    the 100 TB path (bucket first, exact-check within buckets)."""
    emb = load(spark, sf_dir, ("embeddings",))["embeddings"]
    n = emb.selectExpr("vec_id", "embedding", f"{_norm_expr('spark', 'embedding')} AS nrm")
    a = n.alias("a")
    b = n.alias("b")
    sim = (
        f"cast(floor(({_dot_expr('spark', 'a.embedding', 'b.embedding')} / (a.nrm * b.nrm)) "
        f"* cast(1000000 as double)) as bigint)"
    )
    return (
        a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
        .selectExpr("a.vec_id AS vec_a", "b.vec_id AS vec_b", f"{sim} AS sim_q")
        .filter(F.col("sim_q") >= NEAR_DUP_MIN_Q)
        .orderBy("vec_a", "vec_b")
    )


LSH_BANDS = 4
LSH_BAND_BITS = 4


@register("embedding_lsh_near_dup", oracle=None)
def embedding_lsh_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale path for near-dup: banded sign-LSH. Each vector gets
    LSH_BANDS buckets (LSH_BAND_BITS dimension-signs each); pairs sharing
    any band bucket are exact-cosine-checked. Tunable recall/cost: more
    bands -> higher recall, more candidates. The candidate join is on
    (band, bucket) — bounded fan-out, no O(n^2) stage. Approximate by
    design => rows-only check; tests/test_llm.py asserts candidates are a
    subset of the exact pairs and measures recall."""
    emb = load(spark, sf_dir, ("embeddings",))["embeddings"]
    n = emb.selectExpr("vec_id", "embedding", f"{_norm_expr('spark', 'embedding')} AS nrm")
    band_rows = []
    for band in range(LSH_BANDS):
        bits = " + ".join(
            f"(CASE WHEN cast(element_at(embedding, {band * LSH_BAND_BITS + i + 1}) as double) > 0"
            f" THEN {1 << i} ELSE 0 END)"
            for i in range(LSH_BAND_BITS)
        )
        band_rows.append(f"struct(cast({band} as int) AS band, ({bits}) AS bucket)")
    banded = n.selectExpr(
        "vec_id", "embedding", "nrm", f"explode(array({', '.join(band_rows)})) AS bb"
    ).selectExpr("vec_id", "embedding", "nrm", "bb.band AS band", "bb.bucket AS bucket")
    a = banded.alias("a")
    b = banded.alias("b")
    sim = (
        f"cast(floor(({_dot_expr('spark', 'a.embedding', 'b.embedding')} / (a.nrm * b.nrm)) "
        f"* cast(1000000 as double)) as bigint)"
    )
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .selectExpr("a.vec_id AS vec_a", "b.vec_id AS vec_b", f"{sim} AS sim_q")
        .distinct()
        .filter(F.col("sim_q") >= NEAR_DUP_MIN_Q)
        .orderBy("vec_a", "vec_b")
    )
