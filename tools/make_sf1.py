"""Generate a local sf1 dataset (10x sf0.1) for the scaling spot-check.

The driver ships sf0.001/0.01/0.1 only (TESTDATA.md), so the one-decade
sf0.01 -> sf0.1 ratios in SCALING.json were the sole empirical scaling
evidence. This tool derives a deterministic sf1 from the READ-ONLY
driver sf0.1 tables by 10x key-shifted replication (no randomness — the
output is a pure function of the driver data):

- ``lineitem`` / ``orders`` / ``customer``: copy k (0..9) shifts every
  key by k * its dense sf0.1 range (orderkey +k*150000, custkey
  +k*15000, suppkey +k*1000, partkey +k*20000), reproducing TPC-H's own
  scaling law — row counts and key cardinalities grow 10x, per-key
  cardinalities (lines per order, orders per customer, degree
  distributions) stay constant. c_name is re-derived from the shifted
  custkey ('Customer#' || 9-digit key, the driver's format) so
  name-substring blocking keys keep their true distribution.
- ``documents``: copy k > 0 suffixes EVERY token with the copy digit
  (regexp '(\\S+)' -> '\\1k'), so cross-copy documents share zero
  word-3-gram shingles while within-copy shingle structure — and hence
  the near-dup pair set per copy — is preserved exactly. Naive 10x
  text replication would instead give every document 9 exact clones and
  inflate LSH candidate pairs quadratically, measuring an artifact.
  n_chars is recomputed from the perturbed text.
- ``events``: user_id shifts per copy, the time axis does not — every
  window holds 10x rows from 10x users at unchanged per-user density
  (how an event stream actually grows).
- ``embeddings``: one vec_id-dependent dimension perturbed per copy so
  kNN never sees cross-copy exact-clone vectors.
- ``supplier`` / ``part``: key-shifted like customer (names re-derived
  from the shifted key); ``region`` / ``nation`` copied verbatim —
  static dimensions under every TPC-H scale model, so dim-broadcast
  joins stay honest.

Copy 0 is byte-identical to driver sf0.1, so t(sf1)/t(driver sf0.1) is
an apples-to-apples 10x-data ratio, directly comparable to the
sf0.01 -> sf0.1 ratios in SCALING.json.

Output: $OUT_DIR (default /root/repo/.localdata/sf1)/<table>.parquet —
gitignored, regenerate on demand (~10 s). Usage:

    python tools/make_sf1.py [out_dir]
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
COPIES = 10

# dense 0-based key ranges of the driver sf0.1 tables (verified by
# min/max scan; the generator re-asserts them at run time)
R_ORDER, R_CUST, R_SUPP, R_PART, R_DOC = 150_000, 15_000, 1_000, 20_000, 5_000
R_EVENT, R_USER, R_VEC = 100_000, 1_500, 2_000


def main(out_dir: str, copies: int = COPIES, skip_documents: bool = False) -> None:
    os.makedirs(out_dir, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW ks AS SELECT unnest(range({copies})) AS k")

    # re-assert the key ranges this generator hard-codes
    checks = [
        ("lineitem", "l_orderkey", R_ORDER), ("lineitem", "l_suppkey", R_SUPP),
        ("lineitem", "l_partkey", R_PART), ("orders", "o_orderkey", R_ORDER),
        ("orders", "o_custkey", R_CUST), ("customer", "c_custkey", R_CUST),
        ("documents", "doc_id", R_DOC), ("events", "event_id", R_EVENT),
        ("events", "user_id", R_USER), ("embeddings", "vec_id", R_VEC),
        ("part", "p_partkey", R_PART),
    ]
    for t, col, rng in checks:
        lo, hi = con.execute(
            f"SELECT min({col}), max({col}) FROM '{SRC}/{t}.parquet'"
        ).fetchone()
        if lo < 0 or hi >= rng:
            raise SystemExit(f"make_sf1: {t}.{col} range [{lo},{hi}] outside [0,{rng})")

    jobs = {
        "lineitem": f"""
            SELECT l_orderkey + k * {R_ORDER} AS l_orderkey,
                   l_partkey + k * {R_PART} AS l_partkey,
                   l_suppkey + k * {R_SUPP} AS l_suppkey,
                   l_linenumber, l_quantity, l_extendedprice, l_discount,
                   l_tax, l_returnflag, l_linestatus, l_shipdate
            FROM '{SRC}/lineitem.parquet' CROSS JOIN ks""",
        "orders": f"""
            SELECT o_orderkey + k * {R_ORDER} AS o_orderkey,
                   o_custkey + k * {R_CUST} AS o_custkey,
                   o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
            FROM '{SRC}/orders.parquet' CROSS JOIN ks""",
        "customer": f"""
            SELECT c_custkey + k * {R_CUST} AS c_custkey,
                   'Customer#' || lpad(CAST(c_custkey + k * {R_CUST} AS VARCHAR), 9, '0') AS c_name,
                   c_nationkey, c_acctbal, c_mktsegment
            FROM '{SRC}/customer.parquet' CROSS JOIN ks""",
        # supplier rides along for the catalog stats some queries read
        # from dimension-table footers (e.g. pagerank's broadcast gate,
        # queries/webscale.py:_pr_node_bound) — without it those queries
        # measure the conservative no-stats path at sf1, not the plan a
        # real catalog would produce.
        "supplier": f"""
            SELECT s_suppkey + k * {R_SUPP} AS s_suppkey,
                   'Supplier#' || lpad(CAST(s_suppkey + k * {R_SUPP} AS VARCHAR), 9, '0') AS s_name,
                   s_nationkey, s_acctbal
            FROM '{SRC}/supplier.parquet' CROSS JOIN ks""",
        # events: shift user_id, keep the timestamp axis — every window
        # (tumbling hour, 7-day range, session gap) then holds 10x rows
        # from 10x users at UNCHANGED per-user density, which is how an
        # event stream actually grows; shifting ts instead would scale
        # the time axis and leave per-window cost constant (measuring
        # nothing).
        "events": f"""
            SELECT event_id + k * {R_EVENT} AS event_id, ts,
                   user_id + k * {R_USER} AS user_id,
                   event_type, value, props
            FROM '{SRC}/events.parquet' CROSS JOIN ks""",
        # embeddings are generated AFTER this loop by embeddings_scaled
        # (signed-permutation copies). The old inline job perturbed ONE
        # vec_id-dependent dimension per copy — enough to avoid exact
        # kNN clones, but sign-LSH band signatures were UNCHANGED across
        # copies (one dimension flips at most one bit), so every copy of
        # a base vector was a true mutual near-dup: candidate pairs and
        # true pairs grew QUADRATICALLY in the copy count (r13 stage
        # probe: 28.8x candidates on 10x data). The sf10_full ANN rows
        # were measuring that corpus artifact, not the engine — exactly
        # the failure mode embeddings_scaled's docstring documents and
        # its orthogonal transform avoids (true pairs grow linearly).
        "part": f"""
            SELECT p_partkey + k * {R_PART} AS p_partkey,
                   'Part#' || lpad(CAST(p_partkey + k * {R_PART} AS VARCHAR), 9, '0') AS p_name,
                   p_brand, p_type, p_size, p_retailprice
            FROM '{SRC}/part.parquet' CROSS JOIN ks""",
        # region/nation are static dimensions in every TPC-H scale
        # model — copied verbatim so dim-broadcast joins stay honest.
        "region": f"SELECT * FROM '{SRC}/region.parquet'",
        "nation": f"SELECT * FROM '{SRC}/nation.parquet'",
        "documents": f"""
            SELECT doc_id + k * {R_DOC} AS doc_id,
                   CASE WHEN k = 0 THEN text
                        ELSE regexp_replace(text, '(\\S+)', '\\1' || CAST(k AS VARCHAR), 'g')
                   END AS text,
                   lang, source,
                   CASE WHEN k = 0 THEN n_chars
                        ELSE length(regexp_replace(text, '(\\S+)', '\\1' || CAST(k AS VARCHAR), 'g'))
                   END AS n_chars
            FROM '{SRC}/documents.parquet' CROSS JOIN ks""",
    }
    if skip_documents:
        # the sf10-full dir carries the fixed-width-suffix documents
        # from documents_sf10 (every copy suffixed, so the committed
        # sf10_documents scaling block stays byte-comparable); don't
        # overwrite it with this generator's copy-0-verbatim variant
        del jobs["documents"]
    for table, sql in jobs.items():
        dst = os.path.join(out_dir, f"{table}.parquet")
        con.execute(f"COPY ({sql}) TO '{dst}' (FORMAT PARQUET)")
        n = con.execute(f"SELECT count(*) FROM '{dst}'").fetchone()[0]
        print(f"{table}: {n} rows -> {dst}", flush=True)
    embeddings_scaled(out_dir, copies)


def documents_sf10(out_dir: str, copies: int = 100, width: int = 2) -> None:
    """Third-decade documents table: `copies` key-shifted copies of the
    driver sf0.1 documents (sf10 at copies=100, ~10x the sf1 corpus).
    Every token is suffixed with the FIXED-WIDTH zero-padded copy
    number — fixed width means two tokens from different copies can
    never collide (equal strings would need equal suffixes => same
    copy), so cross-copy documents share zero word-3-gram shingles and
    zero exact substrings; the within-copy duplicate/span structure is
    preserved exactly. Copy 00 keeps a suffix too (unlike make-sf1's
    copy 0) so every copy pays identical per-token costs — the
    sf1-vs-sf10 ratio then compares structurally identical corpora.
    Width defaults to 2 (pinned for every copy count <= 100 so the
    committed third-decade blocks stay byte-comparable); the
    fourth-decade corpora pass width=3 on BOTH sides of their compare —
    a ratio is only a pure 10x-rows effect when the two corpora carry
    identical per-token suffix cost."""
    assert copies <= 10**width, (copies, width)
    os.makedirs(out_dir, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW ks AS SELECT unnest(range({copies})) AS k")
    lo, hi = con.execute(
        f"SELECT min(doc_id), max(doc_id) FROM '{SRC}/documents.parquet'"
    ).fetchone()
    if lo < 0 or hi >= R_DOC:
        raise SystemExit(f"make_sf1: doc_id range [{lo},{hi}] outside [0,{R_DOC})")
    sql = f"""
        SELECT doc_id + k * {R_DOC} AS doc_id,
               regexp_replace(text, '(\\S+)',
                   '\\1' || lpad(CAST(k AS VARCHAR), {width}, '0'), 'g') AS text,
               lang, source,
               length(regexp_replace(text, '(\\S+)',
                   '\\1' || lpad(CAST(k AS VARCHAR), {width}, '0'), 'g')) AS n_chars
        FROM '{SRC}/documents.parquet' CROSS JOIN ks"""
    dst = os.path.join(out_dir, "documents.parquet")
    con.execute(f"COPY ({sql}) TO '{dst}' (FORMAT PARQUET)")
    n = con.execute(f"SELECT count(*) FROM '{dst}'").fetchone()[0]
    print(f"documents: {n} rows -> {dst}", flush=True)


def embeddings_scaled(out_dir: str, copies: int) -> None:
    """`copies` copies of the driver sf0.1 embeddings under a PER-COPY
    SIGNED PERMUTATION of the 64 dimensions — the embedding analogue of
    the documents generator's fixed-width token suffix. A signed
    permutation is orthogonal, so every copy's WITHIN-copy cosine
    structure (and hence its near-dup pair set) is preserved exactly,
    while cross-copy cosines collapse to ~N(0, 1/64) — far below any
    near-dup threshold — so true pairs grow LINEARLY with copies.
    (A first attempt perturbed one dimension by k*0.01 like main(): at
    1000 copies that makes all copies of a base vector mutual near-dups
    — ~1e9 TRUE output pairs, a quadratic corpus artifact that filled
    74 GB of shuffle before the engine ever got to show its shape.)
    Permutation: dim i -> (i * p_k) mod 64 with p_k odd (coprime to 64,
    a bijection); sign flip from a hash bit of (k, i). Copy 0 is the
    identity (byte-identical to the driver table).
    Used by --sf100-documents for the fourth embedding decade (2M
    vectors at copies=1000; the 200k twin from the same generator)."""
    os.makedirs(out_dir, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW ks AS SELECT unnest(range({copies})) AS k")
    sql = f"""
        SELECT vec_id + k * {R_VEC} AS vec_id,
               CASE WHEN k = 0 THEN embedding
                    ELSE list_transform(
                        range(1, 65),
                        i -> CAST(embedding[1 + ((i - 1) * (2 * k + 1)) % 64]
                             * (CASE WHEN (hash(k * 64 + i) & 1) = 1
                                THEN -1 ELSE 1 END) AS FLOAT))
               END AS embedding,
               label
        FROM '{SRC}/embeddings.parquet' CROSS JOIN ks"""
    dst = os.path.join(out_dir, "embeddings.parquet")
    con.execute(f"COPY ({sql}) TO '{dst}' (FORMAT PARQUET)")
    n = con.execute(f"SELECT count(*) FROM '{dst}'").fetchone()[0]
    print(f"embeddings: {n} rows -> {dst}", flush=True)


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    if "--sf10-documents" in sys.argv[1:]:
        # both sides of the third-decade compare, same generator
        documents_sf10(args[0] if args else "/root/repo/.localdata/sf10", copies=100)
        documents_sf10(
            args[1] if len(args) > 1 else "/root/repo/.localdata/sf1d", copies=10
        )
    elif "--sf100-documents" in sys.argv[1:]:
        # fourth decade for the text family: 1000 vs 100 token-suffixed
        # copies (5M vs 500k docs), BOTH at suffix width 3 so the ratio
        # is a pure 10x-rows effect (the width-2 sf10 corpus is not
        # byte-comparable to a width-3 sf100 one)
        documents_sf10(
            args[0] if args else "/root/repo/.localdata/sf100d", copies=1000, width=3
        )
        documents_sf10(
            args[1] if len(args) > 1 else "/root/repo/.localdata/sf10dw3",
            copies=100,
            width=3,
        )
        # fourth embedding decade alongside: 2M vs 200k perturbed vectors
        embeddings_scaled(args[0] if args else "/root/repo/.localdata/sf100d", 1000)
        embeddings_scaled(
            args[1] if len(args) > 1 else "/root/repo/.localdata/sf10dw3", 100
        )
    elif "--sf100-probe" in sys.argv[1:]:
        # FOURTH decade for the worst sf10_full ratios (r12 verdict
        # item #7): only the tables those probes read — lineitem 600M /
        # orders 150M (pagerank), events 100M (typed-state totals),
        # embeddings 2M via the signed-permutation generator (knn PQ;
        # same generator as sf100d so within-copy cosine structure is
        # preserved and near-dup counts grow linearly). ~17 GB, the
        # full star schema at 1000 copies would be 10x that for tables
        # no probe reads.
        out = args[0] if args else "/root/repo/.localdata/sf100p"
        os.makedirs(out, exist_ok=True)
        con = duckdb.connect()
        # at 600M output rows, order-preserving COPY buffers the whole
        # result in memory (observed: 44 GB RSS, single-threaded) —
        # row order is meaningless in these synthetic tables, so let
        # the COPY stream in parallel instead
        con.execute("SET preserve_insertion_order = false")
        con.execute("CREATE VIEW ks AS SELECT unnest(range(1000)) AS k")
        probe_jobs = {
            "lineitem": f"""
                SELECT l_orderkey + k * {R_ORDER} AS l_orderkey,
                       l_partkey + k * {R_PART} AS l_partkey,
                       l_suppkey + k * {R_SUPP} AS l_suppkey,
                       l_linenumber, l_quantity, l_extendedprice, l_discount,
                       l_tax, l_returnflag, l_linestatus, l_shipdate
                FROM '{SRC}/lineitem.parquet' CROSS JOIN ks""",
            "orders": f"""
                SELECT o_orderkey + k * {R_ORDER} AS o_orderkey,
                       o_custkey + k * {R_CUST} AS o_custkey,
                       o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
                FROM '{SRC}/orders.parquet' CROSS JOIN ks""",
            "events": f"""
                SELECT event_id + k * {R_EVENT} AS event_id, ts,
                       user_id + k * {R_USER} AS user_id,
                       event_type, value, props
                FROM '{SRC}/events.parquet' CROSS JOIN ks""",
            # customer/supplier ride along (tiny: 15M + 1M rows) so the
            # pagerank broadcast gate (queries/webscale.py:_pr_node_bound)
            # reads REAL footer stats at this decade instead of hitting
            # the missing-file sentinel — without them the sf10->sf100
            # ratio silently embeds a stats-failure-driven plan flip.
            "customer": f"""
                SELECT c_custkey + k * {R_CUST} AS c_custkey,
                       'Customer#' || lpad(CAST(c_custkey + k * {R_CUST} AS VARCHAR), 9, '0') AS c_name,
                       c_nationkey, c_acctbal, c_mktsegment
                FROM '{SRC}/customer.parquet' CROSS JOIN ks""",
            "supplier": f"""
                SELECT s_suppkey + k * {R_SUPP} AS s_suppkey,
                       'Supplier#' || lpad(CAST(s_suppkey + k * {R_SUPP} AS VARCHAR), 9, '0') AS s_name,
                       s_nationkey, s_acctbal
                FROM '{SRC}/supplier.parquet' CROSS JOIN ks""",
        }
        for table, sql in probe_jobs.items():
            dst = os.path.join(out, f"{table}.parquet")
            con.execute(f"COPY ({sql}) TO '{dst}' (FORMAT PARQUET)")
            n = con.execute(f"SELECT count(*) FROM '{dst}'").fetchone()[0]
            print(f"{table}: {n} rows -> {dst}", flush=True)
        embeddings_scaled(out, 1000)
    elif "--sf10-full" in sys.argv[1:]:
        # full star schema + events + embeddings at 100 copies of the
        # driver sf0.1 (round-9 verdict #3: STRESS_SF10 skipped 131/246
        # queries for missing tables — the join/events families had no
        # third-decade evidence, and the spans OOM proves that class of
        # bug only shows up there). Documents keep the fixed-width
        # suffix corpus from --sf10-documents; regenerate it first if
        # absent so the mode is self-contained.
        out = args[0] if args else "/root/repo/.localdata/sf10"
        if not os.path.exists(os.path.join(out, "documents.parquet")):
            documents_sf10(out, copies=100)
        main(out, copies=100, skip_documents=True)
    else:
        main(args[0] if args else "/root/repo/.localdata/sf1")
