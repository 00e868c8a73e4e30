"""Semantic invariants for the sketch/sampling/modeling operators.
Value parity vs DuckDB is covered by test_parity; these pin the
mathematical guarantees parity can't express.
"""

from __future__ import annotations

from tests.conftest import SF_SMOKE
from tracy_matdb_spark.queries import load_all
from tracy_matdb_spark.queries.sketches import CM_TOP, PPLX_TOP, WS_N

REGISTRY = load_all()


def test_countmin_never_undercounts(spark):
    """The count-min guarantee: estimate >= exact, always (the sketch
    only ever adds colliding mass)."""
    pdf = REGISTRY["countmin_heavy_hitters"].fn(spark, SF_SMOKE).toPandas()
    assert len(pdf) == CM_TOP
    assert (pdf.overcount >= 0).all()
    assert (pdf.n_est >= pdf.n_exact).all()
    # the deliberately narrow width must actually exercise collisions
    assert pdf.overcount.sum() > 0


def test_markov_rows_are_distributions(spark):
    """Per from_type, micro-probabilities must sum to ~1 (floor loss
    bounded by the number of outgoing cells)."""
    pdf = REGISTRY["markov_event_transitions"].fn(spark, SF_SMOKE).toPandas()
    assert len(pdf) > 0
    for _, g in pdf.groupby("from_type"):
        s = g.microprob.sum()
        assert 1_000_000 - len(g) <= s <= 1_000_000


def test_weighted_sample_is_reproducible_subset(spark):
    """Deterministic ES sampling: same N rows both runs, all positive
    weights."""
    q = REGISTRY["weighted_sample_docs"]
    a = q.fn(spark, SF_SMOKE).toPandas()
    b = q.fn(spark, SF_SMOKE).toPandas()
    assert len(a) == WS_N
    assert sorted(a.doc_id) == sorted(b.doc_id)
    assert (a.n_chars > 0).all()


def test_ols_slope_matches_numpy(spark):
    """Closed-form moments must agree with an independent lstsq fit."""
    import numpy as np

    pdf = REGISTRY["ols_qty_price_by_flag"].fn(spark, SF_SMOKE).toPandas()
    import duckdb

    con = duckdb.connect()
    for _, row in pdf.iterrows():
        x, y = con.execute(
            f"SELECT list(l_quantity), list(l_extendedprice) FROM "
            f"read_parquet('{SF_SMOKE}/lineitem.parquet') WHERE l_returnflag = ?",
            [row.l_returnflag],
        ).fetchone()
        slope, intercept = np.polyfit(np.array(x, float), np.array(y, float), 1)
        assert abs(row.slope_ppm / 1e6 - slope) < 1e-3 * max(1.0, abs(slope))
        assert abs(row.intercept_floor - intercept) <= 1.0 + 1e-6 * abs(intercept)


def test_perplexity_scores_are_positive_and_bounded(spark):
    """MLE bigram log-probs are <= 0, so mean negative log-prob must be
    > 0; and no doc can beat ln(1) = 0 (a doc of all-unique transitions
    seen once still has p <= 1)."""
    pdf = REGISTRY["bigram_perplexity"].fn(spark, SF_SMOKE).toPandas()
    assert len(pdf) == PPLX_TOP
    assert (pdf.neg_logp_ppm >= 0).all()
    assert (pdf.n_bigrams > 0).all()
