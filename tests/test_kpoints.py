"""k-point mesh / path operators (operators/kpoints.py; reference
matdb/kpoints.py:24-176 re-derived from the public Monkhorst–Pack
construction and published fcc special points)."""

from fractions import Fraction

from pyspark.sql import functions as F

from tracy_matdb_spark.operators.kpoints import (
    FCC_PATH,
    PATH_DEN,
    kpath_points,
    mp_mesh,
    spacing_divisions,
)


def _mesh_fracs(rows):
    return {
        tuple(Fraction(r[f"k{i}_num"], r[f"k{i}_den"]) for i in (1, 2, 3)) for r in rows
    }


def test_mp_mesh_classic_2x2x2(spark):
    divided = spark.createDataFrame([(2, 2, 2)], "q1 int, q2 int, q3 int")
    rows = mp_mesh(divided).collect()
    # the canonical MP 2x2x2 mesh: (+-1/4, +-1/4, +-1/4)
    assert _mesh_fracs(rows) == {
        (sx * Fraction(1, 4), sy * Fraction(1, 4), sz * Fraction(1, 4))
        for sx in (1, -1)
        for sy in (1, -1)
        for sz in (1, -1)
    }
    assert all(abs(r["weight"] - 0.125) < 1e-15 for r in rows)


def test_mp_mesh_odd_contains_gamma(spark):
    divided = spark.createDataFrame([(3, 3, 3)], "q1 int, q2 int, q3 int")
    fr = _mesh_fracs(mp_mesh(divided).collect())
    assert (Fraction(0), Fraction(0), Fraction(0)) in fr  # odd q hits Gamma
    assert len(fr) == 27


def test_gamma_centered_always_contains_gamma(spark):
    divided = spark.createDataFrame([(2, 2, 2)], "q1 int, q2 int, q3 int")
    fr = _mesh_fracs(mp_mesh(divided, gamma_centered=True).collect())
    assert (Fraction(0), Fraction(0), Fraction(0)) in fr
    assert len(fr) == 8


def test_spacing_divisions_monotone_and_floor(spark):
    cells = spark.createDataFrame(
        [("a", 3.0, 3.0, 30.0, 0.4), ("b", 3.0, 3.0, 30.0, 0.2)],
        "case_id string, l1 double, l2 double, l3 double, spacing double",
    )
    out = {r["case_id"]: (r["q1"], r["q2"], r["q3"]) for r in spacing_divisions(cells).collect()}
    # halving the spacing cannot decrease any division; long axes floor at 1
    assert all(qa <= qb for qa, qb in zip(out["a"], out["b"]))
    assert out["a"][2] == 1  # 2*pi/30 = 0.209 < 0.4 -> max(1, ceil(0.52)) = 1


def test_kpath_endpoints_exact(spark):
    rows = kpath_points(spark).collect()
    by_pos = {(r["segment"], r["step"]): (r["kx_q"], r["ky_q"], r["kz_q"]) for r in rows}
    for seg, (name, p) in enumerate(FCC_PATH[:-1]):
        assert by_pos[(seg, 0)] == tuple(int(Fraction(x) * PATH_DEN) for x in p)
    last = len(FCC_PATH) - 2
    assert by_pos[(last, 4)] == tuple(
        int(Fraction(x) * PATH_DEN) for x in FCC_PATH[-1][1]
    )
    # legs are labeled from the endpoint names
    legs = {r["segment"]: r["leg"] for r in rows}
    assert legs[0] == "G-X" and legs[last] == "G-L"


def test_mesh_plan_is_narrow(spark):
    """The mesh explode must stay shuffle-free (a narrow per-row
    transformation of the structure table at scale)."""
    divided = spark.createDataFrame([(4, 4, 4)], "q1 int, q2 int, q3 int")
    plan = mp_mesh(divided)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
