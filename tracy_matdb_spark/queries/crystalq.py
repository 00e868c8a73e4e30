"""CORRECTNESS registrations for the crystal-math UDF library.

Oracle strategy:
- primitive_roundtrip: structures are CONSTRUCTED by decompressing known
  primitives through known HNFs, so every output quantity (supercell
  atom count, recovered primitive volume/atom count, HNF determinant) is
  ground-truth arithmetic on the fixture literals.
- hessian_roll_unroll: the Hessian is a closed-form function of its
  indices (h[r][c] = (r*31 + c)/8, dyadic-exact); DuckDB recomputes the
  phonopy block sums directly from that formula via generate_series —
  fully independent of the numpy roll/unroll.
- optimal_supercell: DuckDB re-derives the entire search in SQL — HNF
  enumeration, superlattice S = H @ L_fcc, rmin^2 by bounded integer
  short-vector search, point-group order by testing all 48 cubic ops
  through a closed-form 3x3 inverse — and picks the same
  (rmin^2 desc, pg desc, lex) winner per determinant. All arithmetic on
  dyadic rationals, so float comparisons are exact.
"""

from __future__ import annotations

from itertools import permutations, product

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tracy_matdb_spark.queries import register

# ---------------------------------------------------------------------------
# make_primitive / decompress round-trip (operators/crystalmath.py;
# reference database/utility.py:240-381, 525-565)
# ---------------------------------------------------------------------------

PRIM_CASES = [
    # (case_id, prim cell rows, frac basis, types, hnf diag)
    ("b2_221", [[1.0, 0, 0], [0, 1.0, 0], [0, 0, 1.0]],
     [[0.0, 0.0, 0.0], [0.5, 0.5, 0.5]], ["A", "B"], (2, 2, 1)),
    ("fcc_122", [[0.5, 0.5, 0.0], [0.5, 0.0, 0.5], [0.0, 0.5, 0.5]],
     [[0.0, 0.0, 0.0]], ["A"], (1, 2, 2)),
    ("sc_311", [[1.0, 0, 0], [0, 1.0, 0], [0, 0, 1.0]],
     [[0.0, 0.0, 0.0]], ["A"], (3, 1, 1)),
]


@register(
    "primitive_roundtrip",
    oracle="""
    SELECT * FROM (VALUES
        ('b2_221', 8, 1.0, 2, 4),
        ('fcc_122', 4, 0.25, 1, 4),
        ('sc_311', 3, 1.0, 1, 3)
    ) t(case_id, n_super, prim_vol, n_prim, hnf_det)
    ORDER BY case_id
    """,
    doc="decompress(prim, hnf) -> make_primitive recovers the primitive "
    "cell and HNF determinant exactly (database/utility.py:240-381, "
    "525-565)",
)
def primitive_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tracy_matdb_spark.operators.crystalmath import decompress, make_primitive

    rows = []
    for case_id, prim, basis, types, diag in PRIM_CASES:
        hnf = np.diag(diag)
        lat, pos, t2 = decompress(prim, basis, types, hnf)
        p_cell, p_frac, p_types, p_hnf = make_primitive(lat, pos, t2)
        rows.append(
            (
                case_id,
                len(pos),
                float(abs(np.linalg.det(p_cell))),
                len(p_types),
                int(round(abs(np.linalg.det(p_hnf)))),
            )
        )
    return spark.createDataFrame(
        rows, "case_id string, n_super int, prim_vol double, n_prim int, hnf_det int"
    ).orderBy("case_id")


# ---------------------------------------------------------------------------
# Hessian roll/unroll (operators/crystalmath.py; reference hessian.py:37-62)
# ---------------------------------------------------------------------------

HESS_N = 2  # atoms -> 6x6 Hessian, h[r][c] = (r*31 + c)/8


@register(
    "hessian_roll_unroll",
    oracle=f"""
    SELECT i.i, j.j,
           sum((r.r * 31 + c.c) / 8.0) AS block_sum,
           true AS roundtrip_ok
    FROM (SELECT unnest(generate_series(0, {HESS_N - 1})) AS i) i
    CROSS JOIN (SELECT unnest(generate_series(0, {HESS_N - 1})) AS j) j
    JOIN (SELECT unnest(generate_series(0, {3 * HESS_N - 1})) AS r) r
      ON r.r >= i.i * 3 AND r.r < i.i * 3 + 3
    JOIN (SELECT unnest(generate_series(0, {3 * HESS_N - 1})) AS c) c
      ON c.c >= j.j * 3 AND c.c < j.j * 3 + 3
    GROUP BY i.i, j.j
    ORDER BY i.i, j.j
    """,
    doc="Hessian (3n x 3n) <-> phonopy (n,n,3,3) roll/unroll; block sums "
    "recomputed by DuckDB from the closed-form entries "
    "(matdb/database/hessian.py:37-62)",
)
def hessian_roll_unroll(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tracy_matdb_spark.operators.crystalmath import roll_fc, unroll_fc

    h = np.array(
        [[(r * 31 + c) / 8.0 for c in range(3 * HESS_N)] for r in range(3 * HESS_N)]
    )
    fc = roll_fc(h)
    ok = bool(np.array_equal(unroll_fc(fc), h))
    rows = [
        (i, j, float(fc[i, j].sum()), ok) for i in range(HESS_N) for j in range(HESS_N)
    ]
    return spark.createDataFrame(
        rows, "i int, j int, block_sum double, roundtrip_ok boolean"
    ).orderBy("i", "j")


# ---------------------------------------------------------------------------
# optimal supercell search (operators/crystalmath.py; reference
# transforms.py:54-99)
# ---------------------------------------------------------------------------

FCC = [[0.5, 0.5, 0.0], [0.5, 0.0, 0.5], [0.0, 0.5, 0.5]]
SUPER_MAX_DET = 4
SUPER_REACH = 2


def _optimal_supercell_oracle() -> str:
    """Generate the full search in SQL (see module docstring)."""
    from tracy_matdb_spark.operators.crystal import hnf_oracle_sql

    L = FCC
    # superlattice rows S = H @ L as SQL expressions over a..f
    s_expr = {}
    hrows = [["a", None, None], ["b", "c", None], ["d", "e", "f"]]
    for i in range(3):
        for j in range(3):
            terms = []
            for k in range(3):
                coef = hrows[i][k]
                if coef is None or L[k][j] == 0.0:
                    continue
                terms.append(f"{coef} * {L[k][j]!r}")
            s_expr[(i, j)] = "(" + (" + ".join(terms) if terms else "0.0") + ")"
    s_cols = ",\n           ".join(f"{s_expr[(i, j)]} AS s{i}{j}" for i in range(3) for j in range(3))

    # det(S) and inverse entries (cofactor / det)
    def cof(i, j):
        r = [x for x in range(3) if x != i]
        c = [x for x in range(3) if x != j]
        sgn = "" if (i + j) % 2 == 0 else "-"
        return (
            f"{sgn}(s{r[0]}{c[0]} * s{r[1]}{c[1]} - s{r[0]}{c[1]} * s{r[1]}{c[0]})"
        )

    det_s = (
        "(s00 * (s11 * s22 - s12 * s21) - s01 * (s10 * s22 - s12 * s20)"
        " + s02 * (s10 * s21 - s11 * s20))"
    )
    inv_cols = ",\n           ".join(
        f"({cof(j, i)}) / dets AS v{i}{j}" for i in range(3) for j in range(3)
    )

    # the 48 cubic ops as literal rows
    ops_rows = []
    for p in permutations(range(3)):
        for signs in product((1, -1), repeat=3):
            r = [[0] * 3 for _ in range(3)]
            for row in range(3):
                r[row][p[row]] = signs[row]
            ops_rows.append("(" + ", ".join(str(v) for row in r for v in row) + ")")
    ops_values = ", ".join(ops_rows)
    ops_cols = ", ".join(f"r{i}{j}" for i in range(3) for j in range(3))

    # M = S R S^-1 entries; integrality condition
    m_conds = []
    for i in range(3):
        for j in range(3):
            terms = [
                f"s{i}{k} * r{k}{l} * v{l}{j}" for k in range(3) for l in range(3)
            ]
            m = "(" + " + ".join(terms) + ")"
            m_conds.append(f"abs({m} - round({m})) < 1e-9")
    int_cond = " AND ".join(m_conds)

    return f"""
    WITH hnfs AS ({hnf_oracle_sql(SUPER_MAX_DET)}),
    s AS (
        SELECT det, a, b, c, d, e, f,
           {s_cols}
        FROM hnfs
    ),
    rmin AS (
        SELECT det, a, b, c, d, e, f,
               min((i.i * s00 + j.j * s10 + k.k * s20) * (i.i * s00 + j.j * s10 + k.k * s20)
                 + (i.i * s01 + j.j * s11 + k.k * s21) * (i.i * s01 + j.j * s11 + k.k * s21)
                 + (i.i * s02 + j.j * s12 + k.k * s22) * (i.i * s02 + j.j * s12 + k.k * s22)) AS rmin2
        FROM s
        CROSS JOIN (SELECT unnest(generate_series({-SUPER_REACH}, {SUPER_REACH})) AS i) i
        CROSS JOIN (SELECT unnest(generate_series({-SUPER_REACH}, {SUPER_REACH})) AS j) j
        CROSS JOIN (SELECT unnest(generate_series({-SUPER_REACH}, {SUPER_REACH})) AS k) k
        WHERE NOT (i.i = 0 AND j.j = 0 AND k.k = 0)
        GROUP BY det, a, b, c, d, e, f
    ),
    sinv AS (
        SELECT *, {det_s} AS dets FROM s
    ),
    sinv2 AS (
        SELECT det, a, b, c, d, e, f,
           s00, s01, s02, s10, s11, s12, s20, s21, s22,
           {inv_cols}
        FROM sinv
    ),
    ops({ops_cols}) AS (VALUES {ops_values}),
    pg AS (
        SELECT det, a, b, c, d, e, f,
               cast(sum(CASE WHEN {int_cond} THEN 1 ELSE 0 END) as int) AS pg
        FROM sinv2 CROSS JOIN ops
        GROUP BY det, a, b, c, d, e, f
    ),
    ranked AS (
        SELECT rmin.det, rmin.a, rmin.b, rmin.c, rmin.d, rmin.e, rmin.f,
               rmin.rmin2, pg.pg,
               row_number() OVER (
                   PARTITION BY rmin.det
                   ORDER BY rmin.rmin2 DESC, pg.pg DESC,
                            rmin.a, rmin.b, rmin.c, rmin.d, rmin.e, rmin.f
               ) AS rk
        FROM rmin
        JOIN pg USING (det, a, b, c, d, e, f)
    )
    SELECT det, a, b, c, d, e, f, rmin2, pg
    FROM ranked WHERE rk = 1
    ORDER BY det
    """


@register(
    "optimal_supercell",
    oracle=_optimal_supercell_oracle(),
    doc="Best supercell per determinant over fcc: max rmin (shortest "
    "superlattice vector), tie-break by point-group order — DuckDB "
    "re-derives the whole search in SQL (transforms.py:54-99)",
)
def optimal_supercell(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tracy_matdb_spark.operators.crystalmath import optimal_supercells

    return optimal_supercells(spark, SUPER_MAX_DET, FCC, reach=SUPER_REACH)
