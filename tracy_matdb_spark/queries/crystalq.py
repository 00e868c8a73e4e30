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


# ---------------------------------------------------------------------------
# k-point meshes + high-symmetry path (operators/kpoints.py; reference
# matdb/kpoints.py:24-176 — external Mueller/getKPoints service replaced by
# the public Monkhorst–Pack algorithm and published special points)
# ---------------------------------------------------------------------------

KP_CASES = [
    # (case_id, l1, l2, l3, spacing) — orthorhombic cells; chosen away
    # from ceil() boundaries so float rounding can't flip a division.
    ("cubic", 3.1, 3.1, 3.1, 0.5),
    ("ortho", 2.9, 4.3, 6.7, 0.45),
    ("slab", 3.3, 3.3, 30.0, 0.4),  # long axis -> max(1, ...) branch
]
TWO_PI = 6.283185307179586


def _kp_mesh_oracle() -> str:
    cases = ", ".join(f"('{c}', {l1}, {l2}, {l3}, {sp})" for c, l1, l2, l3, sp in KP_CASES)
    qexpr = {
        i: f"greatest(1, cast(ceil((cast({TWO_PI} as double) / l{i}) / spacing) as int))"
        for i in (1, 2, 3)
    }
    return f"""
    WITH cases(case_id, l1, l2, l3, spacing) AS (VALUES {cases}),
    q AS (
        SELECT case_id, {qexpr[1]} AS q1, {qexpr[2]} AS q2, {qexpr[3]} AS q3
        FROM cases
    )
    SELECT case_id, q1, q2, q3,
           cast(2 * r1.r - q1 - 1 as int) AS k1_num, cast(2 * q1 as int) AS k1_den,
           cast(2 * r2.r - q2 - 1 as int) AS k2_num, cast(2 * q2 as int) AS k2_den,
           cast(2 * r3.r - q3 - 1 as int) AS k3_num, cast(2 * q3 as int) AS k3_den,
           cast(1.0 as double) / (q1 * q2 * q3) AS weight
    FROM q
    JOIN (SELECT unnest(generate_series(1, 32)) AS r) r1 ON r1.r <= q1
    JOIN (SELECT unnest(generate_series(1, 32)) AS r) r2 ON r2.r <= q2
    JOIN (SELECT unnest(generate_series(1, 32)) AS r) r3 ON r3.r <= q3
    ORDER BY case_id, k1_num, k2_num, k3_num
    """


@register(
    "kpoint_mesh",
    oracle=_kp_mesh_oracle(),
    doc="Spacing-driven Monkhorst–Pack mesh: reciprocal lengths -> "
    "divisions (VASP KSPACING convention) -> exploded mesh fractions as "
    "exact integer numerators/denominators (matdb/kpoints.py:24-176)",
)
def kpoint_mesh(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tracy_matdb_spark.operators.kpoints import mp_mesh, spacing_divisions

    cells = spark.createDataFrame(
        KP_CASES, "case_id string, l1 double, l2 double, l3 double, spacing double"
    )
    mesh = mp_mesh(spacing_divisions(cells))
    return mesh.select(
        "case_id", "q1", "q2", "q3",
        "k1_num", "k1_den", "k2_num", "k2_den", "k3_num", "k3_den", "weight",
    ).orderBy("case_id", "k1_num", "k2_num", "k3_num")


@register(
    "kpoint_gamma_mesh",
    oracle="""
    SELECT cast(r1.r as int) AS k1_num, 2 AS k1_den,
           cast(r2.r as int) AS k2_num, 3 AS k2_den,
           cast(r3.r as int) AS k3_num, 4 AS k3_den,
           cast(1.0 as double) / 24 AS weight
    FROM (SELECT unnest(generate_series(0, 1)) AS r) r1
    CROSS JOIN (SELECT unnest(generate_series(0, 2)) AS r) r2
    CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS r) r3
    ORDER BY k1_num, k2_num, k3_num
    """,
    doc="Gamma-centered 2x3x4 mesh: u_r = r/q including the Gamma point "
    "(matdb/kpoints.py gamma branch)",
)
def kpoint_gamma_mesh(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tracy_matdb_spark.operators.kpoints import mp_mesh

    divided = spark.createDataFrame([(2, 3, 4)], "q1 int, q2 int, q3 int")
    return (
        mp_mesh(divided, gamma_centered=True)
        .select("k1_num", "k1_den", "k2_num", "k2_den", "k3_num", "k3_den", "weight")
        .orderBy("k1_num", "k2_num", "k3_num")
    )


def _kpath_oracle() -> str:
    from tracy_matdb_spark.operators.kpoints import FCC_PATH, PATH_DEN

    segs = []
    for seg, ((n0, p0), (n1, p1)) in enumerate(zip(FCC_PATH[:-1], FCC_PATH[1:])):
        from fractions import Fraction

        a = [int(Fraction(x) * PATH_DEN) for x in p0]
        b = [int(Fraction(x) * PATH_DEN) for x in p1]
        segs.append(f"({seg}, '{n0}-{n1}', {a[0]}, {a[1]}, {a[2]}, {b[0]}, {b[1]}, {b[2]})")
    last = len(FCC_PATH) - 2
    return f"""
    WITH segs(segment, leg, x0, y0, z0, x1, y1, z1) AS (VALUES {', '.join(segs)})
    SELECT segment, leg, cast(s.s as int) AS step,
           cast(x0 + s.s * (x1 - x0) / 4 as int) AS kx_q,
           cast(y0 + s.s * (y1 - y0) / 4 as int) AS ky_q,
           cast(z0 + s.s * (z1 - z0) / 4 as int) AS kz_q
    FROM segs
    JOIN (SELECT unnest(generate_series(0, 4)) AS s) s
      ON s.s < 4 OR segment = {last}
    ORDER BY segment, step
    """


@register(
    "kpoint_path_fcc",
    oracle=_kpath_oracle(),
    doc="fcc high-symmetry path Γ-X-W-K-Γ-L, 4 interpolation steps per "
    "segment, exact /32 integer fractions (matdb/kpoints.py path logic "
    "re-derived from published special points)",
)
def kpoint_path_fcc(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tracy_matdb_spark.operators.kpoints import kpath_points

    return kpath_points(spark).orderBy("segment", "step")


# ---------------------------------------------------------------------------
# Cell geometry characterization over generated configurations
# (reference reads these off ase.Atoms; here closed-form on the cell matrix)
# ---------------------------------------------------------------------------


def _geometry_exprs() -> list[str]:
    """Dialect-shared SQL snippets over cell columns c00..c22.

    Only +,*,/ and sqrt (IEEE correctly-rounded in both engines), so
    every output is bit-identical in Spark and DuckDB; angles are
    reported as cosines to avoid acos (not correctly-rounded)."""
    rows = {name: [f"c{i}0", f"c{i}1", f"c{i}2"] for name, i in (("a", 0), ("b", 1), ("c", 2))}
    sq = lambda v: " + ".join(f"{x}*{x}" for x in v)
    dot = lambda u, v: " + ".join(f"{x}*{y}" for x, y in zip(u, v))
    det = (
        "c00*(c11*c22 - c12*c21) - c01*(c10*c22 - c12*c20) + c02*(c10*c21 - c11*c20)"
    )
    # min-image nearest neighbor: min |i*a + j*b + k*c| over 13 non-antipodal
    # nonzero integer offsets (the other 13 are mirror images)
    offs = [
        (i, j, k)
        for i in (-1, 0, 1)
        for j in (-1, 0, 1)
        for k in (-1, 0, 1)
        if (i, j, k) > (0, 0, 0)
    ]
    terms = []
    for i, j, k in offs:
        comp = [
            f"({i}*c0{d} + {j}*c1{d} + {k}*c2{d})" for d in range(3)
        ]
        terms.append("(" + sq(comp) + ")")
    rmin2 = "least(" + ", ".join(terms) + ")"
    a, b, c = rows["a"], rows["b"], rows["c"]
    return [
        f"round(sqrt({sq(a)}), 6) AS len_a",
        f"round(sqrt({sq(b)}), 6) AS len_b",
        f"round(sqrt({sq(c)}), 6) AS len_c",
        f"round(({dot(b, c)}) / (sqrt({sq(b)}) * sqrt({sq(c)})), 6) AS cos_alpha",
        f"round(({dot(a, c)}) / (sqrt({sq(a)}) * sqrt({sq(c)})), 6) AS cos_beta",
        f"round(({dot(a, b)}) / (sqrt({sq(a)}) * sqrt({sq(b)})), 6) AS cos_gamma",
        f"round(abs({det}), 6) AS volume",
        f"round(sqrt({rmin2}), 6) AS rmin",
    ]


def _cell_geometry_oracle() -> str:
    from tracy_matdb_spark.operators.generators import distortion_oracle_sql

    return (
        f"SELECT seed_id, config_id, {', '.join(_geometry_exprs())} "
        f"FROM ({distortion_oracle_sql()}) d ORDER BY seed_id, config_id"
    )


@register(
    "cell_geometry",
    oracle=_cell_geometry_oracle(),
    doc="Lattice geometry characterization of every generated config: "
    "edge lengths, inter-axis cosines, cell volume, and the minimum-"
    "image nearest-neighbor distance rmin (the quantity the reference's "
    "optimal-supercell search maximizes, matdb/database/transforms.py:"
    "54-99, here closed-form over 13 non-antipodal integer offsets). "
    "Map-only codegen'd arithmetic appended to the distortion generator "
    "— zero additional shuffles; the oracle re-derives everything from "
    "the shared PRNG pipeline in DuckDB.",
)
def cell_geometry(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tracy_matdb_spark.operators.generators import distortion_generate

    d = distortion_generate(spark)
    return d.selectExpr("seed_id", "config_id", *_geometry_exprs()).orderBy(
        "seed_id", "config_id"
    )
