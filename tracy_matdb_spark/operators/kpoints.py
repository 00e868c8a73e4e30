"""k-point meshes and high-symmetry paths (SURVEY §2.10).

The reference delegates k-point generation to external services/libs —
`getKPoints` (Mueller server) and custom path logic in
matdb/kpoints.py:24-176. Those libraries are not public dependencies of
this engine, so the engine implements the two *algorithmic* pieces that
are textbook-public and covers the same call surface:

- Monkhorst–Pack meshes (Phys. Rev. B 13, 5188): fractional coordinate
  u_r = (2r - q - 1) / (2q) along each axis, r = 1..q; the
  gamma-centered variant uses u_r = r / q, r = 0..q-1. Spacing-driven
  division counts follow the VASP KSPACING convention:
  q_i = max(1, ceil(|b_i| / spacing)) with b_i the reciprocal vectors.
- High-symmetry paths: linear interpolation between published
  fractional special points (here the fcc path Γ-X-W-K-Γ-L).

Everything is exact rational arithmetic, expressed as JVM-side column
math over exploded sequences — no UDF, no external lib. Coordinates are
emitted as integer numerators over an integer denominator so the
correctness oracle is exact (no float hashing concerns).

Scale note: a mesh is tiny per structure but generated PER ROW of a
100 TB structure table — hence the explode-from-columns form, which is a
narrow (shuffle-free) transformation whatever the table size.
"""

from __future__ import annotations

from fractions import Fraction

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TWO_PI = 6.283185307179586

# fcc high-symmetry points in reciprocal-lattice fractions (standard
# published coordinates; denominators are dyadic or /8)
FCC_PATH = [
    ("G", (0, 0, 0)),
    ("X", (Fraction(1, 2), 0, Fraction(1, 2))),
    ("W", (Fraction(1, 2), Fraction(1, 4), Fraction(3, 4))),
    ("K", (Fraction(3, 8), Fraction(3, 8), Fraction(3, 4))),
    ("G", (0, 0, 0)),
    ("L", (Fraction(1, 2), Fraction(1, 2), Fraction(1, 2))),
]
PATH_DEN = 32  # lcm of point denominators (8) x interpolation steps (4)


def spacing_divisions(cells: DataFrame, spacing_col: str = "spacing") -> DataFrame:
    """Division counts q1..q3 from an orthorhombic cell (l1,l2,l3) and a
    target reciprocal spacing: q_i = max(1, ceil((2*pi/l_i) / spacing)).
    Column arithmetic only; identical expression shape in the oracle."""
    out = cells
    for i in (1, 2, 3):
        out = out.withColumn(
            f"q{i}",
            F.greatest(
                F.lit(1),
                F.ceil((F.lit(TWO_PI) / F.col(f"l{i}")) / F.col(spacing_col)).cast("int"),
            ),
        )
    return out


def mp_mesh(divided: DataFrame, gamma_centered: bool = False) -> DataFrame:
    """Explode (q1,q2,q3) into the full Monkhorst–Pack mesh. Each axis
    contributes numerator n_i over denominator d_i:
      MP:    n = 2r - q - 1, d = 2q, r = 1..q
      gamma: n = r,          d = q,  r = 0..q-1
    Pure explode + integer math — narrow, codegen'd, no shuffle."""
    df = divided
    for i in (1, 2, 3):
        lo, hi = (0, F.col(f"q{i}") - 1) if gamma_centered else (1, F.col(f"q{i}"))
        df = df.withColumn(f"r{i}", F.explode(F.sequence(F.lit(lo) if isinstance(lo, int) else lo, hi)))
    cols = []
    for i in (1, 2, 3):
        if gamma_centered:
            num, den = F.col(f"r{i}"), F.col(f"q{i}")
        else:
            num, den = 2 * F.col(f"r{i}") - F.col(f"q{i}") - 1, 2 * F.col(f"q{i}")
        cols += [num.cast("int").alias(f"k{i}_num"), den.cast("int").alias(f"k{i}_den")]
    return df.select(
        *[c for c in divided.columns],
        *cols,
        (F.lit(1.0) / (F.col("q1") * F.col("q2") * F.col("q3"))).alias("weight"),
    )


def kpath_points(spark, path=FCC_PATH, steps: int = 4) -> DataFrame:
    """High-symmetry path: `steps` interpolated points per segment plus
    the final endpoint. Coordinates are exact integers over PATH_DEN.
    The driver-side literal table is tiny (a dim table by construction);
    per-structure use broadcast-joins it against the structure table."""
    rows = []
    for seg, ((n0, p0), (n1, p1)) in enumerate(zip(path[:-1], path[1:])):
        last_seg = seg == len(path) - 2
        for s in range(steps + (1 if last_seg else 0)):
            t = Fraction(s, steps)
            coords = [
                int((Fraction(a) + t * (Fraction(b) - Fraction(a))) * PATH_DEN)
                for a, b in zip(p0, p1)
            ]
            rows.append((seg, f"{n0}-{n1}", s, *coords))
    return spark.createDataFrame(
        rows,
        "segment int, leg string, step int, kx_q int, ky_q int, kz_q int",
    )
