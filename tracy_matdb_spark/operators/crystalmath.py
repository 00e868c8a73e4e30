"""Crystal-math UDF library: primitive cells, decompression, Hessian
roll/unroll, optimal supercell selection.

Reference:
- `make_primitive` (matdb/database/utility.py:240-381): find fractional
  translations that preserve the motif, derive the primitive lattice,
  dedupe the basis, and return the HNF mapping primitive -> original.
- `hermite_normal_form` (…:383-496): integer HNF.
- `decompress` (…:525-565): tile a primitive cell by an HNF back into
  the full crystal.
- `roll_fc` / `unroll_fc` (matdb/database/hessian.py:37-62): 3n x 3n
  Hessian <-> phonopy (n, n, 3, 3) force-constant layout.
- optimal supercell search (matdb/transforms.py:54-99): among HNFs of a
  target determinant, pick the one with the largest minimal periodic
  distance (rmin), breaking ties by largest point-group order.

All of these are per-record numpy kernels — in the engine they run as
Arrow-batched pandas UDFs over configuration rows (one record = one
small crystal), so the work is embarrassingly parallel and the hot loop
never touches the driver. The optimal-supercell *search* is columnar
where possible: HNF candidates come from the codegen explode
(operators/crystal.py:28-47); only the per-HNF geometry scores (rmin^2,
point-group order) are UDF work, and the final pick is a native
max_by-style window.
"""

from __future__ import annotations

from itertools import combinations, permutations, product

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

EPS = 1e-3


# ---------------------------------------------------------------------------
# primitive cell
# ---------------------------------------------------------------------------


def _bring_into_cell(frac: np.ndarray, eps: float = EPS) -> np.ndarray:
    """Reduce fractional coordinates into [0, 1) with tolerance snapping."""
    f = frac - np.floor(frac)
    f[np.abs(f - 1.0) < eps] = 0.0
    f[np.abs(f) < eps] = 0.0
    return f


def hermite_normal_form(n: np.ndarray) -> np.ndarray:
    """Lower-triangular integer HNF of a nonsingular integer matrix via
    column operations (database/utility.py:383-496 semantics: H = n * B
    for unimodular B, H lower triangular, positive diagonal,
    0 <= H[i][j] < H[i][i] for j < i)."""
    h = np.rint(n).astype(np.int64).copy()
    if abs(round(float(np.linalg.det(h)))) == 0:
        raise ValueError("hermite_normal_form needs a nonsingular matrix")
    # eliminate above-diagonal entries per row (column ops only)
    for i in range(3):
        # bring a nonzero pivot into column i using columns >= i
        while True:
            nz = [j for j in range(i, 3) if h[i, j] != 0]
            pivot = min(nz, key=lambda j: abs(h[i, j]))
            if pivot != i:
                h[:, [i, pivot]] = h[:, [pivot, i]]
            done = True
            for j in range(i + 1, 3):
                if h[i, j] != 0:
                    q = h[i, j] // h[i, i]
                    h[:, j] -= q * h[:, i]
                    done = False
            if done and all(h[i, j] == 0 for j in range(i + 1, 3)):
                break
        if h[i, i] < 0:
            h[:, i] = -h[:, i]
    # normalize below-diagonal entries into [0, diag)
    for i in range(1, 3):
        for j in range(i):
            if h[i, i] != 0:
                q = h[i, j] // h[i, i]
                h[:, j] -= q * h[:, i]
    return h


def make_primitive(
    cell: list[list[float]] | np.ndarray,
    positions: list[list[float]] | np.ndarray,
    types: list[str],
    eps: float = EPS,
) -> tuple[np.ndarray, np.ndarray, list[str], np.ndarray]:
    """Primitive cell + HNF mapping it to the input crystal
    (database/utility.py:240-381). Rows of `cell` are lattice vectors;
    `positions` are cartesian. Returns (prim_cell, prim_frac_positions,
    prim_types, hnf) with hnf @ prim == cell up to integer combination."""
    a_vecs = np.asarray(cell, dtype=float)
    pos = np.asarray(positions, dtype=float)
    if len(types) == 0:
        raise ValueError("species information required for make_primitive")
    inv_cell = np.linalg.inv(a_vecs)
    frac = _bring_into_cell(pos @ inv_cell, eps)

    def mapped_to_motif(f: np.ndarray, t: str) -> bool:
        for g, tg in zip(frac, types):
            if tg == t and np.allclose(
                np.minimum(np.abs(f - g), 1 - np.abs(f - g)), 0, atol=eps
            ):
                return True
        return False

    # candidate fractional translations: differences to the first atom of
    # the same type (utility.py:289-310)
    fracts: list[np.ndarray] = []
    for i in range(1, len(types)):
        if types[i] != types[0]:
            continue
        t = _bring_into_cell(frac[i] - frac[0], eps)
        if all(mapped_to_motif(_bring_into_cell(frac[j] + t, eps), types[j]) for j in range(len(types))):
            fracts.append(t)

    if not fracts:
        prim = a_vecs
        prim_frac = frac
        prim_types = list(types)
        hnf = np.eye(3, dtype=np.int64)
        return prim, prim_frac, prim_types, hnf

    # lattice points: valid translations (cartesian) plus the cell vectors
    points = [t @ a_vecs for t in fracts] + [v for v in a_vecs]
    best = None
    for trio in combinations(points, 3):
        m = np.array(trio)
        det = abs(np.linalg.det(m))
        if det < eps:
            continue
        inv_m = np.linalg.inv(m)
        coeffs = np.array(points) @ inv_m
        if np.allclose(coeffs, np.rint(coeffs), atol=eps):
            if best is None or det < best[0] - eps:
                best = (det, m)
    if best is None:
        raise ValueError("no valid primitive basis found")
    prim = best[1]

    # re-express atoms in the primitive cell, dedupe identical sites
    inv_prim = np.linalg.inv(prim)
    new_frac = _bring_into_cell(pos @ inv_prim, eps)
    prim_frac_list: list[np.ndarray] = []
    prim_types = []
    for f, t in zip(new_frac, types):
        dup = any(
            tt == t and np.allclose(np.minimum(np.abs(f - g), 1 - np.abs(f - g)), 0, atol=eps)
            for g, tt in zip(prim_frac_list, prim_types)
        )
        if not dup:
            prim_frac_list.append(f)
            prim_types.append(t)
    prim_frac = np.array(prim_frac_list)

    # HNF relating primitive to the original cell (utility.py:377-381)
    n = np.rint(a_vecs @ np.linalg.inv(prim))
    hnf = hermite_normal_form(n.T).T  # rows convention
    return prim, prim_frac, prim_types, hnf


def decompress(
    prim: list[list[float]] | np.ndarray,
    frac_basis: list[list[float]] | np.ndarray,
    types: list[str],
    hnf: list[list[int]] | np.ndarray,
    eps: float = EPS,
) -> tuple[np.ndarray, np.ndarray, list[str]]:
    """Tile a primitive cell by an HNF back into the full crystal
    (database/utility.py:525-565): lattice = hnf @ prim (rows); each of
    the det(hnf) primitive translations replicates the basis."""
    prim = np.asarray(prim, dtype=float)
    hnf = np.rint(np.asarray(hnf)).astype(np.int64)
    frac_basis = np.asarray(frac_basis, dtype=float)
    lat = hnf @ prim
    inv_lat = np.linalg.inv(lat)
    cart_basis = frac_basis @ prim
    new_pos, new_types = [], []
    for a in range(hnf[0][0]):
        for b in range(hnf[1][1]):
            for c in range(hnf[2][2]):
                shift = a * prim[0] + b * prim[1] + c * prim[2]
                for t, cb in zip(types, cart_basis):
                    f = _bring_into_cell((cb + shift) @ inv_lat, eps)
                    new_pos.append(f @ lat)
                    new_types.append(t)
    vol_fact = int(hnf[0][0] * hnf[1][1] * hnf[2][2])
    if vol_fact * len(types) != len(new_pos):
        raise ValueError("decompression atom-count mismatch")
    return lat, np.array(new_pos), new_types


# ---------------------------------------------------------------------------
# Hessian roll / unroll (hessian.py:37-62)
# ---------------------------------------------------------------------------


def roll_fc(hessian: np.ndarray) -> np.ndarray:
    """(3n x 3n) Hessian -> phonopy (n, n, 3, 3) force constants."""
    n = hessian.shape[0] // 3
    out = np.zeros((n, n, 3, 3), dtype="double")
    for i in range(n):
        for j in range(n):
            out[i, j] = hessian[i * 3 : (i + 1) * 3, j * 3 : (j + 1) * 3]
    return out


def unroll_fc(fc: np.ndarray) -> np.ndarray:
    """phonopy (n, n, 3, 3) -> (3n x 3n) Hessian."""
    n = fc.shape[0]
    out = np.zeros((3 * n, 3 * n), dtype="double")
    for i in range(n):
        for j in range(n):
            out[i * 3 : (i + 1) * 3, j * 3 : (j + 1) * 3] = fc[i, j]
    return out


# ---------------------------------------------------------------------------
# optimal supercell search (transforms.py:54-99)
# ---------------------------------------------------------------------------

# the 48 signed permutation matrices = the cubic point group O_h
CUBIC_OPS = [
    np.array([[s0 * (p[0] == 0), s0 * (p[0] == 1), s0 * (p[0] == 2)],
              [s1 * (p[1] == 0), s1 * (p[1] == 1), s1 * (p[1] == 2)],
              [s2 * (p[2] == 0), s2 * (p[2] == 1), s2 * (p[2] == 2)]], dtype=float)
    for p in permutations(range(3))
    for s0, s1, s2 in product((1, -1), repeat=3)
]


def supercell_scores(hnf_rows: np.ndarray, lattice: np.ndarray, reach: int = 2) -> tuple[float, int]:
    """(rmin^2, point-group order) for the superlattice S = H @ L.

    rmin^2 = squared length of the shortest nonzero superlattice vector,
    found by bounded integer search over combinations in [-reach, reach]^3
    (exact for the small determinants structure searches use). Point
    group = number of cubic ops R with S R S^-1 integer (the superlattice
    symmetries inherited from the parent cubic lattice)."""
    s = hnf_rows @ lattice
    rmin2 = None
    for i, j, k in product(range(-reach, reach + 1), repeat=3):
        if i == j == k == 0:
            continue
        v = i * s[0] + j * s[1] + k * s[2]
        d2 = float(v @ v)
        if rmin2 is None or d2 < rmin2:
            rmin2 = d2
    inv_s = np.linalg.inv(s)
    pg = 0
    for r in CUBIC_OPS:
        m = s @ r @ inv_s
        if np.allclose(m, np.rint(m), atol=1e-9):
            pg += 1
    return rmin2, pg


def optimal_supercells(spark: SparkSession, max_det: int, lattice: list[list[float]], reach: int = 2) -> DataFrame:
    """Best HNF per determinant: largest rmin^2, then largest point-group
    order, then lexicographic (a,b,c,d,e,f) as the deterministic final
    tiebreak (transforms.py:92-97 picks max by (rmin, pg))."""
    from tracy_matdb_spark.operators.crystal import hnf_enumerate

    lat = np.asarray(lattice, dtype=float)

    def score_udf():
        @pandas_udf("struct<rmin2: double, pg: int>")
        def score(a: pd.Series, b: pd.Series, c: pd.Series, d: pd.Series, e: pd.Series, f: pd.Series) -> pd.DataFrame:
            r2s, pgs = [], []
            for av, bv, cv, dv, ev, fv in zip(a, b, c, d, e, f):
                h = np.array([[av, 0, 0], [bv, cv, 0], [dv, ev, fv]], dtype=float)
                r2, pg = supercell_scores(h, lat, reach)
                r2s.append(r2)
                pgs.append(pg)
            return pd.DataFrame({"rmin2": r2s, "pg": pgs})

        return score

    hnfs = hnf_enumerate(spark, max_det)
    scored = hnfs.withColumn("s", score_udf()("a", "b", "c", "d", "e", "f")).select(
        "det", "a", "b", "c", "d", "e", "f", F.col("s.rmin2").alias("rmin2"), F.col("s.pg").alias("pg")
    )
    w = Window.partitionBy("det").orderBy(
        F.col("rmin2").desc(), F.col("pg").desc(), "a", "b", "c", "d", "e", "f"
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .drop("rk")
        .orderBy("det")
    )
