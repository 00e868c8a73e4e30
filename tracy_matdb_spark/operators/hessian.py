"""Hessian eigen-decomposition operator (the reference's UDTF showcase).

Reference (matdb/database/hessian.py): builds force-constant matrices
from displaced supercells, diagonalizes (np.linalg.eigh), then emits the
base config plus one row per (eigenvalue, eigenvector) pair, skipping
near-zero translational modes (hessian.py:243-269, 252-253).

Spark shape: grouped pandas UDF (applyInPandas) per configuration —
the eigensolve is dense linear algebra, exactly the sanctioned Python
slow-path — followed by a row explosion that Spark absorbs as ordinary
rows. Deterministic: the synthetic Hessian entries derive from a
counter-based seed (md5 of the config key), never from executor state,
so any partitioning/retry yields identical output.

Not SQL-expressible (no eigh in DuckDB) => registered rows-only; the
pytest oracle asserts eigen identities instead (H v = λ v, orthonormal
eigenbasis, trace preservation).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

EIG_SCHEMA = T.StructType(
    [
        T.StructField("seed_id", T.StringType()),
        T.StructField("n", T.IntegerType()),
        T.StructField("eig_index", T.IntegerType()),
        T.StructField("eigenvalue", T.DoubleType()),
        T.StructField("eigenvector", T.ArrayType(T.ArrayType(T.DoubleType()))),
    ]
)

ZERO_TOL = 1e-5  # hessian.py:252-253 skips |lambda| < tolerance


def _seed_int(key: str) -> int:
    return int(hashlib.md5(key.encode()).hexdigest()[:15], 16)


def synth_hessian(key: str, n: int) -> np.ndarray:
    """Deterministic symmetric PSD 3n x 3n matrix with 3 exact zero modes
    (mimics translational invariance: rows/cols sum to zero per axis)."""
    rng = np.random.default_rng(_seed_int(key))
    a = rng.standard_normal((3 * n, 3 * n))
    h = a @ a.T  # PSD
    # impose acoustic sum rule per axis block: H @ t_axis = 0
    for axis in range(3):
        t = np.zeros(3 * n)
        t[axis::3] = 1.0
        t /= np.linalg.norm(t)
        h -= np.outer(t, h @ t) + np.outer(h @ t, t) - np.outer(t, t) * (t @ h @ t)
        h -= np.outer(t, h @ t) + np.outer(h @ t, t)  # second pass for symmetry cleanup
        h = (h + h.T) / 2
    return h


def eigen_explode(seeds: DataFrame, n_atoms_col: str = "n_atoms") -> DataFrame:
    """(seed_id, n_atoms) -> one row per retained eigenpair."""

    def per_group(pdf: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for _, r in pdf.iterrows():
            n = int(r[n_atoms_col])
            h = synth_hessian(str(r["seed_id"]), n)
            vals, vecs = np.linalg.eigh(h)
            k = 0
            for idx in range(3 * n):
                lam = float(vals[idx])
                if abs(lam) < ZERO_TOL:
                    continue  # drop translational modes
                vec = vecs[:, idx].reshape(n, 3)
                rows.append(
                    {
                        "seed_id": r["seed_id"],
                        "n": n,
                        "eig_index": k,
                        "eigenvalue": lam,
                        "eigenvector": [list(map(float, row)) for row in vec],
                    }
                )
                k += 1
        return pd.DataFrame(rows, columns=[f.name for f in EIG_SCHEMA.fields])

    return seeds.groupBy("seed_id").applyInPandas(per_group, EIG_SCHEMA)


def dos_convergence_select(band_errors: DataFrame) -> DataFrame:
    """Best-supercell pick (hessian.py:341-380): per seed, the smallest
    supercell whose accumulated DOS error is under tolerance — min_by over
    a filtered aggregate."""
    ok = band_errors.filter(F.col("dos_err") < F.col("tolerance"))
    return ok.groupBy("seed_id").agg(
        F.expr("min_by(supercell_size, supercell_size)").alias("best_supercell"),
        F.min("supercell_size").alias("min_size"),
    )
