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
        for seed_id, n in zip(pdf["seed_id"], pdf[n_atoms_col]):
            n = int(n)
            h = synth_hessian(str(seed_id), n)
            vals, vecs = np.linalg.eigh(h)
            k = 0
            for idx in range(3 * n):
                lam = float(vals[idx])
                if abs(lam) < ZERO_TOL:
                    continue  # drop translational modes
                vec = vecs[:, idx].reshape(n, 3)
                rows.append(
                    {
                        "seed_id": seed_id,
                        "n": n,
                        "eig_index": k,
                        "eigenvalue": lam,
                        "eigenvector": [list(map(float, row)) for row in vec],
                    }
                )
                k += 1
        return pd.DataFrame(rows, columns=[f.name for f in EIG_SCHEMA.fields])

    return seeds.groupBy("seed_id").applyInPandas(per_group, EIG_SCHEMA)


EXACT_SCHEMA = T.StructType(
    [
        T.StructField("seed_id", T.StringType()),
        T.StructField("n", T.IntegerType()),
        T.StructField("eig_index", T.IntegerType()),
        T.StructField("eigenvalue_r", T.DoubleType()),
        T.StructField("resid_ok", T.BooleanType()),
        T.StructField("unit_ok", T.BooleanType()),
    ]
)


def householder_hessian(n: int) -> tuple[np.ndarray, np.ndarray]:
    """Symmetric 3n x 3n matrix with a KNOWN spectrum: H = Q diag(lam) Q^T
    where Q = I - 2 w w^T / (w^T w) is a Householder reflection of the
    fixed vector w = [1..3n] and lam_i = i + 1.125 (dyadic, distinct,
    all above ZERO_TOL). eigh recovers lam to ~1e-13, so a 6-dp rounding
    is bit-stable — this makes the eigen UDTF *oracle-checkable* (the
    random-PSD variant in eigen_explode has no closed form).
    Returns (H, lam)."""
    m = 3 * n
    w = np.arange(1.0, m + 1.0)
    q = np.eye(m) - 2.0 * np.outer(w, w) / (w @ w)
    lam = np.arange(m) + 1.125
    return q @ np.diag(lam) @ q.T, lam


def eigen_exact_explode(seeds: DataFrame, n_atoms_col: str = "n_atoms") -> DataFrame:
    """Known-spectrum twin of eigen_explode: one row per eigenpair with
    the eigenvalue rounded at 6 dp plus residual/normalization checks
    (H v = lam v, |v| = 1), all verifiable by a closed-form oracle."""

    def per_group(pdf: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for seed_id, n in zip(pdf["seed_id"], pdf[n_atoms_col]):
            n = int(n)
            h, _ = householder_hessian(n)
            vals, vecs = np.linalg.eigh(h)
            for idx in range(3 * n):
                lam, v = float(vals[idx]), vecs[:, idx]
                rows.append(
                    {
                        "seed_id": seed_id,
                        "n": n,
                        "eig_index": idx,
                        "eigenvalue_r": round(lam, 6),
                        "resid_ok": bool(np.linalg.norm(h @ v - lam * v) < 1e-8),
                        "unit_ok": bool(abs(np.linalg.norm(v) - 1.0) < 1e-10),
                    }
                )
        return pd.DataFrame(rows, columns=[f.name for f in EXACT_SCHEMA.fields])

    return seeds.groupBy("seed_id").applyInPandas(per_group, EXACT_SCHEMA)


def dos_convergence_select(band_errors: DataFrame) -> DataFrame:
    """Best-supercell pick (hessian.py:341-380): per seed, the smallest
    supercell whose accumulated DOS error is under tolerance — min_by over
    a filtered aggregate."""
    ok = band_errors.filter(F.col("dos_err") < F.col("tolerance"))
    return ok.groupBy("seed_id").agg(
        F.expr("min_by(supercell_size, supercell_size)").alias("best_supercell"),
        F.min("supercell_size").alias("min_size"),
    )
