"""FQDN-keyed transform registry.

The reference lets YAML specs name arbitrary transform functions by
fully-qualified dotted name; every `create()` call resolves and applies
them to the new configuration (matdb/database/__init__.py:77-79,
822-826; `make_supercell` transform matdb/transforms.py:101-134).

Engine form: a transform is a DataFrame -> DataFrame function (so it
composes into the Catalyst plan instead of running per-record Python);
specs reference it by FQDN under a step's `transforms:` mapping and
`Pipeline._run_step` applies them in declaration order. Resolution is
plain importlib — any importable function qualifies, mirroring the
reference's open registry.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TransformFn = Callable[..., DataFrame]


def resolve_fqdn(name: str) -> TransformFn:
    """'pkg.module.fn' -> callable (database/__init__.py:77-79)."""
    mod_name, _, attr = name.rpartition(".")
    if not mod_name:
        raise ValueError(f"transform name {name!r} is not fully qualified")
    mod = importlib.import_module(mod_name)
    try:
        fn = getattr(mod, attr)
    except AttributeError as exc:
        raise ValueError(f"transform {name!r} not found") from exc
    if not callable(fn):
        raise ValueError(f"transform {name!r} is not callable")
    return fn


def apply_transforms(df: DataFrame, transforms: dict[str, dict] | None) -> DataFrame:
    """Apply each FQDN-named transform in declaration order
    (database/__init__.py:822-826)."""
    for name, args in (transforms or {}).items():
        df = resolve_fqdn(name)(df, **(args or {}))
    return df


def make_supercell(df: DataFrame, supercell: list[int] | None = None) -> DataFrame:
    """Built-in transform (matdb/transforms.py:101-134): scale the cell
    rows by a diagonal supercell and the atom count by its determinant.
    Operates on the columnar c00..c22 cell layout the generators emit."""
    from tracy_matdb_spark.operators.crystal import conform_supercell

    sc = conform_supercell(supercell or [1, 1, 1])
    if any(sc[j][k] != 0 for j in range(3) for k in range(3) if j != k):
        raise ValueError("make_supercell transform supports diagonal supercells")
    det = sc[0][0] * sc[1][1] * sc[2][2]
    prefix = "c" if "c00" in df.columns else "b"
    for j in range(3):
        for k in range(3):
            col = f"{prefix}{j}{k}"
            if col in df.columns:
                df = df.withColumn(col, F.col(col) * F.lit(float(sc[j][j])))
    if "n_atoms" in df.columns:
        df = df.withColumn("n_atoms", (F.col("n_atoms") * F.lit(det)).cast("int"))
    return df
