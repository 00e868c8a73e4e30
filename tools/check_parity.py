"""Local replica of the driver's correctness gate.

Runs every registered query on Spark and its oracle SQL on DuckDB over
the same parquet tables, then compares:
  - row count
  - sorted column-name set
  - values: columns sorted by name, rows sorted, exact match for
    non-floats; floats must match exactly after the query's own
    rounding (any nonzero diff is reported).

Usage: python tools/check_parity.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

from tracy_matdb_spark.catalog import TABLES, table_path
from tracy_matdb_spark.queries import load_all
from tracy_matdb_spark.session import get_session


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{table_path(sf_dir, t)}')")
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = pd.to_datetime(df[c]).dt.tz_localize(None)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def compare(name: str, spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> list[str]:
    problems: list[str] = []
    if len(spark_pdf) != len(duck_pdf):
        problems.append(f"rowcount spark={len(spark_pdf)} duck={len(duck_pdf)}")
    scols, dcols = sorted(spark_pdf.columns), sorted(duck_pdf.columns)
    if scols != dcols:
        problems.append(f"columns spark={scols} duck={dcols}")
        return problems
    if problems:
        return problems
    s, d = normalize(spark_pdf), normalize(duck_pdf)
    for c in s.columns:
        # the driver's value-hash is TYPE-KIND-sensitive (round-1 lesson:
        # DuckDB HUGEINT surfaces as float/object and hashed differently
        # despite equal values; int32-vs-int64 width was tolerated — e.g.
        # vacancy_enumerate passed) — flag kind mismatches only.
        if s[c].dtype.kind != d[c].dtype.kind:
            problems.append(
                f"col {c}: dtype spark={s[c].dtype} duck={d[c].dtype} (driver hash is type-sensitive)"
            )
    for c in s.columns:
        sv, dv = s[c], d[c]
        if sv.dtype.kind == "f" or dv.dtype.kind == "f":
            sv = sv.astype(float)
            dv = dv.astype(float)
            both_nan = sv.isna() & dv.isna()
            diff = (sv - dv).abs()
            bad = ~both_nan & ~(diff == 0)
            if bad.any():
                mx = diff[bad].max()
                problems.append(f"col {c}: {int(bad.sum())} float mismatches, max abs diff {mx:.3e}")
        else:
            eq = (sv == dv) | (sv.isna() & dv.isna())
            if not eq.all():
                i = int((~eq).idxmax())
                problems.append(f"col {c}: {int((~eq).sum())} mismatches, first at row {i}: {sv[i]!r} vs {dv[i]!r}")
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    registry = load_all()
    spark = get_session("parity")
    con = duck_connection(sf_dir)
    failures = 0
    for name, q in registry.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            spark_pdf = q.fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {e}")
            failures += 1
            continue
        if q.oracle is None:
            ok = len(spark_pdf) >= 0
            print(f"ROWS-ONLY {name}: {len(spark_pdf)} rows ({time.time()-t0:.1f}s)")
            if not ok:
                failures += 1
            continue
        oracle = q.oracle_fn(sf_dir) if q.oracle_fn is not None else q.oracle
        try:
            duck_pdf = con.execute(oracle).df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {e}")
            failures += 1
            continue
        problems = compare(name, spark_pdf, duck_pdf)
        if problems:
            failures += 1
            print(f"FAIL {name} ({time.time()-t0:.1f}s):")
            for p in problems:
                print(f"    {p}")
        else:
            print(f"OK   {name}: {len(spark_pdf)} rows ({time.time()-t0:.1f}s)")
    print(f"\n{failures} failures" if failures else "\nall green")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
