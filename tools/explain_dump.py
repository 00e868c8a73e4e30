"""Dump .explain("formatted") for named queries to plans/r14/.

Usage: python tools/explain_dump.py <sf_dir> <outdir> <suffix> <query> [...]

Writes <outdir>/<query>_<suffix>.txt for each query. Run from the repo
root whose engine you want to explain (the r13 worktree for *_before,
HEAD for *_after) — the script resolves the package from CWD.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.getcwd())

from tracy_matdb_spark.queries import load_all  # noqa: E402
from tracy_matdb_spark.session import get_session  # noqa: E402


def main() -> None:
    sf_dir, outdir, suffix = sys.argv[1], sys.argv[2], sys.argv[3]
    names = sys.argv[4:]
    os.makedirs(outdir, exist_ok=True)
    spark = get_session("explain-dump")
    reg = load_all()
    for name in names:
        df = reg[name].fn(spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} chars)")
    spark.stop()


if __name__ == "__main__":
    main()
