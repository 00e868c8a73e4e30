"""CLI: run any registered query and print its result.

    python -m tracy_matdb_spark list [pattern]
    python -m tracy_matdb_spark run <query> [sf_dir] [-n N]
    python -m tracy_matdb_spark explain <query> [sf_dir]

`list` prints registered query names (+ one-line docs) matching an
optional substring; `run` executes one query at `sf_dir` (default
$SPARK_GRAFT_SF_DIR or /root/testdata/sf0.01) and shows the first N
rows (default 20); `explain` prints the formatted physical plan — the
same surface the plan audit reads.
"""

from __future__ import annotations

import argparse
import os
import sys


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(prog="tracy_matdb_spark")
    sub = parser.add_subparsers(dest="cmd", required=True)
    p_list = sub.add_parser("list", help="list registered queries")
    p_list.add_argument("pattern", nargs="?", default="")
    for name in ("run", "explain"):
        p = sub.add_parser(name)
        p.add_argument("query")
        p.add_argument(
            "sf_dir",
            nargs="?",
            default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"),
        )
        if name == "run":
            p.add_argument("-n", type=int, default=20, help="rows to show")
    args = parser.parse_args(argv)

    from tracy_matdb_spark.queries import load_all

    registry = load_all()
    if args.cmd == "list":
        for name in sorted(registry):
            if args.pattern in name:
                doc = (registry[name].doc or "").split(". ")[0][:100]
                print(f"{name:40s} {doc}")
        return 0

    if args.query not in registry:
        near = [n for n in sorted(registry) if args.query in n][:8]
        hint = f" — did you mean: {', '.join(near)}?" if near else ""
        print(f"unknown query {args.query!r}{hint}", file=sys.stderr)
        return 2

    from tracy_matdb_spark.session import get_session

    spark = get_session(f"cli_{args.cmd}")
    try:
        df = registry[args.query].fn(spark, args.sf_dir)
        if args.cmd == "explain":
            df.explain("formatted")
        else:
            df.show(args.n, truncate=False)
    finally:
        spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
