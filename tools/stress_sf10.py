"""Third-decade hazard sweep: run every documents-only query at sf10.

The sf10 documents corpus (tools/make_sf1.py --sf10-documents, 500k
docs) caught a real scale bug on its first use: exact_substring_spans'
dup-hash join relied on AQE's broadcast decision and exhausted driver
memory at 100x sf0.1 (fixed with a footer-stat gate). This sweep points
EVERY registered query at the documents-only sf10 directory and records
which run clean, how long they take, and which fail — queries needing
other tables fail fast on the missing parquet and are recorded as
"skipped" (not a hazard; the dataset is documents-only by design).

A failure mentioning broadcast/memory is the hazard class this hunts.
Output: one JSON line + per-query progress on stderr. Not a committed
artifact generator — a hunting tool; findings graduate into fixes and
SCALING.json entries.

Usage: python tools/stress_sf10.py [sf10_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tracy_matdb_spark.queries import load_all  # noqa: E402
from tracy_matdb_spark.session import get_session  # noqa: E402


def main(sf_dir: str) -> None:
    registry = load_all()
    spark = get_session("stress_sf10")
    ran: dict[str, float] = {}
    skipped: list[str] = []
    failed: dict[str, str] = {}
    for name in sorted(registry):
        t0 = time.time()
        try:
            registry[name].fn(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            ran[name] = round(time.time() - t0, 2)
            print(f"ok    {name}: {ran[name]}s", file=sys.stderr, flush=True)
        except Exception as e:  # noqa: BLE001
            msg = str(e)
            if "PATH_NOT_FOUND" in msg or "Path does not exist" in msg:
                skipped.append(name)  # needs a table sf10 doesn't ship
            else:
                failed[name] = msg[:300]
                print(f"FAIL  {name}: {msg[:160]}", file=sys.stderr, flush=True)
    spark.stop()
    slow = dict(sorted(ran.items(), key=lambda t: -t[1])[:10])
    print(
        json.dumps(
            {
                "metric": "sf10_documents_stress",
                "sf_dir": sf_dir,
                "n_ran": len(ran),
                "n_skipped_missing_tables": len(skipped),
                "failed": failed,
                "slowest": slow,
            }
        )
    )
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.localdata/sf10")
