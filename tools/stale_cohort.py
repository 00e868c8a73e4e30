"""Pre-validate the stalest latest-driver-check cohort at sf0.01.

The driver hash-checks ~50 of the 251 registered queries per round, so
every query's latest green row ages at ~5-round cadence. Since r12 the
round discipline is: before the driver runs, the builder re-validates
the cohort whose latest driver check is OLDEST (plus anything
INVALIDATED_BEFORE makes unverified) and commits the result as
PARITY_STALE_r{N}.json — so a regression in a long-unchecked query is
caught by the builder, not discovered rounds later by rotation. r12/r13
did this ad hoc; this tool is the discipline made executable.

Cohort selection: walk CORRECTNESS_r*.json exactly like the registry's
_driver_history (hash greens only, INVALIDATED_BEFORE rows ignored,
rows-only greens honored while the registration still has oracle=None),
take every registered query whose latest valid check is <= the cutoff
round (default: the minimum latest-check round across the registry,
i.e. "the stalest stratum"), and run the check_parity comparison on
each at sf0.01.

Usage: python tools/stale_cohort.py <round> [--cutoff N] [--sf DIR]
       # writes PARITY_STALE_r{round}.json at the repo root
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.check_parity import compare, duck_connection  # noqa: E402
from tracy_matdb_spark.queries import _driver_history, load_all  # noqa: E402
from tracy_matdb_spark.session import get_session  # noqa: E402

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def pick_cohort(cutoff: int | None = None) -> tuple[list[str], dict[str, int], int]:
    """(cohort names, latest-check map, effective cutoff). Queries with
    NO valid check (never verified, or invalidated by a semantics
    change) are always included."""
    registry = load_all()
    green, last = _driver_history(ROOT)
    never = [n for n in registry if n not in green]
    checked = {n: r for n, r in last.items() if n in registry}
    if cutoff is None:
        # default: widen the cutoff round by round until the cohort is
        # roughly one driver-round's worth (~50) — a lone straggler at
        # an old round must not shrink the pre-validation to itself
        target = min(48, len(registry))
        cutoff = min(checked.values(), default=0)
        while (
            len(never) + sum(1 for r in checked.values() if r <= cutoff) < target
            and cutoff <= max(checked.values(), default=0)
        ):
            cutoff += 1
    cohort = sorted(set(never) | {n for n, r in checked.items() if r <= cutoff})
    return cohort, checked, cutoff


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    if not args:
        raise SystemExit("usage: stale_cohort.py <round> [--cutoff N] [--sf DIR]")
    rnd = int(args[0])
    cutoff = None
    sf_dir = "/root/testdata/sf0.01"
    argv = sys.argv[1:]
    for i, a in enumerate(argv):
        if a == "--cutoff":
            if i + 1 >= len(argv):
                raise SystemExit("--cutoff needs a round number")
            cutoff = int(argv[i + 1])
        if a == "--sf":
            if i + 1 >= len(argv):
                raise SystemExit("--sf needs a directory")
            sf_dir = argv[i + 1]

    cohort, checked, eff_cutoff = pick_cohort(cutoff)
    print(f"cohort: {len(cohort)} queries at latest-check <= r{eff_cutoff} "
          f"(or never/invalidated)", flush=True)
    registry = load_all()
    spark = get_session("stale_cohort")
    con = duck_connection(sf_dir)
    rows: dict[str, int] = {}
    failed: list[str] = []
    for name in cohort:
        q = registry[name]
        t0 = time.time()
        try:
            spark_pdf = q.fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            failed.append(name)
            print(f"FAIL {name}: spark error: {e}", flush=True)
            continue
        rows[name] = len(spark_pdf)
        if q.oracle is None:
            print(f"ROWS-ONLY {name}: {len(spark_pdf)} rows", flush=True)
            continue
        oracle = q.oracle_fn(sf_dir) if q.oracle_fn is not None else q.oracle
        try:
            duck_pdf = con.execute(oracle).df()
        except Exception as e:  # noqa: BLE001
            failed.append(name)
            print(f"FAIL {name}: duckdb error: {e}", flush=True)
            continue
        problems = compare(name, spark_pdf, duck_pdf)
        if problems:
            failed.append(name)
            print(f"FAIL {name}: {problems}", flush=True)
        else:
            print(f"OK   {name}: {len(spark_pdf)} rows ({time.time()-t0:.1f}s)", flush=True)
    spark.stop()
    out = {
        "metric": "stale_cohort_parity_sf0.01",
        "cohort": f"latest driver check <= r{eff_cutoff} (+ never/invalidated) "
        f"entering r{rnd}",
        "n_checked": len(cohort),
        "n_green": len(cohort) - len(failed),
        "failed": sorted(failed),
        "rows": rows,
    }
    path = os.path.join(ROOT, f"PARITY_STALE_r{rnd}.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print(json.dumps({"n_checked": len(cohort), "n_green": out["n_green"],
                      "failed": sorted(failed)}))
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
