"""Env-faithful reproduction of the correctness driver's calling
convention for the typed-state streaming queries.

The driver builds its OWN bare SparkSession (not session.get_session),
so the JVM launches before any shim bootstrap runs; Spark 4's
transformWithStateInPandas then spawns a fresh "driver worker" process
that must be able to `import google.protobuf` with no help from
$PYTHONPATH or pyFiles. This script reproduces exactly that:

1. uninstall the site-packages .pth hook (pristine interpreter),
2. verify google.protobuf is NOT importable in a fresh process,
3. build a bare SparkSession,
4. run both tws queries through the registry at the given sf dir,
5. compare each against its batch-aggregation twin computed on the
   same session, printing PASS/FAIL per query.

Run under a scrubbed environment (no PYTHONPATH shim entry) for the
faithful check; tests/test_streaming.py wraps it that way.
Exit code 0 = both queries match their batch twins.
"""

from __future__ import annotations

import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _snapshot_hooks() -> dict[str, str]:
    """Record every existing .pth hook (path -> content) so the check
    can restore the interpreter's prior global state even if it crashes
    mid-run — this tool mutates the REAL site-packages and must not
    leave a concurrent session that depends on the hook stranded."""
    from tracy_matdb_spark.vendor import PTH_NAME, _site_dirs

    out: dict[str, str] = {}
    for d in _site_dirs():
        pth = os.path.join(d, PTH_NAME)
        try:
            with open(pth, "r", encoding="utf-8") as fh:
                out[pth] = fh.read()
        except OSError:
            pass
    return out


def _restore_hooks(snapshot: dict[str, str]) -> None:
    for pth, content in snapshot.items():
        if os.path.exists(pth):
            continue
        try:
            tmp = pth + ".tmp"
            with open(tmp, "w", encoding="utf-8") as fh:
                fh.write(content)
            os.replace(tmp, pth)
        except OSError:
            pass


def main(sf_dir: str) -> int:
    from tracy_matdb_spark.vendor import SHIM_DIR, uninstall_pth_hook

    # 1: pristine interpreter — no .pth hook, no PYTHONPATH shim.
    # Snapshot first: the check mutates the real interpreter's
    # site-packages, so prior state is restored in the finally below
    # (normally a no-op — the queries' own ensure_protobuf reinstalls
    # the hook as part of the bootstrap under test).
    prior = _snapshot_hooks()
    try:
        return _run_check(sf_dir, uninstall_pth_hook, SHIM_DIR)
    finally:
        _restore_hooks(prior)


def _run_check(sf_dir: str, uninstall_pth_hook, SHIM_DIR: str) -> int:
    uninstall_pth_hook()
    env = dict(os.environ)
    pp = [
        p
        for p in env.get("PYTHONPATH", "").split(os.pathsep)
        if p and p != SHIM_DIR
    ]
    env["PYTHONPATH"] = os.pathsep.join(pp)

    # 2: google.protobuf must be absent in a fresh process (otherwise
    # this check proves nothing)
    probe = subprocess.run(
        [sys.executable, "-c", "import google.protobuf"],
        env=env,
        capture_output=True,
    )
    if probe.returncode == 0:
        print(
            "NOTE: google.protobuf importable in a pristine process "
            "(real package installed?) — check still runs but does not "
            "exercise the shim bootstrap"
        )

    # 3: bare SparkSession, the driver's way (no get_session)
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master("local[4]")
        .appName("bare-tws-check")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    try:
        from tracy_matdb_spark.queries import REGISTRY, load_all

        load_all()

        events = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
        ok = True
        for name in ("events_stateful_totals_tws", "events_typemap_tws"):
            out = REGISTRY[name].fn(spark, sf_dir)
            if name == "events_stateful_totals_tws":
                twin = events.groupBy("user_id").agg(
                    F.count(F.lit(1)).alias("n_events"),
                    F.sum(
                        F.floor(F.col("value") * F.lit(100.0)).cast("long")
                    ).alias("sum_value_c"),
                    F.max(
                        F.floor(F.col("value") * F.lit(100.0)).cast("long")
                    ).alias("max_value_c"),
                )
            else:
                cents = events.withColumn(
                    "c", F.round(F.col("value") * 100).cast("long")
                )
                twin = cents.groupBy("user_id").agg(
                    F.countDistinct("event_type").alias("n_types"),
                    F.sum("c").alias("sum_cents"),
                    F.count(F.lit(1)).alias("n_values"),
                    F.max("c").alias("max_cents"),
                )
            got = {tuple(r) for r in out.collect()}
            want = {tuple(r) for r in twin.collect()}
            status = "PASS" if got == want and got else "FAIL"
            if status == "FAIL":
                ok = False
            print(f"{status} {name}: {len(got)} rows (twin {len(want)})")
        return 0 if ok else 1
    finally:
        spark.stop()


if __name__ == "__main__":
    sys.exit(main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"))
