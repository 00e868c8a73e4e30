"""Unit tests for the shuffle/spill audit's pure aggregation + flag logic
(tools/shuffle_audit.py). The Spark/REST integration is exercised by the
tool itself (SHUFFLE.json is a committed per-round artifact); these pin
the metric arithmetic and flag thresholds without a session."""

from __future__ import annotations

from tools.shuffle_audit import MIN_SHUFFLE_MB, RATIO_FLAG, row_flags, stage_row

MB = 1024 * 1024


def _stage(**kw):
    base = {
        "inputBytes": 0,
        "outputBytes": 0,
        "shuffleReadBytes": 0,
        "shuffleWriteBytes": 0,
        "memoryBytesSpilled": 0,
        "diskBytesSpilled": 0,
    }
    base.update(kw)
    return base


def test_stage_row_sums_across_stages():
    row = stage_row(
        [
            _stage(inputBytes=10 * MB, shuffleWriteBytes=2 * MB),
            _stage(shuffleReadBytes=2 * MB, shuffleWriteBytes=3 * MB, outputBytes=MB),
        ]
    )
    assert row["n_stages"] == 2
    assert row["input_mb"] == 10.0
    assert row["shuffle_write_mb"] == 5.0
    assert row["shuffle_read_mb"] == 2.0
    assert row["output_mb"] == 1.0
    assert row["spill_mb"] == 0.0
    assert row["ratio_shuffle_over_input"] == 0.5


def test_zero_input_ratio_is_none_not_flagged():
    row = stage_row([_stage(shuffleWriteBytes=500 * MB)])
    assert row["ratio_shuffle_over_input"] is None
    assert row_flags("q", row) == []


def test_any_spill_is_hard_flagged():
    row = stage_row([_stage(inputBytes=MB, memoryBytesSpilled=1)])
    # a 1-byte spill rounds to 0.0 MB for display but must still flag
    assert row["spill_mb"] == 0.0 and row["spill_bytes"] == 1
    assert row_flags("q", row) == ["spill:q"]
    row = stage_row([_stage(inputBytes=MB, diskBytesSpilled=1)])
    assert row_flags("q", row) == ["spill:q"]


def test_shuffle_ratio_needs_both_ratio_and_volume():
    # huge ratio but tiny absolute volume: not flagged
    small = stage_row([_stage(inputBytes=1 * MB, shuffleWriteBytes=50 * MB)])
    assert small["ratio_shuffle_over_input"] > RATIO_FLAG
    assert small["shuffle_write_mb"] < MIN_SHUFFLE_MB
    assert row_flags("q", small) == []
    # big ratio AND big volume: flagged
    big = stage_row([_stage(inputBytes=10 * MB, shuffleWriteBytes=200 * MB)])
    assert row_flags("q", big) == ["shuffle_ratio:q"]
    # big volume, modest ratio: not flagged
    fine = stage_row([_stage(inputBytes=100 * MB, shuffleWriteBytes=200 * MB)])
    assert row_flags("q", fine) == []


def test_byte_scaling_compare_and_flags():
    from tools.shuffle_audit import byte_scaling

    def audit(queries):
        return {"queries": queries}

    small = audit(
        {
            "linear": {"shuffle_write_mb": 10.0, "spill_mb": 0.0, "spill_bytes": 0},
            "quadratic": {"shuffle_write_mb": 10.0, "spill_mb": 0.0, "spill_bytes": 0},
            "tiny": {"shuffle_write_mb": 0.5, "spill_mb": 0.0, "spill_bytes": 0},
            "zero": {"shuffle_write_mb": 0.0, "spill_mb": 0.0, "spill_bytes": 0},
            "broken": {"error": "boom"},
        }
    )
    large = audit(
        {
            "linear": {"shuffle_write_mb": 100.0, "spill_mb": 0.0, "spill_bytes": 0},
            "quadratic": {"shuffle_write_mb": 900.0, "spill_mb": 1.5, "spill_bytes": 3},
            "tiny": {"shuffle_write_mb": 30.0, "spill_mb": 0.0, "spill_bytes": 0},
            "zero": {"shuffle_write_mb": 5.0, "spill_mb": 0.0, "spill_bytes": 0},
            "broken": {"error": "boom"},
            "only_large": {"shuffle_write_mb": 1.0, "spill_mb": 0.0, "spill_bytes": 0},
        }
    )
    out = byte_scaling(small, large)
    q = out["queries"]
    assert "broken" not in q and "only_large" not in q
    assert q["linear"]["bytes_ratio"] == 10.0 and not q["linear"]["flagged"]
    # 90x growth AND >= MIN_SHUFFLE_MB on the large side: flagged
    assert q["quadratic"]["flagged"]
    # 60x growth but only 30 MB absolute: denominator noise, not flagged
    assert not q["tiny"]["flagged"]
    # zero small-side shuffle: ratio undefined, never flagged
    assert q["zero"]["bytes_ratio"] is None and not q["zero"]["flagged"]
    assert out["flagged"] == ["bytes_ratio:quadratic", "spill_large:quadratic"]


def test_shuffle_artifact_covers_registry_and_is_clean():
    """SHUFFLE.json must cover the full registry (round-9 extension: the
    48-query sample left blind spots) and carry zero flags — the same
    stale-artifact gate as PLANAUDIT's. Fails when a query is registered
    without re-running tools/shuffle_audit.py, or when any audited query
    spills / over-shuffles at sf0.1."""
    import json
    import os

    from tracy_matdb_spark.queries import load_all

    path = os.path.join(os.path.dirname(__file__), "..", "SHUFFLE.json")
    with open(path) as f:
        art = json.load(f)
    audited = set(art["queries"])
    registered = set(load_all())
    missing = registered - audited
    extra = audited - registered
    assert not missing and not extra, (
        f"SHUFFLE.json stale — regenerate with tools/shuffle_audit.py. "
        f"missing={sorted(missing)} extra={sorted(extra)}"
    )
    assert art["flagged"] == [], art["flagged"]
    assert not [n for n, r in art["queries"].items() if "error" in r]
