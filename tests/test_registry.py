"""Registry ordering guardrails: the driver checks ~50 queries per
round, so the unverified-first ordering IS the verification pipeline —
these tests keep its green/stale rules honest (round-3 verdict items
#2/#3: a no_oracle row must not stay green after an oracle is added,
and a semantics change must re-surface an old green row)."""

from __future__ import annotations

import json

from tracy_matdb_spark import queries as Q


def _with_fake_registry(entries):
    """Temporarily splice fake Query objects into REGISTRY."""
    added = []
    for name, oracle in entries.items():
        assert name not in Q.REGISTRY
        Q.REGISTRY[name] = Q.Query(name=name, fn=lambda s, d: None, oracle=oracle)
        added.append(name)
    return added


def _write_rows(tmp_path, fname, rows):
    (tmp_path / fname).write_text(json.dumps(rows))


def test_hash_green_counts_and_red_does_not(tmp_path):
    added = _with_fake_registry({"__t_green": "SELECT 1", "__t_red": "SELECT 1"})
    try:
        _write_rows(tmp_path, "CORRECTNESS_r01.json", {
            "__t_green": {"hash_match": True},
            "__t_red": {"hash_match": False, "err": "hash"},
        })
        green = Q._driver_green(str(tmp_path))
        assert "__t_green" in green
        assert "__t_red" not in green
    finally:
        for n in added:
            del Q.REGISTRY[n]


def test_no_oracle_green_only_while_registration_is_oracle_less(tmp_path):
    added = _with_fake_registry({"__t_still_none": None, "__t_gained_oracle": "SELECT 1"})
    try:
        _write_rows(tmp_path, "CORRECTNESS_r01.json", {
            "__t_still_none": {"hash_match": None, "err": "no_oracle"},
            "__t_gained_oracle": {"hash_match": None, "err": "no_oracle"},
        })
        green = Q._driver_green(str(tmp_path))
        assert "__t_still_none" in green  # deliberately oracle-less: rows-only OK
        assert "__t_gained_oracle" not in green  # oracle added later: must re-verify
    finally:
        for n in added:
            del Q.REGISTRY[n]


def test_invalidated_before_ignores_pre_change_rows(tmp_path):
    added = _with_fake_registry({"__t_changed": "SELECT 1"})
    Q.INVALIDATED_BEFORE["__t_changed"] = 4
    try:
        _write_rows(tmp_path, "CORRECTNESS_r03.json", {"__t_changed": {"hash_match": True}})
        assert "__t_changed" not in Q._driver_green(str(tmp_path))
        _write_rows(tmp_path, "CORRECTNESS_r04.json", {"__t_changed": {"hash_match": True}})
        assert "__t_changed" in Q._driver_green(str(tmp_path))
    finally:
        del Q.INVALIDATED_BEFORE["__t_changed"]
        for n in added:
            del Q.REGISTRY[n]


def test_invalidated_before_names_are_registered():
    """Every INVALIDATED_BEFORE entry must name a registered query —
    a stale name (query renamed/removed after a semantics change) would
    silently stop forcing re-verification. Any oracle/semantics change
    to a driver-green query MUST add an entry here with the current
    round number (see CONTRIBUTING.md)."""
    from tracy_matdb_spark.queries import INVALIDATED_BEFORE, load_all

    registered = set(load_all())
    stale = set(INVALIDATED_BEFORE) - registered
    assert not stale, f"INVALIDATED_BEFORE names unregistered queries: {sorted(stale)}"
    assert all(
        isinstance(rnd, int) and rnd > 0 for rnd in INVALIDATED_BEFORE.values()
    ), "rounds must be positive ints"
