"""Compare two bench artifacts query-by-query against the recorded noise.

The round-8 verdict asked for attributable perf numbers; round 9 added
per-query dispersion (IQR of the interleaved reps) to the artifact, and
this tool makes the comparison self-serve: for every query present in
both artifacts it prints old, new, delta, and a verdict — **real** when
|delta| exceeds the recorded IQR envelope (max of the two artifacts'
IQRs, floored at NOISE_FLOOR_S for sub-IQR-resolution queries), else
**noise**. A protocol mismatch (metric names differ, e.g. the r8
single-shot protocol vs the r9 interleaved medians) is surfaced in the
header instead of silently comparing unlike numbers; use queries_min
(recorded for cross-era continuity) via --min to compare min-to-min
across the protocol change.

Accepts both artifact shapes:
* raw bench.py output (has top-level "queries"), and
* the driver's wrapper ({"n": .., "tail": "...", "parsed": {..}}) —
  "parsed" when present, else per-query pairs are regex-scavenged from
  the tail fragment (the tail is byte-truncated at the head, so early
  queries may be missing; the tool reports how many it recovered).

Usage:
    python tools/bench_compare.py OLD.json NEW.json [--min]
Prints a table to stderr and ONE JSON line to stdout.
"""

from __future__ import annotations

import json
import re
import sys

# Deltas below this are unattributable regardless of IQR (timer jitter,
# noop-sink setup): treat as noise even when the recorded IQR is ~0.
NOISE_FLOOR_S = 0.05


def load_artifact(path: str) -> dict:
    with open(path) as fh:
        raw = json.load(fh)
    if "queries" in raw:
        return raw
    if isinstance(raw.get("parsed"), dict) and "queries" in raw["parsed"]:
        return raw["parsed"]
    # driver wrapper whose parse failed: scavenge `"name": 1.234` pairs
    # from the tail fragment (head-truncated — recovers the later
    # queries only)
    tail = raw.get("tail", "")

    def block(key: str) -> dict[str, float]:
        m = re.search(rf'"{key}":\s*\{{([^}}]*)\}}', tail)
        if not m:
            return {}
        return {
            name: float(val)
            for name, val in re.findall(
                r'"([a-z0-9_]+)":\s*(-?\d+\.?\d*)', m.group(1)
            )
        }

    queries = block("queries")
    if not queries:
        # the tail is head-truncated: the "queries" block's opening brace
        # may be cut off; scavenge pairs appearing BEFORE the first named
        # sibling block (those belong to the truncated queries block)
        head = re.split(r'"queries_(iqr|min|n_samples)"', tail)[0]
        queries = {
            name: float(val)
            for name, val in re.findall(r'"([a-z0-9_]+)":\s*(-?\d+\.?\d*)', head)
        }
    return {
        "metric": "scavenged_from_tail",
        "queries": queries,
        "queries_min": block("queries_min") or None,
        "queries_iqr": block("queries_iqr"),
    }


def compare(old: dict, new: dict, use_min: bool = False) -> dict:
    key = "queries_min" if use_min else "queries"
    qo = old.get(key) or old["queries"]
    qn = new.get(key) or new["queries"]
    if use_min:
        # an artifact without queries_min silently falling back to the
        # medians block would compare unlike bases (min vs median)
        # without the protocol warning — say so explicitly
        for label, art in (("old", old), ("new", new)):
            if not art.get(key):
                print(
                    f"WARNING: --min requested but the {label} artifact has "
                    "no queries_min block; falling back to its medians — "
                    "min-vs-median deltas are NOT comparable",
                    file=sys.stderr,
                )
    io_ = old.get("queries_iqr", {})
    in_ = new.get("queries_iqr", {})
    rows: dict[str, dict] = {}
    n_real = 0
    for name in sorted(set(qo) & set(qn)):
        o, n = qo[name], qn[name]
        if o < 0 or n < 0:  # -1.0 = broken in that artifact
            rows[name] = {"old_s": o, "new_s": n, "verdict": "broken"}
            continue
        envelope = max(io_.get(name, 0.0), in_.get(name, 0.0), NOISE_FLOOR_S)
        delta = round(n - o, 3)
        real = abs(delta) > envelope
        n_real += real
        rows[name] = {
            "old_s": o,
            "new_s": n,
            "delta_s": delta,
            "delta_pct": round(100.0 * delta / o, 1) if o else None,
            "iqr_envelope_s": round(envelope, 3),
            "verdict": ("real" if real else "noise"),
        }
    common = [r for r in rows.values() if r["verdict"] != "broken"]
    # BENCH_DRIFT_r11: run position biases sub-second queries ±30-50%,
    # so per-query deltas are only attributable under matched run order.
    # Artifacts before round 12 don't record order — that's "unknown",
    # which is also not a matched-order comparison.
    oo, no = old.get("run_order"), new.get("run_order")
    order_known = oo is not None and no is not None
    return {
        "metric": "bench_compare",
        "basis": key,
        "old_metric": old.get("metric"),
        "new_metric": new.get("metric"),
        "protocol_mismatch": old.get("metric") != new.get("metric"),
        "run_order_match": (oo == no) if order_known else None,
        "n_common": len(rows),
        "n_real": n_real,
        "total_old_s": round(sum(r["old_s"] for r in common), 3),
        "total_new_s": round(sum(r["new_s"] for r in common), 3),
        "queries": rows,
    }


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    if len(args) != 2:
        raise SystemExit(__doc__)
    use_min = "--min" in sys.argv[1:]
    result = compare(load_artifact(args[0]), load_artifact(args[1]), use_min)
    if result["protocol_mismatch"]:
        print(
            f"WARNING: protocols differ ({result['old_metric']} vs "
            f"{result['new_metric']}) — medians are not comparable across "
            "the r8->r9 protocol change; rerun with --min for the "
            "cross-era min-to-min basis",
            file=sys.stderr,
        )
    if result["run_order_match"] is False:
        print(
            "WARNING: run orders differ between the artifacts — "
            "BENCH_DRIFT_r11 measured ±30-50% run-position bias on "
            "sub-second queries; per-query verdicts below are NOT "
            "attributable to code",
            file=sys.stderr,
        )
    elif result["run_order_match"] is None:
        print(
            "note: at least one artifact predates run-order recording "
            "(round <12); matched-order comparison cannot be verified. "
            "Per-query deltas under ~0.3s are not actionable on this box "
            "(BENCH_DRIFT_r11)",
            file=sys.stderr,
        )
    w = max((len(n) for n in result["queries"]), default=10)
    for name, r in result["queries"].items():
        if r["verdict"] == "broken":
            print(f"{name:<{w}}  BROKEN ({r['old_s']} -> {r['new_s']})", file=sys.stderr)
            continue
        pct = f"{r['delta_pct']:+6.1f}%" if r["delta_pct"] is not None else "   n/a"
        print(
            f"{name:<{w}}  {r['old_s']:>7.3f} -> {r['new_s']:>7.3f}  "
            f"{r['delta_s']:+7.3f} ({pct})  "
            f"iqr±{r['iqr_envelope_s']:.3f}  {r['verdict']}",
            file=sys.stderr,
        )
    print(json.dumps({k: v for k, v in result.items() if k != "queries"}))


if __name__ == "__main__":
    main()
