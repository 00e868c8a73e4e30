"""Static window-partition audit over formatted physical plans.

A ``WindowExec`` is a scale hazard in two shapes (the round-2 verdict's
pattern): NO partition keys (Spark moves every row to one task), or
partition keys whose domain is known-tiny (3 order statuses, ~20 corpus
sources, a handful of event types — each group then sorts ~N/groups
rows in a single task at 100 TB even though the plan "has" partitions).

The sanctioned alternative is the two-phase range-sliced rank /
prefix-sum in operators/rank.py, whose windows either carry a slice id
(``__pid`` / ``__b``) in the partition key (parallel) or run over the
O(slices) offsets aggregate (bounded input, marked by the internal
``__m``/``__cnt``/``__offset`` columns). Windows over those internals
are therefore exempt here; everything else with an empty or all-tiny
partition spec is reported, and tests keep the report pinned to an
explicit, documented allowlist.
"""

from __future__ import annotations

import re

# Columns whose value domain is tiny by data-model construction — a
# window partitioned ONLY by these sorts O(N/groups) rows per task.
LOW_CARD_COLS = {
    "status",
    "o_orderstatus",
    "event_type",
    "source",
    "l_returnflag",
    "l_linestatus",
    "lang",
    "lang_pred",
}

# Internal columns of the operators/rank.py two-phase primitives: their
# presence means the window is either slice-partitioned or runs over the
# O(slices) offsets aggregate.
SLICE_COLS = {"__pid", "__b", "__h", "__m", "__cnt", "__offset"}


def _bracket_groups(s: str) -> list[str]:
    """Split 'Arguments: [a], [b], [c]' into top-level bracket groups."""
    out: list[str] = []
    depth, cur = 0, ""
    for ch in s:
        if ch == "[":
            depth += 1
        cur += ch
        if ch == "]":
            depth -= 1
            if depth == 0:
                out.append(cur.strip(" ,"))
                cur = ""
    return out


def _cols(fragment: str) -> set[str]:
    return set(re.findall(r"(\w+)#\d+", fragment))


def window_findings(plan: str) -> list[str]:
    """Return one finding string per hazardous Window node in a
    *formatted-mode* explain string; empty list = clean."""
    findings: list[str] = []
    for m in re.finditer(r"\(\d+\) Window\n((?:[^\n(][^\n]*\n?)+)", plan):
        block = m.group(1)
        inp = re.search(r"Input \[\d+\]: (\[.*\])", block)
        args = re.search(r"Arguments: (.*)", block)
        if not args:
            continue
        groups = _bracket_groups(args.group(1))
        if len(groups) >= 3:
            part_frag = groups[1]
        elif len(groups) == 2:
            # Formatted explain OMITS an empty spec group: a Window with no
            # partition keys prints only [functions], [order] — so a naive
            # groups[1] read would mistake ORDER columns for partition keys
            # and miss exactly the single-task shape this audit exists to
            # catch. Order specs always carry ASC/DESC; partition specs never.
            part_frag = "" if re.search(r"\b(?:ASC|DESC)\b", groups[1]) else groups[1]
        else:
            part_frag = ""
        part_cols = _cols(part_frag)
        input_cols = _cols(inp.group(1)) if inp else set()
        if input_cols & SLICE_COLS:
            continue  # two-phase rank internals: bounded or slice-parallel
        if not part_cols:
            findings.append(f"unpartitioned window over {sorted(input_cols)}")
        elif part_cols <= LOW_CARD_COLS:
            findings.append(f"low-cardinality window partition {sorted(part_cols)}")
    return findings
