"""Shared read-merge-write for SCALING.json blocks.

Every scaling/stage/codec probe ends with the same sequence: load the
artifact (tolerating absent/corrupt), replace one top-level block,
rewrite with stable formatting. One helper so format or durability
changes (indent, atomic write, failure handling) happen in one place
instead of drifting across tools.
"""

from __future__ import annotations

import json
import os

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def read_scaling(root: str | None = None) -> dict:
    path = os.path.join(root or _ROOT, "SCALING.json")
    try:
        with open(path) as fh:
            return json.load(fh)
    except (OSError, ValueError):
        return {}


def merge_scaling_block(key: str, result: dict, root: str | None = None) -> str:
    """Replace SCALING.json[key] with `result`; returns the path."""
    path = os.path.join(root or _ROOT, "SCALING.json")
    full = read_scaling(root)
    full[key] = result
    with open(path, "w") as fh:
        json.dump(full, fh, indent=2, sort_keys=True)
        fh.write("\n")
    return path
