"""YAML pipeline spec: recursive `:link` includes + parameter grids.

Re-specifies the reference's driver-side config machinery:
- `read_spec` — YAML read where any string value `"spec:<file>"` (the
  reference's `:link` convention, matdb/io.py:398-440) is replaced by
  the parsed content of that file, recursively.
- `special_values` — parameter strings `linspace(a,b,n)`, `range(a,b,s)`,
  `logspace(a,b,n)`, `random:<n>` expanded to concrete lists
  (matdb/utility.py:589-654). Random draws use the counter-based PRNG
  so grids are reproducible on any machine.
- `expand_grid` — cartesian product of `key*`-suffixed parameters, each
  combo yielding a suffix-named sub-group (matdb/utility.py:766-819,
  suffix naming 737-764).

All of this is pure driver code — the grids are tiny; the *data* work
happens in the generator transformations they parameterize.
"""

from __future__ import annotations

import hashlib
import itertools
import math
import os
import re
from typing import Any

import yaml

LINK_PREFIX = "spec:"


def read_spec(path: str) -> dict:
    with open(path) as f:
        data = yaml.safe_load(f)
    base = os.path.dirname(os.path.abspath(path))
    return _resolve_links(data, base)


def _resolve_links(node: Any, base: str) -> Any:
    if isinstance(node, dict):
        return {k: _resolve_links(v, base) for k, v in node.items()}
    if isinstance(node, list):
        return [_resolve_links(v, base) for v in node]
    if isinstance(node, str) and node.startswith(LINK_PREFIX):
        target = node[len(LINK_PREFIX) :].strip()
        return read_spec(os.path.join(base, target))
    return node


_LINSPACE = re.compile(r"^linspace\(([^,]+),([^,]+),(\d+)\)$")
_LOGSPACE = re.compile(r"^logspace\(([^,]+),([^,]+),(\d+)\)$")
_RANGE = re.compile(r"^range\(([^,]+),([^,]+)(?:,([^,]+))?\)$")
_RANDOM = re.compile(r"^random:(\d+)$")


def _prng01(seed: int, key: str, i: int) -> float:
    canon = f"{seed}|{key}|{i}".encode()
    h = int(hashlib.md5(canon).hexdigest()[:15], 16)
    return h / float(2**60)


def special_values(value: Any, seed: int = 42, key: str = "") -> Any:
    """Expand the reference's special parameter strings to lists."""
    if not isinstance(value, str):
        return value
    m = _LINSPACE.match(value)
    if m:
        a, b, n = float(m.group(1)), float(m.group(2)), int(m.group(3))
        if n == 1:
            return [a]
        step = (b - a) / (n - 1)
        return [a + i * step for i in range(n)]
    m = _LOGSPACE.match(value)
    if m:
        a, b, n = float(m.group(1)), float(m.group(2)), int(m.group(3))
        if n == 1:
            return [10.0**a]
        step = (b - a) / (n - 1)
        return [10.0 ** (a + i * step) for i in range(n)]
    m = _RANGE.match(value)
    if m:
        a, b = float(m.group(1)), float(m.group(2))
        s = float(m.group(3)) if m.group(3) else 1.0
        out, x = [], a
        n = max(0, math.ceil((b - a) / s))
        return [a + i * s for i in range(n)]
    m = _RANDOM.match(value)
    if m:
        n = int(m.group(1))
        return [_prng01(seed, key, i) for i in range(n)]
    return value


def special_functions(sf: Any, values: Any) -> Any:
    """Apply a named function to a parameter value for suffix naming
    (matdb/utility.py:658-699): "linalg:<fn>" / "math:<fn>" /
    "numpy:<fn>", or the dict form {"func": "...", "reshape": [r, c]}."""
    import math as _math

    import numpy as _np

    mods = {"linalg": _np.linalg, "math": _math, "numpy": _np}
    reshape = None
    if isinstance(sf, dict):
        modfn = sf["func"]
        reshape = sf.get("reshape")
    elif isinstance(sf, str):
        modfn = sf
    else:
        raise ValueError("special function must be a string or dict")
    mod_name, _, fn_name = modfn.partition(":")
    if mod_name not in mods or not fn_name:
        raise ValueError(f"bad special function {modfn!r}")
    arg = _np.array(values).reshape(reshape) if reshape is not None else values
    out = getattr(mods[mod_name], fn_name)(arg)
    if isinstance(out, _np.floating):
        return float(out)
    if isinstance(out, _np.integer):
        return int(out)
    return out


def _suffix_for(params: dict, key: str, index: int, value: Any) -> str | None:
    """Reference suffix rules for one starred key (get_suffix,
    matdb/utility.py:737-764): `<key>_suffix` may be a special-function
    spec, a format string, or a `<key>_suffix*` list indexed by combo
    position; floats render as <key[:3]>-<v:.2f>. Returns None when no
    suffix directive exists (caller falls back to the default naming)."""
    sk = f"{key}_suffix"
    ssk = sk + "*"
    if sk in params and (isinstance(params[sk], dict) or (isinstance(params[sk], str) and ":" in params[sk])):
        keyval = special_functions(params[sk], value)
    elif sk in params and isinstance(params[sk], str):
        keyval = params[sk].format(value)
    elif ssk in params:
        keyval = params[ssk][index]
    else:
        return None
    if isinstance(keyval, float):
        return f"{key[:3]}-{keyval:.2f}"
    return f"{key[:3]}-{keyval}"


def _fmt(v: Any) -> str:
    if isinstance(v, float):
        return f"{v:g}"
    if isinstance(v, list):
        return "-".join(_fmt(x) for x in v)
    return str(v)


def expand_grid(params: dict, seed: int = 42) -> list[tuple[str, dict]]:
    """Expand `key*` parameters into (suffix, concrete-params) combos.

    Non-starred keys pass through unchanged; starred keys are expanded
    (incl. special values) and crossed. Suffix = '-'.joined 'key-value'
    in sorted key order (deterministic, mirroring get_suffix).
    """
    fixed = {k: special_values(v, seed, k) for k, v in params.items() if not k.endswith("*")}
    starred = {
        k[:-1]: special_values(v, seed, k[:-1])
        for k, v in params.items()
        if k.endswith("*") and not k.endswith("_suffix*")
    }
    if not starred:
        return [("", dict(fixed))]
    keys = sorted(starred)
    value_lists = [starred[k] if isinstance(starred[k], list) else [starred[k]] for k in keys]
    combos = []
    for indexed in itertools.product(*(list(enumerate(vl)) for vl in value_lists)):
        combo = dict(fixed)
        combo.update({k: v for k, (_, v) in zip(keys, indexed)})
        parts = []
        for k, (idx, v) in zip(keys, indexed):
            # `<key>_suffix` directives override the default naming
            # (get_suffix, matdb/utility.py:737-764)
            parts.append(_suffix_for(params, k, idx, v) or f"{k}-{_fmt(v)}")
        combos.append(("-".join(parts), combo))
    return combos
