"""AFLOW-style filter DSL -> Spark Column compiler.

The reference exposes a small declarative filter language for remote
catalog queries (reference matdb/database/aflux.py:23-135): leaf terms
apply an operator to a keyword, inner nodes combine sub-filters with
boolean logic. Operator semantics (aflux.py:61-92):

    numeric:  '<' '>' '=='        comparisons
    string:   '<'  suffix match, '>' prefix match, '%' contains,
              '==' exact
    unary:    '~'  negation
    boolean:  '&' and, '|' or

Spec format here (YAML/JSON-friendly, mirroring the reference's nested
lists):
    ["Egap", ">", 0.0]                          leaf
    ["~", spec]                                 negation
    ["&", spec, spec, ...] / ["|", spec, ...]   conjunction/disjunction

The compiler emits a single Catalyst Column, so the whole filter tree
participates in predicate pushdown to the parquet scan — the DSL costs
nothing at execution time.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

Spec = list  # nested ["op", ...] lists


def compile_filter(spec: Spec) -> Column:
    if not isinstance(spec, (list, tuple)) or not spec:
        raise ValueError(f"bad filter spec: {spec!r}")
    head = spec[0]
    if head == "~":
        (inner,) = spec[1:]
        return ~compile_filter(inner)
    if head == "&":
        out = compile_filter(spec[1])
        for sub in spec[2:]:
            out = out & compile_filter(sub)
        return out
    if head == "|":
        out = compile_filter(spec[1])
        for sub in spec[2:]:
            out = out | compile_filter(sub)
        return out
    # leaf: [keyword, op, value]
    keyword, op, value = spec
    col = F.col(keyword)
    if isinstance(value, str):
        # string semantics per aflux.py:61-74
        if op == "<":
            return col.endswith(value)
        if op == ">":
            return col.startswith(value)
        if op == "%":
            return col.contains(value)
        if op == "==":
            return col == value
    else:
        if op == "<":
            return col < value
        if op == ">":
            return col > value
        if op == "==":
            return col == value
        if op == "!=":
            return col != value
        if op == "<=":
            return col <= value
        if op == ">=":
            return col >= value
    raise ValueError(f"unsupported op {op!r} for value {value!r}")


def aflow_query(
    df: DataFrame,
    filters: Spec | None = None,
    select: list[str] | None = None,
    exclude: list[str] | None = None,
    orderby: str | None = None,
    reverse: bool = False,
    limit: int | None = None,
    tiebreak: str | None = None,
) -> DataFrame:
    """filter -> project -> sort -> limit, the reference's remote-query shape
    (matdb/database/aflux.py:263-316 `_build_query`). `tiebreak` makes the
    sort total so results are deterministic under parallel execution (the
    reference is single-stream and doesn't need one)."""
    out = df
    if filters is not None:
        out = out.filter(compile_filter(filters))
    if select:
        out = out.select(*select)
    if exclude:
        out = out.drop(*exclude)
    if orderby:
        key = F.col(orderby).desc() if reverse else F.col(orderby).asc()
        keys = [key] + ([F.col(tiebreak)] if tiebreak else [])
        out = out.orderBy(*keys)
    if limit is not None:
        out = out.limit(limit)
    return out
