"""Fitting-stage operators: dbfilter exclusion, quantities, validation RMS.

Reference: matdb/fitting/basic.py —
- `dbfilter` (164-204, 347-391): per-record predicates `attr op value`;
  matching records are *excluded* from training.
- `quantities` (292-345): project named params/properties, optionally
  reduced by an aggregator function (FQDN registry).
- validation (450-488): RMS of (ref - predicted) for energy (per
  record) and forces (flattened components).

Spark: all three are one-liners over the relational core — a negated
filter, a select + optional aggregate, and stddev/sqrt-of-mean-square
aggregations (map-side partials; the force flattening is an explode that
Catalyst pipelines into the same stage).
"""

from __future__ import annotations

import operator
from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_OPS = {
    ">": operator.gt,
    "<": operator.lt,
    "==": operator.eq,
    "!=": operator.ne,
    ">=": operator.ge,
    "<=": operator.le,
}


def dbfilter_exclude(df: DataFrame, attr: str, op: str, value) -> DataFrame:
    """Exclude records matching the predicate (basic.py:378-379 inverts)."""
    if op not in _OPS:
        raise ValueError(f"unsupported dbfilter operator: {op}")
    pred: Column = _OPS[op](F.col(attr), F.lit(value))
    return df.filter(~pred | pred.isNull())


AGGREGATORS: dict[str, Callable[[Column], Column]] = {
    "numpy.mean": F.avg,
    "numpy.max": F.max,
    "numpy.min": F.min,
    "numpy.std": F.stddev_pop,
    "numpy.sum": F.sum,
}


def quantities(df: DataFrame, cols: list[str], aggregate: str | None = None) -> DataFrame:
    """Project quantity columns; with an aggregator FQDN, reduce each
    (basic.py:307-341's per-record aggregator, applied table-wide)."""
    proj = df.select(*cols)
    if aggregate is None:
        return proj
    fn = AGGREGATORS[aggregate]
    return proj.agg(*[fn(F.col(c)).alias(f"{c}_{aggregate.split('.')[-1]}") for c in cols])


def validation_rms(df: DataFrame, ref: str, pred: str, group_by: list[str] | None = None) -> DataFrame:
    """RMS of (ref - pred): sqrt(mean((ref-pred)^2)), the reference's
    np.std around 0-mean residuals (basic.py:450-488)."""
    delta = F.col(ref) - F.col(pred)
    aggs = [
        F.sqrt(F.avg(delta * delta)).alias("rms"),
        F.stddev_pop(delta).alias("residual_std"),
        F.avg(delta).alias("residual_mean"),
        F.count(F.lit(1)).alias("n"),
    ]
    if group_by:
        return df.groupBy(*group_by).agg(*aggs)
    return df.agg(*aggs)


def fit_linear(train: DataFrame, features: list[str], label: str):
    """MLlib trainer stage (the built-in path of SURVEY §1.1's Trainer
    mapping; the reference shells out to `mlp train`,
    matdb/fitting/mtp.py:476-553 — external trainers remain external).
    Plain OLS via the normal-equation solver: deterministic, no
    iteration, exact on exactly-linear data."""
    from pyspark.ml.feature import VectorAssembler
    from pyspark.ml.regression import LinearRegression

    va = VectorAssembler(inputCols=features, outputCol="__features")
    lr = LinearRegression(
        featuresCol="__features", labelCol=label, regParam=0.0, solver="normal"
    )
    model = lr.fit(va.transform(train))
    return model, va


def predict_with(model, va, df: DataFrame, out_col: str = "prediction") -> DataFrame:
    pred = model.transform(va.transform(df))
    return pred.withColumnRenamed("prediction", out_col).drop("__features")
