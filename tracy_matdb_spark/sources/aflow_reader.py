"""AFLOW catalog reader: paged JSON batches -> deduped DataFrame.

The reference pages through the AFLOW REST API (`aflow.search(catalog,
batch_size)` + filter/select/orderby/limit, matdb/database/aflux.py:263-316;
batch paging 168-177), dedupes on `auid` against its index, and
materializes one folder per entry. Its tests run the same path offline
against canned JSON (tests/files/aflow/data.json) — the approach here.

Spark-first shape: each REST page is landed as one JSON file (the
network boundary stays app-side, per SURVEY §3.3 — a live deployment
fetches pages to storage exactly like this fixture layout), then ONE
`spark.read.json` scan parses all pages in parallel, the DSL filter
compiles to a pushed-down Catalyst predicate, and the auid dedupe is a
hash `dropDuplicates` — no driver-side loop over entries, no index
file. At 100 TB of catalog pages the plan is: parallel JSON scan ->
map-side filter -> one shuffle on auid -> sink.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from tracy_matdb_spark.operators.aflow_dsl import aflow_query

ENTRY_SCHEMA = T.StructType(
    [
        T.StructField("auid", T.StringType()),
        T.StructField("compound", T.StringType()),
        T.StructField("Egap", T.DoubleType()),
        T.StructField("energy_atom", T.DoubleType()),
        T.StructField("spacegroup_relax", T.IntegerType()),
        T.StructField("natoms", T.IntegerType()),
        T.StructField("catalog", T.StringType()),
    ]
)


def write_pages(entries: list[dict], out_dir: str, batch_size: int = 100) -> int:
    """Land query results as page files (the reference's batch paging,
    aflux.py:168-177, with files standing in for HTTP responses)."""
    os.makedirs(out_dir, exist_ok=True)
    n_pages = 0
    for start in range(0, len(entries), batch_size):
        page = entries[start : start + batch_size]
        with open(os.path.join(out_dir, f"page-{n_pages:04d}.json"), "w") as f:
            json.dump(page, f)
        n_pages += 1
    return n_pages


def read_pages(spark: SparkSession, path: str) -> DataFrame:
    """One parallel scan over all landed pages."""
    return spark.read.schema(ENTRY_SCHEMA).option("multiLine", "true").json(
        os.path.join(path, "page-*.json")
    )


def materialize(
    spark: SparkSession,
    path: str,
    filters=None,
    select: list[str] | None = None,
    orderby: str | None = None,
    reverse: bool = False,
    limit: int | None = None,
) -> DataFrame:
    """page scan -> DSL filter -> auid dedupe -> project/sort/limit
    (the reference's _setup_configs flow, aflux.py:279-316, with
    `entry.auid in self.index` replaced by dropDuplicates)."""
    pages = read_pages(spark, path)
    deduped = pages.dropDuplicates(["auid"])
    return aflow_query(
        deduped,
        filters=filters,
        select=select,
        orderby=orderby,
        reverse=reverse,
        limit=limit,
        tiebreak="auid" if orderby else None,
    )


def aflux_url(base: str, matchbook: str, page: int, batch_size: int) -> str:
    """AFLUX request URL: `<base>?<matchbook>,paging(k,n)` — the
    reference builds exactly this pair (matdb/database/aflux.py:168-177
    via the aflow wrapper's paging calls); page numbering is 1-based."""
    sep = "" if base.endswith("?") else "?"
    mb = f"{matchbook}," if matchbook else ""
    return f"{base}{sep}{mb}paging({page},{batch_size})"


def fetch_pages(
    base: str,
    matchbook: str,
    out_dir: str,
    batch_size: int = 100,
    max_pages: int = 10000,
    retries: int = 3,
    timeout: float = 30.0,
    backoff: float = 0.25,
) -> int:
    """Live AFLUX paging: fetch page k, land it as `page-{k:04d}.json`,
    repeat while pages come back full (the reference's "extend while
    len == batch" loop, aflux.py:168-177). Returns the page count.

    The landing-zone-then-scan split is deliberate 100 TB design: the
    driver (or a fleet of fetchers) lands pages; Spark never blocks on
    the network — `read_pages` scans whatever has landed, in parallel.
    Transient HTTP failures retry with bounded backoff; a short page
    (or an empty one) terminates the loop. Works against any server
    speaking the protocol — production aflow.org or a local fixture
    server (tests/test_aflow_reader.py spins up http.server)."""
    import time
    import urllib.error
    import urllib.request

    os.makedirs(out_dir, exist_ok=True)
    n_pages = 0
    for page in range(1, max_pages + 1):
        url = aflux_url(base, matchbook, page, batch_size)
        last_err: Exception | None = None
        for attempt in range(retries + 1):
            try:
                with urllib.request.urlopen(url, timeout=timeout) as resp:
                    body = resp.read()
                break
            except (urllib.error.URLError, TimeoutError) as exc:
                last_err = exc
                if attempt == retries:
                    raise RuntimeError(
                        f"AFLUX fetch failed after {retries + 1} attempts: {url}"
                    ) from exc
                time.sleep(backoff * (2**attempt))
        entries = json.loads(body)
        if not isinstance(entries, list):  # AFLUX also serves k:v maps
            entries = list(entries.values())
        if not entries:
            break
        with open(os.path.join(out_dir, f"page-{n_pages:04d}.json"), "w") as f:
            json.dump(entries, f)
        n_pages += 1
        if len(entries) < batch_size:
            break
    return n_pages
