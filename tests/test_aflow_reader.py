"""AFLOW paged reader: page landing, parallel scan, auid dedupe, DSL.

Reference: matdb/database/aflux.py:263-316 (query build), 168-177
(batch paging); offline canned-JSON strategy from the reference's
tests/files/aflow/data.json.
"""

from tracy_matdb_spark.sources.aflow_reader import materialize, read_pages, write_pages


def _entries(n=15):
    return [
        {
            "auid": f"aflow:{i:04d}",
            "compound": f"X{i}",
            "Egap": i / 4.0,
            "energy_atom": -i / 8.0,
            "spacegroup_relax": 225 if i % 2 == 0 else 194,
            "natoms": i % 4 + 1,
            "catalog": "icsd",
        }
        for i in range(n)
    ]


def test_paging_roundtrip(spark, tmp_path):
    d = str(tmp_path / "pages")
    n_pages = write_pages(_entries(15), d, batch_size=4)
    assert n_pages == 4
    df = read_pages(spark, d)
    assert df.count() == 15
    assert set(df.columns) >= {"auid", "Egap", "spacegroup_relax"}


def test_dedupe_across_page_overlap(spark, tmp_path):
    d = str(tmp_path / "pages")
    ents = _entries(10)
    # simulate AFLOW re-serving entries across page boundaries
    write_pages(ents + ents[:3], d, batch_size=5)
    out = materialize(spark, d)
    assert out.count() == 10


def test_materialize_filter_order_limit(spark, tmp_path):
    d = str(tmp_path / "pages")
    write_pages(_entries(12), d, batch_size=5)
    out = materialize(
        spark,
        d,
        filters=["&", ["spacegroup_relax", "==", 225], ["Egap", ">", 0.0]],
        select=["auid", "Egap"],
        orderby="Egap",
        reverse=True,
        limit=3,
    ).collect()
    assert [r["auid"] for r in out] == ["aflow:0010", "aflow:0008", "aflow:0006"]
