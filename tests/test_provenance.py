"""Provenance manifests + versioned split archiving.

Reference: dbcat sidecar JSON (matdb/utility.py:933-983), dbconfig
(database/utility.py:167-183), re-split archiving (…:76-87).
"""

import os

from tracy_matdb_spark.plans import provenance as P


def test_manifest_roundtrip(tmp_path):
    d = str(tmp_path / "tbl")
    m = P.write_manifest(d, sources=[], kind="test", params={"a": 1})
    back = P.read_manifest(d)
    assert back["version"] == m["version"]
    assert back["params"] == {"a": 1}
    assert back["engine"] == P.ENGINE_VERSION


def test_manifest_source_version_chaining(tmp_path):
    src = str(tmp_path / "src")
    srcm = P.write_manifest(src)
    dst = str(tmp_path / "dst")
    m = P.write_manifest(dst, sources=[src, str(tmp_path / "missing")])
    assert m["sources"][0] == [src, srcm["version"]] or m["sources"][0] == (src, srcm["version"])
    # unknown source -> version None, mirroring dbconfig's get(None)
    assert m["sources"][1][1] is None


def test_dbcat_concat_and_manifest(spark, tmp_path):
    a = spark.range(3).toDF("id")
    b = spark.range(3, 7).toDF("id")
    out = str(tmp_path / "cat")
    m = P.dbcat([a, b], out, sources=[], splits="none")
    assert spark.read.parquet(out).count() == 7
    assert (P.read_manifest(out) or {})["version"] == m["version"]
    # sidecar must be invisible to parquet readers
    assert os.path.exists(os.path.join(out, P.MANIFEST_NAME))


def test_version_partitions(tmp_path):
    root = str(tmp_path / "split_assignments")
    assert P.list_versions(root) == []
    assert P.next_version(root) == 1
    os.makedirs(P.version_dir(root, 1))
    os.makedirs(P.version_dir(root, 2))
    assert P.list_versions(root) == [1, 2]
    assert P.next_version(root) == 3
