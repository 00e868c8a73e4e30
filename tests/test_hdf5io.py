"""HDF5 interop (sources/hdf5io.py; reference matdb/io.py:442-509).

The canonicalization layer is pure Python; the h5 byte layer runs on
h5py when installed and on the pure-Python hdf5lite subset otherwise
(this image), so the Spark write -> scan -> parse path is always
exercised."""

import json

from tracy_matdb_spark.sources.hdf5io import (
    record_to_tree,
    tree_to_record,
)

ROW = {
    "uuid": "u-1",
    "n": 2,
    "symbols": "AgPd",
    "species": ["Ag", "Pd"],
    "cell": [[4.0, 0.0, 0.0], [0.0, 4.0, 0.0], [0.0, 0.0, 4.0]],
    "positions": [[0.0, 0.0, 0.0], [2.0, 2.0, 2.0]],
    "pbc": [True, True, True],
    "ref_energy": -3.5,
    "ref_force": [[0.0, 0.1, 0.0], [0.0, -0.1, 0.0]],
    "params": {"config_type": "manual"},
    "source_file": "",
}


def test_tree_roundtrip_preserves_record():
    tree = record_to_tree(ROW)
    # reference layout: hot quantities live under params/properties groups
    assert tree["params"]["ref_energy"] == -3.5
    assert tree["properties"]["ref_force"] == ROW["ref_force"]
    back = tree_to_record(tree)
    for k in ("uuid", "n", "symbols", "species", "cell", "positions", "pbc",
              "ref_energy", "ref_force"):
        assert back[k] == ROW[k], k
    assert back["params"]["config_type"] == "manual"


def test_tree_roundtrip_none_energy_and_residual_props():
    row = dict(ROW, ref_energy=None, ref_force=None, params={})
    tree = record_to_tree(row)
    assert "ref_energy" not in tree["params"]
    tree["properties"]["vasp_hessian"] = [[1.0, 2.0]]  # open per-atom tail
    back = tree_to_record(tree)
    assert back["ref_energy"] is None and back["ref_force"] is None
    assert json.loads(back["params"]["prop:vasp_hessian"]) == [[1.0, 2.0]]


def test_h5_byte_roundtrip_through_spark(spark, tmp_path):
    """Executor-side write -> binaryFile scan -> mapInPandas parse, on
    whichever byte backend the image has (hdf5lite here; h5py when
    installed — same file subset either way)."""
    from tracy_matdb_spark.sources.hdf5io import read_atoms_h5, write_atoms_h5

    rows = [ROW, dict(ROW, uuid="u-2", ref_energy=1.25, params={})]
    df = spark.createDataFrame(rows)
    write_atoms_h5(df, str(tmp_path / "h5"))
    back = {r["uuid"]: r for r in read_atoms_h5(spark, str(tmp_path / "h5")).collect()}
    assert set(back) == {"u-1", "u-2"}
    assert back["u-1"]["ref_energy"] == -3.5
    assert back["u-1"]["species"] == ["Ag", "Pd"]
    assert back["u-1"]["pbc"] == [True, True, True]
    assert [list(r) for r in back["u-1"]["ref_force"]] == ROW["ref_force"]
    assert back["u-1"]["params"]["config_type"] == "manual"
    assert back["u-2"]["ref_energy"] == 1.25
    assert back["u-2"]["source_file"].endswith("u-2.h5")


def test_h5_dir_to_parquet_migration(spark, tmp_path):
    from tracy_matdb_spark.sources.hdf5io import atoms_h5_dir_to_parquet, write_atoms_h5

    write_atoms_h5(spark.createDataFrame([ROW]), str(tmp_path / "h5"))
    atoms_h5_dir_to_parquet(spark, str(tmp_path / "h5"), str(tmp_path / "pq"))
    pq = spark.read.parquet(str(tmp_path / "pq")).collect()
    assert len(pq) == 1 and pq[0]["uuid"] == "u-1" and pq[0]["n"] == 2
