"""HDF5 interop (sources/hdf5io.py; reference matdb/io.py:442-509).

The canonicalization layer is pure Python and always tested; the h5
byte layer and Spark plumbing require h5py and are skipped when it is
absent (the documented environment cut)."""

import json

import pytest

from tracy_matdb_spark.sources.hdf5io import (
    HAS_H5PY,
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


def test_gated_paths_raise_without_h5py(spark, tmp_path):
    if HAS_H5PY:
        pytest.skip("h5py present; gate not active")
    from tracy_matdb_spark.sources.hdf5io import read_atoms_h5

    with pytest.raises(ImportError, match="h5py"):
        read_atoms_h5(spark, str(tmp_path))


@pytest.mark.skipif(not HAS_H5PY, reason="h5py not installed (documented cut)")
def test_h5_byte_roundtrip(spark, tmp_path):
    from tracy_matdb_spark.sources.hdf5io import read_atoms_h5, write_atoms_h5

    df = spark.createDataFrame([ROW])
    write_atoms_h5(df, str(tmp_path / "h5"))
    back = read_atoms_h5(spark, str(tmp_path / "h5")).collect()
    assert len(back) == 1
    assert back[0]["uuid"] == "u-1" and back[0]["ref_energy"] == -3.5
