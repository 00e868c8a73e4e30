"""Pipeline (Controller/Database/Group) lifecycle tests."""

from __future__ import annotations

import os

from tracy_matdb_spark.plans.pipeline import Pipeline
from tracy_matdb_spark.plans.spec import expand_grid, read_spec, special_values

SPEC = {
    "ran_seed": 42,
    "databases": {
        "demo": {
            "steps": [
                {"type": "distortion", "name": "dist", "params": {"nconfigs": 5, "sigma*": [0.02, 0.05]}},
                {"type": "vacancy", "name": "vac", "splittable": False},
            ]
        }
    },
}


def test_special_values():
    assert special_values("linspace(0,1,3)") == [0.0, 0.5, 1.0]
    assert special_values("range(0,3)") == [0.0, 1.0, 2.0]
    assert special_values("range(0,1,0.5)") == [0.0, 0.5]
    assert len(special_values("random:4")) == 4
    assert special_values("random:4") == special_values("random:4")  # deterministic
    assert special_values(7) == 7
    vals = special_values("logspace(0,2,3)")
    assert vals == [1.0, 10.0, 100.0]


def test_expand_grid_suffixes():
    combos = expand_grid({"nconfigs": 5, "sigma*": [0.02, 0.05], "lat*": ["fcc", "bcc"]})
    assert len(combos) == 4
    suffixes = [s for s, _ in combos]
    assert suffixes == ["lat-fcc-sigma-0.02", "lat-fcc-sigma-0.05", "lat-bcc-sigma-0.02", "lat-bcc-sigma-0.05"]
    assert all(c["nconfigs"] == 5 for _, c in combos)


def test_spec_link_includes(tmp_path):
    child = tmp_path / "calc.yml"
    child.write_text("kind: vasp\nencut: 400\n")
    parent = tmp_path / "main.yml"
    parent.write_text("name: demo\ncalculator: 'spec:calc.yml'\n")
    spec = read_spec(str(parent))
    assert spec["calculator"] == {"kind": "vasp", "encut": 400}


def test_pipeline_end_to_end(spark, tmp_path):
    out = str(tmp_path / "catalog")
    p = Pipeline(SPEC, out)
    p.setup(spark)

    # grid expansion -> two distortion groups + one vacancy group
    assert p.find(spark, "demo/dist-*") == ["demo/dist-sigma-0.02", "demo/dist-sigma-0.05"]
    assert p.find(spark, "*/vac") == ["demo/vac"]

    status = {r["group_name"]: r for r in p.status(spark).collect()}
    assert status["dist-sigma-0.02"]["n_configs"] == 15  # 3 seeds x 5
    assert status["dist-sigma-0.05"]["n_configs"] == 15
    # vacancy is seeded by the distortion rset (30 configs carrying n_atoms)
    assert status["vac"]["n_configs"] > 0
    for r in status.values():
        assert r["n_configs"] == r["n_unique"]

    # deterministic: rerun produces identical group hashes
    h1 = {(r["database"], r["group_name"]): r["group_hash"] for r in p.group_hashes(spark).collect()}
    p2 = Pipeline(SPEC, str(tmp_path / "catalog2"))
    p2.setup(spark)
    h2 = {(r["database"], r["group_name"]): r["group_hash"] for r in p2.group_hashes(spark).collect()}
    assert h1 == h2
    assert p.verify(spark, h1)

    # splits: splittable groups partitioned, unsplittable all-train
    assignments = p.split(spark, {"A": 0.4})
    pdf = assignments.toPandas()
    cfg = p.configurations(spark).toPandas()
    vac_uuids = set(cfg[cfg.group_name == "vac"].uuid)
    vac_rows = pdf[pdf.uuid.isin(vac_uuids)]
    assert (vac_rows.label == "train").all()
    dist_rows = pdf[~pdf.uuid.isin(vac_uuids)]
    assert set(dist_rows.label) == {"train", "holdout", "super"}

    # partition layout is the catalog: group dirs exist on disk
    assert os.path.isdir(os.path.join(out, "configurations", "database=demo", "group_name=vac"))


def test_special_functions_variants():
    import math

    import pytest

    from tracy_matdb_spark.plans.spec import special_functions

    assert special_functions("math:sqrt", 16.0) == 4.0
    assert special_functions({"func": "linalg:det", "reshape": [2, 2]}, [2, 0, 0, 3]) == 6.0
    assert special_functions("numpy:prod", [2, 3, 4]) == 24
    with pytest.raises(ValueError):
        special_functions("nosuchmod:fn", 1)
    with pytest.raises(ValueError):
        special_functions(12, 1)


def test_expand_grid_suffix_directives():
    from tracy_matdb_spark.plans.spec import expand_grid

    # format-string directive
    combos = expand_grid({"temp*": [100, 200], "temp_suffix": "T{0}K"})
    assert [s for s, _ in combos] == ["tem-T100K", "tem-T200K"]
    # indexed list directive
    combos = expand_grid({"temp*": [100, 200], "temp_suffix*": ["lo", "hi"]})
    assert [s for s, _ in combos] == ["tem-lo", "tem-hi"]
    # _suffix* keys must not become grid dimensions
    assert all(set(c) == {"temp", "temp_suffix"} or set(c) == {"temp"} for _, c in combos)
    # default naming unchanged without directives
    combos = expand_grid({"sigma*": [0.02, 0.05]})
    assert [s for s, _ in combos] == ["sigma-0.02", "sigma-0.05"]


def test_finalize_snapshot_versions(spark, tmp_path):
    from tracy_matdb_spark.plans import provenance as P
    from tracy_matdb_spark.plans.pipeline import Pipeline

    spec = {
        "ran_seed": 5,
        "databases": {
            "m": {"steps": [{"type": "vacancy", "name": "v", "params": {}, "chain": False}]}
        },
    }
    import os

    d = str(tmp_path / "pipe")
    p = Pipeline(spec, d)
    p.setup(spark)
    s1 = p.finalize(spark)
    s2 = p.finalize(spark)
    assert s1.count() == s2.count() == 1
    assert P.list_versions(os.path.join(d, "final")) == [1, 2]
    # dfilter narrows the snapshot
    assert p.finalize(spark, dfilter="nomatch*").count() == 0
