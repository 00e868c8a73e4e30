"""Calculator-output ingest: vasprun.xml / OUTCAR / XDATCAR parsers.

Reference semantics: AsyncVasp.extract (matdb/calculators/vasp.py:473-544)
and DynamicsGroup._parse_md (matdb/database/md.py:149-228).
"""

from tracy_matdb_spark.sources import calcoutputs as CO

RUN = {
    "name": "t",
    "species": ["Ag", "Ag", "Pd"],
    "cell": [[4.0, 0.0, 0.0], [0.0, 4.0, 0.0], [0.0, 0.0, 4.0]],
    "frac_positions": [[0.0, 0.0, 0.0], [0.5, 0.5, 0.0], [0.25, 0.25, 0.5]],
    "forces": [[0.5, 0.0, 0.0], [0.0, -0.5, 0.0], [0.0, 0.0, 0.25]],
    "stress": [[1.0, 0.0, 0.0], [0.0, 0.5, 0.0], [0.0, 0.0, 0.25]],
    "stress_voigt": [1.0, 0.5, 0.25, 0.0, 0.0, 0.0],
    "volume": 64.0,
    "energy": -6.25,
    "converged": True,
}


def test_vasprun_roundtrip():
    recs = CO.parse_vasprun(CO.format_vasprun(RUN), "f.xml")
    assert len(recs) == 1
    r = recs[0]
    assert r["n"] == 3
    assert r["species"] == ["Ag", "Ag", "Pd"]
    assert r["ref_energy"] == -6.25
    assert r["converged"] is True
    # fractional -> cartesian
    assert r["positions"][1] == [2.0, 2.0, 0.0]
    # virial = stress * volume (vasp.py:531)
    assert r["ref_virial"][0][0] == 64.0
    assert r["ref_virial"][2][2] == 16.0


def test_vasprun_unconverged_flagged_not_dropped():
    rec = dict(RUN, converged=False)
    r = CO.parse_vasprun(CO.format_vasprun(rec), "f.xml")[0]
    assert r["converged"] is False
    assert r["ref_energy"] == -6.25  # asis semantics: data still extracted


def test_outcar_roundtrip():
    rec = dict(RUN)
    rec["species_types"] = ["Ag", "Pd"]
    rec["type_counts"] = [2, 1]
    rec["positions"] = [[0.0, 0.0, 0.0], [2.0, 2.0, 0.0], [1.0, 1.0, 2.0]]
    r = CO.parse_outcar(CO.format_outcar(rec), "OUTCAR")[0]
    assert r["n"] == 3
    assert r["species"] == ["Ag", "Ag", "Pd"]
    assert r["ref_energy"] == -6.25
    assert r["volume"] == 64.0
    assert r["converged"] is True
    assert r["ref_force"][2] == [0.0, 0.0, 0.25]
    # Voigt XX YY ZZ XY YZ ZX reassembled symmetric, times volume
    assert r["ref_virial"][0][0] == 64.0
    assert r["ref_virial"][0][1] == r["ref_virial"][1][0]


def test_xdatcar_frames():
    frames = [[[k / 8.0, 0.0, 0.0], [0.5, k / 4.0, 0.0]] for k in range(1, 5)]
    body = CO.format_xdatcar(RUN["cell"], ["Ag", "Pd"], [1, 1], frames)
    recs = CO.parse_xdatcar(body, "XDATCAR")
    assert [r["frame"] for r in recs] == [1, 2, 3, 4]
    assert all(r["n"] == 2 for r in recs)
    assert recs[2]["frac_positions"][0][0] == 3 / 8.0
    # scale factor multiplies the cell
    assert recs[0]["cell"] == RUN["cell"]


def test_det3_fallback_volume():
    cell = [[2.0, 0.0, 0.0], [1.0, 3.0, 0.0], [0.0, 0.5, 4.0]]
    assert CO._det3(cell) == 24.0


QE_RUN = {
    "name": "q",
    "species": ["Ag", "Pd"],
    "cell": [[8.0, 0.0, 0.0], [0.0, 8.0, 0.0], [0.0, 0.0, 8.0]],
    "positions": [[0.0, 0.0, 0.0], [4.0, 4.0, 4.0]],
    "forces": [[0.25, -0.125, 0.0], [0.0625, 0.0, -0.75]],
    "stress": [[0.5, 0.0, 0.0], [0.0, 0.25, 0.0], [0.0, 0.0, 0.125]],
    "energy": -15.625,
    "scf_error": 2**-30,
}


def test_pwscf_roundtrip():
    """pw.x XML extract semantics (Qe.extract/_read, qe.py:306-446)."""
    r = CO.parse_pwscf_xml(CO.format_pwscf_xml(QE_RUN), "pwscf_q.xml")[0]
    assert r["n"] == 2
    assert r["species"] == ["Ag", "Pd"]
    assert r["ref_energy"] == -15.625
    assert r["positions"] == QE_RUN["positions"]  # cartesian, NOT last-only
    assert r["volume"] == 512.0
    assert r["scf_error"] == 2**-30
    assert r["converged"] is True
    assert r["ref_force"] == QE_RUN["forces"]
    # virial = stress * (V^(1/3)/bohr)^3 * V (qe.py:333-340)
    scale = CO._qe_stress_scale(512.0)
    assert r["ref_virial"][0][0] == (0.5 * scale) * 512.0
    assert r["ref_virial"][1][2] == 0.0


def test_pwscf_unconverged_flagged_not_dropped():
    rec = dict(QE_RUN, scf_error=0.03125)
    r = CO.parse_pwscf_xml(CO.format_pwscf_xml(rec), "p.xml")[0]
    assert r["converged"] is False
    assert r["scf_error"] == 0.03125
    assert r["ref_energy"] == -15.625  # asis semantics: data still extracted
