"""CORRECTNESS registrations for calculator-output ingest.

Fixture strategy (mirrors the reference's test harness, which fabricates
completed VASP outputs rather than running DFT — tests/conftest.py:3-69):
deterministic fake vasprun.xml / OUTCAR / XDATCAR files are written to
/tmp with exact dyadic-rational values, ingested through the real
binaryFile + mapInPandas readers, and compared to oracle VALUES computed
directly from the literal fixture records. All text formatting uses
%.10g on dyadic rationals, so parse -> compute is bit-exact.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tracy_matdb_spark.queries import register

from tracy_matdb_spark.fixtures import FIXTURE_ROOT  # noqa: F401  (pid-suffixed, see fixtures.py)

# ---------------------------------------------------------------------------
# VASP fixtures: (name, record) with fractional positions and Voigt stress
# ---------------------------------------------------------------------------

VASP_RUNS: list[dict] = [
    {
        "name": "run_a",
        "species": ["Ag", "Pd"],
        "cell": [[4.0, 0.0, 0.0], [0.0, 4.0, 0.0], [0.0, 0.0, 4.0]],
        "frac_positions": [[0.0, 0.0, 0.0], [0.5, 0.5, 0.5]],
        "forces": [[0.5, -0.25, 0.0], [0.125, 0.0, -1.5]],
        # full 3x3 stress for vasprun; Voigt (XX YY ZZ XY YZ ZX) for OUTCAR
        "stress": [[1.0, 0.125, 0.0], [0.125, 0.5, -0.25], [0.0, -0.25, 0.25]],
        "stress_voigt": [1.0, 0.5, 0.25, 0.125, -0.25, 0.0],
        "volume": 64.0,
        "energy": -3.5,
        "converged": True,
    },
    {
        "name": "run_b",
        "species": ["Cu"],
        "cell": [[2.0, 0.0, 0.0], [0.0, 2.0, 0.0], [0.0, 0.0, 2.0]],
        "frac_positions": [[0.25, 0.5, 0.75]],
        "forces": [[0.0, 0.0, 0.0]],
        "stress": [[0.5, 0.0, 0.0], [0.0, 0.5, 0.0], [0.0, 0.0, 0.5]],
        "stress_voigt": [0.5, 0.5, 0.5, 0.0, 0.0, 0.0],
        "volume": 8.0,
        "energy": 0.625,
        "converged": False,
    },
]


def _write_vasp_fixture(kind: str) -> str:
    from tracy_matdb_spark.sources.calcoutputs import format_outcar, format_vasprun

    out_dir = os.path.join(FIXTURE_ROOT, kind)
    os.makedirs(out_dir, exist_ok=True)
    for run in VASP_RUNS:
        if kind == "vasprun":
            body = format_vasprun(run)
            fname = f"vasprun_{run['name']}.xml"
        else:
            rec = dict(run)
            rec["species_types"] = sorted(set(run["species"]), key=run["species"].index)
            rec["type_counts"] = [run["species"].count(s) for s in rec["species_types"]]
            rec["positions"] = [
                [sum(f * c[k] for f, c in zip(fp, run["cell"])) for k in range(3)]
                for fp in run["frac_positions"]
            ]
            body = format_outcar(rec)
            fname = f"OUTCAR.{run['name']}"
        with open(os.path.join(out_dir, fname), "w") as f:
            f.write(body)
    return out_dir


def _extract_projection(df: DataFrame) -> DataFrame:
    """Flatten an EXTRACT_SCHEMA DataFrame to exact-comparable scalars."""
    return df.select(
        F.regexp_extract("source_file", r"(run_[ab])", 1).alias("run"),
        "n",
        "ref_energy",
        "volume",
        "converged",
        F.expr("aggregate(flatten(ref_force), cast(0 as double), (a, x) -> a + x)").alias("force_sum"),
        F.expr("aggregate(flatten(ref_virial), cast(0 as double), (a, x) -> a + x)").alias("virial_sum"),
        F.expr("aggregate(flatten(positions), cast(0 as double), (a, x) -> a + x)").alias("pos_sum"),
    ).orderBy("run")


def _extract_oracle_sql() -> str:
    rows = []
    for run in VASP_RUNS:
        cart = [
            [sum(f * c[k] for f, c in zip(fp, run["cell"])) for k in range(3)]
            for fp in run["frac_positions"]
        ]
        force_sum = sum(v for row in run["forces"] for v in row)
        virial_sum = sum(v * run["volume"] for row in run["stress"] for v in row)
        pos_sum = sum(v for row in cart for v in row)
        rows.append(
            f"('{run['name']}', {len(run['species'])}, {run['energy']!r}, "
            f"{run['volume']!r}, {str(run['converged']).lower()}, "
            f"{force_sum!r}, {virial_sum!r}, {pos_sum!r})"
        )
    return f"""
    SELECT run, n, cast(ref_energy as double) AS ref_energy,
           cast(volume as double) AS volume, converged,
           cast(force_sum as double) AS force_sum,
           cast(virial_sum as double) AS virial_sum,
           cast(pos_sum as double) AS pos_sum
    FROM (VALUES {', '.join(rows)})
         t(run, n, ref_energy, volume, converged, force_sum, virial_sum, pos_sum)
    ORDER BY run
    """


@register(
    "vasp_extract",
    oracle=_extract_oracle_sql(),
    doc="vasprun.xml result extraction: E/F/S -> ref_energy/ref_force/"
    "ref_virial with virial = stress * volume (AsyncVasp.extract, "
    "matdb/calculators/vasp.py:473-544)",
)
def vasp_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tracy_matdb_spark.sources.calcoutputs import read_vasprun

    out_dir = _write_vasp_fixture("vasprun")
    return _extract_projection(read_vasprun(spark, out_dir))


@register(
    "outcar_extract",
    oracle=_extract_oracle_sql(),
    doc="OUTCAR result extraction (TOTEN / TOTAL-FORCE / FORCE-on-cell "
    "stress), same semantics as vasp_extract via the text path "
    "(matdb/calculators/vasp.py:506-532)",
)
def outcar_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tracy_matdb_spark.sources.calcoutputs import read_outcar

    out_dir = _write_vasp_fixture("outcar")
    df = read_outcar(spark, out_dir)
    # OUTCAR has no explicit convergence flag for run_b's fixture; the
    # marker line is only written for converged runs — same projection.
    return _extract_projection(df)


# ---------------------------------------------------------------------------
# Quantum Espresso pw.x XML fixtures (dyadic rationals -> %.10g round-trips
# exactly; virial arithmetic shared with the parser via _qe_stress_scale)
# ---------------------------------------------------------------------------

QE_RUNS: list[dict] = [
    {
        "name": "run_a",
        "species": ["Ag", "Pd"],
        # pw.x cell rows a1..a3 (Bohr); positions cartesian
        "cell": [[8.0, 0.0, 0.0], [0.0, 8.0, 0.0], [0.0, 0.0, 8.0]],
        "positions": [[0.0, 0.0, 0.0], [4.0, 4.0, 4.0]],
        "forces": [[0.25, -0.125, 0.0], [0.0625, 0.0, -0.75]],
        "stress": [[0.5, 0.0625, 0.0], [0.0625, 0.25, -0.125], [0.0, -0.125, 0.125]],
        "energy": -15.625,
        "scf_error": 2**-30,  # < QE_CONV_THR -> converged
    },
    {
        "name": "run_b",
        "species": ["Cu"],
        "cell": [[4.0, 0.0, 0.0], [0.0, 4.0, 0.0], [0.0, 0.0, 4.0]],
        "positions": [[1.0, 2.0, 3.0]],
        "forces": [[0.0, 0.5, -0.5]],
        "stress": [[0.25, 0.0, 0.0], [0.0, 0.25, 0.0], [0.0, 0.0, 0.25]],
        "energy": 1.375,
        "scf_error": 0.03125,  # >= QE_CONV_THR -> not converged
    },
]


def _write_qe_fixture() -> str:
    from tracy_matdb_spark.sources.calcoutputs import format_pwscf_xml

    out_dir = os.path.join(FIXTURE_ROOT, "pwscf")
    os.makedirs(out_dir, exist_ok=True)
    for run in QE_RUNS:
        with open(os.path.join(out_dir, f"pwscf_{run['name']}.xml"), "w") as f:
            f.write(format_pwscf_xml(run))
    return out_dir


def _qe_oracle_sql() -> str:
    from tracy_matdb_spark.sources.calcoutputs import (
        QE_CONV_THR,
        _qe_stress_scale,
    )

    rows = []
    for run in QE_RUNS:
        cell = run["cell"]
        volume = (
            cell[0][0] * (cell[1][1] * cell[2][2] - cell[1][2] * cell[2][1])
            - cell[0][1] * (cell[1][0] * cell[2][2] - cell[1][2] * cell[2][0])
            + cell[0][2] * (cell[1][0] * cell[2][1] - cell[1][1] * cell[2][0])
        )
        scale = _qe_stress_scale(volume)
        force_sum = sum(v for row in run["forces"] for v in row)
        virial_sum = sum((s * scale) * volume for row in run["stress"] for s in row)
        pos_sum = sum(v for row in run["positions"] for v in row)
        conv = run["scf_error"] < QE_CONV_THR
        rows.append(
            f"('{run['name']}', {len(run['species'])}, {run['energy']!r}, "
            f"{volume!r}, {str(conv).lower()}, {run['scf_error']!r}, "
            f"{force_sum!r}, {virial_sum!r}, {pos_sum!r})"
        )
    return f"""
    SELECT run, n, cast(ref_energy as double) AS ref_energy,
           cast(volume as double) AS volume, converged,
           cast(scf_error as double) AS scf_error,
           cast(force_sum as double) AS force_sum,
           cast(virial_sum as double) AS virial_sum,
           cast(pos_sum as double) AS pos_sum
    FROM (VALUES {', '.join(rows)})
         t(run, n, ref_energy, volume, converged, scf_error, force_sum,
           virial_sum, pos_sum)
    ORDER BY run
    """


@register(
    "qe_extract",
    oracle=_qe_oracle_sql(),
    doc="Quantum Espresso pw.x XML extraction: etot/forces/stress -> "
    "ref_energy/ref_force/ref_virial with S = stress*(V^(1/3)/bohr)^3 "
    "and virial = S*V, scf_error kept as a column (Qe.extract/_read, "
    "matdb/calculators/qe.py:306-446)",
)
def qe_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tracy_matdb_spark.sources.calcoutputs import read_pwscf

    out_dir = _write_qe_fixture()
    df = read_pwscf(spark, out_dir)
    return df.select(
        F.regexp_extract("source_file", r"(run_[ab])", 1).alias("run"),
        "n",
        "ref_energy",
        "volume",
        "converged",
        "scf_error",
        F.expr("aggregate(flatten(ref_force), cast(0 as double), (a, x) -> a + x)").alias("force_sum"),
        F.expr("aggregate(flatten(ref_virial), cast(0 as double), (a, x) -> a + x)").alias("virial_sum"),
        F.expr("aggregate(flatten(positions), cast(0 as double), (a, x) -> a + x)").alias("pos_sum"),
    ).orderBy("run")


# ---------------------------------------------------------------------------
# XDATCAR trajectory parse + subsample
# ---------------------------------------------------------------------------

XD_NFRAMES = 10
XD_SAMPLERATE = 3
XD_CELL = [[8.0, 0.0, 0.0], [0.0, 8.0, 0.0], [0.0, 0.0, 8.0]]


def _xd_frac(frame: int) -> list[list[float]]:
    """Deterministic dyadic per-frame positions: atom a coord k moves by
    frame/16 * (a+1) / (k+1 as power of two) — all exact in doubles."""
    return [
        [((frame * (a + 1)) % 16) / 16.0, ((frame + a) % 8) / 8.0, (frame % 4) / 4.0]
        for a in range(3)
    ]


def _write_xdatcar_fixture() -> str:
    from tracy_matdb_spark.sources.calcoutputs import format_xdatcar

    out_dir = os.path.join(FIXTURE_ROOT, "xdatcar")
    os.makedirs(out_dir, exist_ok=True)
    frames = [_xd_frac(k) for k in range(1, XD_NFRAMES + 1)]
    body = format_xdatcar(XD_CELL, ["Ag", "Pd"], [2, 1], frames)
    with open(os.path.join(out_dir, "XDATCAR"), "w") as f:
        f.write(body)
    return out_dir


def _xdatcar_oracle_sql() -> str:
    rows = []
    for k in range(1, XD_NFRAMES + 1):
        if k % XD_SAMPLERATE != 0:
            continue
        pos_sum = sum(v for row in _xd_frac(k) for v in row)
        rows.append(f"({k}, 3, 'Ag,Ag,Pd', {pos_sum!r})")
    return f"""
    SELECT frame, n, species_str, cast(pos_sum as double) AS pos_sum
    FROM (VALUES {', '.join(rows)}) t(frame, n, species_str, pos_sum)
    ORDER BY frame
    """


@register(
    "md_xdatcar_subsample",
    oracle=_xdatcar_oracle_sql(),
    doc="XDATCAR trajectory parse -> every samplerate-th frame as a "
    "Catalyst filter (DynamicsGroup._parse_md, matdb/database/md.py:149-228)",
)
def md_xdatcar_subsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tracy_matdb_spark.sources.calcoutputs import read_xdatcar

    out_dir = _write_xdatcar_fixture()
    frames = read_xdatcar(spark, out_dir)
    return (
        frames.filter(F.col("frame") % XD_SAMPLERATE == 0)
        .select(
            "frame",
            "n",
            F.concat_ws(",", "species").alias("species_str"),
            F.expr("aggregate(flatten(frac_positions), cast(0 as double), (a, x) -> a + x)").alias(
                "pos_sum"
            ),
        )
        .orderBy("frame")
    )


# ---------------------------------------------------------------------------
# AFLOW paged materialize (sources/aflow_reader.py; reference
# matdb/database/aflux.py:263-316, paging 168-177)
# ---------------------------------------------------------------------------

AFLOW_SPACEGROUPS = [225, 221, 194, 139, 123]


def _aflow_entries() -> list[dict]:
    """Deterministic canned catalog (the reference's
    tests/files/aflow/data.json approach): 26 distinct auids, with the
    last two entries of each page repeated at the start of the next —
    the overlap AFLOW paging can serve — so the auid dedupe is load-
    bearing. All numeric values dyadic."""
    base = []
    for i in range(26):
        base.append(
            {
                "auid": f"aflow:{i:04d}",
                "compound": f"Ag{i % 3 + 1}Pd{(i * 7) % 5 + 1}",
                "Egap": (i % 8) / 4.0,
                "energy_atom": -(i % 16) / 8.0 - 1.0,
                "spacegroup_relax": AFLOW_SPACEGROUPS[i % 5],
                "natoms": i % 6 + 1,
                "catalog": "icsd",
            }
        )
    pages: list[dict] = []
    for start in range(0, 26, 10):
        if start:
            pages.extend(base[start - 2 : start])  # page-boundary repeats
        pages.extend(base[start : start + 10])
    return pages


def _aflow_oracle_sql() -> str:
    rows = []
    seen = set()
    for e in _aflow_entries():
        if e["auid"] in seen:
            continue
        seen.add(e["auid"])
        rows.append(
            f"('{e['auid']}', '{e['compound']}', {e['Egap']!r}, {e['energy_atom']!r}, "
            f"{e['spacegroup_relax']}, {e['natoms']})"
        )
    return f"""
    SELECT auid, compound, cast(Egap as double) AS Egap,
           cast(energy_atom as double) AS energy_atom
    FROM (VALUES {', '.join(rows)})
         t(auid, compound, Egap, energy_atom, spacegroup_relax, natoms)
    WHERE Egap > 0 AND spacegroup_relax = 225
    ORDER BY energy_atom ASC, auid
    LIMIT 4
    """


@register(
    "aflow_materialize",
    oracle=_aflow_oracle_sql(),
    doc="AFLOW paged-catalog materialize: parallel page scan -> DSL filter "
    "-> auid dedupe -> orderby/limit (matdb/database/aflux.py:263-316)",
)
def aflow_materialize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tracy_matdb_spark.sources.aflow_reader import materialize, write_pages

    out_dir = os.path.join(FIXTURE_ROOT, "aflow_pages")
    write_pages(_aflow_entries(), out_dir, batch_size=12)
    return materialize(
        spark,
        out_dir,
        filters=["&", ["Egap", ">", 0.0], ["spacegroup_relax", "==", 225]],
        select=["auid", "compound", "Egap", "energy_atom"],
        orderby="energy_atom",
        limit=4,
    )


@register(
    "liquid_group",
    # frames 3/6/9 of the 10-frame fixture survive samplerate=3; config
    # ids are frame/samplerate; pos sums recomputed from the fixture
    # closed form.
    oracle=f"""
    SELECT * FROM (VALUES
        {', '.join(
            f"({k // 3}, {k}, 3, 'liq', {sum(v for row in _xd_frac(k) for v in row)!r})"
            for k in (3, 6, 9)
        )}
    ) t(config_id, frame, n, config_type, pos_sum)
    ORDER BY config_id
    """,
    doc="LiquidGroup: DFT config per subsampled MD frame, downstream of "
    "the trajectory parse (matdb/database/liquid.py:24-116)",
)
def liquid_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tracy_matdb_spark.operators.generators import liquid_transform
    from tracy_matdb_spark.sources.calcoutputs import read_xdatcar

    out_dir = _write_xdatcar_fixture()
    liq = liquid_transform(read_xdatcar(spark, out_dir), samplerate=XD_SAMPLERATE)
    return liq.select(
        "config_id",
        "frame",
        "n",
        "config_type",
        F.expr("aggregate(flatten(frac_positions), cast(0 as double), (a, x) -> a + x)").alias(
            "pos_sum"
        ),
    ).orderBy("config_id")


@register(
    "run_state_rollup",
    # expected configs run_a/run_b/run_c vs the two extracted fixture
    # outputs: run_a converged -> done, run_b unconverged -> failed,
    # run_c has no output -> pending.
    oracle="""
    SELECT * FROM (VALUES
        ('done', cast(1 as bigint)), ('failed', cast(1 as bigint)),
        ('pending', cast(1 as bigint))
    ) t(state, n_configs)
    ORDER BY state
    """,
    doc="Run-state derivation: expected-config catalog LEFT JOIN extracted "
    "results -> pending/running/done/failed, replacing filesystem polling "
    "(matdb/database/__init__.py:539-554, calculators/vasp.py:405-446)",
)
def run_state_rollup_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tracy_matdb_spark.operators.runstate import derive_run_state, run_state_rollup
    from tracy_matdb_spark.sources.calcoutputs import read_vasprun

    out_dir = _write_vasp_fixture("vasprun")
    extracted = read_vasprun(spark, out_dir).withColumn(
        "run_id", F.regexp_extract("source_file", r"(run_[a-z])\.xml$", 1)
    )
    expected = spark.createDataFrame(
        [("run_a",), ("run_b",), ("run_c",)], "run_id string"
    )
    states = derive_run_state(expected, extracted)
    return run_state_rollup(states)


# ---------------------------------------------------------------------------
# JSONL corpus ingest round-trip (the dominant LLM-corpus interchange format)
# ---------------------------------------------------------------------------


@register(
    "jsonl_roundtrip",
    oracle="""
    SELECT source, cast(count(*) as bigint) AS n_docs,
           cast(sum(n_chars) as bigint) AS sum_chars,
           cast(sum(length(text)) as bigint) AS sum_text_len
    FROM documents WHERE doc_id < 100
    GROUP BY source
    ORDER BY source
    """,
    doc="documents slice -> df.write.json (one JSON object per line, the "
    "LLM-corpus interchange format) -> spark.read.json with an explicit "
    "schema -> per-source rollup. The oracle aggregates the ORIGINAL "
    "parquet directly, so any lossiness in the JSON writer, the reader, "
    "or string escaping breaks parity. The explicit read schema skips "
    "the inference pass (one scan, not two) — the 100 TB ingest path.",
)
def jsonl_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tracy_matdb_spark.catalog import load

    out = os.path.join(FIXTURE_ROOT, "jsonl_docs")
    docs = load(spark, sf_dir, ("documents",))["documents"].filter(F.col("doc_id") < 100)
    docs.write.mode("overwrite").json(out)
    back = spark.read.schema(
        "doc_id bigint, text string, lang string, source string, n_chars bigint"
    ).json(out)
    return (
        back.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
            F.sum(F.length("text")).alias("sum_text_len"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# WARC ingestion (Common Crawl path; sources/warc.py)
# ---------------------------------------------------------------------------

# Deterministic crawl fixture: two gzip segments (per-record members,
# the CC layout) + one uncompressed segment; bodies avoid single quotes
# so the VALUES oracle below can embed them verbatim.
WARC_FIXTURE: list[tuple[str, bool, list[dict]]] = [
    (
        "seg-00000.warc.gz",
        True,
        [
            {
                "url": "http://example.com/a",
                "date": "2026-01-01T00:00:00Z",
                "body": "<html><head><title>Alpha</title><script>var x = 1;"
                "</script></head><body><p>Hello crawl world.</p>"
                "<p>Second &amp; final paragraph.</p></body></html>",
            },
            {
                "url": "http://example.com/missing",
                "date": "2026-01-01T00:00:01Z",
                "status": 404,
                "body": "<html><body>Not found</body></html>",
            },
        ],
    ),
    (
        "seg-00001.warc.gz",
        True,
        [
            {
                "url": "http://example.org/b",
                "date": "2026-01-01T00:01:00Z",
                "content_type": "text/plain",
                "body": "plain text record, no markup at all",
            },
        ],
    ),
    (
        "seg-00002.warc",
        False,
        [
            {
                "url": "http://example.net/c",
                "date": "2026-01-01T00:02:00Z",
                "body": "<html><body><h1>Gamma</h1>A body with\r\n\r\n"
                "a blank line inside it.</body></html>",
            },
        ],
    ),
    (
        # a later re-crawl: one byte-identical re-fetch of /a plus a
        # case/port variant whose CANONICAL url collides with it — the
        # e2e rollup must dedup both against seg-00000's copy
        "seg-00003.warc.gz",
        True,
        [
            {
                "url": "http://example.com/a",
                "date": "2026-01-02T00:00:00Z",
                "body": "<html><head><title>Alpha</title><script>var x = 1;"
                "</script></head><body><p>Hello crawl world.</p>"
                "<p>Second &amp; final paragraph.</p></body></html>",
            },
            {
                "url": "HTTP://EXAMPLE.COM:80/a",
                "date": "2026-01-02T00:00:01Z",
                "body": "<html><body><p>Recrawled alpha variant.</p></body></html>",
            },
        ],
    ),
]


def _write_warc_fixture() -> str:
    from tracy_matdb_spark.sources.warc import write_warc

    out_dir = os.path.join(FIXTURE_ROOT, "warc")
    os.makedirs(out_dir, exist_ok=True)
    for fname, gz, recs in WARC_FIXTURE:
        write_warc(os.path.join(out_dir, fname), recs, gzip_members=gz)
    return out_dir


def _warc_raw_cte() -> str:
    """The fixture's raw parsed rows as a VALUES CTE, derived at
    registration time by running the (pure-Python) parser on the bytes
    the writer produces — shared by every WARC oracle, so a fixture
    change updates all of them consistently."""
    from tracy_matdb_spark.sources.warc import parse_warc_bytes, write_warc

    import tempfile

    rows = []
    with tempfile.TemporaryDirectory() as td:
        for fname, gz, recs in WARC_FIXTURE:
            p = os.path.join(td, fname)
            write_warc(p, recs, gzip_members=gz)
            with open(p, "rb") as f:
                rows.extend(parse_warc_bytes(f.read(), fname))
    vals = ",\n        ".join(
        "('{f}', {s}, '{u}', {st}, '{ct}', '{b}', {n})".format(
            f=r["source_file"],
            s=r["record_seq"],
            u=r["url"],
            st=r["http_status"],
            ct=r["content_type"],
            b=r["body"].replace("\r\n", "' || chr(13) || chr(10) || '"),
            n=r["n_bytes"],
        )
        for r in rows
    )
    return f"""raw(source_file, record_seq, url, http_status, content_type,
             body, n_bytes) AS (VALUES
        {vals})"""


def _warc_oracle_sql() -> str:
    """Extraction oracle: the raw CTE + the SAME html->text regex chain
    the Spark side uses, so the extraction logic itself is what parity
    exercises."""
    from tracy_matdb_spark.operators import textops

    text = textops.html_to_text_expr("duckdb", "body")
    return f"""
    WITH {_warc_raw_cte()}
    SELECT source_file, cast(record_seq as int) AS record_seq, url,
           cast(http_status as int) AS http_status,
           cast(n_bytes as bigint) AS n_bytes,
           CASE WHEN content_type LIKE 'text/html%'
                THEN {text} ELSE body END AS text
    FROM raw ORDER BY source_file, record_seq
    """


@register(
    "warc_ingest_extract",
    oracle=_warc_oracle_sql(),
    doc="Common Crawl ingestion: .warc.gz segments (per-record gzip "
    "members) -> binaryFile + mapInPandas parse (one segment per task, "
    "the CC unit of parallelism) -> C4-style HTML->text extraction on "
    "the JVM side. The oracle re-derives the raw records from the same "
    "fixture and applies the shared html_to_text regex chain, so the "
    "byte-level container parse AND the extraction are both under test.",
)
def warc_ingest_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tracy_matdb_spark.operators import textops
    from tracy_matdb_spark.sources.warc import read_warc

    out_dir = _write_warc_fixture()
    text = textops.html_to_text_expr("spark", "body")
    return (
        read_warc(spark, out_dir, glob="*.warc*")
        .selectExpr(
            "source_file",
            "cast(record_seq as int) AS record_seq",
            "url",
            "cast(http_status as int) AS http_status",
            "cast(n_bytes as bigint) AS n_bytes",
            f"CASE WHEN content_type LIKE 'text/html%' THEN {text} "
            "ELSE body END AS text",
        )
        .orderBy("source_file", "record_seq")
    )


@register(
    "warc_datasource_scan",
    oracle=_warc_oracle_sql(),
    doc="Spark 4 custom Python DataSource for WARC (sources/pyds.py): "
    "spark.read.format('warc') over the crawl fixture — one "
    "InputPartition per segment, executor-side parse — must produce "
    "the identical rows the binaryFile+mapInPandas reader "
    "(warc_ingest_extract) produces, against the same re-derived "
    "oracle.",
)
def warc_datasource_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tracy_matdb_spark.operators import textops
    from tracy_matdb_spark.sources.pyds import register_all

    register_all(spark)
    out_dir = _write_warc_fixture()
    text = textops.html_to_text_expr("spark", "body")
    return (
        spark.read.format("warc")
        .load(out_dir)
        .selectExpr(
            "source_file",
            "cast(record_seq as int) AS record_seq",
            "url",
            "cast(http_status as int) AS http_status",
            "cast(n_bytes as bigint) AS n_bytes",
            f"CASE WHEN content_type LIKE 'text/html%' THEN {text} "
            "ELSE body END AS text",
        )
        .orderBy("source_file", "record_seq")
    )


@register(
    "csv_roundtrip",
    oracle="""
    SELECT source, cast(count(*) as bigint) AS n_docs,
           cast(sum(n_chars) as bigint) AS sum_chars,
           cast(sum(length(text)) as bigint) AS sum_text_len
    FROM documents WHERE doc_id < 100
    GROUP BY source
    ORDER BY source
    """,
    doc="documents slice -> df.write.csv (header, explicit quote/escape) "
    "-> spark.read.csv with an explicit schema -> per-source rollup "
    "against the ORIGINAL parquet aggregated by the oracle: any "
    "lossiness in quoting, escaping, or newline handling of the text "
    "column breaks parity. multiLine=true because document text "
    "contains quoted delimiters; the explicit schema skips inference "
    "(one scan).",
)
def csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tracy_matdb_spark.catalog import load

    out = os.path.join(FIXTURE_ROOT, "csv_docs")
    docs = load(spark, sf_dir, ("documents",))["documents"].filter(F.col("doc_id") < 100)
    docs.write.mode("overwrite").option("header", True).option("escape", '"').csv(out)
    back = (
        spark.read.schema(
            "doc_id bigint, text string, lang string, source string, n_chars bigint"
        )
        .option("header", True)
        .option("escape", '"')
        .option("multiLine", True)
        .csv(out)
    )
    return (
        back.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
            F.sum(F.length("text")).alias("sum_text_len"),
        )
        .orderBy("source")
    )


@register(
    "orc_roundtrip",
    oracle="""
    SELECT source, cast(count(*) as bigint) AS n_docs,
           cast(sum(n_chars) as bigint) AS sum_chars,
           cast(sum(length(text)) as bigint) AS sum_text_len
    FROM documents WHERE doc_id < 100
    GROUP BY source
    ORDER BY source
    """,
    doc="documents slice -> ORC -> read -> per-source rollup vs the "
    "original parquet (same oracle as csv/jsonl_roundtrip): the third "
    "columnar leg of the interchange matrix. ORC carries its own "
    "schema, so no explicit read schema; predicate pushdown and column "
    "pruning apply as with parquet.",
)
def orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tracy_matdb_spark.catalog import load

    out = os.path.join(FIXTURE_ROOT, "orc_docs")
    docs = load(spark, sf_dir, ("documents",))["documents"].filter(F.col("doc_id") < 100)
    docs.write.mode("overwrite").orc(out)
    back = spark.read.orc(out)
    return (
        back.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
            F.sum(F.length("text")).alias("sum_text_len"),
        )
        .orderBy("source")
    )


def _warc_e2e_oracle_sql() -> str:
    from tracy_matdb_spark.operators import textops
    from tracy_matdb_spark.queries.webscale import _canon_url_exprs

    text = textops.html_to_text_expr("duckdb", "body")
    toks = textops.toks_expr("duckdb", "text")
    return f"""
    WITH {_warc_raw_cte()},
    ok AS (SELECT * FROM raw WHERE http_status = 200),
    canon AS (SELECT source_file, record_seq, warc_date_ord,
                     {_canon_url_exprs('duckdb')} AS curl,
                     CASE WHEN content_type LIKE 'text/html%' THEN {text}
                          ELSE body END AS text
              FROM (SELECT source_file, record_seq, url, http_status,
                           content_type, body,
                           row_number() OVER (ORDER BY source_file, record_seq)
                               AS warc_date_ord
                    FROM ok) o),
    scored AS (SELECT *,
                      cast(len({toks}) as bigint) AS n_tokens,
                      row_number() OVER (PARTITION BY curl
                          ORDER BY source_file, record_seq) AS rn
               FROM canon),
    hosted AS (SELECT regexp_extract(curl, '^[a-z]+://([^/:]+)', 1) AS host,
                      curl, rn, n_tokens
               FROM scored)
    SELECT host,
           cast(count(*) as bigint) AS n_fetched,
           cast(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) as bigint) AS n_unique,
           cast(sum(CASE WHEN rn = 1 AND n_tokens >= 3 THEN n_tokens ELSE 0 END)
                as bigint) AS kept_tokens
    FROM hosted GROUP BY host ORDER BY host
    """


@register(
    "warc_e2e_host_rollup",
    oracle=_warc_e2e_oracle_sql(),
    doc="The crawl pipeline end-to-end as ONE lazy plan: WARC segments "
    "-> Content-Length parse -> status filter -> URL canonicalization "
    "(the case/port-variant re-crawl in seg-00003 collides with "
    "seg-00000's record and must dedup) -> C4 html->text extraction -> "
    "token quality floor -> first-fetch-wins dedup per canonical URL "
    "(window partitioned by curl, a high-cardinality key) -> per-host "
    "rollup. The web-corpus twin of corpus_e2e_rollup: every stage is "
    "the registered operator, composed.",
)
def warc_e2e_host_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from tracy_matdb_spark.operators import textops
    from tracy_matdb_spark.queries.webscale import _canon_url_exprs
    from tracy_matdb_spark.sources.warc import read_warc

    out_dir = _write_warc_fixture()
    text = textops.html_to_text_expr("spark", "body")
    toks = textops.toks_expr("spark", "text")
    ok = read_warc(spark, out_dir, glob="*.warc*").filter(F.col("http_status") == 200)
    canon = ok.selectExpr(
        "source_file",
        "record_seq",
        f"{_canon_url_exprs('spark')} AS curl",
        f"CASE WHEN content_type LIKE 'text/html%' THEN {text} ELSE body END AS text",
    )
    scored = canon.selectExpr(
        "source_file", "record_seq", "curl", f"cast(size({toks}) as bigint) AS n_tokens"
    ).withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("curl").orderBy("source_file", "record_seq")
        ),
    )
    return (
        scored.selectExpr(
            "regexp_extract(curl, '^[a-z]+://([^/:]+)', 1) AS host", "rn", "n_tokens"
        )
        .groupBy("host")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_fetched"),
            F.sum(F.expr("CASE WHEN rn = 1 THEN 1 ELSE 0 END")).cast("long").alias("n_unique"),
            F.sum(F.expr("CASE WHEN rn = 1 AND n_tokens >= 3 THEN n_tokens ELSE 0 END"))
            .cast("long")
            .alias("kept_tokens"),
        )
        .orderBy("host")
    )


# ---------------------------------------------------------------------------
# Malformed-record accounting (PERMISSIVE CSV ingest)
# ---------------------------------------------------------------------------

CSV_BAD_N = 120  # fixture rows; every 7th is deliberately malformed


@register(
    "csv_malformed_audit",
    # hand-computed fixture arithmetic: rows 0..119; every 7th row
    # (18 rows: 0,7,...,119) is malformed (too few columns -> the int
    # column holds text). good = 120 - 18 = 102; sum of doc_id over
    # multiples of 7 < 120 excluded from good-sum arithmetic.
    oracle=f"""
    WITH ids AS (SELECT unnest(generate_series(0, {CSV_BAD_N - 1})) AS i),
    cls AS (SELECT i, (i % 7 = 0) AS bad FROM ids)
    SELECT cast(sum(CASE WHEN bad THEN 0 ELSE 1 END) as bigint) AS n_good,
           cast(sum(CASE WHEN bad THEN 1 ELSE 0 END) as bigint) AS n_corrupt,
           cast(sum(CASE WHEN bad THEN 0 ELSE i * 10 END) as bigint) AS sum_val_good
    FROM cls
    """,
    doc="PERMISSIVE CSV ingest with corrupt-record accounting: a fixture "
    "where every 7th line is malformed (wrong arity/type) is read with "
    "an explicit schema + columnNameOfCorruptRecord; the audit counts "
    "clean vs quarantined rows and aggregates only the clean ones — "
    "the ingest-robustness contract for dirty 100 TB feeds (PERMISSIVE "
    "quarantines instead of failing the job or silently nulling; the "
    "corrupt rows stay queryable for triage). Oracle is independent "
    "fixture arithmetic.",
)
def csv_malformed_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    import hashlib

    from pyspark.sql import types as T

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    out = os.path.join(FIXTURE_ROOT, "csv_bad", tag)
    os.makedirs(out, exist_ok=True)
    path = os.path.join(out, "feed.csv")
    with open(path, "w") as fh:
        for i in range(CSV_BAD_N):
            if i % 7 == 0:
                fh.write(f"row{i},oops\n")  # wrong arity: int column gets text
            else:
                fh.write(f"row{i},{i * 10},tag{i % 5}\n")
    schema = T.StructType([
        T.StructField("name", T.StringType()),
        T.StructField("val", T.IntegerType()),
        T.StructField("tag", T.StringType()),
        T.StructField("_corrupt_record", T.StringType()),
    ])
    df = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .csv(path)
        # Spark requires caching/materializing before filtering on the
        # corrupt column alone (SPARK-21610); checkpoint keeps it lazy
        .localCheckpoint(eager=False)
    )
    return df.agg(
        F.sum(F.when(F.col("_corrupt_record").isNull(), 1).otherwise(0))
        .cast("long").alias("n_good"),
        F.sum(F.when(F.col("_corrupt_record").isNotNull(), 1).otherwise(0))
        .cast("long").alias("n_corrupt"),
        F.sum(F.when(F.col("_corrupt_record").isNull(), F.col("val")).otherwise(0))
        .cast("long").alias("sum_val_good"),
    )
