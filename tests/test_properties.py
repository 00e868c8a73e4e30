"""Property-based tests (hypothesis) for pure dialect-shared helpers.

These run the SQL expression builders through DuckDB (no Spark session
needed — fast), checking algebraic properties that fixture-based parity
can't sweep exhaustively.
"""

from __future__ import annotations

import duckdb
from hypothesis import given, settings
from hypothesis import strategies as st

from tracy_matdb_spark.operators.bucketing import zorder_expr


@settings(max_examples=50, deadline=None)
@given(st.integers(0, 255), st.integers(0, 255))
def test_zorder_is_bijective_on_byte_pairs(x, y):
    z = duckdb.sql(
        f"SELECT {zorder_expr('duckdb', str(x), str(y))} AS z"
    ).fetchone()[0]
    # de-interleave and recover both inputs exactly
    xs = sum(((z >> (2 * i)) & 1) << i for i in range(8))
    ys = sum(((z >> (2 * i + 1)) & 1) << i for i in range(8))
    assert (xs, ys) == (x, y)
    assert 0 <= z < 1 << 16


@settings(max_examples=50, deadline=None)
@given(st.integers(0, 255), st.integers(0, 255), st.integers(0, 255), st.integers(0, 255))
def test_zorder_preserves_locality_prefix(x, y, x2, y2):
    # same high nibbles => same top byte of the z-key (the pruning property)
    if x >> 4 == x2 >> 4 and y >> 4 == y2 >> 4:
        q = lambda a, b: duckdb.sql(
            f"SELECT {zorder_expr('duckdb', str(a), str(b))}"
        ).fetchone()[0]
        assert q(x, y) >> 8 == q(x2, y2) >> 8


@settings(max_examples=30, deadline=None)
@given(st.integers(1, 200))
def test_chunk_windows_cover_every_token_exactly(n_toks):
    from tracy_matdb_spark.queries.corpus import CHUNK_S, CHUNK_W

    # stride-S windows of width W: every position in 1..n is inside at
    # least one window, and positions overlap in at most ceil(W/S) windows
    starts = list(range(1, n_toks + 1, CHUNK_S))
    covered = sorted({p for s in starts for p in range(s, min(s + CHUNK_W, n_toks + 1))})
    assert covered == list(range(1, n_toks + 1))
    max_overlap = max(
        sum(1 for s in starts if s <= p < s + CHUNK_W) for p in range(1, n_toks + 1)
    )
    assert max_overlap <= -(-CHUNK_W // CHUNK_S)


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.text(
                alphabet=st.characters(
                    codec="utf-8", exclude_characters="\r\n", min_codepoint=32
                ),
                max_size=200,
            ),
            st.sampled_from([200, 301, 404, 500]),
            st.booleans(),
        ),
        min_size=1,
        max_size=5,
    ),
    st.booleans(),
)
def test_warc_roundtrip_arbitrary_bodies(recs, gz):
    """write_warc -> parse_warc_bytes is the identity on (body, status,
    url-ordinal) for arbitrary printable bodies — including bodies that
    embed WARC header keywords — in both plain and gzip-member modes."""
    import io
    import os
    import tempfile

    from tracy_matdb_spark.sources.warc import parse_warc_bytes, write_warc

    records = [
        {
            "url": f"http://h/{i}",
            "date": "2026-01-01T00:00:00Z",
            "status": status,
            "body": ("WARC/1.0\r\nContent-Length: 3\r\n\r\n" + body) if tricky else body,
        }
        for i, (body, status, tricky) in enumerate(recs)
    ]
    with tempfile.TemporaryDirectory() as td:
        p = os.path.join(td, "x.warc.gz" if gz else "x.warc")
        write_warc(p, records, gzip_members=gz)
        with open(p, "rb") as f:
            rows = parse_warc_bytes(f.read(), os.path.basename(p))
    assert len(rows) == len(records)
    for rec, row in zip(records, rows):
        assert row["body"] == rec["body"]
        assert row["http_status"] == rec["status"]
        assert row["url"] == rec["url"]


@settings(max_examples=80, deadline=None)
@given(
    st.sampled_from(["http", "HTTP", "https", "HTTPS"]),
    st.text(alphabet="abcDEF09.-", min_size=1, max_size=20),
    st.sampled_from(["", ":80", ":443", ":8080"]),
    st.lists(
        st.sampled_from(["a", "B9", ".", "..", "seg"]), min_size=0, max_size=4
    ),
    st.sampled_from(["", "?q=1&a=2", "?"]),
    st.sampled_from(["", "#frag", "#a#b"]),
)
def test_url_canonicalize_is_idempotent(scheme, host, port, segs, query, frag):
    """canon(canon(u)) == canon(u): the normalizer must be a projection.
    Random schemes/hosts/ports/dot-segments/queries/fragments (dot-depth
    bounded below the chain's documented 4-iteration resolution)."""
    import duckdb

    from tracy_matdb_spark.queries.webscale import _canon_url_exprs

    url = f"{scheme}://{host}{port}/" + "/".join(segs) + query + frag
    con = duckdb.connect()
    expr = _canon_url_exprs("duckdb")
    once = con.execute(
        f"SELECT {expr} FROM (SELECT ? AS url)", [url]
    ).fetchone()[0]
    twice = con.execute(
        f"SELECT {expr} FROM (SELECT ? AS url)", [once]
    ).fetchone()[0]
    assert twice == once, (url, once, twice)
