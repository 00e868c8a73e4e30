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


# --- live HTTP paging against a local fixture server ------------------------


class _AfluxHandler:
    """Minimal AFLUX protocol server: parses paging(k,n) from the query
    string, serves slices of a canned entry list, and (optionally)
    fails the first request of each page with a 500 to exercise the
    retry path."""

    def __new__(cls, entries, flaky=False):
        import http.server
        import json as _json
        import re

        failed: set[str] = set()

        class H(http.server.BaseHTTPRequestHandler):
            def log_message(self, *a):  # silence
                pass

            def do_GET(self):
                m = re.search(r"paging\((\d+),(\d+)\)", self.path)
                page, size = int(m.group(1)), int(m.group(2))
                if flaky and self.path not in failed:
                    failed.add(self.path)
                    self.send_error(500, "transient")
                    return
                body = _json.dumps(entries[(page - 1) * size : page * size]).encode()
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

        return H


def _serve(handler):
    import http.server
    import threading

    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    return srv, f"http://127.0.0.1:{srv.server_address[1]}/API/aflux/"


def test_fetch_pages_live_http(spark, tmp_path):
    from tracy_matdb_spark.sources.aflow_reader import fetch_pages

    ents = _entries(13)
    srv, base = _serve(_AfluxHandler(ents))
    try:
        d = str(tmp_path / "pages")
        n = fetch_pages(base, "Egap(*),paging_ignored", d, batch_size=5)
        assert n == 3  # 5 + 5 + 3 (short page terminates the loop)
        got = materialize(spark, d).orderBy("auid").collect()
        assert [r["auid"] for r in got] == [e["auid"] for e in ents]
    finally:
        srv.shutdown()


def test_fetch_pages_retries_transient_errors(spark, tmp_path):
    from tracy_matdb_spark.sources.aflow_reader import fetch_pages

    ents = _entries(7)
    srv, base = _serve(_AfluxHandler(ents, flaky=True))
    try:
        d = str(tmp_path / "pages")
        n = fetch_pages(base, "", d, batch_size=4, backoff=0.01)
        assert n == 2
        assert read_pages(spark, d).count() == 7
    finally:
        srv.shutdown()


def test_aflux_url_shape():
    from tracy_matdb_spark.sources.aflow_reader import aflux_url

    assert (
        aflux_url("http://aflow.org/API/aflux/", "Egap(1*,*2),species(Si)", 3, 100)
        == "http://aflow.org/API/aflux/?Egap(1*,*2),species(Si),paging(3,100)"
    )
    assert aflux_url("http://x/?", "", 1, 10) == "http://x/?paging(1,10)"
