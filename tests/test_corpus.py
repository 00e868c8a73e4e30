"""Corpus-filtering operators: plan pins + invariants.

Value parity vs DuckDB is covered for every registered query by
tests/test_parity.py; these tests pin the physical properties that keep
the operators fast at scale.
"""

from __future__ import annotations

from tests.conftest import SF_SMOKE
from tracy_matdb_spark.queries import load_all

REGISTRY = load_all()


def _executed(spark, name: str) -> str:
    df = REGISTRY[name].fn(spark, SF_SMOKE)
    return df._jdf.queryExecution().executedPlan().toString()


def test_blocklist_is_broadcast_anti_join(spark):
    plan = _executed(spark, "domain_blocklist_rollup")
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


def test_range_join_is_equi_on_bucket(spark):
    # the range predicate must ride an equi hash/sort-merge join on
    # (user_id, bkt) — never a nested-loop theta join
    plan = _executed(spark, "events_range_join_10m")
    assert "bkt" in plan
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan


def test_map_only_ops_have_no_python_eval(spark):
    for name in ("repetition_ratio", "pii_detect_redact", "stratified_sample"):
        plan = _executed(spark, name)
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, name


def test_repetition_invariants(spark):
    pdf = REGISTRY["repetition_ratio"].fn(spark, SF_SMOKE).toPandas()
    assert (pdf.n_distinct <= pdf.n_tokens).all()
    assert (pdf.top_freq <= pdf.n_tokens).all()
    assert (pdf.top_freq >= 1).all()


def test_stratified_sample_rates(spark):
    docs = REGISTRY["stratified_sample"].fn(spark, SF_SMOKE).toPandas()
    head = docs[docs.source.isin(["src0", "src1", "src2", "src3", "src4"])]
    tail = docs[~docs.source.isin(["src0", "src1", "src2", "src3", "src4"])]
    # 25 docs/stratum at sf0.001: expect ~12.5/stratum head, ~5/stratum tail;
    # loose bounds — determinism (not the rate) is the contract
    assert 0.30 <= len(head) / (25 * 5) <= 0.70
    assert 0.08 <= len(tail) / (25 * 15) <= 0.35


def test_chunk_windows_invariants(spark):
    from tracy_matdb_spark.queries.corpus import CHUNK_S, CHUNK_W

    pdf = REGISTRY["doc_chunk_windows"].fn(spark, SF_SMOKE).toPandas()
    assert (pdf.n_chunk_toks <= CHUNK_W).all()
    assert (pdf.n_chunk_toks >= 1).all()
    # chunk ids are dense per document starting at 0
    g = pdf.groupby("doc_id").chunk_id
    assert (g.min() == 0).all()
    assert (g.max() + 1 == g.count()).all()
    # short windows (overlap tail) form a contiguous suffix per document —
    # with W > S the last ceil((W-S)/S)+1 windows may all be truncated
    short = pdf[pdf.n_chunk_toks < CHUNK_W].groupby("doc_id").chunk_id
    last = pdf.groupby("doc_id").chunk_id.max()
    for doc, n_short in short.count().items():
        assert short.min()[doc] == last[doc] - n_short + 1, doc
    # chunking must be a narrow explode — no Python eval, no join
    plan = _executed(spark, "doc_chunk_windows")
    assert "BatchEvalPython" not in plan and "Join" not in plan


def test_pack_sequences_bins_monotone(spark):
    from tracy_matdb_spark.queries.corpus import PACK_BUDGET

    pdf = REGISTRY["pack_sequences"].fn(spark, SF_SMOKE).toPandas()
    for _, grp in pdf.sort_values("doc_id").groupby("source"):
        # bin ids are the floor of the running prefix-sum: non-decreasing,
        # starting at bin 0, and consistent with the token totals
        assert grp.bin_id.iloc[0] == 0
        assert (grp.bin_id.diff().dropna() >= 0).all()
        prefix = grp.n_tokens.cumsum() - grp.n_tokens
        assert (grp.bin_id == prefix // PACK_BUDGET).all()


def test_decontam_join_is_hash_equi_on_ngram(spark):
    plan = _executed(spark, "decontam_ngram_overlap")
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan
    # dedupe must happen below the join (HashAggregate on (doc, ng) feeds it)
    assert "BatchEvalPython" not in plan


def test_mixture_weights_sum_to_source_count(spark):
    pdf = REGISTRY["mixture_weights"].fn(spark, SF_SMOKE).toPandas()
    # equalizing weights: sum(weight * n_tokens) == total tokens, i.e.
    # mean-normalized — each source's weighted mass equals the uniform share
    total = pdf.n_tokens.sum()
    assert abs((pdf.weight * pdf.n_tokens).sum() - total) / total < 1e-4
    assert (pdf.weight > 0).all()


def test_tfidf_rank_dense_and_bounded(spark):
    pdf = REGISTRY["tfidf_top_terms"].fn(spark, SF_SMOKE).toPandas()
    assert set(pdf.rnk.unique()) <= {1, 2, 3}
    g = pdf.groupby("doc_id").rnk
    assert (g.min() == 1).all()
    # tfidf non-increasing within a doc
    for _, grp in pdf.groupby("doc_id"):
        s = grp.sort_values("rnk").tfidf.values
        assert all(s[i] >= s[i + 1] - 1e-9 for i in range(len(s) - 1))


def test_range_join_errors_all_present(spark):
    # LEFT join semantics: every error event appears, zero-click ones included
    from tracy_matdb_spark.catalog import load_events

    n_err = load_events(spark, SF_SMOKE).filter("event_type = 'error'").count()
    out = REGISTRY["events_range_join_10m"].fn(spark, SF_SMOKE).toPandas()
    assert len(out) == n_err
    assert (out.n_clicks_10m >= 0).all()


# --- HTML extraction: independent html.parser cross-check -------------------


def _extract_with_stdlib(html: str) -> str:
    """Independent oracle for textops.html_to_text_expr: a real HTML
    tokenizer (stdlib html.parser), not regex — shared code: none."""
    from html.parser import HTMLParser

    class X(HTMLParser):
        def __init__(self):
            super().__init__(convert_charrefs=True)
            self.parts: list[str] = []
            self.skip = 0

        def handle_starttag(self, tag, attrs):
            if tag in ("script", "style"):
                self.skip += 1
            self.parts.append(" ")

        def handle_endtag(self, tag):
            if tag in ("script", "style") and self.skip:
                self.skip -= 1
            self.parts.append(" ")

        def handle_data(self, data):
            if not self.skip:
                self.parts.append(data)

    p = X()
    p.feed(html)
    return " ".join("".join(p.parts).split())


def test_html_extract_matches_stdlib_parser():
    """The regex chain and a real HTML tokenizer must agree on
    well-formed pages (whitespace-normalized)."""
    import duckdb

    from tracy_matdb_spark.operators.textops import html_to_text_expr

    pages = [
        "<html><body><p>plain text</p></body></html>",
        "<html><head><script>var a = '<p>not text</p>';</script></head>"
        "<body><h1>Title</h1><p>Body &amp; more</p></body></html>",
        "<div>nested <b>bold <i>italic</i></b> tail</div>",
        "<p>entity zoo &lt;tag&gt; &quot;q&quot; &#39;s&#39; &nbsp;x</p>",
        "<ul><li>one</li><li>two</li></ul><!-- comment --><p>after</p>",
        "<style>p{}</style><p>styled</p><script src='x.js'></script><p>end</p>",
    ]
    con = duckdb.connect()
    for html in pages:
        got = con.execute(
            f"SELECT {html_to_text_expr('duckdb')} FROM (SELECT ? AS html)", [html]
        ).fetchone()[0]
        want = _extract_with_stdlib(html)
        assert got == want, (html, got, want)
