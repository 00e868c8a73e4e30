"""Text-analysis column builders: tokenization, quality, lang-id, simhash.

These are the LLM-training-data operators the north star adds on top of
the reference's surface (BASELINE.json). Everything is built from
Spark's array/lambda functions (JVM-side) — no Python UDFs — and every
builder has a DuckDB twin so the driver's oracle can verify it exactly.

Float parity: ratios are quantized floor(x*1e6) (see operators/generators.py).
"""

from __future__ import annotations

STOPWORDS = ("the", "a")

# language marker words -> deterministic n-gram-style heuristic lang-id
LANG_MARKERS = {
    "de": ("der", "und", "die"),
    "en": ("the", "and", "of"),
    "es": ("el", "los", "que"),
    "fr": ("le", "la", "et"),
    "zh": ("的", "是"),
}

SIMHASH_BITS = 16  # compact fingerprint column (doc_fingerprint.simhash16)
SIMHASH_WIDE_BITS = 48  # near-dup banding fingerprint: 4 bands x 12 bits.
# Width is a scale knob: band-bucket count is 2^(bits/bands), and the
# within-bucket join is quadratic IN THE BUCKET — 4-bit bands (16
# buckets) made sf0.1 effectively all-pairs; 12-bit bands (4096) keep
# buckets sparse. 48 <= the 60 bits tok_hash60 provides.


def toks_expr(dialect: str, text: str = "text") -> str:
    if dialect == "spark":
        return f"split(trim({text}), '\\\\s+')"
    return f"regexp_split_to_array(trim({text}), '\\s+')"


def count_in_expr(dialect: str, toks: str, words: tuple[str, ...]) -> str:
    """# of tokens that are in `words` (counts duplicates)."""
    inlist = ", ".join(f"'{w}'" for w in words)
    if dialect == "spark":
        return f"size(filter({toks}, t -> t IN ({inlist})))"
    return f"len(list_filter({toks}, t -> t IN ({inlist})))"


def sum_len_expr(dialect: str, toks: str) -> str:
    if dialect == "spark":
        return f"aggregate({toks}, 0L, (acc, t) -> acc + length(t))"
    return f"cast(list_sum(list_transform({toks}, t -> strlen(t))) as bigint)"


def quant_ratio_expr(num: str, den: str) -> str:
    """floor(1e6 * num/den) — identical in both dialects."""
    return (
        f"cast(floor((cast({num} as double) / cast({den} as double)) * cast(1000000 as double)) as bigint)"
    )


def tok_hash60(dialect: str, tok_expr: str, salt: str = "s") -> str:
    canon = f"concat('{salt}|', {tok_expr})"
    if dialect == "spark":
        return f"cast(conv(substring(md5({canon}), 1, 15), 16, 10) as bigint)"
    return f"(('0x' || substr(md5({canon}), 1, 15))::bigint)"


def tok_hash_array_expr(dialect: str, toks: str) -> str:
    """Array of 60-bit token hashes — materialize this as a column ONCE,
    then derive all simhash bits from it: one md5 per token total,
    instead of one md5 per token PER BIT (the evaluation-cost trap of
    inlining the hash into every bit's aggregate)."""
    h = tok_hash60(dialect, "t")
    if dialect == "spark":
        return f"transform({toks}, t -> {h})"
    return f"list_transform({toks}, t -> {h})"


def simhash_from_hashes_expr(dialect: str, hs: str, bits: int) -> str:
    """``bits``-wide simhash from a token-hash ARRAY column: bit b set
    iff the frequency-weighted sign-sum of hash bit b is positive. The
    input must be a concrete column (see tok_hash_array_expr) so the
    per-bit array traversals are integer-only."""
    bit_sums = []
    for b in range(bits):
        if dialect == "spark":
            s = (
                f"aggregate({hs}, 0L, (acc, x) -> "
                f"acc + (2 * (cast(shiftright(x, {b}) as bigint) & 1) - 1))"
            )
        else:
            s = (
                f"coalesce(cast(list_sum(list_transform({hs}, "
                f"x -> 2 * ((x >> {b}) & 1) - 1)) as bigint), 0)"
            )
        bit_sums.append(f"(CASE WHEN {s} > 0 THEN cast({1 << b} as bigint) ELSE 0 END)")
    return "(" + " + ".join(bit_sums) + ")"




def lang_score_exprs(dialect: str, toks: str) -> dict[str, str]:
    return {lang: count_in_expr(dialect, toks, words) for lang, words in sorted(LANG_MARKERS.items())}


def html_to_text_expr(dialect: str, col: str = "html") -> str:
    """HTML -> text extraction as one JVM/RE2 regex chain (the C4/CCNet
    boilerplate-removal stage, spec'd to the common subset of Java
    regex and RE2 — no lookaround, no backreferences, (?is) flags only,
    so Spark and DuckDB compute identical results):

    1. drop <script>/<style> elements with their content,
    2. drop HTML comments,
    3. turn block-closing tags into newlines (paragraph structure),
    4. strip remaining tags,
    5. decode the five predefined entities + &nbsp;,
    6. collapse runs of whitespace, trim.
    """
    g = ", 'g'" if dialect == "duckdb" else ""
    # DuckDB string literals are raw; Spark SQL literals process
    # backslash escapes — the regex \s needs one more level there.
    ws = "'\\\\s+'" if dialect == "spark" else "'\\s+'"
    e = col
    e = f"regexp_replace({e}, '(?is)<(script|style)[^>]*>.*?</(script|style)>', ' '{g})"
    e = f"regexp_replace({e}, '(?s)<!--.*?-->', ' '{g})"
    e = f"regexp_replace({e}, '(?i)</(p|div|h[1-6]|li|tr|br)>', chr(10){g})"
    e = f"regexp_replace({e}, '(?s)<[^>]*>', ' '{g})"
    for ent, ch in (
        ("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
        ("&#39;", chr(39)), ("&nbsp;", " "), ("&amp;", "&"),  # &amp; LAST
    ):
        rep = "''''" if ch == chr(39) else f"'{ch}'"
        e = f"replace({e}, '{ent}', {rep})"
    e = f"trim(regexp_replace({e}, {ws}, ' '{g}))"
    return e
