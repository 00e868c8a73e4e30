"""hdf5lite: pure-Python HDF5 subset (sources/hdf5lite.py).

Round-trips both writer dialects through the one reader — the v2
"latest" layout (OHDR + link messages + checksums) and the legacy v0
layout (v1 object headers + symbol-table B-tree groups + global-heap
VL strings), plus chunked/shuffle/deflate storage — so every reader
path is exercised without libhdf5 in the image.  Known-answer vectors
pin the Jenkins lookup3 checksum to the published self-test values
from lookup3.c."""

from __future__ import annotations

import numpy as np
import pytest

from tracy_matdb_spark.sources.hdf5lite import (
    lookup3,
    read_tree_bytes,
    write_tree_bytes,
)

DIALECTS = ("v2", "v0")

TREE = {
    "uuid": "u-42",
    "n": 3,
    "symbols": "AgPdé",  # non-ascii: utf-8 attr path
    "species": ["Ag", "Pd", "LongerName"],
    "cell": [[4.0, 0.0, 0.0], [0.0, 4.0, 0.0], [0.0, 0.0, 4.0]],
    "positions": [[0.0, 0.0, 0.0], [2.0, 2.0, 2.0], [1.0, 1.5, 0.25]],
    "pbc": [True, False, True],
    "params": {
        "ref_energy": -3.5,
        "config_type": "manual",
        "nested": {"depth": 2, "tag": ""},  # empty-string attr
    },
    "properties": {"ref_force": [[0.5, -0.25, 0.0], [0.0, 0.0, 0.0], [1.0, 2.0, 3.0]]},
    "empty_group": {},
    "counts": [1, 2, 3, 4],
    "flag": True,
    "weight": 0.125,
}


def test_lookup3_known_vectors():
    # published self-test values from Bob Jenkins' lookup3.c
    assert lookup3(b"", 0) == 0xDEADBEEF
    assert lookup3(b"", 1) == 0xDEADBEF0
    assert lookup3(b"Four score and seven years ago", 0) == 0x17770551
    assert lookup3(b"Four score and seven years ago", 1) == 0xCD628161


@pytest.mark.parametrize("dialect", DIALECTS)
def test_roundtrip_full_tree(dialect):
    data = write_tree_bytes(TREE, dialect=dialect)
    assert data[:8] == b"\x89HDF\r\n\x1a\n"
    back = read_tree_bytes(data)
    assert back == TREE


@pytest.mark.parametrize("dialect", DIALECTS)
def test_roundtrip_scalars_and_types(dialect):
    tree = {"i": -(2**53), "f": 3.141592653589793, "s": "x", "b": False, "t": True}
    back = read_tree_bytes(write_tree_bytes(tree, dialect=dialect))
    assert back == tree
    assert isinstance(back["i"], int) and isinstance(back["f"], float)
    assert isinstance(back["b"], bool) and isinstance(back["t"], bool)


@pytest.mark.parametrize("dialect", DIALECTS)
def test_roundtrip_dataset_dtypes(dialect):
    tree = {
        "f2d": [[1.5, -2.25], [0.0, 1e300]],
        "i1d": [0, -1, 2**40],
        "b1d": [True, True, False],
        "s1d": ["a", "bb", ""],
        "empty": np.zeros((0, 3)),
    }
    back = read_tree_bytes(write_tree_bytes(tree, dialect=dialect))
    assert back["f2d"] == tree["f2d"]
    assert back["i1d"] == tree["i1d"]
    assert back["b1d"] == tree["b1d"]
    assert back["s1d"] == tree["s1d"]
    assert back["empty"] == []


@pytest.mark.parametrize("dialect", DIALECTS)
def test_many_links_spill_to_multiple_snods(dialect):
    # > 8 children exercises multi-SNOD groups in v0 (and long link
    # runs in v2); > 64 residual params is a realistic atoms.h5 tail
    tree = {f"k{i:03d}": {"v": float(i)} for i in range(23)}
    tree["top"] = 7
    back = read_tree_bytes(write_tree_bytes(tree, dialect=dialect))
    assert back == tree


@pytest.mark.parametrize("dialect", DIALECTS)
def test_chunked_shuffle_deflate_roundtrip(dialect):
    rng = np.random.default_rng(7)
    arr = rng.standard_normal((37, 5)).tolist()  # 37 rows: ragged edge chunk
    ints = (rng.integers(-1000, 1000, size=64)).tolist()
    tree = {"arr": arr, "ints": ints, "meta": "zipped"}
    data = write_tree_bytes(tree, dialect=dialect, chunk_rows=8)
    # deflate should actually compress the int block's zero bytes
    back = read_tree_bytes(data)
    assert back["arr"] == arr and back["ints"] == ints and back["meta"] == "zipped"


def test_dialects_agree_byte_for_byte_on_content():
    a = read_tree_bytes(write_tree_bytes(TREE, dialect="v2"))
    b = read_tree_bytes(write_tree_bytes(TREE, dialect="v0"))
    assert a == b


def test_corrupt_signature_rejected():
    with pytest.raises(ValueError, match="signature"):
        read_tree_bytes(b"not an hdf5 file at all....")


def test_atoms_record_through_bytes():
    """End-to-end with the canonical record layer: row -> tree -> h5
    bytes -> tree -> row (both dialects)."""
    from tracy_matdb_spark.sources.hdf5io import record_to_tree, tree_to_record

    row = {
        "uuid": "cfg-7",
        "n": 2,
        "symbols": "NiPt",
        "species": ["Ni", "Pt"],
        "cell": [[3.0, 0.0, 0.0], [0.0, 3.0, 0.0], [0.0, 0.0, 3.0]],
        "positions": [[0.0, 0.0, 0.0], [1.5, 1.5, 1.5]],
        "pbc": [True, True, False],
        "ref_energy": -7.25,
        "ref_force": [[0.0, 0.5, 0.0], [0.0, -0.5, 0.0]],
        "params": {"config_type": "manual"},
        "source_file": "",
    }
    for dialect in DIALECTS:
        tree = record_to_tree(row)
        back = tree_to_record(read_tree_bytes(write_tree_bytes(tree, dialect=dialect)))
        for k in ("uuid", "n", "symbols", "species", "cell", "positions", "pbc",
                  "ref_energy", "ref_force"):
            assert back[k] == row[k], (dialect, k)
        assert back["params"]["config_type"] == "manual"


# --- property: random trees survive both dialects --------------------------

from hypothesis import given, settings, strategies as st  # noqa: E402

_names = st.text(
    alphabet=st.characters(min_codepoint=0x21, max_codepoint=0x7E, exclude_characters="/"),
    min_size=1,
    max_size=12,
)
# NUL-free text: null-padded fixed-width strings (v1/v2) cannot carry
# '\x00' by format definition — the writer now raises on it (see
# _reject_nul); test_nul_strings pins both that and the v0 VL roundtrip
# surrogate codepoints (category Cs) are not Unicode scalar values and
# have no UTF-8 form — the writer raises a typed error on them (see
# test_lone_surrogate_rejected); excluded from the roundtrip strategy
_text = st.text(
    alphabet=st.characters(exclude_characters="\x00", exclude_categories=("Cs",)),
    max_size=20,
)
_scalars = st.one_of(
    st.booleans(),
    st.integers(min_value=-(2**62), max_value=2**62),
    st.floats(allow_nan=False, width=64),
    _text,
)
_arrays = st.one_of(
    st.lists(st.floats(allow_nan=False, width=64), min_size=1, max_size=8),
    st.lists(st.integers(min_value=-(2**62), max_value=2**62), min_size=1, max_size=8),
    st.lists(st.booleans(), min_size=1, max_size=8),
    st.lists(_text, min_size=1, max_size=6),
)
_trees = st.recursive(
    st.dictionaries(_names, st.one_of(_scalars, _arrays), max_size=5),
    lambda kids: st.dictionaries(_names, st.one_of(_scalars, _arrays, kids), max_size=5),
    max_leaves=12,
)


@settings(max_examples=60, deadline=None)
@given(tree=_trees, dialect=st.sampled_from(DIALECTS))
def test_property_random_tree_roundtrip(tree, dialect):
    assert read_tree_bytes(write_tree_bytes(tree, dialect=dialect)) == tree


def test_nul_strings():
    """'\\x00' in strings: representable ONLY by variable-length strings
    (v0, explicit stored lengths). Fixed-width null-padded strings (v2)
    cannot distinguish a trailing NUL from padding — the writer must
    refuse rather than silently truncate (hypothesis found the silent
    case: {'0': ['\\x00']} round-tripped to {'0': ['']})."""
    t = {"d": ["\x00", "a\x00b", ""], "s": "x\x00"}
    assert read_tree_bytes(write_tree_bytes(t, dialect="v0")) == t
    for bad in ({"d": ["\x00"]}, {"s": "x\x00"}):
        with pytest.raises(ValueError, match="NUL"):
            write_tree_bytes(bad, dialect="v2")


# --- robustness: corrupt/truncated input fails cleanly ----------------------


@pytest.mark.parametrize("dialect", DIALECTS)
def test_truncated_file_raises_cleanly(dialect):
    """Every truncation point must raise (ValueError/KeyError/struct
    error/index error) — never hang, never return silently-wrong data
    of the *full* tree."""
    data = write_tree_bytes(TREE, dialect=dialect)
    for cut in (9, 40, 60, len(data) // 2, len(data) - 3):
        try:
            got = read_tree_bytes(data[:cut])
        except Exception as exc:  # noqa: BLE001 - any clean error is fine
            assert not isinstance(exc, (SystemExit, KeyboardInterrupt))
        else:
            assert got != TREE, f"truncation at {cut} returned the full tree"


@pytest.mark.parametrize("dialect", DIALECTS)
def test_bitflip_never_hangs(dialect):
    """Flip one byte at a sample of offsets: either it still parses (a
    payload byte changed values) or it raises cleanly."""
    data = bytearray(write_tree_bytes(TREE, dialect=dialect))
    for off in range(8, len(data), max(1, len(data) // 40)):
        mut = bytearray(data)
        mut[off] ^= 0x5A
        try:
            read_tree_bytes(bytes(mut))
        except Exception as exc:  # noqa: BLE001
            assert not isinstance(exc, (SystemExit, KeyboardInterrupt, MemoryError))


def test_lone_surrogate_rejected():
    """Lone surrogates are not Unicode scalar values — no UTF-8 form in
    ANY dialect (h5py raises the same way). The writer must fail with a
    typed error from every string path: scalar attr, string array, VL
    heap."""
    import pytest

    for dialect in DIALECTS:
        with pytest.raises(ValueError, match="surrogate"):
            write_tree_bytes({"a": "\ud800"}, dialect=dialect)
        with pytest.raises(ValueError, match="surrogate"):
            write_tree_bytes({"d": ["ok", "\udfff"]}, dialect=dialect)
