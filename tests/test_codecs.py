"""Pure-Python media codecs (operators/codecs.py): PNG round-trips
through every scanline filter, BMP/PPM/WAV round-trips, CRC and subset
gates."""

from __future__ import annotations

import numpy as np
import pytest

from tracy_matdb_spark.operators import codecs as C


def _img(h=13, w=17, c=3, seed=3):
    rng = np.random.default_rng(seed)
    shape = (h, w) if c == 1 else (h, w, c)
    return rng.integers(0, 256, size=shape, dtype=np.uint8)


@pytest.mark.parametrize("c", [1, 3, 4])
@pytest.mark.parametrize("mode", ["none", "cycle"])
def test_png_roundtrip_all_filters(c, mode):
    img = _img(c=c)
    back = C.decode_png(C.encode_png(img, filter_mode=mode))
    want = img if img.ndim == 3 else img[:, :, None]
    assert back.shape == want.shape
    assert np.array_equal(back, want)


def test_png_cycle_actually_uses_all_five_filters():
    # 13 rows with filter y % 5 -> every filter type appears in the stream
    import zlib

    data = C.encode_png(_img(), filter_mode="cycle")
    pos = data.index(b"IDAT") - 4
    import struct

    (length,) = struct.unpack_from(">I", data, pos - 4 + 0)
    # simpler: decompress every IDAT via the public decoder path; then
    # verify filter bytes in the raw stream
    raw = zlib.decompress(data[data.index(b"IDAT") + 4 : data.rindex(b"IEND") - 8])
    stride = 17 * 3 + 1
    filters = {raw[y * stride] for y in range(13)}
    assert filters == {0, 1, 2, 3, 4}


def test_png_crc_corruption_detected():
    data = bytearray(C.encode_png(_img()))
    idat = data.index(b"IDAT")
    data[idat + 8] ^= 0xFF  # flip a payload byte, keep stale CRC
    with pytest.raises(ValueError, match="CRC"):
        C.decode_png(bytes(data))


def test_png_rejects_unsupported_cleanly():
    with pytest.raises(ValueError, match="signature"):
        C.decode_png(b"JFIF....not a png......")


def test_bmp_roundtrip_with_row_padding():
    img = _img(h=5, w=7)  # 21-byte rows -> 3 pad bytes
    assert np.array_equal(C.decode_bmp(C.encode_bmp(img)), img)


def test_ppm_roundtrip():
    img = _img(h=4, w=9)
    assert np.array_equal(C.decode_ppm(C.encode_ppm(img)), img)


def test_wav_roundtrip_stereo():
    rng = np.random.default_rng(11)
    samples = rng.integers(-(2**15), 2**15, size=(256, 2)).astype(np.int16)
    back, rate = C.decode_wav(C.encode_wav(samples, rate=8000))
    assert rate == 8000
    assert np.array_equal(back, samples)


def test_sniff_dispatch():
    img = _img(h=3, w=3)
    assert C.sniff(C.encode_png(img)) == "png"
    assert C.sniff(C.encode_bmp(img)) == "bmp"
    assert C.sniff(C.encode_ppm(img)) == "ppm"
    assert C.sniff(C.encode_wav(np.zeros(8, np.int16))) == "wav"
    assert C.sniff(b"\xff\xd8\xff\xe0 jpeg") == "unknown"
    with pytest.raises(NotImplementedError, match="codec"):
        C.decode_image(b"\xff\xd8\xff\xe0 jpeg")


def test_png_truncation_and_bitflips_fail_cleanly():
    """Truncations raise; single-byte flips either raise cleanly (CRC
    catches nearly all) or decode to same-shape data — never hang."""
    img = _img(h=9, w=11)
    data = C.encode_png(img, filter_mode="cycle")
    for cut in (7, 20, 40, len(data) // 2, len(data) - 2):
        with pytest.raises(Exception) as ei:
            C.decode_png(data[:cut])
        assert not issubclass(ei.type, (SystemExit, KeyboardInterrupt))
    for off in range(8, len(data), max(1, len(data) // 30)):
        mut = bytearray(data)
        mut[off] ^= 0xA5
        try:
            out = C.decode_png(bytes(mut))
            assert out.shape == (9, 11, 3)
        except Exception as exc:  # noqa: BLE001
            assert not isinstance(exc, (SystemExit, KeyboardInterrupt, MemoryError))


def test_wav_truncation_fails_cleanly():
    data = C.encode_wav(np.arange(64, dtype=np.int16))
    for cut in (3, 11, 30, len(data) - 5):
        try:
            arr, _ = C.decode_wav(data[:cut])
            assert arr.shape[0] <= 64  # header said fewer frames: fine
        except Exception as exc:  # noqa: BLE001
            assert not isinstance(exc, (SystemExit, KeyboardInterrupt))
