"""From-scratch baseline JPEG codec (ITU-T T.81): framing, Huffman
round-trips, the flat-block exactness contract, lossy tolerance, and
unsupported-profile gates."""

from __future__ import annotations

import numpy as np
import pytest


def test_markers_and_magic():
    from docling_eval_spark.functions.jpeg_codec import encode_jpeg

    blob = encode_jpeg(np.full((8, 8), 130, dtype=np.uint8))
    assert blob[:3] == b"\xff\xd8\xff"     # SOI + APP0
    assert blob[-2:] == b"\xff\xd9"        # EOI
    for marker in (b"\xff\xdb", b"\xff\xc0", b"\xff\xc4", b"\xff\xda"):
        assert marker in blob, marker


def test_flat_block_exact_roundtrip():
    """The exactness contract: constant blocks with even level shifts
    decode bit-for-bit (DC-only, Annex-K quantum 16 divides 8u)."""
    from docling_eval_spark.functions.jpeg_codec import (
        decode_jpeg, encode_jpeg)

    for v in (40, 128, 130, 254):
        img = np.full((24, 40), v, dtype=np.uint8)
        assert np.array_equal(decode_jpeg(encode_jpeg(img)), img), v
    # per-block distinct values, still exact
    by, bx = np.mgrid[0:3, 0:5]
    vals = 128 + 2 * ((bx * 5 + by * 11) % 40 - 20)
    img = np.repeat(np.repeat(vals, 8, 0), 8, 1).astype(np.uint8)
    assert np.array_equal(decode_jpeg(encode_jpeg(img)), img)


def test_synth_fixture_matches_closed_form():
    from docling_eval_spark.functions.jpeg_codec import (
        decode_jpeg, synth_jpeg)

    d = 7
    arr = decode_jpeg(synth_jpeg(d, 40, 24))
    by, bx = np.mgrid[0:3, 0:5]
    want = np.repeat(np.repeat(
        128 + 2 * (((d + 3 * bx + 7 * by) % 49) - 24), 8, 0), 8, 1)
    assert np.array_equal(arr, want[:24, :40])


def test_odd_dimensions_pad_and_crop():
    from docling_eval_spark.functions.jpeg_codec import (
        decode_jpeg, encode_jpeg)

    img = np.full((13, 9), 130, dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(img))
    assert out.shape == (13, 9)
    assert np.array_equal(out, img)  # edge replication keeps it flat


def test_lossy_roundtrip_tolerance():
    from docling_eval_spark.functions.jpeg_codec import (
        decode_jpeg, encode_jpeg)

    grad = ((np.arange(32)[:, None] * 4 + np.arange(48)[None, :] * 2)
            % 256).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(grad))
    err = np.abs(out.astype(int) - grad.astype(int))
    assert err.max() <= 8 and err.mean() < 3  # smooth content stays close


def test_dc_differential_crosses_blocks():
    """Alternating bright/dark blocks exercise negative DC diffs and
    the amplitude extension (T.81 F.12)."""
    from docling_eval_spark.functions.jpeg_codec import (
        decode_jpeg, encode_jpeg)

    by, bx = np.mgrid[0:2, 0:6]
    vals = np.where((bx + by) % 2 == 0, 30, 226)
    img = np.repeat(np.repeat(vals, 8, 0), 8, 1).astype(np.uint8)
    assert np.array_equal(decode_jpeg(encode_jpeg(img)), img)


def test_unsupported_profiles_raise():
    from docling_eval_spark.functions.jpeg_codec import (
        decode_jpeg, encode_jpeg)

    with pytest.raises(ValueError):
        decode_jpeg(b"\x89PNG not a jpeg")
    blob = bytearray(encode_jpeg(np.full((8, 8), 130, dtype=np.uint8)))
    sof = blob.find(b"\xff\xc0")
    blob[sof + 1] = 0xC2                   # rewrite SOF0 -> SOF2
    with pytest.raises(ValueError, match="non-baseline"):
        decode_jpeg(bytes(blob))
    with pytest.raises(ValueError):
        decode_jpeg(b"\xff\xd8\xff\xe0 torn")


def test_decoder_reads_declared_tables_not_assumed():
    """The decoder must honor the FILE's DQT, not bake in Annex K:
    halving the stored DC quantum doubles the decoded DC step."""
    from docling_eval_spark.functions.jpeg_codec import (
        decode_jpeg, encode_jpeg)

    img = np.full((8, 8), 136, dtype=np.uint8)  # u=8 -> DC=64 -> 64/16=4
    blob = bytearray(encode_jpeg(img))
    dqt = blob.find(b"\xff\xdb")
    # first (zigzag) entry after the Pq/Tq byte is the DC quantum 16
    assert blob[dqt + 5] == 16
    blob[dqt + 5] = 32
    out = decode_jpeg(bytes(blob))
    # stored DC 4 now dequantizes to 128 -> flat value 128/8 + 128 = 144
    assert np.all(out == 144)


def test_entropy_segments_stuffing_and_restarts():
    """The vectorized stream preparation must strip FF00 stuffing,
    split at RSTn, and stop at EOI — byte-exactly."""
    import numpy as np

    from docling_eval_spark.functions.jpeg_codec import _entropy_segments

    data = (b"\x01\xff\x00\x02"          # 01 FF 02 (stuffed)
            b"\xff\xd0"                   # RST0
            b"\x03\x04\xff\x00"           # 03 04 FF (stuffed, trailing)
            b"\xff\xd9"                    # EOI
            b"\xde\xad")                   # past the scan: ignored
    segs = _entropy_segments(data)
    assert [s.tobytes() for s in segs] == [b"\x01\xff\x02", b"\x03\x04\xff"]


def test_restart_interval_roundtrip_noisy():
    """A noisy image (every AC path exercised) with restart markers in
    the stream must decode within baseline-JPEG tolerance and hit the
    segment-per-RST decode path."""
    import numpy as np

    from docling_eval_spark.functions.jpeg_codec import (
        decode_jpeg, encode_jpeg)

    rng = np.random.RandomState(3)
    img = (rng.rand(64, 96) * 255).astype(np.uint8)
    blob = encode_jpeg(img, restart_interval=5)
    out = decode_jpeg(blob)
    assert out.shape == img.shape
    assert np.abs(out.astype(int) - img.astype(int)).mean() < 40
