"""From-scratch PNG codec tests: filter round-trips, chunk validation,
cross-format pixel parity with the PPM path, and the Spark decode tier."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest


def _pattern(h, w, ch, seed=3):
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=(h, w, ch), dtype=np.uint8).squeeze()


class TestCodec:
    @pytest.mark.parametrize("f", [0, 1, 2, 3, 4])
    @pytest.mark.parametrize("ch", [1, 2, 3, 4])
    def test_filter_roundtrip(self, f, ch):
        from docling_eval_spark.functions.png_codec import decode_png, encode_png

        arr = _pattern(7, 11, ch)
        out = decode_png(encode_png(arr, filters=[f]))
        expect = arr if arr.ndim == 3 else arr[:, :, None]
        assert out.shape == expect.shape
        assert (out == expect).all()

    def test_cycled_filters_roundtrip(self):
        from docling_eval_spark.functions.png_codec import decode_png, encode_png

        arr = _pattern(13, 9, 3, seed=9)
        out = decode_png(encode_png(arr, filters=[0, 1, 2, 3, 4]))
        assert (out == arr).all()

    def test_matches_ppm_twin(self):
        """synth_png and synth_ppm build the same pixels — the two
        from-scratch decoders must agree byte-for-byte."""
        from docling_eval_spark.functions.png_codec import decode_png, synth_png
        from docling_eval_spark.operators.multimodal import decode_ppm, synth_ppm

        for d in (0, 7, 123):
            a = decode_png(synth_png(d, 16, 8))
            b = decode_ppm(synth_ppm(d, 16, 8))
            assert (a == b).all()

    def test_crc_corruption_rejected(self):
        from docling_eval_spark.functions.png_codec import decode_png, encode_png

        payload = bytearray(encode_png(_pattern(4, 4, 3)))
        payload[40] ^= 0xFF  # flip a byte inside IDAT
        with pytest.raises(ValueError):
            decode_png(bytes(payload))

    def test_unsupported_profiles_rejected(self):
        from docling_eval_spark.functions.png_codec import (
            _SIG,
            _chunk,
            decode_png,
        )

        def ihdr(depth=8, color=2, interlace=0):
            return _SIG + _chunk(b"IHDR", struct.pack(
                ">IIBBBBB", 2, 2, depth, color, 0, 0, interlace)) + _chunk(
                b"IDAT", zlib.compress(b"\x00" * 14)) + _chunk(b"IEND", b"")

        with pytest.raises(ValueError):
            decode_png(ihdr(depth=16))
        with pytest.raises(ValueError):
            decode_png(ihdr(color=3))  # palette
        with pytest.raises(ValueError):
            decode_png(ihdr(interlace=1))  # Adam7
        with pytest.raises(ValueError):
            decode_png(b"nope")

    def test_ancillary_chunks_skipped(self):
        from docling_eval_spark.functions.png_codec import (
            _chunk,
            decode_png,
            encode_png,
        )

        arr = _pattern(3, 5, 3)
        payload = encode_png(arr)
        # splice a tEXt chunk between IHDR and IDAT
        ihdr_end = 8 + 12 + 13
        spliced = (payload[:ihdr_end] + _chunk(b"tEXt", b"k\x00v")
                   + payload[ihdr_end:])
        assert (decode_png(spliced) == arr).all()


class TestSparkTier:
    def test_decode_image_features_uses_real_png_path(self, spark):
        from docling_eval_spark.functions.png_codec import synth_png
        from docling_eval_spark.operators.multimodal import (
            decode_image_features,
            with_payload_metadata,
        )

        rows = [(d, bytearray(synth_png(d, 16, 8))) for d in range(5)]
        df = spark.createDataFrame(rows, "doc_id bigint, payload binary")
        meta = with_payload_metadata(df).select("payload_meta.mime").collect()
        assert {r["mime"] for r in meta} == {"image/png"}
        feats = {r["doc_id"]: r for r in decode_image_features(df).collect()}
        assert feats[0]["width"] == 16 and feats[0]["height"] == 8
        # same pixels as the PPM twin -> same 601-luma closed form
        exp_luma = sum(
            (19595 * ((255 * x) // 15) + 38470 * 85 + 7471 * 170) >> 16
            for x in range(16)
        ) / 16 / 255.0
        assert abs(feats[0]["mean_luma"] - exp_luma) < 1e-9
        assert len(feats[0]["embedding"]) == 16

    def test_png_ppm_features_identical(self, spark):
        from docling_eval_spark.functions.png_codec import synth_png
        from docling_eval_spark.operators.multimodal import (
            decode_image_features,
            synth_ppm,
        )

        rows = [(d, bytearray(synth_png(d, 12, 6))) for d in range(3)]
        rows += [(d + 100, bytearray(synth_ppm(d, 12, 6))) for d in range(3)]
        df = spark.createDataFrame(rows, "doc_id bigint, payload binary")
        feats = {r["doc_id"]: r for r in decode_image_features(df).collect()}
        for d in range(3):
            assert feats[d]["mean_luma"] == feats[d + 100]["mean_luma"]
            assert feats[d]["embedding"] == feats[d + 100]["embedding"]
