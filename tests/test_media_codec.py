"""Pure-numpy media codecs (operators/media_codec.py): byte-level round
trips, malformed-stream fallback, and the Spark decode/resize stages over
real WAV/PPM bytes.  These are REAL parsers — the opaque byte-stat path
remains only for compressed formats the container cannot decode."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from lakehouse_loader_spark.operators import media_codec as MC


def test_wav_roundtrip_stereo_and_chunk_walking():
    s = ((np.arange(437)[:, None] * 7 + np.arange(2)[None, :] * 3 + 13) % 201 - 100).astype(
        "<i2"
    )
    b = MC.encode_wav(s, 22050)
    d = MC.decode_wav(b)
    assert (d["sample_rate"], d["n_channels"], d["n_samples"]) == (22050, 2, 874)
    assert d["duration_s"] == 437 / 22050
    assert np.array_equal(d["samples"], s)
    # a LIST chunk between fmt and data must be skipped (word-aligned walk)
    fmt_end = 12 + 8 + 16
    extra = b"LIST" + (4).to_bytes(4, "little") + b"INFO"
    b2 = b[:fmt_end] + extra + b[fmt_end:]
    b2 = struct.pack("<4sI", b"RIFF", len(b2) - 8) + b2[8:]
    assert np.array_equal(MC.decode_wav(b2)["samples"], s)


def test_wav_rejects_non_pcm():
    b = bytearray(MC.encode_wav(np.zeros(8, "<i2"), 8000))
    b[20] = 3  # audio_format = IEEE float
    with pytest.raises(ValueError, match="unsupported WAV"):
        MC.decode_wav(bytes(b))


def test_ppm_pgm_roundtrip_and_comments():
    px = (
        (np.arange(13)[None, :, None] * 7 + np.arange(7)[:, None, None] * 11
         + np.arange(3)[None, None, :] * 5 + 9) % 251
    ).astype(np.uint8)
    assert np.array_equal(MC.decode_ppm(MC.encode_ppm(px))["pixels"], px)
    gray = (np.arange(20).reshape(4, 5) % 256).astype(np.uint8)
    dg = MC.decode_ppm(MC.encode_ppm(gray))
    assert dg["format"] == "pgm" and np.array_equal(dg["pixels"], gray)
    with_comment = b"P6\n# c\n13 7\n255\n" + px.tobytes()
    assert np.array_equal(MC.decode_ppm(with_comment)["pixels"], px)


def test_bmp_roundtrip_row_padding():
    # w=5 → 15-byte rows padded to 16; bottom-up storage must invert back
    px = (
        (np.arange(5)[None, :, None] * 3 + np.arange(4)[:, None, None] * 17
         + np.arange(3)[None, None, :]) % 256
    ).astype(np.uint8)
    assert np.array_equal(MC.decode_bmp(MC.encode_bmp(px))["pixels"], px)


def test_decode_media_never_raises():
    assert MC.decode_media(None)["format"] == "opaque"
    assert MC.decode_media(b"")["format"] == "opaque"
    m = MC.decode_media(b"\xffhello world")
    assert m["format"] == "opaque" and m["peak_value"] == 255.0
    # truncated WAV degrades, not dies
    b = MC.encode_wav(np.zeros(100, "<i2"), 8000)
    assert MC.decode_media(b[:20])["format"] == "opaque"
    # PNG magic is out of scope → opaque
    assert MC.sniff_format(b"\x89PNG\r\n\x1a\n") == "opaque"


def test_resize_nearest_matches_index_map():
    px = ((np.arange(13)[None, :] * 7 + np.arange(7)[:, None] * 11) % 251).astype(float)
    out = MC.resize_image_nearest(px, 16, 16)
    for i in range(16):
        for j in range(16):
            assert out[i, j] == px[(i * 7) // 16, (j * 13) // 16]


def test_audio_window_rms_matches_bounds_partition():
    s = ((np.arange(437) * 7) % 201 - 100).astype(float)
    got = MC.audio_window_rms(s, 16)
    bounds = [(k * 437) // 16 for k in range(17)]
    for k in range(16):
        seg = s[bounds[k] : bounds[k + 1]]
        assert got[k] == pytest.approx(float(np.sqrt(np.mean(seg * seg))), abs=0)


def test_synth_payload_decodes_to_its_params():
    for doc_id in range(24):
        p = MC.synth_params(doc_id)
        out = MC.decode_media(MC.synth_payload(doc_id))
        if p["kind"] == "wav":
            assert out["format"] == "wav"
            assert out["sample_rate"] == p["sample_rate"]
            assert out["n_channels"] == p["n_channels"]
            assert out["n_samples"] == p["n_frames"] * p["n_channels"]
        else:
            assert out["format"] == "ppm"
            assert (out["width"], out["height"]) == (p["width"], p["height"])


def test_spark_decode_stage_golden_rows(spark):
    from lakehouse_loader_spark.operators import multimodal as M

    base = spark.range(0, 8).withColumnRenamed("id", "doc_id")
    rows = {
        r["doc_id"]: r
        for r in M.decode_media_features(M.synthesize_media(base)).collect()
    }
    assert rows[0]["media_format"] == "wav" and rows[0]["sample_rate"] == 8000
    assert rows[1]["media_format"] == "ppm" and rows[1]["width"] == 9
    # golden: doc 2 → stereo (2//2%2=1 → nch 2), rate 22050, 500 frames
    assert rows[2]["n_channels"] == 2
    assert rows[2]["sample_rate"] == 22050
    assert rows[2]["n_samples"] == 1000
    assert rows[2]["duration_s"] == 500 / 22050
    # independent numpy recomputation of doc 3's pixel stats
    p = MC.decode_media(MC.synth_payload(3))
    assert rows[3]["mean_value"] == p["mean_value"]
    assert rows[3]["peak_value"] == p["peak_value"]


def test_spark_resize_stage_shapes_and_values(spark):
    from lakehouse_loader_spark.operators import multimodal as M

    base = spark.range(0, 6).withColumnRenamed("id", "doc_id")
    rows = {
        r["doc_id"]: r
        for r in M.resize_media_features(M.synthesize_media(base)).collect()
    }
    for doc_id, r in rows.items():
        assert len(r["resized"]) == 256
        assert r["media_format"] == ("wav" if doc_id % 2 == 0 else "ppm")
    # image thumbnail cell (0,0) = channel mean of source pixel (0,0)
    d3 = MC.decode_ppm(MC.synth_payload(3))
    expected = float(d3["pixels"][0, 0].astype(np.float64).mean())
    assert rows[3]["resized"][0] == expected


def test_hostile_wav_zero_channels_degrades_to_opaque():
    """fmt chunks declaring 0 channels / 0 rate must not divide by zero —
    decode_media degrades, never raises (r6 review)."""
    import struct

    b = bytearray(MC.encode_wav(np.zeros(100, "<i2"), 8000))
    struct.pack_into("<H", b, 22, 0)  # n_channels = 0
    assert MC.decode_media(bytes(b))["format"] == "opaque"
    b2 = bytearray(MC.encode_wav(np.zeros(100, "<i2"), 8000))
    struct.pack_into("<I", b2, 24, 0)  # sample_rate = 0
    assert MC.decode_media(bytes(b2))["format"] == "opaque"


def test_resize_stage_survives_corrupt_sniffed_payloads(spark):
    """A payload that sniffs as WAV/PPM but is truncated/corrupt must fall
    back to the opaque tier instead of killing the task (r6 review)."""
    import pandas as pd

    from lakehouse_loader_spark.operators import multimodal as M

    good = MC.synth_payload(0)
    rows = [
        (0, good),
        (1, good[:20]),                  # truncated RIFF
        (2, b"P6\ngarbage"),             # broken PNM header
        (3, b"BM" + b"\x00" * 10),       # truncated BMP
        (4, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = {r["doc_id"]: r for r in M.resize_media_features(df).collect()}
    assert out[0]["media_format"] == "wav"
    for bad in (1, 2, 3, 4):
        assert out[bad]["media_format"] == "opaque"
        assert len(out[bad]["resized"]) == 256
    dec = {r["doc_id"]: r for r in M.decode_media_features(df).collect()}
    for bad in (1, 2, 3, 4):
        assert dec[bad]["media_format"] == "opaque"
