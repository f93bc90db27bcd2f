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
    # bare PNG magic with no chunks sniffs as png but degrades to opaque
    assert MC.sniff_format(b"\x89PNG\r\n\x1a\n") == "png"
    assert MC.decode_media(b"\x89PNG\r\n\x1a\n")["format"] == "opaque"
    # JPEG sniffs as jpeg (r8 codec) but a bodyless stream degrades
    assert MC.sniff_format(b"\xff\xd8\xff\xe0" + b"\0" * 16) == "jpeg"
    assert MC.decode_media(b"\xff\xd8\xff\xe0" + b"\0" * 16)["format"] == "opaque"


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
            assert out["format"] == p["kind"]  # 'png' for doc_id%4==3, else 'ppm'
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
        assert r["media_format"] == ("wav" if doc_id % 2 == 0 else MC.synth_params(doc_id)["kind"])
    # image thumbnail cell (0,0) = channel mean of source pixel (0,0)
    d3 = MC.decode_png(MC.synth_payload(3))
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


def test_png_roundtrip_all_encode_filters():
    """encode_png(filter 0/1/2) → decode_png recovers exact pixels for RGB
    and gray; filter-0 payload length matches the stored-block closed form
    68 + h·(1 + w·channels) that the SQL oracle relies on."""
    rng = np.random.default_rng(0)
    for shape in [(6, 9, 3), (10, 17, 3), (1, 1, 3), (5, 7)]:
        px = rng.integers(0, 256, size=shape, dtype=np.uint8)
        for ft in (0, 1, 2):
            d = MC.decode_png(MC.encode_png(px, filter_type=ft))
            assert np.array_equal(d["pixels"], px), (shape, ft)
        ch = 3 if len(shape) == 3 else 1
        b0 = MC.encode_png(px, 0)
        assert MC.sniff_format(b0) == "png"
        assert len(b0) == 68 + shape[0] * (1 + shape[1] * ch)


def test_png_decode_real_zlib_average_paeth_rgba():
    """decode_png must read genuinely COMPRESSED zlib streams (not just the
    stored blocks encode_png emits), unfilter Average/Paeth scanlines, and
    handle RGBA (color type 6)."""
    import zlib

    rng = np.random.default_rng(1)
    px = rng.integers(0, 256, size=(6, 9, 3), dtype=np.uint8)
    flat = px.reshape(6, 27)
    ihdr = struct.pack(">IIBBBBB", 9, 6, 8, 2, 0, 0, 0)

    raw0 = b"".join(b"\x00" + flat[y].tobytes() for y in range(6))
    real = (
        MC.PNG_SIG
        + MC._png_chunk(b"IHDR", ihdr)
        + MC._png_chunk(b"IDAT", zlib.compress(raw0, 9))
        + MC._png_chunk(b"IEND", b"")
    )
    assert np.array_equal(MC.decode_png(real)["pixels"], px)

    def filt(ftype):
        out, prev = [], np.zeros(27, np.int32)
        for y in range(6):
            row = flat[y].astype(np.int32)
            enc = np.zeros(27, np.int32)
            for x in range(27):
                left = row[x - 3] if x >= 3 else 0
                ul = prev[x - 3] if x >= 3 else 0
                if ftype == 3:
                    enc[x] = (row[x] - (left + prev[x]) // 2) % 256
                else:
                    enc[x] = (row[x] - MC._paeth(int(left), int(prev[x]), int(ul))) % 256
            out.append(bytes([ftype]) + enc.astype(np.uint8).tobytes())
            prev = row
        return b"".join(out)

    for ftype in (3, 4):
        s = (
            MC.PNG_SIG
            + MC._png_chunk(b"IHDR", ihdr)
            + MC._png_chunk(b"IDAT", MC._zlib_stored(filt(ftype)))
            + MC._png_chunk(b"IEND", b"")
        )
        assert np.array_equal(MC.decode_png(s)["pixels"], px), ftype

    px4 = rng.integers(0, 256, size=(4, 5, 4), dtype=np.uint8)
    raw4 = b"".join(b"\x00" + px4[y].tobytes() for y in range(4))
    s4 = (
        MC.PNG_SIG
        + MC._png_chunk(b"IHDR", struct.pack(">IIBBBBB", 5, 4, 8, 6, 0, 0, 0))
        + MC._png_chunk(b"IDAT", MC._zlib_stored(raw4))
        + MC._png_chunk(b"IEND", b"")
    )
    d4 = MC.decode_png(s4)
    assert d4["n_channels"] == 4 and np.array_equal(d4["pixels"], px4)


def test_png_synth_rows_match_ppm_pixels():
    """doc_id % 4 == 3 images ship as PNG with the SAME pixel ramp as the
    PPM rows: decode_png recovers exactly the analytic pixels, and
    decode_media reports format='png' with the closed-form byte_len."""
    for did in (3, 7, 11, 15):
        prm = MC.synth_params(did)
        assert prm["kind"] == "png"
        payload = MC.synth_payload(did)
        x = np.arange(prm["width"])[None, :, None]
        y = np.arange(prm["height"])[:, None, None]
        c = np.arange(3)[None, None, :]
        expect = ((x * 7 + y * 11 + c * 5 + did * 3) % 251).astype(np.uint8)
        assert np.array_equal(MC.decode_png(payload)["pixels"], expect)
        d = MC.decode_media(payload)
        assert d["format"] == "png"
        assert d["byte_len"] == 68 + prm["height"] * (1 + 3 * prm["width"])
    assert MC.synth_params(1)["kind"] == "ppm"  # non-%4==3 odd ids unchanged


def test_png_corrupt_degrades_to_opaque():
    """Truncated/hostile PNG payloads fall back to the opaque tier (the
    never-raise decode contract), including zero-dimension headers."""
    good = MC.synth_payload(3)
    assert MC.decode_media(good[:30])["format"] == "opaque"
    bad_ihdr = (
        MC.PNG_SIG
        + MC._png_chunk(b"IHDR", struct.pack(">IIBBBBB", 0, 0, 8, 2, 0, 0, 0))
        + MC._png_chunk(b"IDAT", MC._zlib_stored(b""))
        + MC._png_chunk(b"IEND", b"")
    )
    assert MC.decode_media(bad_ihdr)["format"] == "opaque"
    # 16-bit depth: unsupported → opaque, not a crash
    deep = (
        MC.PNG_SIG
        + MC._png_chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 16, 2, 0, 0, 0))
        + MC._png_chunk(b"IDAT", MC._zlib_stored(b"\x00" * 26))
        + MC._png_chunk(b"IEND", b"")
    )
    assert MC.decode_media(deep)["format"] == "opaque"


def test_corpus_is_ascii_so_byte_oracles_hold():
    """The multimodal_decode/resize/frame_sample oracles equate UTF-8 BYTES
    with code points (and the resize oracle assumes every 16-bucket is
    non-empty, i.e. length ≥ 16).  Guard both assumptions so a corpus
    regeneration with non-ASCII or tiny documents fails HERE with a clear
    message, not as a confusing driver hash-mismatch."""
    import glob
    import os

    import duckdb

    from tests.conftest import SF_ORACLE

    con = duckdb.connect()
    dirs = sorted(glob.glob(os.path.join(os.path.dirname(SF_ORACLE.rstrip("/")), "sf*")))
    assert dirs, "testdata scale dirs missing"
    for d in dirs:
        docs = os.path.join(d, "documents.parquet")
        if not os.path.exists(docs):
            continue
        non_ascii, min_len = con.execute(
            f"""SELECT COUNT(*) FILTER (WHERE octet_length(encode(text)) != length(text)),
                       MIN(length(text))
                FROM read_parquet('{docs}')"""
        ).fetchone()
        assert non_ascii == 0, f"{d}: non-ASCII text breaks the byte oracles"
        assert min_len >= 16, f"{d}: docs shorter than 16 bytes break the resize oracle"


# -- property tests: PNG round-trip over random images/filters --------------
from hypothesis import given, settings, strategies as st  # noqa: E402


@settings(max_examples=60, deadline=None)
@given(
    h=st.integers(1, 24),
    w=st.integers(1, 24),
    gray=st.booleans(),
    filter_type=st.sampled_from([0, 1, 2]),
    seed=st.integers(0, 2**31 - 1),
)
def test_png_roundtrip_property(h, w, gray, filter_type, seed):
    """decode(encode(px, any supported filter)) == px for arbitrary
    dimensions/content, and the filter-0 stored-block length formula holds
    universally (hypothesis: the closed form the SQL oracle depends on is a
    theorem of the encoder, not a coincidence of the synth sizes)."""
    rng = np.random.default_rng(seed)
    shape = (h, w) if gray else (h, w, 3)
    px = rng.integers(0, 256, size=shape, dtype=np.uint8)
    d = MC.decode_png(MC.encode_png(px, filter_type=filter_type))
    assert d["width"] == w and d["height"] == h
    assert np.array_equal(d["pixels"], px)
    ch = 1 if gray else 3
    raw = h * (1 + w * ch)
    if raw <= 65535:  # single stored block
        assert len(MC.encode_png(px, 0)) == 68 + raw


# -- round-8: baseline JPEG (pure-numpy, ITU-T T.81 subset) ------------------


def _ramp(w, h, doc_id):
    x = np.arange(w)[None, :, None]
    y = np.arange(h)[:, None, None]
    c = np.arange(3)[None, None, :]
    return ((x * 7 + y * 11 + c * 5 + doc_id * 3) % 251).astype(np.uint8)


def test_jpeg_q100_roundtrip_bounds():
    """q100 (all-ones quant) 4:4:4 round-trip error stays within the
    bound multimodal_decode_jpeg's oracle tolerances assume (worst
    measured over a 2,250-draw scan: mean 0.125 / peak 2 / pixel 3)."""
    from lakehouse_loader_spark.operators.jpeg import decode_jpeg, encode_jpeg

    for doc_id in (1, 5, 13, 27, 101, 997, 11294):
        w, h = 8 + doc_id % 9, 6 + doc_id % 5
        px = _ramp(w, h, doc_id)
        d = decode_jpeg(encode_jpeg(px, quality=100))
        assert (d["width"], d["height"], d["n_channels"]) == (w, h, 3)
        err = np.abs(d["pixels"].astype(int) - px.astype(int))
        assert err.max() <= 3
        assert abs(d["pixels"].mean() - px.mean()) <= 0.5
        assert abs(int(d["pixels"].max()) - int(px.max())) <= 4


def test_jpeg_grayscale_and_odd_dimensions():
    from lakehouse_loader_spark.operators.jpeg import decode_jpeg, encode_jpeg

    for w, h in ((1, 1), (7, 3), (8, 8), (17, 9), (31, 25)):
        g = ((np.arange(h)[:, None] * 31 + np.arange(w)[None, :] * 7) % 256).astype(
            np.uint8
        )
        d = decode_jpeg(encode_jpeg(g, quality=100))
        assert d["n_channels"] == 1 and d["pixels"].shape == (h, w)
        assert np.abs(d["pixels"].astype(int) - g.astype(int)).max() <= 3


def test_jpeg_420_subsampling_roundtrip_smooth():
    """4:2:0 decode path (2x2 sampling factors, chroma upsample): on a
    smooth gradient the round-trip stays tight; dims exact."""
    from lakehouse_loader_spark.operators.jpeg import decode_jpeg, encode_jpeg

    yy, xx = np.mgrid[0:26, 0:41].astype(float)
    px = np.stack([xx * 3 + yy, xx + 20, 0.5 * yy + 80], axis=-1).astype(np.uint8)
    d = decode_jpeg(encode_jpeg(px, quality=95, subsample=True))
    assert (d["width"], d["height"]) == (41, 26)
    assert np.abs(d["pixels"].astype(int) - px.astype(int)).max() <= 8


@settings(max_examples=25, deadline=None)
@given(
    st.integers(min_value=1, max_value=24),
    st.integers(min_value=1, max_value=24),
    st.integers(min_value=0, max_value=2**31),
)
def test_jpeg_property_roundtrip(w, h, seed):
    from lakehouse_loader_spark.operators.jpeg import decode_jpeg, encode_jpeg

    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    d = decode_jpeg(encode_jpeg(px, quality=100))
    assert d["pixels"].shape == (h, w, 3)
    # worst-case q100 error on noise: DCT+color-transform rounding only
    assert np.abs(d["pixels"].astype(int) - px.astype(int)).max() <= 6


def test_jpeg_rejects_arithmetic_and_truncation():
    from lakehouse_loader_spark.operators.jpeg import decode_jpeg, encode_jpeg

    enc = bytearray(encode_jpeg(_ramp(10, 8, 3)))
    sof = enc.find(b"\xff\xc0")
    enc[sof + 1] = 0xC9  # pretend arithmetic sequential
    with pytest.raises(ValueError, match="coding process"):
        decode_jpeg(bytes(enc))
    with pytest.raises((ValueError, Exception)):
        decode_jpeg(encode_jpeg(_ramp(10, 8, 3))[:40])


class TestProgressiveJpeg:
    """SOF2 progressive (T.81 Annex G): the progressive encoder shares
    _plan_frame with the baseline one, so both streams carry IDENTICAL
    quantized coefficients — decoded pixels must match bit-for-bit."""

    def _cmp(self, px, q=90, sub=False):
        from lakehouse_loader_spark.operators.jpeg import (
            decode_jpeg, encode_jpeg, encode_jpeg_progressive)

        base = decode_jpeg(encode_jpeg(px, quality=q, subsample=sub))
        prog_bytes = encode_jpeg_progressive(px, quality=q, subsample=sub)
        assert b"\xff\xc2" in prog_bytes  # really SOF2
        prog = decode_jpeg(prog_bytes)
        assert np.array_equal(base["pixels"], prog["pixels"])
        return prog

    def test_color_exact_vs_baseline(self):
        d = self._cmp(_ramp(33, 41, 3), q=85)
        assert (d["width"], d["height"], d["n_channels"]) == (33, 41, 3)

    def test_subsampled_and_odd_dims(self):
        self._cmp(_ramp(17, 23, 3), q=60, sub=True)
        self._cmp(_ramp(9, 130, 3), q=75, sub=True)

    def test_grayscale(self):
        self._cmp(_ramp(24, 24, 0)[..., 0], q=85)

    def test_noise_exercises_zrl_and_eob_runs(self):
        rng = np.random.default_rng(3)
        self._cmp(rng.integers(0, 256, (48, 32, 3), dtype=np.uint8), q=35)
        # flat image: maximal EOB runs across blocks
        self._cmp(np.full((40, 40, 3), 77, dtype=np.uint8), q=90)

    def test_media_codec_dispatches_progressive(self):
        from lakehouse_loader_spark.operators.jpeg import encode_jpeg_progressive
        from lakehouse_loader_spark.operators.media_codec import (
            decode_image, sniff_format)

        payload = encode_jpeg_progressive(_ramp(12, 14, 3))  # (h=14, w=12)
        assert sniff_format(payload) == "jpeg"
        d = decode_image(payload)
        assert d["pixels"].shape == (14, 12, 3)


def test_jpeg_restart_marker_decode():
    """DRI/RSTn support: splice a DRI segment + restart markers into a
    re-encoded entropy stream is complex to hand-craft, so exercise the
    decoder's restart path by round-tripping through an encode that we
    post-process: encode two images and decode each — then verify a
    DRI=0 stream with stuffed 0xFF bytes decodes (stuffing path)."""
    from lakehouse_loader_spark.operators.jpeg import decode_jpeg, encode_jpeg

    # noise maximizes entropy-coded 0xFF byte-stuffing occurrences
    rng = np.random.default_rng(42)
    px = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    enc = encode_jpeg(px, quality=100)
    d = decode_jpeg(enc)
    assert np.abs(d["pixels"].astype(int) - px.astype(int)).max() <= 6


def test_jpeg_sniffed_and_dispatched_by_media_codec():
    from lakehouse_loader_spark.operators.jpeg import encode_jpeg

    enc = encode_jpeg(_ramp(9, 7, 11))
    assert MC.sniff_format(enc) == "jpeg"
    d = MC.decode_media(enc)
    assert d["format"] == "jpeg" and d["width"] == 9 and d["height"] == 7
    assert d["n_samples"] == 9 * 7 * 3
    exp = _ramp(9, 7, 11).astype(int)
    assert abs(d["mean_value"] - exp.mean()) <= 0.5
    assert abs(d["peak_value"] - exp.max()) <= 4
    # corrupt body degrades to opaque byte stats, never raises
    broken = enc[:3] + b"\x00" * 10
    assert MC.decode_media(broken)["format"] == "opaque"


# -- round-8: FLAC (pure-numpy, public RFC 9639 subset) ----------------------


def test_flac_roundtrip_exact_on_synth_ramps():
    from lakehouse_loader_spark.operators.flac import decode_flac, encode_flac

    for doc_id in (0, 2, 4, 6, 8, 10, 12):
        nch = 1 + (doc_id // 2) % 2
        rate = (8000, 16000, 22050)[doc_id % 3]
        nf = 400 + (doc_id % 7) * 50
        i = np.arange(nf)[:, None]
        c = np.arange(nch)[None, :]
        s = ((i * 7 + c * 3 + doc_id * 13) % 201 - 100).astype(np.int16)
        enc = encode_flac(s, rate)
        d = decode_flac(enc)
        assert d["sample_rate"] == rate and d["n_channels"] == nch
        assert np.array_equal(d["samples"], s.astype(np.int32))
        assert len(enc) < 44 + s.size * 2  # genuinely compresses the ramp


@settings(max_examples=20, deadline=None)
@given(
    st.integers(min_value=1, max_value=9000),
    st.integers(min_value=1, max_value=2),
    st.integers(min_value=0, max_value=2**31),
)
def test_flac_property_roundtrip_bit_exact(n, ch, seed):
    from lakehouse_loader_spark.operators.flac import decode_flac, encode_flac

    rng = np.random.default_rng(seed)
    s = rng.integers(-32768, 32768, (n, ch)).astype(np.int16)
    d = decode_flac(encode_flac(s, 44100))
    assert np.array_equal(d["samples"], s.astype(np.int32))


def _hand_frame(subframe_writers, ch_code, block_size, frame_no=0):
    """Build one FLAC frame via the module's own primitives so decoder
    paths the small encoder never emits (LPC, stereo decorrelation,
    VERBATIM/CONSTANT, escape partitions) are still exercised."""
    from lakehouse_loader_spark.operators import flac as FL

    hdr = FL._BitWriter()
    hdr.write(0b11111111111110, 14)
    hdr.write(0, 2)
    hdr.write(0b0111, 4)  # 16-bit block size at end
    hdr.write(0b0000, 4)  # rate from STREAMINFO
    hdr.write(ch_code, 4)
    hdr.write(0b100, 3)  # 16 bps
    hdr.write(0, 1)
    head = hdr.bytes() + FL._utf8_number(frame_no) + struct.pack(">H", block_size - 1)
    head += bytes([FL.crc8(head)])
    body = FL._BitWriter()
    for write_sub in subframe_writers:
        write_sub(body)
    frame = head + body.bytes()
    return frame + struct.pack(">H", FL.crc16(frame))


def _hand_stream(frames, n_ch, n_samples, rate=8000):
    from lakehouse_loader_spark.operators import flac as FL

    si = bytearray()
    si += struct.pack(">HH", 4096, 4096) + b"\x00\x00\x00" * 2
    packed = (rate << 44) | ((n_ch - 1) << 41) | (15 << 36) | n_samples
    si += packed.to_bytes(8, "big") + b"\x00" * 16
    out = bytearray(FL.FLAC_MAGIC) + bytes([0x80]) + struct.pack(">I", len(si))[1:] + si
    for f in frames:
        out += f
    return bytes(out)


def test_flac_decodes_constant_verbatim_and_lpc_subframes():
    from lakehouse_loader_spark.operators import flac as FL

    bs = 16
    const_val = -123
    verb = np.arange(-8, 8, dtype=np.int64)
    # LPC order 1, coef 1, shift 0 => s[i] = s[i-1] + res[i-1]
    warm, res = 100, [1, -2, 3, -4, 5, -6, 7, -8, 9, -10, 11, -12, 13, -14, 15]

    def w_const(b):
        b.write(0, 1); b.write(0b000000, 6); b.write(0, 1)
        b.write(const_val & 0xFFFF, 16)

    def w_verb(b):
        b.write(0, 1); b.write(0b000001, 6); b.write(0, 1)
        for v in verb:
            b.write(int(v) & 0xFFFF, 16)

    def w_lpc(b):
        b.write(0, 1); b.write(0b100000, 6); b.write(0, 1)  # LPC order 1
        b.write(warm & 0xFFFF, 16)
        b.write(14, 4)  # precision-1 = 14 -> 15-bit coefs
        b.write(0, 5)  # shift 0
        b.write(1, 15)  # coef = 1
        b.write(0b00, 2); b.write(0, 4)  # rice method 0, 1 partition
        b.write(14, 4)  # escape-free param big enough
        FL._rice_encode(b, np.array(res, dtype=np.int64), 14)

    frame = _hand_frame([w_const, w_verb, w_lpc], ch_code=2, block_size=bs)
    d = FL.decode_flac(_hand_stream([frame], n_ch=3, n_samples=bs))
    assert np.all(d["samples"][:, 0] == const_val)
    assert np.array_equal(d["samples"][:, 1], verb)
    expect = np.cumsum([warm] + res)
    assert np.array_equal(d["samples"][:, 2], expect)


def test_flac_stereo_decorrelation_modes():
    from lakehouse_loader_spark.operators import flac as FL

    bs = 8
    left = np.array([100, -50, 30, 7, -7, 0, 32000, -32000], dtype=np.int64)
    right = np.array([90, -55, 31, 0, 7, -1, 31995, -31999], dtype=np.int64)
    side = left - right
    mid = (left + right) >> 1

    def verb(vals, bits):
        def w(b):
            b.write(0, 1); b.write(0b000001, 6); b.write(0, 1)
            for v in vals:
                b.write(int(v) & ((1 << bits) - 1), bits)
        return w

    # left-side (ch_code 8): left @16, side @17
    f = _hand_frame([verb(left, 16), verb(side, 17)], ch_code=8, block_size=bs)
    d = FL.decode_flac(_hand_stream([f], n_ch=2, n_samples=bs))
    assert np.array_equal(d["samples"][:, 0], left)
    assert np.array_equal(d["samples"][:, 1], right)
    # right-side (9): side @17, right @16
    f = _hand_frame([verb(side, 17), verb(right, 16)], ch_code=9, block_size=bs)
    d = FL.decode_flac(_hand_stream([f], n_ch=2, n_samples=bs))
    assert np.array_equal(d["samples"][:, 0], left)
    assert np.array_equal(d["samples"][:, 1], right)
    # mid-side (10): mid @16, side @17
    f = _hand_frame([verb(mid, 16), verb(side, 17)], ch_code=10, block_size=bs)
    d = FL.decode_flac(_hand_stream([f], n_ch=2, n_samples=bs))
    assert np.array_equal(d["samples"][:, 0], left)
    assert np.array_equal(d["samples"][:, 1], right)


def test_jpeg_bitcursor_window_semantics():
    """The r16 sliding-window cursor must reproduce the old accumulator
    reader bit-for-bit: MSB-first reads, zero-padded peek windows at the
    tail, and a loud ValueError past the segment end."""
    from lakehouse_loader_spark.operators.jpeg import _BitCursor

    data = bytes([0b10110100, 0b01100011, 0xFF])
    cur = _BitCursor(data)
    assert cur.w[0] == 0b1011010001100011  # first 16 bits
    assert cur.w[8] == 0b0110001111111111  # bits 8..23
    assert cur.w[16] == 0b1111111100000000  # zero-padded past end
    assert cur.w[24] == 0  # all-pad window at nbits
    assert cur.read(3) == 0b101
    assert cur.read(5) == 0b10100
    assert cur.read(16) == 0b0110001111111111
    with pytest.raises(ValueError, match="exhausted"):
        cur.read(1)


def test_jpeg_hufftable_cache_and_packed_layout():
    """_huff_table caches by (BITS, HUFFVAL) spec and the packed lnsym
    table decodes every canonical code to the right (symbol, length)."""
    from lakehouse_loader_spark.operators import jpeg as J

    bits = [0, 2, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
    vals = [7, 3, 9]  # codes: 00->7, 01->3, 100->9
    t1 = J._huff_table(bits, vals)
    assert J._huff_table(list(bits), list(vals)) is t1  # cache hit
    for prefix, sym, ln in ((0b00, 7, 2), (0b01, 3, 2), (0b100, 9, 3)):
        window = prefix << (16 - ln)
        packed = int(t1.lnsym[window])
        assert packed == (ln << 8) | sym
    # unassigned tail decodes as invalid (length 0)
    assert int(t1.lnsym[0xFFFF]) == 0


def test_jpeg_hufftable_cache_evicts_one_not_all():
    """At the cap the cache evicts ONE oldest entry, never clear()s: the
    bench corpus carries ~4.7k distinct specs vs the 4096 cap, and a
    clear() dumped every hot table mid-corpus (r16 — measured as the jpeg
    query reading 0.95s isolated vs ~1.5s inside the full sweep)."""
    from lakehouse_loader_spark.operators import jpeg as J

    saved = dict(J._HUFF_CACHE)
    try:
        J._HUFF_CACHE.clear()
        bits = [0, 0, 0, 0, 0, 0, 0, 8, 0, 0, 0, 0, 0, 0, 0, 0]

        def spec(i):
            return bits, [i & 0xFF, (i >> 8) & 0xFF] + list(range(6))

        for i in range(4096):
            J._huff_table(*spec(i))
        assert len(J._HUFF_CACHE) == 4096
        first = next(iter(J._HUFF_CACHE))
        J._huff_table(*spec(4096))  # one past the cap
        assert len(J._HUFF_CACHE) == 4096  # still full, not dumped
        assert first not in J._HUFF_CACHE  # exactly the oldest went
        # the rest survive: entry #1 is still a cache hit
        t1 = J._HUFF_CACHE[bytes(bits) + b"\xff" + bytes(spec(1)[1])]
        assert J._huff_table(*spec(1)) is t1
    finally:
        J._HUFF_CACHE.clear()
        J._HUFF_CACHE.update(saved)


def test_flac_zero_sample_escape_partition_keeps_sync():
    """A spec-legal zero-sample FIRST partition (block_size/n_parts ==
    predictor order) coded with the escape parameter still carries its
    mandatory 5-bit size field; the decoder must consume it or every later
    partition desyncs (ADVICE r15 medium)."""
    from lakehouse_loader_spark.operators import flac as FL

    bs, order = 8, 2
    warm = [0, 1]
    res = np.array([1, -1, 2, -2, 3, -3], dtype=np.int64)  # bs - order

    def w_fixed2_partitions(b):
        b.write(0, 1); b.write(0b001000 | order, 6); b.write(0, 1)
        for w in warm:
            b.write(w & 0xFFFF, 16)
        b.write(0b00, 2)      # rice method 0
        b.write(2, 4)         # partition order 2 -> 4 partitions of bs/4=2
        # p0: 2 - order = 0 samples, escape-coded -> 5-bit size field only
        b.write(0b1111, 4); b.write(7, 5)
        # p1..p3: 2 samples each, raw 5-bit escape coding
        for chunk in (res[0:2], res[2:4], res[4:6]):
            b.write(0b1111, 4); b.write(5, 5)
            for v in chunk:
                b.write(int(v) & 0x1F, 5)

    f = _hand_frame([w_fixed2_partitions], ch_code=0, block_size=bs)
    d = FL.decode_flac(_hand_stream([f], n_ch=1, n_samples=bs))
    # FIXED order 2: res is the 2nd difference -> s[i] = r + 2s[i-1] - s[i-2]
    sig = list(warm)
    for r in res:
        sig.append(int(r) + 2 * sig[-1] - sig[-2])
    assert np.array_equal(d["samples"][:, 0], np.array(sig))


def test_flac_rice_long_unary_quotient_grows_scan_window():
    """One huge residual makes the unary quotient exceed the bounded scan's
    initial window (n*(param+2)+64 bits); the chunked scan must grow and
    still decode exactly (ADVICE r15 low)."""
    from lakehouse_loader_spark.operators import flac as FL

    bs = 4
    vals = np.array([100, 0, 0, -3], dtype=np.int64)  # zigzag(100) = 200 bits unary

    def w_fixed0_rice0(b):
        b.write(0, 1); b.write(0b001000, 6); b.write(0, 1)  # FIXED order 0
        b.write(0b00, 2); b.write(0, 4)  # method 0, 1 partition
        b.write(0, 4)  # rice param 0
        FL._rice_encode(b, vals, 0)

    f = _hand_frame([w_fixed0_rice0], ch_code=0, block_size=bs)
    d = FL.decode_flac(_hand_stream([f], n_ch=1, n_samples=bs))
    assert np.array_equal(d["samples"][:, 0], vals)


def test_flac_escape_partition_and_crc_rejection():
    from lakehouse_loader_spark.operators import flac as FL

    bs = 8
    vals = np.array([5, -3, 2, -1, 0, 1, -2, 4], dtype=np.int64)

    def w_fixed0_escape(b):
        b.write(0, 1); b.write(0b001000, 6); b.write(0, 1)  # FIXED order 0
        b.write(0b00, 2); b.write(0, 4)
        b.write(0b1111, 4)  # escape code
        b.write(4, 5)  # raw 4-bit residuals
        for v in vals:
            b.write(int(v) & 0xF, 4)

    f = _hand_frame([w_fixed0_escape], ch_code=0, block_size=bs)
    d = FL.decode_flac(_hand_stream([f], n_ch=1, n_samples=bs))
    assert np.array_equal(d["samples"][:, 0], vals)
    # corrupt a frame-header byte -> CRC-8 catches it loudly
    stream = _hand_stream([f], n_ch=1, n_samples=bs)
    fstart = len(stream) - len(f)
    bad = bytearray(stream)
    bad[fstart + 4] ^= 0x01  # frame number byte -> CRC-8 mismatch
    with pytest.raises(ValueError, match="CRC"):
        FL.decode_flac(bytes(bad))


def test_flac_sniffed_and_dispatched_by_media_codec():
    from lakehouse_loader_spark.operators.flac import encode_flac

    s = ((np.arange(500)[:, None] * 7) % 201 - 100).astype(np.int16)
    enc = encode_flac(s, 16000)
    assert MC.sniff_format(enc) == "flac"
    d = MC.decode_media(enc)
    assert d["format"] == "flac" and d["sample_rate"] == 16000
    assert d["n_samples"] == 500 and abs(d["mean_value"] - s.mean()) < 1e-9
    assert MC.decode_media(b"fLaC" + b"\x00" * 8)["format"] == "opaque"


@settings(max_examples=120, deadline=None)
@given(st.binary(min_size=0, max_size=600), st.integers(min_value=0, max_value=6))
def test_decode_media_never_raises_fuzz(blob, fmt_hint):
    """The never-raise contract under adversarial bytes: random payloads
    wearing each format's magic (so the real decoders run and fail at
    arbitrary depths) must degrade to byte stats, never kill the task."""
    magics = [
        b"",
        b"RIFF" + blob[:4] + b"WAVE",
        b"P6\n",
        b"BM",
        b"\x89PNG\r\n\x1a\n",
        b"\xff\xd8\xff\xe0",
        b"fLaC",
    ]
    payload = magics[fmt_hint] + blob
    out = MC.decode_media(payload)
    assert out["byte_len"] == len(payload)
    assert isinstance(out["format"], str)


def test_decode_media_survives_truncations_of_valid_streams():
    """Every prefix-truncation of a VALID stream of each format degrades
    cleanly (torn downloads are the common real-corpus corruption)."""
    from lakehouse_loader_spark.operators.flac import encode_flac
    from lakehouse_loader_spark.operators.jpeg import encode_jpeg

    streams = [
        MC.encode_wav(np.arange(100, dtype="<i2"), 8000),
        MC.encode_ppm(_ramp(9, 7, 1)),
        MC.encode_png(_ramp(9, 7, 1)),
        encode_jpeg(_ramp(9, 7, 1)),
        encode_flac(np.arange(200, dtype=np.int16), 8000),
    ]
    for full in streams:
        for cut in range(0, len(full), max(1, len(full) // 40)):
            out = MC.decode_media(full[:cut])
            assert out["byte_len"] == cut
