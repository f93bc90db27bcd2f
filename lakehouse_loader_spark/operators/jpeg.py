"""Baseline JPEG (JFIF) codec in pure numpy — no codec library.

Everything here derives from the public ITU-T T.81 spec (the JPEG
standard) and the JFIF container note: marker layout, the Annex K
example quantization/Huffman tables, zig-zag order, byte stuffing,
restart markers, and the BT.601 YCbCr transform.  The reference treats
image payloads as an opaque binary column and never decodes them; this
codec is what promotes real-corpus JPEG payloads out of the byte-stats
fallback tier (operators/media_codec.py, the r7 PNG precedent).

Scope: sequential baseline DCT (SOF0) AND progressive DCT (SOF2,
spectral selection + successive approximation per T.81 Annex G), 8-bit
samples, 1 or 3 components, Huffman entropy coding, chroma subsampling
factors 1 or 2 (4:4:4 and 4:2:0), DRI/RSTn restart markers.  Arithmetic
coding, hierarchical (SOF5+) and 12-bit precision raise loudly — callers
fall back to byte statistics rather than misdecoding.

Performance shape: the entropy scan is a sequential bit stream (that is
inherent to Huffman), decoded symbol-at-a-time against O(1) lookup
tables; everything block-shaped — FDCT/IDCT, quantization, level
shift, color transform — is batched numpy linear algebra over all
blocks at once.  At pipeline scale each payload decodes inside an
Arrow-batched mapInPandas task (operators/multimodal.py), so the
per-image Python cost parallelizes across executors.
"""

from __future__ import annotations

import struct

import numpy as np

# -- constants from the public spec -----------------------------------------

ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)
_UNZIGZAG = np.argsort(ZIGZAG)

# Annex K example tables (T.81 Tables K.1/K.2 quant, K.3-K.6 Huffman)
QUANT_LUMA = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int64,
)
QUANT_CHROMA = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int64,
)

DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))
AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]
AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
    0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
    0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]

# orthonormal DCT-II matrix: FDCT = C @ B @ C.T, IDCT = C.T @ X @ C
_k = np.arange(8)
_DCT = np.cos((2 * _k[None, :] + 1) * _k[:, None] * np.pi / 16) * np.sqrt(0.25)
_DCT[0] /= np.sqrt(2)


def quant_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    """IJG-convention quality scaling of the Annex K tables: 50 = as
    published, 100 = all ones (near-lossless)."""
    if not 1 <= quality <= 100:
        raise ValueError("quality must be in 1..100")
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    out = []
    for t in (QUANT_LUMA, QUANT_CHROMA):
        q = (t * scale + 50) // 100
        out.append(np.clip(q, 1, 255).astype(np.int64))
    return out[0], out[1]


def rgb_to_ycbcr(px: np.ndarray) -> np.ndarray:
    r, g, b = (px[..., i].astype(np.float64) for i in range(3))
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.stack([y, cb, cr], axis=-1)


def ycbcr_to_rgb(px: np.ndarray) -> np.ndarray:
    y, cb, cr = (px[..., i].astype(np.float64) for i in range(3))
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(np.stack([r, g, b], axis=-1).round(), 0, 255).astype(np.uint8)


def _to_blocks(plane: np.ndarray) -> np.ndarray:
    """(H, W) padded plane (multiples of 8) → (n_blocks, 8, 8) in raster
    block order."""
    h, w = plane.shape
    return (
        plane.reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    )


def _from_blocks(blocks: np.ndarray, h8: int, w8: int) -> np.ndarray:
    return (
        blocks.reshape(h8 // 8, w8 // 8, 8, 8).transpose(0, 2, 1, 3).reshape(h8, w8)
    )


def _pad_to_multiple(plane: np.ndarray, mh: int, mw: int) -> np.ndarray:
    h, w = plane.shape
    ph, pw = (-h) % mh, (-w) % mw
    return np.pad(plane, ((0, ph), (0, pw)), mode="edge")


# -- Huffman machinery -------------------------------------------------------


def _build_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol → (code, length) by the canonical T.81 assignment."""
    codes = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            codes[vals[k]] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    return codes


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            b = (self.acc >> (self.n - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def flush(self) -> bytes:
        if self.n:
            self.write(0x7F, 8 - self.n)  # pad with 1s
        return bytes(self.out)


def _magnitude(v: int) -> tuple[int, int]:
    """v → (size, amplitude bits) per the T.81 DC/AC magnitude coding."""
    if v == 0:
        return 0, 0
    size = int(abs(v)).bit_length()
    bits = v if v > 0 else v + (1 << size) - 1
    return size, bits


_PHASE_SHIFTS = np.arange(16, 8, -1, dtype=np.uint32)[None, :]


class _BitCursor:
    """Positional MSB-first reader over a de-stuffed entropy segment: one
    vectorized pass builds ``w``, the 16-bit sliding-window array
    (``w[i]`` = bits i..i+15, zero-padded past the end exactly like the
    old byte-accumulator peek16), so a Huffman symbol or amplitude costs
    one array index instead of per-byte accumulator arithmetic — the
    table-driven state-machine shape from the r15 FLAC win (r16,
    VERDICT item 3)."""

    __slots__ = ("w", "nbits", "pos")

    def __init__(self, data: bytes) -> None:
        m = len(data)
        # big-endian u32 word starting at EVERY byte (stride-1 view, no
        # compute), then all 8 bit-phases in one broadcast shift:
        # w[8*j + s] = bits (8j+s)..(8j+s+15), zero-padded at the end
        buf = data + b"\x00\x00\x00"
        u = np.ndarray((m,), dtype=">u4", buffer=buf, strides=(1,)).astype(
            np.uint32
        )
        w32 = u[:, None] >> _PHASE_SHIFTS
        # plain-int list: per-symbol indexing avoids numpy scalar overhead
        # (segments are KB-scale, so the list costs microseconds); the
        # uint16 cast truncates to the window mask; one trailing 0 so
        # w[nbits] is a valid (all-pad) window
        w = w32.astype(np.uint16).ravel().tolist()
        w.append(0)
        self.w = w
        self.nbits = 8 * m
        self.pos = 0

    def read(self, k: int) -> int:
        """k <= 16 raw bits; raises past the segment end exactly like the
        old accumulator reader."""
        pos = self.pos
        if pos + k > self.nbits:
            raise ValueError("entropy stream exhausted")
        self.pos = pos + k
        return self.w[pos] >> (16 - k) if k else 0


class _HuffTable:
    """16-bit peek lookup, built vectorized (canonical codes tile the
    prefix space contiguously from 0, so two ``np.repeat`` calls replace
    the per-symbol slice-assignment loop).  ``lnsym`` packs
    (code_length << 8) | symbol into one uint16 array so a decode costs a
    single table load."""

    def __init__(self, bits: list[int], vals: list[int]) -> None:
        lens = np.repeat(np.arange(1, 17, dtype=np.int64), bits)
        spans = 1 << (16 - lens)
        total = int(spans.sum())
        if total > (1 << 16):
            raise ValueError("oversubscribed Huffman code lengths")
        lnsym = np.zeros(1 << 16, dtype=np.uint16)
        packed = (lens.astype(np.uint16) << 8) | np.asarray(vals, dtype=np.uint16)
        lnsym[:total] = np.repeat(packed, spans)
        self.lnsym = lnsym

    def decode(self, cur: _BitCursor) -> int:
        c = int(self.lnsym[cur.w[cur.pos]])
        ln = c >> 8
        if ln == 0:
            raise ValueError("invalid Huffman code in entropy stream")
        cur.pos += ln
        if cur.pos > cur.nbits:
            raise ValueError("entropy stream exhausted")
        return c & 0xFF


# Decode tables are cached by their (BITS, HUFFVAL) spec: the per-image
# optimized tables repeat heavily across a corpus (77% hit rate over the
# bench's synthesized population), and each build allocates 128 KB.
_HUFF_CACHE: dict[bytes, _HuffTable] = {}


def _huff_table(bits: list[int], vals: list[int]) -> _HuffTable:
    key = bytes(bits) + b"\xff" + bytes(vals)
    t = _HUFF_CACHE.get(key)
    if t is None:
        if len(_HUFF_CACHE) >= 4096:  # ~512 MB of tables; plenty for a task
            # evict ONE oldest entry (insertion-ordered dict), never the
            # whole cache: the bench corpus carries ~4.7k distinct specs,
            # so a clear() at the cap dumped every hot table mid-corpus
            # and a long-lived reused worker re-paid thousands of 128 KB
            # builds per sweep (measured: jpeg decode 0.95s isolated vs
            # 1.5s inside the full-registry sweep)
            _HUFF_CACHE.pop(next(iter(_HUFF_CACHE)))
        t = _HuffTable(bits, vals)
        _HUFF_CACHE[key] = t
    return t


def _extend(bits: int, size: int) -> int:
    if size == 0:
        return 0
    return bits if bits >= (1 << (size - 1)) else bits - (1 << size) + 1


# -- encoder -----------------------------------------------------------------


def _encode_plane_blocks(
    blocks: np.ndarray, qtable: np.ndarray
) -> np.ndarray:
    """(N,8,8) spatial → (N,64) zig-zag quantized coefficients (all blocks
    in one matmul)."""
    shifted = blocks.astype(np.float64) - 128.0
    coef = _DCT @ shifted @ _DCT.T
    q = np.round(coef.reshape(-1, 64) / qtable[_UNZIGZAG][None, :].astype(np.float64))
    return q.reshape(-1, 64)[:, ZIGZAG].astype(np.int64)


def _plan_frame(pixels: np.ndarray, quality: int, subsample: bool) -> dict:
    """Shared encode planning: color transform, subsampling, MCU-grid
    padding, and per-component zig-zag quantized coefficients — everything
    before entropy coding (identical for baseline and progressive, which
    is what makes the two encoders coefficient-exact twins)."""
    pixels = np.asarray(pixels)
    gray = pixels.ndim == 2
    h, w = pixels.shape[:2]
    if h == 0 or w == 0 or h > 65535 or w > 65535:
        raise ValueError(f"unencodable dimensions {h}x{w}")
    ql, qc = quant_tables(quality)
    if gray:
        planes = [pixels.astype(np.float64)]
        samp = [(1, 1)]
        qsel = [0]
    else:
        ycc = rgb_to_ycbcr(pixels)
        y, cb, cr = ycc[..., 0], ycc[..., 1], ycc[..., 2]
        if subsample:
            cb = _pad_to_multiple(cb, 2, 2).reshape(
                (h + 1) // 2, 2, (w + 1) // 2, 2
            ).mean(axis=(1, 3))
            cr = _pad_to_multiple(cr, 2, 2).reshape(
                (h + 1) // 2, 2, (w + 1) // 2, 2
            ).mean(axis=(1, 3))
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            samp = [(1, 1), (1, 1), (1, 1)]
        planes = [y, cb, cr]
        qsel = [0, 1, 1]
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    # per-plane zig-zag coefficient arrays, blocks in raster order; each
    # plane pads (edge-replicate) to its MCU-grid coverage: the grid is
    # ceil over 8*hmax x 8*vmax luma samples, a component covers
    # (mcus_y*sv x mcus_x*sh) blocks
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    coefs, bw_blocks = [], []
    for pl, (sh, sv) in zip(planes, samp):
        ph = -(-h * sv // vmax)  # this plane's true sample dims (ceil)
        pw = -(-w * sh // hmax)
        need_h, need_w = mcus_y * sv * 8, mcus_x * sh * 8
        full = np.pad(
            pl[:ph, :pw],
            ((0, need_h - ph), (0, need_w - pw)),
            mode="edge",
        )
        q = ql if (qsel[len(coefs)] == 0) else qc
        coefs.append(_encode_plane_blocks(_to_blocks(full), q))
        bw_blocks.append((need_h // 8, need_w // 8))
    return {
        "gray": gray, "h": h, "w": w, "ql": ql, "qc": qc, "samp": samp,
        "hmax": hmax, "vmax": vmax, "mcus_x": mcus_x, "mcus_y": mcus_y,
        "coefs": coefs, "bw_blocks": bw_blocks,
    }


def encode_jpeg(
    pixels: np.ndarray, quality: int = 100, subsample: bool = False
) -> bytes:
    """(H, W, 3) RGB or (H, W) grayscale uint8 → baseline JFIF bytes.
    ``subsample`` emits 4:2:0 (2x2 chroma factors); default 4:4:4."""
    plan = _plan_frame(pixels, quality, subsample)
    gray, h, w = plan["gray"], plan["h"], plan["w"]
    ql, qc, samp = plan["ql"], plan["qc"], plan["samp"]
    hmax, vmax = plan["hmax"], plan["vmax"]
    coefs, bw_blocks = plan["coefs"], plan["bw_blocks"]
    planes = coefs  # len only (per-component loop bounds below)
    # entropy-code the interleaved MCU scan
    dc_tabs = [
        _build_codes(DC_LUMA_BITS, DC_LUMA_VALS),
        _build_codes(DC_CHROMA_BITS, DC_CHROMA_VALS),
    ]
    ac_tabs = [
        _build_codes(AC_LUMA_BITS, AC_LUMA_VALS),
        _build_codes(AC_CHROMA_BITS, AC_CHROMA_VALS),
    ]
    bwr = _BitWriter()
    pred = [0] * len(planes)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for ci, (sh, sv) in enumerate(samp):
                tsel = 0 if ci == 0 else 1
                dct, act = dc_tabs[tsel], ac_tabs[tsel]
                _, bwidth = bw_blocks[ci]
                for by in range(sv):
                    for bx in range(sh):
                        blk = coefs[ci][(my * sv + by) * bwidth + (mx * sh + bx)]
                        diff = int(blk[0]) - pred[ci]
                        pred[ci] = int(blk[0])
                        size, bits = _magnitude(diff)
                        code, ln = dct[size]
                        bwr.write(code, ln)
                        if size:
                            bwr.write(bits, size)
                        run = 0
                        nz = np.flatnonzero(blk[1:])
                        last = nz[-1] + 1 if len(nz) else 0
                        for k in range(1, last + 1):
                            v = int(blk[k])
                            if v == 0:
                                run += 1
                                continue
                            while run >= 16:
                                code, ln = act[0xF0]  # ZRL
                                bwr.write(code, ln)
                                run -= 16
                            size, bits = _magnitude(v)
                            code, ln = act[(run << 4) | size]
                            bwr.write(code, ln)
                            bwr.write(bits, size)
                            run = 0
                        if last < 63:
                            code, ln = act[0x00]  # EOB
                            bwr.write(code, ln)
    scan = bwr.flush()

    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    for tid, q in ((0, ql), (1, qc)) if not gray else ((0, ql),):
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tid]) + bytes(
            int(x) for x in q
        )
    nc = 1 if gray else 3
    sof = struct.pack(">HBHHB", 8 + 3 * nc, 8, h, w, nc)
    for ci in range(nc):
        sh, sv = samp[ci]
        sof += bytes([ci + 1, (sh << 4) | sv, 0 if ci == 0 else 1])
    out += b"\xff\xc0" + sof
    huffs = [
        (0x00, DC_LUMA_BITS, DC_LUMA_VALS),
        (0x10, AC_LUMA_BITS, AC_LUMA_VALS),
    ]
    if not gray:
        huffs += [
            (0x01, DC_CHROMA_BITS, DC_CHROMA_VALS),
            (0x11, AC_CHROMA_BITS, AC_CHROMA_VALS),
        ]
    for tc, bits, vals in huffs:
        body = bytes([tc]) + bytes(bits) + bytes(vals)
        out += b"\xff\xc4" + struct.pack(">H", len(body) + 2) + body
    sos = struct.pack(">HB", 6 + 2 * nc, nc)
    for ci in range(nc):
        sos += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    sos += b"\x00\x3f\x00"
    out += b"\xff\xda" + sos + scan + b"\xff\xd9"
    return bytes(out)


# -- decoder -----------------------------------------------------------------


def decode_jpeg(payload: bytes) -> dict:
    """Baseline JFIF bytes → {'pixels': (H,W,3)|(H,W) uint8, 'width',
    'height', 'n_channels'}.  Raises ValueError on anything outside the
    baseline subset (progressive, arithmetic, 12-bit) — callers treat
    that as the byte-stats tier, never a wrong image."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (no SOI)")
    p = 2
    qtables: dict[int, np.ndarray] = {}
    huff_dc: dict[int, _HuffTable] = {}
    huff_ac: dict[int, _HuffTable] = {}
    frame = None
    prog_stores = None  # progressive: coefficient accumulators across scans
    restart_interval = 0
    n = len(payload)
    while p < n:
        if payload[p] != 0xFF:
            raise ValueError(f"expected marker at byte {p}")
        marker = payload[p + 1]
        p += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue  # parameterless
        (seglen,) = struct.unpack_from(">H", payload, p)
        seg = payload[p + 2 : p + seglen]
        p += seglen
        if marker == 0xDB:  # DQT
            q = 0
            while q < len(seg):
                prec, tid = seg[q] >> 4, seg[q] & 0x0F
                q += 1
                if prec == 0:
                    qtables[tid] = np.frombuffer(
                        seg, dtype=np.uint8, count=64, offset=q
                    ).astype(np.int64)
                    q += 64
                else:
                    qtables[tid] = np.frombuffer(
                        seg, dtype=">u2", count=64, offset=q
                    ).astype(np.int64)
                    q += 128
        elif marker == 0xC4:  # DHT
            q = 0
            while q < len(seg):
                tc, th = seg[q] >> 4, seg[q] & 0x0F
                q += 1
                bits = list(seg[q : q + 16])
                q += 16
                nv = sum(bits)
                vals = list(seg[q : q + nv])
                q += nv
                (huff_dc if tc == 0 else huff_ac)[th] = _huff_table(bits, vals)
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 sequential, SOF2 progressive
            prec, fh, fw, nc = seg[0], *struct.unpack_from(">HH", seg, 1), seg[5]
            if prec != 8:
                raise ValueError(f"unsupported sample precision {prec}")
            comps = []
            for ci in range(nc):
                cid, sf, tq = seg[6 + 3 * ci : 9 + 3 * ci]
                comps.append({"id": cid, "h": sf >> 4, "v": sf & 0x0F, "tq": tq})
            frame = {"h": fh, "w": fw, "comps": comps, "progressive": marker == 0xC2}
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"unsupported JPEG coding process (SOF marker 0x{marker:02x}); "
                "only sequential and progressive Huffman are implemented"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:  # SOS — entropy data follows
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = seg[0]
            scomps = []
            for si in range(ns):
                cs, tt = seg[1 + 2 * si], seg[2 + 2 * si]
                comp = next(c for c in frame["comps"] if c["id"] == cs)
                scomps.append((comp, tt >> 4, tt & 0x0F))
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            ah, al = seg[3 + 2 * ns] >> 4, seg[3 + 2 * ns] & 0x0F
            # find the entropy segment end: next non-RST marker
            q = p
            while q < n - 1:
                if payload[q] == 0xFF and payload[q + 1] not in (0x00,) and not (
                    0xD0 <= payload[q + 1] <= 0xD7
                ):
                    break
                q += 1
            entropy = payload[p:q]
            p = q
            if not frame.get("progressive"):
                return _decode_scan(
                    frame, scomps, qtables, huff_dc, huff_ac, entropy, restart_interval
                )
            if prog_stores is None:
                prog_stores = _init_coef_stores(frame)
            _decode_progressive_scan(
                frame, scomps, huff_dc, huff_ac, entropy, restart_interval,
                prog_stores, ss, se, ah, al,
            )
        # APPn/COM and others: skip
    if frame is not None and frame.get("progressive") and prog_stores is not None:
        return _reconstruct(
            frame, [(c, prog_stores[c["id"]]) for c in frame["comps"]], qtables
        )
    raise ValueError("no SOS scan in JPEG stream")


def _decode_scan(
    frame, scomps, qtables, huff_dc, huff_ac, entropy: bytes, restart_interval: int
) -> dict:
    h, w = frame["h"], frame["w"]
    hmax = max(c["h"] for c in frame["comps"])
    vmax = max(c["v"] for c in frame["comps"])
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    # coefficient store per component
    store = []
    for comp, _, _ in scomps:
        bw = mcus_x * comp["h"]
        bh = mcus_y * comp["v"]
        store.append(np.zeros((bh * bw, 64), dtype=np.int64))
    segments = _split_entropy(entropy, restart_interval)
    mcu_index = 0
    seg_iter = iter(segments)
    cur = _BitCursor(next(seg_iter))
    W, NB, pos = cur.w, cur.nbits, 0
    pred = [0] * len(scomps)
    # hoisted per-component decode state: packed (len<<8|sym) tables and
    # block-grid geometry — the inner loop below is the inlined form of
    # _HuffTable.decode + _BitCursor.read + _extend (identical values,
    # identical exhaustion/invalid-code errors), one list index and one
    # table load per symbol
    tabs = [
        (huff_dc[td].lnsym, huff_ac[ta].lnsym, comp["h"], comp["v"], mcus_x * comp["h"])
        for comp, td, ta in scomps
    ]
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_index and mcu_index % restart_interval == 0:
                cur = _BitCursor(next(seg_iter))
                W, NB, pos = cur.w, cur.nbits, 0
                pred = [0] * len(scomps)
            for ci, (dtab, atab, ch, cv, bw) in enumerate(tabs):
                for by in range(cv):
                    row = (my * cv + by) * bw + mx * ch
                    for bx in range(ch):
                        blk = store[ci][row + bx]
                        c = int(dtab[W[pos]])
                        size = c & 0xFF
                        ln = c >> 8
                        if ln == 0:
                            raise ValueError(
                                "invalid Huffman code in entropy stream"
                            )
                        pos += ln
                        if size:
                            if pos + size > NB:
                                raise ValueError("entropy stream exhausted")
                            v = W[pos] >> (16 - size)
                            pos += size
                            pred[ci] += (
                                v if v >= (1 << (size - 1)) else v - (1 << size) + 1
                            )
                        elif pos > NB:
                            raise ValueError("entropy stream exhausted")
                        blk[0] = pred[ci]
                        k = 1
                        while k <= 63:
                            c = int(atab[W[pos]])
                            ln = c >> 8
                            if ln == 0:
                                raise ValueError(
                                    "invalid Huffman code in entropy stream"
                                )
                            pos += ln
                            if pos > NB:
                                raise ValueError("entropy stream exhausted")
                            s = c & 0x0F
                            if s == 0:
                                r = (c >> 4) & 0x0F
                                if r == 15:
                                    k += 16  # ZRL
                                    continue
                                break  # EOB
                            k += (c >> 4) & 0x0F
                            if k > 63:
                                raise ValueError("AC run past block end")
                            if pos + s > NB:
                                raise ValueError("entropy stream exhausted")
                            v = W[pos] >> (16 - s)
                            pos += s
                            blk[k] = (
                                v if v >= (1 << (s - 1)) else v - (1 << s) + 1
                            )
                            k += 1
            mcu_index += 1
    return _reconstruct(
        frame, [(comp, store[ci]) for ci, (comp, _, _) in enumerate(scomps)], qtables
    )


def _split_entropy(entropy: bytes, restart_interval: int) -> list[bytes]:
    """De-stuff the entropy bytes; with restarts, split on RSTn markers
    (one de-stuffed segment per restart interval)."""
    if not restart_interval:
        return [entropy.replace(b"\xff\x00", b"\xff")]
    segments = []
    seg = bytearray()
    i = 0
    while i < len(entropy):
        b = entropy[i]
        if b == 0xFF and i + 1 < len(entropy):
            nxt = entropy[i + 1]
            if nxt == 0x00:
                seg.append(0xFF)
                i += 2
                continue
            if 0xD0 <= nxt <= 0xD7:
                segments.append(bytes(seg))
                seg = bytearray()
                i += 2
                continue
        seg.append(b)
        i += 1
    segments.append(bytes(seg))
    return segments


def _frame_geometry(frame):
    hmax = max(c["h"] for c in frame["comps"])
    vmax = max(c["v"] for c in frame["comps"])
    mcus_x = -(-frame["w"] // (8 * hmax))
    mcus_y = -(-frame["h"] // (8 * vmax))
    return hmax, vmax, mcus_x, mcus_y


def _init_coef_stores(frame) -> dict:
    """Per-component zig-zag coefficient accumulators over the padded MCU
    grid, keyed by component id — progressive scans fill them in pieces."""
    _, _, mcus_x, mcus_y = _frame_geometry(frame)
    return {
        c["id"]: np.zeros((mcus_y * c["v"] * mcus_x * c["h"], 64), dtype=np.int64)
        for c in frame["comps"]
    }


def _reconstruct(frame, comp_arrays, qtables) -> dict:
    """(comp, zig-zag coefficient array) pairs → decoded pixel dict:
    dequantize + IDCT all blocks per component at once, upsample, crop,
    color-transform."""
    h, w = frame["h"], frame["w"]
    hmax, vmax, mcus_x, mcus_y = _frame_geometry(frame)
    planes = []
    for comp, arr in comp_arrays:
        q = qtables[comp["tq"]]
        coef = (arr * q[None, :]).astype(np.float64)
        spatial = coef[:, _UNZIGZAG].reshape(-1, 8, 8)
        blocks = _DCT.T @ spatial @ _DCT + 128.0
        bw = mcus_x * comp["h"]
        bh = mcus_y * comp["v"]
        plane = _from_blocks(blocks, bh * 8, bw * 8)
        # upsample to full resolution by sample-factor replication
        ry, rx = vmax // comp["v"], hmax // comp["h"]
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        planes.append(plane[:h, :w])
    if len(planes) == 1:
        px = np.clip(planes[0].round(), 0, 255).astype(np.uint8)
        return {"format": "jpeg", "pixels": px, "width": w, "height": h, "n_channels": 1}
    px = ycbcr_to_rgb(np.stack(planes, axis=-1))
    return {"format": "jpeg", "pixels": px, "width": w, "height": h, "n_channels": 3}


def _decode_progressive_scan(
    frame, scomps, huff_dc, huff_ac, entropy: bytes, restart_interval: int,
    stores: dict, ss: int, se: int, ah: int, al: int,
) -> None:
    """One progressive scan (T.81 Annex G decode procedures) accumulated
    into ``stores``: DC first/refine (Ss=0), AC first/refine (Ss>0,
    single-component non-interleaved traversal per G.1.1).  Restart
    markers reset the DC predictors and the EOB run."""
    hmax, vmax, mcus_x, mcus_y = _frame_geometry(frame)
    seg_iter = iter(_split_entropy(entropy, restart_interval))
    br = _BitCursor(next(seg_iter))

    if ss == 0:  # DC scan
        if se != 0:
            raise ValueError("DC progressive scan must have Se=0")
        pred = [0] * len(scomps)
        if len(scomps) > 1:  # interleaved MCU traversal
            unit = 0
            for my in range(mcus_y):
                for mx in range(mcus_x):
                    if restart_interval and unit and unit % restart_interval == 0:
                        br = _BitCursor(next(seg_iter))
                        pred = [0] * len(scomps)
                    for ci, (comp, td, _ta) in enumerate(scomps):
                        bw = mcus_x * comp["h"]
                        for by in range(comp["v"]):
                            for bx in range(comp["h"]):
                                blk = stores[comp["id"]][
                                    (my * comp["v"] + by) * bw
                                    + (mx * comp["h"] + bx)
                                ]
                                _dc_progressive(blk, br, huff_dc, td, pred, ci, ah, al)
                    unit += 1
            return
        comp, td, _ta = scomps[0]
        for i, blk in _noninterleaved_blocks(frame, comp, stores, mcus_x):
            if restart_interval and i and i % restart_interval == 0:
                br = _BitCursor(next(seg_iter))
                pred = [0]
            _dc_progressive(blk, br, huff_dc, td, pred, 0, ah, al)
        return

    # AC scan: always single-component, non-interleaved (G.1.1)
    if len(scomps) != 1:
        raise ValueError("progressive AC scan must contain one component")
    comp, _td, ta = scomps[0]
    act = huff_ac[ta]
    eobrun = 0
    for i, blk in _noninterleaved_blocks(frame, comp, stores, mcus_x):
        if restart_interval and i and i % restart_interval == 0:
            br = _BitCursor(next(seg_iter))
            eobrun = 0
        if ah == 0:
            eobrun = _ac_first(blk, br, act, ss, se, al, eobrun)
        else:
            eobrun = _ac_refine(blk, br, act, ss, se, al, eobrun)


def _noninterleaved_blocks(frame, comp, stores, mcus_x):
    """Single-component scan traversal (G.1.1): row-major over the
    component's OWN block grid (ceil of its true sample dims), indexed
    into the padded MCU-grid store."""
    hmax, vmax, _, _ = _frame_geometry(frame)
    cw = -(-(frame["w"] * comp["h"]) // hmax)
    ch = -(-(frame["h"] * comp["v"]) // vmax)
    wb, hb = -(-cw // 8), -(-ch // 8)
    bw = mcus_x * comp["h"]
    arr = stores[comp["id"]]
    i = 0
    for by in range(hb):
        for bx in range(wb):
            yield i, arr[by * bw + bx]
            i += 1


def _dc_progressive(blk, br, huff_dc, td, pred, ci, ah, al) -> None:
    if ah == 0:  # first scan: diff-coded point-transformed DC
        size = huff_dc[td].decode(br)
        diff = _extend(br.read(size), size) if size else 0
        pred[ci] += diff
        blk[0] = pred[ci] << al
    else:  # refinement: one raw bit per block
        if br.read(1):
            blk[0] |= 1 << al


def _ac_first(blk, br, act, ss, se, al, eobrun) -> int:
    """AC first scan for one block (G.1.2.2): returns the updated EOB run
    (counts whole blocks with no nonzero in the band, current included).
    Cursor ops are inlined (the _decode_scan pattern) — identical values
    and identical exhaustion/invalid-code errors."""
    if eobrun > 0:
        return eobrun - 1
    tab, W, NB, pos = act.lnsym, br.w, br.nbits, br.pos
    k = ss
    out = 0
    while k <= se:
        c = int(tab[W[pos]])
        ln = c >> 8
        if ln == 0:
            raise ValueError("invalid Huffman code in entropy stream")
        pos += ln
        if pos > NB:
            raise ValueError("entropy stream exhausted")
        s = c & 0x0F
        if s == 0:
            r = (c >> 4) & 0x0F
            if r == 15:  # ZRL: 16 zero coefficients
                k += 16
                continue
            eobrun = 1 << r
            if r:
                if pos + r > NB:
                    raise ValueError("entropy stream exhausted")
                eobrun += W[pos] >> (16 - r)
                pos += r
            out = eobrun - 1
            break
        k += (c >> 4) & 0x0F
        if k > se:
            raise ValueError("AC run past band end")
        if pos + s > NB:
            raise ValueError("entropy stream exhausted")
        v = W[pos] >> (16 - s)
        pos += s
        blk[k] = (v if v >= (1 << (s - 1)) else v - (1 << s) + 1) << al
        k += 1
    br.pos = pos
    return out


def _ac_refine(blk, br, act, ss, se, al, eobrun) -> int:
    """AC refinement scan for one block (G.1.2.3): newly-significant
    coefficients arrive as ±1<<Al; every already-nonzero coefficient
    passed on the way consumes one correction bit.  Runs count
    ZERO-HISTORY positions only.  Returns the updated EOB run."""
    p1, m1 = 1 << al, -1 << al
    tab, W, NB, pos = act.lnsym, br.w, br.nbits, br.pos

    k = ss
    if eobrun == 0:
        while k <= se:
            c = int(tab[W[pos]])
            ln = c >> 8
            if ln == 0:
                raise ValueError("invalid Huffman code in entropy stream")
            pos += ln
            if pos > NB:
                raise ValueError("entropy stream exhausted")
            r, s = (c >> 4) & 0x0F, c & 0x0F
            if s == 0:
                if r < 15:
                    eobrun = 1 << r
                    if r:
                        if pos + r > NB:
                            raise ValueError("entropy stream exhausted")
                        eobrun += W[pos] >> (16 - r)
                        pos += r
                    break
                val = 0  # ZRL: skip 16 zero-history positions
            else:
                if s != 1:
                    raise ValueError("refinement scan coefficient must be ±1")
                if pos >= NB:
                    raise ValueError("entropy stream exhausted")
                val = p1 if W[pos] >> 15 else m1
                pos += 1
            while k <= se:
                cval = int(blk[k])
                if cval != 0:
                    # correction bit for every nonzero-history coefficient
                    if pos >= NB:
                        raise ValueError("entropy stream exhausted")
                    bit = W[pos] >> 15
                    pos += 1
                    if bit and (cval & p1) == 0:
                        blk[k] = cval + (p1 if cval >= 0 else m1)
                else:
                    if r == 0:
                        if s:
                            blk[k] = val
                        k += 1
                        break
                    r -= 1
                k += 1
    if eobrun > 0:
        # EOB region: remaining nonzero-history coefficients of THIS block
        # still consume correction bits
        while k <= se:
            cval = int(blk[k])
            if cval != 0:
                if pos >= NB:
                    raise ValueError("entropy stream exhausted")
                bit = W[pos] >> 15
                pos += 1
                if bit and (cval & p1) == 0:
                    blk[k] = cval + (p1 if cval >= 0 else m1)
            k += 1
        eobrun -= 1
    br.pos = pos
    return eobrun


# -- progressive encoder -----------------------------------------------------
#
# Two-pass per scan (symbol-frequency count, then emit), because the Annex K
# example AC tables carry no EOBn symbols — progressive scans need custom
# Huffman tables, built by the T.81 Annex K.2 frequency-pairing procedure
# with the K.3 16-bit length limit.


def _huff_spec_from_freq(freq: dict[int, int]) -> tuple[list[int], list[int]]:
    """symbol→count → (BITS[16], HUFFVAL) per T.81 Annex K.2/K.3: pair the
    two least-frequent symbols repeatedly (ties broken toward the larger
    symbol value), limit code lengths to 16, reserve one code point so no
    code is all 1-bits."""
    f = [0] * 257
    for sym, c in freq.items():
        f[sym] = c
    f[256] = 1  # reserved symbol: guarantees no all-ones code
    codesize = [0] * 257
    others = [-1] * 257

    def least(exclude: int) -> int:
        best = -1
        for v in range(257):
            if v == exclude or f[v] == 0:
                continue
            if best == -1 or f[v] < f[best] or (f[v] == f[best] and v > best):
                best = v
        return best

    while True:
        v1 = least(-1)
        v2 = least(v1)
        if v2 == -1:
            break
        f[v1] += f[v2]
        f[v2] = 0
        codesize[v1] += 1
        while others[v1] != -1:
            v1 = others[v1]
            codesize[v1] += 1
        others[v1] = v2
        codesize[v2] += 1
        while others[v2] != -1:
            v2 = others[v2]
            codesize[v2] += 1
    bits = [0] * 33
    for v in range(257):
        if codesize[v]:
            bits[codesize[v]] += 1
    i = 32
    while i > 16:  # K.3: push over-long codes up the tree
        while bits[i] > 0:
            j = i - 2
            while bits[j] == 0:
                j -= 1
            bits[i] -= 2
            bits[i - 1] += 1
            bits[j + 1] += 2
            bits[j] -= 1
        i -= 1
    i = 16
    while i > 0 and bits[i] == 0:
        i -= 1
    if i > 0:
        bits[i] -= 1  # drop the reserved symbol's (longest) code point
    vals = [v for _, v in sorted((codesize[v], v) for v in range(256) if codesize[v])]
    return bits[1:17], vals


class _FreqSink:
    """Pass 1: count Huffman symbols per (class, table-id); ignore raw bits."""

    def __init__(self) -> None:
        self.freq: dict[tuple, dict[int, int]] = {}

    def symbol(self, tbl: tuple, sym: int) -> None:
        d = self.freq.setdefault(tbl, {})
        d[sym] = d.get(sym, 0) + 1

    def bits(self, val: int, n: int) -> None:
        pass


class _CodeWriter:
    """Pass 2: emit codes through a stuffing _BitWriter."""

    def __init__(self, codes: dict[tuple, dict[int, tuple[int, int]]]) -> None:
        self.codes = codes
        self.bw = _BitWriter()

    def symbol(self, tbl: tuple, sym: int) -> None:
        code, ln = self.codes[tbl][sym]
        self.bw.write(code, ln)

    def bits(self, val: int, n: int) -> None:
        if n:
            self.bw.write(val, n)


def _enc_noninterleaved(plan: dict, ci: int):
    """Encoder twin of _noninterleaved_blocks: the component's own block
    grid, row-major, indexed into the padded coefficient store."""
    sh, sv = plan["samp"][ci]
    cw = -(-plan["w"] * sh // plan["hmax"])
    ch = -(-plan["h"] * sv // plan["vmax"])
    wb, hb = -(-cw // 8), -(-ch // 8)
    bwdt = plan["mcus_x"] * sh
    arr = plan["coefs"][ci]
    for by in range(hb):
        for bx in range(wb):
            yield arr[by * bwdt + bx]


def _scan_dc(plan: dict, comp_idxs: list[int], ah: int, al: int, sink) -> None:
    pred = {ci: 0 for ci in comp_idxs}

    def emit(blk, ci: int) -> None:
        v = int(blk[0]) >> al  # DC point transform: arithmetic shift
        if ah == 0:
            diff = v - pred[ci]
            pred[ci] = v
            size, bits = _magnitude(diff)
            sink.symbol(("dc", 0 if ci == 0 else 1), size)
            sink.bits(bits, size)
        else:
            sink.bits(v & 1, 1)

    if len(comp_idxs) > 1:  # interleaved MCU order
        mcus_x, mcus_y = plan["mcus_x"], plan["mcus_y"]
        for my in range(mcus_y):
            for mx in range(mcus_x):
                for ci in comp_idxs:
                    sh, sv = plan["samp"][ci]
                    bwdt = mcus_x * sh
                    for by in range(sv):
                        for bx in range(sh):
                            emit(
                                plan["coefs"][ci][
                                    (my * sv + by) * bwdt + (mx * sh + bx)
                                ],
                                ci,
                            )
    else:
        for blk in _enc_noninterleaved(plan, comp_idxs[0]):
            emit(blk, comp_idxs[0])


def _scan_ac_first(plan: dict, ci: int, ss: int, se: int, al: int, sink) -> None:
    tbl = ("ac", 0 if ci == 0 else 1)
    eobrun = 0

    def flush_eob() -> None:
        nonlocal eobrun
        if eobrun:
            r = eobrun.bit_length() - 1
            sink.symbol(tbl, r << 4)
            sink.bits(eobrun - (1 << r), r)
            eobrun = 0

    for blk in _enc_noninterleaved(plan, ci):
        tv = []
        for k in range(ss, se + 1):
            v = int(blk[k])
            tv.append(-(-v >> al) if v < 0 else v >> al)  # |v|>>al, signed
        nz = [i for i, t in enumerate(tv) if t]
        if not nz:
            eobrun += 1
            if eobrun == 0x7FFF:
                flush_eob()
            continue
        flush_eob()
        run = 0
        for i in range(nz[-1] + 1):
            t = tv[i]
            if t == 0:
                run += 1
                continue
            while run > 15:
                sink.symbol(tbl, 0xF0)
                run -= 16
            size, bits = _magnitude(t)
            sink.symbol(tbl, (run << 4) | size)
            sink.bits(bits, size)
            run = 0
        if nz[-1] < se - ss:
            eobrun += 1
            if eobrun == 0x7FFF:
                flush_eob()
    flush_eob()


def _scan_ac_refine(plan: dict, ci: int, ss: int, se: int, al: int, sink) -> None:
    """Encoder twin of _ac_refine: runs count zero-history positions;
    correction bits for already-significant coefficients buffer until the
    next emitted symbol (or the EOB run that absorbs the block tail)."""
    tbl = ("ac", 0 if ci == 0 else 1)
    eobrun = 0
    # two correction-bit buffers, mirroring the decoder's read order: ``be``
    # holds bits from blocks already absorbed into the pending EOB run
    # (read by the decoder right after the EOBn symbol), ``br`` the current
    # block's bits (read after the next emitted symbol of THIS block)
    be: list[int] = []
    br: list[int] = []

    def emit_eobrun() -> None:
        nonlocal eobrun, be
        if eobrun:
            r = eobrun.bit_length() - 1
            sink.symbol(tbl, r << 4)
            sink.bits(eobrun - (1 << r), r)
            eobrun = 0
            for b in be:
                sink.bits(b, 1)
            be = []

    def flush_br() -> None:
        nonlocal br
        for b in br:
            sink.bits(b, 1)
        br = []

    for blk in _enc_noninterleaved(plan, ci):
        absv = [abs(int(blk[k])) >> al for k in range(ss, se + 1)]
        eobpos = -1
        for i, t in enumerate(absv):
            if t == 1:
                eobpos = i
        r = 0
        for i, t in enumerate(absv):
            if t == 0:
                r += 1
                continue
            while r > 15 and i <= eobpos:
                emit_eobrun()
                sink.symbol(tbl, 0xF0)
                r -= 16
                flush_br()
            if t > 1:  # history coefficient: LSB is its correction bit
                br.append(t & 1)
                continue
            emit_eobrun()
            sink.symbol(tbl, (r << 4) | 1)
            r = 0
            sink.bits(1 if int(blk[ss + i]) >= 0 else 0, 1)
            flush_br()
        if r > 0 or br:
            eobrun += 1
            be.extend(br)
            br = []
            if eobrun == 0x7FFF or len(be) > 900:
                emit_eobrun()
    emit_eobrun()


def _run_progressive_scan(plan: dict, scan: tuple, sink) -> None:
    if scan[0] == "dc":
        _, comps, _ss, _se, ah, al = scan
        _scan_dc(plan, comps, ah, al, sink)
    else:
        _, ci, ss, se, ah, al = scan
        if ah == 0:
            _scan_ac_first(plan, ci, ss, se, al, sink)
        else:
            _scan_ac_refine(plan, ci, ss, se, al, sink)


def _emit_progressive_scan(plan: dict, scan: tuple) -> bytes:
    sink = _FreqSink()
    _run_progressive_scan(plan, scan, sink)
    chunk = bytearray()
    codes: dict[tuple, dict[int, tuple[int, int]]] = {}
    for cls, tsel in sorted(sink.freq):
        bits, vals = _huff_spec_from_freq(sink.freq[(cls, tsel)])
        codes[(cls, tsel)] = _build_codes(bits, vals)
        tc = (0x00 if cls == "dc" else 0x10) | tsel
        body = bytes([tc]) + bytes(bits) + bytes(vals)
        chunk += b"\xff\xc4" + struct.pack(">H", len(body) + 2) + body
    writer = _CodeWriter(codes)
    _run_progressive_scan(plan, scan, writer)
    entropy = writer.bw.flush()
    kind, target = scan[0], scan[1]
    comps = target if kind == "dc" else [target]
    ss, se, ah, al = scan[2], scan[3], scan[4], scan[5]
    sos = struct.pack(">HB", 6 + 2 * len(comps), len(comps))
    for ci in comps:
        tsel = 0 if ci == 0 else 1
        td = tsel if (kind == "dc" and ah == 0) else 0
        ta = tsel if kind == "ac" else 0
        sos += bytes([ci + 1, (td << 4) | ta])
    sos += bytes([ss, se, (ah << 4) | al])
    chunk += b"\xff\xda" + sos + entropy
    return bytes(chunk)


def encode_jpeg_progressive(
    pixels: np.ndarray, quality: int = 100, subsample: bool = False
) -> bytes:
    """(H, W, 3) RGB or (H, W) grayscale uint8 → PROGRESSIVE (SOF2) JFIF
    bytes, using the cjpeg-shaped default scan script: approximated DC
    first, spectral AC bands per component, then successive-approximation
    refinement passes down to full precision.  The quantized coefficients
    are identical to :func:`encode_jpeg`'s (shared ``_plan_frame``), so
    decoding the progressive stream must reproduce the baseline stream's
    pixels bit-for-bit — the round-trip oracle the tests pin."""
    plan = _plan_frame(np.asarray(pixels), quality, subsample)
    gray, h, w = plan["gray"], plan["h"], plan["w"]
    ncomp = 1 if gray else 3
    if gray:
        script = [
            ("dc", [0], 0, 0, 0, 1),
            ("ac", 0, 1, 63, 0, 2),
            ("ac", 0, 1, 63, 2, 1),
            ("dc", [0], 0, 0, 1, 0),
            ("ac", 0, 1, 63, 1, 0),
        ]
    else:
        script = [
            ("dc", [0, 1, 2], 0, 0, 0, 1),
            ("ac", 0, 1, 5, 0, 2),
            ("ac", 2, 1, 63, 0, 1),
            ("ac", 1, 1, 63, 0, 1),
            ("ac", 0, 6, 63, 0, 2),
            ("ac", 0, 1, 63, 2, 1),
            ("dc", [0, 1, 2], 0, 0, 1, 0),
            ("ac", 2, 1, 63, 1, 0),
            ("ac", 1, 1, 63, 1, 0),
            ("ac", 0, 1, 63, 1, 0),
        ]
    out = bytearray(b"\xff\xd8")
    out += (
        b"\xff\xe0" + struct.pack(">H", 16)
        + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    )
    qts = ((0, plan["ql"]),) if gray else ((0, plan["ql"]), (1, plan["qc"]))
    for tid, q in qts:
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tid]) + bytes(
            int(x) for x in q
        )
    sof = struct.pack(">HBHHB", 8 + 3 * ncomp, 8, h, w, ncomp)
    for ci in range(ncomp):
        sh, sv = plan["samp"][ci]
        sof += bytes([ci + 1, (sh << 4) | sv, 0 if ci == 0 else 1])
    out += b"\xff\xc2" + sof
    for scan in script:
        out += _emit_progressive_scan(plan, scan)
    out += b"\xff\xd9"
    return bytes(out)
