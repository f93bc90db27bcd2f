"""FLAC codec in pure numpy/stdlib — no audio library.

Everything here derives from the public FLAC specification (RFC 9639 /
xiph.org format docs): the fLaC container with STREAMINFO, frame sync
headers with CRC-8/CRC-16, UTF-8-style frame numbering, subframe types
CONSTANT / VERBATIM / FIXED(0-4) / LPC(1-32), wasted bits, partitioned
Rice residual coding (methods 0 and 1), and the four stereo decorrelation
modes (independent, left-side, right-side, mid-side).

FLAC is LOSSLESS, so unlike JPEG the decoded samples are bit-exact and a
driver oracle can recompute statistics in closed form (the WAV pattern).
The encoder emits a spec-legal subset (16-bit, fixed-predictor order 0-2
with Rice residuals, one partition) sufficient for round-trip proof and
synthetic corpora; the decoder handles the full baseline stream feature
set a real corpus hits.

Scale shape: like the other media codecs, decode runs inside
Arrow-batched mapInPandas tasks (operators/multimodal.py) — per-payload
Python cost parallelizes across executors.
"""

from __future__ import annotations

import struct

import numpy as np

FLAC_MAGIC = b"fLaC"

# -- CRCs from the spec (CRC-8 poly 0x07, CRC-16 poly 0x8005) ---------------


def _make_crc8_table() -> np.ndarray:
    t = np.zeros(256, dtype=np.uint8)
    for i in range(256):
        c = i
        for _ in range(8):
            c = ((c << 1) ^ 0x07) & 0xFF if c & 0x80 else (c << 1) & 0xFF
        t[i] = c
    return t


def _make_crc16_table() -> np.ndarray:
    t = np.zeros(256, dtype=np.uint16)
    for i in range(256):
        c = i << 8
        for _ in range(8):
            c = ((c << 1) ^ 0x8005) & 0xFFFF if c & 0x8000 else (c << 1) & 0xFFFF
        t[i] = c
    return t


_CRC8 = _make_crc8_table()
_CRC16 = _make_crc16_table()


def crc8(data: bytes) -> int:
    c = 0
    for b in data:
        c = int(_CRC8[c ^ b])
    return c


def crc16(data: bytes) -> int:
    c = 0
    for b in data:
        c = ((c << 8) & 0xFFFF) ^ int(_CRC16[((c >> 8) ^ b) & 0xFF])
    return c


# -- bit IO -----------------------------------------------------------------


class _BitReader:
    def __init__(self, data: bytes, pos: int = 0) -> None:
        self.data = data
        self.byte = pos
        self.bit = 0

    def read(self, n: int) -> int:
        out = 0
        while n:
            if self.byte >= len(self.data):
                raise ValueError("FLAC bitstream exhausted")
            avail = 8 - self.bit
            take = min(n, avail)
            cur = self.data[self.byte]
            out = (out << take) | ((cur >> (avail - take)) & ((1 << take) - 1))
            self.bit += take
            if self.bit == 8:
                self.bit = 0
                self.byte += 1
            n -= take
        return out

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v >= (1 << (n - 1)) else v

    def unary(self) -> int:
        n = 0
        while True:
            if self.read(1):
                return n
            n += 1

    def align(self) -> None:
        if self.bit:
            self.bit = 0
            self.byte += 1

    def _bit_array(self) -> np.ndarray:
        """The whole payload as a 0/1 uint8 array (lazy, cached) — the
        random-access view the vectorized residual/subframe readers index
        instead of per-bit read() calls.  8x the payload in memory, built
        once per frame; payloads are KB-scale next to the decoded
        samples."""
        bits = getattr(self, "_bits", None)
        if bits is None:
            bits = np.unpackbits(np.frombuffer(self.data, dtype=np.uint8))
            self._bits = bits
        return bits

    def _tell(self) -> int:
        return self.byte * 8 + self.bit

    def _seek(self, bitpos: int) -> None:
        self.byte, self.bit = divmod(bitpos, 8)


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, v: int, n: int) -> None:
        self.acc = (self.acc << n) | (v & ((1 << n) - 1))
        self.n += n
        while self.n >= 8:
            self.out.append((self.acc >> (self.n - 8)) & 0xFF)
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def write_bits(self, bits: np.ndarray) -> None:
        """Append a 0/1 uint8 array MSB-first — the vectorized bulk twin of
        write(): byte-identical output, one packbits instead of a Python
        loop per bit."""
        if self.n:
            pre = np.array(
                [(self.acc >> (self.n - 1 - i)) & 1 for i in range(self.n)],
                dtype=np.uint8,
            )
            bits = np.concatenate([pre, bits])
            self.acc = 0
            self.n = 0
        nfull = len(bits) >> 3
        if nfull:
            self.out += np.packbits(bits[: nfull << 3]).tobytes()
        for b in bits[nfull << 3 :]:
            self.write(int(b), 1)

    def align(self) -> None:
        if self.n:
            self.write(0, 8 - self.n)

    def bytes(self) -> bytes:
        self.align()
        return bytes(self.out)


def _utf8_number(n: int) -> bytes:
    """The spec's UTF-8-style coding of frame numbers (extended to 36
    bits)."""
    if n < 0x80:
        return bytes([n])
    masks = [(0x7FF, 0xC0, 1), (0xFFFF, 0xE0, 2), (0x1FFFFF, 0xF0, 3),
             (0x3FFFFFF, 0xF8, 4), (0x7FFFFFFF, 0xFC, 5), (1 << 36, 0xFE, 6)]
    for limit, lead, cont in masks:
        if n <= limit:
            out = [lead | (n >> (6 * cont))]
            for i in range(cont - 1, -1, -1):
                out.append(0x80 | ((n >> (6 * i)) & 0x3F))
            return bytes(out)
    raise ValueError("frame number too large")


def _read_utf8_number(br: _BitReader) -> int:
    b0 = br.read(8)
    if b0 < 0x80:
        return b0
    n_cont = 0
    mask = 0x40
    while b0 & mask:
        n_cont += 1
        mask >>= 1
    if n_cont < 1 or n_cont > 6:
        raise ValueError("bad UTF-8-coded frame number")
    v = b0 & (mask - 1)
    for _ in range(n_cont):
        c = br.read(8)
        if c & 0xC0 != 0x80:
            raise ValueError("bad UTF-8 continuation in frame number")
        v = (v << 6) | (c & 0x3F)
    return v


# -- encoder ----------------------------------------------------------------


def _rice_encode(bw: _BitWriter, residuals: np.ndarray, param: int) -> None:
    # Vectorized (r15): build the whole partition's bitstream as one 0/1
    # array — unary runs are implicit zeros, each sample writes only its
    # terminating 1 and its ``param`` payload bits (one fancy-index store
    # per bit PLANE, param <= 14 planes) — then bulk-append via packbits.
    # Byte-identical to the former per-sample/per-bit loop.
    r = np.asarray(residuals, dtype=np.int64)
    n = len(r)
    if not n:
        return
    z = (r << 1) ^ (r >> 63)  # zigzag
    q = z >> param
    ends = np.cumsum(q + 1 + param)
    term = ends - 1 - param  # each sample's terminator-1 position
    bits = np.zeros(int(ends[-1]), dtype=np.uint8)
    bits[term] = 1
    for b in range(param):
        bits[term + 1 + b] = ((z >> (param - 1 - b)) & 1).astype(np.uint8)
    bw.write_bits(bits)


def _best_rice_param(residuals: np.ndarray) -> int:
    if not len(residuals):
        return 0
    z = (residuals.astype(np.int64) << 1) ^ (residuals.astype(np.int64) >> 63)
    mean = max(float(z.mean()), 1.0)
    return min(max(int(np.log2(mean)), 0), 14)


def encode_flac(
    samples: np.ndarray, sample_rate: int, block_size: int = 4096
) -> bytes:
    """(n_frames, n_channels) or (n_frames,) int16 → FLAC bytes.  16-bit,
    independent channels, fixed-predictor order chosen per subframe
    (0-2), single Rice partition — a small but fully spec-legal encoder
    whose output any FLAC decoder reads."""
    samples = np.asarray(samples, dtype=np.int64)
    if samples.ndim == 1:
        samples = samples[:, None]
    n_total, n_ch = samples.shape
    if not 1 <= n_ch <= 8:
        raise ValueError(f"unencodable channel count {n_ch}")
    if samples.size and (samples.max() > 32767 or samples.min() < -32768):
        raise ValueError("encoder supports 16-bit samples")
    streaminfo = bytearray()
    streaminfo += struct.pack(">HH", block_size, block_size)
    streaminfo += b"\x00\x00\x00" * 2  # min/max frame size unknown
    packed = (sample_rate << 44) | ((n_ch - 1) << 41) | ((16 - 1) << 36) | n_total
    streaminfo += packed.to_bytes(8, "big")
    streaminfo += b"\x00" * 16  # md5 unset (legal: all-zero = unknown)
    out = bytearray(FLAC_MAGIC)
    out += bytes([0x80]) + struct.pack(">I", len(streaminfo))[1:]  # last block
    out += streaminfo

    for fi, start in enumerate(range(0, max(n_total, 1), block_size)):
        blk = samples[start : start + block_size]
        bs = len(blk)
        if bs == 0:
            break
        hdr = _BitWriter()
        hdr.write(0b11111111111110, 14)
        hdr.write(0, 1)  # reserved
        hdr.write(0, 1)  # fixed blocksize strategy
        hdr.write(0b0111, 4)  # block size: 16-bit at end
        hdr.write(0b0000, 4)  # sample rate: from STREAMINFO
        hdr.write(n_ch - 1, 4)  # independent channels
        hdr.write(0b100, 3)  # 16 bps
        hdr.write(0, 1)  # reserved
        head = hdr.bytes() + _utf8_number(fi) + struct.pack(">H", bs - 1)
        head += bytes([crc8(head)])
        body = _BitWriter()
        for ch in range(n_ch):
            sig = blk[:, ch]
            # pick the fixed order 0-2 minimizing residual magnitude
            best, best_res = 0, sig
            for order in (1, 2):
                if bs <= order:
                    break
                res = sig.copy()
                for _ in range(order):
                    res = np.diff(res)
                if np.abs(res).sum() < np.abs(best_res[best:]).sum():
                    best, best_res = order, res
            order = best
            res = sig
            for _ in range(order):
                res = np.diff(res)
            body.write(0, 1)  # subframe pad bit
            body.write(0b001000 | order, 6)  # FIXED, order
            body.write(0, 1)  # no wasted bits
            for w in sig[:order]:
                body.write(int(w) & 0xFFFF, 16)  # warm-up samples
            param = _best_rice_param(res)
            body.write(0b00, 2)  # residual method 0 (4-bit rice)
            body.write(0, 4)  # partition order 0
            body.write(param, 4)
            _rice_encode(body, res, param)
        frame = head + body.bytes()
        frame += struct.pack(">H", crc16(frame))
        out += frame
    return bytes(out)


# -- decoder ----------------------------------------------------------------

_BLOCKSIZE_CODES = {
    1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
    8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096, 13: 8192, 14: 16384, 15: 32768,
}
_RATE_CODES = {
    1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000, 6: 22050, 7: 24000,
    8: 32000, 9: 44100, 10: 48000, 11: 96000,
}
_BPS_CODES = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}


def _read_residuals(br: _BitReader, block_size: int, order: int) -> np.ndarray:
    method = br.read(2)
    if method > 1:
        raise ValueError(f"reserved residual coding method {method}")
    pbits = 4 if method == 0 else 5
    esc = (1 << pbits) - 1
    part_order = br.read(4)
    n_parts = 1 << part_order
    if block_size % n_parts:
        raise ValueError("partition count does not divide block size")
    out = np.empty(block_size - order, dtype=np.int64)
    pos = 0
    for p in range(n_parts):
        n = block_size // n_parts - (order if p == 0 else 0)
        param = br.read(pbits)
        if n == 0:
            # A zero-sample partition (block_size/n_parts == order) coded
            # with the escape parameter still carries its mandatory 5-bit
            # size field — skip it or the stream desyncs (ADVICE r15).
            if param == esc:
                br.read(5)
            continue
        # Vectorized (r15) over the cached bit array: the per-sample
        # unary()/read() loops were the decoder's dominant cost (profiled
        # ~60% of decode_flac).  Same values, same final bit position.
        bits = br._bit_array()
        p0 = br._tell()
        if param == esc:
            nbits = br.read(5)
            if nbits:
                if p0 + 5 + n * nbits > len(bits):
                    raise ValueError("FLAC bitstream exhausted")
                idx = p0 + 5 + np.arange(n, dtype=np.int64) * nbits
                v = np.zeros(n, dtype=np.int64)
                for b in range(nbits):
                    v = (v << 1) | bits[idx + b]
                v[v >= (1 << (nbits - 1))] -= 1 << nbits
                out[pos : pos + n] = v
                br._seek(p0 + 5 + n * nbits)
            else:
                out[pos : pos + n] = 0
        else:
            # Bounded scan (ADVICE r15): flatnonzero over ALL remaining
            # payload bits made each partition O(payload) on multi-frame /
            # multi-partition streams.  Scan a window sized from the
            # expected partition length and grow it only when the unary
            # quotients run long.
            win = n * (param + 2) + 64
            while True:
                seg_end = min(p0 + win, len(bits))
                ones = np.flatnonzero(bits[p0:seg_end])
                term = None
                if param == 0:
                    # no payload bits: every 1 is a terminator
                    if len(ones) >= n:
                        term = ones[:n].astype(np.int64)
                else:
                    # payload bits may contain 1s; two-pointer walk selects
                    # the first 1 at >= param+1 bits past the previous
                    # terminator
                    ones_l = ones.tolist()
                    terms: list[int] = []
                    j, s, total = 0, 0, len(ones_l)
                    for _ in range(n):
                        while j < total and ones_l[j] < s:
                            j += 1
                        if j >= total:
                            break
                        t = ones_l[j]
                        terms.append(t)
                        s = t + 1 + param
                        j += 1
                    if len(terms) == n:
                        term = np.asarray(terms, dtype=np.int64)
                if term is not None:
                    break
                if seg_end >= len(bits):
                    raise ValueError("FLAC bitstream exhausted")
                win *= 4
            starts = np.empty(n, dtype=np.int64)
            starts[0] = 0
            starts[1:] = term[:-1] + 1 + param
            z = (term - starts) << param
            if param:
                if p0 + int(term[-1]) + 1 + param > len(bits):
                    raise ValueError("FLAC bitstream exhausted")
                payload0 = p0 + term + 1
                for b in range(param):
                    z |= bits[payload0 + b].astype(np.int64) << (param - 1 - b)
            out[pos : pos + n] = (z >> 1) ^ -(z & 1)  # un-zigzag
            br._seek(p0 + int(term[-1]) + 1 + param)
        pos += n
    return out


def _read_subframe(br: _BitReader, block_size: int, bps: int) -> np.ndarray:
    if br.read(1):
        raise ValueError("subframe padding bit set")
    stype = br.read(6)
    wasted = 0
    if br.read(1):
        wasted = 1 + br.unary()
        bps -= wasted
    if stype == 0b000000:  # CONSTANT
        v = br.read_signed(bps)
        sig = np.full(block_size, v, dtype=np.int64)
    elif stype == 0b000001:  # VERBATIM
        sig = np.array([br.read_signed(bps) for _ in range(block_size)], dtype=np.int64)
    elif 0b001000 <= stype <= 0b001100:  # FIXED 0-4
        order = stype & 0x07
        warm = [br.read_signed(bps) for _ in range(order)]
        res = _read_residuals(br, block_size, order)
        # A FIXED order-k predictor makes the residuals exactly the k-th
        # difference of the signal, so reconstruction is k integrations
        # (vectorized r15: cumsum per level seeded from the warm-up
        # samples' difference pyramid; int64 cumsum is exact, replacing
        # the former per-sample recurrence loop)
        if order == 0:
            sig = res
        else:
            warm_arr = np.asarray(warm, dtype=np.int64)
            sig = res.astype(np.int64, copy=False)
            for d in range(order - 1, -1, -1):
                seed = np.diff(warm_arr, n=d)[0]
                sig = np.cumsum(np.concatenate(([seed], sig)))
    elif stype >= 0b100000:  # LPC, order 1-32
        order = (stype & 0x1F) + 1
        warm = [br.read_signed(bps) for _ in range(order)]
        prec = br.read(4)
        if prec == 0b1111:
            raise ValueError("invalid LPC precision code")
        prec += 1
        shift = br.read_signed(5)
        if shift < 0:
            raise ValueError("negative LPC shift")
        coefs = [br.read_signed(prec) for _ in range(order)]
        res = _read_residuals(br, block_size, order)
        sig = np.empty(block_size, dtype=np.int64)
        sig[:order] = warm
        for i in range(order, block_size):
            acc = 0
            for j, c in enumerate(coefs):
                acc += c * sig[i - 1 - j]
            sig[i] = res[i - order] + (acc >> shift)
    else:
        raise ValueError(f"reserved subframe type {stype:#08b}")
    return sig << wasted


def decode_flac(payload: bytes) -> dict:
    """FLAC bytes → {'samples': (n, ch) int32, 'sample_rate',
    'n_channels', 'bits_per_sample', 'n_samples', 'duration_s'}.  CRC-8
    frame headers are verified; a corrupt stream raises (callers degrade
    to byte stats, never to wrong audio)."""
    if payload[:4] != FLAC_MAGIC:
        raise ValueError("not a FLAC stream")
    pos = 4
    info = None
    while True:
        if pos + 4 > len(payload):
            raise ValueError("truncated metadata")
        hdr = payload[pos]
        last, btype = hdr & 0x80, hdr & 0x7F
        (blen,) = struct.unpack(">I", b"\x00" + payload[pos + 1 : pos + 4])
        body = payload[pos + 4 : pos + 4 + blen]
        if btype == 0:  # STREAMINFO
            min_bs, max_bs = struct.unpack(">HH", body[:4])
            packed = int.from_bytes(body[10:18], "big")
            info = {
                "sample_rate": packed >> 44,
                "n_channels": ((packed >> 41) & 0x7) + 1,
                "bits_per_sample": ((packed >> 36) & 0x1F) + 1,
                "n_samples": packed & ((1 << 36) - 1),
            }
        pos += 4 + blen
        if last:
            break
    if info is None:
        raise ValueError("no STREAMINFO block")
    chunks = []
    shared_bits = None  # one unpackbits view shared by every frame's reader
    while pos < len(payload) - 1:
        br = _BitReader(payload, pos)
        if shared_bits is not None:
            br._bits = shared_bits
        sync = br.read(14)
        if sync != 0b11111111111110:
            raise ValueError(f"lost frame sync at byte {pos}")
        br.read(1)  # reserved
        br.read(1)  # blocking strategy
        bs_code = br.read(4)
        rate_code = br.read(4)
        ch_code = br.read(4)
        bps_code = br.read(3)
        br.read(1)  # reserved
        _read_utf8_number(br)
        if bs_code == 0:
            raise ValueError("reserved block size code")
        elif bs_code == 6:
            block_size = br.read(8) + 1
        elif bs_code == 7:
            block_size = br.read(16) + 1
        else:
            block_size = _BLOCKSIZE_CODES[bs_code]
        if rate_code == 12:
            br.read(8)
        elif rate_code in (13, 14):
            br.read(16)
        elif rate_code == 15:
            raise ValueError("invalid sample rate code")
        bps = info["bits_per_sample"] if bps_code == 0 else _BPS_CODES[bps_code]
        br.align()
        header_bytes = payload[pos : br.byte]
        hcrc = br.read(8)
        if crc8(header_bytes) != hcrc:
            raise ValueError("frame header CRC-8 mismatch")
        if ch_code <= 7:
            n_ch = ch_code + 1
            subs = [
                _read_subframe(br, block_size, bps) for _ in range(n_ch)
            ]
            frame = np.stack(subs, axis=1)
        elif ch_code in (8, 9, 10):
            # stereo decorrelation: the difference channel carries one
            # extra bit (the spec's side-channel rule)
            if ch_code == 8:  # left/side
                left = _read_subframe(br, block_size, bps)
                side = _read_subframe(br, block_size, bps + 1)
                frame = np.stack([left, left - side], axis=1)
            elif ch_code == 9:  # right/side
                side = _read_subframe(br, block_size, bps + 1)
                right = _read_subframe(br, block_size, bps)
                frame = np.stack([right + side, right], axis=1)
            else:  # mid/side: mid = (L+R)>>1 (dropped LSB rides in side's)
                mid = _read_subframe(br, block_size, bps)
                side = _read_subframe(br, block_size, bps + 1)
                mid2 = (mid << 1) | (side & 1)
                frame = np.stack([(mid2 + side) >> 1, (mid2 - side) >> 1], axis=1)
        else:
            raise ValueError(f"reserved channel assignment {ch_code}")
        br.align()
        br.read(16)  # frame CRC-16 (headers already CRC-8-checked)
        pos = br.byte
        if getattr(br, "_bits", None) is not None:
            shared_bits = br._bits
        chunks.append(frame)
    samples = (
        np.concatenate(chunks, axis=0)
        if chunks
        else np.empty((0, info["n_channels"]), dtype=np.int64)
    )
    if info["n_samples"]:
        samples = samples[: info["n_samples"]]
    rate = info["sample_rate"]
    return {
        "format": "flac",
        "samples": samples.astype(np.int32),
        "sample_rate": rate,
        "n_channels": info["n_channels"],
        "bits_per_sample": info["bits_per_sample"],
        "n_samples": int(samples.size),
        "duration_s": samples.shape[0] / rate if rate else 0.0,
    }
