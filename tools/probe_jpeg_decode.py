"""Profile decode_jpeg over the bench's synthesized payload population
(VERDICT r15 item 3 groundwork): where does the per-image time go —
Huffman table build, bit-reader loops, marker parse, IDCT?

Run: python tools/probe_jpeg_decode.py [n_images]
"""

from __future__ import annotations

import cProfile
import pstats
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

from lakehouse_loader_spark.operators.jpeg import (
    decode_jpeg,
    encode_jpeg,
    encode_jpeg_progressive,
)


def synth(doc_id: int, quality: int = 100) -> bytes:
    w, h = 8 + doc_id % 9, 6 + doc_id % 5
    x = np.arange(w)[None, :, None]
    y = np.arange(h)[:, None, None]
    c = np.arange(3)[None, None, :]
    px = ((x * 7 + y * 11 + c * 5 + doc_id * 3) % 251).astype(np.uint8)
    enc = encode_jpeg_progressive if doc_id % 3 == 0 else encode_jpeg
    return enc(px, quality=quality)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
    payloads = [synth(i) for i in range(n)]
    sizes = [len(p) for p in payloads]
    print(f"{n} payloads, bytes min/med/max = {min(sizes)}/{sorted(sizes)[n//2]}/{max(sizes)}")

    # steady-state timing
    for p in payloads[:50]:
        decode_jpeg(p)
    t0 = time.perf_counter()
    for p in payloads:
        decode_jpeg(p)
    dt = time.perf_counter() - t0
    print(f"decode: {dt:.3f}s total, {dt / n * 1e3:.3f} ms/image")

    pr = cProfile.Profile()
    pr.enable()
    for p in payloads:
        decode_jpeg(p)
    pr.disable()
    stats = pstats.Stats(pr)
    stats.sort_stats("cumulative").print_stats(25)


if __name__ == "__main__":
    main()
