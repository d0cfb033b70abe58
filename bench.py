#!/usr/bin/env python3
"""Headline benchmark: decode throughput on a ~5.2 MB Shakespeare corpus.

The reference's published headline number (README.md:53, reproduced in
BASELINE.md) is decompression of the ~5.2 MB Complete Works of Shakespeare in
11.8 s (~0.44 MB/s) on an M2 MacBook Air. This environment has no network
egress, so the corpus is synthesized at the same scale and symbol statistics
by tiling the ~112 KB `a_midsummer_nights_dream.txt` fixture to ~5.3 MB.

Prints ONE JSON line:
  {"metric": "decode_throughput_5MB", "value": <MB/s>, "unit": "MB/s",
   "vs_baseline": <value / 0.44>}

plus (stderr) secondary numbers: compress throughput, ratio, round-trip check.
"""

import json
import sys
import time
from pathlib import Path

import numpy as np

BASELINE_DECODE_MBPS = 0.44  # README.md:53: 5.2 MB in 11.8 s
TARGET_BYTES = 5_200_000


def build_corpus() -> bytes:
    src = (Path(__file__).parent / "tests/data/a_midsummer_nights_dream.txt").read_bytes()
    reps = -(-TARGET_BYTES // len(src))
    return (src * reps)[:TARGET_BYTES]


def best_of(fn, warmup: int = 2, iters: int = 5):
    for _ in range(warmup):
        out = fn()
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn()
        times.append(time.perf_counter() - t0)
    return out, min(times)


def main() -> int:
    data = build_corpus()
    mb = len(data) / 1e6

    from entreepy_tpu import compress, decompress

    et, t_enc = best_of(lambda: compress(data, backend="device"))
    out, t_dec = best_of(lambda: decompress(et, backend="device"))
    ok = out == data

    enc_mbps = mb / t_enc
    dec_mbps = mb / t_dec
    print(
        f"corpus={len(data)}B compressed={len(et)}B ratio={len(data)/len(et):.2f} "
        f"encode={t_enc*1e3:.1f}ms ({enc_mbps:.1f} MB/s) "
        f"decode={t_dec*1e3:.1f}ms ({dec_mbps:.1f} MB/s) roundtrip={'OK' if ok else 'FAIL'}",
        file=sys.stderr,
    )
    if not ok:
        print(json.dumps({"metric": "decode_throughput_5MB", "value": 0.0,
                          "unit": "MB/s", "vs_baseline": 0.0}))
        return 1
    print(json.dumps({
        "metric": "decode_throughput_5MB",
        "value": round(dec_mbps, 2),
        "unit": "MB/s",
        "vs_baseline": round(dec_mbps / BASELINE_DECODE_MBPS, 1),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
