#!/usr/bin/env python3
"""Scaling sweep (BASELINE.md measured configs), multi-corpus.

Host-backend throughput at corpus sizes from the reference's headline 5.2 MB
up to enwik8 scale (100 MB). No network egress, so enwik itself is
unavailable; instead of only the friendly tiled-Shakespeare corpus this
sweeps four corpus families that bound the code statistics from both sides
(VERDICT r1: "de-tilt the scale benchmarks"):

* text     — tiled Shakespeare fixture (periodic, ~1.7:1)
* random   — uniform bytes (incompressible, 256-symbol alphabet, 8-bit codes)
* skewed   — Zipf-ish byte distribution (deep tree, long+short code mix)
* runheavy — long single-symbol runs with random interludes (worst case for
             chunk scratch sizing and self-sync)

Run:  python benchmarks/scale.py [--sizes 5,20,100] [--corpora text,random]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

ROOT = Path(__file__).parent.parent
sys.path.insert(0, str(ROOT))


def make_corpus(kind: str, n_bytes: int) -> bytes:
    rng = np.random.default_rng(1234)
    if kind == "text":
        src = (ROOT / "tests/data/a_midsummer_nights_dream.txt").read_bytes()
        return (src * (-(-n_bytes // len(src))))[:n_bytes]
    if kind == "random":
        return rng.integers(0, 256, n_bytes, dtype=np.uint8).tobytes()
    if kind == "skewed":
        # Zipf over the byte alphabet: a few very frequent symbols -> short
        # codes next to 15+ bit rarities
        p = 1.0 / np.arange(1, 257) ** 1.3
        p /= p.sum()
        return rng.choice(256, size=n_bytes, p=p).astype(np.uint8).tobytes()
    if kind == "runheavy":
        unit = b"a" * 4096 + rng.integers(0, 256, 256, dtype=np.uint8).tobytes()
        return (unit * (-(-n_bytes // len(unit))))[:n_bytes]
    raise ValueError(f"unknown corpus kind {kind!r}")


def best_of(fn, iters=3):
    out, best = None, float("inf")
    for _ in range(iters + 1):  # +1 warmup
        t0 = time.perf_counter()
        out = fn()
        best = min(best, time.perf_counter() - t0)
    return out, best


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="5,20,100", help="corpus sizes in MB")
    ap.add_argument("--corpora", default="text,random,skewed,runheavy")
    args = ap.parse_args()

    from entreepy_tpu import compress, decompress

    rows = []
    for mb in (float(s) for s in args.sizes.split(",")):
        for kind in args.corpora.split(","):
            data = make_corpus(kind, int(mb * 1e6))
            et, t_enc = best_of(lambda: compress(data))
            out, t_dec = best_of(lambda: decompress(et))
            assert out == data, f"round-trip failed: {kind} at {mb} MB"
            rows.append({
                "corpus": kind,
                "corpus_MB": mb,
                "ratio": round(len(data) / len(et), 3),
                "encode_MBps": round(mb / t_enc, 1),
                "decode_MBps": round(mb / t_dec, 1),
            })
            print(json.dumps(rows[-1]), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
