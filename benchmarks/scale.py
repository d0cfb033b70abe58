#!/usr/bin/env python3
"""Scaling sweep (BASELINE.md measured configs).

Host-backend throughput at corpus sizes from the reference's headline 5.2 MB
up to enwik8 scale (100 MB; no network egress, so corpora are tiled from the
checked-in Shakespeare fixture — same alphabet statistics), plus the device
FSM kernel at 5.2 MB when a TPU is attached.

Run:  python benchmarks/scale.py [--sizes 5,20,100]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

ROOT = Path(__file__).parent.parent
sys.path.insert(0, str(ROOT))


def corpus(n_bytes: int) -> bytes:
    src = (ROOT / "tests/data/a_midsummer_nights_dream.txt").read_bytes()
    return (src * (-(-n_bytes // len(src))))[:n_bytes]


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
    args = ap.parse_args()

    from entreepy_tpu import compress, decompress

    rows = []
    for mb in (float(s) for s in args.sizes.split(",")):
        data = corpus(int(mb * 1e6))
        et, t_enc = best_of(lambda: compress(data))
        out, t_dec = best_of(lambda: decompress(et))
        assert out == data, f"round-trip failed at {mb} MB"
        rows.append({
            "corpus_MB": mb,
            "ratio": round(len(data) / len(et), 3),
            "encode_MBps": round(mb / t_enc, 1),
            "decode_MBps": round(mb / t_dec, 1),
        })
        print(json.dumps(rows[-1]), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
