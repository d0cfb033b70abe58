#!/usr/bin/env python3
"""Tile/dtype sweep for the ONE-PASS fused decode kernel (pallas_fsm8.
fused_pass_pallas8): marginal per-pass time via dependent chaining, every
config interleaved in ONE process (burst marginals drift ±2 ms across
processes — CLAUDE.md; never A/B-tune across separate runs).

Per config (K_TILE_FUSED, UNROLL_FUSED, table dtype, packed rows): chain N
dependent fused passes inside one jit (each pass's entry is the previous
pass's lane-0 exit, so nothing hoists), difference N vs 1, and sanity-check
the exits vector against the default config's. Run attended (fresh Mosaic
compiles can wedge the device — keep configs near known-compiling shapes):

    timeout 550 python -u benchmarks/tune_fused.py
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from functools import partial
from pathlib import Path

ROOT = Path(__file__).parent.parent
sys.path.insert(0, str(ROOT))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", str(ROOT / ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")

import numpy as np  # noqa: E402

# (K_TILE_FUSED, UNROLL_FUSED, int8 table, packed rows). Defaults first;
# keep shapes near the known-compiling region (kt % unroll == 0 required).
CONFIGS = [
    (64, 16, True, True),   # current default (r4 on-chip sweep winner)
    (64, 16, True, False),
    (64, 16, False, True),
    (128, 16, True, True),
    (32, 16, True, True),
    (64, 32, True, True),
    (64, 8, True, True),    # the r3 default, as the regression anchor
]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mb", type=float, default=5.2)
    ap.add_argument("--passes", type=int, default=21)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    if jax.default_backend() not in ("tpu", "axon"):
        print("needs TPU", file=sys.stderr)
        return 1

    from entreepy_tpu.format import compress_host, parse_header
    from entreepy_tpu.format.fsm8 import build_byte_fsm
    from entreepy_tpu.ops import decode8, pallas_fsm8
    from entreepy_tpu.ops.decode8 import _table_T_bf16, build_fused

    src = (ROOT / "tests/data/a_midsummer_nights_dream.txt").read_bytes()
    data = (src * (-(-int(args.mb * 1e6) // len(src))))[: int(args.mb * 1e6)]
    et = compress_host(data)
    hdr = parse_header(et)
    fsm = build_byte_fsm(hdr.table)
    buf = np.frombuffer(et, np.uint8)[hdr.body_start:]
    tbl = _table_T_bf16(fsm)
    t_fused, m, mt, s = build_fused(fsm)
    mb = len(data) / 1e6

    chunk = 512
    n_real = max(1, -(-buf.size // chunk))
    lanes = max(pallas_fsm8.LANE_TILE,
                -(-n_real // pallas_fsm8.LANE_TILE) * pallas_fsm8.LANE_TILE)
    padded = np.zeros(lanes * chunk, np.uint8)
    padded[: buf.size] = buf
    cols = decode8.bytes_to_cols(padded, lanes, chunk)
    xs = cols.T
    int(jnp.sum(cols))

    ref_exits = None
    for kt, unroll, i8, packed in CONFIGS:
        if kt % unroll:
            continue
        jax.clear_caches()
        pallas_fsm8.K_TILE_FUSED = kt
        pallas_fsm8.UNROLL_FUSED = unroll
        pallas_fsm8.TBL_INT8 = i8

        @partial(jax.jit, static_argnames=("n",))
        def fused_n(xs_, tf_, entries, n):
            # dependent chaining: each pass's entries are the previous
            # pass's shifted exits, so nothing hoists or CSEs away
            def body(_, e):
                # packed rows are masked in-kernel since r5: n_valid is
                # required (the real pipelines pass the body byte count)
                _v, exits = pallas_fsm8.fused_pass_pallas8(
                    xs_, tf_, e, m, mt, s, packed=packed,
                    n_valid=jnp.int32(buf.size) if packed else None,
                )
                return jnp.concatenate([jnp.zeros(1, jnp.int32), exits[:-1]])

            return jax.lax.fori_loop(0, n, body, entries)

        e0 = jnp.zeros(lanes, jnp.int32)
        try:
            def timed(n, iters=4):
                int(jnp.sum(fused_n(xs, t_fused, e0, n)))
                best = 1e9
                for _ in range(iters):
                    t0 = time.perf_counter()
                    int(jnp.sum(fused_n(xs, t_fused, e0, n)))
                    best = min(best, time.perf_counter() - t0)
                return best

            t1, tn = timed(1), timed(args.passes)
            pp = max((tn - t1) / (args.passes - 1), 1e-9)
            exits = np.asarray(fused_n(xs, t_fused, e0, 1))
            if ref_exits is None:
                ref_exits = exits
            # one [256, W] x onehot(byte) contraction per byte; W = the
            # fused table's actual width (2s + 9(mt+2))
            macs = buf.size * t_fused.shape[1] * 256
            peak = 197e12 if i8 else 98.5e12
            print(json.dumps({
                "kt": kt, "unroll": unroll, "dtype": "int8" if i8 else "bf16",
                "packed": packed,
                "pass_ms": round(pp * 1e3, 2),
                "MBps": round(mb / pp / 1e3 * 1e3, 0),
                "mfu_pct": round(macs / pp / peak * 100, 1),
                "exits_equal": bool(np.array_equal(exits, ref_exits)),
            }), flush=True)
        except Exception as e:
            print(json.dumps({"kt": kt, "unroll": unroll,
                              "dtype": "int8" if i8 else "bf16",
                              "packed": packed,
                              "error": repr(e)[:200]}), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
