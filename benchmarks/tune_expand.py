#!/usr/bin/env python3
"""Tile sweep for the fused Pallas expand kernel (ops/pallas_fsm8.py:183-253).

One config per invocation so a wedged Mosaic compile kills only this
process (CLAUDE.md: run new-kernel compiles in a subprocess with a
timeout):

    timeout 550 python -u benchmarks/tune_expand.py --kt 256 --unroll 4

Timing: burst-differenced marginal (N independent async launches synced by
one value-dependent readback) — the per-call tunnel overhead overlaps, so
the marginal is the chip number. Correctness: the summed output checksum
must equal the value printed by the default config (the default's
bit-exactness is separately pinned by tests + the live-TPU gate).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

ROOT = Path(__file__).parent.parent
sys.path.insert(0, str(ROOT))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", str(ROOT / ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")

import numpy as np  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--kt", type=int, default=128, help="K_TILE_EXP")
    ap.add_argument("--unroll", type=int, default=2, help="UNROLL_EXP")
    ap.add_argument("--mb", type=float, default=5.2)
    ap.add_argument("--split", action="store_true",
                    help="bench the split-table kernel (expand_pass_split_pallas8)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from entreepy_tpu.format import compress_host, parse_header
    from entreepy_tpu.format.fsm8 import build_byte_fsm, expand_tensors
    from entreepy_tpu.ops import decode8, pallas_fsm8
    from entreepy_tpu.ops.decode8 import _table_T_bf16

    if jax.default_backend() not in ("tpu", "axon"):
        print("needs TPU", file=sys.stderr)
        return 1

    if args.split:
        pallas_fsm8.K_TILE_EXPS = args.kt
        pallas_fsm8.UNROLL_EXPS = args.unroll
    else:
        pallas_fsm8.K_TILE_EXP = args.kt
        pallas_fsm8.UNROLL_EXP = args.unroll

    src = (ROOT / "tests/data/a_midsummer_nights_dream.txt").read_bytes()
    data = (src * 47)[: int(args.mb * 1e6)]
    et = compress_host(data)
    hdr = parse_header(et)
    fsm = build_byte_fsm(hdr.table)
    buf = np.frombuffer(et, np.uint8)[hdr.body_start :]
    tbl = _table_T_bf16(fsm)
    t_np, m = expand_tensors(fsm)
    texp = jnp.asarray(t_np, jnp.bfloat16)
    mb = len(data) / 1e6

    chunk = 512
    n_real = max(1, -(-buf.size // chunk))
    lanes = max(1024, -(-n_real // 1024) * 1024)
    padded = np.zeros(lanes * chunk, np.uint8)
    padded[: buf.size] = buf
    cols = decode8.bytes_to_cols(padded, lanes, chunk)
    states, unsynced = pallas_fsm8.fsm8_decode_pallas(cols, tbl, jnp.int32(n_real))
    assert not bool(unsynced)
    xs = cols.T
    st = jnp.asarray(states).T.astype(jnp.int32)

    if args.split:
        from entreepy_tpu.format.fsm8 import split_expand_tensors

        ts_np, m_s, mt = split_expand_tensors(fsm)
        assert m_s == m
        texp = jnp.asarray(ts_np, jnp.bfloat16)

        @jax.jit
        def expand_sum(xs_, st_, texp_):
            vals = pallas_fsm8.expand_pass_split_pallas8(xs_, st_, texp_, m, mt)
            return jnp.sum(vals.astype(jnp.int64))

    else:

        @jax.jit
        def expand_sum(xs_, st_, texp_):
            vals = pallas_fsm8.expand_pass_pallas8(xs_, st_, texp_, m)
            return jnp.sum(vals.astype(jnp.int64))

    def burst(n):
        outs = [expand_sum(xs, st, texp) for _ in range(n)]
        return int(outs[-1])

    try:
        chk = burst(1)  # compile + warm

        def timed(n, iters=4):
            best = 1e9
            for _ in range(iters):
                t0 = time.perf_counter()
                burst(n)
                best = min(best, time.perf_counter() - t0)
            return best

        t1, t5 = timed(1), timed(5)
        pp = max((t5 - t1) / 4, 1e-9)
        print(
            json.dumps(
                {
                    "kt_exp": args.kt,
                    "unroll_exp": args.unroll,
                    "split": args.split,
                    "m": m,
                    "S": fsm.width,
                    "pass_ms": round(pp * 1e3, 2),
                    "MBps": round(mb / pp, 1),
                    "checksum": chk,
                }
            ),
            flush=True,
        )
    except Exception as e:  # compile/VMEM failures are data, not crashes
        print(
            json.dumps(
                {"kt_exp": args.kt, "unroll_exp": args.unroll, "error": repr(e)[:300]}
            ),
            flush=True,
        )
        return 0
    return 0


if __name__ == "__main__":
    sys.exit(main())
