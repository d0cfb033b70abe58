#!/usr/bin/env python3
"""Real-TPU probe for the byte-FSM decode kernel (gen 2).

Compiles + times the Pallas byte-FSM kernel on the live chip and checks
bit-equality against the host decode. Run attended / under `timeout` (fresh
Mosaic compiles can wedge the device — CLAUDE.md):

    timeout 550 python -u benchmarks/probe_fsm8.py --mb 0.5
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
    ap.add_argument("--mb", type=float, default=0.5)
    ap.add_argument("--scan", action="store_true", help="also time the XLA scan form")
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from entreepy_tpu.format import compress_host, parse_header
    from entreepy_tpu.format.fsm8 import build_byte_fsm
    from entreepy_tpu.ops.decode8 import (
        _pad_lanes,
        _table_T_bf16,
        bytes_to_cols,
        expand_states,
        fsm8_decode,
    )
    from entreepy_tpu.ops.pallas_fsm8 import fsm8_decode_pallas

    if jax.default_backend() not in ("tpu", "axon"):
        print(f"error: needs a TPU backend, have {jax.default_backend()}", file=sys.stderr)
        return 1

    src = (ROOT / "tests/data/a_midsummer_nights_dream.txt").read_bytes()
    data = (src * (-(-int(args.mb * 1e6) // len(src))))[: int(args.mb * 1e6)]
    mb = len(data) / 1e6
    print(f"backend={jax.default_backend()} corpus={len(data)}B", file=sys.stderr, flush=True)

    et = compress_host(data)
    hdr = parse_header(et)
    fsm = build_byte_fsm(hdr.table)
    buf = np.frombuffer(et, np.uint8)[hdr.body_start :]
    chunk = 512
    n_real = max(1, -(-buf.size // chunk))
    lanes = _pad_lanes(n_real)
    padded = np.zeros(lanes * chunk, np.uint8)
    padded[: buf.size] = buf
    cols = bytes_to_cols(padded, lanes, chunk)
    tbl = _table_T_bf16(fsm)
    int(jnp.sum(cols))  # stage H2D
    print(f"lanes={lanes} k={chunk} body={buf.size}B S={fsm.width}", file=sys.stderr, flush=True)

    def run_pallas():
        s, u = fsm8_decode_pallas(cols, tbl, jnp.int32(n_real))
        assert not bool(u), "self-sync did not converge"
        return int(jnp.sum(s.astype(jnp.int32)))  # value-dependent readback

    t0 = time.perf_counter()
    run_pallas()
    print(f"pallas first call (compile+run): {time.perf_counter()-t0:.1f}s",
          file=sys.stderr, flush=True)
    best = float("inf")
    for _ in range(args.iters):
        t0 = time.perf_counter()
        run_pallas()
        best = min(best, time.perf_counter() - t0)
    results = {
        "corpus_MB": mb,
        "fsm8_pallas_ms": round(best * 1e3, 1),
        "fsm8_pallas_MBps": round(mb / best / 1e3 * 1e3, 1) if best else 0,
    }

    # bit-equality: expand on host, compare with original data
    s, u = fsm8_decode_pallas(cols, tbl, jnp.int32(n_real))
    out = expand_states(np.asarray(s), buf, fsm, hdr.body_len)
    assert out.tobytes() == data, "pallas decode mismatch"
    results["bit_equal"] = True

    # Marginal per-pass kernel time: chain n dependent emit passes inside one
    # jit (exit states feed back as entries — a real dependency, so nothing
    # is CSE'd) and difference the timings. Through the axon tunnel a single
    # call is dominated by ~60 ms of dispatch+readback latency that a
    # production pod does not have; the delta isolates pure kernel compute.
    from functools import partial as _partial

    from entreepy_tpu.ops.pallas_fsm8 import emit_pass_pallas8

    xs = cols.T

    @_partial(jax.jit, static_argnames=("n",))
    def emit_n(xs_, tbl_, entries, n):
        def body(_, e):
            _p, exits = emit_pass_pallas8(xs_, tbl_, e)
            return jnp.concatenate([jnp.zeros(1, jnp.int32), exits[:-1]])

        return jax.lax.fori_loop(0, n, body, entries)

    e0 = jnp.zeros(lanes, jnp.int32)

    def timed(n):
        int(jnp.sum(emit_n(xs, tbl, e0, n)))  # warm/compile
        best = float("inf")
        for _ in range(args.iters):
            t0 = time.perf_counter()
            int(jnp.sum(emit_n(xs, tbl, e0, n)))
            best = min(best, time.perf_counter() - t0)
        return best

    t1, t11 = timed(1), timed(11)
    per_pass = (t11 - t1) / 10
    results["emit_pass_ms"] = round(per_pass * 1e3, 2)
    results["emit_pass_MBps"] = round(mb / per_pass / 1e3 * 1e3, 1) if per_pass > 0 else -1
    body_mb = buf.size / 1e6
    # MFU: MACs per pass = body_bytes * S * 256 (one [256,S]x[256,lanes]
    # contraction per byte); v5e MXU peak ~197 TFLOP/s bf16 = 98.5 TMAC/s.
    macs = buf.size * fsm.width * 256
    results["emit_pass_mfu_pct"] = round(macs / max(per_pass, 1e-9) / 98.5e12 * 100, 2)
    results["emit_pass_body_GBps"] = round(body_mb / max(per_pass, 1e-9) / 1e3, 2)

    if args.scan:
        def run_scan():
            s, u = fsm8_decode(cols, tbl, jnp.int32(n_real))
            return int(jnp.sum(s.astype(jnp.int32)))

        t0 = time.perf_counter()
        run_scan()
        print(f"scan first call: {time.perf_counter()-t0:.1f}s", file=sys.stderr, flush=True)
        bs = float("inf")
        for _ in range(args.iters):
            t0 = time.perf_counter()
            run_scan()
            bs = min(bs, time.perf_counter() - t0)
        results["fsm8_scan_ms"] = round(bs * 1e3, 1)

    print(json.dumps(results))
    return 0


if __name__ == "__main__":
    sys.exit(main())
