#!/usr/bin/env python3
"""Tile-parameter sweep for the byte-FSM Pallas decode kernel.

For each (LANE_TILE, UNROLL, K_TILE) config: marginal emit-pass time via the
chained-iteration method + bit-equality check. Run attended (fresh Mosaic
compiles): timeout 550 python -u benchmarks/tune_fsm8.py
"""

from __future__ import annotations

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

# Best measured: the default (1024, 4, 512) reaches 86-98% of MXU bf16 peak
# on the 5.2 MB corpus; (*, 4, 1024) drops to ~80%, (2048, 4, 1024) fails to
# compile (VMEM), and UNROLL=8 would need 2-row output packing.
CONFIGS = [
    # (LANE_TILE, UNROLL, K_TILE)
    (1024, 4, 512),  # current default
    (512, 4, 256),
    (1024, 4, 1024),
    (2048, 4, 512),
]


def main() -> int:
    import jax
    import jax.numpy as jnp

    from entreepy_tpu.format import compress_host, parse_header
    from entreepy_tpu.format.fsm8 import build_byte_fsm
    from entreepy_tpu.ops import decode8, pallas_fsm8
    from entreepy_tpu.ops.decode8 import _table_T_bf16

    if jax.default_backend() not in ("tpu", "axon"):
        print("needs TPU", file=sys.stderr)
        return 1

    src = (ROOT / "tests/data/a_midsummer_nights_dream.txt").read_bytes()
    data = (src * 47)[:5_200_000]
    et = compress_host(data)
    hdr = parse_header(et)
    fsm = build_byte_fsm(hdr.table)
    buf = np.frombuffer(et, np.uint8)[hdr.body_start:]
    tbl = _table_T_bf16(fsm)
    mb = len(data) / 1e6

    for lt, unroll, kt in CONFIGS:
        jax.clear_caches()
        pallas_fsm8.LANE_TILE = lt
        pallas_fsm8.UNROLL = unroll
        pallas_fsm8.K_TILE = kt
        chunk = max(kt, 512)
        n_real = max(1, -(-buf.size // chunk))
        lanes = max(lt, -(-n_real // lt) * lt)
        padded = np.zeros(lanes * chunk, np.uint8)
        padded[: buf.size] = buf
        cols = decode8.bytes_to_cols(padded, lanes, chunk)
        xs = cols.T
        int(jnp.sum(cols))

        @partial(jax.jit, static_argnames=("n",))
        def emit_n(xs_, tbl_, entries, n):
            def body(_, e):
                _p, exits = pallas_fsm8.emit_pass_pallas8(xs_, tbl_, e)
                return jnp.concatenate([jnp.zeros(1, jnp.int32), exits[:-1]])
            return jax.lax.fori_loop(0, n, body, entries)

        e0 = jnp.zeros(lanes, jnp.int32)
        try:
            def timed(n, iters=4):
                int(jnp.sum(emit_n(xs, tbl, e0, n)))
                best = 1e9
                for _ in range(iters):
                    t0 = time.perf_counter()
                    int(jnp.sum(emit_n(xs, tbl, e0, n)))
                    best = min(best, time.perf_counter() - t0)
                return best

            t1, t11 = timed(1), timed(11)
            pp = max((t11 - t1) / 10, 1e-9)
            # correctness: full decode, bit equality
            s, u = pallas_fsm8.fsm8_decode_pallas(cols, tbl, jnp.int32(n_real))
            out = decode8.expand_states(np.asarray(s), buf, fsm, hdr.body_len)
            ok = out.tobytes() == data and not bool(u)
            mfu = buf.size * fsm.width * 256 / pp / 98.5e12 * 100
            print(json.dumps({
                "lt": lt, "unroll": unroll, "kt": kt, "chunk": chunk,
                "pass_ms": round(pp * 1e3, 2),
                "MBps": round(mb / pp / 1e3 * 1e3, 0),
                "mfu_pct": round(mfu, 1), "bit_equal": ok,
            }), flush=True)
        except Exception as e:
            print(json.dumps({"lt": lt, "unroll": unroll, "kt": kt,
                              "error": repr(e)[:200]}), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
