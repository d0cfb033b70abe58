#!/usr/bin/env python3
"""Tile-parameter sweep for the Pallas pack (encode) kernel.

Marginal per-pass times via the chained-iteration method, plus bit-equality
vs the XLA scan form. Run attended: timeout 550 python -u benchmarks/tune_pack.py
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

CONFIGS = [
    # (LANE_TILE, K_TILE, UNROLL)
    (512, 256, 8),  # current default
    (512, 512, 8),
    (1024, 256, 8),
    (1024, 512, 8),
    (1024, 512, 16),
    (2048, 256, 8),
]


def main() -> int:
    import jax
    import jax.numpy as jnp

    from entreepy_tpu.format import build_code_table, histogram
    from entreepy_tpu.ops import pallas_pack
    from entreepy_tpu.ops.bitpack import code_table_cols, pack_blocks_jit
    from entreepy_tpu.utils.stitch import split_blocks

    if jax.default_backend() not in ("tpu", "axon"):
        print("needs TPU", file=sys.stderr)
        return 1

    src = (ROOT / "tests/data/a_midsummer_nights_dream.txt").read_bytes()
    data = (src * 47)[:5_200_000]
    arr = np.frombuffer(data, np.uint8)
    table = build_code_table(histogram(arr))
    blocks, valid = split_blocks(arr, 4096)
    n = blocks.shape[0]
    nb = 1 << (n - 1).bit_length()
    blocks = np.concatenate([blocks, np.zeros((nb - n, 4096), np.uint8)])
    valid = np.concatenate([valid, np.zeros(nb - n, np.int32)])
    b, v = jnp.asarray(blocks), jnp.asarray(valid)
    ct = jnp.asarray(code_table_cols(table.codes, table.lengths), jnp.bfloat16)
    int(jnp.sum(v))
    mb = len(data) / 1e6

    ref = None
    for lt, kt, unroll in CONFIGS:
        jax.clear_caches()
        pallas_pack.LANE_TILE = lt
        pallas_pack.K_TILE = kt
        pallas_pack.UNROLL = unroll

        @partial(jax.jit, static_argnames=("n",))
        def pack_n(b_, v_, ct_, n):
            def body(_, carry):
                bb, acc = carry
                w, e, a, nn = pallas_pack.pack_blocks_pallas(bb, v_, ct_)
                bb2, a2 = jax.lax.optimization_barrier((bb, a))
                return bb2, acc + jnp.sum(a2 & 1)
            _, acc = jax.lax.fori_loop(0, n, body, (b_, jnp.int32(0)))
            return acc

        try:
            def timed(n, iters=4):
                int(pack_n(b, v, ct, n))
                best = 1e9
                for _ in range(iters):
                    t0 = time.perf_counter()
                    int(pack_n(b, v, ct, n))
                    best = min(best, time.perf_counter() - t0)
                return best

            t1, t21 = timed(1), timed(21)
            pp = max((t21 - t1) / 20, 1e-9)
            # bit-equality vs the scan form
            w1, e1, a1, n1 = pack_blocks_jit(b, v, ct)
            w2, e2, a2, n2 = pallas_pack.pack_blocks_pallas(b, v, ct)
            e1n = np.asarray(e1)
            ok = (np.array_equal(e1n, np.asarray(e2))
                  and np.array_equal(np.asarray(w1)[e1n], np.asarray(w2)[e1n])
                  and np.array_equal(np.asarray(a1), np.asarray(a2))
                  and np.array_equal(np.asarray(n1), np.asarray(n2)))
            print(json.dumps({
                "lt": lt, "kt": kt, "unroll": unroll,
                "pass_ms": round(pp * 1e3, 2),
                "MBps": round(mb / pp / 1e3 * 1e3, 0),
                "bit_equal": bool(ok),
            }), flush=True)
        except Exception as e:
            print(json.dumps({"lt": lt, "kt": kt, "unroll": unroll,
                              "error": repr(e)[:160]}), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
