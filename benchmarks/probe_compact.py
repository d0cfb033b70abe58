#!/usr/bin/env python3
"""Stage breakdown of the device encode pipeline on the real chip.

Measures burst-differenced marginals for three nested programs on the same
packed blocks: (a) Pallas pack only, (b) pack + stage-1 per-lane sort
compaction (compact_payload_device), (c) pack + both stages
(compact_payload_flat = stage 1 + global 1-D sort).  The deltas attribute
encode-e2e time to the compaction stages — CLAUDE.md flags global 1-D
sorts as disproportionately expensive on TPU; this quantifies it.

    timeout 580 python -u benchmarks/probe_compact.py
"""

from __future__ import annotations

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
    import jax
    import jax.numpy as jnp

    from entreepy_tpu.format.huffman import build_code_table, histogram
    from entreepy_tpu.ops.bitpack import (
        code_table_cols, compact_payload_device, compact_payload_flat,
        emitted_counts, flat_cap, grouped_counts, payload_cap, payload_cap_g,
    )
    from entreepy_tpu.ops.pallas_pack import pack_blocks_pallas
    from entreepy_tpu.utils.stitch import split_blocks

    if jax.default_backend() not in ("tpu", "axon"):
        print("needs TPU", file=sys.stderr)
        return 1

    src = (ROOT / "tests/data/a_midsummer_nights_dream.txt").read_bytes()
    data = (src * 47)[: int(5.2e6)]
    arr = np.frombuffer(data, np.uint8)
    table = build_code_table(histogram(arr))
    blocks, valid = split_blocks(arr, 4096)
    n = blocks.shape[0]
    nb = max(8, 1 << (n - 1).bit_length())
    if nb != n:
        blocks = np.concatenate([blocks, np.zeros((nb - n, 4096), np.uint8)])
        valid = np.concatenate([valid, np.zeros(nb - n, np.int32)])
    b, v = jnp.asarray(blocks), jnp.asarray(valid)
    ct = jnp.asarray(code_table_cols(table.codes, table.lengths), jnp.bfloat16)

    w, e, a, nn = pack_blocks_pallas(b, v, ct)
    cnts = np.asarray(emitted_counts(e))
    cap = payload_cap(int(cnts.max(initial=1)), w.shape[1])
    cg = np.asarray(grouped_counts(e))
    cap_g = payload_cap_g(int(cg.max(initial=1)), w.shape[1])
    cap_total = flat_cap(int(cnts.sum()) + len(cnts))
    print(
        f"lanes={w.shape[0]} steps={w.shape[1]} cap={cap} cap_g={cap_g} "
        f"cap_total={cap_total}",
        file=sys.stderr, flush=True,
    )

    @jax.jit
    def pack_only(b_, v_, ct_):
        w_, e_, a_, n_ = pack_blocks_pallas(b_, v_, ct_)
        return jnp.sum(e_.astype(jnp.int32)) + jnp.sum(a_ & 1)

    @jax.jit
    def pack_s1(b_, v_, ct_):
        w_, e_, a_, n_ = pack_blocks_pallas(b_, v_, ct_)
        pay, bl = compact_payload_device(w_, e_, a_, n_, cap)
        pi = jax.lax.bitcast_convert_type(pay, jnp.int32)
        return jnp.sum(pi & 1) + jnp.sum(bl)

    @jax.jit
    def pack_s2(b_, v_, ct_):
        w_, e_, a_, n_ = pack_blocks_pallas(b_, v_, ct_)
        flat, nw, bl = compact_payload_flat(w_, e_, a_, n_, cap_g, cap_total)
        fi = jax.lax.bitcast_convert_type(flat, jnp.int32)
        return jnp.sum(fi & 1) + jnp.sum(bl)

    def burst(fn, n):
        outs = [fn(b, v, ct) for _ in range(n)]
        return int(outs[-1])

    out = {}
    for name, fn in [("pack", pack_only), ("pack_s1_old", pack_s1),
                     ("pack_flat_new", pack_s2)]:
        burst(fn, 1)  # compile + warm
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter(); burst(fn, 1); t1 = time.perf_counter()
            burst(fn, 5)
            t2 = time.perf_counter()
            # marginal of 4 extra launches after the single-launch baseline
            per = (t2 - t1 - (t1 - t0)) / 4
            best = min(best, per)
        out[name + "_ms"] = round(best * 1e3, 2)
    out["s1_old_ms"] = round(out["pack_s1_old_ms"] - out["pack_ms"], 2)
    out["flat_new_ms"] = round(out["pack_flat_new_ms"] - out["pack_ms"], 2)
    print(json.dumps(out), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
