#!/usr/bin/env python3
"""On-chip kernel benchmark: Pallas vs XLA-scan forms of both hot ops.

Times exclude host<->device transfers (staged H2D, value-dependent readback
of a scalar) — through this environment's slow TPU tunnel, end-to-end device
calls are transfer-bound and not representative of pod hardware; kernel
compute is. Also asserts on-chip bit-equality between the Pallas and XLA
forms. Run attended (fresh-kernel Mosaic compiles can wedge the device —
CLAUDE.md): python benchmarks/device.py [--mb 5.2]
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


def best_of(fn, iters=5):
    fn()
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best * 1e3


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mb", type=float, default=5.2)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from entreepy_tpu.format import build_code_table, compress_host, histogram, parse_header
    from entreepy_tpu.format.fsm import build_decode_fsm
    from entreepy_tpu.ops.bitpack import code_table_cols, pack_blocks_jit
    from entreepy_tpu.ops.decode import (
        _table_bf16, _table_sync_bf16, fsm_decode, words_to_nibbles,
    )
    from entreepy_tpu.ops.pallas_fsm import fsm_decode_pallas, pallas_table
    from entreepy_tpu.ops.pallas_pack import pack_blocks_pallas
    from entreepy_tpu.utils.stitch import split_blocks

    if jax.default_backend() not in ("tpu", "axon"):
        print(f"error: needs a TPU backend, have {jax.default_backend()}", file=sys.stderr)
        return 1

    src = (ROOT / "tests/data/a_midsummer_nights_dream.txt").read_bytes()
    data = (src * (-(-int(args.mb * 1e6) // len(src))))[: int(args.mb * 1e6)]
    mb = len(data) / 1e6
    print(f"backend={jax.default_backend()} corpus={len(data)}B", file=sys.stderr)

    # ---- encode kernels ----
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
    int(jnp.sum(v))  # stage

    def enc(fn):
        def run():
            w, e, a, nn = fn(b, v, ct)
            return int(jnp.sum(e.astype(jnp.int32)))
        return run

    results = {}
    t_scan = best_of(enc(pack_blocks_jit))  # the production XLA form (jitted)
    t_pal = best_of(enc(pack_blocks_pallas))
    results["pack_scan_ms"] = round(t_scan, 1)
    results["pack_pallas_ms"] = round(t_pal, 1)
    results["pack_pallas_MBps"] = round(mb / t_pal * 1e3, 1)

    # on-chip bit-equality of the two forms
    w1, e1, a1, n1 = pack_blocks_jit(b, v, ct)
    w2, e2, a2, n2 = pack_blocks_pallas(b, v, ct)
    e1n = np.asarray(e1)
    assert np.array_equal(e1n, np.asarray(e2))
    assert np.array_equal(np.asarray(w1)[e1n], np.asarray(w2)[e1n])
    assert np.array_equal(np.asarray(a1), np.asarray(a2))
    assert np.array_equal(np.asarray(n1), np.asarray(n2))

    # ---- decode kernels ----
    et = compress_host(data)
    hdr = parse_header(et)
    fsm = build_decode_fsm(hdr.table)
    buf = np.frombuffer(et, np.uint8)[hdr.body_start:]
    n_real = max(1, -(-buf.size // 512))
    lanes = 1 << max(3, (n_real - 1).bit_length())
    padded = np.zeros(lanes * 512, np.uint8)
    padded[: buf.size] = buf
    nib = words_to_nibbles(jnp.asarray(padded.view(">u4").astype(np.uint32)), lanes, 1024)
    int(jnp.sum(nib))
    tf, ts = _table_bf16(fsm), _table_sync_bf16(fsm)
    tp = jnp.asarray(pallas_table(fsm), jnp.bfloat16)

    def dec(fn, t):
        def run():
            p, c, u = fn(nib, t, ts, jnp.int32(n_real))
            assert not bool(u), "chunk self-sync did not converge"
            return int(jnp.sum(c.astype(jnp.int32)))
        return run

    t_scan = best_of(dec(fsm_decode, tf))
    t_pal = best_of(dec(fsm_decode_pallas, tp))
    results["decode_scan_ms"] = round(t_scan, 1)
    results["decode_pallas_ms"] = round(t_pal, 1)
    results["decode_pallas_MBps"] = round(mb / t_pal * 1e3, 1)

    p1, c1, _ = fsm_decode(nib, tf, ts, jnp.int32(n_real))
    p2, c2, _ = fsm_decode_pallas(nib, tp, ts, jnp.int32(n_real))
    assert np.array_equal(np.asarray(p1), np.asarray(p2))
    assert np.array_equal(np.asarray(c1), np.asarray(c2).astype(np.int32))

    results["corpus_MB"] = mb
    results["bit_equal"] = True
    print(json.dumps(results))
    return 0


if __name__ == "__main__":
    sys.exit(main())
