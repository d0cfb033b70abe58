#!/usr/bin/env python3
"""Interleaved A/B of the encode plane-compaction formulations on chip.

Two full pack+compact+checksum programs over the same 5.2 MB corpus:
the XLA per-subgroup ``sort_key_val`` (the CPU-mesh twin inside
``compact_payload_plane``) vs the doubling-shift Pallas kernel
(``ops/pallas_compact.compact_rows_pallas``). Both configs run
interleaved in ONE process (burst marginals drift ±2 ms across
processes — CLAUDE.md) with checksum anchors asserting bit-equality; the
two formulations are called directly instead of flipping
``ENTREEPY_PLANE_KERNEL`` (the env is read at trace time and the jit
cache keys on shapes only, so mutating it mid-process would silently
reuse the other config's program).

Measured 2026-08-19 on v5e (5.2 MB text, the then-default 4096-byte
blocks, sub=256, cap=64): sort 2.28 ms, kernel 0.77 ms — the defaults'
rationale. The probe follows the shipped block-size default (1024 since
the same session's block sweep: 4096 -> 1.13, 1024 -> 0.58 ms
pack+compact with tile-multiple lane padding).

    timeout 550 python -u benchmarks/probe_plane_compact.py
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

    if jax.default_backend() not in ("tpu", "axon"):
        print("needs TPU", file=sys.stderr)
        return 1

    from entreepy_tpu.format.huffman import build_code_table, histogram
    from entreepy_tpu.ops.bitpack import (
        code_table_cols, grouped_counts_plane, plane_cap_g, plane_sub_for,
    )
    from entreepy_tpu.ops.encode import (
        DEFAULT_BLOCK_BYTES, _pad_blocks, split_blocks,
    )
    from entreepy_tpu.ops.pallas_compact import compact_rows_pallas
    from entreepy_tpu.ops.pallas_pack import pack_blocks_pallas

    src = (ROOT / "tests/data/a_midsummer_nights_dream.txt").read_bytes()
    data = (src * (-(-5_200_000 // len(src))))[:5_200_000]
    arr = np.frombuffer(data, np.uint8)
    table = build_code_table(histogram(arr))
    block_bytes = DEFAULT_BLOCK_BYTES
    blocks_np, valid_np = split_blocks(arr, block_bytes)
    nb = _pad_blocks(blocks_np.shape[0])
    if nb != blocks_np.shape[0]:
        pad = nb - blocks_np.shape[0]
        blocks_np = np.concatenate(
            [blocks_np, np.zeros((pad, block_bytes), np.uint8)]
        )
        valid_np = np.concatenate([valid_np, np.zeros(pad, np.int32)])
    ct = jnp.asarray(code_table_cols(table.codes, table.lengths), jnp.bfloat16)
    b = jnp.asarray(blocks_np)
    v = jnp.asarray(valid_np)

    w0, e0, _a0, _n0 = pack_blocks_pallas(b, v, ct)
    cg_np = np.asarray(grouped_counts_plane(e0))
    cap = plane_cap_g(int(cg_np.max(initial=1)), block_bytes)
    sub = plane_sub_for(block_bytes)
    g = block_bytes // sub
    print(f"lanes={nb} steps={block_bytes} sub={sub} cap={cap}", file=sys.stderr)

    def chk(pay, counts_g, acc):
        lanes_, g_, cap_ = pay.shape
        jj = jnp.arange(cap_, dtype=jnp.int32)[None, None, :]
        live = (jj < counts_g[:, :, None]).astype(jnp.int32)
        idx = jnp.arange(g_ * cap_, dtype=jnp.int32).reshape(1, g_, cap_)
        acc_col = jax.lax.bitcast_convert_type(acc, jnp.int32) ^ (g_ * cap_)
        return jnp.sum((pay ^ idx) * live) + jnp.sum(acc_col)

    @jax.jit
    def e2e_sort(b_, v_, ct_):
        w, e, a, _nn = pack_blocks_pallas(b_, v_, ct_)
        lanes, _steps = w.shape
        w3 = jax.lax.bitcast_convert_type(w, jnp.int32).reshape(lanes, g, sub)
        e3 = e.reshape(lanes, g, sub)
        cum = jnp.cumsum(e3.astype(jnp.int32), axis=2)
        iota = jnp.arange(sub, dtype=jnp.int32)[None, None, :]
        key = jnp.where(e3, cum - 1, sub + iota)
        _, vs = jax.lax.sort_key_val(key, jnp.where(e3, w3, 0), dimension=2)
        return chk(vs[:, :, :cap], cum[:, :, -1], a), jnp.sum(cum[:, :, -1])

    @jax.jit
    def e2e_kernel(b_, v_, ct_):
        w, e, a, _nn = pack_blocks_pallas(b_, v_, ct_)
        wk = jax.lax.bitcast_convert_type(w, jnp.int32).T
        ek = e.astype(jnp.int32).T
        plane_k, counts_k = compact_rows_pallas(wk, ek, sub, cap)
        pay = plane_k.reshape(g, cap, nb).transpose(2, 0, 1)
        return chk(pay, counts_k.T, a), jnp.sum(counts_k)

    def bench(fn):
        def burst(n):
            outs = [fn(b, v, ct) for _ in range(n)]
            return tuple(int(x) for x in outs[-1])

        anchor = burst(1)
        best = 1e9
        for _ in range(5):
            t0 = time.perf_counter()
            burst(1)
            t1 = time.perf_counter()
            burst(13)
            t2 = time.perf_counter()
            best = min(best, ((t2 - t1) - (t1 - t0)) / 12)
        return best, anchor

    configs = [("sort", e2e_sort), ("kernel", e2e_kernel)]
    res: dict[str, list[float]] = {}
    anchors = {}
    for name, fn in configs:  # compile both before any timing
        t, r = bench(fn)
        res[name] = [t]
        anchors[name] = r
    for _ in range(4):  # interleave the timed rounds
        for name, fn in configs:
            t, _ = bench(fn)
            res[name].append(t)
    assert anchors["sort"] == anchors["kernel"], (anchors, "CHECKSUM MISMATCH")
    out = {k: round(float(np.median(v)) * 1e3, 3) for k, v in res.items()}
    out["checksum_equal"] = True
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
