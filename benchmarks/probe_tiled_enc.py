#!/usr/bin/env python3
"""Streaming tiled DEVICE ENCODE at 50-100 MB: per-tile compute marginals.

The decode twin is benchmarks/probe_tiled.py. Encode tiles are independent
(blocks don't share state), so the probe stages every tile's blocks on
device up front (H2D through the tunnel is the environment's cost, not the
chip's), then measures (a) the launch-train wall time over all tiles synced
once and (b) the per-tile burst marginal of the pack + doubling-shift
plane compaction + live-checksum program — the pod-representative rate.
Anchored: each tile's bit-length total must equal the host encoder's.

    timeout 580 python -u benchmarks/probe_tiled_enc.py --mb 100
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
    ap.add_argument("--mb", type=float, default=100.0)
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    if jax.default_backend() not in ("tpu", "axon"):
        print(f"error: needs a TPU backend, have {jax.default_backend()}",
              file=sys.stderr)
        return 1

    from entreepy_tpu.format.huffman import build_code_table, histogram
    from entreepy_tpu.ops.bitpack import (
        code_table_cols, compact_payload_plane, grouped_counts_plane,
        plane_cap_g, plane_sub_for,
    )
    from entreepy_tpu.ops.encode import (
        DEFAULT_BLOCK_BYTES, TILE_BLOCKS, _pad_blocks, split_blocks,
    )
    from entreepy_tpu.ops.pallas_pack import pack_blocks_pallas

    src = (ROOT / "tests/data/a_midsummer_nights_dream.txt").read_bytes()
    data = (src * (-(-int(args.mb * 1e6) // len(src))))[: int(args.mb * 1e6)]
    arr = np.frombuffer(data, np.uint8)
    mb = len(data) / 1e6
    table = build_code_table(histogram(arr))
    ct = jnp.asarray(code_table_cols(table.codes, table.lengths), jnp.bfloat16)
    bb = DEFAULT_BLOCK_BYTES
    sub = plane_sub_for(bb)
    g = bb // sub
    tile_bytes = TILE_BLOCKS * bb

    # Stage every tile's blocks on device (uint8, 1 B/byte H2D).
    tiles = []
    for off in range(0, arr.size, tile_bytes):
        seg = arr[off: off + tile_bytes]
        blocks, valid = split_blocks(seg, bb)
        nb = _pad_blocks(blocks.shape[0])
        if nb != blocks.shape[0]:
            pad = nb - blocks.shape[0]
            blocks = np.concatenate([blocks, np.zeros((pad, bb), np.uint8)])
            valid = np.concatenate([valid, np.zeros(pad, np.int32)])
        tiles.append((jnp.asarray(blocks), jnp.asarray(valid), seg))
    for b_t, v_t, _ in tiles:
        b_t.block_until_ready()
    hbm_mb = sum(int(b.size) for b, _, _ in tiles) / 1e6
    print(f"backend={jax.default_backend()} corpus={len(data)}B "
          f"tiles={len(tiles)}x{tile_bytes // 1024**2}MB block={bb}B",
          file=sys.stderr, flush=True)

    # ONE cap for one compiled program: the max subgroup fill across tiles
    # (untimed sizing, exactly like the product path's per-call sizing).
    cap = 0
    for b_t, v_t, _ in tiles:
        _w, e, _a, _n = pack_blocks_pallas(b_t, v_t, ct)
        cap = max(cap, plane_cap_g(int(np.asarray(grouped_counts_plane(e)).max(initial=1)), bb))

    @jax.jit
    def enc_tile(b_, v_, ct_):
        w, e, a, nn = pack_blocks_pallas(b_, v_, ct_)
        plane, counts_g, bl = compact_payload_plane(w, e, a, nn, cap)
        lanes_, _gc = plane.shape
        fi = jax.lax.bitcast_convert_type(plane, jnp.int32)
        pay = fi[:, : g * cap].reshape(lanes_, g, cap)
        jj = jnp.arange(cap, dtype=jnp.int32)[None, None, :]
        live = (jj < counts_g[:, :, None]).astype(jnp.int32)
        idx = jnp.arange(g * cap, dtype=jnp.int32).reshape(1, g, cap)
        return jnp.sum((pay ^ idx) * live) + jnp.sum(fi[:, -1]), jnp.sum(bl)

    # Anchor: per-tile bit totals == the exact code-length sums of the
    # tile's bytes (what the host encoder writes).
    for i, (b_t, v_t, seg) in enumerate(tiles):
        _chk, bits = (int(x) for x in enc_tile(b_t, v_t, ct))
        exp_bits = int(np.sum(table.lengths[seg].astype(np.int64)))
        assert bits == exp_bits, (i, bits, exp_bits)
    print("per-tile bit totals match the code-length sums", file=sys.stderr)

    # (a) launch-train wall: all tiles async, one sync.
    def stream():
        outs = [enc_tile(b_t, v_t, ct) for b_t, v_t, _ in tiles]
        return sum(int(a) + int(c) for a, c in outs)

    stream()
    t_stream = 1e9
    for _ in range(args.iters):
        t0 = time.perf_counter()
        stream()
        t_stream = min(t_stream, time.perf_counter() - t0)

    # (b) per-tile burst marginal on tile 0 (full tile).
    b0, v0, _ = tiles[0]

    def burst(n):
        outs = [enc_tile(b0, v0, ct) for _ in range(n)]
        return sum(int(a) + int(c) for a, c in outs[-1:])

    burst(1)
    best = 1e9
    for _ in range(args.iters):
        t0 = time.perf_counter()
        burst(1)
        t1 = time.perf_counter()
        burst(13)
        t2 = time.perf_counter()
        best = min(best, ((t2 - t1) - (t1 - t0)) / 12)
    tile_mb = tile_bytes / 1e6
    print(json.dumps({
        "corpus_MB": mb,
        "tiles": len(tiles),
        "tile_MB": tile_mb,
        "block_bytes": bb,
        "cap": cap,
        "staged_hbm_MB": round(hbm_mb, 1),
        "stream_ms": round(t_stream * 1e3, 1),
        "stream_MBps": round(mb / t_stream, 1),
        "tile_compute_ms": round(best * 1e3, 2),
        "tile_compute_MBps": round(tile_mb / best, 1),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
