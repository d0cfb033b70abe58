#!/usr/bin/env python3
"""Streaming tiled device decode at 50-100 MB scale (VERDICT r3 item 3).

Measures ``decode_body_device_tiled``'s pipeline shape on chip: per 32 MB
compressed tile, one fused one-pass decode + on-device compaction, with each
tile's entry state chained from the previous tile's exit ARRAY ON DEVICE —
no host sync between tiles, so the whole streamed decode is one async launch
train synced once by a position-weighted checksum readback (through this
environment's tunnel a 100 MB output fetch would swamp compute; the checksum
verifies every live symbol byte instead — the real path's plane fetch is
D2H any consumer pays, reported separately by the auto/host benches).

The per-tile cap sizing (a tiny host fetch on the product path) runs as an
untimed pre-pass here: a pod decoder amortizes it the same way (caps derive
from per-subgroup maxima that one sizing pass yields for the whole file).

HBM working set: ~10 B per compressed byte per tile (cols int32[K, lanes] +
packed rows int32[K, lanes] + plane), independent of body size.

Run attended (fresh Mosaic compiles can wedge the device — CLAUDE.md):

    timeout 550 python -u benchmarks/probe_tiled.py --mb 100

Reference counterpart: decode.zig:143-203 streams the same bytes serially
at ~0.44 MB/s.
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
    ap.add_argument("--tile-mb", type=float, default=32.0)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--allow-cpu", action="store_true",
                    help="run on the scan twin for plumbing validation")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    if args.allow_cpu:
        # The axon sitecustomize re-registers the TPU platform at startup;
        # with the tunnel down even default_backend() blocks on it. Pin the
        # config (same dance as tests/conftest.py).
        jax.config.update("jax_platforms", "cpu")

    if jax.default_backend() not in ("tpu", "axon") and not args.allow_cpu:
        print(f"error: needs a TPU backend, have {jax.default_backend()}",
              file=sys.stderr)
        return 1

    from entreepy_tpu.format import compress_host, parse_header
    from entreepy_tpu.format.fsm8 import build_byte_fsm
    from entreepy_tpu.ops.decode8 import (
        DEFAULT_CHUNK_BYTES, _table_T_bf16, _use_pallas, build_fused,
        bytes_to_cols, compact_symbols_dense, packed_mini_totals,
        plane_checksum, plane_checksum_host, run_fused_decode,
    )
    from entreepy_tpu.ops.pallas_fsm8 import LANE_TILE

    src = (ROOT / "tests/data/a_midsummer_nights_dream.txt").read_bytes()
    data = (src * (-(-int(args.mb * 1e6) // len(src))))[: int(args.mb * 1e6)]
    mb = len(data) / 1e6
    et = compress_host(data)
    hdr = parse_header(et)
    fsm = build_byte_fsm(hdr.table)
    buf = np.frombuffer(et, np.uint8)[hdr.body_start:]
    chunk = DEFAULT_CHUNK_BYTES

    unit = LANE_TILE if _use_pallas() else 1
    t_lanes = max(unit, int(args.tile_mb * 1e6 / chunk) // unit * unit)
    n_real_lanes = max(1, -(-buf.size // chunk))
    lanes = max(unit, -(-n_real_lanes // unit) * unit)
    n_tiles = -(-lanes // t_lanes)
    print(f"backend={jax.default_backend()} corpus={len(data)}B "
          f"compressed={buf.size}B tiles={n_tiles}x{t_lanes * chunk // 1024**2}MB",
          file=sys.stderr, flush=True)

    t_fused, m, mt, s = build_fused(fsm)
    tbl = _table_T_bf16(fsm)

    # Stage every tile's cols on device up front (excluded from timing, like
    # the e2e benches: H2D through the tunnel is the environment's cost, not
    # the chip's; a pod overlaps DMA-in with tile t-1's compute).
    tiles = []
    l0 = 0
    while l0 < lanes:
        tl = min(t_lanes, lanes - l0)
        real_t = min(max(n_real_lanes - l0, 0), tl)
        pad_t = np.zeros(tl * chunk, np.uint8)
        seg = buf[l0 * chunk: (l0 + tl) * chunk]
        pad_t[: seg.size] = seg
        cols_t = bytes_to_cols(pad_t, tl, chunk)
        nv_t = min(max(buf.size - l0 * chunk, 0), tl * chunk)
        tiles.append((cols_t, real_t, nv_t, l0))
        l0 += tl
    for cols_t, *_ in tiles:
        cols_t.block_until_ready()

    # Untimed pre-pass: per-tile symbol totals (tile STARTS for the
    # checksums' trailing-padding mask; the dense plane itself needs no
    # sizing — its cap is statically m, so ONE compiled program serves
    # every tile and corpus). The product path needs no such fetch at all.
    tile_tots = []
    for cols_t, real_t, nv_t, _l0 in tiles:
        v, _x, _u = run_fused_decode(cols_t, tbl, t_fused, jnp.int32(real_t),
                                     m, mt, s, packed=True,
                                     n_valid=jnp.int32(nv_t))
        tile_tots.append(int(jnp.sum(packed_mini_totals(v, m))))
    starts = np.concatenate([[0], np.cumsum(tile_tots)[:-1]]).astype(np.int64)
    n_sym = len(data)
    print(f"tile_tots={tile_tots}", file=sys.stderr, flush=True)

    @jax.jit
    def tile_fn(cols_, entry0, nv_t, real_t, start):
        vals, exits, u = run_fused_decode(
            cols_, tbl, t_fused, real_t, m, mt, s, packed=True,
            entry0=entry0, n_valid=nv_t,
        )
        plane, mt_, lt, wi = compact_symbols_dense(vals, m)
        chk, tot = plane_checksum(plane, mt_, lt, m, n_sym, start)
        return chk, tot, exits, jnp.sum(u)

    def stream_once():
        # Entry chaining stays ON DEVICE: the scalar exits[real_t-1] feeds
        # the next launch asynchronously (exactly decode_body_device_tiled's
        # chaining); nothing syncs until the final readback.
        entry0 = jnp.int32(0)
        chks = []
        for (cols_t, real_t, nv_t, _l0), st in zip(tiles, starts):
            chk, tot, exits, unc = tile_fn(
                cols_t, entry0, jnp.int32(nv_t), jnp.int32(real_t),
                jnp.int32(st),
            )
            entry0 = exits[max(real_t - 1, 0)]
            chks.append((chk, tot, unc))
        # one value-dependent sync for the whole train
        return [(int(c), int(t), int(u)) for c, t, u in chks]

    out = stream_once()  # warm compiles + correctness
    assert all(u == 0 for _c, _t, u in out), "tile self-sync unconverged"
    tot_syms = sum(t for _c, t, _u in out)
    assert tot_syms >= len(data), (tot_syms, len(data))
    # exact per-tile checksums against the source bytes (device sums wrap
    # in int32 — compare modulo 2^32)
    darr = np.frombuffer(data, np.uint8)
    for i, ((chk, _tot, _u), st, tt) in enumerate(zip(out, starts, tile_tots)):
        exp = plane_checksum_host(darr, int(st), tt, n_sym)
        assert chk & 0xFFFFFFFF == exp & 0xFFFFFFFF, (
            f"tile {i} checksum mismatch"
        )
    print("per-tile checksums OK", file=sys.stderr, flush=True)
    t_best = float("inf")
    for _ in range(max(1, args.iters)):
        t0 = time.perf_counter()
        stream_once()
        t_best = min(t_best, time.perf_counter() - t0)

    # per-launch dispatch calibration (null program through the tunnel)
    @jax.jit
    def null(x):
        return jnp.sum(x)

    xs_small = jnp.ones(8, jnp.int32)
    int(null(xs_small))
    t0 = time.perf_counter()
    for _ in range(len(tiles)):
        r = null(xs_small)
    int(r)
    t_null = time.perf_counter() - t0

    # Per-tile COMPUTE via burst marginal (independent launches pipeline the
    # tunnel's per-launch dispatch away): the pod-representative number —
    # this environment's dispatch for a program this complex is ~30-40 ms,
    # far above the null calibration, and dominates the serial stream time.
    cols0, real0, nv0, _ = tiles[0]
    st0 = jnp.int32(0)

    def tile_burst(n):
        rs = [tile_fn(cols0, jnp.int32(0), jnp.int32(nv0), jnp.int32(real0),
                      st0) for _ in range(n)]
        chk, tot, exits, unc = rs[-1]
        return int(chk) + int(tot)

    tile_burst(1)
    t_tile = float("inf")
    for _ in range(3):
        t0 = time.perf_counter(); tile_burst(1); t1 = time.perf_counter()
        tile_burst(5); t2 = time.perf_counter()
        t_tile = min(t_tile, ((t2 - t1) - (t1 - t0)) / 4)
    tile_out_mb = tile_tots[0] / 1e6

    results = {
        "corpus_MB": mb,
        "compressed_MB": round(buf.size / 1e6, 1),
        "tiles": len(tiles),
        "tile_MB": round(t_lanes * chunk / 1e6, 1),
        "hbm_working_set_MB": round(t_lanes * chunk * 10 / 1e6, 1),
        "stream_ms": round(t_best * 1e3, 1),
        "stream_MBps": round(mb / t_best, 1),
        "dispatch_null_ms": round(t_null * 1e3, 1),
        "stream_minus_dispatch_MBps": round(
            mb / max(t_best - t_null, 1e-9), 1
        ),
        "tile_compute_ms": round(t_tile * 1e3, 1),
        "tile_compute_MBps": round(tile_out_mb / t_tile, 1),
    }
    print(json.dumps(results))
    return 0


if __name__ == "__main__":
    sys.exit(main())
