#!/usr/bin/env python3
"""Interleaved A/B of decode-compaction formulations on the real chip.

The r5 stage probe attributed ~78% of the on-device decode e2e to the
compaction epilogue (fused 0.71 ms -> +compact 2.92 ms -> +checksum
0.11 ms on 5.2 MB). This probe compares formulations of that epilogue on
the SAME fused-decode output, all inside the same jit shape as the e2e
program (fused kernel included so fusion context matches):

  cur    r4 production: K-axis cumsum metadata + per-subgroup int16 sort
  msum2  hierarchical metadata + masked-sum compaction at 2-byte subgroups
  sel2   same plane via unrolled static select-chains (no one-hot)
  dense  NO reorder: plane = the per-byte slots, mini_tot = counts
  base   floor: fused + unpack/mask only (no compaction at all)

OUTCOME (v5e, 2026-08-19): cur 3.76 / msum2 3.25 / sel2 3.44 / dense 2.73
/ base 2.62 ms -- i.e. the XLA unpack+remask epilogue (~1.9 ms), not the
sort, dominated. This motivated the r5 redesign: the kernel masks the
count byte in-kernel and compact_symbols_dense reads the plane straight
off the packed words (see ops/decode8.py), taking the full e2e to
~0.9-1.5 ms with SYNC_WINDOW=128. The probe is kept for future sweeps.

All plane-producing variants must produce the identical checksum
(asserted against the host anchor). Timings are burst-differenced
marginals, variants interleaved in one process (CLAUDE.md: cross-process
A/B is meaningless on this tunnel).

    timeout 580 python -u benchmarks/probe_compact_dec.py
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

    from entreepy_tpu.format import compress_host, parse_header
    from entreepy_tpu.format.fsm8 import build_byte_fsm
    from entreepy_tpu.ops.decode8 import (
        SUB_BYTES, _expand_mask, _pad_lanes, _table_T_bf16, build_fused,
        bytes_to_cols, packed_mini_totals, packed_sym_cap, plane_checksum,
        plane_checksum_host, run_fused_decode, unpack_fused_rows,
    )

    src = (ROOT / "tests/data/a_midsummer_nights_dream.txt").read_bytes()
    data = (src * (-(-5_200_000 // len(src))))[:5_200_000]
    blob = compress_host(data)
    hdr = parse_header(blob)
    fsm = build_byte_fsm(hdr.table)
    buf = np.frombuffer(blob, np.uint8)[hdr.body_start:]
    chunk = 512
    n_real = max(1, -(-buf.size // chunk))
    lanes = _pad_lanes(n_real)
    padded = np.zeros(lanes * chunk, np.uint8)
    padded[: buf.size] = buf
    cols = bytes_to_cols(padded, lanes, chunk)
    tbl = _table_T_bf16(fsm)
    n_sym = len(data)

    t_fused, m, mt, s_pad = build_fused(fsm)
    v0, _x, _ = run_fused_decode(cols, tbl, t_fused, jnp.int32(n_real),
                                 m, mt, s_pad, packed=True,
                                 n_valid=jnp.int32(buf.size))

    def cap_for(sub):
        mini = packed_mini_totals(v0, m, sub=sub)
        return packed_sym_cap(mini, m, chunk, sub=sub)

    caps = {sub: cap_for(sub) for sub in (2, 4, SUB_BYTES)}
    print(f"m={m} caps={caps} lanes={lanes}", file=sys.stderr, flush=True)
    big = jnp.int32(1 << 30)

    def meta_cur(counts, inv, gs, sb):
        cumk = jnp.cumsum(counts, axis=0) - counts
        lane_tot = cumk[-1] + counts[-1]
        w_inv = jnp.where(inv, cumk, big).min(axis=0)
        c3 = counts.reshape(gs, sb, -1)
        cums = jnp.cumsum(c3, axis=1) - c3
        mini_tot = cums[:, -1, :] + c3[:, -1, :]
        return c3, cums, mini_tot, lane_tot, w_inv

    def meta_hier(counts, inv, gs, sb):
        c3 = counts.reshape(gs, sb, -1)
        cums = jnp.cumsum(c3, axis=1) - c3
        mini_tot = cums[:, -1, :] + c3[:, -1, :]
        g_start = jnp.cumsum(mini_tot, axis=0) - mini_tot
        lane_tot = g_start[-1] + mini_tot[-1]
        inv3 = inv.reshape(gs, sb, -1)
        w_inv = jnp.where(inv3, g_start[:, None, :] + cums, big).min(
            axis=(0, 1)
        )
        return c3, cums, mini_tot, lane_tot, w_inv

    def pos_slots(c3, cums, gs, sg):
        j = jnp.arange(m, dtype=jnp.int32)[None, None, :, None]
        pos = jnp.where(j < c3[:, :, None, :], cums[:, :, None, :] + j, sg)
        return pos.reshape(gs, sg, -1)

    def compact_sort(pos, syms3, gs, sg, cap_sym):
        packed = (pos << 8) | jnp.where(pos < sg, syms3.astype(jnp.int32), 0)
        if sg <= 127:
            packed = packed.astype(jnp.int16)
        sv = jnp.sort(packed, axis=1).astype(jnp.int32)
        cap_g = min(cap_sym, sg)
        return (sv[:, :cap_g, :] & 255).astype(jnp.uint8)

    def compact_msum(pos, syms3, gs, sg, cap_sym):
        cap_g = min(cap_sym, sg)
        c_col = jnp.arange(cap_g, dtype=jnp.int32)[None, None, :, None]
        oh = pos[:, :, None, :] == c_col  # [gs, sg, cap_g, lanes]
        return jnp.sum(
            jnp.where(oh, syms3[:, :, None, :].astype(jnp.int32), 0), axis=1
        ).astype(jnp.uint8)

    def compact_sel2(c3, cums, syms3, cap_sym):
        """sb=2 direct select-chain: slot c of the pair = byte0's slot c when
        c < c0, else byte1's slot c-c0 (unrolled static selects — no one-hot
        broadcast, no sort). Identical plane to msum at sb=2."""
        gs = c3.shape[0]
        s0 = [syms3[:, j, :].astype(jnp.int32) for j in range(m)]
        s1 = [syms3[:, m + j, :].astype(jnp.int32) for j in range(m)]
        c0, c1 = c3[:, 0, :], c3[:, 1, :]
        rows = []
        for c in range(min(cap_sym, 2 * m)):
            d = c - c0
            v1 = jnp.zeros_like(c0)
            for j in range(min(m, c + 1)):
                v1 = jnp.where(d == j, s1[j], v1)
            v1 = jnp.where(d < c1, v1, 0)
            v = jnp.where(c < c0, s0[c], v1) if c < m else v1
            rows.append(v.astype(jnp.uint8))
        return jnp.stack(rows, axis=1)  # [gs, cap_g, lanes]

    def pipeline_sel2():
        cap_sym = caps[2]

        @jax.jit
        def f(cols_, tbl_, tf_):
            vals, _x, u = run_fused_decode(
                cols_, tbl_, tf_, jnp.int32(n_real), m, mt, s_pad,
                packed=True, n_valid=jnp.int32(buf.size)
            )
            raw, syms = unpack_fused_rows(vals, m)
            counts, inv, syms = _expand_mask(raw, syms, jnp.int32(buf.size), m)
            k = counts.shape[0]
            gs, sg = k // 2, 2 * m
            c3, cums, mini_tot, lane_tot, w_inv = meta_hier(counts, inv, gs, 2)
            syms3 = syms.reshape(gs, sg, -1)
            plane = compact_sel2(c3, cums, syms3, cap_sym)
            if cap_sym > sg:
                plane = jnp.pad(plane, ((0, 0), (0, cap_sym - sg), (0, 0)))
            plane = plane.reshape(gs * cap_sym, -1)
            chk, tot = plane_checksum(plane, mini_tot, lane_tot, cap_sym,
                                      n_sym)
            return chk, tot + jnp.min(w_inv)

        return f

    def pipeline_dense():
        # No reordering at all: the plane IS the per-byte slots with dead
        # slots zeroed; mini_tot = per-byte counts (gs = K, cap = m).
        @jax.jit
        def f(cols_, tbl_, tf_):
            vals, _x, u = run_fused_decode(
                cols_, tbl_, tf_, jnp.int32(n_real), m, mt, s_pad,
                packed=True, n_valid=jnp.int32(buf.size)
            )
            raw, syms = unpack_fused_rows(vals, m)
            counts, inv, syms = _expand_mask(raw, syms, jnp.int32(buf.size), m)
            k = counts.shape[0]
            _c3, _cums, _mini, lane_tot, w_inv = meta_hier(counts, inv,
                                                           k // 8, 8)
            j = jnp.arange(m, dtype=jnp.int32)[None, :, None]
            pl = jnp.where(j < counts[:, None, :], syms, 0)
            plane = pl.reshape(k * m, -1)
            chk, tot = plane_checksum(plane, counts, lane_tot, m, n_sym)
            return chk, tot + jnp.min(w_inv)

        return f

    def pipeline_base():
        # Floor: fused + unpack + mask only (no compaction, no plane) — the
        # shared epilogue cost every variant pays.
        @jax.jit
        def f(cols_, tbl_, tf_):
            vals, _x, u = run_fused_decode(
                cols_, tbl_, tf_, jnp.int32(n_real), m, mt, s_pad,
                packed=True, n_valid=jnp.int32(buf.size)
            )
            raw, syms = unpack_fused_rows(vals, m)
            counts, inv, syms = _expand_mask(raw, syms, jnp.int32(buf.size), m)
            return (jnp.sum(counts) + jnp.sum(syms.astype(jnp.int32)),
                    jnp.sum(inv.astype(jnp.int32)))

        return f

    def pipeline(meta_fn, compact_fn, sb):
        cap_sym = caps[sb]

        @jax.jit
        def f(cols_, tbl_, tf_):
            vals, _x, u = run_fused_decode(
                cols_, tbl_, tf_, jnp.int32(n_real), m, mt, s_pad,
                packed=True, n_valid=jnp.int32(buf.size)
            )
            raw, syms = unpack_fused_rows(vals, m)
            counts, inv, syms = _expand_mask(raw, syms, jnp.int32(buf.size), m)
            k = counts.shape[0]
            gs, sg = k // sb, sb * m
            c3, cums, mini_tot, lane_tot, w_inv = meta_fn(counts, inv, gs, sb)
            pos = pos_slots(c3, cums, gs, sg)
            syms3 = syms.reshape(gs, sg, -1)
            plane = compact_fn(pos, syms3, gs, sg, cap_sym)
            cap_g = min(cap_sym, sg)
            if cap_sym > sg:
                plane = jnp.pad(plane, ((0, 0), (0, cap_sym - sg), (0, 0)))
            plane = plane.reshape(gs * cap_sym, -1)
            chk, tot = plane_checksum(plane, mini_tot, lane_tot, cap_sym,
                                      n_sym)
            return chk, tot + jnp.min(w_inv)

        return f

    variants = [
        ("cur", pipeline(meta_cur, compact_sort, SUB_BYTES)),
        ("msum2", pipeline(meta_hier, compact_msum, 2)),
        ("sel2", pipeline_sel2()),
        ("dense", pipeline_dense()),
        ("base", pipeline_base()),
    ]

    # compile + correctness anchor ("base" has no plane: skip its check)
    ref = None
    for name, fn in variants:
        t0 = time.perf_counter()
        chk, tot = (int(x) for x in fn(cols, tbl, t_fused))
        print(f"{name}: compiled+ran in {time.perf_counter()-t0:.1f}s "
              f"chk={chk & 0xFFFFFFFF}", file=sys.stderr, flush=True)
        if name == "base":
            continue
        if ref is None:
            exp = plane_checksum_host(
                np.frombuffer(data, np.uint8), 0,
                tot - (1 << 30) if tot >= (1 << 30) else tot, n_sym,
            )
            assert chk & 0xFFFFFFFF == exp & 0xFFFFFFFF, (name, chk, exp)
            ref = (chk, tot)
        else:
            assert (chk, tot) == ref, (name, (chk, tot), ref)

    out = {"m": m, "caps": {str(k): v for k, v in caps.items()}}
    for rnd in range(3):
        for name, fn in variants:
            def burst(n):
                rs = [fn(cols, tbl, t_fused) for _ in range(n)]
                return sum(int(a) + int(b) for a, b in rs[-1:])

            t0 = time.perf_counter()
            burst(1)
            t1 = time.perf_counter()
            burst(13)
            t2 = time.perf_counter()
            per = ((t2 - t1) - (t1 - t0)) / 12
            key = name + "_ms"
            out[key] = min(out.get(key, 1e9), round(per * 1e3, 2))
        print(json.dumps(out), file=sys.stderr, flush=True)
    print(json.dumps(out), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
