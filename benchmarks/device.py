#!/usr/bin/env python3
"""On-chip kernel benchmark: Pallas vs XLA-scan forms of both hot ops, with
roofline position (%MXU peak) for each.

Through this environment's TPU tunnel a single device call carries ~60 ms of
dispatch+readback latency, so besides whole-call times this reports the
*marginal* per-iteration time of each kernel — N dependent iterations chained
inside one jit (loop-carried data dependencies defeat CSE/hoisting), timings
differenced. That is the pod-representative compute number. Also asserts
on-chip bit-equality between the Pallas and XLA forms. Run attended
(fresh-kernel Mosaic compiles can wedge the device — CLAUDE.md):

    timeout 550 python -u benchmarks/device.py [--mb 5.2]
"""

from __future__ import annotations

import argparse
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

V5E_PEAK_MACS = 98.5e12  # 197 TFLOP/s bf16
V5E_PEAK_MACS_I8 = 197e12  # int8 runs the MXU at 2x the bf16 rate


def best_of(fn, iters=4):
    fn()
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mb", type=float, default=5.2)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from entreepy_tpu.format import build_code_table, compress_host, histogram, parse_header
    from entreepy_tpu.format.fsm8 import build_byte_fsm
    from entreepy_tpu.ops.bitpack import code_table_cols, pack_blocks_jit
    from entreepy_tpu.ops.decode8 import (
        _pad_lanes, _table_T_bf16, bytes_to_cols, expand_states, fsm8_decode,
    )
    from entreepy_tpu.ops.pallas_fsm8 import emit_pass_pallas8, fsm8_decode_pallas
    from entreepy_tpu.ops.pallas_pack import pack_blocks_pallas
    from entreepy_tpu.utils.stitch import split_blocks

    if jax.default_backend() not in ("tpu", "axon"):
        print(f"error: needs a TPU backend, have {jax.default_backend()}", file=sys.stderr)
        return 1

    src = (ROOT / "tests/data/a_midsummer_nights_dream.txt").read_bytes()
    data = (src * (-(-int(args.mb * 1e6) // len(src))))[: int(args.mb * 1e6)]
    mb = len(data) / 1e6
    print(f"backend={jax.default_backend()} corpus={len(data)}B", file=sys.stderr, flush=True)
    results = {"corpus_MB": mb}

    # ---------------------------------------------------------- encode ----
    from entreepy_tpu.ops.encode import DEFAULT_BLOCK_BYTES, _pad_blocks

    arr = np.frombuffer(data, np.uint8)
    table = build_code_table(histogram(arr))
    blocks, valid = split_blocks(arr, DEFAULT_BLOCK_BYTES)
    n = blocks.shape[0]
    nb = _pad_blocks(n)  # the shipped encode path's lane padding
    if nb != n:
        blocks = np.concatenate(
            [blocks, np.zeros((nb - n, DEFAULT_BLOCK_BYTES), np.uint8)]
        )
        valid = np.concatenate([valid, np.zeros(nb - n, np.int32)])
    b, v = jnp.asarray(blocks), jnp.asarray(valid)
    ct = jnp.asarray(code_table_cols(table.codes, table.lengths), jnp.bfloat16)
    int(jnp.sum(v))  # stage

    def enc(fn):
        def run():
            w, e, a, nn = fn(b, v, ct)
            return int(jnp.sum(e.astype(jnp.int32)))
        return run

    results["pack_scan_call_ms"] = round(best_of(enc(pack_blocks_jit)) * 1e3, 1)
    results["pack_pallas_call_ms"] = round(best_of(enc(pack_blocks_pallas)) * 1e3, 1)

    # marginal per-iteration pack time: loop-carried barrier ties each
    # iteration's input to the previous output, and the accumulator consumes
    # every iteration's result so nothing is hoisted or dead-code-eliminated
    @partial(jax.jit, static_argnames=("n",))
    def pack_n(b_, v_, ct_, n):
        def body(_, carry):
            bb, acc = carry
            w, e, a, nn = pack_blocks_pallas(bb, v_, ct_)
            bb2, a2 = jax.lax.optimization_barrier((bb, a))
            return bb2, acc + jnp.sum(a2 & 1)
        _, acc = jax.lax.fori_loop(0, n, body, (b_, jnp.int32(0)))
        return acc

    t1 = best_of(lambda: int(pack_n(b, v, ct, 1)))
    t41 = best_of(lambda: int(pack_n(b, v, ct, 41)))
    pack_pass = max((t41 - t1) / 40, 1e-9)
    results["pack_pallas_pass_ms"] = round(pack_pass * 1e3, 2)
    results["pack_pallas_pass_MBps"] = round(mb / pack_pass / 1e3 * 1e3, 1)
    results["pack_mfu_pct"] = round(len(data) * 256 * 5 / pack_pass / V5E_PEAK_MACS * 100, 2)

    # on-chip bit-equality of the two forms
    w1, e1, a1, n1 = pack_blocks_jit(b, v, ct)
    w2, e2, a2, n2 = pack_blocks_pallas(b, v, ct)
    e1n = np.asarray(e1)
    assert np.array_equal(e1n, np.asarray(e2))
    assert np.array_equal(np.asarray(w1)[e1n], np.asarray(w2)[e1n])
    assert np.array_equal(np.asarray(a1), np.asarray(a2))
    assert np.array_equal(np.asarray(n1), np.asarray(n2))

    # ------------- end-to-end device encode (bytes -> payload plane) ------
    # One jit: Pallas pack -> SINGLE-stage per-subgroup sort compaction
    # (encode_blocks_device pod default, ENTREEPY_ENC_COMPACT=plane) + a
    # position-weighted live-prefix checksum readback. Output = the
    # compressed words, still on device.
    from entreepy_tpu.ops.bitpack import (
        compact_payload_plane, grouped_counts_plane, plane_cap_g,
    )

    cnts_g = np.asarray(grouped_counts_plane(e2))
    cap = plane_cap_g(int(cnts_g.max(initial=1)), w2.shape[1])

    @jax.jit
    def e2e_enc(b_, v_, ct_):
        w, e, a, nn = pack_blocks_pallas(b_, v_, ct_)
        plane, counts_g, bl = compact_payload_plane(w, e, a, nn, cap)
        lanes_, gc = plane.shape
        g = counts_g.shape[1]
        fi = jax.lax.bitcast_convert_type(plane, jnp.int32)
        pay = fi[:, : g * cap].reshape(lanes_, g, cap)
        jj = jnp.arange(cap, dtype=jnp.int32)[None, None, :]
        live = (jj < counts_g[:, :, None]).astype(jnp.int32)
        idx = jnp.arange(g * cap, dtype=jnp.int32).reshape(1, g, cap)
        acc_col = fi[:, -1] ^ (g * cap)  # final partial word: always live
        return jnp.sum((pay ^ idx) * live) + jnp.sum(acc_col), jnp.sum(bl)

    # correctness: the device plane's live prefixes must equal the host-
    # compacted words (position-weighted within each subgroup row)
    from entreepy_tpu.ops.bitpack import (
        assemble_plane_payload, assemble_payloads,
    )

    chk_d, bits_d = (int(x) for x in e2e_enc(b, v, ct))
    plane_h, cg_h, bl_p = compact_payload_plane(w2, e2, a2, n2, cap)
    flat_h, nw_p = assemble_plane_payload(np.asarray(plane_h), np.asarray(cg_h))
    pay_h, bl_h = assemble_payloads(
        np.asarray(w2), np.asarray(e2), np.asarray(a2), np.asarray(n2)
    )
    assert bits_d == int(np.sum(bl_h)), (bits_d, int(np.sum(bl_h)))
    # independent anchor: plane live prefixes == the host-compacted stream
    nw_h = (np.asarray(bl_h) - np.asarray(n2)) // 32 + 1
    exp_flat = np.concatenate(
        [pay_h[l, : nw_h[l]] for l in range(pay_h.shape[0])]
    )
    assert np.array_equal(nw_p, nw_h), "plane word counts"
    assert np.array_equal(flat_h.astype(np.uint32), exp_flat.astype(np.uint32)), (
        "plane payload != host-compacted stream"
    )
    # per-(lane, subgroup) position-weighted expected checksum
    cg_np = np.asarray(cg_h)
    lanes_e, g_e = cg_np.shape
    pl_np = np.asarray(plane_h).view(np.int32).reshape(lanes_e, -1)
    payv = pl_np[:, : g_e * cap].reshape(lanes_e, g_e, cap).astype(np.int64)
    jjn = np.arange(cap)[None, None, :]
    liven = jjn < cg_np[:, :, None]
    idxn = np.arange(g_e * cap).reshape(1, g_e, cap)
    exp_chk = int(np.sum((payv ^ idxn) * liven)) + int(
        np.sum(pl_np[:, -1].astype(np.int64) ^ (g_e * cap))
    )
    assert chk_d & 0xFFFFFFFF == exp_chk & 0xFFFFFFFF, (
        "device e2e encode checksum"
    )

    def enc_burst(n):
        outs = [e2e_enc(b, v, ct) for _ in range(n)]
        return sum(int(a) + int(b_) for a, b_ in outs[-1:])

    t1e = best_of(lambda: enc_burst(1))
    t13e = best_of(lambda: enc_burst(13))
    enc_e2e = max((t13e - t1e) / 12, 1e-9)
    results["encode_e2e_call_ms"] = round(t1e * 1e3, 1)
    results["encode_e2e_ms"] = round(enc_e2e * 1e3, 2)
    results["encode_e2e_MBps"] = round(mb / enc_e2e, 1)

    # ---------------------------------------------------------- decode ----
    et = compress_host(data)
    hdr = parse_header(et)
    fsm = build_byte_fsm(hdr.table)
    buf = np.frombuffer(et, np.uint8)[hdr.body_start:]
    chunk = 512
    n_real = max(1, -(-buf.size // chunk))
    lanes = _pad_lanes(n_real)
    padded = np.zeros(lanes * chunk, np.uint8)
    padded[: buf.size] = buf
    cols = bytes_to_cols(padded, lanes, chunk)
    tbl = _table_T_bf16(fsm)
    int(jnp.sum(cols))

    def dec(fn):
        def run():
            s, u = fn(cols, tbl, jnp.int32(n_real))
            assert not bool(u), "chunk self-sync did not converge"
            return int(jnp.sum(s.astype(jnp.int32)))
        return run

    results["decode_scan_call_ms"] = round(best_of(dec(fsm8_decode)) * 1e3, 1)
    results["decode_pallas_call_ms"] = round(best_of(dec(fsm8_decode_pallas)) * 1e3, 1)

    @partial(jax.jit, static_argnames=("n",))
    def emit_n(xs_, tbl_, entries, n):
        def body(_, e):
            _p, exits = emit_pass_pallas8(xs_, tbl_, e)
            return jnp.concatenate([jnp.zeros(1, jnp.int32), exits[:-1]])
        return jax.lax.fori_loop(0, n, body, entries)

    xs = cols.T
    e0 = jnp.zeros(lanes, jnp.int32)
    # 40-pass spread: tunnel-overhead variance is several ms, so a 10-pass
    # difference once read 0.64 ms/pass on a kernel whose MAC count lower-
    # bounds it at 1.2 (impossible >150% MFU); 40 passes swamp the noise.
    t1 = best_of(lambda: int(jnp.sum(emit_n(xs, tbl, e0, 1))))
    t41 = best_of(lambda: int(jnp.sum(emit_n(xs, tbl, e0, 41))))
    dec_pass = max((t41 - t1) / 40, 1e-9)
    macs = buf.size * fsm.width * 256
    results["decode_pallas_pass_ms"] = round(dec_pass * 1e3, 2)
    results["decode_pallas_pass_MBps"] = round(mb / dec_pass / 1e3 * 1e3, 1)
    from entreepy_tpu.ops.pallas_fsm8 import TBL_INT8

    dec_peak = V5E_PEAK_MACS_I8 if TBL_INT8 else V5E_PEAK_MACS
    results["decode_table_dtype"] = "int8" if TBL_INT8 else "bf16"
    results["decode_mfu_pct"] = round(macs / dec_pass / dec_peak * 100, 2)
    results["decode_hbm_GBps"] = round(buf.size * 5 / dec_pass / 1e9, 1)  # in i32 + out u8

    # bit-equality of the two decode forms, and against the source
    s1, _ = fsm8_decode(cols, tbl, jnp.int32(n_real))
    s2, _ = fsm8_decode_pallas(cols, tbl, jnp.int32(n_real))
    assert np.array_equal(np.asarray(s1), np.asarray(s2))
    out = expand_states(np.asarray(s2), buf, fsm, hdr.body_len)
    assert out.tobytes() == data
    results["bit_equal"] = True

    # ---------------- end-to-end device decode (compressed -> bytes) ------
    # One jit: ONE-PASS fused FSM+emit kernel -> packed one-word rows ->
    # device compaction (decode_body_device_full pod defaults). The output
    # is verified by an exact position-weighted checksum readback (a value-
    # dependent fetch — through the tunnel a 5 MB output fetch would swamp
    # compute; correctness is separately pinned by tests).
    from entreepy_tpu.ops.decode8 import (
        build_fused, compact_symbols_dense, plane_checksum,
        plane_checksum_host, run_fused_decode,
    )

    t_fused, m, mt, s_pad = build_fused(fsm)
    N_SYM = len(data)  # checksum only real output positions (the final body
    # byte's zero-padding bits can emit one trailing extra symbol, trimmed
    # on the real decode path)

    @jax.jit
    def e2e(cols_, tbl_, tf_):
        vals, _x, u = run_fused_decode(cols_, tbl_, tf_, jnp.int32(n_real),
                                       m, mt, s_pad, packed=True,
                                       n_valid=jnp.int32(buf.size))
        plane, mt_, lt, wi = compact_symbols_dense(vals, m)
        return plane_checksum(plane, mt_, lt, m, N_SYM)

    def run_e2e():
        a, b_ = e2e(cols, tbl, t_fused)
        return int(a), int(b_)

    (chk, tot), _t = run_e2e(), None
    assert tot >= len(data), (tot, len(data))
    exp = plane_checksum_host(np.frombuffer(data, np.uint8), 0, tot, len(data))
    assert chk & 0xFFFFFFFF == exp & 0xFFFFFFFF, \
        "device e2e output checksum mismatch"

    # Marginal e2e time by pipelining N independent async launches and
    # syncing once: per-launch tunnel overhead (~30-40 ms on complex
    # programs) overlaps device compute, so the differenced time is the
    # pod-representative chip number (chaining inside one jit would be
    # cleaner but its compile blows the probe budget).
    def e2e_burst(n):
        outs = [e2e(cols, tbl, t_fused) for _ in range(n)]
        return sum(int(a) + int(b) for a, b in outs[-1:])

    t1 = best_of(lambda: e2e_burst(1))
    t13 = best_of(lambda: e2e_burst(13))
    e2e_s = max((t13 - t1) / 12, 1e-9)
    results["decode_e2e_call_ms"] = round(best_of(run_e2e) * 1e3, 1)
    results["decode_e2e_ms"] = round(e2e_s * 1e3, 2)
    results["decode_e2e_MBps"] = round(mb / e2e_s, 1)

    print(json.dumps(results))
    return 0


if __name__ == "__main__":
    sys.exit(main())
