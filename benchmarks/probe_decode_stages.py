#!/usr/bin/env python3
"""Stage breakdown of the end-to-end device decode pipeline (one-pass).

Times cumulative prefixes of the e2e program (fused decode -> +compaction
-> +checksum) as burst-differenced marginals, so the delta between
consecutive rows is that stage's cost on chip. Mirrors
benchmarks/device.py's e2e composition exactly (decode_body_device_full
pod defaults: onepass + packed rows). ENTREEPY_EXPAND=split probes the
legacy two-pass composition instead.

    timeout 1200 python -u benchmarks/probe_decode_stages.py
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
        _pad_lanes, _table_T_bf16, build_expand, build_fused, bytes_to_cols,
        compact_symbols_dense, compact_symbols_device, plane_checksum,
        run_expand, run_fused_decode, sym_cap,
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
    mode = os.environ.get("ENTREEPY_EXPAND", "onepass")

    def checksum(plane, mt_, lt, cap_sym):
        return plane_checksum(plane, mt_, lt, cap_sym, n_sym)

    if mode == "onepass":
        t_fused, m, mt, s_pad = build_fused(fsm)
        nv = jnp.int32(buf.size)

        @jax.jit
        def p_fused(cols_, tbl_, tf_):
            vals, _x, u = run_fused_decode(cols_, tbl_, tf_,
                                           jnp.int32(n_real), m, mt, s_pad,
                                           packed=True, n_valid=nv)
            return jnp.sum(vals), u

        @jax.jit
        def p_compact(cols_, tbl_, tf_):
            vals, _x, u = run_fused_decode(cols_, tbl_, tf_,
                                           jnp.int32(n_real), m, mt, s_pad,
                                           packed=True, n_valid=nv)
            plane, mt_, lt, wi = compact_symbols_dense(vals, m)
            return jnp.sum(plane.astype(jnp.int32)) + jnp.sum(lt), u

        @jax.jit
        def p_full(cols_, tbl_, tf_):
            vals, _x, u = run_fused_decode(cols_, tbl_, tf_,
                                           jnp.int32(n_real), m, mt, s_pad,
                                           packed=True, n_valid=nv)
            plane, mt_, lt, wi = compact_symbols_dense(vals, m)
            return checksum(plane, mt_, lt, m)

        stages = [("fused", p_fused), ("compact", p_compact), ("full", p_full)]
        extra = t_fused
    else:
        from entreepy_tpu.ops.pallas_fsm8 import fsm8_decode_pallas

        texp, m, mt = build_expand(fsm)
        s0, _ = fsm8_decode_pallas(cols, tbl, jnp.int32(n_real))
        counts0, _, _ = run_expand(cols, s0, texp, jnp.int32(buf.size), m, mt)
        cap_sym = sym_cap(counts0, m)

        @jax.jit
        def p_fsm(cols_, tbl_, texp_):
            s, u = fsm8_decode_pallas(cols_, tbl_, jnp.int32(n_real))
            return jnp.sum(s.astype(jnp.int32)), u

        @jax.jit
        def p_expand(cols_, tbl_, texp_):
            s, u = fsm8_decode_pallas(cols_, tbl_, jnp.int32(n_real))
            c, iv, sy = run_expand(cols_, s, texp_, jnp.int32(buf.size), m, mt)
            return jnp.sum(c) + jnp.sum(sy.astype(jnp.int32)), u

        @jax.jit
        def p_compact(cols_, tbl_, texp_):
            s, u = fsm8_decode_pallas(cols_, tbl_, jnp.int32(n_real))
            c, iv, sy = run_expand(cols_, s, texp_, jnp.int32(buf.size), m, mt)
            plane, mt_, lt, wi = compact_symbols_device(c, iv, sy, m, cap_sym)
            return jnp.sum(plane.astype(jnp.int32)) + jnp.sum(lt), u

        @jax.jit
        def p_full(cols_, tbl_, texp_):
            s, u = fsm8_decode_pallas(cols_, tbl_, jnp.int32(n_real))
            c, iv, sy = run_expand(cols_, s, texp_, jnp.int32(buf.size), m, mt)
            plane, mt_, lt, wi = compact_symbols_device(c, iv, sy, m, cap_sym)
            return checksum(plane, mt_, lt, cap_sym)

        stages = [("fsm", p_fsm), ("expand", p_expand),
                  ("compact", p_compact), ("full", p_full)]
        extra = texp

    def bench(fn):
        def burst(n):
            outs = [fn(cols, tbl, extra) for _ in range(n)]
            return sum(int(a) + int(b) for a, b in outs[-1:])

        burst(1)  # compile + warm
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            burst(1)
            t1 = time.perf_counter()
            burst(13)
            t2 = time.perf_counter()
            best = min(best, ((t2 - t1) - (t1 - t0)) / 12)
        return best

    only = set(
        s for s in os.environ.get("ENTREEPY_PROBE_STAGES", "").split(",") if s
    )
    from entreepy_tpu.ops.decode8 import SUB_BYTES

    out = {
        "mode": mode,
        "sub_bytes": SUB_BYTES,  # the live default, not a re-parse of the env
    }
    prev = 0.0
    for name, fn in stages:
        if only and name not in only:
            continue
        t = bench(fn)
        out[name + "_ms"] = round(t * 1e3, 2)
        out[name + "_delta_ms"] = round((t - prev) * 1e3, 2)
        prev = t
        print(json.dumps(out), file=sys.stderr, flush=True)
    print(json.dumps(out), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
