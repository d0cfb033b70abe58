"""Byte-FSM Pallas kernels must match the XLA scan decoder exactly.

Interpreter mode on the virtual CPU backend (tiny shapes). Real-TPU
compilation is exercised by the bench's device probe (benchmarks/device.py).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from entreepy_tpu.format import compress_host, parse_header
from entreepy_tpu.format.fsm8 import build_byte_fsm
from entreepy_tpu.ops.decode8 import _table_T_bf16, bytes_to_cols, fsm8_decode
from entreepy_tpu.ops.pallas_fsm8 import fsm8_decode_pallas


def _prep(data: bytes, chunk_bytes: int = 32):
    et = compress_host(data)
    hdr = parse_header(et)
    fsm = build_byte_fsm(hdr.table)
    buf = np.frombuffer(et, np.uint8)[hdr.body_start :]
    n_real = max(1, -(-buf.size // chunk_bytes))
    lanes = max(8, 1 << (n_real - 1).bit_length())
    padded = np.zeros(lanes * chunk_bytes, np.uint8)
    padded[: buf.size] = buf
    return bytes_to_cols(padded, lanes, chunk_bytes), fsm, n_real


@pytest.mark.parametrize("name", ["tiny_text", "macbeth"])
def test_pallas8_matches_scan(name, request):
    cols, fsm, n_real = _prep(request.getfixturevalue(name))
    tbl = _table_T_bf16(fsm)
    s1, u1 = fsm8_decode(cols, tbl, jnp.int32(n_real))
    s2, u2 = fsm8_decode_pallas(cols, tbl, jnp.int32(n_real), interpret=True)
    assert bool(u1) == bool(u2) is False
    assert np.array_equal(np.asarray(s1), np.asarray(s2))


def test_pallas8_multi_k_tiles(midsummer):
    # k spanning several k-tiles exercises the state scratch carry.
    cols, fsm, n_real = _prep(midsummer[:40000], chunk_bytes=512)
    tbl = _table_T_bf16(fsm)
    s1, u1 = fsm8_decode(cols, tbl, jnp.int32(n_real))
    s2, u2 = fsm8_decode_pallas(cols, tbl, jnp.int32(n_real), interpret=True)
    assert bool(u1) == bool(u2) is False
    assert np.array_equal(np.asarray(s1), np.asarray(s2))


def test_lane_tile_constants_match():
    from entreepy_tpu.ops import decode8, pallas_fsm8

    assert decode8.LANE_TILE == pallas_fsm8.LANE_TILE


def test_fused_pallas_interpret_matches_scan(midsummer):
    """The one-pass Pallas kernel (interpret mode) must equal the XLA scan
    twin bit-for-bit, including exits, on a multi-k-tile shape."""
    from entreepy_tpu.ops.decode8 import (
        _fused_scan_pass, build_fused, fsm8_decode_fused,
    )
    from entreepy_tpu.ops.pallas_fsm8 import (
        fsm8_decode_fused_pallas, fused_pass_pallas8,
    )

    cols, fsm, n_real = _prep(midsummer[:40000], chunk_bytes=16)
    t_fused, m, mt, s = build_fused(fsm)
    xs = cols.T
    entries = jnp.zeros(cols.shape[0], jnp.int32)
    raw, syms, exits = _fused_scan_pass(xs, t_fused, entries, m, mt, s)
    vals, exits_p = fused_pass_pallas8(xs, t_fused, entries, m, mt, s,
                                       interpret=True)
    assert np.array_equal(np.asarray(exits), np.asarray(exits_p))
    assert np.array_equal(np.asarray(raw), np.asarray(vals[:, 0, :]))
    assert np.array_equal(
        np.asarray(syms), np.asarray(vals[:, 1:, :]).astype(np.uint8)
    )

    v1, x1, u1 = fsm8_decode_fused(cols, _table_T_bf16(fsm), t_fused,
                                   jnp.int32(n_real), m, mt, s)
    v2, x2, u2 = fsm8_decode_fused_pallas(cols, _table_T_bf16(fsm), t_fused,
                                          jnp.int32(n_real), m, mt, s,
                                          interpret=True)
    assert bool(u1) == bool(u2) is False
    assert np.array_equal(np.asarray(v1), np.asarray(v2))
    assert np.array_equal(np.asarray(x1), np.asarray(x2))

    # packed one-word rows (masked in-kernel): Pallas interpret == scan
    # twin, bit for bit — n_valid short of the padded size exercises the
    # in-kernel padding mask on both sides
    nv = jnp.int32(cols.size - 5)
    p1, _, pu1 = fsm8_decode_fused(cols, _table_T_bf16(fsm), t_fused,
                                   jnp.int32(n_real), m, mt, s, packed=True,
                                   n_valid=nv)
    p2, _, pu2 = fsm8_decode_fused_pallas(cols, _table_T_bf16(fsm), t_fused,
                                          jnp.int32(n_real), m, mt, s,
                                          packed=True, n_valid=nv,
                                          interpret=True)
    assert bool(pu1) == bool(pu2) is False
    assert np.array_equal(np.asarray(p1), np.asarray(p2))


def test_compact_kernel_matches_sort_path():
    """The doubling-shift compaction kernel (ops/pallas_compact, interpret
    mode) must be bit-identical to compact_payload_plane's XLA sort path:
    same live prefixes, same zeroed dead slots, same counts — including
    empty, partially-filled, and over-cap subgroups (the kernel truncates
    exactly like the sort's ``[:cap_g]`` slice)."""
    import jax
    import jax.numpy as jnp

    from entreepy_tpu.ops.pallas_compact import compact_rows_pallas

    rng = np.random.default_rng(7)
    lanes, steps, sub, cap = 16, 512, 64, 16
    g = steps // sub
    words = rng.integers(0, 1 << 32, (lanes, steps), dtype=np.uint64).astype(
        np.uint32
    )
    emitted = rng.random((lanes, steps)) < 0.2
    emitted[0] = False            # all-dead lane
    emitted[1] = True             # fully dense lane (count > cap: truncation)
    emitted[2, :sub] = False      # leading empty subgroup

    # sort path (the CPU-mesh twin inside compact_payload_plane)
    w3 = words.view(np.int32).reshape(lanes, g, sub)
    e3 = emitted.reshape(lanes, g, sub)
    cum = np.cumsum(e3, axis=2).astype(np.int32)
    key = np.where(e3, cum - 1, sub + np.arange(sub, dtype=np.int32))
    order = np.argsort(key, axis=2, kind="stable")
    vs = np.take_along_axis(np.where(e3, w3, 0), order, axis=2)
    pay_sort = vs[:, :, :cap]
    counts_sort = cum[:, :, -1]

    wk = jnp.asarray(words.view(np.int32).T)
    ek = jnp.asarray(emitted.astype(np.int32).T)
    plane_k, counts_k = compact_rows_pallas(wk, ek, sub, cap, interpret=True)
    pay_kernel = np.asarray(plane_k).reshape(g, cap, lanes).transpose(2, 0, 1)
    assert np.array_equal(pay_kernel, pay_sort)
    assert np.array_equal(np.asarray(counts_k).T, counts_sort)


def test_decode_compact_kernel_matches_sort_formulation():
    """compact_symbols_device's doubling-shift route (non-power-of-two
    subgroups: sg = sub_bytes*m) must emit the sort formulation's exact
    plane: live symbols packed per subgroup in stream order, zeroed dead
    slots, truncation at cap."""
    import jax.numpy as jnp

    from entreepy_tpu.ops.pallas_compact import compact_rows_pallas

    rng = np.random.default_rng(11)
    k, m, lanes, sb = 64, 3, 16, 8
    sg = sb * m  # 24 — not a power of two
    gs = k // sb
    counts = rng.integers(0, m + 1, (k, lanes)).astype(np.int32)
    counts[:, 0] = 0             # all-dead lane
    counts[:, 1] = m             # fully dense lane
    syms = rng.integers(0, 256, (k, m, lanes)).astype(np.uint8)
    cap = 16  # < sg: exercises truncation

    # sort formulation (the CPU twin inside compact_symbols_device)
    c3 = counts.reshape(gs, sb, lanes)
    cums = np.cumsum(c3, axis=1) - c3
    j = np.arange(m, dtype=np.int32)[None, None, :, None]
    pos = np.where(j < c3[:, :, None, :], cums[:, :, None, :] + j, sg)
    pos = pos.reshape(gs, sg, lanes)
    packed = (pos << 8) | np.where(
        pos < sg, syms.reshape(gs, sg, lanes).astype(np.int32), 0
    )
    sv = np.sort(packed, axis=1)
    plane_sort = (sv[:, :cap, :] & 255).astype(np.uint8)

    live = (
        (np.arange(m, dtype=np.int32)[None, :, None] < counts[:, None, :])
        .astype(np.int32).reshape(k * m, lanes)
    )
    plane_k, _ = compact_rows_pallas(
        jnp.asarray(syms.reshape(k * m, lanes).astype(np.int32)),
        jnp.asarray(live), sg, cap, interpret=True,
    )
    got = np.asarray(plane_k).reshape(gs, cap, lanes).astype(np.uint8)
    assert np.array_equal(got, plane_sort)


def test_compact_tile_helpers_invariants():
    """_pad_blocks (encode lane padding) and _lane_tile (kernel VMEM
    ladder) keep the kernel's divisibility contract for every lane count
    the pipelines produce."""
    from entreepy_tpu.ops.encode import _pad_blocks
    from entreepy_tpu.ops.pallas_compact import _lane_tile, compact_tileable
    from entreepy_tpu.ops.pallas_pack import LANE_TILE

    for n in (1, 7, 1024, 1025, 5079, 65536):
        p = _pad_blocks(n)
        assert p >= max(n, LANE_TILE) and p % LANE_TILE == 0
        assert p - n < LANE_TILE or p == LANE_TILE  # waste bounded at 1 tile
        # every padded lane count tiles for every ladder rung
        for sub in (96, 256, 1536):
            assert p % _lane_tile(p, sub) == 0
    # the ladder shrinks with sub and the tileable gate accepts the
    # pipelines' real shapes (encode: 1024-B blocks / sub 256 / cap 64;
    # decode fetch: sg = 32*3 = 96 / cap 64; per-lane: sg 1536 / cap 896)
    assert _lane_tile(4096, 256) == 512
    assert _lane_tile(4096, 1536) == 128
    assert compact_tileable(5120, 1024, 256, 64)
    assert compact_tileable(6144, 1536, 96, 64)
    assert compact_tileable(6144, 1536, 1536, 896)
    assert not compact_tileable(5120, 1024, 256, 60)   # cap off the 8-grid
    assert not compact_tileable(5120, 1000, 256, 64)   # sub doesn't tile k


def test_plane_dispatch_glue_matches_sort_twin():
    """compact_payload_plane's FULL kernel branch (interpret mode: the
    transposes, the counts reorientation, the acc column, bit_lens) must be
    bit-identical to its sort twin on the same inputs — pins the dispatch
    glue that otherwise only runs on real TPUs."""
    import jax.numpy as jnp

    from entreepy_tpu.ops.bitpack import compact_payload_plane

    rng = np.random.default_rng(13)
    lanes, steps, cap = 16, 512, 16  # plane_sub_for(512) = 256 -> g = 2
    words = jnp.asarray(
        rng.integers(0, 1 << 32, (lanes, steps), dtype=np.uint64).astype(np.uint32)
    )
    emitted = jnp.asarray(rng.random((lanes, steps)) < 0.05)
    acc = jnp.asarray(
        rng.integers(0, 1 << 32, lanes, dtype=np.uint64).astype(np.uint32)
    )
    nbits = jnp.asarray(rng.integers(0, 32, lanes).astype(np.int32))

    p_sort, c_sort, bl_sort = compact_payload_plane(words, emitted, acc, nbits, cap)
    p_kern, c_kern, bl_kern = compact_payload_plane(
        words, emitted, acc, nbits, cap, interpret=True
    )
    assert np.array_equal(np.asarray(p_sort), np.asarray(p_kern))
    assert np.array_equal(np.asarray(c_sort), np.asarray(c_kern))
    assert np.array_equal(np.asarray(bl_sort), np.asarray(bl_kern))


def test_symbols_dispatch_glue_matches_sort_twin():
    """compact_symbols_device's FULL kernel branch (interpret mode) must be
    bit-identical to its sort twin: plane, mini totals, lane totals,
    first-invalid offsets — including cap_sym > sg padding."""
    import jax.numpy as jnp

    from entreepy_tpu.ops.decode8 import compact_symbols_device

    rng = np.random.default_rng(17)
    # m=3 is the text-corpus shape; m=8 is the degenerate 2-symbol-table
    # shape (1-bit codes -> 8 symbols per byte)
    for k, m, lanes in ((64, 3, 16), (32, 8, 16)):
        counts = jnp.asarray(rng.integers(0, m + 1, (k, lanes)).astype(np.int32))
        inv = jnp.asarray(rng.random((k, lanes)) < 0.02)
        syms = jnp.asarray(rng.integers(0, 256, (k, m, lanes)).astype(np.uint8))
        for cap_sym in (16, 32):
            outs_s = compact_symbols_device(counts, inv, syms, m, cap_sym,
                                            sub=8)
            outs_k = compact_symbols_device(counts, inv, syms, m, cap_sym,
                                            sub=8, interpret=True)
            for a, b in zip(outs_s, outs_k):
                assert np.array_equal(np.asarray(a), np.asarray(b))
