"""Byte-granularity FSM decoder (gen 2): table semantics, scan path, and the
corruption invariants the nibble decoder lacked."""

import numpy as np
import pytest

from entreepy_tpu.format import (
    build_code_table,
    build_decode_lut,
    compress_host,
    histogram,
    pack_body_host,
    parse_header,
    unpack_body_host,
)
from entreepy_tpu.format.fsm8 import build_byte_fsm, fsm8_decode_host
from entreepy_tpu.ops.decode8 import (
    decode_body_device,
    decompress_device,
    expand_states,
)


def _table(data: bytes):
    return build_code_table(histogram(np.frombuffer(data, np.uint8)))


def test_byte_fsm_matches_serial_lut(macbeth):
    """The serial byte-FSM walk must reproduce the LUT decode exactly."""
    arr = np.frombuffer(macbeth, np.uint8)
    table = _table(macbeth)
    body, _ = pack_body_host(arr, table)
    fsm = build_byte_fsm(table)
    syms, _ = fsm8_decode_host(fsm, np.frombuffer(body, np.uint8))
    assert bytes(syms[: arr.size]) == macbeth


def test_byte_fsm_state_width():
    fsm = build_byte_fsm(_table(b"abracadabra"))
    assert fsm.width == 128  # tiny tree -> narrow table
    assert fsm.counts.max() <= 8
    assert (fsm.next_state < max(fsm.n_states, 1)).all()


def test_byte_fsm_all_256_symbols():
    data = bytes(range(256)) * 4
    table = _table(data)
    fsm = build_byte_fsm(table)
    body, _ = pack_body_host(np.frombuffer(data, np.uint8), table)
    syms, _ = fsm8_decode_host(fsm, np.frombuffer(body, np.uint8))
    assert bytes(syms[: len(data)]) == data


@pytest.mark.parametrize("name", ["tiny_text", "macbeth", "midsummer"])
def test_decompress_corpora(name, request):
    data = request.getfixturevalue(name)
    assert decompress_device(compress_host(data)) == data


@pytest.mark.parametrize("chunk_bytes", [16, 64, 512])
def test_chunk_size_invariance(midsummer, chunk_bytes):
    # Output must not depend on the chunking; small chunks force many
    # sync passes and cross-chunk codeword straddles.
    assert (
        decompress_device(compress_host(midsummer), chunk_bytes=chunk_bytes)
        == midsummer
    )


def test_decode_random_bytes():
    rng = np.random.default_rng(2)
    for size in (2, 100, 4097, 50000):
        data = rng.integers(0, 256, size=size, dtype=np.uint8).tobytes()
        assert decompress_device(compress_host(data), chunk_bytes=64) == data


def test_decode_skewed_codes():
    data = (b"a" * 4000 + b"b" * 700 + b"c" * 80 + b"d" * 9 + b"e" * 3 + b"fg") * 5
    assert decompress_device(compress_host(data), chunk_bytes=32) == data


def test_decode_run_heavy():
    data = b"x" * 30000 + b"yz" * 400 + b"x" * 9999
    assert decompress_device(compress_host(data), chunk_bytes=64) == data


def test_decode_nul_symbols():
    data = b"\x00" * 500 + bytes(range(1, 40)) * 10 + b"\x00" * 3
    assert decompress_device(compress_host(data)) == data


def test_truncated_body_raises(macbeth):
    et = compress_host(macbeth)
    hdr = parse_header(et)
    with pytest.raises(ValueError, match="ended early"):
        decode_body_device(
            et[hdr.body_start : hdr.body_start + 10], hdr.table, hdr.body_len
        )


def test_corrupt_body_matches_host_behavior(midsummer):
    """Flipped bytes mid-stream: the device path must detect corruption at
    least whenever the serial host walk does, and must return the identical
    byte stream whenever the host accepts it (VERDICT r1 weakness #2 — the
    nibble decoder silently returned garbage where the host raised). The
    exact-bit invariant (sum of code lengths must land in the body's final
    byte) plus the invalid-transition sentinel provide the detection."""
    et = bytearray(compress_host(midsummer))
    hdr = parse_header(bytes(et))
    lut = build_decode_lut(hdr.table)
    rng = np.random.default_rng(5)
    detections = 0
    for _ in range(12):
        pos = int(rng.integers(hdr.body_start + 5, len(et) - 16))
        corrupted = bytes(et[:pos]) + bytes([et[pos] ^ 0xFF]) + bytes(et[pos + 1 :])
        body = corrupted[hdr.body_start :]
        try:
            ref = unpack_body_host(body, lut, hdr.body_len).tobytes()
        except ValueError:
            ref = None
        try:
            out = decode_body_device(body, hdr.table, hdr.body_len).tobytes()
        except ValueError:
            out = None
            detections += 1
        if ref is None:
            assert out is None, "host detected corruption but device accepted it"
        elif out is not None:
            assert out == ref
    assert detections >= 1  # the invariant does fire on real flips


def test_host_fsm8_path(midsummer):
    """The native byte-FSM host decoder (decompress_host's large-body hot
    path) must be byte-identical to the LUT walk and carry the same
    corruption/truncation errors."""
    from entreepy_tpu import runtime
    from entreepy_tpu.format.hostcodec import unpack_body_fsm8

    if not runtime.available():
        pytest.skip("native runtime unavailable")
    et = compress_host(midsummer)
    hdr = parse_header(et)
    body = et[hdr.body_start :]
    out = unpack_body_fsm8(body, hdr.table, hdr.body_len)
    assert out is not None and out.tobytes() == midsummer
    with pytest.raises(ValueError, match="ended early"):
        unpack_body_fsm8(body[:40], hdr.table, hdr.body_len)
    # flipped byte: must raise or match the serial walk, like the device path
    lut = build_decode_lut(hdr.table)
    rng = np.random.default_rng(9)
    for _ in range(8):
        pos = int(rng.integers(5, len(body) - 16))
        bad = body[:pos] + bytes([body[pos] ^ 0xFF]) + body[pos + 1 :]
        try:
            ref = unpack_body_host(bad, lut, hdr.body_len).tobytes()
        except ValueError:
            ref = None
        try:
            got = unpack_body_fsm8(bad, hdr.table, hdr.body_len)
            got = got.tobytes() if got is not None else None
        except ValueError:
            got = None
        if ref is None:
            assert got is None
        elif got is not None:
            assert got == ref


def test_expand_states_numpy_vs_native(macbeth):
    from entreepy_tpu import runtime

    arr = np.frombuffer(macbeth, np.uint8)
    table = _table(macbeth)
    body, _ = pack_body_host(arr, table)
    buf = np.frombuffer(body, np.uint8)
    fsm = build_byte_fsm(table)
    # derive the exact state sequence serially
    states = np.zeros(buf.size, np.uint8)
    s = 0
    for i, b in enumerate(buf):
        states[i] = s
        s = int(fsm.next_state[s, b])
    out = expand_states(states, buf, fsm, arr.size)
    assert out.tobytes() == macbeth
    if runtime.available():
        res = runtime.fsm8_expand(states, buf, fsm.counts, fsm.syms, arr.size)
        assert res is not None
        native, end_byte = res
        assert native.tobytes() == macbeth
        assert end_byte == buf.size - 1  # last symbol completes in last byte


def test_random_tables_fsm8_matches_lut():
    """Property: for arbitrary (not corpus-derived) code tables, the byte-FSM
    decode semantics must equal the serial LUT walk on random streams."""
    from entreepy_tpu.format.huffman import build_code_table

    rng = np.random.default_rng(17)
    for trial in range(12):
        n_sym = int(rng.integers(2, 257))
        syms = rng.choice(256, size=n_sym, replace=False)
        counts = np.zeros(256, dtype=np.int64)
        counts[syms] = rng.integers(1, 10_000, size=n_sym)
        table = build_code_table(counts)
        # random stream over the present symbols, weighted arbitrarily
        data = rng.choice(syms, size=int(rng.integers(10, 3000))).astype(np.uint8)
        body, _ = pack_body_host(data, table)
        lut = build_decode_lut(table)
        ref = unpack_body_host(body, lut, data.size)
        fsm = build_byte_fsm(table)
        syms_out, _ = fsm8_decode_host(fsm, np.frombuffer(body, np.uint8))
        assert bytes(syms_out[: data.size]) == data.tobytes() == ref.tobytes()
        out = decode_body_device(body, table, data.size, chunk_bytes=64)
        assert out.tobytes() == data.tobytes()


# --- fully-on-device decode (device expansion + compaction) ---


def _roundtrip_full(data: bytes, chunk_bytes: int = 512) -> bytes:
    from entreepy_tpu.format import compress_host, parse_header
    from entreepy_tpu.ops.decode8 import decode_body_device_full

    et = compress_host(data)
    hdr = parse_header(et)
    return decode_body_device_full(
        et[hdr.body_start :], hdr.table, hdr.body_len, chunk_bytes=chunk_bytes
    ).tobytes()


@pytest.mark.parametrize("name", ["tiny_text", "macbeth", "midsummer"])
def test_device_full_decode_corpora(name, request):
    data = request.getfixturevalue(name)
    assert _roundtrip_full(data) == data


def test_device_full_decode_statistics():
    rng = np.random.default_rng(3)
    for data in (
        rng.integers(0, 256, 50000, dtype=np.uint8).tobytes(),  # 256 syms, m=1
        (b"a" * 4000 + b"bcde") * 40,  # skewed: multi-symbol bytes
        b"\x00" * 300 + bytes(range(40)) * 25,  # NUL round-trip
    ):
        assert _roundtrip_full(data, chunk_bytes=64) == data


def test_device_full_decode_truncated_raises(midsummer):
    from entreepy_tpu.format import compress_host, parse_header
    from entreepy_tpu.ops.decode8 import decode_body_device_full

    et = compress_host(midsummer)
    hdr = parse_header(et)
    with pytest.raises(ValueError, match="ended early|corrupt"):
        decode_body_device_full(
            et[hdr.body_start : hdr.body_start + 600], hdr.table, hdr.body_len
        )


def test_device_full_decode_invalid_edge_raises():
    """A non-full table (missing symbol) must make consumed invalid
    transitions raise — same semantics as the host expansion."""
    from entreepy_tpu.format import build_code_table, histogram, pack_body_host
    from entreepy_tpu.format.huffman import CodeTable
    from entreepy_tpu.ops.decode8 import decode_body_device_full

    data = (b"abcdef" * 200) + b"g" + (b"abcdef" * 200)
    arr = np.frombuffer(data, np.uint8)
    table = build_code_table(histogram(arr))
    body, _ = pack_body_host(arr, table)
    # decode with a pruned table: 'g' has no code -> its bits walk a dead edge
    lengths = table.lengths.copy()
    codes = table.codes.copy()
    lengths[ord("g")] = 0
    codes[ord("g")] = 0
    pruned = CodeTable(codes, lengths)
    with pytest.raises(ValueError, match="invalid bitstream|corrupt|ended early"):
        decode_body_device_full(body, pruned, arr.size)


def test_validate_chunk_meta_semantics():
    from entreepy_tpu.ops.decode8 import validate_chunk_meta

    counts = np.array([10, 10, 10], dtype=np.int64)
    none = np.array([-1, -1, -1], dtype=np.int64)
    validate_chunk_meta(counts, none, 30)  # clean accept
    # invalid in chunk 1 after 5 symbols -> consumed when n_symbols > 15
    w = np.array([-1, 5, -1], dtype=np.int64)
    validate_chunk_meta(counts, w, 15)  # 15 symbols end before the invalid
    with pytest.raises(ValueError, match="invalid"):
        validate_chunk_meta(counts, w, 16)
    with pytest.raises(ValueError, match="ended early"):
        validate_chunk_meta(counts, none, 31)


def test_compact_symbols_overflow_poisons_lane_tot():
    """An under-sized static per-subgroup symbol cap must poison lane_tot
    to -1 (rejected by validate_chunk_meta) instead of silently truncating
    a subgroup's symbols."""
    import jax.numpy as jnp

    from entreepy_tpu.ops.decode8 import SUB_BYTES, compact_symbols_device

    sb = SUB_BYTES
    k, m, lanes = 2 * sb, 2, 8  # two subgroups per lane
    counts = np.zeros((k, lanes), np.int32)
    counts[:sb, 2] = 2  # subgroup 0 of lane 2 emits 2*sb symbols
    inv = np.zeros((k, lanes), bool)
    syms = np.zeros((k, m, lanes), np.uint8)
    # cap = sb < the 2*sb fill, whatever width SUB_BYTES is set to
    _, mini_tot, lane_tot, _ = compact_symbols_device(
        jnp.asarray(counts), jnp.asarray(inv), jnp.asarray(syms), m, sb
    )
    assert int(np.asarray(mini_tot).max()) == 2 * sb
    assert (np.asarray(lane_tot) == -1).all()


# --- split expand tables (format.fsm8.split_expand_tensors) ---


def _expand_both_ways(data: bytes, chunk_bytes: int):
    """Run the fused and split expand scans on the same decode state
    sequence; return both (counts, inv, syms) triples."""
    import jax.numpy as jnp

    from entreepy_tpu.format import compress_host, parse_header
    from entreepy_tpu.format.fsm8 import (
        build_byte_fsm, expand_tensors, split_expand_tensors,
    )
    from entreepy_tpu.ops import decode8

    et = compress_host(data)
    hdr = parse_header(et)
    fsm = build_byte_fsm(hdr.table)
    buf = np.frombuffer(et, np.uint8)[hdr.body_start :]
    lanes = max(1, -(-buf.size // chunk_bytes))
    padded = np.zeros(lanes * chunk_bytes, np.uint8)
    padded[: buf.size] = buf
    cols = decode8.bytes_to_cols(padded, lanes, chunk_bytes)
    states, unsynced = decode8.fsm8_decode(
        cols, decode8._table_T_bf16(fsm), jnp.int32(lanes)
    )
    assert not bool(unsynced)
    tf, m = expand_tensors(fsm)
    ts, m2, mt = split_expand_tensors(fsm)
    assert m2 == m
    nv = jnp.int32(buf.size)
    fused = decode8.expand_pass_device(
        cols, states, jnp.asarray(tf, jnp.bfloat16), nv, m
    )
    split = decode8.expand_pass_split(
        cols, states, jnp.asarray(ts, jnp.bfloat16), nv, m, mt
    )
    return fused, split, (cols, states, ts, m, mt)


@pytest.mark.parametrize(
    "data",
    [
        b"the quick brown fox jumps over the lazy dog " * 40,
        (b"a" * 500 + b"bcd") * 9,  # skewed: multi-symbol bytes, m near 8
        bytes(range(256)) * 9,  # full alphabet
    ],
)
def test_split_expand_matches_fused(data):
    fused, split, _ = _expand_both_ways(data, chunk_bytes=64)
    for f, s in zip(fused, split):
        assert np.array_equal(np.asarray(f), np.asarray(s))


def test_split_expand_pallas_interpret_matches_scan():
    """The Pallas split kernel (interpret mode) must equal the XLA scan
    twin bit-for-bit on a tile-aligned shape."""
    import jax.numpy as jnp

    from entreepy_tpu.ops import decode8
    from entreepy_tpu.ops.pallas_fsm8 import expand_pass_split_pallas8

    data = (b"interleaved split-table expansion " * 120)[:4096]
    _, split, (cols, states, ts, m, mt) = _expand_both_ways(data, chunk_bytes=8)
    lanes, k = cols.shape
    # pad lanes to the kernel's lane tile? use small shapes directly: the
    # wrapper requires lanes % lt == 0 with lt = min(1024, lanes); any lanes
    # works when lanes <= 1024 and k % kt == 0 with kt = min(128, k).
    vals = expand_pass_split_pallas8(
        cols.T, states.T.astype(jnp.int32), jnp.asarray(ts, jnp.bfloat16),
        m, mt, interpret=True,
    )
    raw = vals[:, 0, :]
    syms = vals[:, 1:, :].astype(jnp.uint8)
    got = decode8._expand_mask(raw, syms, jnp.int32(lanes * k), m)
    # n_valid=all here; compare against scan run with the same n_valid
    raw2, syms2 = decode8._expand_scan_split(
        cols, states, jnp.asarray(ts, jnp.bfloat16), m, mt
    )
    want = decode8._expand_mask(raw2, syms2, jnp.int32(lanes * k), m)
    for g, w in zip(got, want):
        assert np.array_equal(np.asarray(g), np.asarray(w))


def test_fused_mode_env_knob(monkeypatch, macbeth):
    from entreepy_tpu.format.fsm8 import build_byte_fsm
    from entreepy_tpu.format import compress_host, parse_header
    from entreepy_tpu.ops.decode8 import build_expand

    hdr = parse_header(compress_host(macbeth))
    monkeypatch.setenv("ENTREEPY_EXPAND", "fused")
    t, m, mt = build_expand(build_byte_fsm(hdr.table))
    assert mt is None
    assert _roundtrip_full(macbeth) == macbeth


# --- one-pass decode (format.fsm8.fused_decode_tensors) ---


@pytest.mark.parametrize(
    "data",
    [
        b"the quick brown fox jumps over the lazy dog " * 40,
        (b"a" * 500 + b"bcd") * 9,  # skewed: multi-symbol bytes, m near 8
        bytes(range(256)) * 9,  # full alphabet, m = 1
        b"\x00" * 120 + bytes(range(64)) * 12,  # NUL symbols
    ],
)
def test_onepass_matches_twopass(data):
    """The one-pass decode's packed rows must equal the emit-pass states
    fed through the split expand, byte for byte."""
    import jax.numpy as jnp

    from entreepy_tpu.format import compress_host, parse_header
    from entreepy_tpu.format.fsm8 import build_byte_fsm, split_expand_tensors
    from entreepy_tpu.ops import decode8

    et = compress_host(data)
    hdr = parse_header(et)
    fsm = build_byte_fsm(hdr.table)
    buf = np.frombuffer(et, np.uint8)[hdr.body_start :]
    chunk = 64
    lanes = max(1, -(-buf.size // chunk))
    padded = np.zeros(lanes * chunk, np.uint8)
    padded[: buf.size] = buf
    cols = decode8.bytes_to_cols(padded, lanes, chunk)
    tbl = decode8._table_T_bf16(fsm)

    states, u1 = decode8.fsm8_decode(cols, tbl, jnp.int32(lanes))
    assert not bool(u1)
    ts, m, mt = split_expand_tensors(fsm)
    nv = jnp.int32(buf.size)
    want = decode8.expand_pass_split(
        cols, states, jnp.asarray(ts, jnp.bfloat16), nv, m, mt
    )

    t_fused, m2, mt2, s = decode8.build_fused(fsm)
    assert (m2, mt2) == (m, mt)
    vals, _, u2 = decode8.fsm8_decode_fused(cols, tbl, t_fused,
                                            jnp.int32(lanes), m, mt, s)
    assert not bool(u2)
    got = decode8._expand_mask(
        vals[:, 0, :], vals[:, 1:, :].astype(jnp.uint8), nv, m
    )
    for g, w in zip(got, want):
        assert np.array_equal(np.asarray(g), np.asarray(w))


def test_onepass_table_semantics():
    """fused_decode_tensors must reproduce (next_state, counts, syms)
    exactly for every reachable (state, byte) pair."""
    from entreepy_tpu.format import build_code_table, histogram
    from entreepy_tpu.format.fsm8 import build_byte_fsm, fused_decode_tensors

    rng = np.random.default_rng(5)
    data = rng.choice(
        np.frombuffer(b"abcdefgh XYZ.\n", np.uint8), 4000
    ).astype(np.uint8)
    fsm = build_byte_fsm(build_code_table(histogram(data)))
    t, m, mt, s = fused_decode_tensors(fsm)
    n_p = 9
    merged = t[:, 0:s].T
    pv = t[:, s : 2 * s].T
    tc_t = t[:, 2 * s : 2 * s + n_p].T
    ts_t = [t[:, 2 * s + (1 + j) * n_p : 2 * s + (2 + j) * n_p].T for j in range(mt)]
    tend = t[:, 2 * s + (1 + mt) * n_p :].T
    b = np.arange(256)
    for st in range(fsm.n_states):
        p = pv[st].astype(int) & 15
        inv = (pv[st] >= 16) | ((p > 0) & (tc_t[p, b] >= 16))
        tc = tc_t[p, b].astype(int) & 15
        cnt = np.where(inv, -1, (p > 0).astype(int) + tc)
        ref = fsm.counts[st].astype(int)
        assert np.array_equal(cnt < 0, ref < 0)
        valid = ref >= 0
        assert np.array_equal(cnt[valid], ref[valid])
        nxt = np.where(p > 0, tend[p, b], merged[st]).astype(int)
        assert np.array_equal(nxt[valid], fsm.next_state[st][valid].astype(int))
        for bb in np.flatnonzero(valid & (ref > 0)):
            got = [int(merged[st, bb])] + [
                int(ts_t[j][p[bb], bb]) for j in range(min(mt, ref[bb] - 1))
            ]
            assert got == [int(x) for x in fsm.syms[st, bb, : ref[bb]]]


def test_expand_mode_env_knobs(monkeypatch, macbeth):
    """All three expand modes round-trip decode_body_device_full."""
    for mode in ("onepass", "split", "fused"):
        monkeypatch.setenv("ENTREEPY_EXPAND", mode)
        assert _roundtrip_full(macbeth) == macbeth


def test_onepass_packed_matches_unpacked(midsummer):
    """MASKED packed one-word rows must carry exactly the unpacked fused
    rows' masked counts/invalid/live-slots, the packed compaction must
    produce the unpacked path's plane, and the dense compaction must
    round-trip the same bytes with counts as its mini totals."""
    import jax.numpy as jnp

    from entreepy_tpu.format import compress_host, parse_header
    from entreepy_tpu.format.fsm8 import build_byte_fsm
    from entreepy_tpu.ops import decode8

    data = midsummer[:30000]
    et = compress_host(data)
    hdr = parse_header(et)
    fsm = build_byte_fsm(hdr.table)
    buf = np.frombuffer(et, np.uint8)[hdr.body_start :]
    chunk = 64
    lanes = max(1, -(-buf.size // chunk))
    padded = np.zeros(lanes * chunk, np.uint8)
    padded[: buf.size] = buf
    cols = decode8.bytes_to_cols(padded, lanes, chunk)
    tbl = decode8._table_T_bf16(fsm)
    t_fused, m, mt, s = decode8.build_fused(fsm)
    assert m <= 3  # text corpus: packed mode applies

    nv = jnp.int32(buf.size)
    v_u, _, u1 = decode8.fsm8_decode_fused(cols, tbl, t_fused,
                                           jnp.int32(lanes), m, mt, s)
    v_p, _, u2 = decode8.fsm8_decode_fused(cols, tbl, t_fused,
                                           jnp.int32(lanes), m, mt, s,
                                           packed=True, n_valid=nv)
    assert not bool(u1) and not bool(u2)
    counts, inv, sy = decode8._expand_mask(
        v_u[:, 0, :], v_u[:, 1:, :].astype(jnp.uint8), nv, m
    )
    counts_p, inv_p = decode8.packed_counts_inv(v_p, m)
    assert np.array_equal(np.asarray(counts_p), np.asarray(counts))
    assert np.array_equal(np.asarray(inv_p), np.asarray(inv))
    # slot bytes ride verbatim (dead slots incl. garbage — consumers gate
    # on the count byte)
    _, syms_p = decode8.unpack_fused_rows(v_p, m)
    assert np.array_equal(
        np.asarray(syms_p), np.asarray(v_u[:, 1:, :]).astype(np.uint8)
    )

    cap = decode8.sym_cap(counts, m)
    want = decode8.compact_symbols_device(counts, inv, sy, m, cap)
    got = decode8.compact_symbols_packed(v_p, m, cap)
    for g, w in zip(got, want):
        assert np.array_equal(np.asarray(g), np.asarray(w))
    out = decode8.assemble_symbol_plane(
        *got, hdr.body_len, hdr.table, buf.size
    )
    assert bytes(out) == data

    # dense compaction: same bytes, per-byte counts as mini totals, and
    # identical lane metadata
    plane_d, mini_d, lt_d, wi_d = decode8.compact_symbols_dense(v_p, m)
    assert np.array_equal(np.asarray(mini_d), np.asarray(counts))
    assert np.array_equal(np.asarray(lt_d), np.asarray(want[2]))
    assert np.array_equal(np.asarray(wi_d), np.asarray(want[3]))
    out_d = decode8.assemble_symbol_plane(
        plane_d, mini_d.astype(jnp.uint8), lt_d, wi_d,
        hdr.body_len, hdr.table, buf.size
    )
    assert bytes(out_d) == data


def test_onepass_packed_env_knob(monkeypatch, macbeth):
    """ENTREEPY_FUSED_PACKED=0 forces the unpacked fused rows; both
    round-trip."""
    for v in ("1", "0"):
        monkeypatch.setenv("ENTREEPY_FUSED_PACKED", v)
        assert _roundtrip_full(macbeth) == macbeth


def test_tiled_decode_matches_untiled(midsummer):
    """decode_body_device_tiled must equal the untiled full pipeline for
    any tile width (incl. tiles that split mid-stream), both row modes."""
    import os

    from entreepy_tpu.ops.decode8 import (
        decode_body_device_full, decode_body_device_tiled,
    )

    et = compress_host(midsummer)
    hdr = parse_header(et)
    body = et[hdr.body_start :]
    ref = decode_body_device_full(body, hdr.table, hdr.body_len, chunk_bytes=64)
    for tl in (8, 64, 100000):
        out = decode_body_device_tiled(
            body, hdr.table, hdr.body_len, chunk_bytes=64, tile_lanes=tl
        )
        assert np.array_equal(out, ref), tl
    os.environ["ENTREEPY_FUSED_PACKED"] = "0"
    try:
        out = decode_body_device_tiled(
            body, hdr.table, hdr.body_len, chunk_bytes=64, tile_lanes=64
        )
        assert np.array_equal(out, ref)
    finally:
        del os.environ["ENTREEPY_FUSED_PACKED"]


def test_unconverged_self_sync_falls_back_to_host(monkeypatch, midsummer):
    """If chunk self-sync reports unconverged (pathologically periodic
    streams), both the untiled and the tiled device decodes must fall back
    to the exact serial host decoder — including when only a MID-TRAIN
    tile fails (the tiled path defers unconverged checks to fetch time)."""
    import jax.numpy as jnp

    import entreepy_tpu.ops.decode8 as d8

    data = midsummer[:20000]
    et = compress_host(data)
    hdr = parse_header(et)
    body = et[hdr.body_start :]

    real_fn = d8.run_fused_decode
    calls = {"n": 0}

    def fail_all(*a, **k):
        vals, exits, _ = real_fn(*a, **k)
        return vals, exits, jnp.bool_(True)

    monkeypatch.setattr(d8, "run_fused_decode", fail_all)
    out = d8.decode_body_device_full(body, hdr.table, hdr.body_len,
                                     chunk_bytes=64)
    assert bytes(out) == data

    def fail_second_tile(*a, **k):
        vals, exits, u = real_fn(*a, **k)
        calls["n"] += 1
        return vals, exits, jnp.bool_(calls["n"] == 2)

    monkeypatch.setattr(d8, "run_fused_decode", fail_second_tile)
    out = d8.decode_body_device_tiled(body, hdr.table, hdr.body_len,
                                      chunk_bytes=64, tile_lanes=64)
    assert calls["n"] >= 2  # the train really had a failing mid tile
    assert bytes(out) == data


def test_tiled_decode_truncated_raises(midsummer):
    from entreepy_tpu.ops.decode8 import decode_body_device_tiled

    et = compress_host(midsummer)
    hdr = parse_header(et)
    body = et[hdr.body_start :]
    with pytest.raises(ValueError, match="ended early|corrupt|invalid"):
        decode_body_device_tiled(
            body[: len(body) // 2], hdr.table, hdr.body_len,
            chunk_bytes=64, tile_lanes=64,
        )


def test_onepass_corrupt_body_matches_host_behavior(midsummer):
    """Flipped bytes through the ONE-PASS full pipeline: must detect
    corruption at least whenever the serial host walk does, and return
    identical bytes whenever the host accepts. Exercises the fused table's
    invalid-flag semantics (an invalid transition at-or-before the
    consumed prefix always rejects; post-invalid chain divergence is
    unobservable in accepted outputs)."""
    from entreepy_tpu.ops.decode8 import decode_body_device_full

    data = midsummer[:60000]
    et = bytearray(compress_host(data))
    hdr = parse_header(bytes(et))
    lut = build_decode_lut(hdr.table)
    rng = np.random.default_rng(11)
    detections = 0
    for _ in range(10):
        pos = int(rng.integers(hdr.body_start + 5, len(et) - 16))
        corrupted = bytes(et[:pos]) + bytes([et[pos] ^ 0xFF]) + bytes(et[pos + 1 :])
        body = corrupted[hdr.body_start :]
        try:
            ref = unpack_body_host(body, lut, hdr.body_len).tobytes()
        except ValueError:
            ref = None
        try:
            out = decode_body_device_full(body, hdr.table, hdr.body_len).tobytes()
        except ValueError:
            out = None
            detections += 1
        if ref is None:
            assert out is None, "host detected corruption but onepass accepted it"
        elif out is not None:
            assert out == ref
    assert detections >= 1


def test_tiled_routing_tile_incompatible_falls_back(monkeypatch, midsummer):
    """Regression: under Pallas, a chunk size the fused kernel cannot tile
    (e.g. 100: 100 % min(K_TILE_FUSED,100)=64 != 0 after the kt clamp) must
    route AWAY from the tiled path instead of raising mid-pipeline, and the
    router + tiled-function prechecks must agree (no recursion)."""
    import entreepy_tpu.ops.decode8 as d8

    monkeypatch.setattr(d8, "_use_pallas", lambda: True)
    assert not d8._tileable_onepass("onepass", 100)
    assert d8._tileable_onepass("onepass", 512)
    assert d8._tileable_onepass("onepass", 64)
    assert not d8._tileable_onepass("split", 512)
    monkeypatch.setattr(d8, "_use_pallas", lambda: False)
    assert d8._tileable_onepass("onepass", 100)  # scan twin: no constraint

    # Wiring: with pallas "on", the tiled entry point must delegate to the
    # untiled path for an incompatible chunk size (sentinel, no kernels run).
    monkeypatch.setattr(d8, "_use_pallas", lambda: True)
    called = {}

    def sentinel(body, table, n_symbols, *, chunk_bytes, fsm=None):
        called["chunk"] = chunk_bytes
        return np.zeros(n_symbols, np.uint8)

    monkeypatch.setattr(d8, "decode_body_device_full", sentinel)
    et = compress_host(midsummer[:5000])
    hdr = parse_header(et)
    out = d8.decode_body_device_tiled(
        et[hdr.body_start :], hdr.table, hdr.body_len, chunk_bytes=100
    )
    assert called["chunk"] == 100 and out.size == hdr.body_len


def test_tiled_respects_expand_mode_env(monkeypatch, midsummer):
    """ENTREEPY_EXPAND=split must not silently run the one-pass tiled
    pipeline: bodies route through the untiled path (which honors the
    knob) and still decode exactly."""
    from entreepy_tpu.ops.decode8 import decode_body_device_tiled

    monkeypatch.setenv("ENTREEPY_EXPAND", "split")
    et = compress_host(midsummer)
    hdr = parse_header(et)
    out = decode_body_device_tiled(
        et[hdr.body_start :], hdr.table, hdr.body_len,
        chunk_bytes=64, tile_lanes=64,
    )
    assert bytes(out) == midsummer


def test_plane_checksum_matches_host(midsummer):
    """plane_checksum (the verification primitive every chip bench syncs on)
    must agree with plane_checksum_host through the real one-pass pipeline,
    both untiled (start=0) and at a nonzero tile start."""
    from entreepy_tpu.format.fsm8 import build_byte_fsm
    from entreepy_tpu.ops.decode8 import (
        _table_T_bf16, build_fused, bytes_to_cols, compact_symbols_packed,
        packed_mini_totals, packed_sym_cap, plane_checksum,
        plane_checksum_host, run_fused_decode,
    )

    import jax.numpy as jnp

    data = midsummer
    et = compress_host(data)
    hdr = parse_header(et)
    fsm = build_byte_fsm(hdr.table)
    buf = np.frombuffer(et, np.uint8)[hdr.body_start :]
    chunk = 512
    n_real = max(1, -(-buf.size // chunk))
    padded = np.zeros(n_real * chunk, np.uint8)
    padded[: buf.size] = buf
    cols = bytes_to_cols(padded, n_real, chunk)
    t_fused, m, mt, s = build_fused(fsm)
    nv = jnp.int32(buf.size)
    vals, _x, u = run_fused_decode(
        cols, _table_T_bf16(fsm), t_fused, jnp.int32(n_real), m, mt, s,
        packed=True, n_valid=nv,
    )
    assert not bool(u)
    mini = packed_mini_totals(vals, m)
    cap = packed_sym_cap(mini, m, chunk)
    plane, mt_, lt, wi = compact_symbols_packed(vals, m, cap)
    darr = np.frombuffer(data, np.uint8)
    chk, tot = plane_checksum(plane, mt_, lt, cap, len(data))
    exp = plane_checksum_host(darr, 0, int(tot), len(data))
    assert int(chk) & 0xFFFFFFFF == exp & 0xFFFFFFFF
    # nonzero start: masking must drop exactly the positions past n_sym
    chk2, _ = plane_checksum(plane, mt_, lt, cap, len(data) // 2, start=0)
    exp2 = plane_checksum_host(darr, 0, int(tot), len(data) // 2)
    assert int(chk2) & 0xFFFFFFFF == exp2 & 0xFFFFFFFF
    # the dense plane (cap = m, per-byte mini totals) must checksum
    # identically — same symbols, same stream order
    from entreepy_tpu.ops.decode8 import compact_symbols_dense

    plane_d, mini_d, lt_d, wi_d = compact_symbols_dense(vals, m)
    chk_d, tot_d = plane_checksum(plane_d, mini_d, lt_d, m, len(data))
    assert int(tot_d) == int(tot)
    assert int(chk_d) & 0xFFFFFFFF == exp & 0xFFFFFFFF
