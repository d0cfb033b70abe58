"""C++ runtime must be bit-identical to the pure-numpy fallbacks."""

import numpy as np
import pytest

from entreepy_tpu import runtime
from entreepy_tpu.format import build_code_table, histogram
from entreepy_tpu.format.lut import build_decode_lut

pytestmark = pytest.mark.skipif(
    not runtime.available(), reason="native runtime unavailable (no g++?)"
)


def _table(data: bytes):
    return build_code_table(histogram(np.frombuffer(data, np.uint8)))


def test_pack_matches_numpy(midsummer):
    import entreepy_tpu.format.hostcodec as hc

    arr = np.frombuffer(midsummer, np.uint8)
    table = _table(midsummer)
    native = runtime.pack_body(arr, table.codes, table.lengths)
    assert native is not None
    # numpy reference path (bypasses the native dispatch)
    lens = table.lengths[arr].astype(np.int64)
    codes = table.codes[arr].astype(np.uint64)
    ends = np.cumsum(lens)
    total = int(ends[-1])
    offs = ends - lens
    contrib = codes << (np.uint64(64) - (offs & 31).astype(np.uint64) - lens.astype(np.uint64))
    words = np.zeros(total // 32 + 2, dtype=np.uint32)
    np.add.at(words, (offs >> 5).astype(np.int64), (contrib >> np.uint64(32)).astype(np.uint32))
    np.add.at(words, (offs >> 5).astype(np.int64) + 1, (contrib & np.uint64(0xFFFFFFFF)).astype(np.uint32))
    ref = words.astype(">u4").tobytes()[: (total + 7) // 8]
    assert native[1] == total
    assert native[0] == ref


def test_unpack_roundtrip(midsummer):
    arr = np.frombuffer(midsummer, np.uint8)
    table = _table(midsummer)
    body, _ = runtime.pack_body(arr, table.codes, table.lengths)
    lut = build_decode_lut(table)
    out = runtime.unpack_body(body, lut.flat, lut.lookup_bits, arr.size)
    assert out is not None and out.tobytes() == midsummer


def test_unpack_truncated_raises(macbeth):
    arr = np.frombuffer(macbeth, np.uint8)
    table = _table(macbeth)
    body, _ = runtime.pack_body(arr, table.codes, table.lengths)
    lut = build_decode_lut(table)
    with pytest.raises(ValueError, match="ended early"):
        runtime.unpack_body(body[:10], lut.flat, lut.lookup_bits, arr.size)


def test_compact_symbols_matches_numpy():
    rng = np.random.default_rng(7)
    n = 5000
    counts = rng.integers(0, 5, size=n, dtype=np.int32)
    syms = rng.integers(0, 256, size=(n, 4), dtype=np.uint32)
    packed = (syms[:, 0] << 24) | (syms[:, 1] << 16) | (syms[:, 2] << 8) | syms[:, 3]
    total = int(counts.sum())
    out = runtime.compact_symbols(packed, counts, total)
    mask = np.arange(4)[None, :] < counts[:, None]
    syms4 = np.stack(
        [(packed >> s) & 0xFF for s in (24, 16, 8, 0)], axis=1
    ).astype(np.uint8)
    assert out.tobytes() == syms4[mask].tobytes()


def test_stitch_matches_numpy():
    from entreepy_tpu.utils.stitch import stitch_words

    rng = np.random.default_rng(8)
    lanes, cap = 37, 9
    payload = rng.integers(0, 2**32, size=(lanes, cap), dtype=np.uint64).astype(np.uint32)
    bit_lens = rng.integers(0, cap * 32 - 31, size=lanes).astype(np.int64)
    # zero bits beyond each row's length (contract of the packers)
    for l in range(lanes):
        nw = (int(bit_lens[l]) + 31) // 32
        payload[l, nw:] = 0
        rem = int(bit_lens[l]) & 31
        if rem and nw:
            payload[l, nw - 1] &= np.uint32(0xFFFFFFFF) << (32 - rem)
    ref_words, ref_total = stitch_words(list(payload), bit_lens)
    nat = runtime.stitch_words(payload, bit_lens)
    assert nat is not None
    nat_words, nat_total = nat
    assert nat_total == ref_total
    n = ref_total // 32 + 1
    assert np.array_equal(nat_words[:n], ref_words[:n])


@pytest.fixture(scope="module")
def big_text(midsummer) -> bytes:
    # > PARALLEL_MIN_BYTES compressed: exercises et_pack_parallel and
    # et_decode_parallel (the threaded gap-array paths)
    return midsummer * 12  # ~1.3 MB -> ~0.8 MB body


def test_parallel_paths_roundtrip_and_match_numpy(big_text):
    from entreepy_tpu.format import build_code_table, histogram
    from entreepy_tpu.format.hostcodec import pack_body_np, unpack_body_np
    from entreepy_tpu.format.lut import build_decode_lut

    arr = np.frombuffer(big_text, np.uint8)
    table = build_code_table(histogram(arr))
    assert arr.size >= runtime.PARALLEL_MIN_BYTES

    body_nat, bits_nat = runtime.pack_body(arr, table.codes, table.lengths)
    body_np, bits_np = pack_body_np(arr, table)
    assert bits_nat == bits_np and body_nat == body_np

    lut = build_decode_lut(table)
    assert len(body_nat) >= runtime.PARALLEL_MIN_BYTES
    out_nat = runtime.unpack_body(body_nat, lut.flat, lut.lookup_bits, arr.size)
    assert out_nat.tobytes() == big_text
    # spot-check the numpy anchor on a prefix (full 1.3 MB is too slow in Python)
    out_np = unpack_body_np(body_np, lut, 5000)
    assert out_np.tobytes() == big_text[:5000]


def test_parallel_decode_corrupt_raises(big_text):
    # Only meaningful when the code table is not full at every LUT level --
    # build a stream with a symbol whose absence makes windows invalid.
    from entreepy_tpu import compress, decompress

    et = bytearray(compress(big_text, backend="host"))
    # flip bytes mid-body until decode either raises or differs
    et[len(et) // 2] ^= 0xFF
    try:
        out = decompress(bytes(et), backend="host")
        # Full Huffman trees make every window valid, so corruption cannot
        # always be *detected* -- but it must never be silently wrong AND
        # claimed exact: a changed body must not reproduce the input.
        assert out != big_text
    except ValueError:
        pass


def test_parallel_decode_truncated_raises(big_text):
    from entreepy_tpu import compress

    et = compress(big_text, backend="host")
    from entreepy_tpu.format import parse_header

    hdr = parse_header(et)
    cut = et[: hdr.body_start + (len(et) - hdr.body_start) // 2]
    from entreepy_tpu.format import decompress_host

    with pytest.raises(ValueError, match="ended early"):
        decompress_host(cut)


def test_parallel_decode_run_heavy_overflow_path(midsummer):
    # dominant 1-bit-code symbol: chunks overflow the speculative scratch
    data = (b"a" * 4000 + b"bc") * 400  # ~1.6 MB, 'a' gets a 1-bit code
    from entreepy_tpu import compress, decompress

    et = compress(data, backend="host")
    assert decompress(et, backend="host") == data


def test_parallel_decode_fuzz_vs_serial():
    """Many shapes/statistics through the gap-array decoder, each checked
    against the serial walk (sizes straddle chunk and block boundaries)."""
    from entreepy_tpu.format import build_code_table, histogram
    from entreepy_tpu.format.lut import build_decode_lut

    lib = runtime._load()
    rng = np.random.default_rng(42)
    chunk_bits = 1 << 12  # small chunks -> many boundaries at small sizes
    cases = []
    for size in (4097, 65536, 65537, 300_001):
        cases.append(rng.integers(0, 256, size=size, dtype=np.uint8))  # uniform
        cases.append(rng.integers(97, 103, size=size, dtype=np.uint8))  # narrow
        cases.append(
            np.repeat(rng.integers(0, 256, size // 64 + 1, dtype=np.uint8), 64)[:size]
        )  # runs
    for arr in cases:
        table = build_code_table(histogram(arr))
        body, bits = runtime.pack_body(arr, table.codes, table.lengths)
        lut = build_decode_lut(table)
        buf = np.frombuffer(body, np.uint8)
        padded = np.zeros(buf.size + 16, np.uint8)
        padded[: buf.size] = buf
        lut_c = np.ascontiguousarray(lut.flat, np.int32)
        out_p = np.empty(arr.size, np.uint8)
        out_s = np.empty(arr.size, np.uint8)
        rp = lib.et_decode_parallel(
            padded, buf.size, lut_c, lut.lookup_bits, chunk_bits, out_p, arr.size, 0, 32
        )
        rs = lib.et_unpack_body(padded, buf.size, lut_c, lut.lookup_bits, out_s, arr.size)
        assert rp == rs == arr.size
        assert np.array_equal(out_p, out_s), f"mismatch at size={arr.size}"


def _adversarial_fsm_tables():
    """Synthetic byte-FSM with an unreachable edge, shaped so a chunk's
    speculative guess walk hits a SPURIOUS invalid before its sync point.
    States: 0 and 1. byte 0: emit 'A', ->0 (valid everywhere). byte 1:
    invalid from state 0, emits 'B' ->0 from state 1. byte 2: 'C' ->1 from
    state 0, 'D' ->0 from state 1."""
    nxt = np.zeros((2, 256), np.uint8)
    cnt = np.ones((2, 256), np.int8)
    syms = np.zeros((2, 256, 8), np.uint8)
    syms[:, :, 0] = ord("A")
    cnt[0, 1] = -1
    syms[1, 1, 0] = ord("B")
    syms[0, 2, 0] = ord("C")
    nxt[0, 2] = 1
    syms[1, 2, 0] = ord("D")
    return nxt, cnt, syms


def test_fsm8_parallel_rejects_post_sync_corruption():
    """Regression: the chunk decoder tracked only the FIRST invalid
    transition of each speculative walk, so a spurious pre-sync invalid
    masked a real post-sync one and corruption was silently accepted (with
    fabricated symbols and a passing end-byte invariant). Layout: chunk 1
    enters in state 1 (true) but guesses state 0; its first byte is a
    spurious invalid on the guess walk (sync lands one byte later), and a
    second `1` byte deeper in the chunk is invalid on the TRUE path."""
    nxt, cnt, syms = _adversarial_fsm_tables()
    cb = runtime.FSM8_CHUNK_BYTES
    chunk0 = bytes([0]) * (cb - 1) + bytes([2])  # exit state 1
    chunk1 = bytearray(bytes([1]) + bytes([0]) * (cb - 1))
    chunk1[1000] = 1  # state is 0 here on the true path -> invalid edge
    chunk2 = bytes([0]) * cb
    body = chunk0 + bytes(chunk1) + chunk2
    n_symbols = len(body) - 1  # all bytes emit 1 except the true invalid
    with pytest.raises(ValueError, match="invalid bitstream"):
        runtime.fsm8_decode_parallel(body, nxt, cnt, syms, n_symbols)

    # Positive control: the same layout minus the post-sync invalid decodes
    # fine — the pre-sync invalid is spurious (guess-only) and must NOT
    # cause a rejection.
    chunk1[1000] = 0
    body_ok = chunk0 + bytes(chunk1) + chunk2
    out, end_byte = runtime.fsm8_decode_parallel(
        body_ok, nxt, cnt, syms, len(body_ok)
    )
    assert end_byte == len(body_ok) - 1
    expect = (
        b"A" * (cb - 1) + b"C" + b"B" + b"A" * (cb - 1) + b"A" * cb
    )
    assert out.tobytes() == expect


def test_fsm8_parallel_vs_serial_corruption_consistency(midsummer):
    """Accept/reject and bytes must match the serial LUT walk (+ exact-bit
    invariant) on corrupted multi-chunk streams: the parallel FSM decoder
    must never be *less* strict than the serial anchor."""
    from entreepy_tpu.format import build_decode_lut, compress_host, parse_header
    from entreepy_tpu.format.fsm8 import build_byte_fsm
    from entreepy_tpu.format.hostcodec import _check_end_byte, _check_stream_bits

    lib = runtime._load()
    data = midsummer * 6  # ~675 KB -> ~6 chunks of 64 KiB body
    et = compress_host(data)
    hdr = parse_header(et)
    body = bytearray(et[hdr.body_start :])
    fsm = build_byte_fsm(hdr.table)
    lut = build_decode_lut(hdr.table)
    lut_c = np.ascontiguousarray(lut.flat, np.int32)
    rng = np.random.default_rng(1234)
    for _ in range(8):
        pos = int(rng.integers(0, len(body)))
        old = body[pos]
        body[pos] ^= int(rng.integers(1, 256))
        padded = np.zeros(len(body) + 16, np.uint8)
        padded[: len(body)] = np.frombuffer(bytes(body), np.uint8)
        out_s = np.empty(hdr.body_len, np.uint8)
        rs = lib.et_unpack_body(
            padded, len(body), lut_c, lut.lookup_bits, out_s, hdr.body_len
        )
        serial_ok = rs == hdr.body_len
        if serial_ok:
            try:
                _check_stream_bits(out_s, hdr.table.lengths, len(body))
            except ValueError:
                serial_ok = False
        par_ok, par_out = True, None
        try:
            out, end_byte = runtime.fsm8_decode_parallel(
                bytes(body), fsm.next_state, fsm.counts, fsm.syms, hdr.body_len
            )
            _check_end_byte(end_byte, len(body), hdr.body_len)
            par_out = out.tobytes()
        except ValueError:
            par_ok = False
        assert par_ok == serial_ok, f"verdicts diverge at corrupt pos {pos}"
        if par_ok:
            assert par_out == out_s.tobytes()
        body[pos] = old


def test_pack_sized_underclaimed_bits_raises():
    """Regression: an under-sized per-block bit claim must raise, not write
    past the output buffer."""
    from entreepy_tpu.format import build_code_table

    rng = np.random.default_rng(5)
    arr = rng.integers(0, 256, size=600_000, dtype=np.uint8)
    counts_blocks = runtime.histogram_blocks(arr)
    table = build_code_table(counts_blocks.sum(axis=0))
    block_bits = counts_blocks @ table.lengths.astype(np.int64)
    good = runtime.pack_body_sized(arr, table.codes, table.lengths, block_bits)
    assert good is not None
    bad_bits = block_bits.copy()
    bad_bits[0] -= 6400  # lie: block 0 claims fewer bits than it needs
    with pytest.raises(RuntimeError, match="exceed"):
        runtime.pack_body_sized(arr, table.codes, table.lengths, bad_bits)


def test_pack_fast_flush_boundary_fuzz():
    """The parallel pack's branchless 8-byte flush (native.cpp pk_fast)
    scribbles up to 7 look-ahead bytes inside a block's exclusive output
    region; this pins the invariants that make it safe — byte-identity with
    the numpy anchor across randomized skews (deep 20+ bit codes included),
    block starts landing on and off byte boundaries, and tails ending within
    8 bytes of the block's `safe` pointer."""
    from entreepy_tpu.format import build_code_table, histogram
    from entreepy_tpu.format.hostcodec import pack_body_np

    if not runtime.available():
        pytest.skip("native runtime unavailable")
    rng = np.random.default_rng(42)
    bb = runtime.PACK_BLOCK_BYTES
    for trial in range(12):
        # 2-4 blocks with +-7 byte jitter: every boundary-alignment class
        n = int(rng.integers(2, 5)) * bb + int(rng.integers(-7, 8))
        # Zipf-ish skew: exponent >= 1.6 yields 20+ bit codes alongside
        # 1-2 bit ones, stressing the accumulator and the budget math
        p = 1.0 / np.arange(1, 257) ** float(rng.uniform(0.8, 1.9))
        p /= p.sum()
        arr = rng.choice(256, size=n, p=p).astype(np.uint8)
        table = build_code_table(histogram(arr), strict=False)
        anchor, abits = pack_body_np(arr, table)
        nat, nbits = runtime.pack_body(arr, table.codes, table.lengths)
        assert nbits == abits, trial
        assert nat == anchor, trial


def test_trace_env_smoke(monkeypatch, capsys, macbeth):
    monkeypatch.setenv("ENTREEPY_TRACE", "1")
    import importlib

    from entreepy_tpu.utils import trace

    importlib.reload(trace)
    try:
        with trace.phase("unit-test", 1000):
            pass
        err = capsys.readouterr().err
        assert "phase=unit-test" in err
    finally:
        monkeypatch.delenv("ENTREEPY_TRACE")
        importlib.reload(trace)


def test_assemble_matches_numpy():
    from entreepy_tpu.ops.bitpack import _assemble_payloads_np

    rng = np.random.default_rng(9)
    lanes, steps = 16, 64
    words = rng.integers(0, 2**32, size=(lanes, steps), dtype=np.uint64).astype(np.uint32)
    emitted = rng.random((lanes, steps)) < 0.4
    acc = rng.integers(0, 2**32, size=lanes, dtype=np.uint64).astype(np.uint32)
    nbits = rng.integers(0, 32, size=lanes).astype(np.int32)
    pn, bn = _assemble_payloads_np(words, emitted, acc, nbits)
    nat = runtime.assemble_payloads(words, emitted, acc, nbits)
    assert nat is not None
    pc, bc = nat
    assert np.array_equal(bn, bc)
    assert pn.shape == pc.shape and np.array_equal(pn, pc)
