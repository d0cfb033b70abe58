""".et wire-format tests: spec-derived golden bytes + an independent
bit-string serializer cross-check + parse/validate behavior."""

from pathlib import Path

import numpy as np
import pytest

from entreepy_tpu.format import (
    FormatError,
    build_code_table,
    build_decode_lut,
    compress_host,
    decompress_host,
    histogram,
    pack_body_host,
    parse_header,
    serialize_header,
    unpack_body_host,
)


def bitstring_et(data: bytes) -> bytes:
    """Independent straight-from-the-spec serializer (README.md:57-73 of the
    reference): build the whole file as a '0'/'1' string, then pack. Slow and
    simple on purpose — cross-checks the vectorized implementation."""
    t = build_code_table(histogram(data))
    bits = ""
    present = [s for s in range(256) if t.lengths[s]]
    for s in present:
        bits += format(s, "08b") + format(int(t.lengths[s]), "08b")
        bits += format(int(t.codes[s]), f"0{int(t.lengths[s])}b")
    bits += "0" * (-len(bits) % 8)  # dict pads to byte boundary
    for byte in data:
        bits += format(int(t.codes[byte]), f"0{int(t.lengths[byte])}b")
    bits += "0" * (-len(bits) % 8)
    head = b"\xe7\xc0\xde\x01" + bytes([len(present) - 1]) + len(data).to_bytes(4, "big")
    return head + int(bits, 2).to_bytes(len(bits) // 8, "big") if bits else head


def test_golden_bytes_aabbbc():
    # Hand-assembled from the known codes (see test_huffman): a=11,b=0,c=10.
    # header: magic, ver, dictcount-1=2, bodylen=6
    # dict:  61 02 '11' | 62 01 '0' | 63 02 '10'  -> bit-packed, padded
    # body:  a a b b b c = 11 11 0 0 0 10 -> 11110001 0 -> F1 00
    dict_bits = "0110000100000010" + "11" + "0110001000000001" + "0" + "0110001100000010" + "10"
    dict_bits += "0" * (-len(dict_bits) % 8)
    expect = (
        b"\xe7\xc0\xde\x01\x02\x00\x00\x00\x06"
        + int(dict_bits, 2).to_bytes(len(dict_bits) // 8, "big")
        + b"\xf1\x00"
    )
    assert compress_host(b"aabbbc") == expect


@pytest.mark.parametrize("name", ["tiny_text", "macbeth", "midsummer"])
def test_serializer_matches_bitstring_spec(name, request):
    data = request.getfixturevalue(name)
    assert compress_host(data) == bitstring_et(data)


@pytest.mark.parametrize("name", ["tiny_text", "macbeth", "midsummer"])
def test_host_roundtrip_corpora(name, request):
    data = request.getfixturevalue(name)
    assert decompress_host(compress_host(data)) == data


def test_roundtrip_random_bytes():
    rng = np.random.default_rng(0)
    for size in (2, 3, 17, 255, 4096):
        data = rng.integers(0, 256, size=size, dtype=np.uint8).tobytes()
        if len(set(data)) < 2:
            continue
        assert decompress_host(compress_host(data)) == data


def test_roundtrip_nul_bytes():
    # The reference cannot decode symbol 0x00 (decode.zig:182); we can.
    data = b"\x00\x00\x00ab\x00"
    assert decompress_host(compress_host(data)) == data


def test_roundtrip_skewed():
    data = b"a" * 10000 + b"b"
    assert decompress_host(compress_host(data)) == data


def test_golden_et_fixture(macbeth):
    """Checked-in golden .et for the 477-byte Macbeth corpus (374 bytes —
    the size the reference README documents for this file). Pins the exact
    wire bytes against format drift across every backend."""
    golden = (Path(__file__).parent / "data/nice.shakespeare.et").read_bytes()
    assert len(golden) == 374
    assert compress_host(macbeth) == golden
    from entreepy_tpu.ops.encode import compress_device

    assert compress_device(macbeth) == golden
    assert decompress_host(golden) == macbeth


def test_golden_et_fixtures_all_corpora():
    """Self-generated golden .et bytes for the reference's other two corpora
    (``test.zig:35-72`` round-trips all three): pins the exact wire bytes so
    encoder regressions cannot slip silently on any fixture."""
    for name in ("test", "a_midsummer_nights_dream"):
        data = (Path(__file__).parent / f"data/{name}.txt").read_bytes()
        golden = (Path(__file__).parent / f"data/{name}.et").read_bytes()
        assert compress_host(data) == golden, name
        assert decompress_host(golden) == data, name


def test_parse_header_fields(macbeth):
    et = compress_host(macbeth)
    hdr = parse_header(et)
    assert hdr.body_len == len(macbeth)
    assert hdr.num_symbols == len(set(macbeth))
    t = build_code_table(histogram(macbeth))
    assert np.array_equal(hdr.table.codes, t.codes)
    assert np.array_equal(hdr.table.lengths, t.lengths)


def test_parse_rejects_garbage():
    with pytest.raises(FormatError):
        parse_header(b"nope")
    with pytest.raises(FormatError):
        parse_header(b"\xe7\xc0\xde\x02" + b"\x00" * 16)  # bad version
    with pytest.raises(FormatError):
        parse_header(b"\xe7\xc0\xdf\x01" + b"\x00" * 16)  # bad magic


def test_pack_body_exact_bits(midsummer):
    arr = np.frombuffer(midsummer, dtype=np.uint8)
    t = build_code_table(histogram(arr))
    body, total_bits = pack_body_host(arr, t)
    assert total_bits == t.encoded_body_bits(histogram(arr))
    assert len(body) == (total_bits + 7) // 8
    lut = build_decode_lut(t)
    assert unpack_body_host(body, lut, arr.size).tobytes() == midsummer


def test_compressed_sizes_match_reference_ratios(macbeth, midsummer):
    # Reference README.md:51: 477 B -> 374 B exactly; README.md:52 claims
    # "~68kb" for midsummer (approximate; the exact Huffman-optimal size for
    # this corpus is 66,312 B, which we must not exceed).
    assert len(compress_host(macbeth)) == 374
    assert len(compress_host(midsummer)) == 66312


def test_aligned8_fast_path_matches_fsm():
    """All-8-bit-code tables take the vectorized byte-map fast path; output
    and accept/reject must match the general FSM decoder."""
    import numpy as np

    from entreepy_tpu.format.hostcodec import _decode_aligned8, unpack_body_fsm8

    rng = np.random.default_rng(7)
    data = rng.integers(0, 256, 600_000, dtype=np.uint8).tobytes()
    et = compress_host(data)
    from entreepy_tpu.format import parse_header

    hdr = parse_header(et)
    assert hdr.table.min_len == hdr.table.max_len == 8  # uniform -> aligned
    body = et[hdr.body_start :]
    out = _decode_aligned8(body, hdr.table, hdr.body_len)
    assert out.tobytes() == data
    fsm_out = unpack_body_fsm8(body, hdr.table, hdr.body_len)
    if fsm_out is not None:
        assert np.array_equal(out, fsm_out)
    assert decompress_host(et) == data  # dispatcher takes the fast path
    # truncation and over-length must raise like the FSM path
    import pytest as _pytest

    with _pytest.raises(ValueError, match="ended early"):
        _decode_aligned8(body[:-1], hdr.table, hdr.body_len)
    with _pytest.raises(ValueError, match="corrupt"):
        _decode_aligned8(body + b"\x00", hdr.table, hdr.body_len)
