"""Self-sync chunked decoder must invert both the host and device encoders."""

import numpy as np
import pytest

from entreepy_tpu.format import build_code_table, compress_host, histogram
from entreepy_tpu.ops.decode8 import decode_body_device, decompress_device
from entreepy_tpu.format import pack_body_host


@pytest.mark.parametrize("name", ["tiny_text", "macbeth", "midsummer"])
def test_decompress_corpora(name, request):
    data = request.getfixturevalue(name)
    assert decompress_device(compress_host(data)) == data


@pytest.mark.parametrize("chunk_bytes", [16, 64, 512])
def test_chunk_size_invariance(midsummer, chunk_bytes):
    # Output must not depend on the chunking; small chunks force many
    # sync passes and cross-chunk codeword straddles.
    assert decompress_device(compress_host(midsummer), chunk_bytes=chunk_bytes) == midsummer


def test_decode_random_bytes():
    rng = np.random.default_rng(2)
    for size in (2, 100, 4097, 50000):
        data = rng.integers(0, 256, size=size, dtype=np.uint8).tobytes()
        assert decompress_device(compress_host(data), chunk_bytes=64) == data


def test_decode_skewed_codes():
    # long/short code mix: deep tree exercises the byte-FSM's multi-symbol
    # emissions and cross-chunk codeword straddles
    data = (b"a" * 4000 + b"b" * 700 + b"c" * 80 + b"d" * 9 + b"e" * 3 + b"fg") * 5
    assert decompress_device(compress_host(data), chunk_bytes=32) == data


def test_decode_nul_symbols():
    data = b"\x00" * 500 + bytes(range(1, 40)) * 10 + b"\x00" * 3
    assert decompress_device(compress_host(data)) == data


def test_decode_body_direct(midsummer):
    arr = np.frombuffer(midsummer, dtype=np.uint8)
    table = build_code_table(histogram(arr))
    body, _ = pack_body_host(arr, table)
    out = decode_body_device(body, table, arr.size)
    assert out.tobytes() == midsummer


def test_truncated_body_raises(macbeth):
    et = compress_host(macbeth)
    from entreepy_tpu.format import parse_header

    hdr = parse_header(et)
    with pytest.raises(ValueError, match="ended early"):
        decode_body_device(et[hdr.body_start : hdr.body_start + 10], hdr.table, hdr.body_len)
