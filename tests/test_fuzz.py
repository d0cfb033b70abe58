"""Cross-backend fuzz: every backend must agree byte-for-byte on random
corpora from diverse distributions, and must agree on accept/reject for
corrupted streams (host serial walk is the behavioral reference)."""

import numpy as np
import pytest

import entreepy_tpu as et
from entreepy_tpu.format import (
    build_decode_lut,
    compress_host,
    parse_header,
    unpack_body_host,
)
from entreepy_tpu.ops.decode8 import decode_body_device
from entreepy_tpu.parallel import decompress_sharded


def _corpus(rng, kind: str, n: int) -> bytes:
    if kind == "uniform":
        return rng.integers(0, 256, n, dtype=np.uint8).tobytes()
    if kind == "zipf":
        p = 1.0 / np.arange(1, 65) ** 1.5
        p /= p.sum()
        return rng.choice(64, size=n, p=p).astype(np.uint8).tobytes()
    if kind == "runs":
        parts = []
        total = 0
        while total < n:
            ln = int(rng.integers(1, 300))
            parts.append(bytes([int(rng.integers(0, 8))]) * ln)
            total += ln
        return b"".join(parts)[:n]
    if kind == "binary":  # 2-symbol stream: 1-bit codes, 8 symbols/byte
        return rng.integers(0, 2, n, dtype=np.uint8).tobytes()
    raise AssertionError(kind)


@pytest.mark.parametrize("kind", ["uniform", "zipf", "runs", "binary"])
def test_fuzz_backends_agree(kind):
    rng = np.random.default_rng(hash(kind) % (2**32))
    for trial in range(3):
        n = int(rng.integers(100, 50_000))
        data = _corpus(rng, kind, n)
        ref = compress_host(data)
        assert et.compress(data, backend="device") == ref
        assert et.compress(data, backend="sharded") == ref
        assert et.decompress(ref, backend="host") == data
        assert et.decompress(ref, backend="device") == data
        assert et.decompress(ref, backend="sharded") == data


@pytest.mark.parametrize("kind", ["uniform", "zipf", "runs", "binary"])
def test_fuzz_onepass_and_tiled_agree(kind):
    """The one-pass full pipeline and the tiled streaming variant must
    round-trip diverse random corpora at random chunk/tile widths (binary
    streams hit m=8 — the unpacked fused rows)."""
    from entreepy_tpu.ops.decode8 import (
        decode_body_device_full, decode_body_device_tiled,
    )

    rng = np.random.default_rng((hash(kind) + 4) % (2**32))
    for trial in range(3):
        n = int(rng.integers(100, 50_000))
        data = _corpus(rng, kind, n)
        if len(set(data)) < 2:
            continue
        et_ = compress_host(data)
        hdr = parse_header(et_)
        body = et_[hdr.body_start :]
        cb = int(rng.choice([16, 64, 512]))
        out = decode_body_device_full(body, hdr.table, hdr.body_len, chunk_bytes=cb)
        assert bytes(out) == data
        tl = int(rng.choice([8, 256]))
        out2 = decode_body_device_tiled(
            body, hdr.table, hdr.body_len, chunk_bytes=cb, tile_lanes=tl
        )
        assert bytes(out2) == data


@pytest.mark.parametrize("kind", ["uniform", "zipf"])
def test_fuzz_corruption_consistency(kind):
    """For random single-byte corruptions, device and sharded detection must
    be at least as strict as the serial host walk, and any accepted output
    must match it."""
    rng = np.random.default_rng(99 + len(kind))
    data = _corpus(rng, kind, 20_000)
    good = compress_host(data)
    hdr = parse_header(good)
    lut = build_decode_lut(hdr.table)
    for trial in range(6):
        pos = int(rng.integers(hdr.body_start + 2, len(good) - 8))
        bad = good[:pos] + bytes([good[pos] ^ (1 << int(rng.integers(8)))]) + good[pos + 1 :]
        body = bad[hdr.body_start :]
        try:
            ref = unpack_body_host(body, lut, hdr.body_len).tobytes()
        except ValueError:
            ref = None
        for decode in (
            lambda: decode_body_device(body, hdr.table, hdr.body_len).tobytes(),
            lambda: decompress_sharded(bad, chunk_bytes=64),
        ):
            try:
                got = decode()
            except ValueError:
                got = None
            if ref is None:
                assert got is None, "host rejected but a device path accepted"
            elif got is not None:
                assert got == ref


def test_overlong_stream_rejected_everywhere():
    """Trailing extra body bytes must be rejected by EVERY backend — the
    exact-bit invariant is not allowed to be size- or backend-dependent
    (round-2 review finding: the small-body host LUT path used to accept)."""
    good = compress_host(b"ab" * 500)
    bad = good + b"\x00" * 4
    for backend in ("host", "device", "sharded"):
        with pytest.raises(ValueError):
            et.decompress(bad, backend=backend)
        assert et.decompress(good, backend=backend) == b"ab" * 500


def test_relaxed_single_symbol_all_backends():
    """strict=False single-symbol files produce a non-full tree (unreachable
    trie edges exist); every decode path must still round-trip."""
    data = b"a" * 1000
    ref = compress_host(data, strict=False)
    hdr = parse_header(ref)
    assert decode_body_device(ref[hdr.body_start :], hdr.table, hdr.body_len).tobytes() == data
    assert decompress_sharded(ref, chunk_bytes=16) == data
    assert et.decompress(ref, backend="host") == data
