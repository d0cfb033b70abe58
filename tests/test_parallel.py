"""Multi-device sharded codec on the 8-device virtual CPU mesh."""

import numpy as np
import pytest

import jax

from entreepy_tpu.format import compress_host
from entreepy_tpu.parallel import compress_sharded, decompress_sharded, make_mesh


@pytest.fixture(scope="module")
def mesh8():
    assert len(jax.devices()) == 8, "conftest must provide 8 virtual devices"
    return make_mesh(8)


def test_sharded_compress_matches_host(midsummer, mesh8):
    assert compress_sharded(midsummer, mesh8, block_bytes=4096) == compress_host(midsummer)


def test_sharded_roundtrip(midsummer, mesh8):
    et = compress_sharded(midsummer, mesh8, block_bytes=8192)
    assert decompress_sharded(et, mesh8) == midsummer


def test_sharded_decode_of_host_stream(macbeth, mesh8):
    # decode path must handle streams it didn't produce
    assert decompress_sharded(compress_host(macbeth), mesh8, chunk_bits=128) == macbeth


def test_sharded_small_input_fewer_blocks_than_devices(mesh8):
    data = b"hello hello hello"
    et = compress_sharded(data, mesh8, block_bytes=1 << 20)
    assert et == compress_host(data)
    assert decompress_sharded(et, mesh8) == data


def test_sharded_random(mesh8):
    rng = np.random.default_rng(3)
    data = rng.integers(0, 256, size=200_000, dtype=np.uint8).tobytes()
    et = compress_sharded(data, mesh8, block_bytes=16384)
    assert et == compress_host(data)
    assert decompress_sharded(et, mesh8, chunk_bits=2048) == data


def test_mesh_subset_sizes(midsummer):
    for n in (1, 2, 4):
        mesh = make_mesh(n)
        et = compress_sharded(midsummer, mesh, block_bytes=16384)
        assert et == compress_host(midsummer)
        assert decompress_sharded(et, mesh) == midsummer


def test_multihost_single_process(midsummer):
    # The pod entry points must degrade to single-process SPMD over the
    # virtual mesh (init is a no-op there) with identical bytes.
    from entreepy_tpu.parallel import multihost as mh

    mh.init()
    et = mh.compress(midsummer, block_bytes=8192)
    assert et == compress_host(midsummer)
    assert mh.decompress(et) == midsummer


def test_sharded_encode_fetch_tracks_compressed_size(midsummer, mesh8):
    """VERDICT r2 item 1: the sharded encode must ship ~compressed bytes
    off-device, not the 4 B-per-input-byte dense emission slots."""
    from entreepy_tpu.parallel import dist

    data = midsummer * 10  # ~1.1 MB
    et = compress_sharded(data, mesh8, block_bytes=4096)
    assert et == compress_host(data)
    st = dist.last_encode_stats
    compressed = (st["payload_bits"] + 7) // 8
    # Slack: per-shard 1024-word rounding (8 shards x 4 KiB) + block
    # metadata; still far below the input size and ~4x below dense.
    assert st["fetched_bytes"] <= 1.1 * compressed + 8 * 4096 + 65536, st
    assert st["fetched_bytes"] < len(data)
    assert st["dense_bytes"] > 4 * st["fetched_bytes"]  # what we no longer ship


def test_sharded_device_expand_matches_host(midsummer, mesh8):
    """device_expand=True: every shard emits its own chunks' output bytes
    on-device; result must be byte-identical to the host path."""
    data = midsummer * 3
    et = compress_host(data)
    out = decompress_sharded(et, mesh8, device_expand=True)
    assert out == data
    # degenerate shapes: chunk smaller than the sync window, tiny corpus
    et2 = compress_host(midsummer[:5000])
    assert decompress_sharded(et2, mesh8, chunk_bytes=32, device_expand=True) == midsummer[:5000]


def test_sharded_onepass_modes_match_host(monkeypatch, midsummer, mesh8):
    """The sharded one-pass route (packed and unpacked) and the legacy
    two-pass route all produce host-identical bytes."""
    data = midsummer * 2
    et = compress_host(data)
    for packed in ("1", "0"):
        monkeypatch.setenv("ENTREEPY_FUSED_PACKED", packed)
        monkeypatch.setenv("ENTREEPY_EXPAND", "onepass")
        assert decompress_sharded(et, mesh8, device_expand=True) == data
    monkeypatch.setenv("ENTREEPY_EXPAND", "split")  # legacy two-pass
    assert decompress_sharded(et, mesh8, device_expand=True) == data


def test_sharded_device_expand_truncated_raises(macbeth, mesh8):
    et = compress_host(macbeth * 8)
    from entreepy_tpu.format import parse_header

    hdr = parse_header(et)
    cut = et[: hdr.body_start + (len(et) - hdr.body_start) // 2]
    with pytest.raises(ValueError, match="ended early|corrupt"):
        decompress_sharded(cut, mesh8, device_expand=True)


def test_sharded_big_body_routes_to_tiled(monkeypatch, midsummer, mesh8):
    """Compressed bodies >= _INT32_SAFE_BODY must route to the tile-local
    streaming decode (global int32 shard positions would wrap); threshold
    shrunk so the routing runs at test scale."""
    import entreepy_tpu.parallel.dist as dist

    et = compress_host(midsummer)
    monkeypatch.setattr(dist, "_INT32_SAFE_BODY", 1024)
    assert dist.decompress_sharded(et, mesh8) == midsummer
