"""Device encode must be byte-identical to the exact host codec."""

import numpy as np
import pytest

from entreepy_tpu.format import build_code_table, compress_host, histogram
from entreepy_tpu.ops.encode import compress_device, encode_blocks_device
from entreepy_tpu.utils.stitch import stitch_words, words_to_bytes


@pytest.mark.parametrize("name", ["tiny_text", "macbeth", "midsummer"])
def test_device_matches_host(name, request):
    data = request.getfixturevalue(name)
    assert compress_device(data) == compress_host(data)


@pytest.mark.parametrize("block_bytes", [64, 100, 4096, 1 << 20])
def test_block_size_invariance(midsummer, block_bytes):
    # The stitched stream must not depend on the block partitioning.
    assert compress_device(midsummer, block_bytes=block_bytes) == compress_host(midsummer)


def test_random_bytes_various_sizes():
    rng = np.random.default_rng(1)
    for size in (2, 31, 32, 33, 255, 1000, 65537):
        data = rng.integers(0, 256, size=size, dtype=np.uint8).tobytes()
        assert compress_device(data, block_bytes=256) == compress_host(data)


def test_block_bit_lengths_exact(midsummer):
    arr = np.frombuffer(midsummer, dtype=np.uint8)
    table = build_code_table(histogram(arr))
    flat, nwords, bit_lens = encode_blocks_device(arr, table, block_bytes=4096)
    # per-block lengths must sum to the exact body size
    assert bit_lens.sum() == table.encoded_body_bits(histogram(arr))
    # each block ships its emitted words + exactly one final partial word
    assert np.all(nwords >= -(-bit_lens // 32))
    assert np.all(nwords <= bit_lens // 32 + 1)
    # stitched words render the same body as the host packer
    from entreepy_tpu.utils.stitch import stitch_flat_payload

    words, total = stitch_flat_payload(flat, nwords, bit_lens)
    from entreepy_tpu.format import pack_body_host

    body, total_host = pack_body_host(arr, table)
    assert total == total_host
    assert words_to_bytes(words, total) == body


def test_device_compaction_matches_host_assemble(midsummer):
    """compact_payload_device must produce exactly the payload rows the host
    assemble builds (same words, same bit lengths, within its cap)."""
    import jax.numpy as jnp

    from entreepy_tpu.ops.bitpack import (
        _assemble_payloads_np,
        code_table_cols,
        compact_payload_device,
        emitted_counts,
        pack_blocks_jit,
        payload_cap,
    )
    from entreepy_tpu.utils.stitch import split_blocks

    arr = np.frombuffer(midsummer, np.uint8)
    table = build_code_table(histogram(arr))
    blocks, valid = split_blocks(arr, 1024)
    ct = jnp.asarray(code_table_cols(table.codes, table.lengths), jnp.bfloat16)
    words, emitted, acc, nbits = pack_blocks_jit(
        jnp.asarray(blocks), jnp.asarray(valid), ct
    )
    counts = np.asarray(emitted_counts(emitted))
    cap = payload_cap(int(counts.max()), 1024)
    pd, bd = compact_payload_device(words, emitted, acc, nbits, cap)
    ph, bh = _assemble_payloads_np(
        np.asarray(words), np.asarray(emitted), np.asarray(acc), np.asarray(nbits)
    )
    assert np.array_equal(np.asarray(bd, np.int64), bh)
    w = ph.shape[1]
    assert np.array_equal(np.asarray(pd)[:, :w], ph)
    assert not np.asarray(pd)[:, w:].any()


def test_device_payload_is_compact(midsummer):
    """D2H volume of the device encode ~= compressed size, not 4x input
    (VERDICT r2 item 1)."""
    data = midsummer * 10  # ~1.1 MB
    arr = np.frombuffer(data, np.uint8)
    table = build_code_table(histogram(arr))
    flat, nwords, bit_lens = encode_blocks_device(arr, table, block_bytes=4096)
    compressed_bytes = (int(bit_lens.sum()) + 7) // 8
    fetched = flat.nbytes + nwords.nbytes + bit_lens.nbytes
    assert fetched <= 1.1 * compressed_bytes + 32768, (fetched, compressed_bytes)
    assert fetched < arr.size  # and nowhere near the dense 4 B-per-input-byte


def test_compact_payload_flat_property():
    """Random emitted patterns through the two-stage flat compaction must
    reproduce the host assemble's words in lane order."""
    import jax.numpy as jnp

    from entreepy_tpu.ops.bitpack import (
        SUB_STEPS,
        _assemble_payloads_np,
        compact_payload_flat,
        flat_cap,
        grouped_counts,
        payload_cap_g,
        sub_for,
    )

    rng = np.random.default_rng(21)
    lanes, steps = 16, 2 * SUB_STEPS  # two subgroups per lane
    assert sub_for(steps) == SUB_STEPS
    words = rng.integers(0, 2**32, size=(lanes, steps), dtype=np.uint64).astype(
        np.uint32
    )
    emitted = rng.random((lanes, steps)) < 0.23
    acc = rng.integers(0, 2**32, size=lanes, dtype=np.uint64).astype(np.uint32)
    nbits = rng.integers(0, 32, size=lanes).astype(np.int32)
    counts_g = np.asarray(grouped_counts(jnp.asarray(emitted)))
    counts = emitted.sum(axis=1)
    cap = payload_cap_g(int(counts_g.max()), steps)
    cap_total = flat_cap(int(counts.sum()) + lanes)
    flat, nwords, bit_lens = compact_payload_flat(
        jnp.asarray(words),
        jnp.asarray(emitted),
        jnp.asarray(acc),
        jnp.asarray(nbits),
        cap,
        cap_total,
    )
    ph, bh = _assemble_payloads_np(words, emitted, acc, nbits)
    flat_np = np.asarray(flat)
    nw = np.asarray(nwords)
    assert np.array_equal(np.asarray(bit_lens, np.int64), bh)
    off = 0
    for l in range(lanes):
        got = flat_np[off : off + nw[l]]
        want = ph[l, : nw[l]]
        assert np.array_equal(got, want), l
        off += nw[l]
    assert not flat_np[off:].any()


def test_compact_payload_flat_overflow_poisons_bit_lens():
    """An under-sized static subgroup cap must fail loudly (bit_lens == -1),
    not silently drop words."""
    import jax.numpy as jnp

    from entreepy_tpu.ops.bitpack import compact_payload_flat, flat_cap

    lanes, steps = 4, 512
    words = np.arange(lanes * steps, dtype=np.uint32).reshape(lanes, steps)
    emitted = np.zeros((lanes, steps), bool)
    emitted[1, :40] = True  # one subgroup holds 40 emitted words
    acc = np.zeros(lanes, np.uint32)
    nbits = np.zeros(lanes, np.int32)
    _, _, bit_lens = compact_payload_flat(
        jnp.asarray(words), jnp.asarray(emitted), jnp.asarray(acc),
        jnp.asarray(nbits), 16, flat_cap(64),
    )
    assert (np.asarray(bit_lens) == -1).all()


def test_stitch_flat_matches_stitch_words():
    from entreepy_tpu.utils.stitch import stitch_flat_payload, stitch_words

    rng = np.random.default_rng(22)
    lanes, capw = 19, 6
    flat = rng.integers(0, 2**32, size=lanes * capw, dtype=np.uint64).astype(np.uint32)
    bit_lens = rng.integers(0, capw * 32 - 31, size=lanes).astype(np.int64)
    nwords = np.full(lanes, capw, dtype=np.int64)
    views = []
    for l in range(lanes):
        nw = (int(bit_lens[l]) + 31) // 32
        flat[l * capw + nw : (l + 1) * capw] = 0
        rem = int(bit_lens[l]) & 31
        if rem and nw:
            flat[l * capw + nw - 1] &= np.uint32(0xFFFFFFFF) << (32 - rem)
        views.append(flat[l * capw : (l + 1) * capw])
    ref_words, ref_total = stitch_words(views, bit_lens)
    got_words, got_total = stitch_flat_payload(flat, nwords, bit_lens)
    assert got_total == ref_total
    n = ref_total // 32 + 1
    assert np.array_equal(got_words[:n], ref_words[:n])


def test_tiled_encode_byte_identical(monkeypatch, midsummer):
    """Streaming the device encode in tiny tiles must produce byte-identical
    output (blocks are independent; tiling is exact), and the tiled
    histogram must be exact."""
    import importlib

    import entreepy_tpu.ops.encode as enc
    from entreepy_tpu.format import compress_host

    monkeypatch.setenv("ENTREEPY_TILE_BLOCKS", "4")
    enc2 = importlib.reload(enc)
    try:
        data = midsummer[:50000]
        assert enc2.compress_device(data, block_bytes=256) == compress_host(data)
        arr = np.frombuffer(data, np.uint8)
        assert np.array_equal(
            enc2.histogram_on_device(arr), np.bincount(arr, minlength=256)
        )
    finally:
        monkeypatch.delenv("ENTREEPY_TILE_BLOCKS")
        importlib.reload(enc)


def test_tiled_encode_flat_compaction_byte_identical(monkeypatch, midsummer):
    """Regression: with ENTREEPY_ENC_COMPACT=flat the per-tile flat payloads
    carry FLAT_ROUND tail slack; the tiled wrapper must trim each tile to
    its live sum(nwords) prefix or the cumsum-offset stitch reads garbage
    for every tile after the first."""
    import importlib

    import entreepy_tpu.ops.encode as enc
    from entreepy_tpu.format import compress_host

    monkeypatch.setenv("ENTREEPY_TILE_BLOCKS", "4")
    monkeypatch.setenv("ENTREEPY_ENC_COMPACT", "flat")
    enc2 = importlib.reload(enc)
    try:
        data = midsummer[:50000]
        assert enc2.compress_device(data, block_bytes=256) == compress_host(data)
    finally:
        monkeypatch.delenv("ENTREEPY_TILE_BLOCKS")
        monkeypatch.delenv("ENTREEPY_ENC_COMPACT")
        importlib.reload(enc)
