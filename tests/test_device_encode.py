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
    payload, bit_lens = encode_blocks_device(arr, table, block_bytes=4096)
    # per-block lengths must sum to the exact body size
    assert bit_lens.sum() == table.encoded_body_bits(histogram(arr))
    # stitched words render the same body as the host packer
    words, total = stitch_words(list(np.asarray(payload)), bit_lens)
    from entreepy_tpu.format import pack_body_host

    body, total_host = pack_body_host(arr, table)
    assert total == total_host
    assert words_to_bytes(words, total) == body
