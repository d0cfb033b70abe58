"""Single-device compress pipeline: device histogram + block pack, host code
construction + stitch.

Pipeline (TPU-first redesign of ``encode.zig:25-337``):

1. device: 256-bin histogram of the input bytes
2. host:   exact deterministic code construction (tiny — 256 symbols)
3. device: per-block exact bit lengths (gather + row sum)
4. device: block-parallel prefix-sum + scatter bit pack
5. host:   bit-granular stitch + header serialization

The per-block payload capacity is data-dependent (max block bit length), so
it is bucketed to limit recompiles: one compile per (n_blocks, block_bytes,
cap_words bucket) triple.
"""

from __future__ import annotations

import numpy as np

from ..format.etformat import serialize_header
from ..format.huffman import CodeTable, build_code_table
from ..utils.stitch import split_blocks, stitch_words, words_to_bytes
from .bitpack import block_bit_lengths, histogram_device, pack_blocks

DEFAULT_BLOCK_BYTES = 1 << 20


def _bucket(n: int) -> int:
    """Round up to a power of two to bound jit recompiles."""
    return 1 << max(0, (n - 1).bit_length())


def encode_blocks_device(
    arr: np.ndarray, table: CodeTable, block_bytes: int = DEFAULT_BLOCK_BYTES
):
    """Pack ``arr`` (uint8[n]) block-parallel on device.

    Returns (payload uint32[n_blocks, cap_words] on device, bit_lens int32
    numpy). Stitching is left to the caller so multi-device paths can reuse
    this per shard.
    """
    import jax.numpy as jnp

    blocks_np, valid_np = split_blocks(arr, block_bytes)
    # Bucket the block count to a power of two (extra blocks are empty:
    # valid=0) so jit compiles once per bucket, not once per file size.
    n_bucket = _bucket(blocks_np.shape[0])
    if n_bucket != blocks_np.shape[0]:
        pad = n_bucket - blocks_np.shape[0]
        blocks_np = np.concatenate([blocks_np, np.zeros((pad, block_bytes), np.uint8)])
        valid_np = np.concatenate([valid_np, np.zeros(pad, np.int32)])
    blocks = jnp.asarray(blocks_np)
    valid = jnp.asarray(valid_np)
    codes = jnp.asarray(table.codes)
    lengths = jnp.asarray(table.lengths.astype(np.uint32))

    bit_lens = np.asarray(block_bit_lengths(blocks, valid, lengths))
    max_bits = int(bit_lens.max()) if bit_lens.size else 0
    cap_words = _bucket(max_bits // 32 + 2)
    payload, bit_lens_dev = pack_blocks(blocks, valid, codes, lengths, cap_words)
    return payload, np.asarray(bit_lens_dev)


def compress_device(
    data: bytes, *, strict: bool = True, block_bytes: int = DEFAULT_BLOCK_BYTES
) -> bytes:
    """bytes -> complete .et file; byte-identical to the host/reference output."""
    import jax.numpy as jnp

    arr = np.frombuffer(data, dtype=np.uint8)
    padded = np.zeros(-(-max(arr.size, 1) // 4) * 4, dtype=np.uint8)
    padded[: arr.size] = arr
    counts = np.asarray(histogram_device(jnp.asarray(padded), arr.size), dtype=np.int64)
    table = build_code_table(counts, strict=strict)

    payload, bit_lens = encode_blocks_device(arr, table, block_bytes)
    payload_np = np.asarray(payload)
    words, total_bits = stitch_words(list(payload_np), bit_lens)
    return serialize_header(table, arr.size) + words_to_bytes(words, total_bits)
