"""Device-side encode kernels: histogram, per-block bit sizing, and the
prefix-sum + scatter bit-packer.

TPU-first replacement for the reference's serial hot loop
(``encode.zig:301-319``: one ``writeBits(..., 1)`` call per output bit).
Here every symbol's absolute bit offset comes from an exclusive prefix sum of
code lengths — a parallel scan — and each code is deposited into at most two
consecutive big-endian u32 words with a scatter-add (codes never overlap, so
add == bitwise-or). All arithmetic is uint32 (no x64 dependency); shift
amounts are clamped to [0, 31] because XLA leaves >= bitwidth shifts
undefined.

Blocks are independent: block b packs into ``payload[b, :cap_words]`` and
reports its exact bit length, so blocks shard cleanly across TPU cores and
the final streams are stitched at bit granularity afterwards (host or
device). Within a block the pack is bit-exact with the reference's single
serial stream.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

U32 = jnp.uint32
_ONE = jnp.uint32(1)


@partial(jax.jit, static_argnames=("valid_len",))
def histogram_device(data: jax.Array, valid_len: int) -> jax.Array:
    """256-bin histogram of ``data[:valid_len]`` (uint8, padded) -> int32[256]."""
    counts = jnp.bincount(data.astype(jnp.int32), length=256)
    pad = data.shape[0] - valid_len
    return counts.at[0].add(-pad)


@jax.jit
def block_bit_lengths(blocks: jax.Array, valid: jax.Array, lengths: jax.Array) -> jax.Array:
    """Exact packed bit length of each block.

    blocks: uint8[n_blocks, block_bytes] (zero-padded), valid: int32[n_blocks]
    count of real bytes per block, lengths: uint32[256] per-symbol code length.
    """
    lens = lengths[blocks]  # [n_blocks, block_bytes] gather
    idx = jax.lax.broadcasted_iota(jnp.int32, blocks.shape, 1)
    lens = jnp.where(idx < valid[:, None], lens, 0)
    return jnp.sum(lens.astype(jnp.int32), axis=1)


def pack_blocks_core(
    blocks: jax.Array,  # uint8[n_blocks, block_bytes] zero-padded
    valid: jax.Array,  # int32[n_blocks]
    codes: jax.Array,  # uint32[256]
    lengths: jax.Array,  # uint32[256]
    cap_words: int,
) -> tuple[jax.Array, jax.Array]:
    """Pack every block independently (traceable core — also used per-shard
    inside shard_map by the multi-device path).

    Returns (payload uint32[n_blocks, cap_words] big-endian bit order,
    bit_lens int32[n_blocks]). ``cap_words`` must be >= ceil(max block bit
    length / 32) + 1; the +1 slack word absorbs the final code's low-word
    spill so blocks never write into a neighbour's row.
    """
    n_blocks, block_bytes = blocks.shape

    code = codes[blocks].astype(U32)
    lens = lengths[blocks].astype(U32)
    idx = jax.lax.broadcasted_iota(jnp.int32, blocks.shape, 1)
    mask = idx < valid[:, None]
    code = jnp.where(mask, code, 0)
    lens = jnp.where(mask, lens, 0)

    ends = jnp.cumsum(lens.astype(jnp.int32), axis=1)
    bit_lens = ends[:, -1]
    offs = ends - lens.astype(jnp.int32)  # exclusive prefix sum

    word_in_block = offs >> 5
    bitpos = (offs & 31).astype(U32)

    # Deposit each code into a 64-bit window starting at word_in_block's MSB,
    # split into (hi, lo) u32 halves with clamped shifts.
    l_plus_p = lens + bitpos
    fits_hi = l_plus_p <= 32
    sh_hi = jnp.clip(jnp.where(fits_hi, 32 - l_plus_p, 0), 0, 31).astype(U32)
    sh_dn = jnp.clip(jnp.where(fits_hi, 0, l_plus_p - 32), 0, 31).astype(U32)
    sh_lo = jnp.clip(jnp.where(fits_hi, 0, 64 - l_plus_p), 0, 31).astype(U32)
    hi = jnp.where(fits_hi, code << sh_hi, code >> sh_dn)
    lo = jnp.where(fits_hi, jnp.uint32(0), code << sh_lo)

    flat_base = jax.lax.broadcasted_iota(jnp.int32, blocks.shape, 0) * cap_words
    flat_idx = flat_base + word_in_block
    words = jnp.zeros((n_blocks * cap_words,), dtype=U32)
    words = words.at[flat_idx].add(hi, mode="drop")
    words = words.at[flat_idx + 1].add(lo, mode="drop")
    return words.reshape(n_blocks, cap_words), bit_lens


pack_blocks = jax.jit(pack_blocks_core, static_argnames=("cap_words",))
