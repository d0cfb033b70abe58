"""Device-side encode: histogram + block-parallel bit packing, gather-free.

TPU-first replacement for the reference's serial hot loop
(``encode.zig:301-319``: one ``writeBits(..., 1)`` call per output bit) that
also avoids XLA gathers/scatters, which serialize per element on TPU:

* per-byte (code, length) lookup = ``onehot(byte) @ code_table`` — a
  [lanes, 256] x [256, 5] bf16 matmul on the MXU. The 32-bit code is split
  into four 8-bit limb columns so every table value is <= 255 and bf16
  accumulation is exact.
* blocks = vector lanes; ``lax.scan`` walks the byte columns (a reshape, not
  a gather) carrying a 64-bit accumulator (two u32 halves) per lane. A full
  u32 word is emitted *densely* per (step, lane) with a flag; the host
  runtime compacts flagged words into the per-block payloads.

Within a block the pack is bit-exact with the reference's single serial
stream; independent blocks shard across TPU cores and are stitched at bit
granularity afterwards (utils/stitch.py).
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

U32 = jnp.uint32
HIST_COLS = 4096  # bytes per histogram scan step


@jax.jit
def histogram_device(data: jax.Array, valid_len: jax.Array) -> jax.Array:
    """256-bin histogram of ``data[:valid_len]`` -> int32[256].

    ``data`` is uint8, zero-padded to a multiple of HIST_COLS. Compare-reduce
    over byte columns instead of bincount: XLA lowers bincount to a scatter,
    which serializes on TPU.
    """
    cols = data.reshape(-1, HIST_COLS)
    sym = jnp.arange(256, dtype=jnp.int32)

    def step(acc, row):
        return acc + jnp.sum(row[:, None].astype(jnp.int32) == sym[None, :], axis=0), None

    counts, _ = jax.lax.scan(step, jnp.zeros(256, jnp.int32), cols)
    pad = data.shape[0] - valid_len
    return counts.at[0].add(-pad.astype(jnp.int32))


def code_table_cols(codes: np.ndarray, lengths: np.ndarray) -> np.ndarray:
    """[256, 5] float32 columns: code length + 4 big-endian byte limbs of the
    right-aligned 32-bit code. All values <= 255 -> exact in bf16 matmuls."""
    t = np.zeros((256, 5), dtype=np.float32)
    t[:, 0] = lengths
    for i in range(4):
        t[:, 1 + i] = (codes >> (24 - 8 * i)) & 0xFF
    return t


def pack_blocks_scan(
    blocks: jax.Array,  # uint8[lanes, steps] zero-padded
    valid: jax.Array,  # int32[lanes] real byte count per block
    codetbl: jax.Array,  # bf16[256, 5] from code_table_cols
):
    """Pack every block independently (traceable core — also used per-shard
    inside shard_map by the multi-device path).

    Returns (words uint32[lanes, steps] — dense emission slots, emitted
    bool[lanes, steps], acc uint32[lanes] — final partial word MSB-aligned,
    nbits int32[lanes] — bits held in acc). Block b's bitstream is its
    flagged words in step order followed by nbits of acc.
    """
    lanes, steps = blocks.shape
    sym = jnp.arange(256, dtype=jnp.int32)
    xs = (blocks.T.astype(jnp.int32), jnp.arange(steps, dtype=jnp.int32))

    def step(carry, x):
        acc_hi, acc_lo, nbits = carry
        byte, j = x
        oh = (byte[:, None] == sym[None, :]).astype(jnp.bfloat16)
        vals = jnp.dot(oh, codetbl, preferred_element_type=jnp.float32)
        live = j < valid
        length = jnp.where(live, vals[:, 0].astype(jnp.int32), 0)
        limbs = vals[:, 1:5].astype(U32)
        code = jnp.where(
            live,
            (limbs[:, 0] << 24) | (limbs[:, 1] << 16) | (limbs[:, 2] << 8) | limbs[:, 3],
            jnp.uint32(0),
        )

        s = nbits + length  # <= 63
        fits = s <= 32
        hi = jnp.where(
            fits,
            code << jnp.clip(32 - s, 0, 31).astype(U32),
            code >> jnp.clip(s - 32, 0, 31).astype(U32),
        )
        lo = jnp.where(fits, jnp.uint32(0), code << jnp.clip(64 - s, 0, 31).astype(U32))
        acc_hi = acc_hi | hi
        acc_lo = acc_lo | lo

        emit = s >= 32
        word = acc_hi
        acc_hi = jnp.where(emit, acc_lo, acc_hi)
        acc_lo = jnp.where(emit, jnp.uint32(0), acc_lo)
        nbits = jnp.where(emit, s - 32, s)
        return (acc_hi, acc_lo, nbits), (word, emit)

    zero_u = jnp.zeros(lanes, U32)
    init = (zero_u, zero_u, jnp.zeros(lanes, jnp.int32))
    (acc_hi, _, nbits), (words, emitted) = jax.lax.scan(step, init, xs)
    return words.T, emitted.T, acc_hi, nbits


pack_blocks_jit = jax.jit(pack_blocks_scan)


def assemble_payloads(
    words: np.ndarray, emitted: np.ndarray, acc: np.ndarray, nbits: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Host compaction of the dense emission slots.

    Returns (payload uint32[lanes, cap_words] — each row the block's packed
    stream, bit_lens int64[lanes]). Dispatches to the C++ runtime
    (entreepy_tpu/runtime) when available, else vectorized numpy.
    """
    from .. import runtime

    native = runtime.assemble_payloads(words, emitted, acc, nbits)
    if native is not None:
        return native
    return _assemble_payloads_np(words, emitted, acc, nbits)


def _assemble_payloads_np(
    words: np.ndarray, emitted: np.ndarray, acc: np.ndarray, nbits: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    lanes, steps = emitted.shape
    counts = emitted.sum(axis=1).astype(np.int64)
    bit_lens = (counts * 32 + nbits).astype(np.int64)
    cap = int(counts.max()) + 1 if lanes else 1

    payload = np.zeros((lanes, cap), dtype=np.uint32)
    rows, _ = np.nonzero(emitted)
    starts = np.cumsum(counts) - counts
    within = np.arange(rows.size, dtype=np.int64) - starts[rows]
    payload[rows, within] = words[emitted]
    payload[np.arange(lanes), counts] = acc  # final partial word (nbits bits)
    return payload, bit_lens.astype(np.int64)
