"""Sharded compress/decompress over a 1-D device mesh (shard_map + collectives).

Encode (block data parallelism — the new capability the reference names as
future work, its README's "block based parallel decoding"):

1. local byte histogram per shard -> ``psum`` over the mesh (replicated counts)
2. host builds the exact code table (tiny), replicates codes/lengths
3. every device packs its blocks locally (``pack_blocks_core``)
4. per-block bit lengths gather to host; payload shards stitch in order

Decode: chunks shard across devices; the self-sync fixed-point loop runs
*inside* jit with a tiled ``all_gather`` of per-chunk exit offsets per pass
(a few KB over ICI), then each shard emits + compacts its own contiguous
symbol range locally; the host concatenates the shard outputs.

Multi-host: the same program runs under ``jax.distributed.initialize`` —
the mesh axis spans all processes' devices and the collectives ride
ICI within a slice and DCN across hosts.
"""

from __future__ import annotations

from functools import lru_cache, partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..format.etformat import parse_header, serialize_header
from ..format.huffman import build_code_table
from ..format.lut import build_decode_lut
from ..ops.bitpack import pack_blocks_core
from ..ops.decode import DEFAULT_CHUNK_BITS, make_chunk_pass
from ..utils.stitch import split_blocks, stitch_words, words_to_bytes
from .mesh import BLOCK_AXIS, make_mesh

DEFAULT_BLOCK_BYTES = 1 << 20


def _bucket(n: int) -> int:
    return 1 << max(0, (n - 1).bit_length())


@lru_cache(maxsize=None)
def _hist_fn(mesh: Mesh, axis: str):
    def local(blocks, valid):
        idx = jax.lax.broadcasted_iota(jnp.int32, blocks.shape, 1)
        mask = idx < valid[:, None]
        counts = jnp.bincount(
            jnp.where(mask, blocks, 0).astype(jnp.int32).ravel(), length=256
        )
        counts = counts.at[0].add(jnp.sum(valid) - blocks.size)
        return jax.lax.psum(counts, axis)

    return jax.jit(
        shard_map(
            local, mesh=mesh, in_specs=(P(axis), P(axis)), out_specs=P(), check_vma=False
        )
    )


@lru_cache(maxsize=None)
def _bitlen_fn(mesh: Mesh, axis: str):
    def local(blocks, valid, lengths):
        lens = lengths[blocks].astype(jnp.int32)
        idx = jax.lax.broadcasted_iota(jnp.int32, blocks.shape, 1)
        return jnp.sum(jnp.where(idx < valid[:, None], lens, 0), axis=1)

    return jax.jit(
        shard_map(
            local,
            mesh=mesh,
            in_specs=(P(axis), P(axis), P()),
            out_specs=P(axis),
        )
    )


@lru_cache(maxsize=None)
def _pack_fn(mesh: Mesh, axis: str):
    @partial(jax.jit, static_argnames=("cap_words",))
    def f(blocks, valid, codes, lengths, cap_words):
        local = partial(pack_blocks_core, cap_words=cap_words)
        return shard_map(
            local,
            mesh=mesh,
            in_specs=(P(axis), P(axis), P(), P()),
            out_specs=(P(axis), P(axis)),
        )(blocks, valid, codes, lengths)

    return f


def _shard_blocks(arr: np.ndarray, block_bytes: int, n_dev: int):
    """Split + zero-pad so the block count is a power-of-two multiple of n_dev."""
    blocks, valid = split_blocks(arr, block_bytes)
    n = blocks.shape[0]
    n_pad = max(_bucket(n), n_dev)
    if n_pad != n:
        blocks = np.concatenate([blocks, np.zeros((n_pad - n, block_bytes), np.uint8)])
        valid = np.concatenate([valid, np.zeros(n_pad - n, np.int32)])
    return blocks, valid


def compress_sharded(
    data: bytes,
    mesh: Mesh | None = None,
    *,
    strict: bool = True,
    block_bytes: int = DEFAULT_BLOCK_BYTES,
    axis: str = BLOCK_AXIS,
) -> bytes:
    """bytes -> .et file, block-parallel across the mesh; byte-identical to
    the single-device and host paths."""
    mesh = mesh or make_mesh()
    n_dev = mesh.devices.size
    arr = np.frombuffer(data, dtype=np.uint8)
    blocks_np, valid_np = _shard_blocks(arr, block_bytes, n_dev)

    blocks = jnp.asarray(blocks_np)
    valid = jnp.asarray(valid_np)

    counts = np.asarray(_hist_fn(mesh, axis)(blocks, valid), dtype=np.int64)
    table = build_code_table(counts, strict=strict)
    codes = jnp.asarray(table.codes)
    lengths = jnp.asarray(table.lengths.astype(np.uint32))

    bit_lens = np.asarray(_bitlen_fn(mesh, axis)(blocks, valid, lengths))
    cap_words = _bucket(int(bit_lens.max()) // 32 + 2)
    payload, _ = _pack_fn(mesh, axis)(blocks, valid, codes, lengths, cap_words)

    words, total_bits = stitch_words(list(np.asarray(payload)), bit_lens)
    return serialize_header(table, arr.size) + words_to_bytes(words, total_bits)


@lru_cache(maxsize=None)
def _decode_fn(mesh: Mesh, axis: str):
    @partial(
        jax.jit,
        static_argnames=("chunk_bits", "lookup_bits", "levels", "max_syms"),
    )
    def f(words, lut_flat, n_real_bits, chunk_bits, lookup_bits, levels, max_syms):
        n_dev = mesh.devices.size
        n_chunks = (words.shape[0] - 2) * 32 // chunk_bits
        chunks_local = n_chunks // n_dev
        cap_local = chunks_local * max_syms

        def local(words, lut_flat, n_real_bits):
            n_real_bits = n_real_bits[0]
            my = jax.lax.axis_index(axis) * chunks_local
            ends_local = (my + jnp.arange(chunks_local, dtype=jnp.int32) + 1) * chunk_bits
            pass_fn = make_chunk_pass(
                words, lut_flat, ends_local, n_real_bits, lookup_bits, levels, max_syms
            )

            def sync_cond(state):
                entries, prev = state
                return jnp.any(entries != prev)

            def sync_body(state):
                entries, _ = state
                mine = jax.lax.dynamic_slice(entries, (my,), (chunks_local,))
                exits_local, _ = pass_fn(mine, emit=False)
                exits = jax.lax.all_gather(exits_local, axis, tiled=True)
                new_entries = jnp.concatenate([jnp.zeros(1, jnp.int32), exits[:-1]])
                return new_entries, entries

            entries0 = jnp.arange(n_chunks, dtype=jnp.int32) * chunk_bits
            entries, _ = jax.lax.while_loop(sync_cond, sync_body, (entries0, entries0 - 1))

            mine = jax.lax.dynamic_slice(entries, (my,), (chunks_local,))
            _, counts, counts_real, slab = pass_fn(mine, emit=True)
            ends = jnp.cumsum(counts)
            starts = ends - counts
            k = jnp.arange(cap_local, dtype=jnp.int32)
            c = jnp.minimum(
                jnp.searchsorted(ends, k, side="right").astype(jnp.int32),
                chunks_local - 1,
            )
            j = jnp.clip(k - starts[c], 0, max_syms - 1)
            out = jnp.where(k < ends[-1], slab[c, j], 0).astype(jnp.uint8)
            return out, ends[-1:], jnp.sum(counts_real)[None]

        return shard_map(
            local,
            mesh=mesh,
            in_specs=(P(), P(), P()),
            out_specs=(P(axis), P(axis), P(axis)),
            check_vma=False,
        )(words, lut_flat, n_real_bits)

    return f


def decompress_sharded(
    et: bytes,
    mesh: Mesh | None = None,
    *,
    chunk_bits: int = DEFAULT_CHUNK_BITS,
    axis: str = BLOCK_AXIS,
) -> bytes:
    """.et file -> original bytes, chunk-parallel across the mesh."""
    mesh = mesh or make_mesh()
    n_dev = mesh.devices.size
    hdr = parse_header(et)
    if hdr.body_len == 0:
        return b""
    lut = build_decode_lut(hdr.table)
    buf = np.frombuffer(et, dtype=np.uint8)[hdr.body_start :]

    chunk_words = chunk_bits // 32
    n_chunks = max(_bucket(-(-buf.size * 8 // chunk_bits)), n_dev)
    n_words = n_chunks * chunk_words
    padded = np.zeros((n_words + 2) * 4, dtype=np.uint8)
    padded[: buf.size] = buf
    words = jnp.asarray(padded.view(">u4").astype(np.uint32))

    flat = lut.flat
    cap = _bucket(flat.size)
    if cap != flat.size:
        flat = np.concatenate([flat, np.zeros(cap - flat.size, np.int32)])

    levels = -(-lut.max_len // lut.lookup_bits)
    max_syms = _bucket(chunk_bits // max(lut.min_len, 1) + 1)

    out, totals, totals_real = _decode_fn(mesh, axis)(
        words,
        jnp.asarray(flat),
        jnp.full((n_dev,), buf.size * 8, dtype=jnp.int32),
        chunk_bits,
        lut.lookup_bits,
        levels,
        max_syms,
    )
    out = np.asarray(out)
    totals = np.asarray(totals)
    if int(np.asarray(totals_real).sum()) < hdr.body_len:
        raise ValueError(
            f"bitstream ended early: decoded {int(np.asarray(totals_real).sum())} "
            f"of {hdr.body_len} symbols"
        )

    cap_local = out.size // n_dev
    pieces = [
        out[d * cap_local : d * cap_local + int(totals[d])] for d in range(n_dev)
    ]
    return np.concatenate(pieces)[: hdr.body_len].tobytes()
