"""Sharded compress/decompress over a 1-D device mesh (shard_map + collectives).

Encode (block data parallelism — the new capability the reference names as
future work, its README's "block based parallel decoding"):

1. local byte histogram per shard -> ``psum`` over the mesh (replicated counts)
2. host builds the exact code table (tiny), replicates codes/lengths
3. every device scan-packs its blocks locally (``pack_blocks_scan``)
4. per-block bit lengths gather to host; payload shards stitch in order

Decode: FSM chunks (lanes) shard across devices; the self-sync fixed-point
loop runs *inside* jit with a tiled ``all_gather`` of per-chunk exit states
per pass (a few KB over ICI), then each shard emits its symbol slots locally
and the host compacts them in stream order.

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
from ..format.fsm import COLS_PER_NIBBLE, build_decode_fsm
from ..format.huffman import build_code_table
from ..ops.bitpack import assemble_payloads, code_table_cols, pack_blocks_scan
from ..ops.decode import (
    DEFAULT_CHUNK_BITS,
    MAX_SYNC_PASSES,
    _fsm_step,
    _table_bf16,
    _table_sync_bf16,
    compact_symbols,
    self_sync_entries,
    words_to_nibbles,
)
from ..utils.stitch import split_blocks, stitch_payload, words_to_bytes
from .mesh import BLOCK_AXIS, make_mesh

DEFAULT_BLOCK_BYTES = 4096


def _bucket(n: int) -> int:
    return 1 << max(0, (n - 1).bit_length())


@lru_cache(maxsize=None)
def _hist_fn(mesh: Mesh, axis: str):
    def local(blocks, valid):
        sym = jnp.arange(256, dtype=jnp.int32)

        def step(acc, x):
            row, v = x
            idx = jnp.arange(row.shape[0], dtype=jnp.int32)
            b = jnp.where(idx < v, row.astype(jnp.int32), -1)  # padding -> no bin
            return acc + jnp.sum(b[:, None] == sym[None, :], axis=0), None

        counts, _ = jax.lax.scan(step, jnp.zeros(256, jnp.int32), (blocks, valid))
        return jax.lax.psum(counts, axis)

    return jax.jit(
        shard_map(
            local, mesh=mesh, in_specs=(P(axis), P(axis)), out_specs=P(), check_vma=False
        )
    )


@lru_cache(maxsize=None)
def _pack_fn(mesh: Mesh, axis: str):
    @jax.jit
    def f(blocks, valid, codetbl):
        return shard_map(
            pack_blocks_scan,
            mesh=mesh,
            in_specs=(P(axis), P(axis), P()),
            out_specs=(P(axis), P(axis), P(axis), P(axis)),
            check_vma=False,
        )(blocks, valid, codetbl)

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
    codetbl = jnp.asarray(code_table_cols(table.codes, table.lengths), dtype=jnp.bfloat16)

    words, emitted, acc, nbits = _pack_fn(mesh, axis)(blocks, valid, codetbl)
    payload, bit_lens = assemble_payloads(
        np.asarray(words), np.asarray(emitted), np.asarray(acc), np.asarray(nbits)
    )
    words_out, total_bits = stitch_payload(payload, bit_lens)
    return serialize_header(table, arr.size) + words_to_bytes(words_out, total_bits)


@lru_cache(maxsize=None)
def _decode_fn(mesh: Mesh, axis: str):
    """Sharded FSM decode: lanes (chunks) shard over the mesh; each self-sync
    pass all_gathers the per-chunk exit *states* (one byte per chunk — a few
    KB over ICI) so the sequential entry chain spans the whole stream."""

    @partial(jax.jit, static_argnames=("max_passes",))
    def f(nibbles, table_full, table_sync, n_real_lanes, max_passes=MAX_SYNC_PASSES):
        n_dev = mesh.devices.size
        lanes = nibbles.shape[0]
        lanes_local = lanes // n_dev

        def local(nibbles, table_full, table_sync, n_real_lanes):
            xs = nibbles.T  # [K, lanes_local]
            my = jax.lax.axis_index(axis) * lanes_local

            def sync_step(state, x):
                vals = _fsm_step(table_sync, 1, state, x)
                return vals[:, 0].astype(jnp.int32), None

            def sync_pass(entries):
                mine = jax.lax.dynamic_slice(entries, (my,), (lanes_local,))
                exits_local, _ = jax.lax.scan(sync_step, mine, xs)
                exits = jax.lax.all_gather(exits_local, axis, tiled=True)
                return jnp.concatenate([jnp.zeros(1, jnp.int32), exits[:-1]])

            entries, unconverged = self_sync_entries(
                sync_pass, lanes, n_real_lanes[0], max_passes
            )

            def emit_step(state, x):
                vals = _fsm_step(table_full, COLS_PER_NIBBLE, state, x)
                syms = vals[:, 2:6].astype(jnp.uint32)
                packed = (
                    (syms[:, 0] << 24) | (syms[:, 1] << 16) | (syms[:, 2] << 8) | syms[:, 3]
                )
                return vals[:, 0].astype(jnp.int32), (packed, vals[:, 1].astype(jnp.int8))

            mine = jax.lax.dynamic_slice(entries, (my,), (lanes_local,))
            _, (packed, counts) = jax.lax.scan(emit_step, mine, xs)
            return packed.T, counts.T, unconverged[None]

        return shard_map(
            local,
            mesh=mesh,
            in_specs=(P(axis), P(), P(), P(axis)),
            out_specs=(P(axis), P(axis), P(axis)),
            check_vma=False,
        )(nibbles, table_full, table_sync, n_real_lanes)

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
    fsm = build_decode_fsm(hdr.table)
    buf = np.frombuffer(et, dtype=np.uint8)[hdr.body_start :]

    k = chunk_bits // 4  # nibbles per chunk
    chunk_bytes = chunk_bits // 8
    n_real_lanes = max(1, -(-buf.size // chunk_bytes))
    lanes = max(_bucket(n_real_lanes), n_dev)
    padded = np.zeros(lanes * chunk_bytes, dtype=np.uint8)
    padded[: buf.size] = buf
    words = jnp.asarray(padded.view(">u4").astype(np.uint32))
    nibbles = words_to_nibbles(words, lanes, k)

    packed, counts, unconverged = _decode_fn(mesh, axis)(
        nibbles,
        _table_bf16(fsm),
        _table_sync_bf16(fsm),
        jnp.full((n_dev,), n_real_lanes, dtype=jnp.int32),
    )
    if bool(np.asarray(unconverged).any()):
        # Pathologically periodic streams can defeat chunk self-sync; fall
        # back to the exact serial host decoder.
        from ..format import build_decode_lut, unpack_body_host

        lut = build_decode_lut(hdr.table)
        return unpack_body_host(buf.tobytes(), lut, hdr.body_len).tobytes()
    return compact_symbols(
        np.asarray(packed), np.asarray(counts), hdr.body_len, buf.size * 2
    ).tobytes()
