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
from ..format.fsm8 import build_byte_fsm
from ..format.huffman import build_code_table
from ..ops.bitpack import assemble_payloads, code_table_cols, pack_blocks_scan
from ..ops.decode8 import (
    DEFAULT_CHUNK_BYTES,
    MAX_SYNC_PASSES,
    SYNC_WINDOW,
    _scan_pass,
    _table_T_bf16,
    _use_pallas,
    bytes_to_cols,
    expand_states,
)
from ..ops.pallas_fsm8 import LANE_TILE
from ..utils.stitch import split_blocks, stitch_payload, words_to_bytes
from .mesh import BLOCK_AXIS, make_mesh

DEFAULT_BLOCK_BYTES = 4096


def _bucket(n: int) -> int:
    return 1 << max(0, (n - 1).bit_length())


def _fetch(x) -> np.ndarray:
    """Device -> host for arrays that may span multiple processes: every
    process needs the full value for the host-side stitch/expansion, so
    multi-host runs all_gather the shards over DCN first (tiny relative to
    the payloads: this is the only cross-host data movement besides the
    histogram psum and per-pass exit states)."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        return np.asarray(multihost_utils.process_allgather(x, tiled=True))
    return np.asarray(x)


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
    n_dev = mesh.devices.size

    @jax.jit
    def f(blocks, valid, codetbl):
        # Per-shard kernel: the fused Pallas pack on real TPUs when the
        # local block count tiles cleanly, the XLA scan elsewhere.
        local_pack = pack_blocks_scan
        if _use_pallas():
            from ..ops.pallas_pack import _tiles as _pack_tiles
            from ..ops.pallas_pack import pack_blocks_pallas

            try:
                _pack_tiles(blocks.shape[0] // n_dev, blocks.shape[1])
                local_pack = pack_blocks_pallas
            except ValueError:
                pass
        return shard_map(
            local_pack,
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
        _fetch(words), _fetch(emitted), _fetch(acc), _fetch(nbits)
    )
    words_out, total_bits = stitch_payload(payload, bit_lens)
    return serialize_header(table, arr.size) + words_to_bytes(words_out, total_bits)


@lru_cache(maxsize=None)
def _decode_fn(mesh: Mesh, axis: str):
    """Sharded byte-FSM decode (gen 2, see ops/decode8.py): chunk lanes shard
    over the mesh; entry states first come from a local suffix sync, then
    full passes iterate to a fixed point with an ``all_gather`` of per-chunk
    exit states per pass (one int per chunk — a few KB over ICI) so the
    sequential entry chain spans the whole stream. Each shard emits its
    per-byte state sequence locally (Pallas on real TPUs, XLA scan on CPU
    meshes); the host expands states to symbols."""

    @partial(jax.jit, static_argnames=("max_passes",))
    def f(cols, table_T, n_real_lanes, max_passes=MAX_SYNC_PASSES):
        n_dev = mesh.devices.size
        lanes = cols.shape[0]
        k = cols.shape[1]
        lanes_local = lanes // n_dev

        if _use_pallas() and lanes_local % LANE_TILE == 0:
            from ..ops.pallas_fsm8 import (
                emit_pass_pallas8,
                sync_pass_pallas8,
                unpack_states_packed,
            )

            def full_pass(xs, entries_local):
                packed, exits = emit_pass_pallas8(xs, table_T, entries_local)
                return exits, unpack_states_packed(packed, k)

            def suffix_pass(xs_suffix, zeros):
                return sync_pass_pallas8(xs_suffix, table_T, zeros)
        else:

            def full_pass(xs, entries_local):
                exits, states = _scan_pass(xs, table_T, entries_local, True)
                return exits, states.astype(jnp.uint8)

            def suffix_pass(xs_suffix, zeros):
                exits, _ = _scan_pass(xs_suffix, table_T, zeros, False)
                return exits

        def local(cols, table_T_, n_real_lanes):
            xs = cols.T  # [K, lanes_local]
            my = jax.lax.axis_index(axis) * lanes_local
            real = jnp.arange(lanes, dtype=jnp.int32) < n_real_lanes[0]

            w = min(SYNC_WINDOW, k)
            sfx_local = suffix_pass(xs[k - w :], jnp.zeros(lanes_local, jnp.int32))
            sfx = jax.lax.all_gather(sfx_local, axis, tiled=True)
            entries0 = jnp.concatenate([jnp.zeros(1, jnp.int32), sfx[:-1]])

            def cond(c):
                entries, prev, _, it = c
                return jnp.logical_and(
                    it < max_passes, jnp.any(jnp.logical_and(entries != prev, real))
                )

            def body(c):
                entries, _, _, it = c
                mine = jax.lax.dynamic_slice(entries, (my,), (lanes_local,))
                exits_local, states = full_pass(xs, mine)
                exits = jax.lax.all_gather(exits_local, axis, tiled=True)
                new_entries = jnp.concatenate([jnp.zeros(1, jnp.int32), exits[:-1]])
                return new_entries, entries, states, it + 1

            states0 = jnp.zeros((k, lanes_local), jnp.uint8)
            entries, prev, states, _ = jax.lax.while_loop(
                cond, body, (entries0, entries0 - 1, states0, jnp.int32(0))
            )
            unconverged = jnp.any(jnp.logical_and(entries != prev, real))
            return states.T, unconverged[None]

        return shard_map(
            local,
            mesh=mesh,
            in_specs=(P(axis), P(), P(axis)),
            out_specs=(P(axis), P(axis)),
            check_vma=False,
        )(cols, table_T, n_real_lanes)

    return f


def decompress_sharded(
    et: bytes,
    mesh: Mesh | None = None,
    *,
    chunk_bytes: int = DEFAULT_CHUNK_BYTES,
    axis: str = BLOCK_AXIS,
    chunk_bits: int | None = None,  # back-compat: bits = 8 * chunk_bytes
) -> bytes:
    """.et file -> original bytes, chunk-parallel across the mesh."""
    mesh = mesh or make_mesh()
    n_dev = mesh.devices.size
    hdr = parse_header(et)
    if hdr.body_len == 0:
        return b""
    if chunk_bits is not None:
        chunk_bytes = max(1, chunk_bits // 8)
    fsm = build_byte_fsm(hdr.table)
    buf = np.frombuffer(et, dtype=np.uint8)[hdr.body_start :]

    n_real_lanes = max(1, -(-buf.size // chunk_bytes))
    # Lanes must split evenly over devices (and into Pallas lane tiles on
    # real TPUs); padding lanes hold zeros and are excluded from self-sync.
    unit = n_dev * (LANE_TILE if _use_pallas() else 1)
    lanes = max(unit, -(-n_real_lanes // unit) * unit)
    padded = np.zeros(lanes * chunk_bytes, dtype=np.uint8)
    padded[: buf.size] = buf
    cols = bytes_to_cols(padded, lanes, chunk_bytes)

    states, unconverged = _decode_fn(mesh, axis)(
        cols, _table_T_bf16(fsm), jnp.full((n_dev,), n_real_lanes, dtype=jnp.int32)
    )
    if bool(_fetch(unconverged).any()):
        # Pathologically periodic streams can defeat chunk self-sync; fall
        # back to the exact serial host decoder.
        from ..format import build_decode_lut, unpack_body_host
        from ..format.hostcodec import _check_stream_bits

        lut = build_decode_lut(hdr.table)
        out = unpack_body_host(buf.tobytes(), lut, hdr.body_len)
        _check_stream_bits(out, hdr.table.lengths, buf.size)
        return out.tobytes()
    return expand_states(_fetch(states), buf, fsm, hdr.body_len).tobytes()
