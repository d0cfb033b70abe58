"""Chunk-parallel Huffman decode as an MXU one-hot-matmul FSM scan (gen 1).

Superseded as the default device decoder by the byte-granularity
state-sequence design in ops/decode8.py (half the sequential steps, ~10x
less D2H); kept as a tested alternate, selectable with ENTREEPY_FSM=nibble.

The reference decodes one symbol at a time through a u32 shift register and a
hash probe per candidate length (``decode.zig:143-203``, ~0.44 MB/s). A
TPU-native decoder must avoid both the serial bit cursor and per-element
gathers (XLA TPU gathers serialize at ~50-100ns/element). Design:

1. The body bitstream is split into fixed-size chunks of ``K`` 4-bit nibbles;
   chunk := one vector lane. Nibble columns come from a reshape, so the inner
   loop has NO gather/scatter at all.
2. Decoding is a finite-state machine over nibbles (format/fsm.py): state =
   tree node id (< 256). One step for all lanes is
   ``onehot(states) @ T`` — a [lanes, 256] x [256, 96] bf16 matmul (exact:
   every value <= 255) plus a 16-wide one-hot select. ``lax.scan`` over the
   K nibble columns keeps shapes static and lets XLA pipeline the matmuls.
3. Chunks after the first start mid-codeword with an unknown state. Prefix
   codes self-synchronize, so we iterate to a fixed point of chunk *entry
   states*: pass k feeds chunk i's exit state into chunk i+1's entry; after
   pass k the first k+1 chunks are exact, and in practice all chunks lock on
   in 2-3 passes (cf. PAPERS.md, "Revisiting Huffman Coding",
   arXiv:2010.10039 — same principle, bit-offset-based, on GPUs).
4. The emission pass writes up to 4 symbols per (lane, step) densely packed
   in one u32 + a count; the host (numpy/C++ runtime) compacts the
   variable-length runs — the reference's per-symbol count stop
   (``decode.zig:170-174``) becomes a slice of the compacted stream.

Unlike the reference's decode map, this path handles NUL bytes and arbitrary
code lengths <= 32 (see SURVEY.md §2 #7c for the reference's quirks).
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from ..format.etformat import parse_header
from ..format.fsm import COLS_PER_NIBBLE, NIBBLE_FANOUT, DecodeFsm, build_decode_fsm
from ..format.huffman import CodeTable

U32 = jnp.uint32
DEFAULT_CHUNK_BITS = 4096  # K = 1024 nibbles per chunk
MAX_SYNC_PASSES = 24


def _bucket(n: int) -> int:
    return 1 << max(0, (n - 1).bit_length())


def _use_pallas() -> bool:
    """Fused Pallas kernels on real TPUs; the XLA scan path elsewhere (CPU
    meshes, tests) and under ENTREEPY_NO_PALLAS=1."""
    import os

    if os.environ.get("ENTREEPY_NO_PALLAS"):
        return False
    return jax.default_backend() in ("tpu", "axon")


def select_fsm_decoder(fsm: "DecodeFsm"):
    """(decode_fn, full-table device array) for the current backend — the
    fused Pallas kernels on real TPUs, the XLA scan elsewhere. Both take
    (nibbles, table_full, table_sync, n_real_lanes) and return
    (packed, counts, unconverged)."""
    if _use_pallas():
        from .pallas_fsm import fsm_decode_pallas, pallas_table

        return fsm_decode_pallas, jnp.asarray(pallas_table(fsm), jnp.bfloat16)
    return fsm_decode, _table_bf16(fsm)


def words_to_nibbles(words: jax.Array, lanes: int, k: int) -> jax.Array:
    """uint32[lanes * k/8] (big-endian bit order) -> int32[lanes, k] nibbles."""
    shifts = jnp.arange(28, -1, -4, dtype=U32)  # MSB nibble first
    nib = (words.reshape(lanes, k // 8)[..., None] >> shifts) & jnp.uint32(0xF)
    return nib.reshape(lanes, k).astype(jnp.int32)


def _fsm_step(table_2d, n_cols: int, state, nibble):
    """One FSM transition for every lane. table_2d: bf16[256, 16*n_cols]."""
    lanes = state.shape[0]
    n_states = table_2d.shape[0]  # 128 or 256 (format/fsm.py width)
    oh = (state[:, None] == jnp.arange(n_states, dtype=jnp.int32)[None, :]).astype(
        jnp.bfloat16
    )
    row = jnp.dot(oh, table_2d, preferred_element_type=jnp.float32)
    row = row.reshape(lanes, NIBBLE_FANOUT, n_cols)
    sel = (nibble[:, None] == jnp.arange(NIBBLE_FANOUT, dtype=jnp.int32)[None, :]).astype(
        jnp.float32
    )
    return jnp.sum(row * sel[:, :, None], axis=1)  # [lanes, n_cols]


def self_sync_entries(sync_pass, lanes: int, n_real_lanes, max_passes: int):
    """Iterate chunk entry states to a fixed point (traceable; shared by the
    scan, Pallas, and sharded decoders).

    ``sync_pass(entries) -> new_entries`` runs one full pass; lanes past
    ``n_real_lanes`` are power-of-two bucketing pad whose all-zero content
    need not self-synchronize, so they are excluded from the convergence
    test. Returns (entries, unconverged)."""
    real = jnp.arange(lanes, dtype=jnp.int32) < n_real_lanes

    def changed(entries, prev):
        return jnp.any(jnp.logical_and(entries != prev, real))

    def cond(c):
        entries, prev, it = c
        return jnp.logical_and(it < max_passes, changed(entries, prev))

    def body(c):
        entries, _, it = c
        return sync_pass(entries), entries, it + 1

    entries0 = jnp.zeros(lanes, dtype=jnp.int32)
    entries, prev, _ = jax.lax.while_loop(
        cond, body, (sync_pass(entries0), entries0 - 1, jnp.int32(0))
    )
    return entries, changed(entries, prev)


@partial(jax.jit, static_argnames=("max_passes",))
def fsm_decode(nibbles, table_full, table_sync, n_real_lanes, max_passes: int = MAX_SYNC_PASSES):
    """Decode all chunks.

    nibbles: int32[lanes, K]; table_full: bf16[256, 16*6]; table_sync:
    bf16[256, 16] (next-state column only); n_real_lanes: i32 scalar — lanes
    beyond it are power-of-two bucketing pad, whose all-zero content need not
    (and in general does not) self-synchronize, so they are excluded from the
    fixed-point test. Returns (packed uint32[lanes, K] — up to 4 symbols
    MSB-first per step, counts int32[lanes, K], unconverged bool — True if
    the real lanes' entry states did not reach a fixed point within
    ``max_passes``; callers fall back to the exact host decoder then).
    """
    lanes, k = nibbles.shape
    xs = nibbles.T  # [K, lanes] — scan feeds one nibble column per step

    def sync_step(state, x):
        vals = _fsm_step(table_sync, 1, state, x)
        return vals[:, 0].astype(jnp.int32), None

    def sync_pass(entries):
        exits, _ = jax.lax.scan(sync_step, entries, xs)
        return jnp.concatenate([jnp.zeros(1, jnp.int32), exits[:-1]])

    entries, unconverged = self_sync_entries(sync_pass, lanes, n_real_lanes, max_passes)

    def emit_step(state, x):
        vals = _fsm_step(table_full, COLS_PER_NIBBLE, state, x)
        new_state = vals[:, 0].astype(jnp.int32)
        count = vals[:, 1].astype(jnp.int8)  # <= 4; int8 quarters the D2H
        syms = vals[:, 2:6].astype(U32)
        packed = (
            (syms[:, 0] << 24) | (syms[:, 1] << 16) | (syms[:, 2] << 8) | syms[:, 3]
        )
        return new_state, (packed, count)

    _, (packed, counts) = jax.lax.scan(emit_step, entries, xs)
    return packed.T, counts.T, unconverged


def compact_symbols(
    packed: np.ndarray, counts: np.ndarray, n_symbols: int, n_real_nibbles: int
) -> np.ndarray:
    """Host compaction: [lanes, K] packed/counts -> uint8[n_symbols] in stream
    order (dispatching to the C++ runtime when available). Raises if fewer
    than ``n_symbols`` symbols completed inside the real (unpadded) nibble
    region — the flat slot order is the nibble order, so the real region is
    exactly the first ``n_real_nibbles`` slots."""
    from .. import runtime

    pf = np.ascontiguousarray(packed.reshape(-1), dtype=np.uint32)
    cf = np.ascontiguousarray(counts.reshape(-1), dtype=np.int32)
    n_real = min(n_real_nibbles, cf.size)

    real = runtime.sum_counts(cf[:n_real])
    if real is None:
        real = int(cf[:n_real].sum())
    if real < n_symbols:
        raise ValueError(
            f"bitstream ended early: decoded {real} of {n_symbols} symbols"
        )

    native = runtime.compact_symbols(pf, cf, n_symbols)
    if native is not None:
        return native
    syms4 = np.empty((pf.size, 4), dtype=np.uint8)
    syms4[:, 0] = (pf >> 24) & 0xFF
    syms4[:, 1] = (pf >> 16) & 0xFF
    syms4[:, 2] = (pf >> 8) & 0xFF
    syms4[:, 3] = pf & 0xFF
    mask = np.arange(4, dtype=np.int32)[None, :] < cf[:, None]
    return syms4[mask][:n_symbols]


def decode_body_device(
    body: bytes | np.ndarray,
    table: CodeTable,
    n_symbols: int,
    *,
    chunk_bits: int = DEFAULT_CHUNK_BITS,
    fsm: DecodeFsm | None = None,
) -> np.ndarray:
    """Decode a packed body with ``table`` -> uint8[n_symbols] (host array)."""
    if n_symbols == 0:
        return np.zeros(0, dtype=np.uint8)
    from ..utils.trace import phase

    fsm = fsm or build_decode_fsm(table)
    buf = (
        np.frombuffer(body, dtype=np.uint8)
        if isinstance(body, (bytes, bytearray, memoryview))
        else np.asarray(body, dtype=np.uint8)
    )

    k = chunk_bits // 4  # nibbles per chunk
    chunk_bytes = chunk_bits // 8
    n_real_lanes = max(1, -(-buf.size // chunk_bytes))
    lanes = _bucket(n_real_lanes)
    padded = np.zeros(lanes * chunk_bytes, dtype=np.uint8)
    padded[: buf.size] = buf
    with phase("device_fsm_decode", n_symbols):
        words = jnp.asarray(padded.view(">u4").astype(np.uint32))
        nibbles = words_to_nibbles(words, lanes, k)
        decode_fn, table_full = select_fsm_decoder(fsm)
        packed, counts, unconverged = decode_fn(
            nibbles, table_full, _table_sync_bf16(fsm), jnp.int32(n_real_lanes)
        )
    if bool(unconverged):
        # Pathologically periodic streams can defeat chunk self-sync; the
        # exact serial host decoder is the always-correct fallback.
        from .. import format as _fmt

        lut = _fmt.build_decode_lut(table)
        return _fmt.unpack_body_host(buf.tobytes(), lut, n_symbols)
    with phase("device_fetch_compact", n_symbols):
        return compact_symbols(
            np.asarray(packed), np.asarray(counts), n_symbols, buf.size * 2
        )


def _table_bf16(fsm: DecodeFsm):
    return jnp.asarray(fsm.table, dtype=jnp.bfloat16)


def _table_sync_bf16(fsm: DecodeFsm):
    t = fsm.table.reshape(fsm.width, NIBBLE_FANOUT, COLS_PER_NIBBLE)[:, :, :1]
    return jnp.asarray(t.reshape(fsm.width, NIBBLE_FANOUT), dtype=jnp.bfloat16)


def decompress_device(et: bytes, *, chunk_bits: int = DEFAULT_CHUNK_BITS) -> bytes:
    """Complete .et file -> original bytes, decoded chunk-parallel on device."""
    hdr = parse_header(et)
    out = decode_body_device(
        et[hdr.body_start :], hdr.table, hdr.body_len, chunk_bits=chunk_bits
    )
    return out.tobytes()
