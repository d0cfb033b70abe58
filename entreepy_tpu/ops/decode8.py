"""Chunk-parallel Huffman decode, byte-granularity FSM (second generation).

Replaced the gen-1 nibble FSM scan (removed in 0.3 — see git history)
with half the sequential steps, ~10x less device->host traffic, and an
exact corrupt-stream error. The reference's serial hot loop is
``decode.zig:143-203`` (~0.44 MB/s); design here:

1. The body splits into fixed-size byte chunks; chunk := one vector lane.
   Byte columns come from a reshape — no gather/scatter anywhere.
2. One FSM transition for all lanes is ``onehot(byte) @ T^T`` — a
   [lanes, 256] x [256, S] bf16 matmul (exact: every value <= 255) plus an
   S-wide one-hot row select. Crucially the matmul does not depend on the
   running state (only the row select does), so consecutive bytes' matmuls
   pipeline on the MXU with no serial stall (see ops/pallas_fsm8.py).
3. Chunks after the first start mid-codeword with an unknown state. Prefix
   codes self-synchronize, so entry states are solved to a fixed point — but
   unlike the first-generation decoder, the initial guess comes from a cheap
   *suffix* sync pass (the last SYNC_WINDOW bytes of each chunk: the exit
   state only depends on the recent past once the chunk has locked on), so
   the typical total cost is ~1.15 passes instead of 3.
4. The kernels output only the per-byte *state sequence* (uint8 per
   compressed byte — the nibble decoder shipped 5 bytes per nibble). Symbols
   are reconstructed host-side with one vectorized ``syms[state, byte]``
   lookup (C++ runtime et_fsm8_expand, numpy fallback), which also enforces
   the two decode invariants the first generation lacked on device:

   * no invalid transition is consumed before the symbol count is met
     ("invalid bitstream", matching the host LUT walk / native.cpp:93), and
   * the decoded symbols' code lengths sum to the body's exact bit count
     (+ <8 pad bits) — a truncated-but-plausible stream cannot validate.
"""

from __future__ import annotations

import os
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from ..format.etformat import parse_header
from ..format.fsm8 import ByteFsm, build_byte_fsm
from ..format.huffman import CodeTable

DEFAULT_CHUNK_BYTES = 512
# Suffix bytes per chunk for the entry-state first guess. ONE missed guess
# anywhere forces a whole extra fused pass over every lane (the fixed point
# re-runs full passes), so the window is sized for zero misses, not for
# minimal sync work: on the 5.2 MB text corpus w=64 missed exactly 1 of
# 5958 lanes (cost: +1.3 ms = a second full pass on chip) while w=128
# missed none (cost: +0.16 ms of sync pass). Measured 2026-08-19 on v5e.
SYNC_WINDOW = int(os.environ.get("ENTREEPY_SYNC_WINDOW", "128"))
MAX_SYNC_PASSES = 24
# Compaction subgroup width: narrow sorts are cheaper on TPU (sort networks
# grow ~log^2 of sorted width). Interleaved same-process sweeps on v5e at
# chunk=512/m=3 (cross-process runs drift +-2 ms): r3 two-pass e2e medians
# 8->6.26, 16->6.41, 32->6.67, 64->7.78 ms; r4 one-pass(unroll=16) e2e
# medians 8->3.83, 16->3.98, 32->4.15, 64->4.67 ms, checksums byte-equal.
# 8 is the default: its ~1.7x cap slack (vs ~1.15x at 32) adds ~3 MB of
# plane D2H per 5.2 MB output — ~0.2 ms on PCIe-class links against the
# 0.32 ms compute win, and less on pod DMA. Sharded/multihost paths fetch
# the plane over DCN where that trade flips, so they pass SUB_BYTES_FETCH
# (below) explicitly. Env knobs for sweeps
# (benchmarks/probe_decode_stages.py, /tmp-style interleaved sweeps).
SUB_BYTES = int(os.environ.get("ENTREEPY_SUB_BYTES", "8"))
# Host-fetch consumers (sharded/multihost decode) keep wider subgroups: their
# symbol plane crosses D2H/DCN, so the per-subgroup cap slack is interconnect
# bandwidth there, not just HBM (~1.15x fetch at 32 vs ~1.7x at 8).
# Re-swept under the r5 doubling-shift kernel route (interleaved on-chip,
# fused decode + packed compaction e2e / fetch inflation, bytes verified):
# 8 -> 1.71 ms / 1.90x, 32 -> 0.85 / 1.24, 128 -> 2.16 / 1.15,
# 512 (= per-lane) -> 2.18 / 1.11. Wide subgroups buy ~0.13x of fetch for
# >1.3 ms of extra shift rounds at narrower lane tiles — a loss even at
# PCIe/DCN bandwidths, so 32 stays the default.
SUB_BYTES_FETCH = int(os.environ.get("ENTREEPY_SUB_BYTES_FETCH", "32"))
CAP_SYM_ROUND = 16  # per-subgroup symbol caps round up to this
from .pallas_fsm8 import LANE_TILE  # lanes pad to a multiple of the kernel tile


def _pad_lanes(n: int) -> int:
    """Round the lane count up to a multiple of LANE_TILE (>= 1 tile) — far
    less padding waste than power-of-two bucketing at 5+ MB scale."""
    return max(LANE_TILE, -(-n // LANE_TILE) * LANE_TILE)


def _use_pallas() -> bool:
    """Fused Pallas kernels on real TPUs; the XLA scan path elsewhere (CPU
    meshes, tests) and under ENTREEPY_NO_PALLAS=1."""
    if os.environ.get("ENTREEPY_NO_PALLAS"):
        return False
    return jax.default_backend() in ("tpu", "axon")


def bytes_to_cols(padded: np.ndarray, lanes: int, k: int) -> jax.Array:
    """uint8[lanes*k] -> int32[lanes, k] byte columns. The H2D transfer
    ships uint8 (1 B/byte); the widening cast runs on device."""
    return jnp.asarray(padded.reshape(lanes, k)).astype(jnp.int32)


def _table_T_bf16(fsm: ByteFsm) -> jax.Array:
    """bf16[256, S]: T^T so `onehot(byte) @ T^T` selects per-lane next-state
    rows; also the layout the Pallas kernels contract directly."""
    return jnp.asarray(fsm.sync_table().T, jnp.bfloat16)


def _scan_pass(cols_T, table_T, entries, emit: bool):
    """One full FSM pass over [K, lanes] byte columns from per-lane entry
    states. Returns (exits, states [K, lanes] pre-transition or None)."""
    s_iota = jnp.arange(table_T.shape[1], dtype=jnp.int32)

    def step(state, x):
        ohB = (x[:, None] == jnp.arange(256, dtype=jnp.int32)[None, :]).astype(
            jnp.bfloat16
        )
        rows = jnp.dot(ohB, table_T, preferred_element_type=jnp.float32)  # [lanes, S]
        sel = (state[:, None] == s_iota[None, :]).astype(jnp.float32)
        nxt = jnp.sum(rows * sel, axis=1).astype(jnp.int32)
        return nxt, state if emit else None

    exits, states = jax.lax.scan(step, entries, cols_T)
    return exits, states


@partial(jax.jit, static_argnames=("max_passes",))
def fsm8_decode(cols, table_T, n_real_lanes, max_passes: int = MAX_SYNC_PASSES):
    """Decode all chunks -> (states uint8[lanes, K] pre-transition state per
    byte, unconverged bool).

    cols: int32[lanes, K]; table_T: bf16[256, S]; n_real_lanes: i32 scalar —
    lanes beyond it are padding, excluded from the fixed-point test.
    """
    lanes, k = cols.shape
    xs = cols.T  # [K, lanes]
    real = jnp.arange(lanes, dtype=jnp.int32) < n_real_lanes

    # Entry-state first guess: sync only each chunk's suffix from the root —
    # the exit state forgets the entry within a few codewords.
    w = min(SYNC_WINDOW, k)
    suffix_exits, _ = _scan_pass(xs[k - w :], table_T, jnp.zeros(lanes, jnp.int32), False)
    entries0 = jnp.concatenate([jnp.zeros(1, jnp.int32), suffix_exits[:-1]])

    # Full passes to the fixed point (entries[0] = root is forced, so any
    # fixed point is the exact solution by induction along the chain).
    def cond(c):
        entries, prev, _, it = c
        return jnp.logical_and(
            it < max_passes, jnp.any(jnp.logical_and(entries != prev, real))
        )

    def body(c):
        entries, _, _, it = c
        exits, states = _scan_pass(xs, table_T, entries, True)
        new_entries = jnp.concatenate([jnp.zeros(1, jnp.int32), exits[:-1]])
        return new_entries, entries, states, it + 1

    states0 = jnp.zeros((k, lanes), jnp.int32)
    entries, prev, states, _ = jax.lax.while_loop(
        cond, body, (entries0, entries0 - 1, states0, jnp.int32(0))
    )
    unconverged = jnp.any(jnp.logical_and(entries != prev, real))
    return states.T.astype(jnp.uint8), unconverged


def select_fsm8_decoder():
    """Decode fn for the current backend: the fused Pallas kernels on real
    TPUs, the XLA scan elsewhere. Both return (states u8[lanes, K],
    unconverged bool)."""
    if _use_pallas():
        from .pallas_fsm8 import fsm8_decode_pallas

        return fsm8_decode_pallas
    return fsm8_decode


def expand_states(
    states: np.ndarray,
    body: np.ndarray,
    fsm: ByteFsm,
    n_symbols: int,
) -> np.ndarray:
    """(per-byte pre-states, body bytes) -> uint8[n_symbols] in stream order.

    Dispatches to the C++ runtime when available, else vectorized numpy.
    Raises on invalid transitions, early stream end, and on the exact-bit
    invariant: sum(code lengths of output) must land in the body's final
    byte (i.e. the stream is neither truncated nor over-long).
    """
    from .. import runtime
    from ..format.hostcodec import _check_end_byte

    n = body.size
    st = np.ascontiguousarray(states.reshape(-1)[:n], dtype=np.uint8)

    res = runtime.fsm8_expand(st, body, fsm.counts, fsm.syms, n_symbols)
    if res is not None:
        out, end_byte = res
    else:
        cnt = fsm.counts[st, body].astype(np.int64)  # [n], -1 invalid
        cum = np.cumsum(np.maximum(cnt, 0))
        done = int(np.searchsorted(cum, n_symbols, side="left"))
        if done >= n or cum[done] < n_symbols:
            raise ValueError(
                f"bitstream ended early: decoded {int(cum[-1]) if n else 0} "
                f"of {n_symbols} symbols"
            )
        if (cnt[: done + 1] < 0).any():
            raise ValueError("invalid bitstream: unreachable trie edge")
        sy = fsm.syms[st[: done + 1], body[: done + 1]]  # [m, 8]
        mask = np.arange(8, dtype=np.int64)[None, :] < cnt[: done + 1, None]
        out = sy[mask][:n_symbols]
        end_byte = done

    # Exact-bit invariant: the n_symbols-th symbol must complete in the
    # final body byte (= the code lengths account for every bit except the
    # final byte's zero padding).
    _check_end_byte(end_byte, n, n_symbols)
    return out


def decode_body_device(
    body: bytes | np.ndarray,
    table: CodeTable,
    n_symbols: int,
    *,
    chunk_bytes: int = DEFAULT_CHUNK_BYTES,
    fsm: ByteFsm | None = None,
) -> np.ndarray:
    """Decode a packed body with ``table`` -> uint8[n_symbols] (host array)."""
    if n_symbols == 0:
        return np.zeros(0, dtype=np.uint8)
    from ..utils.trace import phase

    fsm = fsm or build_byte_fsm(table)
    buf = (
        np.frombuffer(body, dtype=np.uint8)
        if isinstance(body, (bytes, bytearray, memoryview))
        else np.asarray(body, dtype=np.uint8)
    )

    n_real_lanes = max(1, -(-buf.size // chunk_bytes))
    # Pallas tiles lanes in LANE_TILE multiples; the XLA scan path takes any
    # lane count, so it skips the padding (CPU tests stay small).
    lanes = _pad_lanes(n_real_lanes) if _use_pallas() else n_real_lanes
    padded = np.zeros(lanes * chunk_bytes, dtype=np.uint8)
    padded[: buf.size] = buf
    with phase("device_fsm8_decode", n_symbols):
        cols = bytes_to_cols(padded, lanes, chunk_bytes)
        decode_fn = select_fsm8_decoder()
        states, unconverged = decode_fn(cols, _table_T_bf16(fsm), jnp.int32(n_real_lanes))
    if bool(unconverged):
        # Pathologically periodic streams can defeat chunk self-sync; the
        # exact serial host decoder is the always-correct fallback (with the
        # same exact-bit invariant every other path enforces).
        from .. import format as _fmt
        from ..format.hostcodec import _check_stream_bits

        lut = _fmt.build_decode_lut(table)
        out = _fmt.unpack_body_host(buf.tobytes(), lut, n_symbols)
        _check_stream_bits(out, table.lengths, buf.size)
        return out
    with phase("device_fetch_expand", n_symbols):
        return expand_states(np.asarray(states), buf, fsm, n_symbols)


def validate_chunk_meta(counts: np.ndarray, w_inv: np.ndarray, n_symbols: int) -> None:
    """Serial-exact accept/reject from per-chunk metadata: ``counts[c]`` =
    symbols chunk c emits, ``w_inv[c]`` = symbols emitted before chunk c's
    FIRST invalid transition (-1 if none). An invalid transition raises iff
    it is consumed — i.e. lies at-or-before the byte where the n_symbols-th
    symbol completes — matching :func:`expand_states` / the serial walk."""
    total = int(counts.sum())
    if total < n_symbols:
        raise ValueError(
            f"bitstream ended early: decoded {total} of {n_symbols} symbols"
        )
    starts = np.cumsum(counts) - counts
    if bool(((w_inv >= 0) & (starts + w_inv < n_symbols)).any()):
        raise ValueError("invalid bitstream: unreachable trie edge")


@partial(jax.jit, static_argnames=("m",))
def _expand_scan(cols, states, t_exp, m: int):
    """XLA-scan expand (CPU meshes / fallback): see expand_pass_device."""
    lanes, k = cols.shape
    s = t_exp.shape[1] // (m + 1)
    s_iota = jnp.arange(s, dtype=jnp.int32)
    b_iota = jnp.arange(256, dtype=jnp.int32)

    def step(_, x):
        byte, st = x  # [lanes] each
        oh_b = (byte[:, None] == b_iota[None, :]).astype(jnp.bfloat16)
        tmp = jnp.dot(oh_b, t_exp, preferred_element_type=jnp.float32)
        mask = (st[:, None] == s_iota[None, :]).astype(jnp.float32)
        vals = jnp.sum(tmp.reshape(lanes, m + 1, s) * mask[:, None, :], axis=2)
        return None, vals  # [lanes, m+1]

    _, vals = jax.lax.scan(step, None, (cols.T, states.T.astype(jnp.int32)))
    raw = vals[..., 0].astype(jnp.int32)  # [K, lanes]
    syms = vals[..., 1:].transpose(0, 2, 1).astype(jnp.uint8)  # [K, m, lanes]
    return raw, syms


@partial(jax.jit, static_argnames=("m",))
def _expand_mask(raw, syms, n_valid, m: int, pos0=0):
    """Shared tail: apply the real-byte mask and unpack count|invalid.
    ``pos0`` offsets the absolute byte positions (sharded callers pass the
    shard's global start so padding past ``n_valid`` masks correctly)."""
    k, lanes = raw.shape
    pos = pos0 + jnp.arange(lanes, dtype=jnp.int32)[None, :] * k + jnp.arange(
        k, dtype=jnp.int32
    )[:, None]
    real = pos < n_valid
    counts = jnp.where(real, raw & 15, 0)
    inv = jnp.logical_and(real, raw >= 16)
    return counts, inv, syms


@partial(jax.jit, static_argnames=("m", "mt"))
def _expand_scan_split(cols, states, t_split, m: int, mt: int):
    """XLA-scan twin of pallas_fsm8.expand_pass_split_pallas8 (CPU meshes /
    fallback): same split-table combine, same (raw, syms) outputs as
    :func:`_expand_scan`."""
    lanes, k = cols.shape
    n_p = 9
    s = (t_split.shape[1] - n_p * (mt + 1)) // 2
    s_iota = jnp.arange(s, dtype=jnp.int32)
    b_iota = jnp.arange(256, dtype=jnp.int32)
    p_iota = jnp.arange(n_p, dtype=jnp.int32)

    def step(_, x):
        byte, st = x  # [lanes] each
        oh_b = (byte[:, None] == b_iota[None, :]).astype(jnp.bfloat16)
        tmp = jnp.dot(oh_b, t_split, preferred_element_type=jnp.float32)
        mask = (st[:, None] == s_iota[None, :]).astype(jnp.float32)
        fs = jnp.sum(tmp[:, :s] * mask, axis=1).astype(jnp.int32)
        pv = jnp.sum(tmp[:, s : 2 * s] * mask, axis=1).astype(jnp.int32)
        p = pv & 15
        mask_p = (p[:, None] == p_iota[None, :]).astype(jnp.float32)
        tail = tmp[:, 2 * s :].reshape(lanes, mt + 1, n_p)
        tvals = jnp.sum(tail * mask_p[:, None, :], axis=2).astype(jnp.int32)
        tc = tvals[:, 0]
        inv = (pv >= 16) | (tc >= 16)
        count = (p > 0).astype(jnp.int32) + (tc & 15)
        raw = jnp.where(inv, 16, count)
        slots = [fs] + [tvals[:, 1 + j] for j in range(m - 1)]
        return None, (raw, jnp.stack(slots, axis=0))  # [lanes], [m, lanes]

    _, (raw, syms) = jax.lax.scan(step, None, (cols.T, states.T.astype(jnp.int32)))
    return raw, syms.astype(jnp.uint8)  # [K, lanes], [K, m, lanes]


@partial(jax.jit, static_argnames=("m", "mt", "s"))
def _fused_scan_pass(cols_T, t_fused, entries, m: int, mt: int, s: int):
    """XLA-scan twin of pallas_fsm8.fused_pass_pallas8 (CPU meshes /
    fallback): one [lanes, 2s+9(mt+2)] contraction per byte drives the
    state chain and the symbol emission together. Returns (raw [K, lanes],
    syms uint8[K, m, lanes], exits [lanes])."""
    lanes = cols_T.shape[1]
    n_p = 9
    s_iota = jnp.arange(s, dtype=jnp.int32)
    b_iota = jnp.arange(256, dtype=jnp.int32)
    p_iota = jnp.arange(n_p, dtype=jnp.int32)

    def step(state, byte):
        oh_b = (byte[:, None] == b_iota[None, :]).astype(jnp.bfloat16)
        tmp = jnp.dot(oh_b, t_fused, preferred_element_type=jnp.float32)
        mask = (state[:, None] == s_iota[None, :]).astype(jnp.float32)
        mg = jnp.sum(tmp[:, :s] * mask, axis=1).astype(jnp.int32)
        pv = jnp.sum(tmp[:, s : 2 * s] * mask, axis=1).astype(jnp.int32)
        p = pv & 15
        mask_p = (p[:, None] == p_iota[None, :]).astype(jnp.float32)
        tail = tmp[:, 2 * s :].reshape(lanes, mt + 2, n_p)
        tvals = jnp.sum(tail * mask_p[:, None, :], axis=2).astype(jnp.int32)
        tcv = tvals[:, 0]
        inv = (pv >= 16) | ((p > 0) & (tcv >= 16))
        count = (p > 0).astype(jnp.int32) + (tcv & 15)
        raw = jnp.where(inv, 16, count)
        slots = [mg] + [tvals[:, 1 + j] for j in range(m - 1)]
        tend = tvals[:, mt + 1]
        nxt = jnp.where(p > 0, tend, mg)
        return nxt, (raw, jnp.stack(slots, axis=0))

    exits, (raw, syms) = jax.lax.scan(step, entries, cols_T)
    return raw, syms.astype(jnp.uint8), exits  # [K, lanes], [K, m, lanes]


def pack_fused_rows(raw, syms, m: int):
    """(raw [K, lanes], syms uint8[K, m, lanes]) -> one int32 word per byte
    ``row0 << 8m | slot_j << 8(m-1-j)`` (the Pallas packed layout; needs
    5 + 8m <= 29 bits, i.e. m <= 3)."""
    word = raw << (8 * m)
    for j in range(m):
        word = word | (syms[:, j, :].astype(jnp.int32) << (8 * (m - 1 - j)))
    return word


def unpack_fused_rows(words, m: int):
    """Inverse of :func:`pack_fused_rows` -> (raw [K, lanes], syms
    uint8[K, m, lanes]). Pure elementwise shifts — XLA fuses these into
    whatever consumes them."""
    raw = jax.lax.shift_right_logical(words, 8 * m)
    syms = jnp.stack(
        [
            (jax.lax.shift_right_logical(words, 8 * (m - 1 - j)) & 255).astype(
                jnp.uint8
            )
            for j in range(m)
        ],
        axis=1,
    )
    return raw, syms


def pack_fused_rows_masked(raw, syms, n_valid, m: int):
    """Scan-twin of the Pallas kernel's in-kernel count mask: pack
    (raw [K, lanes], syms [K, m, lanes]) into one int32 word per byte whose
    count byte is zeroed at lane-linear positions >= ``n_valid`` (padding)
    — bit-identical to ``fused_pass_pallas8(packed=True)`` output. Symbol
    slot bytes ride verbatim (dead slots carry table garbage; every
    consumer gates on the count byte)."""
    k, lanes = raw.shape
    pos = jnp.arange(lanes, dtype=jnp.int32)[None, :] * k + jnp.arange(
        k, dtype=jnp.int32
    )[:, None]
    word = jnp.where(pos < n_valid, raw, 0) << (8 * m)
    for j in range(m):
        word = word | (syms[:, j, :].astype(jnp.int32) << (8 * (m - 1 - j)))
    return word


@partial(jax.jit, static_argnames=("m", "mt", "s", "packed", "max_passes"))
def fsm8_decode_fused(cols, table_T, t_fused, n_real_lanes, m: int, mt: int,
                      s: int, packed: bool = False,
                      max_passes: int = MAX_SYNC_PASSES, entry0=None,
                      n_valid=None):
    """Scan-based one-pass decode (CPU meshes / fallback): cols int32
    [lanes, K] -> (vals int32[K, m+1, lanes] packed rows — or [K, lanes]
    MASKED one-word rows when ``packed`` (``n_valid`` required) — exits
    int32[lanes], unconverged). Same structure as
    pallas_fsm8.fsm8_decode_fused_pallas. ``entry0`` pins the first lane's
    entry state (default 0 = stream start; body tiles chain the previous
    tile's last exit here)."""
    lanes, k = cols.shape
    if packed and n_valid is None:
        raise ValueError("packed fused rows are masked: pass n_valid")
    xs = cols.T
    real = jnp.arange(lanes, dtype=jnp.int32) < n_real_lanes
    e0 = jnp.zeros(1, jnp.int32) if entry0 is None else jnp.reshape(
        entry0, (1,)
    ).astype(jnp.int32)

    w = min(SYNC_WINDOW, k)
    suffix_exits, _ = _scan_pass(xs[k - w :], table_T, jnp.zeros(lanes, jnp.int32), False)
    entries0 = jnp.concatenate([e0, suffix_exits[:-1]])

    def cond(c):
        entries, prev, _, _, it = c
        return jnp.logical_and(
            it < max_passes, jnp.any(jnp.logical_and(entries != prev, real))
        )

    def body(c):
        entries, _, _, _, it = c
        raw, syms, exits = _fused_scan_pass(xs, t_fused, entries, m, mt, s)
        if packed:
            vals = pack_fused_rows_masked(raw, syms, n_valid, m)
        else:
            vals = jnp.concatenate(
                [raw[:, None, :], syms.astype(jnp.int32)], axis=1
            )
        new_entries = jnp.concatenate([e0, exits[:-1]])
        return new_entries, entries, vals, exits, it + 1

    vals0 = jnp.zeros((k, lanes) if packed else (k, m + 1, lanes), jnp.int32)
    exits0 = jnp.zeros(lanes, jnp.int32)
    entries, prev, vals, exits, _ = jax.lax.while_loop(
        cond, body, (entries0, entries0 - 1, vals0, exits0, jnp.int32(0))
    )
    unconverged = jnp.any(jnp.logical_and(entries != prev, real))
    return vals, exits, unconverged


def build_fused(fsm: ByteFsm):
    """One-pass decode table -> (table bf16, m, mt, s). See
    ``format.fsm8.fused_decode_tensors``."""
    from ..format.fsm8 import fused_decode_tensors

    t, m, mt, s = fused_decode_tensors(fsm)
    return jnp.asarray(t, jnp.bfloat16), m, mt, s


def run_fused_decode(cols, table_T, t_fused, n_real_lanes, m: int, mt: int,
                     s: int, packed: bool = False, entry0=None,
                     n_valid=None):
    """Dispatch the one-pass decode to the Pallas kernel on real TPUs, the
    XLA scan elsewhere. Returns (vals int32[K, m+1, lanes] — MASKED
    [K, lanes] words when ``packed``, which requires ``n_valid`` — exits
    int32[lanes], unconverged). Raises ValueError on Pallas-tile-
    incompatible shapes (callers fall back to the two-pass path)."""
    if _use_pallas():
        from .pallas_fsm8 import fsm8_decode_fused_pallas

        return fsm8_decode_fused_pallas(cols, table_T, t_fused, n_real_lanes,
                                        m, mt, s, packed=packed,
                                        entry0=entry0, n_valid=n_valid)
    return fsm8_decode_fused(cols, table_T, t_fused, n_real_lanes, m, mt, s,
                             packed=packed, entry0=entry0, n_valid=n_valid)


def _sub_width(k: int, sub: int | None) -> int:
    """Resolve a compaction subgroup width: explicit ``sub`` (host-fetch
    callers pass SUB_BYTES_FETCH), else the on-device SUB_BYTES default;
    either falls back to the whole chunk when it doesn't tile."""
    s = sub if sub else SUB_BYTES
    return s if k % s == 0 else k


def packed_counts_inv(words, m: int):
    """counts int32[K, lanes] and inv bool[K, lanes] straight off MASKED
    packed fused words (``word >> 8m`` is 0 for padding bytes, 16 for
    invalid transitions, the symbol count otherwise) — no unpack, no
    position grid, no re-mask."""
    raw = jax.lax.shift_right_logical(words, 8 * m)
    return raw & 15, raw >= 16


@partial(jax.jit, static_argnames=("m", "sub"))
def packed_mini_totals(words, m: int, sub: int | None = None):
    """Per-(subgroup, lane) symbol totals straight from MASKED packed fused
    words (the :func:`sym_cap` sizing reduce without materializing counts
    in HBM). Returns int32[Gs, lanes]."""
    k, lanes = words.shape
    counts, _ = packed_counts_inv(words, m)
    sb = _sub_width(k, sub)
    return jnp.sum(counts.reshape(k // sb, sb, lanes), axis=1)


@partial(jax.jit, static_argnames=("m", "cap_sym", "sub"))
def compact_symbols_packed(words, m: int, cap_sym: int,
                           sub: int | None = None):
    """MASKED packed fused words -> compacted symbol plane via the
    per-subgroup sort of :func:`compact_symbols_device` (the host-fetch /
    DCN layout: cap slack there is interconnect bandwidth, so subgroups
    stay wide — on-device consumers use :func:`compact_symbols_dense`
    instead). Same returns as :func:`compact_symbols_device`."""
    counts, inv = packed_counts_inv(words, m)
    _, syms = unpack_fused_rows(words, m)
    return compact_symbols_device(counts, inv, syms, m, cap_sym, sub=sub)


def _masked_meta(counts, inv):
    """Per-lane (lane_tot, w_inv) from per-byte counts/inv WITHOUT a
    K-long cumsum: two-level hierarchical prefix (measured on v5e the flat
    ``jnp.cumsum`` over [512, lanes] costs more than the whole fused
    pass). w_inv = symbols emitted before the lane's first invalid byte,
    1 << 30 when none (:func:`validate_chunk_meta`'s sentinel)."""
    k, lanes = counts.shape
    g2 = 8 if k % 8 == 0 else 1
    c3 = counts.reshape(k // g2, g2, lanes)
    cums = jnp.cumsum(c3, axis=1) - c3
    mini = cums[:, -1, :] + c3[:, -1, :]
    g_start = jnp.cumsum(mini, axis=0) - mini
    lane_tot = g_start[-1] + mini[-1]
    big = jnp.int32(1 << 30)
    inv3 = inv.reshape(k // g2, g2, lanes)
    w_inv = jnp.where(inv3, g_start[:, None, :] + cums, big).min(axis=(0, 1))
    return lane_tot, w_inv


@partial(jax.jit, static_argnames=("m",))
def compact_symbols_dense(words, m: int):
    """MASKED packed fused words -> the DENSE symbol plane: row ``k*m + j``
    of the plane is byte ``m-1-j`` of word ``k`` verbatim, mini_tot is the
    per-byte count — i.e. subgroup width 1, cap = m, and NO reorder at all.
    Dead slots carry table garbage; every consumer (extraction, checksum)
    gates on mini_tot, so nothing ever reads them. This is the on-device
    consumer's default: the per-subgroup sort exists to cut plane slack
    for host/DCN fetches, but on the 5.2 MB text corpus the swept cap
    equals the full subgroup anyway (zero slack saved) while the sort +
    remask epilogue cost 3.1 ms against this path's ~0.2 ms
    (benchmarks/probe_compact_dec, v5e). Returns (plane uint8[K*m, lanes],
    mini_tot int32[K, lanes], lane_tot int32[lanes], w_inv int32[lanes],
    1 << 30 = none)."""
    k, lanes = words.shape
    counts, inv = packed_counts_inv(words, m)
    plane = jnp.stack(
        [
            (jax.lax.shift_right_logical(words, 8 * (m - 1 - j)) & 255).astype(
                jnp.uint8
            )
            for j in range(m)
        ],
        axis=1,
    ).reshape(k * m, lanes)
    lane_tot, w_inv = _masked_meta(counts, inv)
    return plane, counts, lane_tot, w_inv


def expand_pass_split(cols, states, t_split, n_valid, m: int, mt: int, pos0=0):
    """Split-table variant of :func:`expand_pass_device` (same outputs):
    ``2S + 9(mt+1)``-wide contraction instead of ``(m+1)S`` — see
    ``format.fsm8.split_expand_tensors`` for the decomposition."""
    if _use_pallas():
        try:
            from .pallas_fsm8 import expand_pass_split_pallas8

            vals = expand_pass_split_pallas8(
                cols.T, states.T.astype(jnp.int32), t_split, m, mt
            )  # [K, m+1, lanes]
            raw = vals[:, 0, :]
            syms = vals[:, 1:, :].astype(jnp.uint8)
            return _expand_mask(raw, syms, n_valid, m, pos0)
        except ValueError:  # tile-incompatible shapes
            pass
    raw, syms = _expand_scan_split(cols, states, t_split, m, mt)
    return _expand_mask(raw, syms, n_valid, m, pos0)


def build_expand(fsm: ByteFsm):
    """Expand tables for the current mode -> (table bf16, m, mt).
    ``mt`` is None in fused mode (ENTREEPY_EXPAND=fused; default split —
    measured faster on v5e, see ops/pallas_fsm8.py tile notes)."""
    from ..format.fsm8 import expand_tensors, split_expand_tensors

    if os.environ.get("ENTREEPY_EXPAND") == "fused":
        t, m = expand_tensors(fsm)
        return jnp.asarray(t, jnp.bfloat16), m, None
    t, m, mt = split_expand_tensors(fsm)
    return jnp.asarray(t, jnp.bfloat16), m, mt


def run_expand(cols, states, t, n_valid, m: int, mt, pos0=0):
    """Dispatch on the :func:`build_expand` table kind."""
    if mt is None:
        return expand_pass_device(cols, states, t, n_valid, m, pos0)
    return expand_pass_split(cols, states, t, n_valid, m, mt, pos0)


def expand_pass_device(cols, states, t_exp, n_valid, m: int, pos0=0):
    """Per-byte symbol emission ON DEVICE (no serial chain: states are the
    decode passes' precomputed output, so every byte's lookup is independent
    and the matmuls batch freely on the MXU — fused Pallas kernel on real
    TPUs, XLA scan elsewhere).

    cols/states: int32/uint8[lanes, K]; t_exp: bf16[256, (m+1)*S] from
    ``format.fsm8.expand_tensors`` (block 0 packs count + 16*invalid);
    n_valid: total real body bytes. Returns (counts int32[K, lanes], inv
    bool[K, lanes], syms uint8[K, m, lanes] — byte-major, slot, lane) —
    dense slots, compacted by :func:`compact_symbols_device`.
    """
    if _use_pallas():
        try:
            from .pallas_fsm8 import expand_pass_pallas8

            vals = expand_pass_pallas8(
                cols.T, states.T.astype(jnp.int32), t_exp, m
            )  # [K, m+1, lanes]
            raw = vals[:, 0, :]
            syms = vals[:, 1:, :].astype(jnp.uint8)  # [K, m, lanes] — native
            return _expand_mask(raw, syms, n_valid, m, pos0)
        except ValueError:  # tile-incompatible shapes
            pass
    raw, syms = _expand_scan(cols, states, t_exp, m)
    return _expand_mask(raw, syms, n_valid, m, pos0)


@partial(jax.jit, static_argnames=("m", "cap_sym", "sub", "interpret"))
def compact_symbols_device(counts, inv, syms, m: int, cap_sym: int,
                           sub: int | None = None, interpret: bool = False):
    """Dense per-byte symbol slots -> per-lane compacted symbol columns.

    One per-lane sort packs each lane's symbols to the column front
    (keys = per-lane stream position; scatters serialize on TPU, sorts
    vectorize). Everything stays in the expand kernel's [K*, lanes] layout
    — keys build contiguously and the sort runs along dim 0, so no
    multi-MB transposes enter the pipeline. The lanes are NOT flattened
    into one stream on device — a measured global 1-D sort over the
    ~n_symbols grid cost more than the whole FSM decode — the host fetches
    [cap_sym, lanes] (~cap_sym/avg of the output bytes: ~1.7x at the
    SUB_BYTES=8 default, ~1.15x at 32 — see the SUB_BYTES note) and
    concatenates the live column prefixes. Also returns per-lane totals
    and first-invalid offsets for :func:`validate_chunk_meta`.

    The sort runs per SUB_BYTES-byte SUBGROUP of each chunk (XLA TPU sort
    cost grows ~log^2 of the sorted width — measured on v5e the same slots
    cost 3.5x sorted 1536-wide vs 192-wide; see the SUB_BYTES sweep note),
    so ``cap_sym`` is a per-subgroup cap and the plane is a grid of
    mini-lane segments: row ``g*cap_sym+j`` of column ``l`` is slot ``j``
    of subgroup ``g`` of lane ``l``. Stream order = lane-major, then
    subgroup, then slot.

    counts/inv: int32/bool[K, lanes]; syms: uint8[K, m, lanes].
    Returns (plane uint8[Gs*cap_sym, lanes], mini_tot int32[Gs, lanes],
    lane_tot int32[lanes], w_inv int32[lanes], 1<<30 = none).
    """
    k, lanes = counts.shape
    sb = _sub_width(k, sub)
    gs = k // sb
    sg = sb * m  # slots per subgroup
    if sg >= 1 << 22:
        # subgroup positions must survive the << 8 pack without touching
        # the sign bit
        raise ValueError(f"sub_bytes*m = {sg} exceeds the 2^22 sort bound")
    c3 = counts.reshape(gs, sb, lanes)
    cums = jnp.cumsum(c3, axis=1) - c3  # symbols before byte, per subgroup
    mini_tot = cums[:, -1, :] + c3[:, -1, :]  # [Gs, lanes]
    # lane totals + first-invalid offsets from the subgroup hierarchy (a
    # flat K-long cumsum costs more than the fused decode pass on v5e)
    big = jnp.int32(1 << 30)
    g_start = jnp.cumsum(mini_tot, axis=0) - mini_tot  # [Gs, lanes]
    lane_tot = g_start[-1] + mini_tot[-1]
    inv3 = inv.reshape(gs, sb, lanes)
    w_inv = jnp.where(inv3, g_start[:, None, :] + cums, big).min(axis=(0, 1))

    cap_g = min(cap_sym, sg)
    from .pallas_compact import compact_rows_pallas, compact_tileable

    if (
        interpret
        or (
            os.environ.get("ENTREEPY_PLANE_KERNEL", "1") == "1"
            and _use_pallas()
        )
    ) and compact_tileable(lanes, k * m, sg, cap_g):
        # Sort-free doubling-shift kernel (ops/pallas_compact.py, the
        # encode plane path's twin): the slots grid [K*m, lanes] is already
        # in stream order and ``j < count`` is the live mask, so no
        # (position << 8 | symbol) packing and no sort at all.
        live = (
            (jnp.arange(m, dtype=jnp.int32)[None, :, None]
             < counts[:, None, :]).astype(jnp.int32).reshape(k * m, lanes)
        )
        plane_k, _cnt = compact_rows_pallas(
            syms.reshape(k * m, lanes).astype(jnp.int32), live, sg, cap_g,
            interpret=interpret,
        )
        plane = plane_k.reshape(gs, cap_g, lanes).astype(jnp.uint8)
    else:
        # XLA-sort twin (CPU meshes / non-tiling shapes): ONE word per
        # slot — (position << 8) | symbol — so the sort moves half the
        # bytes a (key, value) pair sort would; dead slots carry position
        # ``sg`` (> every live position) and sink to the bottom of their
        # subgroup. int16 when the packed value fits (sg <= 127 — the
        # default sb=32/m<=3 gives sg=96): halves the sorted bytes again.
        j = jnp.arange(m, dtype=jnp.int32)[None, None, :, None]
        pos = jnp.where(
            j < c3[:, :, None, :], cums[:, :, None, :] + j, sg
        )  # [Gs, sb, m, lanes]
        pos = pos.reshape(gs, sg, lanes)
        packed = (pos << 8) | jnp.where(
            pos < sg, syms.reshape(gs, sg, lanes).astype(jnp.int32), 0
        )
        if sg <= 127:  # sg << 8 | sym fits int16's positive range
            packed = packed.astype(jnp.int16)
        sv = jnp.sort(packed, axis=1).astype(jnp.int32)
        plane = (sv[:, :cap_g, :] & 255).astype(jnp.uint8)
    if cap_sym > sg:
        plane = jnp.pad(plane, ((0, 0), (0, cap_sym - sg), (0, 0)))
    # An under-sized static cap would silently truncate a subgroup; poison
    # lane_tot so validate_chunk_meta rejects loudly instead. (Callers size
    # cap_sym from the fetched mini-total max, so this cannot fire there.)
    overflow = jnp.max(mini_tot) > cap_g
    lane_tot = jnp.where(overflow, -1, lane_tot)
    return plane.reshape(gs * cap_sym, lanes), mini_tot, lane_tot, w_inv


def sym_cap(counts, m: int, sub: int | None = None):
    """Static per-subgroup symbol cap for :func:`compact_symbols_device`:
    fetches the subgroup totals' max (tiny) and rounds to CAP_SYM_ROUND
    columns (bounds jit recompiles). The subgroup width is derived from
    ``counts.shape[0]`` (the chunk size), same as the compaction itself."""
    k = counts.shape[0]
    sb = _sub_width(k, sub)
    mini = jnp.sum(counts.reshape(k // sb, sb, counts.shape[1]), axis=1)
    mx = max(int(jnp.max(mini)), 1)
    return min(-(-mx // CAP_SYM_ROUND) * CAP_SYM_ROUND, sb * m)


def packed_sym_cap(mini, m: int, k: int, sub: int | None = None) -> int:
    """Static per-subgroup symbol cap from :func:`packed_mini_totals` output
    (the packed-mode twin of :func:`sym_cap`, shared by every packed call
    site so the cap rule lives in one place): fetches the mini-total max
    (tiny) and rounds to CAP_SYM_ROUND columns (bounds jit recompiles)."""
    sb = _sub_width(k, sub)
    mx = max(int(jnp.max(mini)), 1)
    return min(-(-mx // CAP_SYM_ROUND) * CAP_SYM_ROUND, sb * m)


def extract_plane_symbols(plane, mini_tot) -> np.ndarray:
    """Compacted symbol plane -> flat uint8 symbols in (lane, subgroup,
    slot) stream order. Boolean extraction flattens row-major — exactly
    stream order, all in C (no per-lane python loop)."""
    mt = np.asarray(mini_tot, dtype=np.int64)  # [Gs, lanes]
    gs, lanes = mt.shape
    plane_np = np.asarray(plane).reshape(gs, -1, lanes)  # [Gs, cap_g, lanes]
    cap_g = plane_np.shape[1]
    arr = plane_np.transpose(2, 0, 1)  # [lanes, Gs, cap_g]
    mask = np.arange(cap_g, dtype=np.int64)[None, None, :] < mt.T[:, :, None]
    return arr[mask]


def plane_checksum(plane, mini_tot, lane_tot, cap_sym: int, n_sym: int,
                   start=0):
    """Position-weighted checksum of a compacted symbol plane's live prefix
    (jittable; int32 wrapping — compare modulo 2^32). The device-side
    verification primitive the benches sync on instead of fetching the
    decoded bytes (through a slow link the fetch would swamp compute;
    correctness is pinned by comparing against :func:`plane_checksum_host`
    on the source bytes). ``start`` is the plane's global symbol offset
    (tiled callers pass the tile's start so the trailing padding-derived
    symbol masks out); positions in the XOR stay plane-LOCAL on both sides.
    Returns (checksum, total live symbols incl. any trailing extra)."""
    gs = mini_tot.shape[0]
    pl3 = plane.reshape(gs, cap_sym, -1)
    lane_start = (jnp.cumsum(lane_tot) - lane_tot)[None, None, :]
    if gs % 8 == 0:
        # two-level exclusive prefix: the dense plane's gs = K makes a flat
        # cumsum here as costly as the K-long one _masked_meta avoids
        m3 = mini_tot.reshape(gs // 8, 8, -1)
        inner = jnp.cumsum(m3, axis=1) - m3
        outer_tot = inner[:, -1, :] + m3[:, -1, :]
        outer = jnp.cumsum(outer_tot, axis=0) - outer_tot
        mini_start = (outer[:, None, :] + inner).reshape(gs, 1, -1)
    else:
        mini_start = (jnp.cumsum(mini_tot, axis=0) - mini_tot)[:, None, :]
    j = jnp.arange(cap_sym, dtype=jnp.int32)[None, :, None]
    pos_l = lane_start + mini_start + j  # plane-local symbol order
    live = (
        (j < mini_tot[:, None, :]) & (start + pos_l < n_sym)
    ).astype(jnp.int32)
    chk = jnp.sum((pl3.astype(jnp.int32) ^ (pos_l & 0xFF)) * live)
    return chk, jnp.sum(lane_tot)


def plane_checksum_host(data: np.ndarray, start: int, tot: int,
                        n_sym: int) -> int:
    """Expected value of :func:`plane_checksum` over the source bytes:
    ``data[start : min(start+tot, n_sym)]`` XORed with plane-local
    positions. Compare modulo 2^32 (the device accumulates in int32)."""
    seg = data[start: min(start + tot, n_sym)].astype(np.int64)
    return int(np.sum(seg ^ (np.arange(seg.size) & 0xFF)))


def assemble_symbol_planes(
    planes, minis, lane_tots, w_invs, n_symbols, table, n_body
) -> np.ndarray:
    """Fetch + validate + concatenate compacted symbol planes (the shared
    tail of every on-device expansion path; the streaming tiled decode
    passes one list entry per tile, untiled paths a singleton): applies the
    serial-exact accept/reject (:func:`validate_chunk_meta`) over the
    concatenated per-lane metadata, slices each mini-lane's live segment
    prefix in (lane, subgroup) stream order, trims to ``n_symbols``, and
    enforces the exact-bit invariant."""
    from ..format.hostcodec import _check_stream_bits

    counts_np = np.concatenate(
        [np.asarray(c, dtype=np.int64) for c in lane_tots]
    )
    w_inv_np = np.concatenate([np.asarray(w, dtype=np.int64) for w in w_invs])
    w_inv_np[w_inv_np >= (1 << 30)] = -1
    validate_chunk_meta(counts_np, w_inv_np, n_symbols)
    out = np.concatenate(
        [extract_plane_symbols(p, mt_) for p, mt_ in zip(planes, minis)]
    )[:n_symbols]
    if out.size < n_symbols:
        raise ValueError(
            f"bitstream ended early: decoded {out.size} of {n_symbols} symbols"
        )
    _check_stream_bits(out, table.lengths, n_body)
    return out


def assemble_symbol_plane(
    plane, mini_tot, lane_tot, w_inv, n_symbols, table, n_body
) -> np.ndarray:
    """Singleton wrapper of :func:`assemble_symbol_planes`."""
    return assemble_symbol_planes(
        [plane], [mini_tot], [lane_tot], [w_inv], n_symbols, table, n_body
    )


def decode_body_device_full(
    body: bytes | np.ndarray,
    table: CodeTable,
    n_symbols: int,
    *,
    chunk_bytes: int = DEFAULT_CHUNK_BYTES,
    fsm: ByteFsm | None = None,
) -> np.ndarray:
    """End-to-end ON-DEVICE decode: FSM passes -> device symbol expansion ->
    device compaction; the host only fetches tiny per-lane metadata and the
    final flat symbol stream (= the decompressed bytes). This is the
    pod-scaling path — the default :func:`decode_body_device` keeps the
    (faster-on-this-host) C++ expansion; reference counterpart
    ``decode.zig:143-203``.
    """
    if n_symbols == 0:
        return np.zeros(0, dtype=np.uint8)
    from ..utils.trace import phase

    fsm = fsm or build_byte_fsm(table)
    buf = (
        np.frombuffer(body, dtype=np.uint8)
        if isinstance(body, (bytes, bytearray, memoryview))
        else np.asarray(body, dtype=np.uint8)
    )
    n_real_lanes = max(1, -(-buf.size // chunk_bytes))
    mode = os.environ.get("ENTREEPY_EXPAND", "onepass")
    if TILE_LANES > 0 and n_real_lanes > TILE_LANES and _tileable_onepass(
        mode, chunk_bytes
    ):
        # Bodies past one tile stream through the bounded-HBM tiled path
        # (ENTREEPY_TILE_LANES=0 disables; the tiled route exists only for
        # the default one-pass pipeline on fused-tileable chunk sizes —
        # legacy ENTREEPY_EXPAND modes and odd chunk sizes stay untiled,
        # where the two-pass fallback chain handles them).
        return decode_body_device_tiled(
            buf, table, n_symbols, chunk_bytes=chunk_bytes, fsm=fsm
        )
    lanes = _pad_lanes(n_real_lanes) if _use_pallas() else n_real_lanes
    padded = np.zeros(lanes * chunk_bytes, dtype=np.uint8)
    padded[: buf.size] = buf

    unconverged = True
    counts = inv = syms = None
    compacted = None
    if mode == "onepass":
        # One-pass decode: a single fused kernel emits the packed symbol
        # rows directly (no separate emit pass, no state HBM round-trip).
        # For m <= 3 the whole per-byte row rides ONE int32 word (packed
        # mode), MASKED in-kernel — the dense compaction then reads the
        # plane bytes verbatim: no sizing fetch, no cap-keyed recompiles,
        # no sort (benchmarks/probe_compact_dec: the sort+remask epilogue
        # cost 3.1 ms vs ~0.3 ms for this on a 5.2 MB body, v5e).
        t_fused, m, mt, s = build_fused(fsm)
        packed = m <= 3 and os.environ.get("ENTREEPY_FUSED_PACKED", "1") == "1"
        try:
            with phase("device_fsm8_decode", n_symbols):
                cols = bytes_to_cols(padded, lanes, chunk_bytes)
                vals, _exits, unconverged = run_fused_decode(
                    cols, _table_T_bf16(fsm), t_fused, jnp.int32(n_real_lanes),
                    m, mt, s, packed=packed,
                    n_valid=jnp.int32(buf.size) if packed else None,
                )
            if not bool(unconverged):
                with phase("device_expand", n_symbols):
                    if packed:
                        plane, mini_tot, lane_tot, w_inv = (
                            compact_symbols_dense(vals, m)
                        )
                        # counts <= m <= 3: fetch the mini totals as uint8
                        compacted = (plane, mini_tot.astype(jnp.uint8),
                                     lane_tot, w_inv)
                    else:
                        counts, inv, syms = _expand_mask(
                            vals[:, 0, :], vals[:, 1:, :].astype(jnp.uint8),
                            jnp.int32(buf.size), m,
                        )
        except ValueError:  # Pallas-tile-incompatible shapes: two-pass path
            mode = "split"
    if (
        counts is None
        and compacted is None
        and not (mode == "onepass" and bool(unconverged))
    ):
        with phase("device_fsm8_decode", n_symbols):
            cols = bytes_to_cols(padded, lanes, chunk_bytes)
            decode_fn = select_fsm8_decoder()
            states, unconverged = decode_fn(
                cols, _table_T_bf16(fsm), jnp.int32(n_real_lanes)
            )
        if not bool(unconverged):
            t_exp, m, mt = build_expand(fsm)
            with phase("device_expand", n_symbols):
                counts, inv, syms = run_expand(
                    cols, states, t_exp, jnp.int32(buf.size), m, mt
                )
    if bool(unconverged):
        # Pathologically periodic streams can defeat chunk self-sync; the
        # exact serial host decoder is the always-correct fallback (with the
        # same exact-bit invariant every other path enforces).
        from .. import format as _fmt
        from ..format.hostcodec import _check_stream_bits

        lut = _fmt.build_decode_lut(table)
        out = _fmt.unpack_body_host(buf.tobytes(), lut, n_symbols)
        _check_stream_bits(out, table.lengths, buf.size)
        return out
    if compacted is not None:
        plane, mini_tot, lane_tot, w_inv = compacted
    else:
        with phase("device_expand", n_symbols):
            cap_sym = sym_cap(counts, m)  # tiny sizing fetch
            plane, mini_tot, lane_tot, w_inv = compact_symbols_device(
                counts, inv, syms, m, cap_sym
            )
    with phase("device_sym_fetch", n_symbols):
        out = assemble_symbol_plane(
            plane, mini_tot, lane_tot, w_inv, n_symbols, table, buf.size
        )
    return out


# Streaming tile width for decode_body_device_tiled (lanes per tile).
# 65536 lanes x 512 B chunks = 32 MB of compressed body per tile: the HBM
# working set stays ~10 B/compressed-byte x 32 MB regardless of body size.
TILE_LANES = int(os.environ.get("ENTREEPY_TILE_LANES", "65536"))


def _tileable_onepass(mode: str, chunk_bytes: int) -> bool:
    """True when the streaming tiled decode can run: the tiled path
    hardwires the one-pass fused pipeline, so it requires mode == onepass
    and (under Pallas) a fused-tileable chunk size. Shared by the router
    and the tiled function itself so a fallback can never recurse."""
    if mode != "onepass":
        return False
    if not _use_pallas():
        return True
    from .pallas_fsm8 import LANE_TILE, fused_tileable

    return fused_tileable(LANE_TILE, chunk_bytes)


def decode_body_device_tiled(
    body: bytes | np.ndarray,
    table: CodeTable,
    n_symbols: int,
    *,
    chunk_bytes: int = DEFAULT_CHUNK_BYTES,
    tile_lanes: int | None = None,
    fsm: ByteFsm | None = None,
) -> np.ndarray:
    """Streaming variant of :func:`decode_body_device_full` for big bodies:
    chunk lanes process in TILES of ``tile_lanes`` (~tile_lanes*chunk_bytes
    compressed bytes of HBM working set per tile, ~10 B/byte). Tiles run in
    stream order, so each tile's first-lane entry state is EXACTLY the
    previous tile's last-lane exit — no global fixed point; self-sync runs
    only within each tile. Per tile: one-pass fused decode -> device
    compaction -> the host fetches the tile's compacted plane and frees the
    tile's HBM. Accept/reject and the exact-bit invariant run on the
    concatenated per-tile metadata, identical to the untiled path.

    Reference counterpart ``decode.zig:143-203`` (which streams the whole
    body serially at ~0.44 MB/s)."""
    if n_symbols == 0:
        return np.zeros(0, dtype=np.uint8)
    from ..format.hostcodec import _check_stream_bits
    from ..utils.trace import phase

    mode = os.environ.get("ENTREEPY_EXPAND", "onepass")
    if not _tileable_onepass(mode, chunk_bytes):
        # The fused kernel can't tile this shape (or a legacy expand mode is
        # forced): the untiled path's two-pass fallback chain handles it.
        # Same predicate as decode_body_device_full's router, so this cannot
        # recurse; HBM is unbounded on this corner (non-default chunk sizes
        # only).
        return decode_body_device_full(
            body, table, n_symbols, chunk_bytes=chunk_bytes, fsm=fsm
        )
    fsm = fsm or build_byte_fsm(table)
    buf = (
        np.frombuffer(body, dtype=np.uint8)
        if isinstance(body, (bytes, bytearray, memoryview))
        else np.asarray(body, dtype=np.uint8)
    )
    unit = LANE_TILE if _use_pallas() else 1
    t_lanes = tile_lanes or TILE_LANES
    t_lanes = max(unit, t_lanes // unit * unit)
    n_real_lanes = max(1, -(-buf.size // chunk_bytes))
    lanes = max(unit, -(-n_real_lanes // unit) * unit)

    t_fused, m, mt, s = build_fused(fsm)
    packed = m <= 3 and os.environ.get("ENTREEPY_FUSED_PACKED", "1") == "1"
    tbl = _table_T_bf16(fsm)

    planes, minis, lane_tots, w_invs = [], [], [], []

    def drain(tile) -> bool:
        """Fetch one tile's device results (False = its self-sync failed)."""
        plane, mini_tot, lane_tot, w_inv, unconverged = tile
        if bool(unconverged):
            return False
        with phase("device_sym_fetch", n_symbols):
            planes.append(np.asarray(plane))
            minis.append(np.asarray(mini_tot, dtype=np.int64))
            lane_tots.append(np.asarray(lane_tot, dtype=np.int64))
            w_invs.append(np.asarray(w_inv, dtype=np.int64))
        return True

    # Depth-2 pipeline: tile t+1's decode+compaction launches BEFORE tile
    # t's results are fetched, so the host-side D2H of tile t overlaps tile
    # t+1's device compute (entry chaining is a device scalar — no host
    # sync anywhere in the launch train; the packed path has no sizing
    # fetch either, its dense-plane cap is statically m).
    pending = None
    failed = False
    entry0 = None  # tile 0 starts at the root
    l0 = 0
    while l0 < lanes and not failed:
        tl = min(t_lanes, lanes - l0)
        real_t = min(max(n_real_lanes - l0, 0), tl)
        pad_t = np.zeros(tl * chunk_bytes, np.uint8)
        seg = buf[l0 * chunk_bytes : (l0 + tl) * chunk_bytes]
        pad_t[: seg.size] = seg
        # Local coordinates: the real-byte mask bound is computed host-side
        # in Python ints — device positions stay tile-local, so int32 never
        # wraps no matter how large the body is (>= 2 GiB bodies would
        # overflow global int32 positions).
        nv_t = jnp.int32(
            min(max(buf.size - l0 * chunk_bytes, 0), tl * chunk_bytes)
        )
        with phase("device_fsm8_decode", n_symbols):
            cols_t = bytes_to_cols(pad_t, tl, chunk_bytes)
            vals, exits, unconverged = run_fused_decode(
                cols_t, tbl, t_fused, jnp.int32(real_t), m, mt, s,
                packed=packed, entry0=entry0,
                n_valid=nv_t if packed else None,
            )
        with phase("device_expand", n_symbols):
            if packed:
                plane, mini_tot, lane_tot, w_inv = compact_symbols_dense(
                    vals, m
                )
                mini_tot = mini_tot.astype(jnp.uint8)  # counts <= m <= 3
            else:
                counts, inv, syms = _expand_mask(
                    vals[:, 0, :], vals[:, 1:, :].astype(jnp.uint8), nv_t, m
                )
                cap_sym = sym_cap(counts, m)  # sizing fetch (legacy rows)
                plane, mini_tot, lane_tot, w_inv = compact_symbols_device(
                    counts, inv, syms, m, cap_sym
                )
        if pending is not None:
            failed = not drain(pending)
        pending = (plane, mini_tot, lane_tot, w_inv, unconverged)
        if l0 + tl < lanes:
            entry0 = exits[real_t - 1] if real_t > 0 else exits[tl - 1]
        l0 += tl
    if not failed and pending is not None:
        failed = not drain(pending)
    if failed:
        # Pathologically periodic streams can defeat chunk self-sync; the
        # exact serial host decoder is the always-correct fallback.
        from .. import format as _fmt

        lut = _fmt.build_decode_lut(table)
        out = _fmt.unpack_body_host(buf.tobytes(), lut, n_symbols)
        _check_stream_bits(out, table.lengths, buf.size)
        return out

    return assemble_symbol_planes(
        planes, minis, lane_tots, w_invs, n_symbols, table, buf.size
    )


def device_e2e_default() -> bool:
    """Pod default for the device decode's expansion stage: fully on-device
    (``decode_body_device_full``) on a real TPU backend; host expansion on
    tunneled/dev backends where the state fetch is cheaper than the extra
    device passes. ENTREEPY_DEVICE_E2E=1/0 overrides either way."""
    env = os.environ.get("ENTREEPY_DEVICE_E2E")
    if env is not None:
        return env == "1"
    return jax.default_backend() == "tpu"


def decompress_device(et: bytes, *, chunk_bytes: int = DEFAULT_CHUNK_BYTES) -> bytes:
    """Complete .et file -> original bytes, decoded chunk-parallel on device.

    On a real TPU backend the whole pipeline (FSM passes, symbol expansion,
    compaction) runs on-device and only the final byte stream is fetched
    (:func:`device_e2e_default`)."""
    hdr = parse_header(et)
    body_fn = decode_body_device_full if device_e2e_default() else decode_body_device
    out = body_fn(
        et[hdr.body_start :], hdr.table, hdr.body_len, chunk_bytes=chunk_bytes
    )
    return out.tobytes()
