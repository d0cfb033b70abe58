"""Pallas TPU kernels for the byte-granularity FSM decoder (gen 2).

Key property exploited (see ops/decode8.py): the per-byte transition
``D = onehot(byte) @ T^T`` does not depend on the running state — only the
cheap per-lane row select does. So the kernel issues U independent matmuls
per loop iteration (they pipeline on the MXU with no serial stall) and runs
the serial state chain purely on the VPU between them. Output is one
pre-transition state per compressed byte, packed 4-per-int32 — the host
expands states to symbols, so the kernel ships 1 byte per compressed byte
(the gen-1 nibble kernel shipped 5 bytes per nibble).

Mosaic-friendly formulation (same rules as pallas_fsm.py): everything 2-D
with lanes on the lane axis, transposed one-hots by broadcast compare,
``pl.ds`` row slicing, int32 bit patterns (no f32<->u32 casts in-kernel).

Grid layout: (lane_tiles, k_tiles), lane tile outer so the state scratch
carries across a lane tile's k tiles (TPU grid cells run sequentially per
core; scratch persists across them).
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Tile defaults from the benchmarks/tune_fsm8.py sweep on v5e: (1024, 512)
# reaches 86% of MXU peak on the 5.2 MB corpus (vs 67% at (512, 256)).
# LANE_TILE must match ops/decode8.py's lane padding.
LANE_TILE = 1024
K_TILE = 512
UNROLL = 4  # bytes per loop iteration: 4 pipelined matmuls + 1 packed store
N_INPUT = 256


def _tiles8(lanes: int, k: int) -> tuple[int, int]:
    lt = min(LANE_TILE, lanes)
    kt = min(K_TILE, k)
    if lanes % lt or k % kt or kt % UNROLL:
        raise ValueError(f"lanes={lanes} k={k} not tileable to ({lt},{kt})")
    return lt, kt


# Table dtype for the Pallas one-hot contractions: int8 runs the MXU at 2x
# the bf16 rate on v5e (measured: fused pass 1.38 vs 2.06 ms) and stays
# exact — tables store value-128 (all values <= 255 fit) and the one-hot
# select adds the offset back after the s32-accumulated reduce. Env knob
# for A/B sweeps and older-gen fallback.
TBL_INT8 = os.environ.get("ENTREEPY_FUSED_DTYPE", "int8") == "int8"
I8_OFF = 128

# REFUTED on-chip (late r5): narrowing the BYTE-COMPARE register width to
# shrink the one-hot build (the largest VPU term in the fused kernel) is
# not available on v5e. All three formulations fail to compile: int8 INPUT
# refs break Mosaic's tiling proof ("cannot statically prove index in
# dimension 0 is a multiple of 8" on the dynamic single-row loads), and
# both int8 and bf16 compares of cast values hit "Target does not support
# this comparison" (e.g. cmpi on vector<8x128x4xi8>). The one-hot build
# therefore stays int32; the fused pass sits at ~72% of its int8 MAC floor
# (0.94 ms at W=237 on the 5.2 MB text corpus; measured 1.26-1.38 ms) and
# the residue is exactly this VPU work. Re-try on a gen with packed
# compares.


def _tbl_dot(tbl_ref, x, b_col):
    """onehot(byte) contraction against the whole table -> (d, off): int32/
    f32 [W, lt] lookup rows whose true value is ``reduce(d * mask) + off``."""
    if tbl_ref.dtype == jnp.int8:
        ohB = (x == b_col).astype(jnp.int8)
        d = jax.lax.dot_general(
            tbl_ref[:], ohB, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        return d, I8_OFF
    ohB = (x == b_col).astype(jnp.bfloat16)
    d = jax.lax.dot_general(
        tbl_ref[:], ohB, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return d, 0


def _mask_reduce(d, mask_i32, off, lo, hi):
    """sum(d[lo:hi] * mask) + off -> int32 [1, lt] (mask has exactly one 1
    per lane, so this is an exact row select in either dtype)."""
    blk = jax.lax.slice_in_dim(d, lo, hi, axis=0)
    if d.dtype == jnp.int32:
        return jnp.sum(blk * mask_i32, axis=0, keepdims=True) + off
    return jnp.sum(blk * mask_i32.astype(jnp.float32), axis=0, keepdims=True).astype(
        jnp.int32
    ) + off


def to_kernel_table(t: jax.Array) -> jax.Array:
    """bf16 one-hot table -> the Pallas kernels' dtype (int8 value-128 by
    default; identity under ENTREEPY_FUSED_DTYPE=bf16). Exact: every table
    value is an integer <= 255, representable in bf16."""
    if TBL_INT8:
        return (t.astype(jnp.int32) - I8_OFF).astype(jnp.int8)
    return t


def _steps8(x_ref, tbl_ref, state, q, lt):
    """UNROLL byte transitions from ``state``. The U matmuls are mutually
    independent (state enters only the row selects), so Mosaic can keep the
    MXU busy across the serial chain. Returns (pre-states list, new state)."""
    n_states = tbl_ref.shape[1]
    b_col = jax.lax.broadcasted_iota(jnp.int32, (N_INPUT, lt), 0)
    s_col = jax.lax.broadcasted_iota(jnp.int32, (n_states, lt), 0)
    ds = []
    for u in range(UNROLL):
        x = x_ref[pl.ds(q * UNROLL + u, 1), :]  # (1, lt)
        ds.append(_tbl_dot(tbl_ref, x, b_col))
        # (S, lt): D[s, l] = next state if the lane were in state s
    pre = []
    for u in range(UNROLL):
        mask = (state == s_col).astype(jnp.int32)  # (S, lt)
        pre.append(state)
        d, off = ds[u]
        state = _mask_reduce(d, mask, off, 0, n_states)
    return pre, state


def _emit8_kernel(x_ref, tbl_ref, entries_ref, out_ref, exits_ref, state_ref):
    """One (lane_tile, k_tile) cell: walk kt bytes, pack 4 pre-states per
    int32 output row. entries/exits are whole-array VMEM refs indexed by the
    lane-tile id (tiny: lanes*4 B)."""
    i_l = pl.program_id(0)
    i_k = pl.program_id(1)
    n_k = pl.num_programs(1)

    @pl.when(i_k == 0)
    def _():
        state_ref[:] = entries_ref[pl.ds(i_l, 1), :]

    kt, lt = x_ref.shape

    def body(q, state):
        pre, state = _steps8(x_ref, tbl_ref, state, q, lt)
        out_ref[pl.ds(q, 1), :] = (
            (pre[0] << 24) | (pre[1] << 16) | (pre[2] << 8) | pre[3]
        )
        return state

    state = jax.lax.fori_loop(0, kt // UNROLL, body, state_ref[:])
    state_ref[:] = state

    @pl.when(i_k == n_k - 1)
    def _():
        exits_ref[pl.ds(i_l, 1), :] = state


def _sync8_kernel(x_ref, tbl_ref, entries_ref, exits_ref, state_ref):
    """State-only pass (used on each chunk's suffix window for the entry
    first guess)."""
    i_l = pl.program_id(0)
    i_k = pl.program_id(1)
    n_k = pl.num_programs(1)

    @pl.when(i_k == 0)
    def _():
        state_ref[:] = entries_ref[pl.ds(i_l, 1), :]

    kt, lt = x_ref.shape

    def body(q, state):
        _, state = _steps8(x_ref, tbl_ref, state, q, lt)
        return state

    state = jax.lax.fori_loop(0, kt // UNROLL, body, state_ref[:])
    state_ref[:] = state

    @pl.when(i_k == n_k - 1)
    def _():
        exits_ref[pl.ds(i_l, 1), :] = state


@partial(jax.jit, static_argnames=("interpret",))
def sync_pass_pallas8(xs, table_T, entries, interpret: bool = False):
    """xs: int32[W, lanes] byte rows; table_T: bf16[256, S]; entries:
    int32[lanes] -> exits int32[lanes]."""
    k, lanes = xs.shape
    table_T = to_kernel_table(table_T)
    lt, kt = _tiles8(lanes, k)
    grid = (lanes // lt, k // kt)
    exits = pl.pallas_call(
        _sync8_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((kt, lt), lambda i, j: (j, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # table, replicated
            pl.BlockSpec(memory_space=pltpu.VMEM),  # entries, whole array
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((lanes // lt, lt), jnp.int32),
        scratch_shapes=[pltpu.VMEM((1, lt), jnp.int32)],
        interpret=interpret,
    )(xs, table_T, entries.reshape(lanes // lt, lt))
    return exits.reshape(lanes)


@partial(jax.jit, static_argnames=("interpret",))
def emit_pass_pallas8(xs, table_T, entries, interpret: bool = False):
    """Full pass emitting the state sequence. Returns (packed int32
    [K/4, lanes] — 4 pre-states MSB-first per word, exits int32[lanes])."""
    k, lanes = xs.shape
    table_T = to_kernel_table(table_T)
    lt, kt = _tiles8(lanes, k)
    grid = (lanes // lt, k // kt)
    packed, exits = pl.pallas_call(
        _emit8_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((kt, lt), lambda i, j: (j, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # entries, whole array
        ],
        out_specs=(
            pl.BlockSpec(
                (kt // UNROLL, lt), lambda i, j: (j, i), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # exits, whole array
        ),
        out_shape=(
            jax.ShapeDtypeStruct((k // UNROLL, lanes), jnp.int32),
            jax.ShapeDtypeStruct((lanes // lt, lt), jnp.int32),
        ),
        scratch_shapes=[pltpu.VMEM((1, lt), jnp.int32)],
        interpret=interpret,
    )(xs, table_T, entries.reshape(lanes // lt, lt))
    return packed, exits.reshape(lanes)


# Expand-kernel tiles: the per-cell VMEM must hold UNROLL_EXP staged
# [(m+1)*S, lt] f32 lookup results plus the [(m+1)*kt, lt] output block, so
# k tiles are shorter than the FSM kernel's. Interleaved same-process sweep
# on the 5.2 MB corpus (split table, chained-marginal medians over 5
# rounds): (64,4) 2.55 ms/pass with the tightest spread (2.50-2.69) beats
# (128,4) 2.71, (64,8) 2.63, (128,8) 2.59 (one corrupt sample), (256,4)
# 2.77, (128,2) 2.93; (512,2) fails to compile (VMEM).
K_TILE_EXP = 64
UNROLL_EXP = 4


def _expand_kernel(m: int, s: int):
    """Kernel factory: per byte, one [256,(m+1)S] one-hot contraction (NOT
    state-dependent — states are precomputed inputs here, so the U matmuls
    pipeline), then m+1 masked S-reductions emit (packed count | symbol
    slots) rows."""

    def kernel(x_ref, st_ref, tbl_ref, out_ref):
        kt, lt = x_ref.shape
        b_col = jax.lax.broadcasted_iota(jnp.int32, (N_INPUT, lt), 0)
        s_col = jax.lax.broadcasted_iota(jnp.int32, (s, lt), 0)

        def body(q, _):
            ds = []
            for u in range(UNROLL_EXP):
                x = x_ref[pl.ds(q * UNROLL_EXP + u, 1), :]
                ohB = (x == b_col).astype(jnp.bfloat16)
                ds.append(
                    jax.lax.dot_general(
                        tbl_ref[:], ohB, (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )  # ((m+1)*S, lt)
                )
            for u in range(UNROLL_EXP):
                st = st_ref[pl.ds(q * UNROLL_EXP + u, 1), :]
                mask = (st == s_col).astype(jnp.float32)  # (S, lt)
                for j in range(m + 1):
                    blk = jax.lax.slice_in_dim(ds[u], j * s, (j + 1) * s, axis=0)
                    row = jnp.sum(blk * mask, axis=0, keepdims=True)
                    out_ref[
                        pl.ds((q * UNROLL_EXP + u) * (m + 1) + j, 1), :
                    ] = row.astype(jnp.int32)
            return 0

        jax.lax.fori_loop(0, kt // UNROLL_EXP, body, 0)

    return kernel


@partial(jax.jit, static_argnames=("m", "interpret"))
def expand_pass_pallas8(xs, states_T, t_exp, m: int, interpret: bool = False):
    """Fused expand pass: xs int32[K, lanes] byte rows, states_T int32
    [K, lanes] pre-states, t_exp bf16[256, (m+1)*S] (format.fsm8
    ``expand_tensors`` layout). Returns vals int32[K, m+1, lanes] — row 0 is
    count+16*invalid, rows 1.. are the symbol slots (the layout
    ops/decode8.expand_pass_device consumes)."""
    k, lanes = xs.shape
    s = t_exp.shape[1] // (m + 1)
    lt = min(LANE_TILE, lanes)
    kt = min(K_TILE_EXP, k)
    if lanes % lt or k % kt or kt % UNROLL_EXP:
        raise ValueError(f"lanes={lanes} k={k} not tileable to ({lt},{kt})")
    grid = (lanes // lt, k // kt)
    out = pl.pallas_call(
        _expand_kernel(m, s),
        grid=grid,
        in_specs=[
            pl.BlockSpec((kt, lt), lambda i, j: (j, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((kt, lt), lambda i, j: (j, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # expand table
        ],
        out_specs=pl.BlockSpec(
            (kt * (m + 1), lt), lambda i, j: (j, i), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((k * (m + 1), lanes), jnp.int32),
        interpret=interpret,
    )(xs, states_T, t_exp)
    return out.reshape(k, m + 1, lanes)


# Split-expand tiles (kernel below): the staged lookup is [2S+9(mt+1), lt]
# f32 per unrolled byte — roughly half the fused kernel's [(m+1)S, lt] at
# S=128/m=3 — so the same (128,4) tiling leaves VMEM headroom.
K_TILE_EXPS = 128
UNROLL_EXPS = 4
N_P = 9  # first-code end positions: 1..8 plus 0 = "no code completed"


def _expand_split_kernel(m: int, mt: int, s: int):
    """Split-table expand (format.fsm8.split_expand_tensors): ONE
    [256, 2S+9(mt+1)] one-hot contraction per byte, then a masked S-reduce
    by state for (first symbol, p+16*inv1) and masked 9-reduces by p for the
    tail (count+16*inv2, slots). Emits the same packed rows as
    _expand_kernel: row 0 = count | 16*invalid, rows 1.. = symbol slots."""

    def kernel(x_ref, st_ref, tbl_ref, out_ref):
        kt, lt = x_ref.shape
        b_col = jax.lax.broadcasted_iota(jnp.int32, (N_INPUT, lt), 0)
        s_col = jax.lax.broadcasted_iota(jnp.int32, (s, lt), 0)
        p_col = jax.lax.broadcasted_iota(jnp.int32, (N_P, lt), 0)

        def body(q, _):
            ds = []
            for u in range(UNROLL_EXPS):
                x = x_ref[pl.ds(q * UNROLL_EXPS + u, 1), :]
                ohB = (x == b_col).astype(jnp.bfloat16)
                ds.append(
                    jax.lax.dot_general(
                        tbl_ref[:], ohB, (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )  # (2S + 9*(mt+1), lt)
                )
            for u in range(UNROLL_EXPS):
                st = st_ref[pl.ds(q * UNROLL_EXPS + u, 1), :]
                mask_s = (st == s_col).astype(jnp.float32)  # (S, lt)
                d = ds[u]
                fs = jnp.sum(
                    jax.lax.slice_in_dim(d, 0, s, axis=0) * mask_s,
                    axis=0, keepdims=True,
                ).astype(jnp.int32)
                pv = jnp.sum(
                    jax.lax.slice_in_dim(d, s, 2 * s, axis=0) * mask_s,
                    axis=0, keepdims=True,
                ).astype(jnp.int32)
                p = pv & 15
                mask_p = (p == p_col).astype(jnp.float32)  # (9, lt)
                tc = jnp.sum(
                    jax.lax.slice_in_dim(d, 2 * s, 2 * s + N_P, axis=0) * mask_p,
                    axis=0, keepdims=True,
                ).astype(jnp.int32)
                inv = ((pv >= 16) | (tc >= 16)).astype(jnp.int32)
                count = ((p > 0).astype(jnp.int32) + (tc & 15))
                row0 = jnp.where(inv > 0, 16, count)
                base = (q * UNROLL_EXPS + u) * (m + 1)
                out_ref[pl.ds(base, 1), :] = row0
                out_ref[pl.ds(base + 1, 1), :] = fs
                for j in range(min(mt, m - 1)):
                    off = 2 * s + (1 + j) * N_P
                    row = jnp.sum(
                        jax.lax.slice_in_dim(d, off, off + N_P, axis=0) * mask_p,
                        axis=0, keepdims=True,
                    ).astype(jnp.int32)
                    out_ref[pl.ds(base + 2 + j, 1), :] = row
            return 0

        jax.lax.fori_loop(0, kt // UNROLL_EXPS, body, 0)

    return kernel


@partial(jax.jit, static_argnames=("m", "mt", "interpret"))
def expand_pass_split_pallas8(xs, states_T, t_split, m: int, mt: int,
                              interpret: bool = False):
    """Split-table twin of :func:`expand_pass_pallas8`: xs int32[K, lanes],
    states_T int32[K, lanes], t_split bf16[256, 2S+9(mt+1)]
    (format.fsm8.split_expand_tensors). Returns vals int32[K, m+1, lanes]
    in the exact expand_pass_pallas8 layout."""
    k, lanes = xs.shape
    s = (t_split.shape[1] - N_P * (mt + 1)) // 2
    lt = min(LANE_TILE, lanes)
    kt = min(K_TILE_EXPS, k)
    if lanes % lt or k % kt or kt % UNROLL_EXPS:
        raise ValueError(f"lanes={lanes} k={k} not tileable to ({lt},{kt})")
    grid = (lanes // lt, k // kt)
    out = pl.pallas_call(
        _expand_split_kernel(m, mt, s),
        grid=grid,
        in_specs=[
            pl.BlockSpec((kt, lt), lambda i, j: (j, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((kt, lt), lambda i, j: (j, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # split expand table
        ],
        out_specs=pl.BlockSpec(
            (kt * (m + 1), lt), lambda i, j: (j, i), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((k * (m + 1), lanes), jnp.int32),
        interpret=interpret,
    )(xs, states_T, t_split)
    return out.reshape(k, m + 1, lanes)


# One-pass (fused emit+expand) tiles: staged lookup is [2s+9(mt+2), lt] f32
# per unrolled byte (~228 cols at s=96/mt=2 — 2 MXU tiles, vs 1+3 across the
# emit+split-expand pair) plus the [(m+1)*kt, lt] output block. Interleaved
# same-process sweep on v5e (5.2 MB corpus, chained-marginal medians over 5
# rounds): (64,8) 2.05 ms beats (128,8) 2.09, (256,4) 2.17, (64,4) 2.18,
# (128,4) 2.22, (128,2) 2.38; (512,4) fails to compile (VMEM). A second
# on-chip sweep (r4, tune_fused + full-e2e interleaved A/B) moved the
# default to (64,16): pass 1.30 vs 1.35 ms, e2e median 4.21 vs 4.31 ms,
# checksums byte-equal. Env knobs for sweeps (see CLAUDE.md).
K_TILE_FUSED = int(os.environ.get("ENTREEPY_FUSED_KT", "64"))
UNROLL_FUSED = int(os.environ.get("ENTREEPY_FUSED_UNROLL", "16"))


def _fused_kernel(m: int, mt: int, s: int, packed: bool = False,
                  k_total: int = 0, mask: bool = True):
    """One-pass decode kernel (table: format.fsm8.fused_decode_tensors):
    ONE [256, 2s+9(mt+2)] one-hot contraction per byte drives BOTH the
    serial state chain and the symbol emission. Per byte: masked s-reduce
    the merged/p blocks by the running state, masked 9-reduce the tail
    blocks by p, ``state' = p>0 ? tail_end : merged``; emits the packed
    (count|16*invalid, symbol slots) rows of _expand_kernel — or, when
    ``packed`` (m <= 3), ONE int32 row per byte holding
    ``row0 << 8m | slot0 << 8(m-1) | ...`` (5 + 8m <= 29 bits): 1/(m+1) of
    the HBM writes and while-loop carry.

    Packed rows carry a MASKED count byte: bytes at-or-past ``nv_ref`` (the
    lane-linear valid-byte bound, i.e. padding) emit ``row0 = 0`` so
    downstream consumers read counts/invalid straight off ``word >> 8m``
    with NO position grid or re-mask — measured on v5e that XLA epilogue
    cost ~1.9 ms on a 5.2 MB body, 2.6x the fused pass itself
    (benchmarks/probe_compact_dec). Symbol slot bytes are NOT masked (dead
    slots carry table garbage): every consumer gates extraction on the
    count, so zeroing them in-kernel would buy nothing — an earlier
    variant that did (plus per-slot masking) cost +2 ms of kernel time.
    The mask itself is one hoisted [1, lt] threshold compare + one select
    per byte."""
    n_p = N_P

    def kernel(x_ref, tbl_ref, entries_ref, nv_ref, out_ref, exits_ref,
               state_ref):
        i_l = pl.program_id(0)
        i_k = pl.program_id(1)
        n_k = pl.num_programs(1)

        @pl.when(i_k == 0)
        def _():
            state_ref[:] = entries_ref[pl.ds(i_l, 1), :]

        kt, lt = x_ref.shape
        b_col = jax.lax.broadcasted_iota(jnp.int32, (N_INPUT, lt), 0)
        s_col = jax.lax.broadcasted_iota(jnp.int32, (s, lt), 0)
        p_col = jax.lax.broadcasted_iota(jnp.int32, (n_p, lt), 0)
        if packed and mask:
            # per-lane threshold: byte k of this cell is real iff
            # k < nv - lane*K - i_k*kt (lane-linear positions, matching the
            # scan twin's mask in pack_fused_rows_masked); hoisted so the
            # per-byte cost is one scalar-vs-vector compare + one select
            thresh = nv_ref[:] - (
                i_l * lt + jax.lax.broadcasted_iota(jnp.int32, (1, lt), 1)
            ) * k_total - i_k * kt

        def body(q, state):
            ds = []
            for u in range(UNROLL_FUSED):
                x = x_ref[pl.ds(q * UNROLL_FUSED + u, 1), :]
                ds.append(_tbl_dot(tbl_ref, x, b_col))  # (2s + 9*(mt+2), lt)
            for u in range(UNROLL_FUSED):
                d, off0 = ds[u]
                mask_s = (state == s_col).astype(jnp.int32)  # (s, lt)
                mg = _mask_reduce(d, mask_s, off0, 0, s)
                pv = _mask_reduce(d, mask_s, off0, s, 2 * s)
                p = pv & 15
                mask_p = (p == p_col).astype(jnp.int32)  # (9, lt)
                tcv = _mask_reduce(d, mask_p, off0, 2 * s, 2 * s + n_p)
                inv = ((pv >= 16) | ((p > 0) & (tcv >= 16))).astype(jnp.int32)
                count = (p > 0).astype(jnp.int32) + (tcv & 15)
                row0 = jnp.where(inv > 0, 16, count)
                slots = [mg]
                for j in range(min(mt, m - 1)):
                    off = 2 * s + (1 + j) * n_p
                    slots.append(_mask_reduce(d, mask_p, off0, off, off + n_p))
                if packed:
                    if mask:
                        real = (q * UNROLL_FUSED + u) < thresh
                        row0 = jnp.where(real, row0, 0)
                    word = row0 << (8 * m)
                    for j, sl in enumerate(slots):
                        word = word | (sl << (8 * (m - 1 - j)))
                    out_ref[pl.ds(q * UNROLL_FUSED + u, 1), :] = word
                else:
                    base = (q * UNROLL_FUSED + u) * (m + 1)
                    out_ref[pl.ds(base, 1), :] = row0
                    for j, sl in enumerate(slots):
                        out_ref[pl.ds(base + 1 + j, 1), :] = sl
                off_e = 2 * s + (1 + mt) * n_p
                tend = _mask_reduce(d, mask_p, off0, off_e, off_e + n_p)
                state = jnp.where(p > 0, tend, mg)
            return state

        state = jax.lax.fori_loop(0, kt // UNROLL_FUSED, body, state_ref[:])
        state_ref[:] = state

        @pl.when(i_k == n_k - 1)
        def _():
            exits_ref[pl.ds(i_l, 1), :] = state

    return kernel


def fused_tileable(lanes: int, k: int) -> bool:
    """True when :func:`fused_pass_pallas8` accepts ``[k, lanes]`` shapes —
    a cheap static precheck so routing decisions (e.g. the streaming tiled
    decode) can avoid paths that would raise mid-pipeline."""
    lt = min(LANE_TILE, lanes)
    kt = min(K_TILE_FUSED, k)
    return lanes % lt == 0 and k % kt == 0 and kt % UNROLL_FUSED == 0


@partial(jax.jit, static_argnames=("m", "mt", "s", "packed", "mask",
                                   "interpret"))
def fused_pass_pallas8(xs, t_fused, entries, m: int, mt: int, s: int,
                       packed: bool = False, n_valid=None, mask: bool = True,
                       interpret: bool = False):
    """One full one-pass decode sweep: xs int32[K, lanes] byte rows, t_fused
    bf16[256, 2s+9(mt+2)] (format.fsm8.fused_decode_tensors), entries
    int32[lanes]. Returns (vals, exits int32[lanes]); vals is int32
    [K, m+1, lanes] — the expand_pass_pallas8 packed layout — or, when
    ``packed`` (m <= 3 only), ONE int32 word per byte [K, lanes] holding
    ``row0 << 8m | slot_j << 8(m-1-j)`` — 1/(m+1) of the HBM writes,
    MASKED in-kernel (dead slots zero; bytes at lane-linear positions >=
    ``n_valid`` all-zero — required in packed mode)."""
    k, lanes = xs.shape
    if packed and m > 3:
        raise ValueError(f"packed fused rows need 5 + 8m <= 29 bits (m={m})")
    if packed and mask and n_valid is None:
        raise ValueError("packed fused rows are masked in-kernel: pass "
                         "n_valid (the lane-linear valid-byte bound); "
                         "mask=False is a probe-only escape hatch")
    t_fused = to_kernel_table(t_fused)
    lt = min(LANE_TILE, lanes)
    kt = min(K_TILE_FUSED, k)
    if lanes % lt or k % kt or kt % UNROLL_FUSED:
        raise ValueError(f"lanes={lanes} k={k} not tileable to ({lt},{kt})")
    grid = (lanes // lt, k // kt)
    rows = 1 if packed else m + 1
    nv = jnp.reshape(
        jnp.int32(0) if n_valid is None else n_valid, (1, 1)
    ).astype(jnp.int32)
    out, exits = pl.pallas_call(
        _fused_kernel(m, mt, s, packed=packed, k_total=k, mask=mask),
        grid=grid,
        in_specs=[
            pl.BlockSpec((kt, lt), lambda i, j: (j, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # fused table
            pl.BlockSpec(memory_space=pltpu.VMEM),  # entries, whole array
            pl.BlockSpec(memory_space=pltpu.VMEM),  # n_valid (1,1)
        ],
        out_specs=(
            pl.BlockSpec(
                (kt * rows, lt), lambda i, j: (j, i), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # exits, whole array
        ),
        out_shape=(
            jax.ShapeDtypeStruct((k * rows, lanes), jnp.int32),
            jax.ShapeDtypeStruct((lanes // lt, lt), jnp.int32),
        ),
        scratch_shapes=[pltpu.VMEM((1, lt), jnp.int32)],
        interpret=interpret,
    )(xs, t_fused, entries.reshape(lanes // lt, lt), nv)
    if packed:
        return out, exits.reshape(lanes)
    return out.reshape(k, m + 1, lanes), exits.reshape(lanes)


@partial(jax.jit, static_argnames=("m", "mt", "s", "packed", "max_passes",
                                   "interpret"))
def fsm8_decode_fused_pallas(cols, table_T, t_fused, n_real_lanes, m: int,
                             mt: int, s: int, packed: bool = False,
                             max_passes: int | None = None,
                             interpret: bool = False, entry0=None,
                             n_valid=None):
    """One-pass Pallas decode: cols int32[lanes, K] -> (vals int32
    [K, m+1, lanes] packed symbol rows — or [K, lanes] one-word rows when
    ``packed``, masked in-kernel (``n_valid`` required) — exits
    int32[lanes], unconverged bool). The suffix sync uses the narrow
    [256, S] sync table; the fixed-point loop runs whole fused passes
    (typically exactly one — the suffix guess is near-exact). ``entry0``
    pins the first lane's entry state (default 0 = stream start; body
    tiles chain the previous tile's last exit here)."""
    from .decode8 import MAX_SYNC_PASSES, SYNC_WINDOW

    lanes, k = cols.shape
    xs = cols.T  # [K, lanes]
    real = jnp.arange(lanes, dtype=jnp.int32) < n_real_lanes
    mp = max_passes or MAX_SYNC_PASSES
    e0 = jnp.zeros(1, jnp.int32) if entry0 is None else jnp.reshape(
        entry0, (1,)
    ).astype(jnp.int32)

    w = min(SYNC_WINDOW, k)
    suffix_exits = sync_pass_pallas8(
        xs[k - w :], table_T, jnp.zeros(lanes, jnp.int32), interpret=interpret
    )
    entries0 = jnp.concatenate([e0, suffix_exits[:-1]])

    def cond(c):
        entries, prev, _, _, it = c
        return jnp.logical_and(
            it < mp, jnp.any(jnp.logical_and(entries != prev, real))
        )

    def body(c):
        entries, _, _, _, it = c
        vals, exits = fused_pass_pallas8(
            xs, t_fused, entries, m, mt, s, packed=packed, n_valid=n_valid,
            interpret=interpret
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


def unpack_states_packed(packed, k: int):
    """int32[K/4, lanes] (4 pre-states MSB-first per word) -> uint8[K, lanes]
    (elementwise shifts; no gathers)."""
    shifts = jnp.array([24, 16, 8, 0], jnp.int32).reshape(1, 4, 1)
    states = ((packed[:, None, :] >> shifts) & 0xFF).astype(jnp.uint8)
    return states.reshape(k, packed.shape[1])


@partial(jax.jit, static_argnames=("max_passes", "interpret"))
def fsm8_decode_pallas(cols, table_T, n_real_lanes, max_passes: int | None = None,
                       interpret: bool = False):
    """Pallas twin of ops.decode8.fsm8_decode: cols int32[lanes, K] ->
    (states uint8[lanes, K] pre-transition per byte, unconverged bool)."""
    from .decode8 import MAX_SYNC_PASSES, SYNC_WINDOW

    lanes, k = cols.shape
    xs = cols.T  # [K, lanes]
    real = jnp.arange(lanes, dtype=jnp.int32) < n_real_lanes
    mp = max_passes or MAX_SYNC_PASSES

    w = min(SYNC_WINDOW, k)
    suffix_exits = sync_pass_pallas8(
        xs[k - w :], table_T, jnp.zeros(lanes, jnp.int32), interpret=interpret
    )
    entries0 = jnp.concatenate([jnp.zeros(1, jnp.int32), suffix_exits[:-1]])

    def cond(c):
        entries, prev, _, it = c
        return jnp.logical_and(
            it < mp, jnp.any(jnp.logical_and(entries != prev, real))
        )

    def body(c):
        entries, _, _, it = c
        packed, exits = emit_pass_pallas8(xs, table_T, entries, interpret=interpret)
        new_entries = jnp.concatenate([jnp.zeros(1, jnp.int32), exits[:-1]])
        return new_entries, entries, packed, it + 1

    packed0 = jnp.zeros((k // 4, lanes), jnp.int32)
    entries, prev, packed, _ = jax.lax.while_loop(
        cond, body, (entries0, entries0 - 1, packed0, jnp.int32(0))
    )
    unconverged = jnp.any(jnp.logical_and(entries != prev, real))

    return unpack_states_packed(packed, k).T, unconverged
