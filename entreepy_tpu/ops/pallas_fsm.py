"""Pallas TPU kernels for the nibble FSM decoder (gen 1; the default is
now the byte-granularity ops/pallas_fsm8.py).

The XLA `lax.scan` formulation (ops/decode.py) re-issues the per-step op
sequence from HBM-resident state; these kernels fuse the whole nibble loop
into one Mosaic program with the transition table pinned in VMEM and the
running state vector in scratch, eliminating per-step loop overhead and
intermediate HBM traffic.

Grid layout: (lane_tiles, k_tiles), lane tile outer so the state scratch
carries across a lane tile's k tiles (TPU grid iterations run sequentially
per core; scratch persists across them). Arrays are [K, lanes] so each step
reads/writes one contiguous (1, lanes) row.

Mosaic-friendly formulation — everything stays 2-D with lanes on the lane
axis (no 1-D vectors, no jnp None-indexing, no lane<->sublane reshapes):

* one-hots are built *transposed* by broadcast compare:
  ``ohT[s, l] = (state[0, l] == s)`` — a (256, lanes) bf16 array
* the table is laid out ``[256, 6*16]`` with column ``c*16 + n`` so each
  output column c contracts a contiguous (256, 16) slice:
  ``Mc = Tc^T @ ohT`` ([16, lanes]) then a 16-row masked sum with the
  transposed nibble one-hot. Six small matmuls cost the same MACs as the
  scan path's single [lanes,256]x[256,96] product, and every value is
  <= 255 so bf16 accumulation stays exact.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..format.fsm import COLS_PER_NIBBLE, NIBBLE_FANOUT, DecodeFsm

LANE_TILE = 512
K_TILE = 256


def pallas_table(fsm: DecodeFsm) -> np.ndarray:
    """fsm.table [256, 16*6] (col n*6+c) -> [256, 6*16] (col c*16+n) f32."""
    t = fsm.table.reshape(fsm.width, NIBBLE_FANOUT, COLS_PER_NIBBLE)
    return np.ascontiguousarray(t.transpose(0, 2, 1).reshape(fsm.width, -1))


def _step(nib_ref, table_ref, state, t, lt, n_cols):
    """One FSM transition for a (1, lt) state row. Returns [n_cols] list of
    (1, lt) f32 value rows."""
    x2 = nib_ref[pl.ds(t, 1), :]  # (1, lt)
    n_states = table_ref.shape[0]  # 128 or 256 (format/fsm.py width)
    s_col = jax.lax.broadcasted_iota(jnp.int32, (n_states, lt), 0)
    n_col = jax.lax.broadcasted_iota(jnp.int32, (NIBBLE_FANOUT, lt), 0)
    ohT = (state == s_col).astype(jnp.bfloat16)  # (256, lt)
    selT = (x2 == n_col).astype(jnp.float32)  # (16, lt)
    cols = []
    for c in range(n_cols):
        tc = table_ref[:, c * NIBBLE_FANOUT : (c + 1) * NIBBLE_FANOUT]  # (256, 16)
        mc = jax.lax.dot_general(
            tc, ohT, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )  # (16, lt)
        cols.append(jnp.sum(mc * selT, axis=0, keepdims=True))  # (1, lt)
    return cols


def _emit_kernel(nib_ref, table_ref, entries_ref, packed_ref, counts_ref,
                 exits_ref, state_ref):
    """One (lane_tile, k_tile) cell of the emission pass. entries/exits are
    whole-array VMEM refs indexed by the lane-tile id (tiny: lanes*4 B)."""
    i_l = pl.program_id(0)
    i_k = pl.program_id(1)
    n_k = pl.num_programs(1)

    @pl.when(i_k == 0)
    def _():
        state_ref[:] = entries_ref[pl.ds(i_l, 1), :]

    kt, lt = nib_ref.shape

    def body(t, state):
        cols = _step(nib_ref, table_ref, state, t, lt, COLS_PER_NIBBLE)
        s0 = cols[2].astype(jnp.int32)
        s1 = cols[3].astype(jnp.int32)
        s2 = cols[4].astype(jnp.int32)
        s3 = cols[5].astype(jnp.int32)
        # int32 packing (bit pattern identical to uint32; the wrapper
        # bitcasts outside the kernel — Mosaic has no f32->u32 cast)
        packed_ref[pl.ds(t, 1), :] = (s0 << 24) | (s1 << 16) | (s2 << 8) | s3
        counts_ref[pl.ds(t, 1), :] = cols[1].astype(jnp.int32)
        return cols[0].astype(jnp.int32)

    state = jax.lax.fori_loop(0, kt, body, state_ref[:])
    state_ref[:] = state

    @pl.when(i_k == n_k - 1)
    def _():
        exits_ref[pl.ds(i_l, 1), :] = state


def _sync_kernel(nib_ref, table_ref, entries_ref, exits_ref, state_ref):
    """State-only pass: chunk exit states from guessed entries."""
    i_l = pl.program_id(0)
    i_k = pl.program_id(1)
    n_k = pl.num_programs(1)

    @pl.when(i_k == 0)
    def _():
        state_ref[:] = entries_ref[pl.ds(i_l, 1), :]

    kt, lt = nib_ref.shape

    def body(t, state):
        (ns,) = _step(nib_ref, table_ref, state, t, lt, 1)
        return ns.astype(jnp.int32)

    state = jax.lax.fori_loop(0, kt, body, state_ref[:])
    state_ref[:] = state

    @pl.when(i_k == n_k - 1)
    def _():
        exits_ref[pl.ds(i_l, 1), :] = state


def _tiles(lanes: int, k: int) -> tuple[int, int]:
    lt = min(LANE_TILE, lanes)
    kt = min(K_TILE, k)
    if lanes % lt or k % kt:
        raise ValueError(f"lanes={lanes} k={k} not divisible by tiles ({lt},{kt})")
    return lt, kt


@partial(jax.jit, static_argnames=("interpret",))
def sync_pass_pallas(nibbles_t, table_sync, entries, interpret: bool = False):
    """nibbles_t: int32[K, lanes]; table_sync: bf16[256, 16] (pallas layout);
    entries: int32[lanes] -> exits int32[lanes]."""
    k, lanes = nibbles_t.shape
    lt, kt = _tiles(lanes, k)
    grid = (lanes // lt, k // kt)
    exits = pl.pallas_call(
        _sync_kernel,
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
    )(nibbles_t, table_sync, entries.reshape(lanes // lt, lt))
    return exits.reshape(lanes)


@partial(jax.jit, static_argnames=("interpret",))
def emit_pass_pallas(nibbles_t, table_full, entries, interpret: bool = False):
    """Emission pass. table_full: bf16[256, 96] in pallas layout
    (:func:`pallas_table`). Returns (packed uint32[K, lanes], counts
    int32[K, lanes], exits int32[lanes])."""
    k, lanes = nibbles_t.shape
    lt, kt = _tiles(lanes, k)
    grid = (lanes // lt, k // kt)
    packed, counts, exits = pl.pallas_call(
        _emit_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((kt, lt), lambda i, j: (j, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # entries, whole array
        ],
        out_specs=(
            pl.BlockSpec((kt, lt), lambda i, j: (j, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((kt, lt), lambda i, j: (j, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # exits, whole array
        ),
        out_shape=(
            jax.ShapeDtypeStruct((k, lanes), jnp.int32),
            jax.ShapeDtypeStruct((k, lanes), jnp.int32),
            jax.ShapeDtypeStruct((lanes // lt, lt), jnp.int32),
        ),
        scratch_shapes=[pltpu.VMEM((1, lt), jnp.int32)],
        interpret=interpret,
    )(nibbles_t, table_full, entries.reshape(lanes // lt, lt))
    return jax.lax.bitcast_convert_type(packed, jnp.uint32), counts, exits.reshape(lanes)


@partial(jax.jit, static_argnames=("max_passes", "interpret"))
def fsm_decode_pallas(nibbles, table_full, table_sync, n_real_lanes,
                      max_passes: int | None = None, interpret: bool = False):
    """Pallas twin of ops.decode.fsm_decode: same inputs/outputs, with tables
    in the pallas [256, cols*16] layout.

    nibbles: int32[lanes, K] -> (packed uint32[lanes, K], counts int8
    [lanes, K], unconverged bool).
    """
    from .decode import MAX_SYNC_PASSES, self_sync_entries

    lanes, k = nibbles.shape
    xs = nibbles.T

    def sync_pass(entries):
        exits = sync_pass_pallas(xs, table_sync, entries, interpret=interpret)
        return jnp.concatenate([jnp.zeros(1, jnp.int32), exits[:-1]])

    entries, unconverged = self_sync_entries(
        sync_pass, lanes, n_real_lanes, max_passes or MAX_SYNC_PASSES
    )

    packed, counts, _ = emit_pass_pallas(xs, table_full, entries, interpret=interpret)
    return packed.T, counts.T.astype(jnp.int8), unconverged
