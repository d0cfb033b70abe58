"""Pallas TPU kernel for sort-free stream compaction (encode plane path).

Replaces the XLA per-subgroup ``sort_key_val`` in
``ops/bitpack.compact_payload_plane`` with a doubling-shift compaction run
entirely in VMEM: each element's move distance is the count of dead slots
before it (an exclusive prefix sum of the dead mask), which is monotone
non-decreasing along the row — so shifting elements whose remaining move
has bit b set left by 2**b, for b = 0..log2(sub)-1, never collides two
live elements (dead slots are don't-care and may be clobbered). Both the
prefix sum and the shift rounds are static-offset row shifts, so the
whole compaction is log2(sub) + log2(sub) vectorized rounds with ONE HBM
read of the dense (words, emitted) grids and a cap_g-row write — no sort
network, no position keys, no second pass. A 2000-trial randomized
equivalence check against boolean-mask compaction backs the no-collision
argument (see tests/test_pallas8.py), and the wrapper's contract is
byte-identical to the sort path's (live prefixes per subgroup, zeroed
dead slots).

Mosaic rules observed (as in pallas_fsm8.py): everything 2-D, static row
slices/concats only, int32 arithmetic, no f32<->u32 casts in-kernel.

Reference counterpart: the serial bit-writer ``encode.zig:301-319`` never
compacts — it writes the stream in place one bit at a time.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Lane tile: 512 halves the per-cell VMEM of the [sub, lt] working arrays
# vs the pack kernel's 1024 (the shift rounds keep ~4 live copies); the
# kernel is HBM-bound either way. Wide subgroups (the per-lane decode
# fetch layout passes sub = chunk_bytes * m = 1536) shrink the tile
# further to keep the ~5 live [sub, lt] int32 copies inside VMEM.
LANE_TILE_C = 512


def _lane_tile(lanes: int, sub: int) -> int:
    cap_lt = 512 if sub <= 256 else (256 if sub <= 768 else 128)
    return min(cap_lt, lanes)


def _shift_up(x: jax.Array, sh: int) -> jax.Array:
    """rows i <- i+sh (tail zero-filled); static offsets only."""
    n = x.shape[0]
    z = jnp.zeros((sh, x.shape[1]), x.dtype)
    return jnp.concatenate([jax.lax.slice_in_dim(x, sh, n, axis=0), z], axis=0)


def _shift_down(x: jax.Array, sh: int) -> jax.Array:
    """rows i <- i-sh (head zero-filled)."""
    n = x.shape[0]
    z = jnp.zeros((sh, x.shape[1]), x.dtype)
    return jnp.concatenate([z, jax.lax.slice_in_dim(x, 0, n - sh, axis=0)], axis=0)


def _compact_kernel(sub: int, cap: int):
    """One (lane_tile, subgroup) cell: compact the live rows of a [sub, lt]
    block to its top, zero the rest, emit the first ``cap`` rows + the live
    count."""
    rounds = (sub - 1).bit_length()  # max move = sub - 1

    def kernel(w_ref, e_ref, plane_ref, cnt_ref):
        i_l = pl.program_id(0)
        i_g = pl.program_id(1)
        n_g = pl.num_programs(1)
        e = e_ref[:]  # (sub, lt) int32 0/1
        val = jnp.where(e == 1, w_ref[:], 0)

        # exclusive prefix sum of the dead mask = per-element move distance
        dead = 1 - e
        inc = dead
        for b in range(rounds):
            inc = inc + _shift_down(inc, 1 << b)
        mv = inc - dead

        live = e
        for b in range(rounds):
            sh = 1 << b
            av = _shift_up(val, sh)
            al = _shift_up(live, sh)
            am = _shift_up(mv, sh)
            take = (al == 1) & (((am >> b) & 1) == 1)
            stay = (live == 1) & (((mv >> b) & 1) == 0)
            val = jnp.where(take, av, val)
            mv = jnp.where(take, am - sh, mv)
            live = (take | stay).astype(jnp.int32)

        val = jnp.where(live == 1, val, 0)  # stale copies -> 0, like the sort
        plane_ref[:] = jax.lax.slice_in_dim(val, 0, cap, axis=0)
        # counts ride a whole-array VMEM ref (a (1, lt) output block violates
        # Mosaic's 8-sublane minimum): one row per (lane_tile, subgroup) cell
        cnt_ref[pl.ds(i_l * n_g + i_g, 1), :] = jnp.sum(e, axis=0, keepdims=True)

    return kernel


def compact_tileable(lanes: int, k: int, sub: int, cap: int) -> bool:
    """True when :func:`compact_rows_pallas` accepts these shapes: subgroups
    on Mosaic's 8-sublane grid tiling the step axis, lane tile dividing the
    lane count, cap on the same grid. (Any ``sub`` is algorithmically fine —
    the shift-round count is just ``(sub-1).bit_length()`` — the bounds are
    Mosaic block-shape and VMEM constraints.)"""
    lt = _lane_tile(lanes, sub)
    return (
        8 <= sub <= 2048  # the shift rounds keep ~5 [sub, lt] copies in VMEM
        and sub % 8 == 0
        and k % sub == 0
        and lanes % lt == 0
        and cap % 8 == 0
        and 0 < cap <= sub
    )


@partial(jax.jit, static_argnames=("sub", "cap", "interpret"))
def compact_rows_pallas(wk, ek, sub: int, cap: int, interpret: bool = False):
    """wk int32[k, lanes] dense emission slots (k-major, the pack kernel's
    native orientation), ek int32[k, lanes] emitted flags -> (plane_k
    int32[(k//sub)*cap, lanes] — each subgroup's live words packed to its
    front, zeros after — counts int32[k//sub, lanes])."""
    k, lanes = wk.shape
    if not compact_tileable(lanes, k, sub, cap):
        raise ValueError(
            f"lanes={lanes} k={k} sub={sub} cap={cap} not compact-tileable"
        )
    lt = _lane_tile(lanes, sub)
    g = k // sub
    grid = (lanes // lt, g)
    plane_k, counts = pl.pallas_call(
        _compact_kernel(sub, cap),
        grid=grid,
        in_specs=[
            pl.BlockSpec((sub, lt), lambda i, j: (j, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((sub, lt), lambda i, j: (j, i), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((cap, lt), lambda i, j: (j, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # counts, whole array
        ),
        out_shape=(
            jax.ShapeDtypeStruct((g * cap, lanes), jnp.int32),
            jax.ShapeDtypeStruct((lanes // lt * g, lt), jnp.int32),
        ),
        interpret=interpret,
    )(wk, ek)
    # rows are (lane_tile, subgroup) -> [g, lanes]
    counts = counts.reshape(lanes // lt, g, lt).transpose(1, 0, 2).reshape(g, lanes)
    return plane_k, counts
