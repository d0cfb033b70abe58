"""Pallas TPU kernel for the block bit-packer (encode hot path).

Fuses the whole per-block byte loop of ops/bitpack.pack_blocks_scan into one
Mosaic program: the code table lives in VMEM, the 64-bit accumulator state
(two u32 halves + bit count) rides in scratch across k tiles, and each step
is one [256, 5] x [256, lanes] contraction (code length + four 8-bit code
limbs — every table value <= 255, so bf16 accumulation is exact).

Same Mosaic constraints as pallas_fsm8.py: everything 2-D, transposed one-hot
via broadcast compare, `pl.ds` row slicing, int32 bit patterns with
`shift_right_logical` standing in for uint32 shifts (bitcast at the wrapper).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N_SYMS = 256
# Tile defaults from the benchmarks/tune_pack.py sweep on v5e: (1024, 512)
# with 16 batched lookups per iteration packs the 5.2 MB corpus in 0.60 ms
# per pass (8.7 GB/s) vs 1.11 ms at the gen-1 (512, 256, 8) tiling.
LANE_TILE = 1024
K_TILE = 512
UNROLL = 16  # lookup matmuls issued per loop iteration


def _tiles(lanes: int, k: int) -> tuple[int, int]:
    lt = min(LANE_TILE, lanes)
    kt = min(K_TILE, k)
    if lanes % lt or k % kt:
        raise ValueError(f"lanes={lanes} k={k} not divisible by tiles ({lt},{kt})")
    return lt, kt


def _pack_kernel(bytes_ref, valid_ref, codetbl_ref, words_ref, emitted_ref,
                 acc_ref, nbits_ref, state_ref):
    """One (lane_tile, k_tile) cell. state scratch rows: 0 = acc_hi,
    1 = acc_lo, 2 = nbits."""
    i_l = pl.program_id(0)
    i_k = pl.program_id(1)
    n_k = pl.num_programs(1)

    @pl.when(i_k == 0)
    def _():
        state_ref[:] = jnp.zeros_like(state_ref)

    kt, lt = bytes_ref.shape
    s_col = jax.lax.broadcasted_iota(jnp.int32, (N_SYMS, lt), 0)
    valid_row = valid_ref[pl.ds(i_l, 1), :]  # (1, lt)
    # The per-byte (code, length) lookup matmuls are independent of the
    # accumulator chain, so UNROLL of them issue back-to-back per loop
    # iteration and pipeline on the MXU; only the cheap VPU accumulator
    # update runs serially between them.
    u_n = max(d for d in (UNROLL, 4, 2, 1) if kt % d == 0)

    def body(q, carry):
        vals_u = []
        for u in range(u_n):
            x2 = bytes_ref[pl.ds(q * u_n + u, 1), :]  # (1, lt)
            ohT = (x2 == s_col).astype(jnp.bfloat16)  # (256, lt)
            vals_u.append(
                jax.lax.dot_general(
                    codetbl_ref[:], ohT, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # (5, lt): len, limb0..limb3
            )

        acc_hi, acc_lo, nbits = carry  # (1, lt) int32 each
        for u in range(u_n):
            t = q * u_n + u
            vals = vals_u[u]
            live = (i_k * kt + t) < valid_row
            length = jnp.where(live, vals[0:1, :].astype(jnp.int32), 0)
            l0 = vals[1:2, :].astype(jnp.int32)
            l1 = vals[2:3, :].astype(jnp.int32)
            l2 = vals[3:4, :].astype(jnp.int32)
            l3 = vals[4:5, :].astype(jnp.int32)
            code = jnp.where(live, (l0 << 24) | (l1 << 16) | (l2 << 8) | l3, 0)

            s = nbits + length  # <= 63
            fits = s <= 32
            hi = jnp.where(
                fits,
                code << jnp.clip(32 - s, 0, 31),
                jax.lax.shift_right_logical(code, jnp.clip(s - 32, 0, 31)),
            )
            lo = jnp.where(fits, 0, code << jnp.clip(64 - s, 0, 31))
            acc_hi = acc_hi | hi
            acc_lo = acc_lo | lo

            emit = s >= 32
            words_ref[pl.ds(t, 1), :] = acc_hi
            emitted_ref[pl.ds(t, 1), :] = emit.astype(jnp.int32)
            acc_hi = jnp.where(emit, acc_lo, acc_hi)
            acc_lo = jnp.where(emit, 0, acc_lo)
            nbits = jnp.where(emit, s - 32, s)
        return acc_hi, acc_lo, nbits

    carry = (state_ref[0:1, :], state_ref[1:2, :], state_ref[2:3, :])
    acc_hi, acc_lo, nbits = jax.lax.fori_loop(0, kt // u_n, body, carry)
    state_ref[0:1, :] = acc_hi
    state_ref[1:2, :] = acc_lo
    state_ref[2:3, :] = nbits

    @pl.when(i_k == n_k - 1)
    def _():
        acc_ref[pl.ds(i_l, 1), :] = acc_hi
        nbits_ref[pl.ds(i_l, 1), :] = nbits


@partial(jax.jit, static_argnames=("interpret",))
def pack_blocks_pallas(blocks, valid, codetbl5, interpret: bool = False):
    """Pallas twin of ops.bitpack.pack_blocks_scan.

    blocks: uint8[lanes, steps] zero-padded; valid: int32[lanes]; codetbl5:
    bf16[256, 5] (code length + 4 big-endian byte limbs, from
    ``code_table_cols``). Returns (words uint32[lanes, steps], emitted
    bool[lanes, steps], acc uint32[lanes], nbits int32[lanes]).
    """
    lanes, k = blocks.shape
    lt, kt = _tiles(lanes, k)
    grid = (lanes // lt, k // kt)
    xs = blocks.T.astype(jnp.int32)  # [steps, lanes]
    words, emitted, acc, nbits = pl.pallas_call(
        _pack_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((kt, lt), lambda i, j: (j, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # valid, whole array
            pl.BlockSpec(memory_space=pltpu.VMEM),  # code table
        ],
        out_specs=(
            pl.BlockSpec((kt, lt), lambda i, j: (j, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((kt, lt), lambda i, j: (j, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # acc, whole array
            pl.BlockSpec(memory_space=pltpu.VMEM),  # nbits, whole array
        ),
        out_shape=(
            jax.ShapeDtypeStruct((k, lanes), jnp.int32),
            jax.ShapeDtypeStruct((k, lanes), jnp.int32),
            jax.ShapeDtypeStruct((lanes // lt, lt), jnp.int32),
            jax.ShapeDtypeStruct((lanes // lt, lt), jnp.int32),
        ),
        scratch_shapes=[pltpu.VMEM((3, lt), jnp.int32)],
        interpret=interpret,
    )(xs, valid.reshape(lanes // lt, lt), codetbl5)
    return (
        jax.lax.bitcast_convert_type(words.T, jnp.uint32),
        emitted.T.astype(bool),
        jax.lax.bitcast_convert_type(acc.reshape(lanes), jnp.uint32),
        nbits.reshape(lanes),
    )
