"""Pallas FSM kernels must match the XLA scan decoder exactly.

Runs in interpreter mode on the virtual CPU backend (tiny shapes — interpret
mode executes Python per step). Real-TPU compilation is exercised by the
bench's device probe.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from entreepy_tpu.format import build_code_table, compress_host, histogram, parse_header
from entreepy_tpu.format.fsm import build_decode_fsm
from entreepy_tpu.ops.decode import (
    _table_bf16,
    _table_sync_bf16,
    fsm_decode,
    words_to_nibbles,
)
from entreepy_tpu.ops.pallas_fsm import fsm_decode_pallas, pallas_table


def _prep(data: bytes, chunk_bytes: int = 32):
    et = compress_host(data)
    hdr = parse_header(et)
    fsm = build_decode_fsm(hdr.table)
    buf = np.frombuffer(et, np.uint8)[hdr.body_start:]
    n_real = max(1, -(-buf.size // chunk_bytes))
    lanes = max(8, 1 << (n_real - 1).bit_length())
    padded = np.zeros(lanes * chunk_bytes, np.uint8)
    padded[: buf.size] = buf
    nib = words_to_nibbles(
        jnp.asarray(padded.view(">u4").astype(np.uint32)), lanes, chunk_bytes * 2
    )
    return nib, fsm, n_real


def test_pallas_matches_scan_tiny(tiny_text):
    nib, fsm, n_real = _prep(tiny_text)
    p1, c1, u1 = fsm_decode(nib, _table_bf16(fsm), _table_sync_bf16(fsm), jnp.int32(n_real))
    tp = jnp.asarray(pallas_table(fsm), jnp.bfloat16)
    p2, c2, u2 = fsm_decode_pallas(nib, tp, tp[:, :16], jnp.int32(n_real), interpret=True)
    assert bool(u1) == bool(u2) is False
    assert np.array_equal(np.asarray(p1), np.asarray(p2))
    assert np.array_equal(np.asarray(c1), np.asarray(c2).astype(np.int32))


def test_pallas_pack_matches_scan_tiny(tiny_text):
    from entreepy_tpu.ops.bitpack import code_table_cols, pack_blocks_scan
    from entreepy_tpu.ops.pallas_pack import pack_blocks_pallas
    from entreepy_tpu.utils.stitch import split_blocks

    arr = np.frombuffer(tiny_text, np.uint8)
    table = build_code_table(histogram(arr))
    blocks, valid = split_blocks(arr, 16)
    n = blocks.shape[0]
    nb = max(8, 1 << (n - 1).bit_length())
    if nb != n:
        blocks = np.concatenate([blocks, np.zeros((nb - n, 16), np.uint8)])
        valid = np.concatenate([valid, np.zeros(nb - n, np.int32)])
    ct = jnp.asarray(code_table_cols(table.codes, table.lengths), jnp.bfloat16)
    w1, e1, a1, n1 = pack_blocks_scan(jnp.asarray(blocks), jnp.asarray(valid), ct)
    w2, e2, a2, n2 = pack_blocks_pallas(
        jnp.asarray(blocks), jnp.asarray(valid), ct, interpret=True
    )
    e1n, e2n = np.asarray(e1), np.asarray(e2)
    assert np.array_equal(e1n, e2n)
    assert np.array_equal(np.asarray(w1)[e1n], np.asarray(w2)[e2n])
    assert np.array_equal(np.asarray(a1), np.asarray(a2))
    assert np.array_equal(np.asarray(n1), np.asarray(n2))


def test_pallas_sync_table_layout_consistent(macbeth):
    # column 0 of the pallas layout must be the next-state table — identical
    # to the scan path's sync table
    fsm = build_decode_fsm(build_code_table(histogram(np.frombuffer(macbeth, np.uint8))))
    tp = pallas_table(fsm)
    ts = np.asarray(_table_sync_bf16(fsm), dtype=np.float32)
    assert np.array_equal(tp[:, :16], ts)
