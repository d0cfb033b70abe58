"""Nibble-granularity Huffman decode FSM (gen 1) — see format/fsm8.py for
the byte-granularity successor that now backs the default decode paths.

The reference decodes with a hash probe per candidate code length per symbol
(``decode.zig:166-200``). Gather/hash lookups serialize on TPU, so the
TPU-native design reformulates decoding as a finite-state machine over
4-bit nibbles whose transition step is a one-hot matmul on the MXU:

* state = current Huffman tree node (root/internal; a 256-leaf tree has
  <= 255 internal nodes, so states fit one MXU lane dimension of 256)
* input = next 4 stream bits (MSB first)
* output = (next_state, count, up to 4 emitted symbols)

One decode step for a whole vector of independent chunks is then
``onehot(states) @ T`` — a [lanes, 256] x [256, 16*6] matmul with no gather,
no scatter, and values <= 255 everywhere so bf16 accumulation is exact.

The table is built on host from the parsed code table (tiny: 256 states x 16
nibbles, each a <= 4-step tree walk).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from .huffman import CodeTable

NIBBLE_BITS = 4
NIBBLE_FANOUT = 1 << NIBBLE_BITS  # 16
N_STATES = 256  # hard cap: a 256-leaf tree has <= 255 internal nodes
COLS_PER_NIBBLE = 6  # next_state, count, sym0..sym3


@dataclass(frozen=True)
class DecodeFsm:
    """table[s, v] = [next_state, count, s0, s1, s2, s3] (float32, values <= 255).

    ``table`` is laid out [S, NIBBLE_FANOUT * COLS_PER_NIBBLE] so a single
    matmul row-selects a state's entire transition row; the nibble's 6-column
    block is then selected with a second (tiny) one-hot multiply. S is the
    state width: 128 when the tree has <= 128 internal nodes (the common
    case for text — halves the dominant one-hot + contraction cost on
    device), else 256.
    """

    table: np.ndarray  # float32[S, 16*6], S in {128, 256}
    n_states: int  # actual internal node count (root = state 0)
    max_len: int
    min_len: int

    @property
    def width(self) -> int:
        return self.table.shape[0]


def _build_trie(table: CodeTable) -> tuple[np.ndarray, np.ndarray]:
    """Binary trie of the code table.

    Returns (children int32[n_int, 2], leaf_sym int32[n_int, 2]) where
    children[s, b] >= 0 is the internal node reached from s on bit b,
    or -1 when that edge lands on a leaf; leaf_sym[s, b] is that leaf's
    symbol (or -1). Node 0 is the root.
    """
    children = [[-1, -1]]
    leaf_sym = [[-1, -1]]
    present = np.flatnonzero(table.lengths > 0)
    for sym in present.tolist():
        length = int(table.lengths[sym])
        code = int(table.codes[sym])
        node = 0
        for i in range(length - 1):
            bit = (code >> (length - 1 - i)) & 1
            nxt = children[node][bit]
            if nxt < 0:
                children.append([-1, -1])
                leaf_sym.append([-1, -1])
                nxt = len(children) - 1
                children[node][bit] = nxt
            node = nxt
        leaf_sym[node][code & 1] = sym
    return np.asarray(children, np.int32), np.asarray(leaf_sym, np.int32)


def build_decode_fsm(table: CodeTable) -> DecodeFsm:
    children, leaf_sym = _build_trie(table)
    n_int = children.shape[0]
    if n_int > N_STATES:
        raise ValueError(f"{n_int} internal nodes exceed {N_STATES} FSM states")
    width = 128 if n_int <= 128 else N_STATES

    out = np.zeros((width, NIBBLE_FANOUT, COLS_PER_NIBBLE), dtype=np.float32)
    for s in range(n_int):
        for v in range(NIBBLE_FANOUT):
            node, count, syms = s, 0, [0, 0, 0, 0]
            for i in range(NIBBLE_BITS):
                bit = (v >> (NIBBLE_BITS - 1 - i)) & 1
                sym = leaf_sym[node][bit]
                if sym >= 0:
                    syms[count] = int(sym)
                    count += 1
                    node = 0
                else:
                    nxt = children[node][bit]
                    # Unreachable edge (corrupt stream / zero padding walking
                    # off the trie): stay decodable by restarting at the root.
                    node = int(nxt) if nxt >= 0 else 0
            out[s, v] = [node, count, *syms]

    return DecodeFsm(
        table=out.reshape(width, NIBBLE_FANOUT * COLS_PER_NIBBLE),
        n_states=n_int,
        max_len=table.max_len,
        min_len=table.min_len,
    )


def fsm_decode_host(fsm: DecodeFsm, nibbles: np.ndarray, state: int = 0):
    """Reference serial decode over a nibble array -> (symbols list, end state).

    Mirrors exactly what the device scan computes; used by tests.
    """
    t = fsm.table.reshape(fsm.width, NIBBLE_FANOUT, COLS_PER_NIBBLE)
    out = []
    for v in np.asarray(nibbles, dtype=np.int64):
        row = t[state, v]
        state = int(row[0])
        count = int(row[1])
        out.extend(int(x) for x in row[2 : 2 + count])
    return out, state
