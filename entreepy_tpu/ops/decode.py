"""Parallel decode of a serial Huffman bitstream — self-synchronizing chunks.

The reference decodes one symbol at a time through a u32 shift register and a
hash probe per candidate length (``decode.zig:143-203``, ~0.44 MB/s). A
Huffman stream has no block structure, so a parallel decoder must break the
bit-offset dependency chain. We use the self-synchronization property of
prefix codes (the approach GPU decoders use — see PAPERS.md, "Revisiting
Huffman Coding", arXiv:2010.10039):

1. Split the body into fixed ``chunk_bits`` chunks. Chunk 0's first codeword
   starts at bit 0; every other chunk *guesses* its entry offset (initially
   its own start bit).
2. Each chunk decodes independently from its entry offset until the next
   codeword would start at or past the chunk's end, recording its *exit* bit
   position (the first codeword boundary in the next chunk) and symbol count.
3. Sync: chunk i+1's entry := chunk i's exit. Repeat from 2 until entries
   reach a fixed point. Correctness: after pass k the first k+1 chunks have
   exactly correct entries, so at most n_chunks passes; prefix codes
   self-synchronize, so in practice almost all chunks lock on in pass 1 and
   the loop exits after ~2-3 passes.
4. Emit: one final pass writes each chunk's symbols into a fixed-capacity
   slab; an exclusive prefix sum of counts + a searchsorted gather compacts
   the slab into the output (the reference's per-symbol count stop,
   ``decode.zig:170-174``, becomes a slice).

Symbol resolution is a multi-level dense-LUT walk (format/lut.py): one gather
resolves any code of <= lookup_bits bits; longer codes descend into child
tables (rare). Everything is uint32/int32 with clamped shifts — no x64.

Per-call limit: bit positions are int32, so one decode call handles bodies
< 2^31 bits (256 MiB); larger inputs shard across devices/calls first.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from ..format.etformat import parse_header
from ..format.huffman import CodeTable
from ..format.lut import DecodeLut, build_decode_lut

U32 = jnp.uint32
DEFAULT_CHUNK_BITS = 4096


def make_chunk_pass(
    words, lut_flat, chunk_ends, n_real_bits, lookup_bits: int, levels: int, max_syms: int
):
    """Build the per-pass chunk decoder (traceable; also used per-shard inside
    shard_map by the multi-device path, with the shard's own chunk_ends).

    pass_fn(entries, emit=False) -> (exits, counts)
    pass_fn(entries, emit=True)  -> (exits, counts, counts_real, slab)
    """
    n_chunks = chunk_ends.shape[0]

    def pass_fn(entries, emit: bool):
        slab0 = jnp.zeros((n_chunks, max_syms), dtype=jnp.uint8) if emit else None

        def cond(state):
            p = state[0]
            return jnp.any(p < chunk_ends)

        def body(state):
            if emit:
                p, cnt, cnt_real, slab = state
            else:
                p, cnt = state
                cnt_real = slab = None
            active = p < chunk_ends
            sym, length = _lut_resolve(words, p, lut_flat, lookup_bits, levels)
            if emit:
                rows = jnp.arange(n_chunks, dtype=jnp.int32)
                col = jnp.where(active, cnt, max_syms)  # inactive -> dropped
                slab = slab.at[rows, col].set(sym.astype(jnp.uint8), mode="drop")
                cnt_real = cnt_real + (active & (p < n_real_bits)).astype(jnp.int32)
            p = jnp.where(active, p + length, p)
            cnt = cnt + active.astype(jnp.int32)
            return (p, cnt, cnt_real, slab) if emit else (p, cnt)

        zeros = jnp.zeros(n_chunks, dtype=jnp.int32)
        init = (entries, zeros, zeros, slab0) if emit else (entries, zeros)
        return jax.lax.while_loop(cond, body, init)

    return pass_fn


def _fetch32(words: jax.Array, p: jax.Array) -> jax.Array:
    """32 stream bits starting at bit position p (u32, big-endian bit order)."""
    w0 = words[p >> 5]
    w1 = words[(p >> 5) + 1]
    sh = (p & 31).astype(U32)
    lo = jnp.where(sh == 0, jnp.uint32(0), w1 >> ((jnp.uint32(32) - sh) & 31))
    return (w0 << sh) | lo


def _lut_resolve(words, p, lut_flat, lookup_bits: int, levels: int):
    """Resolve one symbol at bit p for every lane. Returns (sym u32, len i32).

    Unrolled static walk over LUT levels; invalid windows (corrupt stream or
    trailing pad bits) resolve to (0, 1) so the automaton always advances.
    """
    fanout = 1 << lookup_bits
    tid = jnp.zeros_like(p)
    entry = jnp.zeros_like(p)  # 0 = unresolved/invalid
    done = jnp.zeros(p.shape, dtype=bool)
    for lvl in range(levels):
        win = _fetch32(words, p + lvl * lookup_bits)
        idx = (win >> (32 - lookup_bits)).astype(jnp.int32)
        cand = lut_flat[tid * fanout + idx]
        entry = jnp.where(done, entry, jnp.maximum(cand, 0))
        newly_done = cand >= 0  # terminal (>0) or invalid (0)
        tid = jnp.where(done | newly_done, tid, -cand)
        done = done | newly_done
    sym = (entry & 0xFF).astype(U32)
    length = jnp.where(entry > 0, entry >> 8, 1).astype(jnp.int32)
    return sym, length


@partial(
    jax.jit,
    static_argnames=("chunk_bits", "lookup_bits", "levels", "max_syms", "n_out"),
)
def decode_chunked(
    words: jax.Array,  # uint32[n_words] body (+2 pad words), BE bit order
    lut_flat: jax.Array,  # int32[num_tables * 2**lookup_bits]
    n_symbols: jax.Array,  # int32 scalar: symbols to decode
    n_real_bits: jax.Array,  # int32 scalar: actual (unpadded) body bits
    chunk_bits: int,
    lookup_bits: int,
    levels: int,
    max_syms: int,  # static cap on symbols per chunk (chunk_bits // min_len + 1)
    n_out: int,  # static output capacity (>= n_symbols)
):
    """Decode the whole body.

    Returns (out uint8[n_out], total_real i32) where total_real counts only
    symbols whose codeword starts inside the real stream — a truncated body
    yields total_real < n_symbols, which callers turn into an error (the
    reference trusts the header instead; ``main.zig:199`` TODO).
    """
    n_words = words.shape[0] - 2
    n_chunks = (n_words * 32) // chunk_bits
    chunk_starts = jnp.arange(n_chunks, dtype=jnp.int32) * chunk_bits
    chunk_ends = chunk_starts + chunk_bits
    pass_fn = make_chunk_pass(
        words, lut_flat, chunk_ends, n_real_bits, lookup_bits, levels, max_syms
    )

    # --- sync passes to a fixed point of entry offsets ---
    def sync_cond(state):
        entries, prev = state
        return jnp.any(entries != prev)

    def sync_body(state):
        entries, _ = state
        exits, _ = pass_fn(entries, emit=False)
        new_entries = jnp.concatenate([jnp.zeros(1, jnp.int32), exits[:-1]])
        return new_entries, entries

    entries0 = chunk_starts
    entries, _ = jax.lax.while_loop(
        sync_cond, sync_body, (entries0, entries0 - 1)
    )

    # --- emission pass + compaction ---
    _, counts, counts_real, slab = pass_fn(entries, emit=True)
    ends = jnp.cumsum(counts)
    starts = ends - counts
    total_real = jnp.sum(counts_real)

    k = jnp.arange(n_out, dtype=jnp.int32)
    chunk_of = jnp.searchsorted(ends, k, side="right").astype(jnp.int32)
    chunk_of = jnp.minimum(chunk_of, n_chunks - 1)
    j = jnp.clip(k - starts[chunk_of], 0, max_syms - 1)
    out = slab[chunk_of, j]
    out = jnp.where(k < n_symbols, out, 0).astype(jnp.uint8)
    return out, jnp.minimum(total_real, n_symbols)


def _bucket(n: int) -> int:
    return 1 << max(0, (n - 1).bit_length())


def decode_body_device(
    body: bytes | np.ndarray,
    table: CodeTable,
    n_symbols: int,
    *,
    chunk_bits: int = DEFAULT_CHUNK_BITS,
    lut: DecodeLut | None = None,
) -> np.ndarray:
    """Decode a packed body with ``table`` -> uint8[n_symbols] (host array)."""
    if n_symbols == 0:
        return np.zeros(0, dtype=np.uint8)
    lut = lut or build_decode_lut(table)
    buf = np.frombuffer(body, dtype=np.uint8) if isinstance(body, (bytes, bytearray, memoryview)) else np.asarray(body, dtype=np.uint8)

    # Pad the stream to a whole number of chunks (bucketed), +2 slack words so
    # every _fetch32 within the last chunk (and LUT walk lookahead) is in range.
    chunk_words = chunk_bits // 32
    n_chunks = _bucket(max(1, -(-buf.size * 8 // chunk_bits)))
    n_words = n_chunks * chunk_words
    padded = np.zeros((n_words + 2) * 4, dtype=np.uint8)
    padded[: buf.size] = buf
    words = jnp.asarray(padded.view(">u4").astype(np.uint32))

    # LUT flat array bucketed so table-count changes don't recompile.
    flat = lut.flat
    cap = _bucket(flat.size)
    if cap != flat.size:
        flat = np.concatenate([flat, np.zeros(cap - flat.size, np.int32)])

    levels = -(-lut.max_len // lut.lookup_bits)
    max_syms = _bucket(chunk_bits // max(lut.min_len, 1) + 1)  # bucketed: fewer recompiles
    n_out = _bucket(n_symbols)

    out, total = decode_chunked(
        words,
        jnp.asarray(flat),
        jnp.int32(n_symbols),
        jnp.int32(buf.size * 8),
        chunk_bits,
        lut.lookup_bits,
        levels,
        max_syms,
        n_out,
    )
    total = int(total)
    if total < n_symbols:
        raise ValueError(
            f"bitstream ended early: decoded {total} of {n_symbols} symbols"
        )
    return np.asarray(out[:n_symbols])


def decompress_device(et: bytes, *, chunk_bits: int = DEFAULT_CHUNK_BITS) -> bytes:
    """Complete .et file -> original bytes, decoded block-parallel on device."""
    hdr = parse_header(et)
    out = decode_body_device(
        et[hdr.body_start :], hdr.table, hdr.body_len, chunk_bits=chunk_bits
    )
    return out.tobytes()
