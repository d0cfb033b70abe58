"""Drives every threaded/native hot path for tools/sanitize.sh.

Expects ENTREEPY_NATIVE_LIB to point at a TSAN- or ASAN-instrumented build of
runtime/native.cpp (the sanitizer runtime is LD_PRELOADed by the script).
Covers: threaded histogram, parallel pack (shared-boundary atomics), LUT
gap-array decode, byte-FSM chunk decode (incl. run-heavy scratch-overflow
re-walks), FSM expansion, payload assembly/stitch, and the corrupt/truncated
error paths.
"""

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np

from entreepy_tpu import runtime
from entreepy_tpu.format import (
    build_code_table,
    build_decode_lut,
    compress_host,
    decompress_host,
    histogram,
    pack_body_host,
    parse_header,
)
from entreepy_tpu.format.fsm8 import build_byte_fsm

assert runtime.available(), "native runtime failed to load (check ENTREEPY_NATIVE_LIB)"

rng = np.random.default_rng(7)
corpora = {
    "text": (Path(__file__).parent.parent / "tests/data/a_midsummer_nights_dream.txt"
             ).read_bytes() * 20,
    "random": rng.integers(0, 256, 2_000_000, dtype=np.uint8).tobytes(),
    "runheavy": b"a" * 1_500_000 + bytes(range(256)) * 10 + b"a" * 200_000,
}

for name, data in corpora.items():
    arr = np.frombuffer(data, np.uint8)
    et = compress_host(data)  # threaded histogram + parallel pack
    assert decompress_host(et) == data, name  # byte-FSM parallel decode
    hdr = parse_header(et)
    body = et[hdr.body_start:]
    # LUT gap-array decode path explicitly
    lut = build_decode_lut(hdr.table)
    out = runtime.unpack_body(body, lut.flat, lut.lookup_bits, arr.size)
    assert out is not None and out.tobytes() == data, name
    # byte-FSM path explicitly (threaded, incl. overflow re-walks on runheavy)
    fsm = build_byte_fsm(hdr.table)
    res = runtime.fsm8_decode_parallel(body, fsm.next_state, fsm.counts, fsm.syms, arr.size)
    assert res is not None and res[0].tobytes() == data, name
    # error paths: truncated + corrupt
    try:
        runtime.fsm8_decode_parallel(body[:50], fsm.next_state, fsm.counts, fsm.syms, arr.size)
        raise SystemExit(f"{name}: truncated stream not detected")
    except ValueError:
        pass
    try:
        runtime.unpack_body(body[:50], lut.flat, lut.lookup_bits, arr.size)
        raise SystemExit(f"{name}: truncated stream not detected (lut)")
    except ValueError:
        pass
    print(f"sanitize driver: {name} ok ({len(data)} B)", flush=True)

print("sanitize driver: all paths exercised", flush=True)

# --- round-3 native entry points -------------------------------------------

# et_map_bytes: aligned-8 byte map, incl. the hole-detection error path
lut16 = np.arange(256, dtype=np.int16)[::-1].copy()
blob = rng.integers(0, 256, 1_000_000, dtype=np.uint8)
mapped = runtime.map_bytes(blob, lut16)
assert mapped is not None and np.array_equal(mapped, 255 - blob)
lut_hole = lut16.copy()
lut_hole[blob[12345]] = -1
try:
    runtime.map_bytes(blob, lut_hole)
    raise SystemExit("map_bytes: hole not detected")
except ValueError:
    pass

# et_fsm8_expand_chunks: threaded local expansion with per-chunk metadata
data = corpora["text"][:400_000]
arr = np.frombuffer(data, np.uint8)
et = compress_host(data)
hdr = parse_header(et)
body = np.frombuffer(et, np.uint8)[hdr.body_start:]
fsm = build_byte_fsm(hdr.table)
states = np.empty(body.size, np.uint8)
s = 0
nxt, cnts = fsm.next_state, fsm.counts
for i, b in enumerate(body.tolist()):  # serial anchor walk
    states[i] = s
    s = int(nxt[s, b])
m = max(1, int(fsm.counts.max()))
res = runtime.fsm8_expand_chunks(states, body, fsm.counts, fsm.syms, 4096, m)
assert res is not None
rows, pc, w_inv = res
out = np.concatenate([rows[c, : pc[c]] for c in range(pc.size)])
assert out[: arr.size].tobytes() == data
assert (w_inv == -1).all()

# et_stitch_flat vs the numpy stitch
from entreepy_tpu.utils.stitch import stitch_words

lanes, capw = 23, 7
flat = rng.integers(0, 2**32, size=lanes * capw, dtype=np.uint64).astype(np.uint32)
bit_lens = rng.integers(0, capw * 32 - 31, size=lanes).astype(np.int64)
offs = (np.arange(lanes) * capw).astype(np.int64)
views = []
for l in range(lanes):
    nw = (int(bit_lens[l]) + 31) // 32
    flat[offs[l] + nw : offs[l] + capw] = 0
    rem = int(bit_lens[l]) & 31
    if rem and nw:
        flat[offs[l] + nw - 1] &= np.uint32(0xFFFFFFFF) << (32 - rem)
    views.append(flat[offs[l] : offs[l] + capw])
ref_words, ref_total = stitch_words(views, bit_lens)
nat = runtime.stitch_flat(flat, offs, bit_lens)
assert nat is not None
nat_words, nat_total = nat
assert nat_total == ref_total
nw_t = ref_total // 32 + 1
assert np.array_equal(nat_words[:nw_t], ref_words[:nw_t])

# et_pack_parallel_sized budget guard: under-claimed bits must error, not
# write out of bounds (ASAN target)
counts_blocks = runtime.histogram_blocks(arr)
table = build_code_table(counts_blocks.sum(axis=0))
block_bits = counts_blocks @ table.lengths.astype(np.int64)
bad_bits = block_bits.copy()
bad_bits[0] -= 640
try:
    runtime.pack_body_sized(arr, table.codes, table.lengths, bad_bits)
    raise SystemExit("pack_body_sized: under-claim not detected")
except RuntimeError:
    pass

print("sanitize driver: round-3 entry points ok", flush=True)
