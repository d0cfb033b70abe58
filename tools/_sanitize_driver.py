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
