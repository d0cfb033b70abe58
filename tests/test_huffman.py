"""Code-construction known-answer tests.

The expected codes below are hand-derived from the reference's algorithm
(sort: encode.zig:54-74; two-queue merge with leaf-wins ties:
encode.zig:102-135; left=0 right=1 paths: encode.zig:181-197) — they pin the
tie-breaking rules that bit-exact .et output depends on.
"""

import numpy as np
import pytest

from entreepy_tpu.format import (
    CodeOverflowError,
    DegenerateInputError,
    build_code_table,
    histogram,
    sorted_symbols,
)


def codes_of(data: bytes):
    t = build_code_table(histogram(data))
    return {chr(s): (int(t.codes[s]), int(t.lengths[s])) for s in range(256) if t.lengths[s]}


def test_sorted_symbols_count_then_byte():
    counts = np.zeros(256, dtype=np.int64)
    counts[ord("z")] = 2
    counts[ord("a")] = 2
    counts[ord("m")] = 1
    counts[ord("q")] = 5
    assert sorted_symbols(counts).tolist() == [ord("m"), ord("a"), ord("z"), ord("q")]


def test_known_codes_aabbbc():
    # sorted: c(1), a(2), b(3). merge c+a -> P1(3); tie b(3) vs P1(3) -> leaf
    # b wins and becomes the LEFT child. b=0, c=10, a=11.
    assert codes_of(b"aabbbc") == {"a": (0b11, 2), "b": (0, 1), "c": (0b10, 2)}


def test_known_codes_abcd_uniform():
    # all count 1: a+b -> P1, c+d -> P2 (leaves win over P1), then P1+P2.
    assert codes_of(b"abcd") == {"a": (0b00, 2), "b": (0b01, 2), "c": (0b10, 2), "d": (0b11, 2)}


def test_known_codes_aaabbc():
    # sorted c(1), b(2), a(3): c+b -> P1(3); tie a vs P1 -> a left. a=0.
    assert codes_of(b"aaabbc") == {"a": (0, 1), "b": (0b11, 2), "c": (0b10, 2)}


def test_prefix_free_and_kraft_on_corpus(midsummer):
    t = build_code_table(histogram(midsummer))
    present = [s for s in range(256) if t.lengths[s]]
    # Kraft equality (Huffman trees are full binary trees)
    assert sum(2.0 ** -int(t.lengths[s]) for s in present) == pytest.approx(1.0)
    # pairwise prefix-freeness (the reference's debug audit, encode.zig:221-247)
    items = [(int(t.codes[s]), int(t.lengths[s])) for s in present]
    for c1, l1 in items:
        for c2, l2 in items:
            if (c1, l1) == (c2, l2):
                continue
            short = min(l1, l2)
            assert (c1 >> (l1 - short)) != (c2 >> (l2 - short))


def test_optimality_total_bits(midsummer):
    """Two-queue construction must yield optimal total code length."""
    import heapq

    counts = histogram(midsummer)
    t = build_code_table(counts)
    ours = t.encoded_body_bits(counts)
    heap = [(int(c), i) for i, c in enumerate(counts) if c > 0]
    heapq.heapify(heap)
    total = 0
    while len(heap) > 1:
        a = heapq.heappop(heap)
        b = heapq.heappop(heap)
        total += a[0] + b[0]
        heapq.heappush(heap, (a[0] + b[0], 256 + a[1]))
    assert ours == total


def test_degenerate_inputs():
    with pytest.raises(DegenerateInputError):
        build_code_table(histogram(b""))
    with pytest.raises(DegenerateInputError):
        build_code_table(histogram(b"aaaa"))
    t = build_code_table(histogram(b"aaaa"), strict=False)
    assert int(t.lengths[ord("a")]) == 1


def test_all_256_symbols_supported():
    # The reference silently drops a symbol here (encode.zig:69-71 saturation);
    # we must handle the full byte alphabet.
    data = bytes(range(256)) * 3
    t = build_code_table(histogram(data))
    assert t.num_symbols == 256
    assert all(int(t.lengths[s]) == 8 for s in range(256))


def test_code_overflow_raises():
    # Fibonacci-weighted histogram forces depth > 32 at ~46 symbols.
    counts = np.zeros(256, dtype=np.int64)
    a, b = 1, 1
    for i in range(40):
        counts[i] = a
        a, b = b, a + b
    with pytest.raises(CodeOverflowError):
        build_code_table(counts)
