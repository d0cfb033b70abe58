"""Ring-queue unit tests — mirror the reference's six (``queue.zig:45-112``)
plus a randomized FIFO-equivalence property check."""

import random
from collections import deque

import pytest

from entreepy_tpu.utils.ringbuf import QueueEmpty, QueueFull, RingQueue


def test_enqueue_and_peek():
    q = RingQueue(3)
    q.enqueue(42)
    assert q.peek() == 42
    q.enqueue(24)
    assert q.peek() == 42  # peek does not consume


def test_single_element():
    q = RingQueue(3)
    q.enqueue(1)
    assert q.dequeue() == 1
    with pytest.raises(QueueEmpty):
        q.dequeue()


def test_full_after_enqueues():
    q = RingQueue(3)
    for v in (1, 2, 3):
        q.enqueue(v)
    with pytest.raises(QueueFull):
        q.enqueue(4)


def test_empty_after_dequeues():
    q = RingQueue(3)
    for v in (1, 2, 3):
        q.enqueue(v)
    for _ in range(3):
        q.dequeue()
    with pytest.raises(QueueEmpty):
        q.dequeue()


def test_wrap_around_full_cycle():
    q = RingQueue(3)
    for v in (1, 2, 3):
        q.enqueue(v)
    assert q.dequeue() == 1
    assert q.dequeue() == 2
    q.enqueue(4)
    q.enqueue(5)
    assert [q.dequeue() for _ in range(3)] == [3, 4, 5]
    with pytest.raises(QueueEmpty):
        q.dequeue()


def test_peek_after_wrap_around():
    q = RingQueue(3)
    for v in (1, 2, 3):
        q.enqueue(v)
    assert q.dequeue() == 1
    q.enqueue(4)
    assert q.peek() == 2


def test_empty_peek_len_bool():
    q = RingQueue(2)
    assert q.peek() is None
    assert len(q) == 0
    assert not q
    q.enqueue("x")
    assert q and len(q) == 1
    assert q.capacity == 2


def test_invalid_capacity():
    with pytest.raises(ValueError):
        RingQueue(0)
    with pytest.raises(ValueError):
        RingQueue(-1)


def test_fifo_equivalence_randomized():
    rng = random.Random(0xE7C0DE)
    q = RingQueue(17)
    model = deque()
    for _ in range(5000):
        if rng.random() < 0.55 and len(model) < 17:
            v = rng.randrange(1 << 30)
            q.enqueue(v)
            model.append(v)
        elif model:
            assert q.peek() == model[0]
            assert q.dequeue() == model.popleft()
        else:
            assert q.peek() is None
            with pytest.raises(QueueEmpty):
                q.dequeue()
        assert len(q) == len(model)
