"""Top-level bytes-in/bytes-out API.

Dispatches between the exact host codec (small inputs, where device launch
overhead dominates) and the JAX device paths (large inputs). Both produce
byte-identical .et output; the threshold is purely a latency knob.
"""

from __future__ import annotations

from .format import compress_host, decompress_host

# Inputs below this many bytes are handled entirely on host: a TPU round trip
# costs ~100s of microseconds, which dwarfs the work for tiny files.
DEVICE_MIN_BYTES = 1 << 16


def compress(data: bytes, *, strict: bool = True, backend: str | None = None) -> bytes:
    """Compress ``data`` into a complete .et file (magic, dict, packed body).

    backend: None (auto), "host", or "device".
    """
    use_device = _pick_device(backend, len(data))
    if use_device:
        from .ops.encode import compress_device

        return compress_device(data, strict=strict)
    return compress_host(data, strict=strict)


def decompress(et: bytes, *, backend: str | None = None) -> bytes:
    """Decompress a complete .et file back to the original bytes."""
    use_device = _pick_device(backend, len(et))
    if use_device:
        from .ops.decode import decompress_device

        return decompress_device(et)
    return decompress_host(et)


def _pick_device(backend: str | None, n_bytes: int) -> bool:
    if backend == "host":
        return False
    if backend == "device":
        return True
    if backend is not None:
        raise ValueError(f"unknown backend {backend!r} (want None, 'host', 'device')")
    return n_bytes >= DEVICE_MIN_BYTES
