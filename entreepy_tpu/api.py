"""Top-level bytes-in/bytes-out API.

Four interchangeable backends produce byte-identical .et output:

* ``host``    — C++ native runtime (threaded block-parallel pack,
                self-sync chunk-parallel decode), numpy fallback.
* ``device``  — TPU kernels (ops/): MXU one-hot-matmul byte-FSM decode and
                bit-pack, single device.
* ``sharded`` — multi-chip shard_map codec (entreepy_tpu.parallel): blocks/
                chunks data-parallel over a 1-D device mesh, collectives
                over ICI/DCN.
* ``None``    — auto. Host↔device transfer cost decides: the device kernels
                decode a 5.2 MB corpus in a few ms of TPU time, but a single
                compress/decompress call must move the input and output over
                PCIe (or, in this dev environment, a slow tunnel). Auto
                therefore uses the native host runtime when present and only
                routes to the TPU above ``ENTREEPY_DEVICE_MIN`` bytes
                (default: never when the native runtime exists, 64 KiB
                otherwise) — choosing ``sharded`` when more than one device
                is visible. Production pods with local PCIe set e.g.
                ``ENTREEPY_DEVICE_MIN=8000000``.
"""

from __future__ import annotations

import os

from .format import compress_host, decompress_host

DEVICE_MIN_BYTES = 1 << 16


def _device_min() -> int:
    env = os.environ.get("ENTREEPY_DEVICE_MIN")
    if env is not None:
        try:
            return int(env)
        except ValueError:
            import warnings

            warnings.warn(
                f"ignoring non-integer ENTREEPY_DEVICE_MIN={env!r} (want bytes)",
                stacklevel=2,
            )
    from . import runtime

    if runtime.available():
        return 1 << 62  # native host runtime beats transfer-bound device calls
    return DEVICE_MIN_BYTES


def compress(data: bytes, *, strict: bool = True, backend: str | None = None,
             progress=None) -> bytes:
    """Compress ``data`` into a complete .et file (magic, dict, packed body).

    backend: None (auto), "host", "device", or "sharded".
    progress: optional ``(pct, msg)`` callback ticked at measured phase
    completions (host backend; other backends tick coarse boundaries).
    """
    choice = _pick_backend(backend, len(data))
    tick = progress or (lambda pct, msg: None)
    if choice == "sharded":
        from .parallel import compress_sharded

        tick(20, "Counting characters...")
        out = compress_sharded(data, strict=strict)
        tick(90, "Writing compressed text...")
        return out
    if choice == "device":
        from .ops.encode import compress_device

        tick(20, "Counting characters...")
        out = compress_device(data, strict=strict)
        tick(90, "Writing compressed text...")
        return out
    return compress_host(data, strict=strict, progress=progress)


def decompress(et: bytes, *, backend: str | None = None, progress=None) -> bytes:
    """Decompress a complete .et file back to the original bytes."""
    choice = _pick_backend(backend, len(et))
    tick = progress or (lambda pct, msg: None)
    if choice == "sharded":
        from .parallel import decompress_sharded

        tick(20, "Decoding text...")
        out = decompress_sharded(et)
        tick(90, "Writing decoded text...")
        return out
    if choice == "device":
        from .ops.decode8 import decompress_device

        tick(20, "Decoding text...")
        out = decompress_device(et)
        tick(90, "Writing decoded text...")
        return out
    return decompress_host(et, progress=progress)


def compress_file(src, dst=None, **kwargs) -> str:
    """Compress file ``src`` to ``dst`` (default: ``src + '.et'``, the
    reference CLI's naming). Returns the output path."""
    from pathlib import Path

    from .cli import default_output_name  # lazy: cli imports api

    src = Path(src)
    dst = Path(dst) if dst is not None else Path(default_output_name("compress", str(src)))
    dst.write_bytes(compress(src.read_bytes(), **kwargs))
    return str(dst)


def decompress_file(src, dst=None, **kwargs) -> str:
    """Decompress .et file ``src`` to ``dst`` (default: ``decoded_<name>``
    minus the .et suffix, the reference CLI's naming). Returns the path."""
    from pathlib import Path

    from .cli import default_output_name  # lazy: cli imports api

    src = Path(src)
    dst = Path(dst) if dst is not None else Path(default_output_name("decompress", str(src)))
    dst.write_bytes(decompress(src.read_bytes(), **kwargs))
    return str(dst)


def inspect(et: bytes) -> dict:
    """Parsed .et header as a dict: validates magic/version and returns
    sizes plus the symbol dictionary (symbol -> (length, code bits))."""
    from .format import parse_header

    hdr = parse_header(et)
    table = hdr.table
    dictionary = {
        int(s): (int(table.lengths[s]), format(int(table.codes[s]), f"0{int(table.lengths[s])}b"))
        for s in range(256)
        if table.lengths[s] > 0
    }
    return {
        "version": hdr.version,
        "num_symbols": table.num_symbols,
        "original_bytes": hdr.body_len,
        "compressed_bytes": len(et),
        "body_offset": hdr.body_start,
        "max_code_len": table.max_len,
        "min_code_len": table.min_len,
        "dictionary": dictionary,
    }


def _pick_backend(backend: str | None, n_bytes: int) -> str:
    if backend in ("host", "device", "sharded"):
        return backend
    if backend is not None:
        raise ValueError(
            f"unknown backend {backend!r} (want None, 'host', 'device', 'sharded')"
        )
    if n_bytes < _device_min():
        return "host"
    import jax

    return "sharded" if jax.device_count() > 1 else "device"
