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
                therefore uses the native host runtime when present and
                routes to the TPU only above ``ENTREEPY_DEVICE_MIN`` bytes.
                Without that env var the threshold is CALIBRATED once per
                process: inputs >= 8 MiB time a small host->device->host
                round-trip; a PCIe-class link (>= ~100 MB/s) routes >= 8 MiB
                calls on-device, a slow link (this dev tunnel measures
                15-30 MB/s) keeps everything on host. Inputs below 8 MiB
                never pay the calibration (host wins there regardless).
                Multi-device processes choose ``sharded`` over ``device``.
"""

from __future__ import annotations

import os

from .format import compress_host, decompress_host

DEVICE_MIN_BYTES = 1 << 16
# Auto-routing floor when the native host runtime exists: even over ideal
# PCIe, calls below this size are dominated by transfer+dispatch overhead
# the 4-core host codec doesn't pay.
POD_DEVICE_MIN = 8 << 20
# A device link must beat this to ever win an auto-routed call (PCIe gen3
# does ~10 GB/s; the dev tunnel measures 15-30 MB/s).
H2D_MIN_BYTES_PER_S = 100e6

_h2d_fast_cache: list = []  # [bool], measured once per process


def _h2d_probe() -> bool:
    """Time a 1 MiB host->device transfer with a value-dependent readback
    (block_until_ready is unreliable on tunneled backends). True only on an
    accelerator backend whose link beats H2D_MIN_BYTES_PER_S."""
    import time

    import jax
    import jax.numpy as jnp
    import numpy as np

    if jax.default_backend() not in ("tpu", "axon"):
        return False
    arr = np.ones(1 << 18, np.float32)  # 1 MiB
    int(jnp.sum(jax.device_put(arr)))  # warm dispatch path
    t0 = time.perf_counter()
    int(jnp.sum(jax.device_put(arr + 1)))
    dt = time.perf_counter() - t0
    return arr.nbytes / max(dt, 1e-9) >= H2D_MIN_BYTES_PER_S


def _h2d_fast(deadline_s: float = 60.0) -> bool:
    """One-shot host->device bandwidth calibration (persisted per process),
    run in a daemon thread with a deadline: a dead/unreachable device link
    can BLOCK backend init indefinitely (this environment's tunnel does),
    and the first >= POD_DEVICE_MIN call must degrade to host routing, not
    hang. A healthy init + trivial compile finishes well inside 60 s even
    through the tunnel; timing out merely forgoes device routing for this
    process (host handles everything)."""
    if not _h2d_fast_cache:
        import threading

        result = [False]

        def probe():
            try:
                result[0] = _h2d_probe()
            except Exception:
                pass

        t = threading.Thread(target=probe, daemon=True)
        t.start()
        t.join(timeout=deadline_s)
        _h2d_fast_cache.append(result[0])
    return _h2d_fast_cache[0]


def _device_min(n_bytes: int = 0) -> int:
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

    if not runtime.available():
        return DEVICE_MIN_BYTES
    if n_bytes < POD_DEVICE_MIN:
        # Host wins below the best-case device threshold — don't pay the
        # calibration (or a jax import) for small calls.
        return 1 << 62
    return POD_DEVICE_MIN if _h2d_fast() else 1 << 62


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
    if n_bytes < _device_min(n_bytes):
        return "host"
    import jax

    return "sharded" if jax.device_count() > 1 else "device"
