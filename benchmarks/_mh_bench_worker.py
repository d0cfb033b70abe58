"""Worker for benchmarks/multihost_bench.py: one process of an N-process
gloo-coordinated CPU 'pod'. Times the multihost codec on its shard of the
work and prints one JSON line (process 0 only)."""

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))


def main() -> int:
    coordinator, n_procs, pid, mb_per_dev = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), float(sys.argv[4]),
    )
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 2)
    jax.config.update("jax_cpu_collectives_implementation", "gloo")

    import entreepy_tpu.parallel.multihost as mh
    from entreepy_tpu.format import compress_host

    if n_procs > 1:
        mh.init(coordinator_address=coordinator, num_processes=n_procs, process_id=pid)
    n_dev = jax.device_count()
    assert n_dev == 2 * n_procs, n_dev

    src = (Path(__file__).parent.parent / "tests/data/a_midsummer_nights_dream.txt").read_bytes()
    n_bytes = int(mb_per_dev * 1e6) * n_dev  # weak scaling: fixed work per device
    data = (src * (-(-n_bytes // len(src))))[:n_bytes]
    et = compress_host(data)

    # warmup (compiles) then best-of
    assert mh.decompress(et) == data
    best_d = best_e = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        mh.decompress(et)
        best_d = min(best_d, time.perf_counter() - t0)
    for _ in range(3):
        t0 = time.perf_counter()
        out = mh.compress(data)
        best_e = min(best_e, time.perf_counter() - t0)
    assert out == et
    if pid == 0:
        print(json.dumps({
            "processes": n_procs, "devices": n_dev,
            "corpus_MB": round(n_bytes / 1e6, 1),
            "encode_s": round(best_e, 3), "decode_s": round(best_d, 3),
        }), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
