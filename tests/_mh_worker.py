"""Worker for the real 2-process jax.distributed test (test_multihost.py).

Runs as: python tests/_mh_worker.py <coordinator> <num_procs> <pid> <datafile>
Each process brings up jax.distributed on the CPU backend (2 local virtual
devices -> a 4-device global mesh), runs the multihost codec, and checks the
result against the single-host reference bytes.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=2").strip()


def main() -> int:
    coordinator, n_procs, pid, path = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4],
    )
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

    import jax

    import entreepy_tpu.parallel.multihost as mh

    mh.init(coordinator_address=coordinator, num_processes=n_procs, process_id=pid)
    assert jax.process_count() == n_procs, jax.process_count()
    assert jax.device_count() == 2 * n_procs, jax.device_count()

    data = open(path, "rb").read()
    from entreepy_tpu.format import compress_host

    et = mh.compress(data)
    assert et == compress_host(data), "multihost .et differs from host codec"
    out = mh.decompress(et)
    assert out == data, "multihost round-trip mismatch"
    print(f"proc {pid}: ok ({len(data)} -> {len(et)} bytes)", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
