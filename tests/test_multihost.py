"""Real multi-process jax.distributed bring-up (VERDICT r1 item 4).

Spawns 2 OS processes that initialize jax.distributed against a localhost
coordinator on the CPU backend (2 virtual devices each -> 4-device global
mesh), run the multihost codec, and assert byte-equality with the host
codec. This exercises the actual gRPC coordination path that the in-process
mesh tests cannot.
"""

import os
import socket
import subprocess
import sys
from pathlib import Path

import pytest

ROOT = Path(__file__).parent.parent


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_distributed(macbeth, tmp_path):
    data_file = tmp_path / "corpus.txt"
    data_file.write_bytes(macbeth * 8)
    coordinator = f"localhost:{_free_port()}"
    env = {k: v for k, v in os.environ.items() if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    env["JAX_COMPILATION_CACHE_DIR"] = str(ROOT / ".jax_cache")

    procs = [
        subprocess.Popen(
            [sys.executable, str(ROOT / "tests/_mh_worker.py"),
             coordinator, "2", str(pid), str(data_file)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env,
        )
        for pid in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, err = p.communicate(timeout=240)
            outs.append((p.returncode, out, err))
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for rc, out, err in outs:
        assert rc == 0, f"worker failed (rc={rc}):\n{err.decode()[-2000:]}"
    assert all(b"ok" in out for _, out, _ in outs)


def test_init_propagates_explicit_errors():
    """Explicit bring-up failures must not be silently swallowed
    (multihost.init no longer has the blanket except)."""
    import entreepy_tpu.parallel.multihost as mh

    if mh._initialized:
        pytest.skip("distributed already initialized in this process")
    # In a fresh process this is a TypeError/ValueError from argument
    # validation; if another test already initialized the XLA backend it is
    # jax's RuntimeError — either way it must propagate, not be swallowed.
    with pytest.raises((ValueError, TypeError, RuntimeError)):
        mh.init(coordinator_address="localhost:1", num_processes=-3, process_id=0)
