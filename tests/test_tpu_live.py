"""Live-TPU kernel regression gate (opt-in: ENTREEPY_TPU_TESTS=1).

The main suite pins JAX to a virtual CPU mesh and exercises the Pallas
kernels in interpreter mode only, so a Mosaic lowering regression would
ship green (VERDICT r1 weakness). With ENTREEPY_TPU_TESTS=1 this test
compiles + runs the byte-FSM kernel on the real chip via a subprocess with
a hard timeout (a wedged Mosaic compile must not hang the suite — the
subprocess is killed, the test fails with its partial output).
"""

import os
import subprocess
import sys
from pathlib import Path

import pytest

ROOT = Path(__file__).parent.parent

pytestmark = pytest.mark.skipif(
    not os.environ.get("ENTREEPY_TPU_TESTS"),
    reason="live-TPU test: set ENTREEPY_TPU_TESTS=1 (needs an attached chip; "
    "run attended — see CLAUDE.md on wedged Mosaic compiles)",
)


def test_fsm8_kernel_on_chip():
    env = {k: v for k, v in os.environ.items() if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    r = subprocess.run(
        [sys.executable, "-u", str(ROOT / "benchmarks/probe_fsm8.py"), "--mb", "0.3",
         "--iters", "2"],
        capture_output=True, text=True, timeout=540, env=env,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert '"bit_equal": true' in r.stdout, r.stdout


def test_device_bench_small_on_chip():
    """Compiles + runs BOTH Pallas kernels, the fused expand kernel, and the
    end-to-end device decode (with its exact output checksum) on a small
    corpus on the real chip."""
    env = {k: v for k, v in os.environ.items() if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    r = subprocess.run(
        [sys.executable, "-u", str(ROOT / "benchmarks/device.py"), "--mb", "0.5"],
        capture_output=True, text=True, timeout=540, env=env,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert '"bit_equal": true' in r.stdout, r.stdout
    assert '"decode_e2e_ms"' in r.stdout, r.stdout
