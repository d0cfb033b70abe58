"""Multi-host (pod / DCN) execution.

The reference has no distributed backend at all (SURVEY.md §2: no NCCL/MPI/
sockets; single process). Here multi-host runs the *same* shard_map programs
as single-host (dist.py) over a mesh whose 1-D block axis spans every
process's devices: collectives ride ICI within a slice and DCN across hosts,
chosen by XLA from device placement.

Communication per file (measured contract, tested in test_multihost.py):

* encode — one ``psum`` of the 256-bin histogram (1 KB); compaction runs
  shard-local ON DEVICE, so the only gathered encode data is each shard's
  ~compressed-size flat payload + per-block word counts/bit lengths
  (dist.compress_sharded; never the dense 4 B-per-input-byte slots)
* decode — one ``all_gather`` of per-chunk exit states (1 B/chunk) per sync
  pass; each process then fetches ONLY its own shards' state sequences
  (1/N of the compressed bytes over D2H) and emits only its own chunks'
  symbols; the full output assembles from one gather of tiny per-chunk
  metadata + the per-process symbol shards (dist._expand_multihost)

Usage (one process per host, standard JAX bring-up)::

    import entreepy_tpu.parallel.multihost as mh
    mh.init()                       # jax.distributed.initialize()
    et = mh.compress(data)          # every process passes the same bytes
    out = mh.decompress(et)         # result valid on every process

This module is exercised in CI via the virtual-device CPU mesh (a 1-process
"pod"); real DCN runs need a pod slice, which this environment does not
provide — the driver's ``dryrun_multichip`` validates the sharded program
compiles and runs on N virtual devices.
"""

from __future__ import annotations

import jax

from .dist import compress_sharded, decompress_sharded
from .mesh import BLOCK_AXIS, make_mesh

_initialized = False


def init(**kwargs) -> None:
    """Initialize JAX distributed (idempotent). kwargs pass through to
    ``jax.distributed.initialize`` (coordinator_address, num_processes,
    process_id) — all auto-detected on TPU pods.

    Failure semantics: an explicit bring-up (any kwargs) propagates every
    error. With no kwargs, only the specific "no cluster environment found"
    auto-detect ValueError is treated as a normal single-process run;
    anything else (bad coordinator, handshake timeout, double init) raises.
    """
    global _initialized
    if _initialized:
        return
    # NB: no jax.process_count()/jax.devices() before initialize — those
    # calls initialize the XLA backend and make distributed bring-up
    # impossible. Prefer the public is_initialized() (jax >= 0.4.34); fall
    # back to probing the private global_state (verified on jax 0.5-0.7),
    # and treat any probe failure as "not initialized" so a jax refactor
    # degrades to attempting initialize() rather than crashing here.
    try:
        is_init = getattr(jax.distributed, "is_initialized", None)
        if is_init is not None:
            already = bool(is_init())
        else:
            state = getattr(getattr(jax._src, "distributed", None), "global_state", None)
            already = state is not None and getattr(state, "client", None) is not None
    except Exception:
        already = False
    if already:
        _initialized = True  # someone already brought distributed up
        return
    # The string matches below pin failure semantics to jax's error wording
    # (verified against jax 0.7.x in this image); a rewording would make the
    # corresponding error propagate (fail loud) rather than be swallowed.
    try:
        jax.distributed.initialize(**kwargs)
    except ValueError as e:
        if kwargs or "coordinator_address" not in str(e):
            raise
        # auto-detect found no cluster environment: single-process run
    except RuntimeError as e:
        # tolerate ONLY "the XLA backend is already up in this process" (a
        # single-process session that touched jax before init); a pod-side
        # failure like a coordinator handshake timeout must propagate
        msg = str(e)
        if kwargs or not (
            "must be called before" in msg or "called once" in msg
        ):
            raise
    _initialized = True


def global_mesh(axis: str = BLOCK_AXIS):
    """1-D mesh over every device of every process."""
    return make_mesh(axis=axis)


def compress(data: bytes, **kwargs) -> bytes:
    """Compress over the global mesh. Every process must pass identical
    ``data`` and receives the identical .et result (the stitch is
    deterministic and runs on each host from the gathered shards)."""
    return compress_sharded(data, global_mesh(), **kwargs)


def decompress(et: bytes, **kwargs) -> bytes:
    """Decompress over the global mesh; same SPMD contract as compress."""
    return decompress_sharded(et, global_mesh(), **kwargs)
