"""Multi-device (and multi-host) block parallelism.

The reference is single-threaded on its compute path (SURVEY.md §2:
"Parallelism strategies — none"; its README lists "block based parallel
decoding" as future work). Here parallelism is first-class: inputs split into
independent blocks data-parallel over a device mesh, the shared dictionary is
replicated, per-block bitstreams and lengths are gathered, and streams are
stitched in order.
"""

from .mesh import make_mesh
from .dist import compress_sharded, decompress_sharded
from . import multihost

__all__ = ["make_mesh", "compress_sharded", "decompress_sharded", "multihost"]
