"""Host utilities: bit-granular stream stitching, size formatting, progress."""
