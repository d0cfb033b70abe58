"""Device compute kernels: histogram, bit-pack (encode), self-sync bit-unpack
(decode). JAX/XLA implementations with Pallas variants for the hot paths."""
