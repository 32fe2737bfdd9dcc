"""TPU compute path: vectorized multi-limb field arithmetic, NTT, curve
kernels, and Pippenger MSM as JAX array programs (+ Pallas kernels).

Replaces what the reference delegates to the blst C library
(/root/reference/src/lib/zk/curve.ml:74-221) and upgrades the O(n^2)
polynomial paths (QAP.ml:81-90, :120-135) to NTT-domain algorithms.
"""
