"""Compute engines: the acceleration seam between protocol logic and kernels.

Protocols (Groth16 / Pinocchio) are written against this small batched
interface.  `GoldenEngine` implements it with the pure-Python backend — the
direct analog of the reference's naive folds (curve.ml:94-118).  The JAX
engine (zukelang_tpu.engine.jax_engine) swaps in NTT-domain QAP evaluation,
Pippenger MSM, and batched fixed-base scalar multiplication on TPU.
"""

from .base import Engine, GoldenEngine, get_engine

__all__ = ["Engine", "GoldenEngine", "get_engine"]
