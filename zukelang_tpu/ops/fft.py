"""Fast polynomial multiplication — the reference's standalone FFT engine.

Mirrors `FFT.Make` (src/lib/zk/FFT.ml:29-105): a generic radix-2 transform
instantiated for the complex numbers (sanity/benchmark instance, FFT.ml:111)
and for BLS12-381 Fr (FFT.ml:222-233), with `polynomial_mul` as pointwise
multiplication in the evaluation domain.  Unlike the reference — where the
Fr instance is never wired into the QAP — the Fr path here *is* the QAP
engine (ops/ntt.py feeds engine.jax_engine); this module provides the
standalone polynomial API on top.
"""

from __future__ import annotations

from typing import List, Sequence

import jax.numpy as jnp
import numpy as np

from .. import params
from ..golden.field import Fr
from . import field_jax as F
from . import ntt as ntt_mod


def _next_pow2(n: int) -> int:
    return 1 << max(0, (n - 1).bit_length())


# -- complex instance (FFT.ml:111-129) --------------------------------------

def fft_c(coeffs: Sequence[complex], min_len: int = None) -> np.ndarray:
    n = _next_pow2(max(len(coeffs), min_len or 1))
    a = np.zeros(n, dtype=np.complex128)
    a[: len(coeffs)] = coeffs
    return np.asarray(jnp.fft.fft(jnp.asarray(a)))


def ifft_c(values: Sequence[complex]) -> np.ndarray:
    return np.asarray(jnp.fft.ifft(jnp.asarray(np.asarray(values))))


def polynomial_mul_c(p1: Sequence[complex], p2: Sequence[complex]) -> np.ndarray:
    """FFT.ml:98-105 over the complex field."""
    out_len = len(p1) + len(p2) - 1
    n = _next_pow2(out_len)
    a = fft_c(p1, n)
    b = fft_c(p2, n)
    return ifft_c(a * b)[:out_len]


# -- Fr instance (FFT.ml:222-233) -------------------------------------------

def fft_fr(coeffs: List[Fr], min_len: int = None) -> List[Fr]:
    """Evaluate a coefficient list on the radix-2 root-of-unity domain."""
    n = _next_pow2(max(len(coeffs), min_len or 1, 2))
    vals = [c.n for c in coeffs] + [0] * (n - len(coeffs))
    x = F.pack_mont(vals, F.FR)
    return [Fr(v) for v in F.unpack_mont(ntt_mod.ntt(x), F.FR)]


def ifft_fr(values: List[Fr]) -> List[Fr]:
    n = len(values)
    assert n & (n - 1) == 0
    x = F.pack_mont([v.n for v in values], F.FR)
    return [Fr(v) for v in F.unpack_mont(ntt_mod.intt(x), F.FR)]


def polynomial_mul_fr(p1: List[Fr], p2: List[Fr]) -> List[Fr]:
    """NTT-based polynomial multiplication over Fr — the fast path the
    reference benchmarks but never uses (SURVEY.md U5)."""
    if not p1 or not p2:
        return []
    out_len = len(p1) + len(p2) - 1
    n = _next_pow2(out_len)
    a = F.pack_mont([c.n for c in p1] + [0] * (n - len(p1)), F.FR)
    b = F.pack_mont([c.n for c in p2] + [0] * (n - len(p2)), F.FR)
    ea = ntt_mod.ntt(a)
    eb = ntt_mod.ntt(b)
    prod = F.mont_mul(ea, eb, F.FR)
    out = F.unpack_mont(ntt_mod.intt(prod), F.FR)
    return [Fr(v) for v in out[:out_len]]
