"""Radix-2 NTT over Fr on the 2^32-torsion domain — the TPU fast path for
all QAP polynomial algebra.

The reference ships a recursive OCaml FFT over Fr (src/lib/zk/FFT.ml:29-67,
root of unity derivation :179-220) but never wires it into QAP; its QAP
interpolation/division are O(n^2) (QAP.ml:81-90, :120-135).  Here the NTT
*is* the QAP engine: interpolation = iNTT, h-computation = coset division
(see engine.jax_engine).

Implementation: iterative in-place Cooley-Tukey over a `(n_limbs, N)`
Montgomery limb batch.  Stages run under `lax.fori_loop` with gather-based
butterflies so the traced body contains a single Montgomery multiply;
shapes stay static for XLA.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import params
from . import field_jax as F


@functools.lru_cache(maxsize=None)
def root_for(logn: int, inverse: bool = False) -> int:
    """Primitive 2^logn-th root of unity in Fr (FFT.ml:229-232)."""
    assert 0 <= logn <= params.FR_TWO_ADICITY
    w = pow(params.FR_ROOT_OF_UNITY, 1 << (params.FR_TWO_ADICITY - logn), params.R)
    if inverse:
        w = pow(w, -1, params.R)
    return w


@functools.lru_cache(maxsize=None)
def _twiddles_host(logn: int, inverse: bool) -> np.ndarray:
    """(nl, N/2) Montgomery-form twiddles w^0..w^(N/2-1)."""
    n = 1 << logn
    w = root_for(logn, inverse)
    r = params.R
    vals = []
    acc = 1
    for _ in range(max(1, n // 2)):
        vals.append(acc * F.FR.R % r)  # to Montgomery form
        acc = acc * w % r
    nb = F.FR.nl * 2
    buf = b"".join(v.to_bytes(nb, "little") for v in vals)
    arr = np.frombuffer(buf, dtype="<u2").reshape(len(vals), F.FR.nl)
    return arr.T.astype(np.uint32)


@functools.lru_cache(maxsize=None)
def _bitrev_host(logn: int) -> np.ndarray:
    n = 1 << logn
    idx = np.arange(n)
    rev = np.zeros(n, dtype=np.int32)
    for b in range(logn):
        rev |= ((idx >> b) & 1) << (logn - 1 - b)
    return rev


def _mm(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """mont_mul over arrays with arbitrary trailing batch dims."""
    shape = a.shape
    r = F.mont_mul(a.reshape(shape[0], -1), b.reshape(shape[0], -1), F.FR)
    return r.reshape(shape)


def _madd(a, b):
    shape = a.shape
    return F.add(a.reshape(shape[0], -1), b.reshape(shape[0], -1),
                 F.FR).reshape(shape)


def _msub(a, b):
    shape = a.shape
    return F.sub(a.reshape(shape[0], -1), b.reshape(shape[0], -1),
                 F.FR).reshape(shape)


def ntt(x: jnp.ndarray, inverse: bool = False) -> jnp.ndarray:
    """In-place radix-2 NTT along axis 1 of a Montgomery-form Fr array.

    x: (nl, N) or (nl, N, B) — the transform runs over axis 1; trailing
    dims are independent batches (used by the distributed four-step NTT).
    Forward maps coefficients -> evaluations at w^0..w^(N-1); inverse maps
    back (including the 1/N scaling, FFT.ml:64-66).
    """
    nl, n = x.shape[0], x.shape[1]
    assert nl == F.FR.nl and n & (n - 1) == 0
    logn = n.bit_length() - 1
    if n == 1:
        return x

    rev = jnp.asarray(_bitrev_host(logn))
    tw = jnp.asarray(_twiddles_host(logn, inverse))
    x = x[:, rev]

    half_n = n // 2
    j = jnp.arange(half_n)
    extra = x.ndim - 2

    def stage(s, x):
        half = jnp.int32(1) << s
        block = j >> s
        pos = j & (half - 1)
        iu = block * (half * 2) + pos
        iv = iu + half
        # twiddle exponent: pos * (N / (2*half))
        tw_idx = pos << (logn - 1 - s)
        w = tw[:, tw_idx].reshape(tw.shape[0], half_n, *([1] * extra))
        u = x[:, iu]
        v = _mm(x[:, iv], jnp.broadcast_to(w, x[:, iv].shape))
        x = x.at[:, iu].set(_madd(u, v))
        x = x.at[:, iv].set(_msub(u, v))
        return x

    x = jax.lax.fori_loop(0, logn, stage, x)

    if inverse:
        n_inv = pow(n, -1, params.R)
        scale = F.const_mont(n_inv, n, F.FR).reshape(nl, n, *([1] * extra))
        x = _mm(x, jnp.broadcast_to(scale, x.shape))
    return x


def intt(x: jnp.ndarray) -> jnp.ndarray:
    return ntt(x, inverse=True)


# ---------------------------------------------------------------------------
# Coset evaluation — used for computing h = (v*w - y) / Z on the NTT domain,
# where Z vanishes on the domain itself (Z = x^N - 1).
# ---------------------------------------------------------------------------

_COSET_G = params.FR_GENERATOR  # multiplicative generator, not a 2^k root


@functools.lru_cache(maxsize=None)
def _coset_powers_host(logn: int, inverse: bool) -> np.ndarray:
    """(nl, N) Montgomery-form powers g^0..g^(N-1) (or g^-i)."""
    n = 1 << logn
    g = _COSET_G if not inverse else pow(_COSET_G, -1, params.R)
    vals = []
    acc = 1
    for _ in range(n):
        vals.append(acc * F.FR.R % params.R)
        acc = acc * g % params.R
    nb = F.FR.nl * 2
    buf = b"".join(v.to_bytes(nb, "little") for v in vals)
    arr = np.frombuffer(buf, dtype="<u2").reshape(n, F.FR.nl)
    return arr.T.astype(np.uint32)


def coset_ntt(x: jnp.ndarray) -> jnp.ndarray:
    """Evaluate coefficients on the coset g*<w>: scale by g^i then NTT."""
    logn = x.shape[1].bit_length() - 1
    scaled = F.mont_mul(x, jnp.asarray(_coset_powers_host(logn, False)), F.FR)
    return ntt(scaled)


def coset_intt(x: jnp.ndarray) -> jnp.ndarray:
    """Inverse of coset_ntt."""
    logn = x.shape[1].bit_length() - 1
    coeffs = intt(x)
    return F.mont_mul(coeffs, jnp.asarray(_coset_powers_host(logn, True)), F.FR)


def zh_on_coset_inv(logn: int) -> int:
    """1 / Z(g*w^i) where Z = x^N - 1: constant g^N - 1 on the whole coset."""
    n = 1 << logn
    z = (pow(_COSET_G, n, params.R) - 1) % params.R
    return pow(z, -1, params.R)
