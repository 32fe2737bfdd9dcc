"""Vectorized multi-limb Montgomery arithmetic for Fr and Fq on TPU.

Design (SURVEY.md section 7, layer 1): TPU has no 64-bit integer multiply, so
field elements are structure-of-arrays batches of 16-bit limbs held in
uint32 lanes — every partial product (<= (2^16-1)^2) and every CIOS
accumulation step (<= 2^32-1, exactly) fits in a uint32 with no overflow.
Layout is limb-major `(n_limbs, N)`: the batch rides the TPU lane dimension,
limb loops unroll at trace time, and the VPU processes 8x128 elements per
op.  Montgomery radix is R = 2^(16*n_limbs).

Golden oracle: zukelang_tpu.golden.field (python ints mod p).
"""

from __future__ import annotations

import functools
from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .. import params

MASK = params.LIMB_MASK
BITS = params.LIMB_BITS


class FieldSpec:
    """Static parameters of one prime field's limb representation."""

    def __init__(self, name: str, p: int, n_limbs: int):
        self.name = name
        self.p = p
        self.nl = n_limbs
        self.R = 1 << (BITS * n_limbs)
        assert self.R > p
        self.nprime = (-pow(p, -1, 1 << BITS)) % (1 << BITS)
        self.r_mod_p = self.R % p
        self.r2_mod_p = (self.R * self.R) % p
        self.p_limbs = np.array(_int_to_limbs(p, n_limbs), dtype=np.uint32)
        # p as (nl, 1) for broadcasting against (nl, N)
        self.p_col = self.p_limbs.reshape(n_limbs, 1)

    def __repr__(self):
        return f"FieldSpec({self.name}, {self.nl} limbs)"


def _int_to_limbs(x: int, nl: int) -> List[int]:
    return [(x >> (BITS * i)) & MASK for i in range(nl)]


FR = FieldSpec("Fr", params.R, params.FR_LIMBS)
FQ = FieldSpec("Fq", params.P, params.FQ_LIMBS)


# ---------------------------------------------------------------------------
# Host-side packing
# ---------------------------------------------------------------------------

def pack(values: Sequence[int], spec: FieldSpec) -> jnp.ndarray:
    """Python ints (standard form) -> (nl, N) uint32 limb array."""
    n = len(values)
    out = np.empty((spec.nl, n), dtype=np.uint32)
    for j, v in enumerate(values):
        v %= spec.p
        for i in range(spec.nl):
            out[i, j] = (v >> (BITS * i)) & MASK
    return jnp.asarray(out)


def unpack(arr, spec: FieldSpec) -> List[int]:
    """(nl, N) limb array -> list of Python ints."""
    a = np.asarray(arr)
    out = []
    for j in range(a.shape[1]):
        v = 0
        for i in range(spec.nl):
            v |= int(a[i, j]) << (BITS * i)
        out.append(v % spec.p)
    return out


def zeros(n: int, spec: FieldSpec) -> jnp.ndarray:
    return jnp.zeros((spec.nl, n), dtype=jnp.uint32)


def ones_mont(n: int, spec: FieldSpec) -> jnp.ndarray:
    """Montgomery-form 1 (= R mod p), broadcast to N."""
    col = np.array(_int_to_limbs(spec.r_mod_p, spec.nl), np.uint32)
    return jnp.broadcast_to(jnp.asarray(col)[:, None], (spec.nl, n))


def const_mont(x: int, n: int, spec: FieldSpec) -> jnp.ndarray:
    """Montgomery-form constant broadcast to N."""
    v = (x * spec.R) % spec.p
    col = np.array(_int_to_limbs(v, spec.nl), np.uint32)
    return jnp.broadcast_to(jnp.asarray(col)[:, None], (spec.nl, n))


# ---------------------------------------------------------------------------
# Core limb kernels (trace-time unrolled over limbs, vectorized over batch)
# ---------------------------------------------------------------------------

def _geq(a_limbs: List, p_limbs: np.ndarray):
    """a >= p, multi-limb compare (a has len(p_limbs) limbs)."""
    nl = len(a_limbs)
    ge = jnp.ones_like(a_limbs[0], dtype=jnp.bool_)
    # scan from most-significant limb down
    result = None
    gt = jnp.zeros_like(a_limbs[0], dtype=jnp.bool_)
    eq = jnp.ones_like(a_limbs[0], dtype=jnp.bool_)
    for i in range(nl - 1, -1, -1):
        pi = jnp.uint32(int(p_limbs[i]))
        gt = gt | (eq & (a_limbs[i] > pi))
        eq = eq & (a_limbs[i] == pi)
    return gt | eq


def _cond_sub_p(t: List, spec: FieldSpec):
    """t (nl+1 limbs, each < 2^16 except t[nl] small) minus p if t >= p."""
    nl = spec.nl
    pl = list(spec.p_limbs) + [0]
    do = _geq(t, np.array(pl, dtype=np.uint32))
    out = []
    borrow = jnp.zeros_like(t[0])
    for i in range(nl):
        d = t[i] - jnp.uint32(pl[i]) - borrow
        borrow = (d >> 31).astype(jnp.uint32) & jnp.uint32(1)  # borrow flag via wraparound
        d = d & jnp.uint32(MASK)
        out.append(jnp.where(do, d, t[i]))
    return out


def mont_mul(a: jnp.ndarray, b: jnp.ndarray, spec: FieldSpec) -> jnp.ndarray:
    """CIOS Montgomery multiply: returns a*b*R^-1 mod p, limbs < 2^16.

    With 16-bit limbs every step stays below 2^32 exactly:
      t[j] + a_i*b_j + C  <=  (2^16-1) + (2^16-1)^2 + (2^16-1)  =  2^32-1.
    """
    nl = spec.nl
    al = [a[i] for i in range(nl)]
    bl = [b[i] for i in range(nl)]
    pl = [jnp.uint32(int(x)) for x in spec.p_limbs]
    npr = jnp.uint32(spec.nprime)
    mask = jnp.uint32(MASK)

    zero = jnp.zeros_like(al[0])
    t = [zero] * (nl + 2)
    for i in range(nl):
        ai = al[i]
        c = zero
        for j in range(nl):
            s = t[j] + ai * bl[j] + c
            t[j] = s & mask
            c = s >> BITS
        s = t[nl] + c
        t[nl] = s & mask
        t[nl + 1] = t[nl + 1] + (s >> BITS)

        m = (t[0] * npr) & mask
        s = t[0] + m * pl[0]
        c = s >> BITS
        for j in range(1, nl):
            s = t[j] + m * pl[j] + c
            t[j - 1] = s & mask
            c = s >> BITS
        s = t[nl] + c
        t[nl - 1] = s & mask
        c = s >> BITS
        t[nl] = t[nl + 1] + c
        t[nl + 1] = zero

    res = _cond_sub_p(t[: nl + 1], spec)
    return jnp.stack(res, axis=0)


def mont_sqr(a, spec):
    return mont_mul(a, a, spec)


def add(a: jnp.ndarray, b: jnp.ndarray, spec: FieldSpec) -> jnp.ndarray:
    """Modular addition (works in either domain)."""
    nl = spec.nl
    mask = jnp.uint32(MASK)
    out = []
    c = jnp.zeros_like(a[0])
    for i in range(nl):
        s = a[i] + b[i] + c
        out.append(s & mask)
        c = s >> BITS
    out.append(c)
    res = _cond_sub_p(out, spec)
    return jnp.stack(res, axis=0)


def sub(a: jnp.ndarray, b: jnp.ndarray, spec: FieldSpec) -> jnp.ndarray:
    """Modular subtraction."""
    nl = spec.nl
    mask = jnp.uint32(MASK)
    diff = []
    borrow = jnp.zeros_like(a[0])
    for i in range(nl):
        d = a[i] - b[i] - borrow
        borrow = (d >> 31).astype(jnp.uint32) & jnp.uint32(1)
        diff.append(d & mask)
    # if borrow: add p back
    neg = borrow.astype(jnp.bool_)
    out = []
    c = jnp.zeros_like(a[0])
    for i in range(nl):
        s = diff[i] + jnp.uint32(int(spec.p_limbs[i])) + c
        out.append(jnp.where(neg, s & mask, diff[i]))
        c = jnp.where(neg, s >> BITS, jnp.zeros_like(c))
    return jnp.stack(out, axis=0)


def neg(a: jnp.ndarray, spec: FieldSpec) -> jnp.ndarray:
    return sub(jnp.zeros_like(a), a, spec)


def is_zero(a: jnp.ndarray) -> jnp.ndarray:
    """(N,) bool — all limbs zero."""
    return jnp.all(a == 0, axis=0)


def eq(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.all(a == b, axis=0)


def select(cond: jnp.ndarray, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """cond: (N,) bool; per-element select between limb arrays."""
    return jnp.where(cond[None, :], a, b)


# ---------------------------------------------------------------------------
# Domain conversion and fixed-exponent powers
# ---------------------------------------------------------------------------

def to_mont(a, spec):
    r2 = const_mont(spec.R % spec.p, a.shape[1], spec)  # R^2 in "mont of R" = R^2
    # note: const_mont(x) = x*R, so const_mont(R mod p) = R^2 mod p
    return mont_mul(a, r2, spec)


def from_mont(a, spec):
    one = jnp.zeros_like(a).at[0].set(1)
    return mont_mul(a, one, spec)


def pow_const(a: jnp.ndarray, e: int, spec: FieldSpec) -> jnp.ndarray:
    """a^e for a fixed python-int exponent; a in Montgomery form.

    Uses a lax.fori_loop over the exponent bits (MSB first) so the traced
    body contains exactly one squaring and one multiply.
    """
    if e == 0:
        return ones_mont(a.shape[1], spec)
    nbits = e.bit_length()
    bits = jnp.asarray(
        np.array([(e >> (nbits - 1 - i)) & 1 for i in range(nbits)],
                 dtype=np.uint32))

    def body(i, acc):
        acc = mont_sqr(acc, spec)
        mul = mont_mul(acc, a, spec)
        return select(bits[i] == 1, mul, acc)

    # start from the MSB (always 1): acc = a
    return jax.lax.fori_loop(1, nbits, body, a)


def inv(a: jnp.ndarray, spec: FieldSpec) -> jnp.ndarray:
    """Batched inverse via Fermat: a^(p-2); zero maps to zero."""
    return pow_const(a, spec.p - 2, spec)


# ---------------------------------------------------------------------------
# Convenience: round-trip helpers used by engines
# ---------------------------------------------------------------------------

def pack_mont(values: Sequence[int], spec: FieldSpec) -> jnp.ndarray:
    """Ints -> Montgomery-form limb batch."""
    return pack([(v % spec.p) * spec.R % spec.p for v in values], spec)


def unpack_mont(arr, spec: FieldSpec) -> List[int]:
    rinv = pow(spec.R, -1, spec.p)
    return [(v * rinv) % spec.p for v in unpack(arr, spec)]
