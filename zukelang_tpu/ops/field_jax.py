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
        # full-width -p^{-1} mod R for single-shot Montgomery reduction
        self.nprime_full = (-pow(p, -1, self.R)) % self.R
        self.r_mod_p = self.R % p
        self.r2_mod_p = (self.R * self.R) % p
        self.p_limbs = np.array(_int_to_limbs(p, n_limbs), dtype=np.uint32)
        self.np_limbs = np.array(_int_to_limbs(self.nprime_full, n_limbs),
                                 dtype=np.uint32)
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
    nb = spec.nl * 2
    buf = b"".join((v % spec.p).to_bytes(nb, "little") for v in values)
    arr = np.frombuffer(buf, dtype="<u2").reshape(len(values), spec.nl)
    return jnp.asarray(arr.T.astype(np.uint32))


def unpack(arr, spec: FieldSpec) -> List[int]:
    """(nl, N) limb array -> list of Python ints."""
    nb = spec.nl * 2
    a = np.asarray(arr).astype("<u2").T.copy()  # (N, nl) little-endian limbs
    buf = a.tobytes()
    return [int.from_bytes(buf[j * nb:(j + 1) * nb], "little") % spec.p
            for j in range(a.shape[0])]


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

def _sub_const(t: jnp.ndarray, c_limbs: np.ndarray):
    """t - c over m limbs via base-2^16 two's complement.

    t: (m, N) exact limbs; c_limbs: host vector (m,).  Returns
    (diff (m, N), no_borrow (N,) bool) where diff = t - c mod 2^(16m) and
    no_borrow means t >= c.
    """
    m, n = t.shape
    comp = jnp.asarray((MASK - c_limbs.astype(np.int64)).astype(np.uint32)[:, None])
    v = t + comp
    v = v.at[0].add(1)  # +1 completes the two's complement
    s = _carry_exact(v)
    return s[:m], s[m] > 0


def _cond_sub_p(t, spec: FieldSpec):
    """t (list or array of nl+1 exact limbs) minus p when t >= p; t < 2p."""
    if isinstance(t, list):
        t = jnp.stack(t, axis=0)
    nl = spec.nl
    pl = np.concatenate([spec.p_limbs, np.zeros(t.shape[0] - nl, np.uint32)])
    diff, ge = _sub_const(t, pl)
    out = jnp.where(ge[None, :], diff[:nl], t[:nl])
    return [out[i] for i in range(nl)]


def _carry_exact(v: jnp.ndarray) -> jnp.ndarray:
    """Exactly resolve deferred carries: v is (m, N) uint32 with limb values
    < 2^30 interpreted base 2^16; returns (m+1, N) with limbs < 2^16.

    A local split brings limbs below 2^17; the remaining single-bit carry
    chain (which can ripple across every limb, so fixed local passes are
    not exact) is resolved in closed form with two cumulative maxima:
    carry reaches limb k iff the last generate position below k comes after
    the last blocking (non-generating, non-propagating) position below k.
    `lax.cummax` lowers to a single HLO, keeping traced graphs tiny.
    """
    mask = jnp.uint32(MASK)
    m, n = v.shape
    lo = v & mask
    hi = v >> BITS
    z = lo + jnp.concatenate([jnp.zeros((1, n), jnp.uint32), hi[:-1]], axis=0)
    top = hi[-1]
    # z < 2^17: carry generate g in {0,1}; propagate iff low half == mask.
    g = (z >> BITS).astype(jnp.bool_)       # implies not propagate
    pr = (z & mask) == mask
    kidx = jax.lax.broadcasted_iota(jnp.int32, (m, n), 0)
    gen_pos = jnp.where(g, kidx, -1)
    blk_pos = jnp.where(~pr & ~g, kidx, -1)
    last_gen = jax.lax.cummax(gen_pos, axis=0)
    last_blk = jax.lax.cummax(blk_pos, axis=0)
    carry_out = last_gen > last_blk          # carry out of limb k
    cin = jnp.concatenate(
        [jnp.zeros((1, n), jnp.bool_), carry_out[:-1]], axis=0)
    out = (z + cin.astype(jnp.uint32)) & mask
    out_top = top + carry_out[-1].astype(jnp.uint32)
    return jnp.concatenate([out, out_top[None]], axis=0)


def _to8(a: jnp.ndarray) -> jnp.ndarray:
    """(m, N) 16-bit limbs -> (2m, N) 8-bit limbs (little-endian)."""
    lo = a & jnp.uint32(0xFF)
    hi = (a >> 8) & jnp.uint32(0xFF)
    m, n = a.shape
    return jnp.stack([lo, hi], axis=1).reshape(2 * m, n)


def _from8_acc(c8: jnp.ndarray) -> jnp.ndarray:
    """Base-2^8 accumulators -> base-2^16 accumulators (pairs combined)."""
    m = c8.shape[0]
    if m % 2 == 1:
        c8 = jnp.concatenate(
            [c8, jnp.zeros((1, c8.shape[1]), c8.dtype)], axis=0)
        m += 1
    ev = c8[0::2]
    od = c8[1::2]
    return ev + (od << 8)


def _conv8_grouped(a8: jnp.ndarray, b8: jnp.ndarray) -> jnp.ndarray:
    """Full convolution of per-element 8-bit limb vectors: one grouped-conv
    HLO (int8 x int8 -> int32 is MXU-native on TPU).  (m,N),(m,N) -> (2m-1,N)."""
    m, n = a8.shape
    lhs = a8.astype(jnp.int32).T[None]             # (1, N, m)
    rhs = b8.astype(jnp.int32).T[:, None, ::-1]    # (N, 1, m) flipped
    out = jax.lax.conv_general_dilated(
        lhs, rhs, window_strides=(1,), padding=[(m - 1, m - 1)],
        dimension_numbers=("NCW", "OIW", "NCW"), feature_group_count=n)
    return out[0].T.astype(jnp.uint32)             # (2m-1, N)


def _conv8_const(a8: jnp.ndarray, c8_host: np.ndarray) -> jnp.ndarray:
    """Full convolution with a shared constant filter: (m,N) -> (m+k-1,N)."""
    m, n = a8.shape
    k = len(c8_host)
    lhs = a8.astype(jnp.int32).T[:, None, :]       # (N, 1, m)
    rhs = jnp.asarray(c8_host.astype(np.int32)[None, None, ::-1])  # (1,1,k)
    out = jax.lax.conv_general_dilated(
        lhs, rhs, window_strides=(1,), padding=[(k - 1, k - 1)],
        dimension_numbers=("NCW", "OIW", "NCW"))
    return out[:, 0, :].T.astype(jnp.uint32)       # (m+k-1, N)


def _to8_host(x: int, m: int) -> np.ndarray:
    return np.array([(x >> (8 * i)) & 0xFF for i in range(m)], dtype=np.uint32)


# Selectable multiply backend: "pallas" (fused VMEM kernel — 100x faster
# than the conv lowering on real TPUs: 370 vs 3.8 Mmul/s for Fq at 2^20),
# "conv" (grouped-conv HLOs; TPU-only fallback — XLA:CPU rewrites the
# grouped conv into a dense O(N^2) one), "cios" (deferred-carry CIOS
# loop — the CPU default), or "auto" (pallas on TPU, cios elsewhere).
import os as _os

MUL_IMPL = _os.environ.get("ZUKELANG_MUL_IMPL", "auto")


def set_mul_impl(name: str):
    global MUL_IMPL
    assert name in ("auto", "conv", "pallas", "cios")
    MUL_IMPL = name


def _use_pallas() -> bool:
    if MUL_IMPL == "pallas":
        return True
    if MUL_IMPL in ("conv", "cios"):
        return False
    return jax.default_backend() in ("tpu", "axon")


def mont_mul(a: jnp.ndarray, b: jnp.ndarray, spec: FieldSpec) -> jnp.ndarray:
    if _use_pallas():
        from . import pallas_kernels
        return pallas_kernels.mont_mul_pallas(a, b, spec, interpret=False)
    if MUL_IMPL == "conv" or (
            MUL_IMPL != "cios" and jax.default_backend() in ("tpu", "axon")):
        return mont_mul_conv(a, b, spec)
    # XLA:CPU rewrites the feature_group_count=N grouped conv into a dense
    # one — O(N^2) filter memory/compute (measured ~7000x slower than CIOS
    # at N=1024, 100s of GB at N=8192).  CPU always takes the CIOS loop.
    return mont_mul_cios(a, b, spec)


def mont_mul_conv(a: jnp.ndarray, b: jnp.ndarray, spec: FieldSpec) -> jnp.ndarray:
    """Montgomery multiply a*b*R^-1 mod p via single-shot reduction over
    8-bit limb convolutions.

    T = a*b;  m = (T mod R)*(-p^-1) mod R;  res = (T + m*p)/R; one
    conditional subtraction.  Each product is ONE convolution HLO
    (grouped conv for a*b, shared-filter conv for the constant factors):
    no while-loops, tiny traced graphs, and the int8xint8->int32 form is
    exactly what the TPU MXU consumes.  Products of 8-bit limbs summed
    over <=96 taps stay below 2^23 — no uint32 overflow anywhere.
    """
    nl = spec.nl
    n = a.shape[1]
    m8 = 2 * nl

    a8 = _to8(a)
    b8 = _to8(b)
    T8 = _conv8_grouped(a8, b8)                          # (2m8-1, N) base-2^8 acc
    T = _carry_exact(_from8_acc(T8))                     # (2nl+1, N) exact 16-bit
    # q = T mod R * NP mod R, in 8-bit limbs
    tlow8 = _to8(T[:nl])
    np8 = _to8_host(spec.nprime_full, m8)
    q8_acc = _conv8_const(tlow8, np8)[:m8]               # low m8 8-bit limbs
    q = _carry_exact(_from8_acc(q8_acc))[:nl]            # exact mod R
    q8 = _to8(q)
    p8 = _to8_host(spec.p, m8)
    M8 = _conv8_const(q8, p8)                            # (2m8-1, N)
    M = _from8_acc(M8)
    M = jnp.concatenate(
        [M, jnp.zeros((1, n), jnp.uint32)], axis=0)[: 2 * nl + 1]
    S = _carry_exact(M + T)                              # (2nl+2, N), = T+q*p
    out = _cond_sub_p(S[nl: 2 * nl + 1], spec)
    return jnp.stack(out, axis=0)


def mont_mul_cios(a: jnp.ndarray, b: jnp.ndarray, spec: FieldSpec) -> jnp.ndarray:
    """Montgomery multiply a*b*R^-1 mod p: deferred-carry CIOS.

    One fori_loop over the limbs of `a`; the loop body accumulates
    a_i*b and m_i*p with 16-bit lo/hi splits into uint32 accumulators
    (never exceeding ~2^24, so no overflow), computes the Montgomery
    quotient digit from the exact low 16 bits, and shifts the accumulator
    down one limb.  Deferred carries are resolved once at the end.
    The tiny traced body (one while-loop, ~16 ops) is what keeps composed
    curve formulas compilable.
    """
    nl = spec.nl
    n = a.shape[1]
    mask = jnp.uint32(MASK)
    npr = jnp.uint32(spec.nprime)
    P = jnp.broadcast_to(jnp.asarray(spec.p_limbs[:, None]), (nl, n))
    zrow = jnp.zeros((1, n), dtype=jnp.uint32)

    def body(i, t):
        ai = jax.lax.dynamic_index_in_dim(a, i, 0, keepdims=False)
        p1 = ai[None, :] * b
        t = t + jnp.concatenate([p1 & mask, zrow], axis=0)
        t = t + jnp.concatenate([zrow, p1 >> BITS], axis=0)
        m = ((t[0] & mask) * npr) & mask
        p2 = m[None, :] * P
        t = t + jnp.concatenate([p2 & mask, zrow], axis=0)
        t = t + jnp.concatenate([zrow, p2 >> BITS], axis=0)
        carry0 = t[0] >> BITS  # low 16 bits of t[0] are now exactly zero
        t = jnp.concatenate([t[1:], zrow], axis=0)
        t = t.at[0].add(carry0)
        return t

    t = jax.lax.fori_loop(0, nl, body,
                          jnp.zeros((nl + 1, n), dtype=jnp.uint32))
    S = _carry_exact(t)                    # (nl+2, N) exact; value < 2p
    out = _cond_sub_p(S[: nl + 1], spec)
    return jnp.stack(out, axis=0)


def mont_sqr(a, spec):
    return mont_mul(a, a, spec)


def add(a: jnp.ndarray, b: jnp.ndarray, spec: FieldSpec) -> jnp.ndarray:
    """Modular addition (works in either domain)."""
    s = _carry_exact(a + b)  # limbs < 2^17, exact
    res = _cond_sub_p(s[: spec.nl + 1], spec)
    return jnp.stack(res, axis=0)


def sub(a: jnp.ndarray, b: jnp.ndarray, spec: FieldSpec) -> jnp.ndarray:
    """Modular subtraction: a - b, adding p back on borrow."""
    nl, n = a.shape
    mask = jnp.uint32(MASK)
    comp = (jnp.uint32(MASK) - b)
    v = a + comp
    v = v.at[0].add(1)
    s = _carry_exact(v)
    diff = s[:nl]
    no_borrow = s[nl] > 0
    # on borrow, add p (cannot overflow back past 2^16nl)
    fixed = _carry_exact(diff + jnp.asarray(spec.p_limbs[:, None]))[:nl]
    return jnp.where(no_borrow[None, :], diff, fixed)


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
        return jnp.where(bits[i] == 1, mul, acc)  # scalar cond broadcasts

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
