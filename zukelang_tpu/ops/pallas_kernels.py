"""Pallas TPU kernels for the hot field ops.

The XLA path (ops/field_jax.py) expresses one Montgomery multiply as ~10
separate HLOs (convs + carry fixes), each round-tripping (nl, N) uint32
arrays through HBM.  This kernel fuses the whole deferred-carry CIOS into
one VMEM-resident pass: the batch is tiled along the lane axis, limb loops
unroll inside the kernel, and each tile reads a/b once and writes the
result once (~3x less HBM traffic at large N).

Functionally identical to field_jax.mont_mul (differentially tested);
selected via field_jax-compatible wrappers below.  Runs under
interpret=True on CPU for tests.

Every lru-cached call builder returns jax.jit(pl.pallas_call(...)): the
kernel bodies unroll their limb loops, so one kernel trace is 10^4..10^6
primitives, and a bare pallas_call re-traces the kernel at EVERY call
site of every enclosing trace.  The jit wrapper puts the kernel jaxpr
behind the pjit trace cache — traced once per shape process-wide
(measured: fixed-base table build tracing went from ~740 s to seconds).
XLA inlines the called computation, so compiled code is unchanged.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import params
from . import field_jax as F

MASK16 = 0xFFFF


# ---------------------------------------------------------------------------
# Reusable in-kernel field arithmetic on per-limb value lists
# ---------------------------------------------------------------------------

def _fq_mul_body(a, b, p_limbs, nprime):
    """Deferred-carry CIOS on lists of (N,)-lane uint32 limb values."""
    nl = len(p_limbs)
    mask = jnp.uint32(MASK16)
    npr = jnp.uint32(nprime)
    pl_const = [jnp.uint32(int(x)) for x in p_limbs]
    zero = jnp.zeros_like(a[0])
    t = [zero] * (nl + 1)
    for i in range(nl):
        ai = a[i]
        for j in range(nl):
            prod = ai * b[j]
            t[j] = t[j] + (prod & mask)
            t[j + 1] = t[j + 1] + (prod >> 16)
        m = ((t[0] & mask) * npr) & mask
        for j in range(nl):
            prod = m * pl_const[j]
            t[j] = t[j] + (prod & mask)
            t[j + 1] = t[j + 1] + (prod >> 16)
        carry0 = t[0] >> 16
        t = t[1:] + [zero]
        t[0] = t[0] + carry0
    # ripple carry
    limbs = []
    c = zero
    for j in range(nl + 1):
        v = t[j] + c
        limbs.append(v & mask)
        c = v >> 16
    # conditional subtract p
    pl_ext = pl_const + [jnp.uint32(0)]
    borrow = zero
    diff = []
    for j in range(nl + 1):
        d = limbs[j] - pl_ext[j] - borrow
        borrow = (d >> 31) & jnp.uint32(1)
        diff.append(d & mask)
    ge = borrow == 0
    return [jnp.where(ge, diff[j], limbs[j]) for j in range(nl)]


def _fq_add_body(a, b, p_limbs):
    nl = len(p_limbs)
    mask = jnp.uint32(MASK16)
    pl_const = [jnp.uint32(int(x)) for x in p_limbs] + [jnp.uint32(0)]
    out = []
    c = jnp.zeros_like(a[0])
    for j in range(nl):
        v = a[j] + b[j] + c
        out.append(v & mask)
        c = v >> 16
    out.append(c)
    borrow = jnp.zeros_like(a[0])
    diff = []
    for j in range(nl + 1):
        d = out[j] - pl_const[j] - borrow
        borrow = (d >> 31) & jnp.uint32(1)
        diff.append(d & mask)
    ge = borrow == 0
    return [jnp.where(ge, diff[j], out[j]) for j in range(nl)]


def _fq_sub_body(a, b, p_limbs):
    nl = len(p_limbs)
    mask = jnp.uint32(MASK16)
    pl_const = [jnp.uint32(int(x)) for x in p_limbs]
    borrow = jnp.zeros_like(a[0])
    diff = []
    for j in range(nl):
        d = a[j] - b[j] - borrow
        borrow = (d >> 31) & jnp.uint32(1)
        diff.append(d & mask)
    neg = borrow == 1
    fixed = []
    c = jnp.zeros_like(a[0])
    for j in range(nl):
        v = diff[j] + pl_const[j] + c
        fixed.append(v & mask)
        c = v >> 16
    return [jnp.where(neg, fixed[j], diff[j]) for j in range(nl)]


def _fq_is_zero_body(a):
    acc = a[0]
    for x in a[1:]:
        acc = acc | x
    return acc == 0


def _mont_mul_kernel(a_ref, b_ref, o_ref, *, nl, p_limbs, nprime):
    mask = jnp.uint32(MASK16)
    npr = jnp.uint32(nprime)
    pl_const = [jnp.uint32(int(x)) for x in p_limbs]

    b = [b_ref[j, :] for j in range(nl)]
    zero = jnp.zeros_like(b[0])
    t = [zero] * (nl + 1)

    # deferred-carry CIOS: accumulators stay < 2^24 (4 split halves per
    # iteration, <= nl+1 iterations of lifetime per slot)
    for i in range(nl):
        ai = a_ref[i, :]
        for j in range(nl):
            prod = ai * b[j]
            t[j] = t[j] + (prod & mask)
            t[j + 1] = t[j + 1] + (prod >> 16)
        m = ((t[0] & mask) * npr) & mask
        for j in range(nl):
            prod = m * pl_const[j]
            t[j] = t[j] + (prod & mask)
            t[j + 1] = t[j + 1] + (prod >> 16)
        carry0 = t[0] >> 16  # low 16 bits of t[0] are now exactly zero
        t = t[1:] + [zero]
        t[0] = t[0] + carry0

    # exact ripple carry (values < 2^24, so each step's carry < 2^9)
    limbs = []
    c = zero
    for j in range(nl + 1):
        v = t[j] + c
        limbs.append(v & mask)
        c = v >> 16
    # conditional subtract p (result < 2p)
    pl_ext = pl_const + [jnp.uint32(0)]
    borrow = zero
    diff = []
    for j in range(nl + 1):
        d = limbs[j] - pl_ext[j] - borrow
        borrow = (d >> 31) & jnp.uint32(1)
        diff.append(d & mask)
    ge = borrow == 0  # limbs >= p
    for j in range(nl):
        o_ref[j, :] = jnp.where(ge, diff[j], limbs[j])


@functools.lru_cache(maxsize=8)
def _mont_mul_call(nl: int, n: int, block: int, interpret: bool):
    spec = F.FR if nl == params.FR_LIMBS else F.FQ
    kernel = functools.partial(
        _mont_mul_kernel, nl=nl, p_limbs=tuple(int(x) for x in spec.p_limbs),
        nprime=spec.nprime)
    grid = (n // block,)
    return jax.jit(pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((nl, n), jnp.uint32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((nl, block), lambda i: (0, i),
                         memory_space=pltpu.ANY if interpret else pltpu.VMEM),
            pl.BlockSpec((nl, block), lambda i: (0, i),
                         memory_space=pltpu.ANY if interpret else pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((nl, block), lambda i: (0, i),
                               memory_space=pltpu.ANY if interpret else pltpu.VMEM),
        interpret=interpret,
    ))


def mont_mul_pallas(a: jnp.ndarray, b: jnp.ndarray, spec: F.FieldSpec,
                    block: int = 512, interpret: bool = None) -> jnp.ndarray:
    """Drop-in fused replacement for field_jax.mont_mul.

    Pads the batch up to a block multiple; `interpret` defaults to True off
    TPU so tests exercise the same kernel logic on CPU.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    nl, n = a.shape
    block = min(block, max(128, 1 << (n - 1).bit_length()))
    npad = -(-n // block) * block
    if npad != n:
        a = jnp.pad(a, ((0, 0), (0, npad - n)))
        b = jnp.pad(b, ((0, 0), (0, npad - n)))
    out = _mont_mul_call(nl, npad, block, interpret)(a, b)
    return out[:, :n]


# ---------------------------------------------------------------------------
# Fused Jacobian point kernels (G1 / Fq): whole group law in one VMEM pass
# ---------------------------------------------------------------------------
#
# The MSM inner loops are chains of point_adds; composing them from ~26
# separate mont_mul launches pays per-launch latency and HBM round-trips
# for every intermediate.  These kernels evaluate the full add/double
# formulas (with all special cases, matching ops/curve_jax.py) in VMEM.

def _read(ref, nl):
    return [ref[j, :] for j in range(nl)]


def _select_limbs(cond, a, b):
    return [jnp.where(cond, x, y) for x, y in zip(a, b)]


def _double_body(X, Y, Z, p_limbs, nprime):
    mul = lambda a, b: _fq_mul_body(a, b, p_limbs, nprime)
    add = lambda a, b: _fq_add_body(a, b, p_limbs)
    sub = lambda a, b: _fq_sub_body(a, b, p_limbs)
    A = mul(X, X)
    B = mul(Y, Y)
    C = mul(B, B)
    t = add(X, B)
    t = mul(t, t)
    D = sub(sub(t, A), C)
    D = add(D, D)
    E = add(add(A, A), A)
    Fv = mul(E, E)
    X3 = sub(Fv, add(D, D))
    c8 = add(C, C)
    c8 = add(c8, c8)
    c8 = add(c8, c8)
    Y3 = sub(mul(E, sub(D, X3)), c8)
    YZ = mul(Y, Z)
    Z3 = add(YZ, YZ)
    return X3, Y3, Z3


def _point_double_kernel(x_ref, y_ref, z_ref, ox_ref, oy_ref, oz_ref,
                         *, nl, p_limbs, nprime):
    X = _read(x_ref, nl)
    Y = _read(y_ref, nl)
    Z = _read(z_ref, nl)
    X3, Y3, Z3 = _double_body(X, Y, Z, p_limbs, nprime)
    for j in range(nl):
        ox_ref[j, :] = X3[j]
        oy_ref[j, :] = Y3[j]
        oz_ref[j, :] = Z3[j]


def _point_add_kernel(x1_ref, y1_ref, z1_ref, x2_ref, y2_ref, z2_ref,
                      ox_ref, oy_ref, oz_ref, *, nl, p_limbs, nprime):
    mul = lambda a, b: _fq_mul_body(a, b, p_limbs, nprime)
    add = lambda a, b: _fq_add_body(a, b, p_limbs)
    sub = lambda a, b: _fq_sub_body(a, b, p_limbs)

    X1 = _read(x1_ref, nl); Y1 = _read(y1_ref, nl); Z1 = _read(z1_ref, nl)
    X2 = _read(x2_ref, nl); Y2 = _read(y2_ref, nl); Z2 = _read(z2_ref, nl)

    Z1Z1 = mul(Z1, Z1)
    Z2Z2 = mul(Z2, Z2)
    U1 = mul(X1, Z2Z2)
    U2 = mul(X2, Z1Z1)
    S1 = mul(mul(Y1, Z2), Z2Z2)
    S2 = mul(mul(Y2, Z1), Z1Z1)
    H = sub(U2, U1)
    r = sub(S2, S1)
    H2 = add(H, H)
    I = mul(H2, H2)
    J = mul(H, I)
    r2 = add(r, r)
    V = mul(U1, I)
    X3 = sub(sub(mul(r2, r2), J), add(V, V))
    S1J = mul(S1, J)
    Y3 = sub(mul(r2, sub(V, X3)), add(S1J, S1J))
    Zs = mul(add(Z1, Z2), add(Z1, Z2))
    Z3 = mul(sub(sub(Zs, Z1Z1), Z2Z2), H)

    p_inf = _fq_is_zero_body(Z1)
    q_inf = _fq_is_zero_body(Z2)
    h_zero = _fq_is_zero_body(H)
    r_zero = _fq_is_zero_body(r)
    same = h_zero & r_zero & ~p_inf & ~q_inf

    dX, dY, dZ = _double_body(X1, Y1, Z1, p_limbs, nprime)
    X3 = _select_limbs(same, dX, X3)
    Y3 = _select_limbs(same, dY, Y3)
    Z3 = _select_limbs(same, dZ, Z3)
    X3 = _select_limbs(q_inf, X1, _select_limbs(p_inf, X2, X3))
    Y3 = _select_limbs(q_inf, Y1, _select_limbs(p_inf, Y2, Y3))
    Z3 = _select_limbs(q_inf, Z1, _select_limbs(p_inf, Z2, Z3))
    for j in range(nl):
        ox_ref[j, :] = X3[j]
        oy_ref[j, :] = Y3[j]
        oz_ref[j, :] = Z3[j]


@functools.lru_cache(maxsize=16)
def _point_call(kind: str, n: int, block: int, interpret: bool):
    spec = F.FQ
    nl = spec.nl
    common = dict(nl=nl, p_limbs=tuple(int(x) for x in spec.p_limbs),
                  nprime=spec.nprime)
    n_in = 3 if kind == "double" else 6
    kernel = functools.partial(
        _point_double_kernel if kind == "double" else _point_add_kernel,
        **common)
    bs = pl.BlockSpec((nl, block), lambda i: (0, i),
                      memory_space=pltpu.ANY if interpret else pltpu.VMEM)
    return jax.jit(pl.pallas_call(
        kernel,
        out_shape=tuple(jax.ShapeDtypeStruct((nl, n), jnp.uint32)
                        for _ in range(3)),
        grid=(n // block,),
        in_specs=[bs] * n_in,
        out_specs=(bs,) * 3,
        interpret=interpret,
    ))


def _pad_to(x, npad):
    return jnp.pad(x, ((0, 0), (0, npad - x.shape[1]))) if x.shape[1] != npad else x


def point_add_pallas(p, q, block: int = 256, interpret: bool = None):
    """Fused G1 Jacobian add; drop-in for curve_jax.point_add on Fq."""
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    n = p[0].shape[1]
    blk = min(block, 1 << max(7, (n - 1).bit_length()))
    npad = -(-n // blk) * blk
    args = [_pad_to(x, npad) for x in (*p, *q)]
    # padded lanes are (0,0,0) = infinity for both operands -> stays infinity
    out = _point_call("add", npad, blk, interpret)(*args)
    return tuple(o[:, :n] for o in out)


def point_double_pallas(p, block: int = 256, interpret: bool = None):
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    n = p[0].shape[1]
    blk = min(block, 1 << max(7, (n - 1).bit_length()))
    npad = -(-n // blk) * blk
    args = [_pad_to(x, npad) for x in p]
    out = _point_call("double", npad, blk, interpret)(*args)
    return tuple(o[:, :n] for o in out)


# ---------------------------------------------------------------------------
# Fused Jacobian point kernels for G2 (coordinates in Fq2)
# ---------------------------------------------------------------------------
#
# Same group law over Fq2 = Fq[u]/(u^2+1); each coordinate ref carries the
# two Fq components stacked on the limb axis: rows [0, nl) = c0,
# rows [nl, 2nl) = c1.

def _fq2_mul_body(a, b, p_limbs, nprime):
    """Karatsuba: (a0+a1 u)(b0+b1 u); a = (a0, a1) lists of limb rows."""
    a0, a1 = a
    b0, b1 = b
    v0 = _fq_mul_body(a0, b0, p_limbs, nprime)
    v1 = _fq_mul_body(a1, b1, p_limbs, nprime)
    t = _fq_mul_body(_fq_add_body(a0, a1, p_limbs),
                     _fq_add_body(b0, b1, p_limbs), p_limbs, nprime)
    c0 = _fq_sub_body(v0, v1, p_limbs)
    c1 = _fq_sub_body(_fq_sub_body(t, v0, p_limbs), v1, p_limbs)
    return c0, c1


def _fq2_add_body(a, b, p_limbs):
    return (_fq_add_body(a[0], b[0], p_limbs), _fq_add_body(a[1], b[1], p_limbs))


def _fq2_sub_body(a, b, p_limbs):
    return (_fq_sub_body(a[0], b[0], p_limbs), _fq_sub_body(a[1], b[1], p_limbs))


def _fq2_is_zero_body(a):
    return _fq_is_zero_body(a[0]) & _fq_is_zero_body(a[1])


def _read2(ref, nl):
    return ([ref[j, :] for j in range(nl)],
            [ref[nl + j, :] for j in range(nl)])


def _sel2(cond, a, b):
    return (_select_limbs(cond, a[0], b[0]), _select_limbs(cond, a[1], b[1]))


def _double_body2(X, Y, Z, p_limbs, nprime):
    mul = lambda a, b: _fq2_mul_body(a, b, p_limbs, nprime)
    add = lambda a, b: _fq2_add_body(a, b, p_limbs)
    sub = lambda a, b: _fq2_sub_body(a, b, p_limbs)
    A = mul(X, X)
    B = mul(Y, Y)
    Cc = mul(B, B)
    t = add(X, B)
    t = mul(t, t)
    D = sub(sub(t, A), Cc)
    D = add(D, D)
    E = add(add(A, A), A)
    Fv = mul(E, E)
    X3 = sub(Fv, add(D, D))
    c8 = add(Cc, Cc)
    c8 = add(c8, c8)
    c8 = add(c8, c8)
    Y3 = sub(mul(E, sub(D, X3)), c8)
    YZ = mul(Y, Z)
    Z3 = add(YZ, YZ)
    return X3, Y3, Z3


def _write2(ref, v, nl):
    for j in range(nl):
        ref[j, :] = v[0][j]
        ref[nl + j, :] = v[1][j]


def _point_double_kernel2(x_ref, y_ref, z_ref, ox_ref, oy_ref, oz_ref,
                          *, nl, p_limbs, nprime):
    X = _read2(x_ref, nl)
    Y = _read2(y_ref, nl)
    Z = _read2(z_ref, nl)
    X3, Y3, Z3 = _double_body2(X, Y, Z, p_limbs, nprime)
    _write2(ox_ref, X3, nl)
    _write2(oy_ref, Y3, nl)
    _write2(oz_ref, Z3, nl)


def _point_add_kernel2(x1_ref, y1_ref, z1_ref, x2_ref, y2_ref, z2_ref,
                       ox_ref, oy_ref, oz_ref, *, nl, p_limbs, nprime):
    mul = lambda a, b: _fq2_mul_body(a, b, p_limbs, nprime)
    add = lambda a, b: _fq2_add_body(a, b, p_limbs)
    sub = lambda a, b: _fq2_sub_body(a, b, p_limbs)

    X1 = _read2(x1_ref, nl); Y1 = _read2(y1_ref, nl); Z1 = _read2(z1_ref, nl)
    X2 = _read2(x2_ref, nl); Y2 = _read2(y2_ref, nl); Z2 = _read2(z2_ref, nl)

    Z1Z1 = mul(Z1, Z1)
    Z2Z2 = mul(Z2, Z2)
    U1 = mul(X1, Z2Z2)
    U2 = mul(X2, Z1Z1)
    S1 = mul(mul(Y1, Z2), Z2Z2)
    S2 = mul(mul(Y2, Z1), Z1Z1)
    H = sub(U2, U1)
    r = sub(S2, S1)
    H2 = add(H, H)
    I = mul(H2, H2)
    J = mul(H, I)
    r2 = add(r, r)
    V = mul(U1, I)
    X3 = sub(sub(mul(r2, r2), J), add(V, V))
    S1J = mul(S1, J)
    Y3 = sub(mul(r2, sub(V, X3)), add(S1J, S1J))
    Zs = mul(add(Z1, Z2), add(Z1, Z2))
    Z3 = mul(sub(sub(Zs, Z1Z1), Z2Z2), H)

    p_inf = _fq2_is_zero_body(Z1)
    q_inf = _fq2_is_zero_body(Z2)
    same = (_fq2_is_zero_body(H) & _fq2_is_zero_body(r)
            & ~p_inf & ~q_inf)

    dX, dY, dZ = _double_body2(X1, Y1, Z1, p_limbs, nprime)
    X3 = _sel2(same, dX, X3)
    Y3 = _sel2(same, dY, Y3)
    Z3 = _sel2(same, dZ, Z3)
    X3 = _sel2(q_inf, X1, _sel2(p_inf, X2, X3))
    Y3 = _sel2(q_inf, Y1, _sel2(p_inf, Y2, Y3))
    Z3 = _sel2(q_inf, Z1, _sel2(p_inf, Z2, Z3))
    _write2(ox_ref, X3, nl)
    _write2(oy_ref, Y3, nl)
    _write2(oz_ref, Z3, nl)


@functools.lru_cache(maxsize=16)
def _point_call2(kind: str, n: int, block: int, interpret: bool):
    spec = F.FQ
    nl = spec.nl
    common = dict(nl=nl, p_limbs=tuple(int(x) for x in spec.p_limbs),
                  nprime=spec.nprime)
    n_in = 3 if kind == "double" else 6
    kernel = functools.partial(
        _point_double_kernel2 if kind == "double" else _point_add_kernel2,
        **common)
    bs = pl.BlockSpec((2 * nl, block), lambda i: (0, i),
                      memory_space=pltpu.ANY if interpret else pltpu.VMEM)
    return jax.jit(pl.pallas_call(
        kernel,
        out_shape=tuple(jax.ShapeDtypeStruct((2 * nl, n), jnp.uint32)
                        for _ in range(3)),
        grid=(n // block,),
        in_specs=[bs] * n_in,
        out_specs=(bs,) * 3,
        interpret=interpret,
    ))


def _flat2(x):
    """(2, nl, N) Fq2 coordinate -> (2nl, N) stacked rows."""
    return x.reshape(2 * x.shape[1], x.shape[2])


def _unflat2(x):
    return x.reshape(2, x.shape[0] // 2, x.shape[1])


def point_add_pallas_g2(p, q, block: int = 256, interpret: bool = None):
    """Fused G2 Jacobian add; drop-in for curve_jax.point_add on Fq2."""
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    n = p[0].shape[-1]
    blk = min(block, 1 << max(7, (n - 1).bit_length()))
    npad = -(-n // blk) * blk
    args = [_pad_to(_flat2(x), npad) for x in (*p, *q)]
    out = _point_call2("add", npad, blk, interpret)(*args)
    return tuple(_unflat2(o)[..., :n] for o in out)


def point_double_pallas_g2(p, block: int = 256, interpret: bool = None):
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    n = p[0].shape[-1]
    blk = min(block, 1 << max(7, (n - 1).bit_length()))
    npad = -(-n // blk) * blk
    args = [_pad_to(_flat2(x), npad) for x in p]
    out = _point_call2("double", npad, blk, interpret)(*args)
    return tuple(_unflat2(o)[..., :n] for o in out)


# ---------------------------------------------------------------------------
# Mixed addition (Jacobian p + affine q) — the MSM bucket-phase workhorse
# ---------------------------------------------------------------------------
#
# madd-2007-bl: 11 field muls vs the general add's 16 (+8 for the fused
# doubling path).  The doubling case (p == q, both finite) is NOT resolved
# in-kernel: the kernel emits a per-lane `same` mask and a garbage result
# for those lanes (Z3 = 0); callers apply a lax.cond fixup that doubles p
# only when any lane collided — cryptographically negligible for MSM over
# a CRS, so the hot path never pays for it.
#
# Affine infinity is encoded as (X, Y) = (0, 0), which is never a valid
# curve point (y^2 = x^3 + 4 has no root at the origin for BLS12-381 and
# its twist).

def _madd_core(X1, Y1, Z1, X2, Y2, mul, add, sub, is_zero, sel, one):
    Z1Z1 = mul(Z1, Z1)
    U2 = mul(X2, Z1Z1)
    S2 = mul(Y2, mul(Z1, Z1Z1))
    H = sub(U2, X1)
    r = sub(S2, Y1)
    HH = mul(H, H)
    I = add(add(HH, HH), add(HH, HH))
    J = mul(H, I)
    r2 = add(r, r)
    V = mul(X1, I)
    X3 = sub(sub(mul(r2, r2), J), add(V, V))
    YJ = mul(Y1, J)
    Y3 = sub(mul(r2, sub(V, X3)), add(YJ, YJ))
    ZH = add(Z1, H)
    Z3 = sub(sub(mul(ZH, ZH), Z1Z1), HH)

    p_inf = is_zero(Z1)
    q_inf = is_zero(X2) & is_zero(Y2)
    same = is_zero(H) & is_zero(r) & ~p_inf & ~q_inf
    # q_inf -> p; p_inf -> (X2, Y2, 1); both -> p (= infinity).
    X3 = sel(q_inf, X1, sel(p_inf, X2, X3))
    Y3 = sel(q_inf, Y1, sel(p_inf, Y2, Y3))
    Z3 = sel(q_inf, Z1, sel(p_inf, one, Z3))
    return X3, Y3, Z3, same


def _point_madd_kernel(x1_ref, y1_ref, z1_ref, x2_ref, y2_ref,
                       ox_ref, oy_ref, oz_ref, os_ref,
                       *, nl, p_limbs, nprime, one_limbs):
    mul = lambda a, b: _fq_mul_body(a, b, p_limbs, nprime)
    add = lambda a, b: _fq_add_body(a, b, p_limbs)
    sub = lambda a, b: _fq_sub_body(a, b, p_limbs)
    X1 = _read(x1_ref, nl); Y1 = _read(y1_ref, nl); Z1 = _read(z1_ref, nl)
    X2 = _read(x2_ref, nl); Y2 = _read(y2_ref, nl)
    one = [jnp.full_like(X1[0], jnp.uint32(v)) for v in one_limbs]
    X3, Y3, Z3, same = _madd_core(
        X1, Y1, Z1, X2, Y2, mul, add, sub, _fq_is_zero_body, _select_limbs,
        one)
    for j in range(nl):
        ox_ref[j, :] = X3[j]
        oy_ref[j, :] = Y3[j]
        oz_ref[j, :] = Z3[j]
    sm = same.astype(jnp.uint32)
    for j in range(os_ref.shape[0]):
        os_ref[j, :] = sm


def _point_madd_kernel2(x1_ref, y1_ref, z1_ref, x2_ref, y2_ref,
                        ox_ref, oy_ref, oz_ref, os_ref,
                        *, nl, p_limbs, nprime, one_limbs):
    mul = lambda a, b: _fq2_mul_body(a, b, p_limbs, nprime)
    add = lambda a, b: _fq2_add_body(a, b, p_limbs)
    sub = lambda a, b: _fq2_sub_body(a, b, p_limbs)
    X1 = _read2(x1_ref, nl); Y1 = _read2(y1_ref, nl); Z1 = _read2(z1_ref, nl)
    X2 = _read2(x2_ref, nl); Y2 = _read2(y2_ref, nl)
    zeros = [jnp.zeros_like(X1[0][0])] * nl
    one = ([jnp.full_like(X1[0][0], jnp.uint32(v)) for v in one_limbs],
           zeros)
    X3, Y3, Z3, same = _madd_core(
        X1, Y1, Z1, X2, Y2, mul, add, sub, _fq2_is_zero_body, _sel2, one)
    _write2(ox_ref, X3, nl)
    _write2(oy_ref, Y3, nl)
    _write2(oz_ref, Z3, nl)
    sm = same.astype(jnp.uint32)
    for j in range(os_ref.shape[0]):
        os_ref[j, :] = sm


@functools.lru_cache(maxsize=16)
def _madd_call(group: str, n: int, block: int, interpret: bool):
    spec = F.FQ
    nl = spec.nl
    one_limbs = tuple(int(x) for x in F._int_to_limbs(spec.r_mod_p, nl))
    common = dict(nl=nl, p_limbs=tuple(int(x) for x in spec.p_limbs),
                  nprime=spec.nprime, one_limbs=one_limbs)
    rows = nl if group == "g1" else 2 * nl
    kernel = functools.partial(
        _point_madd_kernel if group == "g1" else _point_madd_kernel2,
        **common)
    bs = pl.BlockSpec((rows, block), lambda i: (0, i),
                      memory_space=pltpu.ANY if interpret else pltpu.VMEM)
    bs_mask = pl.BlockSpec((8, block), lambda i: (0, i),
                           memory_space=pltpu.ANY if interpret else pltpu.VMEM)
    return jax.jit(pl.pallas_call(
        kernel,
        out_shape=tuple(jax.ShapeDtypeStruct((rows, n), jnp.uint32)
                        for _ in range(3))
        + (jax.ShapeDtypeStruct((8, n), jnp.uint32),),
        grid=(n // block,),
        in_specs=[bs] * 5,
        out_specs=(bs, bs, bs, bs_mask),
        interpret=interpret,
    ))


def point_madd_pallas(p, q_aff, block: int = 256, interpret: bool = None):
    """Fused G1 mixed add: p Jacobian, q affine (X, Y; (0,0) = infinity).

    Returns ((X3, Y3, Z3), same) where `same` is a (n,) bool mask of lanes
    that hit the p == q doubling case (their output is garbage, Z3 = 0);
    see curve_jax.point_madd for the fixup."""
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    n = p[0].shape[1]
    blk = min(block, 1 << max(7, (n - 1).bit_length()))
    npad = -(-n // blk) * blk
    args = [_pad_to(x, npad) for x in (*p, *q_aff)]
    ox, oy, oz, osm = _madd_call("g1", npad, blk, interpret)(*args)
    return (tuple(o[:, :n] for o in (ox, oy, oz)),
            osm[0, :n] != 0)


def point_madd_pallas_g2(p, q_aff, block: int = 256, interpret: bool = None):
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    n = p[0].shape[-1]
    blk = min(block, 1 << max(7, (n - 1).bit_length()))
    npad = -(-n // blk) * blk
    args = [_pad_to(_flat2(x), npad) for x in (*p, *q_aff)]
    ox, oy, oz, osm = _madd_call("g2", npad, blk, interpret)(*args)
    return (tuple(_unflat2(o)[..., :n] for o in (ox, oy, oz)),
            osm[0, :n] != 0)


# ---------------------------------------------------------------------------
# Fused MSM bucket-accumulation scan (the Pippenger phase-1 workhorse)
# ---------------------------------------------------------------------------
#
# One kernel runs the whole in-chunk segmented scan: points arrive sorted by
# bucket and reshaped (K, rows, M) — lane m's chunk is sorted[m*K .. m*K+K-1]
# along the leading K axis — and the kernel walks t = 0..K-1 with the mixed
# add, keeping the accumulator in VMEM the whole time.  This replaces an XLA
# fori_loop whose every step launched a separate madd kernel and round-
# tripped the accumulator through HBM (the dominant cost of the round-1 MSM).
#
# Contract (same as point_madd_pallas): a lane whose madd hits the doubling-
# degenerate case (acc == cur, both finite) produces garbage and raises the
# collision flag; the caller falls back to the safe log-depth path under a
# lax.cond.  For MSM over a CRS this is cryptographically negligible, so the
# hot path stays at 11 muls per point.

def _seg_scan_kernel(seg_ref, segp_ref, xs_ref, ys_ref,
                     ox_ref, oy_ref, oz_ref, fl_ref, acc_ref,
                     *, fq2, nl, p_limbs, nprime, one_limbs):
    """One grid step (lane-block i, chunk position t): mixed-add the
    accumulator (VMEM scratch, persisting across the sequential t axis)
    with the current point, resetting at segment starts.

    acc_ref rows: [0, 3*rows) = accumulator X/Y/Z limbs, row 3*rows =
    collision flag."""
    t = pl.program_id(1)
    if fq2:
        mul = lambda a, b: _fq2_mul_body(a, b, p_limbs, nprime)
        add = lambda a, b: _fq2_add_body(a, b, p_limbs)
        sub = lambda a, b: _fq2_sub_body(a, b, p_limbs)
        is_zero, sel = _fq2_is_zero_body, _sel2
        n_rows = 2 * nl
        read = lambda ref3: ([ref3[0, j, :] for j in range(nl)],
                             [ref3[0, nl + j, :] for j in range(nl)])
        read_acc = lambda off: ([acc_ref[off + j, :] for j in range(nl)],
                                [acc_ref[off + nl + j, :] for j in range(nl)])
        flat = lambda x: list(x[0]) + list(x[1])
    else:
        mul = lambda a, b: _fq_mul_body(a, b, p_limbs, nprime)
        add = lambda a, b: _fq_add_body(a, b, p_limbs)
        sub = lambda a, b: _fq_sub_body(a, b, p_limbs)
        is_zero, sel = _fq_is_zero_body, _select_limbs
        n_rows = nl
        read = lambda ref3: [ref3[0, j, :] for j in range(nl)]
        read_acc = lambda off: [acc_ref[off + j, :] for j in range(nl)]
        flat = lambda x: list(x)

    CX = read(xs_ref)
    CY = read(ys_ref)
    lane0 = CX[0][0] if fq2 else CX[0]
    one_fq = [jnp.full_like(lane0, jnp.uint32(v)) for v in one_limbs]
    zeros_fq = [jnp.zeros_like(lane0)] * nl
    one = (one_fq, zeros_fq) if fq2 else one_fq
    zero_pt = (zeros_fq, zeros_fq) if fq2 else zeros_fq

    cinf = is_zero(CX) & is_zero(CY)
    CZ = sel(cinf, zero_pt, one)  # affine (0,0) marker -> Z = 0

    accX = read_acc(0)
    accY = read_acc(n_rows)
    accZ = read_acc(2 * n_rows)
    X3, Y3, Z3, col = _madd_core(
        accX, accY, accZ, CX, CY, mul, add, sub, is_zero, sel, one)

    same_seg = (seg_ref[0, 0, :] == segp_ref[0, 0, :]) & (t > 0)
    X3 = sel(same_seg, X3, CX)
    Y3 = sel(same_seg, Y3, CY)
    Z3 = sel(same_seg, Z3, CZ)
    flag_prev = jnp.where(t > 0, acc_ref[3 * n_rows, :], jnp.uint32(0))
    flag = flag_prev | (col & same_seg).astype(jnp.uint32)

    fX, fY, fZ = flat(X3), flat(Y3), flat(Z3)
    for j in range(n_rows):
        acc_ref[j, :] = fX[j]
        acc_ref[n_rows + j, :] = fY[j]
        acc_ref[2 * n_rows + j, :] = fZ[j]
        ox_ref[0, j, :] = fX[j]
        oy_ref[0, j, :] = fY[j]
        oz_ref[0, j, :] = fZ[j]
    acc_ref[3 * n_rows, :] = flag
    for j in range(fl_ref.shape[0]):
        fl_ref[j, :] = flag


@functools.lru_cache(maxsize=16)
def _seg_scan_call(group: str, K: int, m: int, block: int, interpret: bool):
    spec = F.FQ
    nl = spec.nl
    fq2 = group == "g2"
    rows = 2 * nl if fq2 else nl
    one_limbs = tuple(int(x) for x in F._int_to_limbs(spec.r_mod_p, nl))
    kernel = functools.partial(
        _seg_scan_kernel, fq2=fq2, nl=nl,
        p_limbs=tuple(int(x) for x in spec.p_limbs), nprime=spec.nprime,
        one_limbs=one_limbs)
    bs3 = pl.BlockSpec((1, rows, block), lambda i, t: (t, 0, i),
                       memory_space=pl.ANY if interpret else pltpu.VMEM)
    bs_seg = pl.BlockSpec((1, 1, block), lambda i, t: (t, 0, i),
                          memory_space=pl.ANY if interpret else pltpu.VMEM)
    bs_fl = pl.BlockSpec((8, block), lambda i, t: (0, i),
                         memory_space=pl.ANY if interpret else pltpu.VMEM)
    return jax.jit(pl.pallas_call(
        kernel,
        out_shape=tuple(jax.ShapeDtypeStruct((K, rows, m), jnp.uint32)
                        for _ in range(3))
        + (jax.ShapeDtypeStruct((8, m), jnp.uint32),),
        grid=(m // block, K),
        in_specs=[bs_seg, bs_seg, bs3, bs3],
        out_specs=(bs3, bs3, bs3, bs_fl),
        scratch_shapes=[pltpu.VMEM((3 * rows + 1, block), jnp.uint32)],
        interpret=interpret,
    ))


def bucket_scan_pallas(pts_sorted, seg_sorted, K: int, group: str = "g1",
                       block: int = None, interpret: bool = None):
    """In-chunk segmented scan over sorted affine points.

    pts_sorted: (X, Y) affine, coordinates (nl, N) for G1 / (2, nl, N) for
    G2, already in bucket-sorted order; seg_sorted: (N,) int32 bucket ids.
    N must be a multiple of K.

    Returns (scanned (X, Y, Z) in the same flat layout, collided (N/K,)
    bool per-lane flag).  scanned[.., i] is the inclusive segmented prefix
    sum of chunk i//K up to position i%K; lanes that hit the doubling-
    degenerate mixed add are garbage and flagged."""
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    if block is None:
        block = 2048 if group == "g1" else 1024
    n = seg_sorted.shape[0]
    assert n % K == 0
    m = n // K

    def to3(x):
        # (rows, N) -> (K, rows, M): [t, :, lane] = sorted[lane*K + t]
        rows = x.shape[0]
        return x.reshape(rows, m, K).transpose(2, 0, 1)

    xs = to3(_flat2(pts_sorted[0]) if group == "g2" else pts_sorted[0])
    ys = to3(_flat2(pts_sorted[1]) if group == "g2" else pts_sorted[1])
    seg3 = seg_sorted.reshape(m, K).T[:, None, :]  # (K, 1, M)
    # segp[t] = seg[t-1] (t = 0 row is unused: the kernel masks with t > 0)
    segp = jnp.concatenate([seg3[:1], seg3[:-1]], axis=0)

    blk = min(block, 1 << max(7, (m - 1).bit_length()))
    mpad = -(-m // blk) * blk
    if mpad != m:
        pad3 = ((0, 0), (0, 0), (0, mpad - m))
        xs = jnp.pad(xs, pad3)
        ys = jnp.pad(ys, pad3)
        seg3 = jnp.pad(seg3, ((0, 0), (0, 0), (0, mpad - m)))
        segp = jnp.pad(segp, ((0, 0), (0, 0), (0, mpad - m)))

    ox, oy, oz, fl = _seg_scan_call(group, K, mpad, blk, interpret)(
        seg3, segp, xs, ys)

    def back(o):
        # (K, rows, Mpad) -> (rows, N)
        o = o[:, :, :m].transpose(1, 2, 0).reshape(o.shape[1], n)
        return _unflat2(o) if group == "g2" else o

    return (back(ox), back(oy), back(oz)), fl[0, :m] != 0


# ---------------------------------------------------------------------------
# Fused unsegmented Jacobian prefix scan (bucket-reduction workhorse)
# ---------------------------------------------------------------------------
#
# Same chunked layout as bucket_scan_pallas but with the full Jacobian add
# (all special cases resolved in-formula, no flag needed): used for the
# suffix sums of the weighted bucket reduction.

def _jac_scan_kernel(*refs, segmented, fq2, nl, p_limbs, nprime):
    """One grid step of the Jacobian prefix scan: add the current point
    into the VMEM-resident accumulator (full group law, all special
    cases).  In segmented mode the accumulator resets at segment starts
    (refs gain leading seg/segp blocks)."""
    if segmented:
        seg_ref, segp_ref, xs_ref, ys_ref, zs_ref = refs[:5]
        ox_ref, oy_ref, oz_ref, acc_ref = refs[5:]
    else:
        xs_ref, ys_ref, zs_ref, ox_ref, oy_ref, oz_ref, acc_ref = refs
    t = pl.program_id(1)
    if fq2:
        mul = lambda a, b: _fq2_mul_body(a, b, p_limbs, nprime)
        add = lambda a, b: _fq2_add_body(a, b, p_limbs)
        sub = lambda a, b: _fq2_sub_body(a, b, p_limbs)
        is_zero, sel = _fq2_is_zero_body, _sel2
        dbl = lambda X, Y, Z: _double_body2(X, Y, Z, p_limbs, nprime)
        n_rows = 2 * nl
        read = lambda ref3: ([ref3[0, j, :] for j in range(nl)],
                             [ref3[0, nl + j, :] for j in range(nl)])
        read_acc = lambda off: ([acc_ref[off + j, :] for j in range(nl)],
                                [acc_ref[off + nl + j, :] for j in range(nl)])
        flat = lambda x: list(x[0]) + list(x[1])
    else:
        mul = lambda a, b: _fq_mul_body(a, b, p_limbs, nprime)
        add = lambda a, b: _fq_add_body(a, b, p_limbs)
        sub = lambda a, b: _fq_sub_body(a, b, p_limbs)
        is_zero, sel = _fq_is_zero_body, _select_limbs
        dbl = lambda X, Y, Z: _double_body(X, Y, Z, p_limbs, nprime)
        n_rows = nl
        read = lambda ref3: [ref3[0, j, :] for j in range(nl)]
        read_acc = lambda off: [acc_ref[off + j, :] for j in range(nl)]
        flat = lambda x: list(x)

    def padd(P, Q):
        X1, Y1, Z1 = P
        X2, Y2, Z2 = Q
        Z1Z1 = mul(Z1, Z1)
        Z2Z2 = mul(Z2, Z2)
        U1 = mul(X1, Z2Z2)
        U2 = mul(X2, Z1Z1)
        S1 = mul(mul(Y1, Z2), Z2Z2)
        S2 = mul(mul(Y2, Z1), Z1Z1)
        H = sub(U2, U1)
        r = sub(S2, S1)
        H2 = add(H, H)
        I = mul(H2, H2)
        J = mul(H, I)
        r2 = add(r, r)
        V = mul(U1, I)
        X3 = sub(sub(mul(r2, r2), J), add(V, V))
        S1J = mul(S1, J)
        Y3 = sub(mul(r2, sub(V, X3)), add(S1J, S1J))
        Zs = mul(add(Z1, Z2), add(Z1, Z2))
        Z3 = mul(sub(sub(Zs, Z1Z1), Z2Z2), H)
        p_inf = is_zero(Z1)
        q_inf = is_zero(Z2)
        same = is_zero(H) & is_zero(r) & ~p_inf & ~q_inf
        dX, dY, dZ = dbl(X1, Y1, Z1)
        X3 = sel(same, dX, X3)
        Y3 = sel(same, dY, Y3)
        Z3 = sel(same, dZ, Z3)
        X3 = sel(q_inf, X1, sel(p_inf, X2, X3))
        Y3 = sel(q_inf, Y1, sel(p_inf, Y2, Y3))
        Z3 = sel(q_inf, Z1, sel(p_inf, Z2, Z3))
        return X3, Y3, Z3

    CX = read(xs_ref)
    CY = read(ys_ref)
    CZ = read(zs_ref)
    accX = read_acc(0)
    accY = read_acc(n_rows)
    accZ = read_acc(2 * n_rows)
    X3, Y3, Z3 = padd((accX, accY, accZ), (CX, CY, CZ))
    if segmented:
        cont = (seg_ref[0, 0, :] == segp_ref[0, 0, :]) & (t > 0)
        X3 = sel(cont, X3, CX)
        Y3 = sel(cont, Y3, CY)
        Z3 = sel(cont, Z3, CZ)
    else:
        first = t == 0
        X3 = sel(first, CX, X3)
        Y3 = sel(first, CY, Y3)
        Z3 = sel(first, CZ, Z3)
    fX, fY, fZ = flat(X3), flat(Y3), flat(Z3)
    for j in range(n_rows):
        acc_ref[j, :] = fX[j]
        acc_ref[n_rows + j, :] = fY[j]
        acc_ref[2 * n_rows + j, :] = fZ[j]
        ox_ref[0, j, :] = fX[j]
        oy_ref[0, j, :] = fY[j]
        oz_ref[0, j, :] = fZ[j]


@functools.lru_cache(maxsize=32)
def _jac_scan_call(group: str, K: int, m: int, block: int, interpret: bool,
                   segmented: bool = False):
    spec = F.FQ
    nl = spec.nl
    fq2 = group == "g2"
    rows = 2 * nl if fq2 else nl
    kernel = functools.partial(
        _jac_scan_kernel, segmented=segmented, fq2=fq2, nl=nl,
        p_limbs=tuple(int(x) for x in spec.p_limbs), nprime=spec.nprime)
    bs3 = pl.BlockSpec((1, rows, block), lambda i, t: (t, 0, i),
                       memory_space=pl.ANY if interpret else pltpu.VMEM)
    bs_seg = pl.BlockSpec((1, 1, block), lambda i, t: (t, 0, i),
                          memory_space=pl.ANY if interpret else pltpu.VMEM)
    return jax.jit(pl.pallas_call(
        kernel,
        out_shape=tuple(jax.ShapeDtypeStruct((K, rows, m), jnp.uint32)
                        for _ in range(3)),
        grid=(m // block, K),
        in_specs=([bs_seg, bs_seg] if segmented else []) + [bs3, bs3, bs3],
        out_specs=(bs3, bs3, bs3),
        scratch_shapes=[pltpu.VMEM((3 * rows, block), jnp.uint32)],
        interpret=interpret,
    ))


def jac_scan_pallas(points, K: int, group: str = "g1",
                    block: int = None, interpret: bool = None,
                    seg: jnp.ndarray = None):
    """Per-chunk inclusive prefix scan of Jacobian points: lane i's chunk is
    points[i*K .. i*K+K-1]; returns scanned points in the same flat layout.
    All group-law special cases handled (safe for arbitrary inputs).

    With `seg` (an (N,) int32 of sorted segment ids) the scan restarts at
    every in-chunk segment boundary (the cross-chunk carry utility in
    ops.msm composes chunk-level results)."""
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    if block is None:
        block = 2048 if group == "g1" else 1024
    n = points[0].shape[-1]
    assert n % K == 0
    m = n // K

    def to3(x):
        rows = x.shape[0]
        return x.reshape(rows, m, K).transpose(2, 0, 1)

    flat_in = [(_flat2(x) if group == "g2" else x) for x in points]
    xs, ys, zs = (to3(x) for x in flat_in)
    blk = min(block, 1 << max(7, (m - 1).bit_length()))
    mpad = -(-m // blk) * blk
    if mpad != m:
        pad3 = ((0, 0), (0, 0), (0, mpad - m))
        xs, ys, zs = (jnp.pad(v, pad3) for v in (xs, ys, zs))

    if seg is None:
        ox, oy, oz = _jac_scan_call(group, K, mpad, blk, interpret)(
            xs, ys, zs)
    else:
        seg3 = seg.reshape(m, K).T[:, None, :]  # (K, 1, M)
        segp = jnp.concatenate([seg3[:1], seg3[:-1]], axis=0)
        if mpad != m:
            seg3 = jnp.pad(seg3, ((0, 0), (0, 0), (0, mpad - m)))
            segp = jnp.pad(segp, ((0, 0), (0, 0), (0, mpad - m)))
        ox, oy, oz = _jac_scan_call(group, K, mpad, blk, interpret,
                                    segmented=True)(seg3, segp, xs, ys, zs)

    def back(o):
        o = o[:, :, :m].transpose(1, 2, 0).reshape(o.shape[1], n)
        return _unflat2(o) if group == "g2" else o

    return back(ox), back(oy), back(oz)


# ---------------------------------------------------------------------------
# Bitonic (key, value) sort — the Pippenger digit sort at VMEM speed
# ---------------------------------------------------------------------------
#
# XLA's TPU sort runs ~10M elems/s; at 2^18+ terms it dominates every MSM
# window.  This kernel keeps the whole (key, value) problem VMEM-resident
# in an (N/128, 128) row-major layout where every bitonic exchange
# distance d is a cheap roll: partners at d < 128 live in the same row
# (blocks of 2d <= 128 never straddle rows, so an in-row circular roll is
# exact), partners at d >= 128 are whole-row shifts.
#
# Chunks of up to 2^LOG_CHUNK elements sort in one grid step; larger
# arrays sort chunk-locally, then the caller runs the O(log^2) cross-chunk
# exchange passes in XLA and per-chunk merge kernels (see
# bitonic_sort_pairs).

_LOG_CHUNK = 16


def _bitonic_pass(k, v, i_global, s, d):
    """One compare-exchange pass at distance d inside stage s (block 2^(s+1)),
    on (R, 128) row-major arrays."""
    has = (i_global & d) != 0
    up = ((i_global >> (s + 1)) & 1) == 0  # ascending block
    if d < 128:
        fwd = pltpu.roll(k, d, axis=1)            # [i] <- [i - d]
        bwd = pltpu.roll(k, 128 - d, axis=1)      # [i] <- [i + d]
        vfwd = pltpu.roll(v, d, axis=1)
        vbwd = pltpu.roll(v, 128 - d, axis=1)
    else:
        r = d // 128
        rows = k.shape[0]
        fwd = pltpu.roll(k, r, axis=0)
        bwd = pltpu.roll(k, rows - r, axis=0)
        vfwd = pltpu.roll(v, r, axis=0)
        vbwd = pltpu.roll(v, rows - r, axis=0)
    other_k = jnp.where(has, fwd, bwd)
    other_v = jnp.where(has, vfwd, vbwd)
    take_min = up != has  # lower slot of an ascending block keeps the min
    # signed compares only: Mosaic has no vector minui/maxui (keys < 2^31)
    own_lt = k < other_k
    take_own = take_min == own_lt  # ties: takes own (own_lt False, max slot)
    take_own = take_own | (k == other_k)
    new_k = jnp.where(take_own, k, other_k)
    new_v = jnp.where(take_own, v, other_v)
    return new_k, new_v


def _bitonic_kernel(k_ref, v_ref, ok_ref, ov_ref, *, log_chunk, phase_s):
    """phase_s is None: full bitonic sort of the chunk (stages 0..log_chunk-1).
    phase_s = s: the within-chunk tail of global stage s (passes at
    d = 2^(log_chunk-1) .. 1), after the caller ran the cross-chunk passes."""
    rows = 1 << (log_chunk - 7)
    chunk = pl.program_id(0)
    row_id = jax.lax.broadcasted_iota(jnp.int32, (rows, 128), 0)
    lane_id = jax.lax.broadcasted_iota(jnp.int32, (rows, 128), 1)
    i_global = row_id * 128 + lane_id + chunk * (1 << log_chunk)
    k = k_ref[...]
    v = v_ref[...]
    if phase_s is None:
        for s in range(log_chunk):
            for p in range(s, -1, -1):
                k, v = _bitonic_pass(k, v, i_global, s, 1 << p)
    else:
        for p in range(log_chunk - 1, -1, -1):
            k, v = _bitonic_pass(k, v, i_global, phase_s, 1 << p)
    ok_ref[...] = k
    ov_ref[...] = v


@functools.lru_cache(maxsize=32)
def _bitonic_call(logn: int, log_chunk: int, phase_s, interpret: bool):
    rows_total = 1 << (logn - 7)
    rows_chunk = 1 << (log_chunk - 7)
    kernel = functools.partial(_bitonic_kernel, log_chunk=log_chunk,
                               phase_s=phase_s)
    bs = pl.BlockSpec((rows_chunk, 128), lambda i: (i, 0),
                      memory_space=pl.ANY if interpret else pltpu.VMEM)
    return jax.jit(pl.pallas_call(
        kernel,
        out_shape=tuple(jax.ShapeDtypeStruct((rows_total, 128), jnp.int32)
                        for _ in range(2)),
        grid=(rows_total // rows_chunk,),
        in_specs=[bs, bs],
        out_specs=(bs, bs),
        input_output_aliases={0: 0, 1: 1},
        interpret=interpret,
    ))


def _bitonic_cross_pass(k, v, s, d, n):
    """Cross-chunk compare-exchange in XLA on flat (n,) arrays."""
    i = jnp.arange(n, dtype=jnp.int32)
    has = (i & d) != 0
    up = ((i >> (s + 1)) & 1) == 0
    other_k = jnp.where(has, jnp.roll(k, d), jnp.roll(k, -d))
    other_v = jnp.where(has, jnp.roll(v, d), jnp.roll(v, -d))
    take_min = up != has
    take_own = (take_min == (k < other_k)) | (k == other_k)
    new_k = jnp.where(take_own, k, other_k)
    new_v = jnp.where(take_own, v, other_v)
    return new_k, new_v


def bitonic_sort_pairs(keys: jnp.ndarray, values: jnp.ndarray,
                       interpret: bool = None):
    """Sort (keys, values) pairs by key ascending (unstable; ties keep
    both values).  Keys must be < 2^31 (compares are signed: Mosaic has no
    vector unsigned min); pads to a power of two with int32-max keys.
    Returns (sorted_keys, permuted_values) of the original length."""
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    n0 = keys.shape[0]
    logn = max(8, (n0 - 1).bit_length())
    n = 1 << logn
    if n != n0:
        keys = jnp.pad(keys, (0, n - n0), constant_values=0x7FFFFFFF)
        values = jnp.pad(values, (0, n - n0))
    keys = keys.astype(jnp.int32)
    values = values.astype(jnp.int32)
    log_chunk = min(logn, _LOG_CHUNK)
    k2 = keys.reshape(-1, 128)
    v2 = values.reshape(-1, 128)
    k2, v2 = _bitonic_call(logn, log_chunk, None, interpret)(k2, v2)
    if logn > log_chunk:
        k = k2.reshape(n)
        v = v2.reshape(n)
        for s in range(log_chunk, logn):
            for p in range(s, log_chunk - 1, -1):
                k, v = _bitonic_cross_pass(k, v, s, 1 << p, n)
            k2, v2 = _bitonic_call(logn, log_chunk, s, interpret)(
                k.reshape(-1, 128), v.reshape(-1, 128))
            k = k2.reshape(n)
            v = v2.reshape(n)
        k2, v2 = k.reshape(-1, 128), v.reshape(-1, 128)
    return k2.reshape(n)[:n0], v2.reshape(n)[:n0]


def bitonic_argsort(keys: jnp.ndarray, interpret: bool = None):
    """argsort by u32 key: returns (sorted_keys, order) — a drop-in for
    (d[argsort(d)], argsort(d)) at VMEM speed."""
    n = keys.shape[0]
    sk, order = bitonic_sort_pairs(
        keys, jnp.arange(n, dtype=jnp.int32), interpret=interpret)
    return sk, order


# ---------------------------------------------------------------------------
# Row-layout bucket scan + single-pass weighted chunk sums (v2 MSM window)
# ---------------------------------------------------------------------------
#
# The v2 window pipeline (ops.msm._window_v2) feeds points as ONE stacked
# row block per element — [X limbs; Y limbs] for G1, [X.c0; X.c1; Y.c0;
# Y.c1] for G2 — prepared by a row-major gather (cheap on TPU, unlike
# column gathers), already sign-applied.  This kernel is bucket_scan with a
# single fused input ref.

def _seg_scan_kernel2(seg_ref, segp_ref, pts_ref, ox_ref, oy_ref, oz_ref,
                      fl_ref, acc_ref, *, fq2, nl, p_limbs, nprime,
                      one_limbs):
    t = pl.program_id(1)
    if fq2:
        mul = lambda a, b: _fq2_mul_body(a, b, p_limbs, nprime)
        add = lambda a, b: _fq2_add_body(a, b, p_limbs)
        sub = lambda a, b: _fq2_sub_body(a, b, p_limbs)
        is_zero, sel = _fq2_is_zero_body, _sel2
        n_rows = 2 * nl
        readp = lambda off: ([pts_ref[0, off + j, :] for j in range(nl)],
                             [pts_ref[0, off + nl + j, :] for j in range(nl)])
        read_acc = lambda off: ([acc_ref[off + j, :] for j in range(nl)],
                                [acc_ref[off + nl + j, :] for j in range(nl)])
        flat = lambda x: list(x[0]) + list(x[1])
    else:
        mul = lambda a, b: _fq_mul_body(a, b, p_limbs, nprime)
        add = lambda a, b: _fq_add_body(a, b, p_limbs)
        sub = lambda a, b: _fq_sub_body(a, b, p_limbs)
        is_zero, sel = _fq_is_zero_body, _select_limbs
        n_rows = nl
        readp = lambda off: [pts_ref[0, off + j, :] for j in range(nl)]
        read_acc = lambda off: [acc_ref[off + j, :] for j in range(nl)]
        flat = lambda x: list(x)

    CX = readp(0)
    CY = readp(n_rows)
    lane0 = CX[0][0] if fq2 else CX[0]
    one_fq = [jnp.full_like(lane0, jnp.uint32(v)) for v in one_limbs]
    zeros_fq = [jnp.zeros_like(lane0)] * nl
    one = (one_fq, zeros_fq) if fq2 else one_fq
    zero_pt = (zeros_fq, zeros_fq) if fq2 else zeros_fq
    cinf = is_zero(CX) & is_zero(CY)
    CZ = sel(cinf, zero_pt, one)

    accX = read_acc(0)
    accY = read_acc(n_rows)
    accZ = read_acc(2 * n_rows)
    X3, Y3, Z3, col = _madd_core(
        accX, accY, accZ, CX, CY, mul, add, sub, is_zero, sel, one)
    same_seg = (seg_ref[0, 0, :] == segp_ref[0, 0, :]) & (t > 0)
    X3 = sel(same_seg, X3, CX)
    Y3 = sel(same_seg, Y3, CY)
    Z3 = sel(same_seg, Z3, CZ)
    flag_prev = jnp.where(t > 0, acc_ref[3 * n_rows, :], jnp.uint32(0))
    flag = flag_prev | (col & same_seg).astype(jnp.uint32)

    fX, fY, fZ = flat(X3), flat(Y3), flat(Z3)
    for j in range(n_rows):
        acc_ref[j, :] = fX[j]
        acc_ref[n_rows + j, :] = fY[j]
        acc_ref[2 * n_rows + j, :] = fZ[j]
        ox_ref[0, j, :] = fX[j]
        oy_ref[0, j, :] = fY[j]
        oz_ref[0, j, :] = fZ[j]
    acc_ref[3 * n_rows, :] = flag
    for j in range(fl_ref.shape[0]):
        fl_ref[j, :] = flag


@functools.lru_cache(maxsize=16)
def _seg_scan2_call(group: str, K: int, m: int, block: int, interpret: bool,
                    tails_only: bool = False):
    """tails_only=True maps every t to output block 0 (each grid step
    overwrites; the t = K-1 write survives), so only the final chunk
    accumulators reach HBM — (1, rows, m) instead of (K, rows, m).  The
    fixed-base path needs this: its K = W row stream at 2^21 elements
    would otherwise write ~19 GB of intermediate prefixes."""
    spec = F.FQ
    nl = spec.nl
    fq2 = group == "g2"
    rows = 2 * nl if fq2 else nl
    one_limbs = tuple(int(x) for x in F._int_to_limbs(spec.r_mod_p, nl))
    kernel = functools.partial(
        _seg_scan_kernel2, fq2=fq2, nl=nl,
        p_limbs=tuple(int(x) for x in spec.p_limbs), nprime=spec.nprime,
        one_limbs=one_limbs)
    bs_pts = pl.BlockSpec((1, 2 * rows, block), lambda i, t: (t, 0, i),
                          memory_space=pl.ANY if interpret else pltpu.VMEM)
    if tails_only:
        k_out = 1
        bs3 = pl.BlockSpec((1, rows, block), lambda i, t: (0, 0, i),
                           memory_space=pl.ANY if interpret else pltpu.VMEM)
    else:
        k_out = K
        bs3 = pl.BlockSpec((1, rows, block), lambda i, t: (t, 0, i),
                           memory_space=pl.ANY if interpret else pltpu.VMEM)
    bs_seg = pl.BlockSpec((1, 1, block), lambda i, t: (t, 0, i),
                          memory_space=pl.ANY if interpret else pltpu.VMEM)
    bs_fl = pl.BlockSpec((8, block), lambda i, t: (0, i),
                         memory_space=pl.ANY if interpret else pltpu.VMEM)
    return jax.jit(pl.pallas_call(
        kernel,
        out_shape=tuple(jax.ShapeDtypeStruct((k_out, rows, m), jnp.uint32)
                        for _ in range(3))
        + (jax.ShapeDtypeStruct((8, m), jnp.uint32),),
        grid=(m // block, K),
        in_specs=[bs_seg, bs_seg, bs_pts],
        out_specs=(bs3, bs3, bs3, bs_fl),
        scratch_shapes=[pltpu.VMEM((3 * rows + 1, block), jnp.uint32)],
        interpret=interpret,
    ))


def bucket_scan_rows(pts3: jnp.ndarray, seg3: jnp.ndarray,
                     segp3: jnp.ndarray, group: str = "g1",
                     block: int = None, interpret: bool = None,
                     tails_only: bool = False):
    """Segmented mixed-add scan over pre-laid-out inputs: pts3 is
    (K, 2*rows, M) stacked [X; Y] rows (sign-applied, (0,0) = infinity),
    seg3/segp3 are (K, 1, M).  Returns ((K, rows, M) X/Y/Z scanned,
    (M,) collision flags); with tails_only the scanned arrays are
    (1, rows, M) holding only each chunk's final accumulator."""
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    if block is None:
        block = 2048 if group == "g1" else 1024
    K, rows2, m = pts3.shape
    blk = min(block, 1 << max(7, (m - 1).bit_length()))
    mpad = -(-m // blk) * blk
    if mpad != m:
        pts3 = jnp.pad(pts3, ((0, 0), (0, 0), (0, mpad - m)))
        seg3 = jnp.pad(seg3, ((0, 0), (0, 0), (0, mpad - m)))
        segp3 = jnp.pad(segp3, ((0, 0), (0, 0), (0, mpad - m)))
    ox, oy, oz, fl = _seg_scan2_call(group, K, mpad, blk, interpret,
                                     tails_only)(seg3, segp3, pts3)
    return ((ox[..., :m], oy[..., :m], oz[..., :m]), fl[0, :m] != 0)


# ---------------------------------------------------------------------------
# Single-pass weighted chunk sums:  per chunk m of K Jacobian points,
# computes  s_m = sum_t v_t  and  w_m = sum_t t * v_t  (local weights) in
# one reversed scan:  sum_t t*v_t = sum_{u>=1} suffix_u.
# ---------------------------------------------------------------------------

def _wsum_kernel(pts_ref, os_ref, ow_ref, acc_ref, *, K, fq2, nl, p_limbs,
                 nprime):
    t = pl.program_id(1)  # processes element u = K-1-t (reversed index map)
    if fq2:
        mul = lambda a, b: _fq2_mul_body(a, b, p_limbs, nprime)
        add = lambda a, b: _fq2_add_body(a, b, p_limbs)
        sub = lambda a, b: _fq2_sub_body(a, b, p_limbs)
        is_zero, sel = _fq2_is_zero_body, _sel2
        dbl = lambda X, Y, Z: _double_body2(X, Y, Z, p_limbs, nprime)
        n_rows = 2 * nl
        readp = lambda off: ([pts_ref[0, off + j, :] for j in range(nl)],
                             [pts_ref[0, off + nl + j, :] for j in range(nl)])
        read_acc = lambda off: ([acc_ref[off + j, :] for j in range(nl)],
                                [acc_ref[off + nl + j, :] for j in range(nl)])
        flat = lambda x: list(x[0]) + list(x[1])
    else:
        mul = lambda a, b: _fq_mul_body(a, b, p_limbs, nprime)
        add = lambda a, b: _fq_add_body(a, b, p_limbs)
        sub = lambda a, b: _fq_sub_body(a, b, p_limbs)
        is_zero, sel = _fq_is_zero_body, _select_limbs
        dbl = lambda X, Y, Z: _double_body(X, Y, Z, p_limbs, nprime)
        n_rows = nl
        readp = lambda off: [pts_ref[0, off + j, :] for j in range(nl)]
        read_acc = lambda off: [acc_ref[off + j, :] for j in range(nl)]
        flat = lambda x: list(x)

    def padd(P, Q):
        X1, Y1, Z1 = P
        X2, Y2, Z2 = Q
        Z1Z1 = mul(Z1, Z1)
        Z2Z2 = mul(Z2, Z2)
        U1 = mul(X1, Z2Z2)
        U2 = mul(X2, Z1Z1)
        S1 = mul(mul(Y1, Z2), Z2Z2)
        S2 = mul(mul(Y2, Z1), Z1Z1)
        H = sub(U2, U1)
        r = sub(S2, S1)
        H2 = add(H, H)
        I = mul(H2, H2)
        J = mul(H, I)
        r2 = add(r, r)
        V = mul(U1, I)
        X3 = sub(sub(mul(r2, r2), J), add(V, V))
        S1J = mul(S1, J)
        Y3 = sub(mul(r2, sub(V, X3)), add(S1J, S1J))
        Zs = mul(add(Z1, Z2), add(Z1, Z2))
        Z3 = mul(sub(sub(Zs, Z1Z1), Z2Z2), H)
        p_inf = is_zero(Z1)
        q_inf = is_zero(Z2)
        same = is_zero(H) & is_zero(r) & ~p_inf & ~q_inf
        dX, dY, dZ = dbl(X1, Y1, Z1)
        X3 = sel(same, dX, X3)
        Y3 = sel(same, dY, Y3)
        Z3 = sel(same, dZ, Z3)
        X3 = sel(q_inf, X1, sel(p_inf, X2, X3))
        Y3 = sel(q_inf, Y1, sel(p_inf, Y2, Y3))
        Z3 = sel(q_inf, Z1, sel(p_inf, Z2, Z3))
        return X3, Y3, Z3

    V = (readp(0), readp(n_rows), readp(2 * n_rows))
    first = t == 0
    sX = read_acc(0)
    sY = read_acc(n_rows)
    sZ = read_acc(2 * n_rows)
    aX, aY, aZ = padd((sX, sY, sZ), V)
    sX = sel(first, V[0], aX)
    sY = sel(first, V[1], aY)
    sZ = sel(first, V[2], aZ)
    # w += s after processing u = K-1-t, for u >= 1 (t <= K-2)
    wX = read_acc(3 * n_rows)
    wY = read_acc(4 * n_rows)
    wZ = read_acc(5 * n_rows)
    zeros = ([jnp.zeros_like(x) for x in flat(sX)[:n_rows]])
    rz = lambda rows_list: (([rows_list[j] for j in range(nl)],
                             [rows_list[nl + j] for j in range(nl)])
                            if fq2 else rows_list)
    wX = sel(first, rz(zeros), wX)
    wY = sel(first, rz(zeros), wY)
    wZ = sel(first, rz(zeros), wZ)  # Z = 0: infinity
    bX, bY, bZ = padd((wX, wY, wZ), (sX, sY, sZ))
    last = t == K - 1
    wX = sel(last, wX, bX)
    wY = sel(last, wY, bY)
    wZ = sel(last, wZ, bZ)

    fsX, fsY, fsZ = flat(sX), flat(sY), flat(sZ)
    fwX, fwY, fwZ = flat(wX), flat(wY), flat(wZ)
    for j in range(n_rows):
        acc_ref[j, :] = fsX[j]
        acc_ref[n_rows + j, :] = fsY[j]
        acc_ref[2 * n_rows + j, :] = fsZ[j]
        acc_ref[3 * n_rows + j, :] = fwX[j]
        acc_ref[4 * n_rows + j, :] = fwY[j]
        acc_ref[5 * n_rows + j, :] = fwZ[j]
        os_ref[0, j, :] = fsX[j]
        os_ref[0, n_rows + j, :] = fsY[j]
        os_ref[0, 2 * n_rows + j, :] = fsZ[j]
        ow_ref[0, j, :] = fwX[j]
        ow_ref[0, n_rows + j, :] = fwY[j]
        ow_ref[0, 2 * n_rows + j, :] = fwZ[j]


@functools.lru_cache(maxsize=16)
def _wsum_call(group: str, K: int, m: int, block: int, interpret: bool):
    spec = F.FQ
    nl = spec.nl
    fq2 = group == "g2"
    rows = 2 * nl if fq2 else nl
    kernel = functools.partial(
        _wsum_kernel, K=K, fq2=fq2, nl=nl,
        p_limbs=tuple(int(x) for x in spec.p_limbs), nprime=spec.nprime)
    # reversed index map: grid step t reads chunk element K-1-t
    bs_in = pl.BlockSpec((1, 3 * rows, block), lambda i, t: (K - 1 - t, 0, i),
                         memory_space=pl.ANY if interpret else pltpu.VMEM)
    bs_out = pl.BlockSpec((1, 3 * rows, block), lambda i, t: (0, 0, i),
                          memory_space=pl.ANY if interpret else pltpu.VMEM)
    return jax.jit(pl.pallas_call(
        kernel,
        out_shape=tuple(jax.ShapeDtypeStruct((1, 3 * rows, m), jnp.uint32)
                        for _ in range(2)),
        grid=(m // block, K),
        in_specs=[bs_in],
        out_specs=(bs_out, bs_out),
        scratch_shapes=[pltpu.VMEM((6 * rows, block), jnp.uint32)],
        interpret=interpret,
    ))


def weighted_chunk_sums(points, K: int, group: str = "g1",
                        block: int = None, interpret: bool = None):
    """Per-chunk (sum, local-weighted sum) of Jacobian points: chunk m =
    points[m*K .. m*K+K-1], returns two point batches of N/K:
    s_m = sum_t v_t and w_m = sum_t t*v_t."""
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    if block is None:
        block = 1024 if group == "g1" else 512
    n = points[0].shape[-1]
    assert n % K == 0
    m = n // K
    rows = points[0].shape[-2] if points[0].ndim == 2 else 2 * points[0].shape[-2]

    def to3(x):
        r = x.shape[0]
        return x.reshape(r, m, K).transpose(2, 0, 1)

    flat_in = [(_flat2(x) if group == "g2" else x) for x in points]
    pts3 = jnp.concatenate([to3(x) for x in flat_in], axis=1)  # (K, 3r, M)
    blk = min(block, 1 << max(7, (m - 1).bit_length()))
    mpad = -(-m // blk) * blk
    if mpad != m:
        pts3 = jnp.pad(pts3, ((0, 0), (0, 0), (0, mpad - m)))
    os_, ow_ = _wsum_call(group, K, mpad, blk, interpret)(pts3)

    def split(o):
        r = o.shape[1] // 3
        parts = (o[0, :r, :m], o[0, r:2 * r, :m], o[0, 2 * r:, :m])
        if group == "g2":
            return tuple(_unflat2(p) for p in parts)
        return parts

    return split(os_), split(ow_)
