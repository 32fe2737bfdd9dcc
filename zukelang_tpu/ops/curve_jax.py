"""Batched elliptic-curve arithmetic over limb arrays (G1/Fq, G2/Fq2).

Jacobian coordinates, branchless: infinity is Z == 0 and every special case
(identity operands, P + (-P), doubling-degenerate adds) is resolved with
per-element selects, so the same traced program handles all inputs — the
TPU-native replacement for blst's point ops behind the reference's
`dot`/`powers`/`apply_powers` folds (curve.ml:94-118).

A point batch is a tuple (X, Y, Z); G1 coordinates are (nl, N) Fq limb
arrays, G2 coordinates are (2, nl, N) Fq2 limb arrays.  All in Montgomery
form.  Formulas are shared between the two via a tiny field-ops vtable.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import params
from . import field_jax as F


class FieldOps(NamedTuple):
    """Vectorized field vtable; coordinates are arrays with batch last."""
    add: callable
    sub: callable
    mul: callable
    sqr: callable
    is_zero: callable     # -> (N,) bool
    select: callable      # (cond (N,), a, b) -> a where cond else b
    zeros_like: callable


def _fq_ops() -> FieldOps:
    spec = F.FQ
    return FieldOps(
        add=lambda a, b: F.add(a, b, spec),
        sub=lambda a, b: F.sub(a, b, spec),
        mul=lambda a, b: F.mont_mul(a, b, spec),
        sqr=lambda a: F.mont_mul(a, a, spec),
        is_zero=F.is_zero,
        select=lambda c, a, b: jnp.where(c[None, :], a, b),
        zeros_like=jnp.zeros_like,
    )


def _fq2_add(a, b):
    return jnp.stack([F.add(a[0], b[0], F.FQ), F.add(a[1], b[1], F.FQ)])


def _fq2_sub(a, b):
    return jnp.stack([F.sub(a[0], b[0], F.FQ), F.sub(a[1], b[1], F.FQ)])


def _fq2_mul(a, b):
    # Karatsuba over u^2 = -1: 3 Fq muls
    v0 = F.mont_mul(a[0], b[0], F.FQ)
    v1 = F.mont_mul(a[1], b[1], F.FQ)
    t = F.mont_mul(F.add(a[0], a[1], F.FQ), F.add(b[0], b[1], F.FQ), F.FQ)
    c0 = F.sub(v0, v1, F.FQ)
    c1 = F.sub(F.sub(t, v0, F.FQ), v1, F.FQ)
    return jnp.stack([c0, c1])


def _fq2_sqr(a):
    # (a0+a1 u)^2 = (a0+a1)(a0-a1) + 2 a0 a1 u
    t0 = F.mont_mul(F.add(a[0], a[1], F.FQ), F.sub(a[0], a[1], F.FQ), F.FQ)
    m = F.mont_mul(a[0], a[1], F.FQ)
    return jnp.stack([t0, F.add(m, m, F.FQ)])


def _fq2_ops() -> FieldOps:
    return FieldOps(
        add=_fq2_add,
        sub=_fq2_sub,
        mul=_fq2_mul,
        sqr=_fq2_sqr,
        is_zero=lambda a: F.is_zero(a[0]) & F.is_zero(a[1]),
        select=lambda c, a, b: jnp.where(c[None, None, :], a, b),
        zeros_like=jnp.zeros_like,
    )


FQ_OPS = _fq_ops()
FQ2_OPS = _fq2_ops()

Point = Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]  # (X, Y, Z) Jacobian


# ---------------------------------------------------------------------------
# Group law
# ---------------------------------------------------------------------------

def _mul_many(ops: FieldOps, xs, ys):
    """One batched field multiply for several independent products.

    Composing dozens of separate multi-limb multiplies makes XLA graphs
    (and compile times) explode; stacking independent products along the
    batch axis keeps one mont_mul call per dependency round and feeds the
    VPU wider batches.
    """
    a = jnp.concatenate(xs, axis=-1)
    b = jnp.concatenate(ys, axis=-1)
    r = ops.mul(a, b)
    n = xs[0].shape[-1]
    return [r[..., i * n:(i + 1) * n] for i in range(len(xs))]


# Composed point formulas are 10^3..10^5 traced primitives each (limb
# loops unroll; the Pallas kernels they dispatch re-trace per call site).
# Routing the public entry points through per-(kind, field) jitted
# wrappers puts each formula's jaxpr behind the pjit trace cache: traced
# once per shape process-wide instead of at every call site of every
# enclosing trace.  XLA inlines the called computation — compiled code is
# unchanged; only tracing cost collapses.
_POINT_JITS = {}


def _point_jit(kind: str, ops: FieldOps):
    key = (kind, id(ops))
    f = _POINT_JITS.get(key)
    if f is None:
        impl = {"add": _point_add_impl, "double": _point_double_impl,
                "madd": _point_madd_impl}[kind]
        f = jax.jit(functools.partial(impl, ops=ops))
        _POINT_JITS[key] = f
    return f


def point_double(p: Point, ops: FieldOps) -> Point:
    return _point_jit("double", ops)(p)


def point_add(p: Point, q: Point, ops: FieldOps) -> Point:
    return _point_jit("add", ops)(p, q)


def point_madd(p: Point, q: AffinePoint, ops: FieldOps) -> Point:
    return _point_jit("madd", ops)(p, q)


def _point_double_impl(p: Point, ops: FieldOps) -> Point:
    """dbl-2009-l for a = 0; Y == 0 or Z == 0 correctly yields Z3 == 0.
    4 batched multiply rounds (or one fused Pallas kernel on TPU for G1)."""
    if F._use_pallas():
        from . import pallas_kernels as PK
        if ops is FQ_OPS:
            return PK.point_double_pallas(p)
        if ops is FQ2_OPS:
            return PK.point_double_pallas_g2(p)
    X, Y, Z = p
    A, B = _mul_many(ops, [X, Y], [X, Y])
    C, t = _mul_many(ops, [B, ops.add(X, B)], [B, ops.add(X, B)])
    D = ops.sub(ops.sub(t, A), C)
    D = ops.add(D, D)
    E = ops.add(ops.add(A, A), A)
    Fv, YZ = _mul_many(ops, [E, Y], [E, Z])
    X3 = ops.sub(Fv, ops.add(D, D))
    c8 = ops.add(C, C)
    c8 = ops.add(c8, c8)
    c8 = ops.add(c8, c8)
    (EDX,) = _mul_many(ops, [E], [ops.sub(D, X3)])
    Y3 = ops.sub(EDX, c8)
    Z3 = ops.add(YZ, YZ)
    return X3, Y3, Z3


def _point_add_impl(p: Point, q: Point, ops: FieldOps) -> Point:
    """add-2007-bl with full special-case selection; 7 batched multiply
    rounds (+4 in the shared doubling path for the degenerate case), or
    one fused Pallas kernel on TPU for G1."""
    if F._use_pallas():
        from . import pallas_kernels as PK
        if ops is FQ_OPS:
            return PK.point_add_pallas(p, q)
        if ops is FQ2_OPS:
            return PK.point_add_pallas_g2(p, q)
    X1, Y1, Z1 = p
    X2, Y2, Z2 = q
    Z1Z1, Z2Z2 = _mul_many(ops, [Z1, Z2], [Z1, Z2])
    U1, U2, A1, A2 = _mul_many(ops, [X1, X2, Y1, Y2], [Z2Z2, Z1Z1, Z2, Z1])
    S1, S2, ZZ = _mul_many(ops, [A1, A2, Z1], [Z2Z2, Z1Z1, Z2])
    H = ops.sub(U2, U1)
    r = ops.sub(S2, S1)
    H2 = ops.add(H, H)
    r2 = ops.add(r, r)
    (I,) = _mul_many(ops, [H2], [H2])
    J, V, Z3 = _mul_many(ops, [H, U1, ops.add(ZZ, ZZ)], [I, I, H])
    rr, S1J = _mul_many(ops, [r2, S1], [r2, J])
    X3 = ops.sub(ops.sub(rr, J), ops.add(V, V))
    (Ym,) = _mul_many(ops, [r2], [ops.sub(V, X3)])
    Y3 = ops.sub(Ym, ops.add(S1J, S1J))

    p_inf = ops.is_zero(Z1)
    q_inf = ops.is_zero(Z2)
    h_zero = ops.is_zero(H)
    r_zero = ops.is_zero(r)
    same_point = h_zero & r_zero & ~p_inf & ~q_inf

    dX, dY, dZ = point_double(p, ops)

    X3 = ops.select(same_point, dX, X3)
    Y3 = ops.select(same_point, dY, Y3)
    Z3 = ops.select(same_point, dZ, Z3)
    # (H==0, r!=0) -> P + (-P) = infinity: Z3 = H * ... = 0 already.

    X3 = ops.select(q_inf, X1, ops.select(p_inf, X2, X3))
    Y3 = ops.select(q_inf, Y1, ops.select(p_inf, Y2, Y3))
    Z3 = ops.select(q_inf, Z1, ops.select(p_inf, Z2, Z3))
    return X3, Y3, Z3


def point_neg(p: Point, ops: FieldOps, spec=F.FQ) -> Point:
    X, Y, Z = p
    if Y.ndim == 2:
        return X, F.neg(Y, spec), Z
    return X, jnp.stack([F.neg(Y[0], spec), F.neg(Y[1], spec)]), Z


AffinePoint = Tuple[jnp.ndarray, jnp.ndarray]  # (X, Y); (0, 0) = infinity


def _one_coord(n: int, ops: FieldOps) -> jnp.ndarray:
    if ops is FQ2_OPS:
        return jnp.stack([F.ones_mont(n, F.FQ), F.zeros(n, F.FQ)])
    return F.ones_mont(n, F.FQ)


def affine_to_jac(q: AffinePoint, ops: FieldOps) -> Point:
    """(X, Y) affine -> Jacobian; the (0, 0) infinity marker maps to Z=0."""
    X2, Y2 = q
    n = X2.shape[-1]
    inf = ops.is_zero(X2) & ops.is_zero(Y2)
    Z = ops.select(inf, ops.zeros_like(X2), _one_coord(n, ops))
    return X2, Y2, Z


def _point_madd_impl(p: Point, q: AffinePoint, ops: FieldOps) -> Point:
    """Mixed add: p Jacobian + q affine ((0,0) = infinity) — 11 field muls
    vs point_add's 24 (incl. its fused doubling path).

    The doubling-degenerate case (p == q, both finite) is repaired with a
    lax.cond: the full doubling only executes at runtime when some lane
    actually collided, which for MSM bucket accumulation over a CRS is
    cryptographically negligible — so the hot path stays at 11 muls."""
    if F._use_pallas():
        from . import pallas_kernels as PK
        madd = (PK.point_madd_pallas if ops is FQ_OPS
                else PK.point_madd_pallas_g2)
        (X3, Y3, Z3), same = madd(p, q)
    else:
        X3, Y3, Z3, same = _madd_xla(p, q, ops)
    out = (X3, Y3, Z3)

    def fix(o):
        dX, dY, dZ = point_double(p, ops)
        return (ops.select(same, dX, o[0]),
                ops.select(same, dY, o[1]),
                ops.select(same, dZ, o[2]))

    return jax.lax.cond(jnp.any(same), fix, lambda o: o, out)


def _madd_xla(p: Point, q: AffinePoint, ops: FieldOps):
    """madd-2007-bl on the XLA (non-Pallas) path; same contract as the
    Pallas kernel: lanes with p == q come back garbage + flagged."""
    X1, Y1, Z1 = p
    X2, Y2 = q
    Z1Z1, = _mul_many(ops, [Z1], [Z1])
    U2, ZC = _mul_many(ops, [X2, Z1], [Z1Z1, Z1Z1])
    S2, = _mul_many(ops, [Y2], [ZC])
    H = ops.sub(U2, X1)
    r = ops.sub(S2, Y1)
    HH, = _mul_many(ops, [H], [H])
    I = ops.add(ops.add(HH, HH), ops.add(HH, HH))
    r2 = ops.add(r, r)
    J, V, rr = _mul_many(ops, [H, X1, r2], [I, I, r2])
    X3 = ops.sub(ops.sub(rr, J), ops.add(V, V))
    ZH = ops.add(Z1, H)
    YJ, Ym, ZHs = _mul_many(ops, [Y1, r2, ZH], [J, ops.sub(V, X3), ZH])
    Y3 = ops.sub(Ym, ops.add(YJ, YJ))
    Z3 = ops.sub(ops.sub(ZHs, Z1Z1), HH)

    p_inf = ops.is_zero(Z1)
    q_inf = ops.is_zero(X2) & ops.is_zero(Y2)
    same = ops.is_zero(H) & ops.is_zero(r) & ~p_inf & ~q_inf
    one = _one_coord(X1.shape[-1], ops)
    X3 = ops.select(q_inf, X1, ops.select(p_inf, X2, X3))
    Y3 = ops.select(q_inf, Y1, ops.select(p_inf, Y2, Y3))
    Z3 = ops.select(q_inf, Z1, ops.select(p_inf, one, Z3))
    return X3, Y3, Z3, same


def _fq_inv(a: jnp.ndarray) -> jnp.ndarray:
    return F.inv(a, F.FQ)


def _fq2_inv(a: jnp.ndarray) -> jnp.ndarray:
    """(a0 + a1 u)^-1 = (a0 - a1 u) / (a0^2 + a1^2)   (u^2 = -1)."""
    n0 = F.mont_mul(a[0], a[0], F.FQ)
    n1 = F.mont_mul(a[1], a[1], F.FQ)
    ninv = F.inv(F.add(n0, n1, F.FQ), F.FQ)
    return jnp.stack([F.mont_mul(a[0], ninv, F.FQ),
                      F.neg(F.mont_mul(a[1], ninv, F.FQ), F.FQ)])


def to_affine(p: Point, ops: FieldOps) -> AffinePoint:
    """Batch-normalize Jacobian points to affine (X/Z^2, Y/Z^3) with the
    (0, 0) infinity marker.  Inversion is batched Fermat (one pow over the
    whole width) — a once-per-CRS cost that makes every subsequent MSM use
    the 11-mul mixed add instead of the 24-mul general add."""
    X, Y, Z = p
    n = X.shape[-1]
    inf = ops.is_zero(Z)
    Zs = ops.select(inf, _one_coord(n, ops), Z)
    Zi = _fq_inv(Zs) if ops is FQ_OPS else _fq2_inv(Zs)
    Zi2, = _mul_many(ops, [Zi], [Zi])
    Xa, Zi3 = _mul_many(ops, [X, Zi2], [Zi2, Zi])
    Ya, = _mul_many(ops, [Y], [Zi3])
    zero = ops.zeros_like(X)
    return ops.select(inf, zero, Xa), ops.select(inf, zero, Ya)


def tree_sum(p: Point, ops: FieldOps) -> Point:
    """Reduce a batch of N points to a single point (N must stay a power of
    two internally; odd tails are padded with infinity)."""
    X, Y, Z = p
    n = X.shape[-1]
    while n > 1:
        if n % 2 == 1:
            pad = [(0, 0)] * (X.ndim - 1) + [(0, 1)]
            X = jnp.pad(X, pad)
            Y = jnp.pad(Y, pad)
            Z = jnp.pad(Z, pad)
            n += 1
        h = n // 2
        left = (X[..., :h], Y[..., :h], Z[..., :h])
        right = (X[..., h:], Y[..., h:], Z[..., h:])
        X, Y, Z = point_add(left, right, ops)
        n = h
    return X, Y, Z


# ---------------------------------------------------------------------------
# Host <-> device conversion (golden affine points <-> limb batches)
# ---------------------------------------------------------------------------

def pack_g1(points) -> Point:
    """Golden G1 points -> Montgomery Jacobian limb batch (Z in {0,1})."""
    xs, ys, zs = [], [], []
    for pt in points:
        if pt.is_zero():
            xs.append(0)
            ys.append(1)
            zs.append(0)
        else:
            xs.append(pt.x.n)
            ys.append(pt.y.n)
            zs.append(1)
    return (F.pack_mont(xs, F.FQ), F.pack_mont(ys, F.FQ), F.pack_mont(zs, F.FQ))


def unpack_g1(p: Point):
    """Limb batch -> golden affine G1 points (normalizes via python inverse)."""
    from ..golden.curve import G1
    from ..golden.field import Fq
    X = F.unpack_mont(p[0], F.FQ)
    Y = F.unpack_mont(p[1], F.FQ)
    Z = F.unpack_mont(p[2], F.FQ)
    out = []
    for x, y, z in zip(X, Y, Z):
        if z == 0:
            out.append(G1.zero())
        else:
            zi = pow(z, -1, params.P)
            zi2 = zi * zi % params.P
            out.append(G1(Fq(x * zi2 % params.P), Fq(y * zi2 % params.P * zi % params.P)))
    return out


def pack_g2(points) -> Point:
    xs0, xs1, ys0, ys1, zs0, zs1 = [], [], [], [], [], []
    for pt in points:
        if pt.is_zero():
            xs0.append(0); xs1.append(0)
            ys0.append(1); ys1.append(0)
            zs0.append(0); zs1.append(0)
        else:
            xs0.append(pt.x.c0.n); xs1.append(pt.x.c1.n)
            ys0.append(pt.y.c0.n); ys1.append(pt.y.c1.n)
            zs0.append(1); zs1.append(0)
    X = jnp.stack([F.pack_mont(xs0, F.FQ), F.pack_mont(xs1, F.FQ)])
    Y = jnp.stack([F.pack_mont(ys0, F.FQ), F.pack_mont(ys1, F.FQ)])
    Z = jnp.stack([F.pack_mont(zs0, F.FQ), F.pack_mont(zs1, F.FQ)])
    return X, Y, Z


def unpack_g2(p: Point):
    from ..golden.curve import G2
    from ..golden.field import Fq, Fq2
    X0 = F.unpack_mont(p[0][0], F.FQ)
    X1 = F.unpack_mont(p[0][1], F.FQ)
    Y0 = F.unpack_mont(p[1][0], F.FQ)
    Y1 = F.unpack_mont(p[1][1], F.FQ)
    Z0 = F.unpack_mont(p[2][0], F.FQ)
    Z1 = F.unpack_mont(p[2][1], F.FQ)
    out = []
    for x0, x1, y0, y1, z0, z1 in zip(X0, X1, Y0, Y1, Z0, Z1):
        if z0 == 0 and z1 == 0:
            out.append(G2.zero())
        else:
            z = Fq2.of_ints(z0, z1)
            zi = z.inv()
            zi2 = zi * zi
            out.append(G2(Fq2.of_ints(x0, x1) * zi2,
                          Fq2.of_ints(y0, y1) * zi2 * zi))
    return out


def infinity_g1(n: int) -> Point:
    return (F.zeros(n, F.FQ), F.ones_mont(n, F.FQ), F.zeros(n, F.FQ))


def infinity_g2(n: int) -> Point:
    zero = jnp.stack([F.zeros(n, F.FQ), F.zeros(n, F.FQ)])
    one = jnp.stack([F.ones_mont(n, F.FQ), F.zeros(n, F.FQ)])
    return (zero, one, zero)
