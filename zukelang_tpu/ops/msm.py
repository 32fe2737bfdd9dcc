"""Multi-scalar multiplication (Pippenger) and fixed-base batches on TPU.

Replaces the reference's linear fold "MSM" (curve.ml:94-103: one scalar-mult
per term) with TPU-native array algorithms:

  * `msm_g1` / `msm_g2`: Pippenger over c-bit windows.  Data-dependent
    bucket accumulation is reformulated as sort-by-bucket + a segmented
    Hillis-Steele scan (log-depth, one point-add per traced loop body so
    XLA graphs stay small), then a suffix-scan bucket reduction.
  * `fixed_base_mul`: batched g*s via a precomputed window table of
    generator multiples (gather + adds) — the keygen workhorse.
  * `g_powers`: {g^(s^i)} — curve.ml:106-109 equivalent.

Scalars cross this API in standard (non-Montgomery) form as (FR_LIMBS, N)
uint32 limb arrays.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

# Private-API shim, pinned against the jax 0.9.x layout: eval_context is
# the only way to escape an active trace so the fixed-base table build
# returns concrete host constants (ensure_compile_time_eval has no rule
# for Pallas primitives — the round-2 bench regression).  An upgrade that
# moves it must fail HERE, at import, not at first cold-cache keygen.
try:
    from jax._src.core import eval_context as _eval_context
except ImportError as _e:  # pragma: no cover
    raise ImportError(
        "jax._src.core.eval_context moved in this jax version (shim was "
        "written against jax 0.9.0); update zukelang_tpu.ops.msm to the "
        "new escape hatch before running") from _e

from .. import params
from . import curve_jax as C
from . import field_jax as F


def _scalars_to_windows(scalars_std: jnp.ndarray, c: int) -> jnp.ndarray:
    """(nl, N) standard-form scalars -> (n_windows, N) int32 window digits,
    least-significant window first.  Any 1 <= c <= 16: a digit straddles at
    most two 16-bit limbs."""
    assert 1 <= c <= params.LIMB_BITS
    nl, n = scalars_std.shape
    total_bits = nl * params.LIMB_BITS
    n_windows = -(-total_bits // c)
    mask = jnp.uint32((1 << c) - 1)
    outs = []
    for w in range(n_windows):
        lo = w * c
        k = lo // params.LIMB_BITS
        off = lo % params.LIMB_BITS
        v = scalars_std[k] >> off
        if off + c > params.LIMB_BITS and k + 1 < nl:
            v = v | (scalars_std[k + 1] << (params.LIMB_BITS - off))
        outs.append((v & mask).astype(jnp.int32))
    return jnp.stack(outs, axis=0)


def _scalars_to_signed_windows(scalars_std: jnp.ndarray, c: int) -> jnp.ndarray:
    """(nl, N) standard-form scalars -> (W, N) int32 SIGNED window digits in
    [-(2^(c-1) - 1), 2^(c-1)], least-significant first: sum_w d_w 2^(cw) =
    scalar.  Signed digits need only 2^(c-1)+1 buckets per window (|d| is
    the bucket, the sign flips the point) — half the unsigned count.

    The carry out of the top window is always absorbable: scalars are
    < 2^255 and ceil(256/c) windows leave the top raw digit <= 2^(c-1)-1.
    """
    raw = _scalars_to_windows(scalars_std, c)
    half = 1 << (c - 1)
    full = 1 << c
    outs = []
    carry = jnp.zeros_like(raw[0])
    for w in range(raw.shape[0]):
        v = raw[w] + carry
        ge = v > half
        outs.append(jnp.where(ge, v - full, v))
        carry = ge.astype(jnp.int32)
    return jnp.stack(outs, axis=0)


def auto_window(n: int) -> int:
    """Window width minimizing ceil(256/c) * (a*N + b*2^(c-1)) under the
    signed-digit kernel cost model (bucket-reduce work ~3.5 lanes/bucket,
    per-element scan work ~1.3 lanes), clamped to [4, 16]."""
    best, best_cost = 4, None
    for c in range(4, 17):
        cost = -(-256 // c) * (1.3 * n + 3.5 * (1 << (c - 1)))
        if best_cost is None or cost < best_cost:
            best, best_cost = c, cost
    return best


def _neg_y(y: jnp.ndarray) -> jnp.ndarray:
    """Field negation of a Y coordinate batch (Fq or Fq2); the affine
    infinity marker (0, 0) is preserved (neg 0 = 0)."""
    if y.ndim == 2:
        return F.neg(y, F.FQ)
    return jnp.stack([F.neg(y[0], F.FQ), F.neg(y[1], F.FQ)])


def _apply_signs(points, dig_signed: jnp.ndarray, ops: C.FieldOps):
    """-> (points with Y negated where digit < 0, |digits| int32)."""
    sign = dig_signed < 0
    y = ops.select(sign, _neg_y(points[1]), points[1])
    return (points[0], y) + tuple(points[2:]), jnp.abs(dig_signed)


def _roll(x: jnp.ndarray, shift) -> jnp.ndarray:
    return jnp.roll(x, shift, axis=-1)


def _hs_segmented_scan(points: C.Point, seg: jnp.ndarray,
                       ops: C.FieldOps) -> C.Point:
    """Inclusive segmented prefix-sum along the batch axis (seg sorted).

    Hillis-Steele: log2(N) rounds, each ONE batched point-add plus a roll
    and a mask — the traced body stays tiny and shapes never change.
    """
    n = seg.shape[-1]
    logn = max(1, (n - 1).bit_length())
    idx = jnp.arange(n)

    def body(d, st):
        X, Y, Z = st
        sh = jnp.int32(1) << d
        prevX = _roll(X, sh)
        prevY = _roll(Y, sh)
        prevZ = _roll(Z, sh)
        valid = (idx >= sh) & (seg == _roll(seg, sh))
        aX, aY, aZ = C.point_add((X, Y, Z), (prevX, prevY, prevZ), ops)
        X = ops.select(valid, aX, X)
        Y = ops.select(valid, aY, Y)
        Z = ops.select(valid, aZ, Z)
        return X, Y, Z

    return jax.lax.fori_loop(0, logn, body, points)


def _hs_total(points: C.Point, ops: C.FieldOps) -> C.Point:
    """Sum of all points along the batch axis -> batch-1 point.  Same
    log-depth structure with a constant segment id."""
    n = points[0].shape[-1]
    seg = jnp.zeros(n, dtype=jnp.int32)
    X, Y, Z = _hs_segmented_scan(points, seg, ops)
    return X[..., -1:], Y[..., -1:], Z[..., -1:]


def _shift1(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.concatenate(
        [jnp.zeros_like(x[..., :1]), x[..., :-1]], axis=-1)


def _seg_scan_auto(points: C.Point, seg: jnp.ndarray, ops: C.FieldOps,
                   group: str = None, K: int = 32) -> C.Point:
    """Inclusive segmented prefix sum along the batch axis (seg sorted).

    On TPU with `group` set: one fused Pallas in-chunk scan (general adds,
    collision-safe) + recursion over the N/K chunk tails + one full-width
    carry application — O(N) add lanes in ~3 device ops per level instead
    of the HS variant's log(N) full-width rounds."""
    n = seg.shape[-1]
    if (group is None or not F._use_pallas() or points[0].ndim > 3
            or n % K != 0 or n // K < 2):
        return _hs_segmented_scan(points, seg, ops)
    from . import pallas_kernels as PK
    scanned = PK.jac_scan_pallas(points, K, group, seg=seg)
    M = n // K
    last_seg = seg[K - 1::K]
    first_seg = seg[0::K]
    tails = tuple(x[..., K - 1::K] for x in scanned)
    car = _seg_scan_auto(tails, last_seg, ops, group, K)
    # carry into chunk m = scanned tail of chunk m-1 when its last segment
    # continues into chunk m; applies to exactly the elements of chunk m's
    # FIRST segment (seg sorted => those are the ones equal to first_seg).
    match = jnp.concatenate(
        [jnp.array([False]), last_seg[:-1] == first_seg[1:]])
    cin = tuple(ops.select(match, _shift1(v), jnp.zeros_like(v))
                for v in car)
    elem_mask = (seg.reshape(M, K) == first_seg[:, None]).reshape(n)
    cin_full = tuple(
        jnp.repeat(v[..., :, None], K, axis=-1).reshape(v.shape[:-1] + (n,))
        for v in cin)
    cin_masked = tuple(ops.select(elem_mask, v, jnp.zeros_like(v))
                       for v in cin_full)  # Z = 0 -> infinity: add is id
    return C.point_add(scanned, cin_masked, ops)


def _total_auto(points: C.Point, ops: C.FieldOps, group: str = None,
                K: int = 32) -> C.Point:
    """Sum of all points -> batch-1; recursive fused chunk scans on TPU."""
    n = points[0].shape[-1]
    if (group is None or not F._use_pallas() or points[0].ndim > 3
            or n % K != 0 or n // K < 2):
        return _hs_total(points, ops)
    from . import pallas_kernels as PK
    scanned = PK.jac_scan_pallas(points, K, group)
    tails = tuple(x[..., K - 1::K] for x in scanned)
    return _total_auto(tails, ops, group, K)


def _scatter_tails(scanned: C.Point, d_sorted: jnp.ndarray, n_buckets: int,
                   infinity) -> C.Point:
    """Pick the last (inclusive-scan) element of each segment into buckets."""
    is_tail = jnp.concatenate(
        [d_sorted[:-1] != d_sorted[1:], jnp.array([True])])
    tgt = jnp.where(is_tail, d_sorted, n_buckets)  # dummy slot for non-tails
    bX, bY, bZ = infinity(n_buckets + 1)
    sX, sY, sZ = scanned
    bX = bX.at[..., tgt].set(sX)
    bY = bY.at[..., tgt].set(sY)
    bZ = bZ.at[..., tgt].set(sZ)
    return bX[..., :n_buckets], bY[..., :n_buckets], bZ[..., :n_buckets]


def _bucket_sums(points: C.Point, digits: jnp.ndarray, n_buckets: int,
                 ops: C.FieldOps, infinity) -> C.Point:
    """Per-bucket sums for one window: sort by digit, segmented scan,
    scatter segment tails into the bucket array.  Log-depth HS variant:
    O(N log N) point-add lanes."""
    order = jnp.argsort(digits)
    d_sorted = digits[order]
    pts = tuple(x[..., order] for x in points)
    scanned = _hs_segmented_scan(pts, d_sorted, ops)
    return _scatter_tails(scanned, d_sorted, n_buckets, infinity)


def _bucket_sums_chunked(points, digits: jnp.ndarray,
                         n_buckets: int, ops: C.FieldOps, infinity,
                         K: int = 32) -> C.Point:
    """Work-efficient bucket accumulation: sort, then a two-phase segmented
    scan — K sequential steps over N/K wide lanes (work O(N)), a log(N/K)
    cross-chunk carry scan, and a bucket-width (2^c-wide, not N-wide)
    carry application at the segment tails only.

    ~(K + log(N/K)) batched point-add lanes of total width ~N per window
    instead of the HS variant's log(N) *full-width* adds.

    `points` may be a 3-tuple (Jacobian) or a 2-tuple (affine, (0,0) =
    infinity); the affine form runs phase 1 — the N add lanes that
    dominate the MSM — with the 11-mul mixed add instead of the 24-mul
    general add."""
    affine = len(points) == 2
    n = digits.shape[0]
    if n % K != 0 or n // K < 2:
        if affine:
            points = C.affine_to_jac(points, ops)
        return _bucket_sums(points, digits, n_buckets, ops, infinity)
    M = n // K
    order = jnp.argsort(digits)
    d_sorted = digits[order]
    pts = tuple(x[..., order] for x in points)

    # column-chunk view: element t of chunk m is sorted[m*K + t]
    d2 = d_sorted.reshape(M, K)

    def as2(x):
        return x.reshape(x.shape[:-1] + (M, K))

    p2 = tuple(as2(x) for x in pts)

    def cur_jac(cur):
        """Phase-1 reset value: the current point as Jacobian."""
        if affine:
            return C.affine_to_jac(cur, ops)
        return cur

    # phase 1: sequential in-chunk segmented scan (M lanes per step)
    def step(t, st):
        accX, accY, accZ, outX, outY, outZ = st
        cur = tuple(jax.lax.dynamic_index_in_dim(x, t, x.ndim - 1,
                                                 keepdims=False) for x in p2)
        same = jax.lax.dynamic_index_in_dim(d2, t, 1, keepdims=False) == \
            jax.lax.dynamic_index_in_dim(d2, t - 1, 1, keepdims=False)
        if affine:
            aX, aY, aZ = C.point_madd((accX, accY, accZ), cur, ops)
        else:
            aX, aY, aZ = C.point_add((accX, accY, accZ), cur, ops)
        cX, cY, cZ = cur_jac(cur)
        accX = ops.select(same, aX, cX)
        accY = ops.select(same, aY, cY)
        accZ = ops.select(same, aZ, cZ)
        outX = jax.lax.dynamic_update_index_in_dim(
            outX, accX, t, outX.ndim - 1)
        outY = jax.lax.dynamic_update_index_in_dim(
            outY, accY, t, outY.ndim - 1)
        outZ = jax.lax.dynamic_update_index_in_dim(
            outZ, accZ, t, outZ.ndim - 1)
        return accX, accY, accZ, outX, outY, outZ

    first = cur_jac(tuple(x[..., 0] for x in p2))
    out0 = tuple(jnp.zeros(f.shape + (K,), f.dtype) for f in first)
    out0 = tuple(
        jax.lax.dynamic_update_index_in_dim(o, f, 0, o.ndim - 1)
        for o, f in zip(out0, first))
    accX, accY, accZ, outX, outY, outZ = jax.lax.fori_loop(
        1, K, step, (*first, *out0))

    scan_flat = tuple(x.reshape(x.shape[:-2] + (n,))
                      for x in (outX, outY, outZ))
    return _carry_scatter(scan_flat, d_sorted, n_buckets, ops, infinity, K)


def _carry_scatter(scan_flat: C.Point, d_sorted: jnp.ndarray, n_buckets: int,
                   ops: C.FieldOps, infinity, K: int,
                   group: str = None) -> C.Point:
    """Phases 2+3 of the chunked bucket accumulation, from the flat
    in-chunk scanned values (chunk m = sorted elements [m*K, (m+1)*K)).

    Phase 2: cross-chunk carries — HS scan over the M chunk-end partials
    segmented by the chunk's LAST digit (a chunk with an internal boundary
    has first_seg < last_seg, so runs are exactly segment spans).

    Phase 3: only segment TAILS feed the buckets, so carries need not be
    applied across each chunk's whole first-segment prefix — only at the
    tail of chunk m's first segment, i.e. at bucket first_seg[m], and only
    when that tail actually lies in chunk m (the segment does not run
    through to chunk m+1; if it does, the HS scan already folded chunk m's
    partial into a later chunk's carry-in)."""
    n = d_sorted.shape[0]
    M = n // K
    last_seg = d_sorted[K - 1::K]
    first_seg = d_sorted[0::K]
    acc = tuple(x[..., K - 1::K] for x in scan_flat)
    carX, carY, carZ = _seg_scan_auto(acc, last_seg, ops, group)
    # carry_in[m] = scanned partial of chunk m-1 when its last digit equals
    # chunk m's first digit; else infinity (zeroed arrays have Z == 0).

    match = jnp.concatenate(
        [jnp.array([False]), last_seg[:-1] == first_seg[1:]])
    cinX = ops.select(match, _shift1(carX), jnp.zeros_like(carX))
    cinY = ops.select(match, _shift1(carY), jnp.zeros_like(carY))
    cinZ = ops.select(match, _shift1(carZ), jnp.zeros_like(carZ))

    bX, bY, bZ = _scatter_tails(scan_flat, d_sorted, n_buckets, infinity)

    continues = jnp.concatenate(
        [(last_seg == first_seg)[:-1] & (first_seg[1:] == first_seg[:-1]),
         jnp.array([False])])
    apply_m = match & ~continues
    tgt = jnp.where(apply_m, first_seg, n_buckets)  # dummy slot otherwise
    cbX, cbY, cbZ = infinity(n_buckets + 1)
    cbX = cbX.at[..., tgt].set(cinX)
    cbY = cbY.at[..., tgt].set(cinY)
    cbZ = cbZ.at[..., tgt].set(cinZ)
    # unmasked chunks all land in the dummy slot (sliced off); masked ones
    # hit distinct buckets (one tail per segment), so no collisions matter.
    carry_b = (cbX[..., :n_buckets], cbY[..., :n_buckets],
               cbZ[..., :n_buckets])
    # carry slots without a real carry are (0,*,0) = infinity: add is id.
    return C.point_add((bX, bY, bZ), carry_b, ops)


def _bucket_sums_fused(points, digits: jnp.ndarray, n_buckets: int,
                       ops: C.FieldOps, infinity, group: str,
                       K: int = 32) -> C.Point:
    """Bucket accumulation with phase 1 as ONE fused Pallas kernel (the
    whole in-chunk segmented mixed-add scan runs in VMEM) instead of an
    XLA fori_loop of K separate madd launches.

    `points` must be affine.  Lanes that hit the doubling-degenerate mixed
    add are flagged by the kernel and the whole window falls back to the
    safe log-depth path under a lax.cond — runtime-free unless it fires."""
    n = digits.shape[0]
    if n % K != 0 or n // K < 2:
        return _bucket_sums(C.affine_to_jac(points, ops), digits, n_buckets,
                            ops, infinity)
    from . import pallas_kernels as PK
    d_sorted, order = PK.bitonic_argsort(digits)
    pts = tuple(x[..., order] for x in points)
    scanned, collided = PK.bucket_scan_pallas(pts, d_sorted, K, group)

    def good(_):
        return _carry_scatter(scanned, d_sorted, n_buckets, ops, infinity, K,
                              group)

    def bad(_):
        return _bucket_sums(C.affine_to_jac(pts, ops), d_sorted, n_buckets,
                            ops, infinity)

    return jax.lax.cond(jnp.any(collided), bad, good, 0)


def _chunked_prefix_scan(points: C.Point, ops: C.FieldOps,
                         K: int, group: str = None) -> C.Point:
    """Work-efficient unsegmented inclusive prefix sum along the batch
    axis: K sequential in-chunk steps (N total add lanes), an HS scan over
    the N/K chunk totals, one N-wide carry application.

    With `group` set on a TPU backend, the in-chunk phase runs as one
    fused Pallas kernel (jac_scan_pallas) instead of a fori_loop of K
    separate point_add launches."""
    n = points[0].shape[-1]
    M = n // K

    if group is not None and F._use_pallas() and points[0].ndim <= 3:
        from . import pallas_kernels as PK
        scanned = PK.jac_scan_pallas(points, K, group)
        tot = tuple(x[..., K - 1::K] for x in scanned)
        seg = jnp.zeros(M, dtype=jnp.int32)
        carX, carY, carZ = _seg_scan_auto(tot, seg, ops, group)
        carry_full = tuple(
            jnp.repeat(_shift1(x)[..., :, None], K, axis=-1)
            .reshape(x.shape[:-1] + (n,))
            for x in (carX, carY, carZ))  # Z = 0 rows = infinity
        return C.point_add(scanned, carry_full, ops)

    p2 = tuple(x.reshape(x.shape[:-1] + (M, K)) for x in points)

    def step(t, st):
        accX, accY, accZ, outX, outY, outZ = st
        cur = tuple(jax.lax.dynamic_index_in_dim(x, t, x.ndim - 1,
                                                 keepdims=False) for x in p2)
        accX, accY, accZ = C.point_add((accX, accY, accZ), cur, ops)
        outX = jax.lax.dynamic_update_index_in_dim(
            outX, accX, t, outX.ndim - 1)
        outY = jax.lax.dynamic_update_index_in_dim(
            outY, accY, t, outY.ndim - 1)
        outZ = jax.lax.dynamic_update_index_in_dim(
            outZ, accZ, t, outZ.ndim - 1)
        return accX, accY, accZ, outX, outY, outZ

    out0 = tuple(jnp.zeros_like(x) for x in p2)
    first = tuple(x[..., 0] for x in p2)
    out0 = tuple(
        jax.lax.dynamic_update_index_in_dim(o, f, 0, o.ndim - 1)
        for o, f in zip(out0, first))
    accX, accY, accZ, outX, outY, outZ = jax.lax.fori_loop(
        1, K, step, (*first, *out0))

    # exclusive scan of chunk totals = carry into each chunk
    seg = jnp.zeros(M, dtype=jnp.int32)
    carX, carY, carZ = _hs_segmented_scan((accX, accY, accZ), seg, ops)

    def shift1(x):
        return jnp.concatenate(
            [jnp.zeros_like(x[..., :1]), x[..., :-1]], axis=-1)

    cin = (shift1(carX), shift1(carY), shift1(carZ))  # Z=0 rows = infinity
    carry_full = tuple(
        jnp.repeat(x[..., :, None], K, axis=-1).reshape(x.shape[:-1] + (n,))
        for x in cin)
    flat = tuple(x.reshape(x.shape[:-2] + (n,)) for x in (outX, outY, outZ))
    return C.point_add(flat, carry_full, ops)


def _chunked_total(points: C.Point, ops: C.FieldOps, K: int,
                   group: str = None) -> C.Point:
    """Sum of all points: K sequential adds over N/K lanes + HS total."""
    n = points[0].shape[-1]
    M = n // K

    if group is not None and F._use_pallas() and points[0].ndim <= 3:
        return _total_auto(points, ops, group, K)

    p2 = tuple(x.reshape(x.shape[:-1] + (M, K)) for x in points)

    def step(t, acc):
        cur = tuple(jax.lax.dynamic_index_in_dim(x, t, x.ndim - 1,
                                                 keepdims=False) for x in p2)
        return C.point_add(acc, cur, ops)

    acc = jax.lax.fori_loop(1, K, step, tuple(x[..., 0] for x in p2))
    return _hs_total(acc, ops)


def _weighted_bucket_reduce(buckets: C.Point, ops: C.FieldOps,
                            infinity, K: int = 64,
                            group: str = None) -> C.Point:
    """sum_{b=1}^{B-1} b * S_b via suffix sums: T_j = sum_{b>=j} S_b,
    result = sum_{j>=1} T_j.  Work-efficient (chunked) when B divides K;
    falls back to the log-depth HS scan otherwise.  `group` enables the
    fused Pallas scan kernels on TPU."""
    X, Y, Z = buckets
    inf1 = infinity(1)
    X = X.at[..., 0:1].set(inf1[0])  # weight of bucket 0 is 0
    Y = Y.at[..., 0:1].set(inf1[1])
    Z = Z.at[..., 0:1].set(inf1[2])
    rev = (X[..., ::-1], Y[..., ::-1], Z[..., ::-1])
    B = X.shape[-1]
    if B % K == 0 and B // K >= 2:
        sX, sY, sZ = _chunked_prefix_scan(rev, ops, K, group)  # sX[k] = T_{B-1-k}
    else:
        seg = jnp.zeros(B, dtype=jnp.int32)
        sX, sY, sZ = _hs_segmented_scan(rev, seg, ops)
    # sum T_j for j >= 1 only: drop the last scan entry (T_0) by replacing
    # it with infinity before the total.
    inf1 = infinity(1)
    sX = sX.at[..., -1:].set(inf1[0])
    sY = sY.at[..., -1:].set(inf1[1])
    sZ = sZ.at[..., -1:].set(inf1[2])
    if B % K == 0 and B // K >= 2:
        return _chunked_total((sX, sY, sZ), ops, K, group)
    return _hs_total((sX, sY, sZ), ops)


def _pad_buckets(buckets: C.Point, nb_to: int, infinity) -> C.Point:
    """Pad a bucket array at the high end with infinities (weight b*inf
    contributes nothing to the weighted reduce)."""
    cur = buckets[0].shape[-1]
    if cur >= nb_to:
        return buckets
    inf = infinity(nb_to - cur)
    return tuple(jnp.concatenate([a, b], axis=-1)
                 for a, b in zip(buckets, inf))


def _msm_impl(points, scalars_std: jnp.ndarray, c: int,
              ops: C.FieldOps, infinity) -> C.Point:
    if len(points) == 2:
        points = C.affine_to_jac(points, ops)
    digits = _scalars_to_windows(scalars_std, c)     # (W, N)
    n_buckets = 1 << c

    def window_body(carry, dig):
        ws = _weighted_bucket_reduce(
            _bucket_sums(points, dig, n_buckets, ops, infinity),
            ops, infinity)
        return carry, ws

    _, wsums = jax.lax.scan(window_body, 0, digits)
    # wsums: tuple of arrays with leading window axis, batch 1
    return _horner_windows(wsums, c, digits.shape[0], ops)


def _horner_windows(wsums: C.Point, c: int, n_windows: int,
                    ops: C.FieldOps) -> C.Point:
    """Combine per-window sums (leading window axis, low window first) via
    Horner, high to low: acc = 2^c * acc + W_w."""
    acc = tuple(v[n_windows - 1] for v in wsums)

    def horner_body(i, acc):
        w = n_windows - 2 - i

        def dbl(_, a):
            return C.point_double(a, ops)

        acc = jax.lax.fori_loop(0, c, dbl, acc)
        nxt = tuple(jax.lax.dynamic_index_in_dim(v, w, 0, keepdims=False)
                    for v in wsums)
        return C.point_add(acc, nxt, ops)

    return jax.lax.fori_loop(0, n_windows - 1, horner_body, acc)


def msm_g1(points: C.Point, scalars_std: jnp.ndarray, c: int = 8) -> C.Point:
    """Fully-traced Pippenger MSM over G1 (single jaxpr; for use inside
    larger jitted programs).  For top-level calls prefer `msm_g1_staged` —
    one compiled window program dispatched W times from the host, which
    both compiles faster and avoids very large fused graphs."""
    return _msm_impl(points, scalars_std, c, C.FQ_OPS, C.infinity_g1)


def msm_g2(points: C.Point, scalars_std: jnp.ndarray, c: int = 8) -> C.Point:
    return _msm_impl(points, scalars_std, c, C.FQ2_OPS, C.infinity_g2)


# ---------------------------------------------------------------------------
# Host-staged MSM: one jitted window program + host-side window combine
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=64)
def _jit_window(group: str, c: int, chunked: bool = True,
                affine: bool = False, signed: bool = True):
    """One compiled Pippenger window: signed digits in, weighted bucket sum
    (batch-1 point) out.  On TPU with affine bases the bucket phase runs as
    the fused Pallas scan kernel."""
    ops = C.FQ_OPS if group == "g1" else C.FQ2_OPS
    infinity = C.infinity_g1 if group == "g1" else C.infinity_g2
    fused = affine and F._use_pallas()

    def bucket_fn(points, dig, nb):
        if fused:
            return _bucket_sums_fused(points, dig, nb, ops, infinity, group)
        if not chunked:
            pts = C.affine_to_jac(points, ops) if affine else points
            return _bucket_sums(pts, dig, nb, ops, infinity)
        return _bucket_sums_chunked(points, dig, nb, ops, infinity)

    def run(points, dig):
        if signed:
            points, dig = _apply_signs(points, dig, ops)
            nb = (1 << (c - 1)) + 1
        else:
            nb = 1 << c
        buckets = bucket_fn(points, dig, nb)
        nb_pad = -(-nb // 64) * 64 if nb >= 128 else nb
        buckets = _pad_buckets(buckets, nb_pad, infinity)
        return _weighted_bucket_reduce(buckets, ops, infinity,
                                       group=group if fused else None)

    return jax.jit(run)


def _prep_rows(points) -> jnp.ndarray:
    """Affine (X, Y) batch -> (2N, R) ROW-major table [X;Y | X;-Y]: a row
    gather by (order + N*sign) fetches sorted, sign-applied points in one
    cheap op (TPU row gathers are ~10x faster than lane gathers)."""
    X, Y = points

    def fl(v):
        return v.reshape(2 * v.shape[1], v.shape[2]) if v.ndim == 3 else v

    negY = _neg_y(Y)
    top = jnp.concatenate([fl(X), fl(Y)], axis=0)    # (R, N)
    bot = jnp.concatenate([fl(X), fl(negY)], axis=0)
    return jnp.concatenate([top, bot], axis=1).T     # (2N, R)


def _weighted_reduce_v2(buckets: C.Point, ops: C.FieldOps, infinity,
                        group: str, K: int = 32) -> C.Point:
    """sum_b b * S_b via the single-pass weighted chunk-sum kernel:
    sum_b b*v_b = sum_m w_m + K * sum_m m*s_m (recurse on the chunk sums).
    """
    B = buckets[0].shape[-1]
    if B < 2 * K or not F._use_pallas():
        buckets = _pad_buckets(buckets, -(-B // 64) * 64 if B >= 128 else B,
                               infinity)
        return _weighted_bucket_reduce(buckets, ops, infinity)
    from . import pallas_kernels as PK
    Bp = -(-B // K) * K
    buckets = _pad_buckets(buckets, Bp, infinity)
    s, w = PK.weighted_chunk_sums(buckets, K, group)
    tw = _total_auto(w, ops, group)
    ws = _weighted_reduce_v2(s, ops, infinity, group, K)
    for _ in range(K.bit_length() - 1):
        ws = C.point_double(ws, ops)
    return C.point_add(tw, ws, ops)


def _pad_blocks(x: jnp.ndarray, nblk: int, per_in: int,
                per_out: int) -> jnp.ndarray:
    """(.., nblk*per_in) -> (.., nblk*per_out), zero (= infinity
    coordinate) padding at each block's high end."""
    if per_in == per_out:
        return x
    shape = x.shape[:-1]
    xb = x.reshape(shape + (nblk, per_in))
    xb = jnp.pad(xb, [(0, 0)] * (len(shape) + 1) + [(0, per_out - per_in)])
    return xb.reshape(shape + (nblk * per_out,))


def _wreduce_batched(v: C.Point, nblk: int, per: int, ops: C.FieldOps,
                     group: str, K: int = 32) -> Tuple[C.Point, C.Point]:
    """Batched weighted reduction of nblk independent bucket blocks laid
    out contiguously: v is (.., nblk*per) with per % K == 0.  Returns
    (W, S) of width nblk: W_j = sum_b b*v_b (local b in [0, per)) and
    S_j = sum_b v_b.

    One weighted_chunk_sums kernel per level; the recursion stacks the w
    and s streams into a single 2*nblk-block call, so the whole tail costs
    O(log_K per) kernels regardless of nblk — this is what makes reducing
    ALL of an MSM's windows at once cheap, where per-window recursions
    drowned in small-op dispatch overhead."""
    from . import pallas_kernels as PK
    s, w = PK.weighted_chunk_sums(v, K, group)   # widths nblk * per/K
    m_per = per // K
    if m_per == 1:
        return w, s
    m_pad = -(-m_per // K) * K
    stacked = tuple(
        jnp.concatenate([_pad_blocks(a, nblk, m_per, m_pad),
                         _pad_blocks(b, nblk, m_per, m_pad)], axis=-1)
        for a, b in zip(w, s))
    inner_w, inner_s = _wreduce_batched(stacked, 2 * nblk, m_pad, ops,
                                        group, K)
    sum_w = tuple(x[..., :nblk] for x in inner_s)    # sum_m w_m
    ws_s = tuple(x[..., nblk:] for x in inner_w)     # sum_m m*s_m
    sum_s = tuple(x[..., nblk:] for x in inner_s)    # sum_m s_m
    for _ in range(K.bit_length() - 1):              # * K
        ws_s = C.point_double(ws_s, ops)
    total = C.point_add(sum_w, ws_s, ops)
    return total, sum_s


def _window_v2(prec_rows: jnp.ndarray, dig_signed: jnp.ndarray, c: int,
               ops: C.FieldOps, infinity, group: str, K: int = 32,
               base=None, n: int = None):
    """One Pippenger window, v2 pipeline: bitonic sort, one row gather
    (sign baked in), fused segmented scan, gather-based (scatter-free)
    tail extraction.  Cross-chunk carries, bucket assembly and the
    weighted reduce are DEFERRED to one batched pass over all windows
    (per-window small-width ops drown in dispatch overhead).

    Returns kernel-rows-layout arrays:
      tails_m (3 x (rows, M))   in-chunk partials at each chunk end
      tail    (3 x (rows, nb))  in-chunk partial at each bucket's tail
      mb (nb,), needs_carry (nb,), valid (nb,)
      last_seg / first_seg (M,)
      collided () bool
    """
    from . import pallas_kernels as PK
    if n is None:
        n = dig_signed.shape[0]
    M = n // K
    nb = (1 << (c - 1)) + 1
    absd = jnp.abs(dig_signed)
    sign = dig_signed < 0
    d_sorted, order = PK.bitonic_argsort(absd)
    s_sorted = sign[order]
    idx = order + jnp.where(s_sorted, jnp.int32(n), jnp.int32(0))
    if base is not None:
        idx = idx + base   # flat multi-table offset (msm_many)
    g = prec_rows[idx, :]                              # (N, R) row gather
    R = g.shape[1]
    pts3 = g.reshape(M, K, R).transpose(1, 2, 0)       # (K, R, M)
    seg3 = d_sorted.reshape(M, K).T[:, None, :]
    segp3 = jnp.concatenate([seg3[:1], seg3[:-1]], axis=0)
    scanned3, collided = PK.bucket_scan_rows(pts3, seg3, segp3, group)

    last_seg = d_sorted[K - 1::K]
    first_seg = d_sorted[0::K]
    tails_m = tuple(v[K - 1] for v in scanned3)        # (rows, M)

    b_ids = jnp.arange(nb, dtype=jnp.int32)
    pos = jnp.searchsorted(d_sorted, b_ids, side="right").astype(
        jnp.int32) - 1
    posc = jnp.clip(pos, 0, n - 1)
    valid = (pos >= 0) & (d_sorted[posc] == b_ids)
    kb = posc % K
    mb = posc // K
    tail = tuple(v[kb, :, mb].T for v in scanned3)     # (rows, nb)
    start = jnp.searchsorted(d_sorted, b_ids, side="left").astype(jnp.int32)
    needs_carry = valid & (start < mb * K)
    return (tails_m, tail, mb, needs_carry, valid, last_seg, first_seg,
            jnp.any(collided))


def _assemble_buckets_batched(outs, n_windows: int, nb: int, M: int,
                              ops: C.FieldOps, group: str,
                              K: int = 32) -> C.Point:
    """Batched cross-window completion of _window_v2: ONE segmented carry
    scan over all windows' chunk partials, gather-based carry application,
    one wide point_add -> (coord.., W*nb) buckets."""
    tails_all, tail_all, mb_all, nc_all, valid_all, last_all, first_all = (
        outs[0], outs[1], outs[2], outs[3], outs[4], outs[5], outs[6])

    def to_curve(v):
        if group == "g2":
            return v.reshape(v.shape[:-2] + (2, v.shape[-2] // 2, v.shape[-1]))
        return v

    def wflat(v):
        # (W, rows, width) -> (rows, W*width)
        return jnp.moveaxis(v, 0, -2).reshape(
            v.shape[1], v.shape[0] * v.shape[2])

    tails_flat = tuple(to_curve(wflat(v)) for v in tails_all)
    # window-disjoint segment ids keep carries from crossing windows
    seg_flat = (jnp.arange(n_windows, dtype=jnp.int32)[:, None] * (nb + 1)
                + last_all).reshape(n_windows * M)
    car = _seg_scan_auto(tails_flat, seg_flat, ops, group)

    match = jnp.concatenate(
        [jnp.zeros((n_windows, 1), bool),
         last_all[:, :-1] == first_all[:, 1:]], axis=1).reshape(-1)
    cin = tuple(ops.select(match, _shift1(v), jnp.zeros_like(v))
                for v in car)
    # per-bucket carry: row-gather cin at each bucket tail's chunk
    idx = (jnp.arange(n_windows, dtype=jnp.int32)[:, None] * M
           + mb_all).reshape(-1)

    def row_gather(v):
        flat = v.reshape(-1, v.shape[-1]) if v.ndim > 2 else v
        out = flat.T[idx, :].T
        return out.reshape(v.shape[:-1] + (idx.shape[0],))

    nc_flat = nc_all.reshape(-1)
    carry_b = tuple(ops.select(nc_flat, row_gather(v), jnp.zeros_like(
        row_gather(v))) for v in cin)
    valid_flat = valid_all.reshape(-1)
    tail_flat = tuple(to_curve(wflat(v)) for v in tail_all)
    tail_flat = tuple(ops.select(valid_flat, v, jnp.zeros_like(v))
                      for v in tail_flat)
    return C.point_add(tail_flat, carry_b, ops)


def _combine_windows(stacked: C.Point, c: int, n_windows: int,
                     ops: C.FieldOps, group: str = None,
                     n_msm: int = 1) -> C.Point:
    """Per-window sums (batch axis = n_msm blocks of n_windows, low window
    first) -> one point per MSM: window w doubled c*w times (all windows
    of all MSMs in parallel under a masked double), then per-block sums.
    Returns batch n_msm."""
    widx = jnp.tile(jnp.arange(n_windows), n_msm)

    def body(d, p):
        dX, dY, dZ = C.point_double(p, ops)
        cond = d < (c * widx)
        return (ops.select(cond, dX, p[0]),
                ops.select(cond, dY, p[1]),
                ops.select(cond, dZ, p[2]))

    pts = jax.lax.fori_loop(0, c * (n_windows - 1), body, stacked)
    if n_msm == 1:
        return _total_auto(pts, ops, group)
    seg = jnp.repeat(jnp.arange(n_msm, dtype=jnp.int32), n_windows)
    sc = _hs_segmented_scan(pts, seg, ops)
    return tuple(v[..., n_windows - 1::n_windows] for v in sc)


def _msm_fused_impl(points, scalars_std: jnp.ndarray, c: int,
                    ops: C.FieldOps, infinity, group: str):
    """The whole Pippenger MSM as ONE traced program: signed digit
    extraction, a lax.scan over windows (fused sort/scan/reduce kernels in
    the body compile once), masked-double window combine.  A single device
    dispatch — on a tunneled TPU, per-program dispatch latency (~25 ms)
    otherwise dominates every window.

    Returns (X, Y, Z, collided).  `collided` True means some lane hit the
    doubling-degenerate mixed add (duplicate points within a bucket) and
    the result is garbage: the CALLER re-dispatches the safe program
    (_jit_msm_safe).  Keeping the safe path out of this program halves
    the XLA graph (it used to ride along under a lax.cond, doubling
    compile time of the hot program for a branch that never runs on CRS
    inputs)."""
    digits = _scalars_to_signed_windows(scalars_std, c)   # (W, N)
    n_windows = digits.shape[0]
    affine = len(points) == 2
    n = points[0].shape[-1]
    nb = (1 << (c - 1)) + 1
    nb_pad = -(-nb // 64) * 64 if nb >= 128 else nb
    fused = affine and F._use_pallas()
    v2 = fused and n % 32 == 0 and n // 32 >= 2

    if v2:
        prec = _prep_rows(points)
        nbp = -(-nb // 32) * 32
        M = n // 32

        def window_body(carry, dig):
            return carry, _window_v2(prec, dig, c, ops, infinity, group)

        _, outs = jax.lax.scan(window_body, 0, digits)
        collided_any = jnp.any(outs[7])
        buckets = _assemble_buckets_batched(
            outs, n_windows, nb, M, ops, group)   # (coord.., W*nb)
        buckets = _pad_blocks(
            buckets[0], n_windows, nb, nbp), _pad_blocks(
            buckets[1], n_windows, nb, nbp), _pad_blocks(
            buckets[2], n_windows, nb, nbp)
        totals, _ = _wreduce_batched(buckets, n_windows, nbp, ops, group)
        return _combine_windows(totals, c, n_windows, ops, group) + (
            collided_any,)

    def window_body(carry, dig):
        pts, absd = _apply_signs(points, dig, ops)
        if fused:
            buckets = _bucket_sums_fused(pts, absd, nb, ops, infinity,
                                         group)
        elif affine:
            buckets = _bucket_sums_chunked(pts, absd, nb, ops, infinity)
        else:
            buckets = _bucket_sums(pts, absd, nb, ops, infinity)
        buckets = _pad_buckets(buckets, nb_pad, infinity)
        ws = _weighted_bucket_reduce(buckets, ops, infinity,
                                     group=group if fused else None)
        return carry, ws

    _, wsums = jax.lax.scan(window_body, 0, digits)
    # wsums arrays are (W, ..., 1); move the window axis to the batch slot
    stacked = tuple(jnp.moveaxis(v, 0, -1)[..., 0, :] for v in wsums)
    # these paths resolve degenerate adds in-formula: never collided
    return _combine_windows(stacked, c, n_windows, ops,
                            group if fused else None) + (
        jnp.zeros((), jnp.bool_),)


def _msm_safe_impl(points, scalars_std: jnp.ndarray, c: int,
                   ops: C.FieldOps, infinity, group: str) -> C.Point:
    """Collision-safe MSM: log-depth general-add bucket accumulation,
    correct for ANY input (duplicate points included).  Compiled only on
    demand — the first time a fused dispatch reports a collision."""
    digits = _scalars_to_signed_windows(scalars_std, c)
    n_windows = digits.shape[0]
    nb = (1 << (c - 1)) + 1
    nb_pad = -(-nb // 64) * 64 if nb >= 128 else nb

    def body(carry, dig):
        pts, absd = _apply_signs(points, dig, ops)
        jac = C.affine_to_jac(pts, ops) if len(pts) == 2 else pts
        buckets = _bucket_sums(jac, absd, nb, ops, infinity)
        ws = _weighted_bucket_reduce(
            _pad_buckets(buckets, nb_pad, infinity), ops, infinity)
        return carry, ws

    _, wsums = jax.lax.scan(body, 0, digits)
    stacked = tuple(jnp.moveaxis(v, 0, -1)[..., 0, :] for v in wsums)
    return _combine_windows(stacked, c, n_windows, ops, None)


@functools.lru_cache(maxsize=64)
def _jit_msm_fused(group: str, c: int, affine: bool):
    ops = C.FQ_OPS if group == "g1" else C.FQ2_OPS
    infinity = C.infinity_g1 if group == "g1" else C.infinity_g2
    return jax.jit(functools.partial(
        _msm_fused_impl, c=c, ops=ops, infinity=infinity, group=group))


@functools.lru_cache(maxsize=16)
def _jit_msm_safe(group: str, c: int):
    ops = C.FQ_OPS if group == "g1" else C.FQ2_OPS
    infinity = C.infinity_g1 if group == "g1" else C.infinity_g2
    return jax.jit(functools.partial(
        _msm_safe_impl, c=c, ops=ops, infinity=infinity, group=group))


def _many_digit_blocks(tables, scalars_mont: jnp.ndarray, pmap, c: int):
    """Shared front half of the many-MSM programs: row tables, signed
    digit blocks (B*W, n), per-block table base offsets."""
    n = tables[0][0].shape[-1]
    B = scalars_mont.shape[0]
    precs = jnp.concatenate([_prep_rows(t) for t in tables], axis=0)
    nlr = scalars_mont.shape[1]
    flat_m = jnp.moveaxis(scalars_mont, 0, 1).reshape(nlr, B * n)
    std = F.from_mont(flat_m, F.FR)[: params.FR_LIMBS]
    digits = _scalars_to_signed_windows(std, c)        # (W, B*n)
    W = digits.shape[0]
    dig_blocks = digits.reshape(W, B, n).transpose(1, 0, 2).reshape(B * W, n)
    bases = jnp.repeat(
        jnp.asarray(np.array(pmap, np.int32) * (2 * n)), W)
    return precs, dig_blocks, bases, n, B, W


def _msm_many_fused_impl(tables, scalars_mont: jnp.ndarray, pmap, c: int,
                         ops: C.FieldOps, infinity, group: str):
    """B same-size MSMs of one group in ONE traced program — the whole
    Groth16 G1 prove side is a single dispatch.

    tables: tuple of T affine (X, Y) point sets, each width n; pmap: static
    length-B tuple, MSM j uses tables[pmap[j]]; scalars_mont: (B, nl, n)
    MONTGOMERY scalars (converted in-program).  The lax.scan runs over all
    B*W (msm, window) pairs; carries, bucket assembly, the weighted reduce
    and the doubling combine are batched across every block.  Returns a
    batch-B device point plus a `collided` flag — on True the caller
    re-dispatches _jit_msm_many_safe (the safe path is a separate
    on-demand program, not an in-graph lax.cond branch: carrying it
    doubled the compile time of the hot program)."""
    precs, dig_blocks, bases, n, B, W = _many_digit_blocks(
        tables, scalars_mont, pmap, c)
    nb = (1 << (c - 1)) + 1
    nbp = -(-nb // 32) * 32
    M = n // 32

    def body(carry, xs):
        dig, base = xs
        return carry, _window_v2(precs, dig, c, ops, infinity, group,
                                 base=base, n=n)

    _, outs = jax.lax.scan(body, 0, (dig_blocks, bases))
    collided_any = jnp.any(outs[7])
    buckets = _assemble_buckets_batched(outs, B * W, nb, M, ops, group)
    buckets = tuple(_pad_blocks(v, B * W, nb, nbp) for v in buckets)
    totals, _ = _wreduce_batched(buckets, B * W, nbp, ops, group)
    return _combine_windows(totals, c, W, ops, group, n_msm=B) + (
        collided_any,)


def _msm_many_safe_impl(tables, scalars_mont: jnp.ndarray, pmap, c: int,
                        ops: C.FieldOps, infinity, group: str) -> C.Point:
    """Collision-safe batch of B MSMs (general adds); compiled on demand."""
    precs, dig_blocks, bases, n, B, W = _many_digit_blocks(
        tables, scalars_mont, pmap, c)
    nb = (1 << (c - 1)) + 1
    nb_pad = -(-nb // 64) * 64 if nb >= 128 else nb

    def sbody(carry, xs):
        dig, base = xs
        absd = jnp.abs(dig)
        sign = dig < 0
        g = precs[jnp.arange(n, dtype=jnp.int32)
                  + jnp.where(sign, jnp.int32(n), jnp.int32(0))
                  + base, :]
        gt = g.T
        R = gt.shape[0]
        X, Y = gt[: R // 2], gt[R // 2:]
        if group == "g2":
            X = X.reshape(2, R // 4, n)
            Y = Y.reshape(2, R // 4, n)
        buckets = _bucket_sums(C.affine_to_jac((X, Y), ops), absd, nb,
                               ops, infinity)
        ws = _weighted_bucket_reduce(
            _pad_buckets(buckets, nb_pad, infinity), ops, infinity)
        return carry, ws

    _, wsums = jax.lax.scan(sbody, 0, (dig_blocks, bases))
    stacked = tuple(jnp.moveaxis(v, 0, -1)[..., 0, :] for v in wsums)
    return _combine_windows(stacked, c, W, ops, None, n_msm=B)


@functools.lru_cache(maxsize=32)
def _jit_msm_many(group: str, c: int, pmap: tuple):
    ops = C.FQ_OPS if group == "g1" else C.FQ2_OPS
    infinity = C.infinity_g1 if group == "g1" else C.infinity_g2
    return jax.jit(functools.partial(
        _msm_many_fused_impl, pmap=pmap, c=c, ops=ops, infinity=infinity,
        group=group))


@functools.lru_cache(maxsize=16)
def _jit_msm_many_safe(group: str, c: int, pmap: tuple):
    ops = C.FQ_OPS if group == "g1" else C.FQ2_OPS
    infinity = C.infinity_g1 if group == "g1" else C.infinity_g2
    return jax.jit(functools.partial(
        _msm_many_safe_impl, pmap=pmap, c=c, ops=ops, infinity=infinity,
        group=group))


def msm_many_staged_deferred(tables, scalars_mont_list, pmap,
                             group: str = "g1", c: int = None):
    """Dispatch B MSMs against T shared affine tables as one program and
    return a zero-arg `resolve()` that yields the batch-B device point.

    The collision-flag check (`bool(col)`, one blocking host sync that
    re-dispatches the safe program in the cryptographically-negligible
    duplicate-point case) happens inside `resolve`, NOT at dispatch:
    callers issuing several MSM programs (the Pinocchio prover's G1 and
    G2 sides, consecutive Groth16 dispatches) launch them all first and
    resolve in a second pass, so the device queue stays full in the
    common no-collision case."""
    n = tables[0][0].shape[-1]
    if c is None:
        c = auto_window(n)
    if not F._use_pallas() or n % 32 != 0 or n // 32 < 2:
        # CPU / tiny fallback: one fused program per MSM, concatenated
        resolvers = [
            msm_staged_deferred(tables[pmap[j]], _to_std_cpu(s), group=group,
                                c=c)
            for j, s in enumerate(scalars_mont_list)]

        def resolve_cpu():
            singles = [r() for r in resolvers]
            return tuple(jnp.concatenate([p[i] for p in singles], axis=-1)
                         for i in range(3))

        return resolve_cpu
    S = jnp.stack(list(scalars_mont_list), axis=0)
    from .. import aot
    X, Y, Z, col = aot.maybe_call(
        f"msm_many-{group}-c{c}-p{'_'.join(map(str, pmap))}",
        _jit_msm_many(group, c, tuple(pmap)), tuple(tables), S)

    def resolve():
        if bool(col):
            return _jit_msm_many_safe(group, c, tuple(pmap))(tuple(tables), S)
        return (X, Y, Z)

    return resolve


def msm_many_staged_device(tables, scalars_mont_list, pmap,
                           group: str = "g1", c: int = None) -> C.Point:
    """B MSMs against T shared affine tables, one program dispatch.
    scalars_mont_list: list of (nl, n) MONTGOMERY scalar batches; returns
    the batch-B device point (callers unpack once).  Single-program
    convenience wrapper over msm_many_staged_deferred."""
    return msm_many_staged_deferred(tables, scalars_mont_list, pmap,
                                    group=group, c=c)()


@functools.lru_cache(maxsize=4)
def _jit_to_std():
    return jax.jit(
        lambda s: F.from_mont(s, F.FR)[: params.FR_LIMBS])


def _to_std_cpu(s_mont):
    return _jit_to_std()(s_mont)


@functools.lru_cache(maxsize=8)
def _jit_windows_extract(c: int):
    return jax.jit(functools.partial(_scalars_to_windows, c=c))


@functools.lru_cache(maxsize=8)
def _jit_signed_windows_extract(c: int):
    return jax.jit(functools.partial(_scalars_to_signed_windows, c=c))


@functools.lru_cache(maxsize=32)
def _jit_window_combine(group: str, c: int, n_windows: int):
    """Combine per-window sums on device: window w is doubled c*w times
    (all windows in parallel with a masked double), then tree-summed.
    Avoids both per-window host round-trips (slow over a TPU tunnel) and
    deep fused Horner graphs."""
    ops = C.FQ_OPS if group == "g1" else C.FQ2_OPS

    def run(pts):
        widx = jnp.arange(n_windows)

        def body(d, p):
            dX, dY, dZ = C.point_double(p, ops)
            cond = d < (c * widx)
            return (ops.select(cond, dX, p[0]),
                    ops.select(cond, dY, p[1]),
                    ops.select(cond, dZ, p[2]))

        pts = jax.lax.fori_loop(0, c * (n_windows - 1), body, pts)
        return _hs_total(pts, ops)

    return jax.jit(run)


def msm_staged_deferred(points, scalars_std: jnp.ndarray,
                        group: str = "g1", c: int = None):
    """Dispatch one fused MSM program; returns a zero-arg `resolve()`
    yielding the batch-1 device point.  The collision-flag host sync is
    deferred to `resolve` so several MSM dispatches can overlap (see
    msm_many_staged_deferred)."""
    if c is None:
        c = auto_window(points[0].shape[-1])
    from .. import aot
    X, Y, Z, col = aot.maybe_call(
        f"msm_fused-{group}-c{c}-aff{int(len(points) == 2)}",
        _jit_msm_fused(group, c, len(points) == 2), points, scalars_std)

    def resolve():
        if bool(col):
            return _jit_msm_safe(group, c)(points, scalars_std)
        return (X, Y, Z)

    return resolve


def msm_staged_device(points, scalars_std: jnp.ndarray,
                      group: str = "g1", c: int = None) -> C.Point:
    """Host-staged Pippenger returning the batch-1 result ON DEVICE: one
    compiled per-window program dispatched asynchronously W times plus one
    combine program, no host sync.  Callers batching several MSMs should
    collect these and unpack once (one fetch for the whole prove).

    `points` may be Jacobian (X, Y, Z) or affine (X, Y) — affine bases
    run the dominant bucket phase on the 11-mul mixed add (see
    curve_jax.to_affine for the once-per-CRS normalization).

    Despite the name (kept for API stability), the MSM now runs as ONE
    fused program (_msm_fused_impl) rather than host-staged windows:
    through the axon tunnel each program dispatch costs ~25 ms, which at
    ~20 windows dominated the whole MSM.  The collision flag costs one
    host sync; a True flag (duplicate points in a bucket) re-dispatches
    the safe on-demand program."""
    return msm_staged_deferred(points, scalars_std, group=group, c=c)()


def msm_staged(points: C.Point, scalars_std: jnp.ndarray, group: str = "g1",
               c: int = None):
    """Host-staged Pippenger: returns a single golden point (one device->
    host fetch at the end).  c=None picks the window width from the batch
    size."""
    final = msm_staged_device(points, scalars_std, group=group, c=c)
    unpack = C.unpack_g1 if group == "g1" else C.unpack_g2
    return unpack(final)[0]


# ---------------------------------------------------------------------------
# Fixed-base batches
# ---------------------------------------------------------------------------

def _table_cache_dir() -> str:
    import os
    d = os.environ.get("ZUKELANG_TABLE_CACHE")
    if d is None:
        d = os.path.join(os.path.dirname(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__)))), ".zk_cache")
    os.makedirs(d, exist_ok=True)
    return d


@functools.lru_cache(maxsize=8)
def _fixed_base_table(group: str, c: int) -> Tuple[np.ndarray, ...]:
    """Host-precomputed window table flattened as (W * 2^c) points:
    entry [w * 2^c + d] = d * 2^(cw) * G, packed Montgomery limbs.

    The golden-point build (W * 2^c group adds in Python) costs minutes
    for G2, so tables are persisted to .zk_cache/ across processes."""
    import os
    path = os.path.join(_table_cache_dir(), f"fixed_base_{group}_{c}.npz")
    try:
        z = np.load(path)
        return tuple(z[f"a{i}"] for i in range(len(z.files)))
    except Exception:
        pass

    from ..golden.curve import G1, G2
    gen = G1.generator() if group == "g1" else G2.generator()
    n_windows = (256 + c - 1) // c
    per = 1 << c

    # May be reached while tracing (first jitted fixed_base_mul call).
    # Escape to a FRESH eval context — not ensure_compile_time_eval, whose
    # compile-time-eval trace has no rule for Pallas primitives
    # (program_id), which zeroed the round-2 bench.  Under eval_context the
    # inner jit compiles normally (Pallas included) and returns concrete
    # host constants even when an outer trace is active.
    with _eval_context():
        # The device build (jit + segmented scan) needs no Pallas: on CPU
        # _seg_scan_auto falls back to the log-depth HS scan, still orders
        # of magnitude faster than W * 2^c sequential golden adds.
        if n_windows * per >= 64:
            out = tuple(np.asarray(x)
                        for x in _fixed_base_table_device(group, c, gen))
        else:
            pts = []
            base = gen
            for w in range(n_windows):
                acc = type(gen).zero()
                for d in range(per):
                    pts.append(acc)
                    acc = acc + base
                for _ in range(c):
                    base = base.double()
            packed = C.pack_g1(pts) if group == "g1" else C.pack_g2(pts)
            out = tuple(np.asarray(x) for x in packed)
    try:
        np.savez_compressed(path, **{f"a{i}": a for i, a in enumerate(out)})
    except Exception:
        pass
    return out


def _fixed_base_table_device(group: str, c: int, gen) -> C.Point:
    """Build the window table on device: W window bases 2^(cw)*G come from
    W*c host doublings (cheap); each block's multiples d*B_w are one
    segmented prefix scan of the broadcast base, batch-normalized to
    affine.  Replaces W * 2^c sequential golden adds (minutes for G2)."""
    ops = C.FQ_OPS if group == "g1" else C.FQ2_OPS
    n_windows = (256 + c - 1) // c
    per = 1 << c
    n = n_windows * per
    bases = []
    b = gen
    for _ in range(n_windows):
        bases.append(b)
        for _ in range(c):
            b = b.double()
    Bp = C.pack_g1(bases) if group == "g1" else C.pack_g2(bases)

    def build(Bp):
        rep = tuple(jnp.repeat(x, per, axis=-1) for x in Bp)
        seg = jnp.repeat(jnp.arange(n_windows, dtype=jnp.int32), per)
        sc = _seg_scan_auto(rep, seg, ops, group)   # (d+1)*B_w at block pos d
        # shift right one inside each block; block starts become infinity
        t = tuple(_shift1(x) for x in sc)
        starts = (jnp.arange(n) % per) == 0
        tz = ops.select(starts, ops.zeros_like(t[2]), t[2])
        xa, ya = C.to_affine((t[0], t[1], tz), ops)
        one = jnp.broadcast_to(
            jnp.asarray(np.array(F._int_to_limbs(F.FQ.r_mod_p, F.FQ.nl),
                                 np.uint32))[:, None], (F.FQ.nl, n))
        inf = ops.is_zero(xa) & ops.is_zero(ya)
        if group == "g2":
            zflag = jnp.stack([jnp.where(inf[None], 0, one),
                               jnp.zeros((F.FQ.nl, n), jnp.uint32)])
        else:
            zflag = jnp.where(inf[None], 0, one)
        return xa, ya, zflag

    return jax.jit(build)(Bp)


@functools.lru_cache(maxsize=8)
def fixed_base_table_device(group: str, c: int) -> C.Point:
    """The window table as DEVICE-resident arrays, for passing into jitted
    callers as an ARGUMENT.  Baking it as an HLO constant instead (the
    legacy table=None path) is only viable for small c: a c=16 table is
    ~300 MB and constant-laden programs exceed the axon tunnel's
    remote-compile request size limit (HTTP 413)."""
    return tuple(jnp.asarray(x) for x in _fixed_base_table(group, c))


def fixed_base_mul(scalars_std: jnp.ndarray, group: str = "g1",
                   c: int = 8, table: C.Point = None) -> C.Point:
    """[g * s for s in scalars] — window-table gathers + mixed adds (the
    table is affine: 11 muls per add lane instead of 24).

    On TPU the W per-element window points are fetched with ONE row gather
    (rows ~10x faster than lane gathers) and summed by the fused
    bucket-scan kernel with one segment per element (chunk size = W) —
    the same kernel the MSM bucket phase uses.  Elsewhere: a fori of
    lane-gather + madd steps.

    `table`: pass fixed_base_table_device(group, c) when calling from an
    outer jit so the table is a traced argument, not an HLO constant."""
    if table is not None:
        tX, tY, tZ = table
    else:
        tX, tY, tZ = tuple(jnp.asarray(x) for x in _fixed_base_table(group, c))
    ops = C.FQ_OPS if group == "g1" else C.FQ2_OPS
    # table entries are (0, 1, 0) at infinity -> affine marker (0, 0)
    tinf = ops.is_zero(tZ)
    tY = ops.select(tinf, ops.zeros_like(tY), tY)
    digits = _scalars_to_windows(scalars_std, c)  # (W, N)
    n_windows = digits.shape[0]

    if F._use_pallas() and digits.shape[1] >= 128:
        return _fixed_base_rows(tX, tY, digits, c, group)

    def window_points(w, dig):
        idx = w * (1 << c) + dig
        return tuple(t[..., idx] for t in (tX, tY))

    def body(w, acc):
        dig = jax.lax.dynamic_index_in_dim(digits, w, 0, keepdims=False)
        return C.point_madd(acc, window_points(w, dig), ops)

    acc = C.affine_to_jac(window_points(0, digits[0]), ops)
    return jax.lax.fori_loop(1, n_windows, body, acc)


# Max elements per fixed-base kernel dispatch: the gathered row stream is
# W * SLICE rows (~800 MB at W=32, SLICE=2^17, G1) — bounds peak HBM while
# one compiled shape serves every large batch via lax.scan.
_FB_SLICE = 1 << 17


def _fixed_base_rows(tX, tY, digits: jnp.ndarray, c: int,
                     group: str) -> C.Point:
    """Fixed-base batch via the row-major scan kernel.

    Table rows: entry [w*2^c + d] = d*2^(cw)*G as stacked [X; Y] limbs.
    Element e's W window points occupy chunk e of the (N*W)-row stream;
    seg id = e makes each chunk one segment, so the (tails-only) scan
    output is the full per-element sum.  Partial sums are strictly
    smaller as group-log values than the next window's point (sum of low
    windows < 2^(cw) <= any nonzero d*2^(cw)), so the doubling-degenerate
    madd case cannot occur; infinities (d = 0) are identity-handled
    in-kernel.  Batches beyond _FB_SLICE run as a lax.scan over slices —
    one compiled shape, bounded peak memory."""
    W, n = digits.shape

    def fl(v):
        return v.reshape(2 * v.shape[1], v.shape[2]) if v.ndim == 3 else v

    rows = jnp.concatenate([fl(tX), fl(tY)], axis=0).T   # (W*2^c, R)

    slice_ = _FB_SLICE // (2 if group == "g2" else 1)
    if n <= slice_:
        tails = _fb_rows_slice(rows, digits, c, group)
    else:
        # Pad up to a whole number of slices (zero digits gather the d=0
        # table entry = infinity, identity-handled in-kernel) so the HBM
        # bound holds for ANY large batch, not just multiples of slice_.
        npad = -(-n // slice_) * slice_
        digs_p = (jnp.pad(digits, ((0, 0), (0, npad - n)))
                  if npad != n else digits)
        n_sl = npad // slice_
        digs = digs_p.reshape(W, n_sl, slice_).transpose(1, 0, 2)

        def body(carry, dslice):
            return carry, _fb_rows_slice(rows, dslice, c, group)

        _, outs = jax.lax.scan(body, 0, digs)   # each (n_sl, rows, SLICE)
        tails = tuple(
            jnp.moveaxis(o, 0, 1).reshape(o.shape[1], npad)[..., :n]
            for o in outs)
    if group == "g2":
        nl = tails[0].shape[0] // 2
        return tuple(v.reshape(2, nl, n) for v in tails)
    return tails


def _fb_rows_slice(rows: jnp.ndarray, digits: jnp.ndarray, c: int,
                   group: str) -> Tuple[jnp.ndarray, ...]:
    """One fixed-base slice: row gather + tails-only scan -> 3 x (rows, m)."""
    from . import pallas_kernels as PK
    W, m = digits.shape
    offs = (jnp.arange(W, dtype=jnp.int32) << c)[None, :]   # (1, W)
    idx = (digits.T.astype(jnp.int32) + offs).reshape(m * W)
    g = rows[idx, :]                                     # (m*W, R)
    R = g.shape[1]
    pts3 = g.reshape(m, W, R).transpose(1, 2, 0)         # (K=W, R, m)
    seg = jnp.arange(m, dtype=jnp.int32)[None, None, :]
    seg3 = jnp.broadcast_to(seg, (W, 1, m))
    scanned3, _col = PK.bucket_scan_rows(pts3, seg3, seg3, group,
                                         tails_only=True)
    return tuple(v[0] for v in scanned3)                 # 3 x (rows, m)


def powers_of(s: int, d: int) -> jnp.ndarray:
    """[s^0..s^d] standard form, packed (nl, d+1); host-side (d modmuls)."""
    out = []
    acc = 1
    for _ in range(d + 1):
        out.append(acc)
        acc = acc * s % params.R
    return F.pack(out, F.FR)


def g_powers(s: int, d: int, group: str = "g1") -> C.Point:
    """{g^(s^i)}_{i in [0..d]} (curve.ml:106-109) as one fixed-base batch."""
    return fixed_base_mul(powers_of(s, d), group=group)
