#!/usr/bin/env python
"""Phase-level MSM profile on the real TPU chip.

Times each stage of one Pippenger window (digit extract, argsort, gather,
phase-1 chunked scan, carry scan, weighted bucket reduce) plus the full
staged MSM, to locate the bottleneck.  Usage: python scripts/profile_msm.py
[logN] [c].
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from zukelang_tpu import jax_setup  # noqa: F401
from zukelang_tpu import params
from zukelang_tpu.ops import curve_jax as C
from zukelang_tpu.ops import field_jax as F
from zukelang_tpu.ops import msm


def sync(x):
    jax.device_get(jax.tree_util.tree_leaves(x)[0][..., :1])


def timeit(name, fn, *args, reps=3):
    fn_j = fn if hasattr(fn, "lower") else jax.jit(fn)
    t0 = time.time()
    out = fn_j(*args)
    sync(out)
    first = time.time() - t0
    best = 1e9
    for _ in range(reps):
        t0 = time.time()
        out = fn_j(*args)
        sync(out)
        best = min(best, time.time() - t0)
    print(f"{name:34s} {best*1e3:9.2f} ms   (first {first:.1f}s)", flush=True)
    return out


def main():
    logn = int(sys.argv[1]) if len(sys.argv) > 1 else 18
    c = int(sys.argv[2]) if len(sys.argv) > 2 else msm.auto_window(1 << logn)
    n = 1 << logn
    print(f"profiling one G1 window at N=2^{logn}, c={c}", flush=True)

    rng = np.random.RandomState(11)
    scalars = [int.from_bytes(rng.bytes(32), "little") % params.R
               for _ in range(n)]
    S = F.pack(scalars, F.FR)

    t0 = time.time()
    ks = rng.randint(1, 1 << 30, size=n)
    P = msm.fixed_base_mul(F.pack([int(k) for k in ks], F.FR), group="g1")
    Paff = C.to_affine(P, C.FQ_OPS)
    sync(Paff)
    print(f"point gen: {time.time()-t0:.1f}s", flush=True)

    digits = timeit("digit extract (all windows)",
                    lambda s: msm._scalars_to_windows(s, c), S)
    dig = digits[3]

    order = timeit("argsort (1 window)", lambda d: jnp.argsort(d), dig)

    def gather(o, d):
        return tuple(x[..., o] for x in Paff) + (d[o],)

    g = timeit("gather pts+digits (1 window)", gather, order, dig)
    pts_sorted = g[:2]
    d_sorted = g[2]

    ops = C.FQ_OPS
    K = 32
    M = n // K

    def phase1(pts, dsort):
        # replicate _bucket_sums_chunked phase 1 only
        d2 = dsort.reshape(M, K)
        p2 = tuple(x.reshape(x.shape[:-1] + (M, K)) for x in pts)

        def cur_jac(cur):
            return C.affine_to_jac(cur, ops)

        def step(t, st):
            accX, accY, accZ, outX, outY, outZ = st
            cur = tuple(jax.lax.dynamic_index_in_dim(x, t, x.ndim - 1,
                                                     keepdims=False)
                        for x in p2)
            same = jax.lax.dynamic_index_in_dim(d2, t, 1, keepdims=False) == \
                jax.lax.dynamic_index_in_dim(d2, t - 1, 1, keepdims=False)
            aX, aY, aZ = C.point_madd((accX, accY, accZ), cur, ops)
            cX, cY, cZ = cur_jac(cur)
            accX = ops.select(same, aX, cX)
            accY = ops.select(same, aY, cY)
            accZ = ops.select(same, aZ, cZ)
            outX = jax.lax.dynamic_update_index_in_dim(outX, accX, t,
                                                       outX.ndim - 1)
            outY = jax.lax.dynamic_update_index_in_dim(outY, accY, t,
                                                       outY.ndim - 1)
            outZ = jax.lax.dynamic_update_index_in_dim(outZ, accZ, t,
                                                       outZ.ndim - 1)
            return accX, accY, accZ, outX, outY, outZ

        first = cur_jac(tuple(x[..., 0] for x in p2))
        out0 = tuple(jnp.zeros(f.shape + (K,), f.dtype) for f in first)
        out0 = tuple(jax.lax.dynamic_update_index_in_dim(o, f, 0, o.ndim - 1)
                     for o, f in zip(out0, first))
        return jax.lax.fori_loop(1, K, step, (*first, *out0))

    ph1 = timeit("phase1 in-chunk scan (K=32)", phase1, pts_sorted, d_sorted)

    accX, accY, accZ = ph1[0], ph1[1], ph1[2]
    d2 = np.asarray(d_sorted).reshape(M, K)
    last_seg = jnp.asarray(d2[:, K - 1])

    timeit("phase2 HS carry scan (M)",
           lambda a, b, cc, s: msm._hs_segmented_scan((a, b, cc), s, ops),
           accX, accY, accZ, last_seg)

    nb = 1 << c
    bX, bY, bZ = timeit(
        "bucket sums full (chunked)",
        lambda pts, d: msm._bucket_sums_chunked(pts, d, nb, ops,
                                                C.infinity_g1),
        pts_sorted, d_sorted)

    timeit("weighted bucket reduce",
           lambda a, b2, cc: msm._weighted_bucket_reduce((a, b2, cc), ops,
                                                         C.infinity_g1),
           bX, bY, bZ)

    # full single-window program as dispatched by msm_staged_device
    wfn = msm._jit_window("g1", c, affine=True)
    timeit("full window program", wfn, Paff, dig)

    # full MSM end to end
    def full():
        t0 = time.time()
        r = msm.msm_staged(Paff, S, group="g1", c=c)
        return time.time() - t0, r

    full()  # warm
    best = min(full()[0] for _ in range(3))
    nw = digits.shape[0]
    print(f"full staged MSM ({nw} windows):     {best*1e3:9.2f} ms  "
          f"({n/best/1e6:.2f} Mterm/s)", flush=True)


if __name__ == "__main__":
    main()
