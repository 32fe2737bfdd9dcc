#!/usr/bin/env python
"""Phase profile of the FUSED window program (signed digits + Pallas scan
kernels) plus sort-strategy microbenchmarks.  Usage:
python scripts/profile_msm2.py [logN] [c]."""

import functools
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
from zukelang_tpu.ops import pallas_kernels as PK


def sync(x):
    jax.device_get(jax.tree_util.tree_leaves(x)[0][..., :1])


def timeit(name, fn, *args, reps=3):
    fn_j = jax.jit(fn)
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
    print(f"{name:36s} {best*1e3:9.2f} ms   (first {first:.1f}s)", flush=True)
    return out


def main():
    logn = int(sys.argv[1]) if len(sys.argv) > 1 else 18
    c = int(sys.argv[2]) if len(sys.argv) > 2 else 14
    n = 1 << logn
    K = 32
    ops = C.FQ_OPS
    nb = (1 << (c - 1)) + 1
    print(f"fused-window profile N=2^{logn} c={c} nb={nb}", flush=True)

    rng = np.random.RandomState(11)
    scalars = [int.from_bytes(rng.bytes(32), "little") % params.R
               for _ in range(n)]
    S = F.pack(scalars, F.FR)
    ks = rng.randint(1, 1 << 30, size=n)
    P = msm.fixed_base_mul(F.pack([int(k) for k in ks], F.FR), group="g1")
    Paff = C.to_affine(P, C.FQ_OPS)
    sync(Paff)
    print("points ready", flush=True)

    dig = msm._jit_signed_windows_extract(c)(S)[3]

    # sort strategies
    timeit("argsort int32", jnp.argsort, dig)
    absd = jnp.abs(dig)
    timeit("argsort |d| int32", jnp.argsort, absd)

    def composite_sort(a):
        key = (a.astype(jnp.uint32) << logn) | jnp.arange(n, dtype=jnp.uint32)
        s = jnp.sort(key)
        return s >> logn, s & jnp.uint32(n - 1)

    if c - 1 + logn <= 31:
        timeit("composite u32 single-array sort", composite_sort, absd)

    def skv(a):
        return jax.lax.sort_key_val(a, jnp.arange(n, dtype=jnp.int32))

    timeit("lax.sort_key_val", skv, absd)

    # phases (cumulative)
    def ph_sign(points, d):
        return msm._apply_signs(points, d, ops)

    pts_f, absd2 = timeit("sign flip", ph_sign, Paff, dig)

    def ph_sortgather(points, a):
        order = jnp.argsort(a)
        return tuple(x[..., order] for x in points), a[order]

    pts_s, d_sorted = timeit("argsort + gather", ph_sortgather, pts_f, absd2)

    scan_fn = functools.partial(PK.bucket_scan_pallas, K=K, group="g1",
                                interpret=False)
    scanned, collided = timeit("bucket scan kernel", scan_fn, pts_s, d_sorted)

    def ph_carry(sc, d):
        return msm._carry_scatter(sc, d, nb, ops, C.infinity_g1, K, "g1")

    buckets = timeit("carry + scatter", ph_carry, scanned, d_sorted)

    def ph_reduce(b):
        nb_pad = -(-nb // 64) * 64
        bp = msm._pad_buckets(b, nb_pad, C.infinity_g1)
        return msm._weighted_bucket_reduce(bp, ops, C.infinity_g1, group="g1")

    timeit("weighted reduce (fused)", ph_reduce, buckets)

    wfn = msm._jit_window("g1", c, affine=True)
    timeit("full window program", wfn, Paff, dig)

    def full():
        t0 = time.time()
        r = msm.msm_staged(Paff, S, group="g1", c=c)
        return time.time() - t0

    full()
    best = min(full() for _ in range(3))
    nw = 1 + (256 + c - 1) // c if False else -(-256 // c)
    print(f"full staged MSM:                     {best*1e3:9.2f} ms  "
          f"({n/best/1e6:.2f} Mterm/s)", flush=True)


if __name__ == "__main__":
    main()
