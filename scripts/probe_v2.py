#!/usr/bin/env python
"""Marginal in-program cost of each v2 MSM window stage (chained-R jits).
Usage: python scripts/probe_v2.py [logN] [c]."""

import functools
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from zukelang_tpu import jax_setup  # noqa: F401
from zukelang_tpu.ops import curve_jax as C
from zukelang_tpu.ops import field_jax as F
from zukelang_tpu.ops import msm
from zukelang_tpu.ops import pallas_kernels as PK


def sync(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    jax.device_get(leaf if leaf.ndim == 0 else leaf[..., :1])


def marginal(name, build, r_lo=1, r_hi=5):
    f_lo, f_hi = jax.jit(build(r_lo)), jax.jit(build(r_hi))

    def t(f):
        sync(f())
        best = 1e9
        for _ in range(3):
            t0 = time.time()
            sync(f())
            best = min(best, time.time() - t0)
        return best

    lo, hi = t(f_lo), t(f_hi)
    per = (hi - lo) / (r_hi - r_lo)
    print(f"{name:36s} {per*1e3:9.3f} ms/op  (R{r_lo}={lo*1e3:.1f} "
          f"R{r_hi}={hi*1e3:.1f})", flush=True)


def main():
    logn = int(sys.argv[1]) if len(sys.argv) > 1 else 18
    c = int(sys.argv[2]) if len(sys.argv) > 2 else 14
    n = 1 << logn
    K = 32
    M = n // K
    nb = (1 << (c - 1)) + 1
    rng = np.random.RandomState(0)

    prec = jnp.asarray(
        rng.randint(0, 1 << 16, size=(2 * n, 24)).astype(np.uint32))
    dig = jnp.asarray(
        rng.randint(-(1 << (c - 1)), 1 << (c - 1), size=n).astype(np.int32))
    d_sorted = jnp.sort(jnp.abs(dig))
    order0 = jnp.asarray(rng.permutation(n).astype(np.int32))
    pts3_const = jnp.asarray(
        rng.randint(0, 1 << 16, size=(K, 48, M)).astype(np.uint32))
    seg3 = np.sort(np.asarray(d_sorted)).reshape(M, K).T[:, None, :]
    seg3 = jnp.asarray(seg3)
    segp3 = jnp.concatenate([seg3[:1], seg3[:-1]], axis=0)
    bX = jnp.asarray(rng.randint(0, 1 << 16, size=(12, 8192)).astype(np.uint32))

    def sortphase(r):
        def run():
            d = dig
            for i in range(r):
                ds, od = PK.bitonic_argsort(jnp.abs(d))
                d = ds ^ jnp.int32(i + 1)
            return d
        return run

    def rowgather(r):
        def run():
            y = prec[:n]
            for _ in range(r):
                y = prec[(order0 + y[0, 0]) % (2 * n), :]
            return y
        return run

    def reshape_t(r):
        def run():
            y = prec[:n]
            for i in range(r):
                z = y.reshape(M, K, 24).transpose(1, 2, 0)
                y = z.transpose(2, 0, 1).reshape(n, 24) ^ jnp.uint32(i)
            return y
        return run

    def scan_kernel(r):
        def run():
            p = pts3_const
            for i in range(r):
                (ox, oy, oz), fl = PK.bucket_scan_rows(p, seg3, segp3, "g1")
                p = jnp.concatenate([ox, oy], axis=1) ^ jnp.uint32(i)
            return p
        return run

    def searchsorted2(r):
        b_ids = jnp.arange(nb, dtype=jnp.int32)

        def run():
            acc = jnp.int32(0)
            d = d_sorted
            for i in range(r):
                p1 = jnp.searchsorted(d, b_ids, side="right")
                p2 = jnp.searchsorted(d, b_ids, side="left")
                acc = acc + p1.sum() + p2.sum()
                d = d + (acc % 2).astype(d.dtype) * 0
            return acc
        return run

    def wsum(r):
        pts = (bX, bX, bX)

        def run():
            p = pts
            for i in range(r):
                s, w = PK.weighted_chunk_sums(p, K, "g1")
                p = tuple(jnp.pad(x, ((0, 0), (0, 8192 - x.shape[-1])))
                          ^ jnp.uint32(i) for x in s)
            return p
        return run

    def seg_scan_m(r):
        seg = jnp.asarray(np.sort(rng.randint(0, nb, size=M)).astype(np.int32))
        pts = tuple(x[:, :M] for x in (bX, bX, bX))

        def run():
            p = pts
            for i in range(r):
                p = msm._seg_scan_auto(p, seg, C.FQ_OPS, "g1")
                p = tuple(x ^ jnp.uint32(0) for x in p)
            return p
        return run

    def tail_gather(r):
        sc3 = pts3_const[:, :12, :]
        kb = jnp.asarray(rng.randint(0, K, size=nb).astype(np.int32))
        mb = jnp.asarray(rng.randint(0, M, size=nb).astype(np.int32))

        def run():
            acc = jnp.uint32(0)
            for i in range(r):
                t = sc3[(kb + acc) % K, :, mb]
                acc = acc + t[0, 0]
            return acc
        return run

    def wreduce_v2(r):
        pts = (bX, bX, bX)

        def run():
            p = pts
            for i in range(r):
                one = msm._weighted_reduce_v2(p, C.FQ_OPS, C.infinity_g1,
                                              "g1")
                p = tuple(jnp.pad(x, ((0, 0), (0, 8191)))
                          for x in one)
            return p
        return run

    marginal("2x searchsorted(nb)", searchsorted2, 1, 4)
    marginal("tail gather [kb,:,mb]", tail_gather, 1, 4)
    marginal("weighted_chunk_sums(8192)", wsum, 1, 3)
    marginal("full weighted_reduce_v2(8192)", wreduce_v2, 1, 3)
    marginal("seg_scan_auto(M=8192)", seg_scan_m, 1, 3)


if __name__ == "__main__":
    main()
