#!/usr/bin/env python
"""Marginal in-program cost of MSM window building blocks: chained-R
programs isolate per-op cost from dispatch overhead.  Usage:
python scripts/probe_gather.py [logN]."""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from zukelang_tpu import jax_setup  # noqa: F401
from zukelang_tpu.ops import field_jax as F
from zukelang_tpu.ops import pallas_kernels as PK


def sync(x):
    jax.device_get(jax.tree_util.tree_leaves(x)[0][..., :1])


def marginal(name, build, r_lo=1, r_hi=8):
    f_lo = jax.jit(build(r_lo))
    f_hi = jax.jit(build(r_hi))

    def t(f):
        out = f()
        sync(out)
        best = 1e9
        for _ in range(3):
            t0 = time.time()
            out = f()
            sync(out)
            best = min(best, time.time() - t0)
        return best

    lo, hi = t(f_lo), t(f_hi)
    per = (hi - lo) / (r_hi - r_lo)
    print(f"{name:40s} {per*1e3:9.3f} ms/op   (R{r_lo}={lo*1e3:.1f} "
          f"R{r_hi}={hi*1e3:.1f})", flush=True)


def main():
    logn = int(sys.argv[1]) if len(sys.argv) > 1 else 18
    n = 1 << logn
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randint(0, 1 << 16, size=(12, n)).astype(np.uint32))
    xr = jnp.asarray(np.ascontiguousarray(np.asarray(x).T))
    order = jnp.asarray(rng.permutation(n).astype(np.int32))
    dig = jnp.asarray(rng.randint(0, 1 << 13, size=n).astype(np.int32))

    def col_gather(r):
        def run():
            y = x
            for _ in range(r):
                y = y[:, order]
            return y
        return run

    def row_gather(r):
        def run():
            y = xr
            for _ in range(r):
                y = y[order, :]
            return y
        return run

    def bitonic(r):
        def run():
            d = dig
            for i in range(r):
                d2, _ = PK.bitonic_argsort(d)
                d = d2 ^ jnp.int32(i + 1)  # break CSE, keep range
            return d
        return run

    def xla_sort(r):
        def run():
            d = dig
            for i in range(r):
                d2, _ = jax.lax.sort_key_val(
                    d, jnp.arange(n, dtype=jnp.int32))
                d = d2 ^ jnp.int32(i + 1)
            return d
        return run

    def transpose3(r):
        def run():
            y = x
            for _ in range(r):
                y = y.reshape(12, n // 32, 32).transpose(2, 0, 1)\
                     .transpose(1, 2, 0).reshape(12, n)
            return y
        return run

    marginal("column gather (12, N)[:, perm]", col_gather)
    marginal("row gather (N, 12)[perm, :]", row_gather)
    marginal("bitonic argsort", bitonic, 1, 4)
    marginal("xla sort_key_val", xla_sort, 1, 4)
    marginal("to3-style transpose pair", transpose3)


if __name__ == "__main__":
    main()
