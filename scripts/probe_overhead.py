#!/usr/bin/env python
"""Measure per-op dispatch overhead on the TPU: a jitted chain of R
dependent Pallas mont_muls at width N, for several (R, N).  If time scales
with R but not N, ops are latency-bound and fusing chains into single
kernels is the right optimization."""

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


def chain(r, kind):
    def run(a, b):
        x = a
        for _ in range(r):
            if kind == "pallas":
                x = PK.mont_mul_pallas(x, b, F.FQ, interpret=False)
            else:
                x = F.mont_mul_conv(x, b, F.FQ)
        return x
    return jax.jit(run)


def main():
    rng = np.random.RandomState(0)
    for kind in ("pallas",):
        for logn in (10, 13, 16, 18, 20):
            n = 1 << logn
            a = F.pack([int.from_bytes(rng.bytes(47), "little")
                        for _ in range(min(n, 256))] * max(1, n // 256), F.FQ)
            a = a[:, :n]
            b = a
            for r in (1, 16, 64):
                fn = chain(r, kind)
                out = fn(a, b)
                sync(out)
                t0 = time.time()
                for _ in range(3):
                    out = fn(a, b)
                sync(out)
                t = (time.time() - t0) / 3
                per_op = t / r
                print(f"{kind} N=2^{logn} R={r:3d}: {t*1e3:8.2f} ms "
                      f"({per_op*1e6:8.1f} us/op, "
                      f"{n*r/t/1e6:8.1f} Mmul/s)", flush=True)


if __name__ == "__main__":
    main()
