#!/usr/bin/env python
"""Standalone MSM micro-benchmark on the real TPU chip.

Usage: python scripts/bench_msm.py [logN] [c ...]
Times msm_staged for G1 (and optionally G2) at 2^logN random terms for each
window width given (default: auto).  Correctness cross-check against golden
G1.dot on a small prefix is done at logN <= 12 only (golden is slow).
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np

from zukelang_tpu import jax_setup  # noqa: F401  (persistent compile cache)
from zukelang_tpu import params
from zukelang_tpu.golden.curve import G1
from zukelang_tpu.golden.field import Fr
from zukelang_tpu.ops import curve_jax as C
from zukelang_tpu.ops import field_jax as F
from zukelang_tpu.ops import msm


def rand_points_device(n: int, seed: int = 7):
    """Pseudo-random G1 batch built on device: k*G for small random k via
    fixed-base (fast), avoiding n golden scalar-mults on host."""
    rng = np.random.RandomState(seed)
    ks = rng.randint(1, 1 << 30, size=n).astype(object)
    S = F.pack([int(k) for k in ks], F.FR)
    pts = msm.fixed_base_mul(S, group="g1")
    return pts, [int(k) for k in ks]


def main():
    logn = int(sys.argv[1]) if len(sys.argv) > 1 else 18
    cs = [int(x) for x in sys.argv[2:] if not x.startswith('-')] or [None]
    n = 1 << logn

    rng = np.random.RandomState(11)
    scalars = [int.from_bytes(rng.bytes(32), "little") % params.R
               for _ in range(n)]
    S = F.pack(scalars, F.FR)

    t0 = time.time()
    P, ks = rand_points_device(n)
    import jax
    jax.device_get(P[0][..., :1])
    print(f"point gen: {time.time() - t0:.2f}s", flush=True)

    expected = None
    if logn <= 12:
        g = G1.generator()
        golden_pts = [g * k for k in ks]
        expected = G1.dot(golden_pts, [Fr(s) for s in scalars])

    variants = [] if "--no-jac" in sys.argv else [("jac", P)]
    if "--no-affine" not in sys.argv:
        t0 = time.time()
        Paff = C.to_affine(P, C.FQ_OPS)
        jax.device_get(Paff[0][..., :1])
        print(f"to_affine: {time.time() - t0:.2f}s", flush=True)
        variants.append(("aff", Paff))

    for c in cs:
        for tag, pts in variants:
            # warm-up
            t0 = time.time()
            r = msm.msm_staged(pts, S, group="g1", c=c)
            t_first = time.time() - t0
            times = []
            for _ in range(3):
                t0 = time.time()
                r = msm.msm_staged(pts, S, group="g1", c=c)
                times.append(time.time() - t0)
            t = min(times)
            ceff = c if c is not None else msm.auto_window(n)
            ok = "" if expected is None else (
                " OK" if r == expected else " MISMATCH!")
            print(f"G1 MSM[{tag}] 2^{logn} c={ceff}: {t:.3f}s warm "
                  f"({n / t / 1e6:.2f} Mterm/s), first {t_first:.1f}s{ok}",
                  flush=True)


if __name__ == "__main__":
    main()
