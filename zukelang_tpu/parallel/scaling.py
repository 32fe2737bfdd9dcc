"""MSM/NTT scaling-efficiency measurement across mesh sizes.

BASELINE.md asks for MSM ops/s at 1 chip / 1 host / N hosts with >= 70%
multi-host scaling efficiency.  This harness runs the sharded pipelines
over meshes of 1, 2, 4, ... devices and reports parallel efficiency
  eff(D) = t(1) / (D * t(D)).

On this round's hardware only one real TPU chip is reachable (the driver
validates the multi-chip path on a virtual CPU mesh), so numbers from a
CPU mesh measure *code-path structure*, not ICI bandwidth; run on a real
pod slice for meaningful efficiencies.

    python -m zukelang_tpu.parallel.scaling --logn 14
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp

from .. import params
from ..golden.curve import G1
from ..ops import curve_jax as C
from ..ops import field_jax as F
from . import sharded


def measure_msm_scaling(logn: int, device_counts=None, c: int = 8,
                        max_windows: int = None):
    import random
    random.seed(1)
    n_dev = len(jax.devices())
    if device_counts is None:
        device_counts = [d for d in (1, 2, 4, 8, 16, 32)
                         if d <= n_dev]
    N = 1 << logn
    base = [G1.generator() * (i + 1) for i in range(64)]
    P = tuple(jnp.tile(x, (1, N // 64)) for x in C.pack_g1(base))
    S = F.pack([random.randrange(params.R) for _ in range(N)], F.FR)

    results = {}
    t1 = None
    for d in device_counts:
        mesh = sharded.make_mesh(d)
        # warm-up/compile
        sharded.sharded_msm_g1(mesh, P, S, c=c, max_windows=max_windows)
        t0 = time.time()
        res = sharded.sharded_msm_g1(mesh, P, S, c=c, max_windows=max_windows)
        dt = time.time() - t0
        if t1 is None:
            t1 = dt
        results[d] = {
            "time_s": round(dt, 4),
            "mterms_per_s": round(N / dt / 1e6, 4),
            "efficiency": round(t1 / (d * dt), 4),
        }
    return results


def measure_ntt_scaling(logn: int, device_counts=None, repeats: int = 3):
    """Four-step sharded iNTT wall time across mesh sizes (same total
    size N = 2^logn at every mesh size — strong scaling)."""
    import random
    random.seed(2)
    n_dev = len(jax.devices())
    if device_counts is None:
        device_counts = [d for d in (1, 2, 4, 8, 16, 32) if d <= n_dev]
    N = 1 << logn
    log2_ = logn // 2
    log1_ = logn - log2_
    x = jnp.asarray(F.pack_mont(
        [random.randrange(params.R) for _ in range(N)], F.FR))
    x3 = x.reshape(params.FR_LIMBS, 1 << log1_, 1 << log2_)

    results = {}
    t1 = None
    last_d = None
    for d in device_counts:
        if (1 << log2_) % d or (1 << log1_) % d:
            continue
        mesh = sharded.make_mesh(d)
        out = sharded.sharded_ntt(mesh, x3, log1_, log2_)  # compile
        jax.block_until_ready(out)
        best = None
        for _ in range(repeats):
            t0 = time.time()
            jax.block_until_ready(
                sharded.sharded_ntt(mesh, x3, log1_, log2_))
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        if t1 is None:
            t1 = best
        results[d] = {
            "time_s": round(best, 4),
            "melems_per_s": round(N / best / 1e6, 4),
            "efficiency": round(t1 / (d * best), 4),
        }
        last_d = d
    if last_d is not None:
        # per-collective/phase breakdown at the largest mesh (verdict r4
        # item 7: show WHERE the four-step's time goes)
        results[last_d]["phase_breakdown"] = sharded.sharded_ntt_phase_times(
            sharded.make_mesh(last_d), x3, log1_, log2_, repeats=repeats)
    return results


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--logn", type=int, default=12)
    ap.add_argument("--window", type=int, default=8)
    ap.add_argument("--max-windows", type=int, default=None)
    ap.add_argument("--ntt-logn", type=int, default=16)
    ap.add_argument("--out", type=str, default=None,
                    help="write a labeled JSON artifact to this path")
    args = ap.parse_args()
    res = {
        "note": ("structure-only: virtual CPU mesh shares one host's "
                 "cores, so strong-scaling efficiency measures code-path "
                 "structure + collective overhead, not ICI bandwidth"
                 if jax.default_backend() == "cpu" else
                 f"backend={jax.default_backend()}"),
        "devices": len(jax.devices()),
        "msm": {"logn": args.logn, "window": args.window,
                "scaling": measure_msm_scaling(
                    args.logn, c=args.window,
                    max_windows=args.max_windows)},
        "ntt": {"logn": args.ntt_logn,
                "scaling": measure_ntt_scaling(args.ntt_logn)},
    }
    text = json.dumps(res, indent=1)
    print(text)
    if args.out:
        with open(args.out, "w") as f:
            f.write(text + "\n")


if __name__ == "__main__":
    main()
