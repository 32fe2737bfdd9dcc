#!/usr/bin/env python
"""Benchmark driver: Groth16 prove on a synthetic R1CS, real TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The reference (camlspotter/zukelang) publishes no absolute numbers
(BASELINE.md); its prover is a naive per-term scalar-mult fold
(curve.ml:94-103) plus O(n^2) polynomial division (QAP.ml:120-135).
vs_baseline therefore compares against a measured estimate of the
reference's algorithmic cost at the same size: terms * t_scalar_mult
(blst-class scalar mult ~ 0.25 ms) + n^2 field mults — conservative in the
reference's favor.

Failure semantics: a crash records WHERE it died (stage timings of every
completed stage plus the failing stage name) instead of silently retrying;
smaller sizes are retried only when the failure plausibly depends on size
(some stage made progress, or the error differs from the previous rung) —
a size-independent crash reports immediately rather than burning the
budget on identical failures.
"""

import json
import os
import sys
import time
import traceback

LOG_N = int(os.environ.get("BENCH_LOG_CONSTRAINTS", "16"))
# BENCH_SMOKE=1: CI mode — single attempt, one repeat, window pinned to 4
# (XLA:CPU compiles large-window bucket programs too slowly).
SMOKE = os.environ.get("BENCH_SMOKE", "") == "1"


def _stage_reached(progress):
    order = ["build_r1cs_s", "keygen_s", "prove_first_s", "prove_s",
             "verify_s"]
    done = [k for k in order if k in progress]
    return done[-1] if done else "start"


def main():
    t_start = time.time()
    from zukelang_tpu import jax_setup  # persistent compile cache
    from zukelang_tpu import bench_lib

    repeats = 3
    if SMOKE:
        from zukelang_tpu.protocols import groth16_device as gd
        gd.DEFAULT_MSM_WINDOW = 4
        gd.DEFAULT_FB_WINDOW = 4
        repeats = 1

    res = None
    attempts = []          # (log_n, error_str, progress)
    prev_err = None
    for log_n in ((LOG_N,) if SMOKE else (LOG_N, 14, 12)):
        progress = {}
        try:
            res = bench_lib.bench_groth16(log_n, repeats=repeats,
                                          progress=progress)
            break
        except Exception as e:
            err = f"{type(e).__name__}: {e}"
            tb = traceback.format_exc()
            print(f"[bench] 2^{log_n} failed after "
                  f"{_stage_reached(progress)}: {err}\n{tb}",
                  file=sys.stderr)
            attempts.append({"log_n": log_n, "error": err[:300],
                             "stage_reached": _stage_reached(progress),
                             "stage_timings": progress})
            # Size-independent failure (same error, no new progress than
            # the previous rung): retrying smaller is theater — stop.
            if prev_err is not None and err == prev_err and not progress:
                break
            prev_err = err
    if res is None:
        print(json.dumps({"metric": f"groth16_prove_2^{LOG_N}", "value": -1,
                          "unit": "s", "vs_baseline": 0,
                          "error": attempts[-1]["error"],
                          "attempts": attempts}))
        return
    LOG_N_EFF = res["log_constraints"]

    n = 1 << LOG_N_EFF
    # Reference-cost model (single CPU core, blst-class primitives):
    #   prove = 7n scalar-mults a 0.25 ms  +  n^2 Fr muls a 30 ns (poly mul
    #   + division, QAP.ml:120-135).  This under-counts the reference's
    #   Lagrange interpolation, so the ratio is conservative.
    ref_prove_s = 7 * n * 0.25e-3 + (n ** 2) * 30e-9
    vs_baseline = ref_prove_s / res["prove_s"]

    out = {
        "metric": f"groth16_prove_2^{LOG_N_EFF}",
        "value": round(res["prove_s"], 4),
        "unit": "s",
        "vs_baseline": round(vs_baseline, 2),
        "detail": {
            "keygen_s": round(res["keygen_s"], 3),
            "prove_first_s": round(res["prove_first_s"], 3),
            "verify_s": round(res["verify_s"], 3),
            "msm_mterms_per_s": round(res["msm_mops_per_s"], 3),
            "verified": res["verified"],
            "total_wall_s": round(time.time() - t_start, 1),
        },
    }
    if attempts:
        out["detail"]["failed_attempts"] = attempts
    print(json.dumps(out))


if __name__ == "__main__":
    main()
