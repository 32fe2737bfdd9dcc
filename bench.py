#!/usr/bin/env python
"""Benchmark driver: SNARK prove on synthetic R1CS, real TPU chip.

Prints a JSON line PER COMPLETED RUNG (smallest first, flushed
immediately) and a final headline line, so a timeout mid-run still
leaves the best completed metric as the last line on stdout:

  {"metric": "groth16_prove_2^16", "value": N, "unit": "s",
   "vs_baseline": N, "detail": {...}}

Rungs (default): groth16 2^12 -> groth16 2^16 -> pinocchio 2^14 ->
groth16 2^20, covering BASELINE configs 1 (Pinocchio prove) and 5
(2^20-constraint R1CS).  Larger rungs are attempted only while the
wall budget (BENCH_BUDGET_S, default 3000 s) plausibly allows them;
the 2^12 and 2^16 rungs are always attempted.

The reference (camlspotter/zukelang) publishes no absolute numbers
(BASELINE.md); its prover is a naive per-term scalar-mult fold
(curve.ml:94-103) plus O(n^2) polynomial division (QAP.ml:120-135).
vs_baseline therefore compares against a measured estimate of the
reference's algorithmic cost at the same size: msm_terms *
t_scalar_mult (blst-class scalar mult ~ 0.25 ms) + n^2 field mults —
conservative in the reference's favor.

Env knobs:
  BENCH_LOG_CONSTRAINTS  headline Groth16 rung (default 16)
  BENCH_BUDGET_S         wall budget in seconds (default 3000)
  BENCH_SMOKE=1          CI mode: one rung at LOG_N, window 4, 1 repeat
  BENCH_RUNGS            override plan, e.g. "g16:12,g16:16,pin:14"
"""

import json
import os
import sys
import time
import traceback

LOG_N = int(os.environ.get("BENCH_LOG_CONSTRAINTS", "16"))
# Default assumes a ~30 min driver window (r3 timed out; exact limit
# unknown): optional rungs are skipped once they can't plausibly fit.
BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", "1500"))
# BENCH_SMOKE=1: CI mode — single rung, one repeat, window pinned to 4
# (XLA:CPU compiles large-window bucket programs too slowly).
SMOKE = os.environ.get("BENCH_SMOKE", "") == "1"

T_START = time.time()


def _elapsed():
    return time.time() - T_START


def _stage_reached(progress):
    order = ["build_r1cs_s", "keygen_s", "prove_first_s", "prove_s",
             "verify_s"]
    done = [k for k in order if k in progress]
    return done[-1] if done else "start"


def _ref_cost_s(n, msm_terms):
    """Reference cost model (single CPU core, blst-class primitives):
    one 0.25 ms scalar-mult per MSM term (curve.ml:94-103) + n^2 Fr muls
    a 30 ns (poly mul + long division, QAP.ml:120-135).  Under-counts the
    reference's O(n^2) Lagrange interpolation, so ratios are conservative."""
    return msm_terms * 0.25e-3 + (n ** 2) * 30e-9


def _emit(rec):
    print(json.dumps(rec), flush=True)


def _run_rung(proto, log_n, repeats):
    """Run one rung; returns the emitted record (ok or error)."""
    from zukelang_tpu import bench_lib

    progress = {}
    name = f"{proto}_prove_2^{log_n}"
    try:
        if proto == "groth16":
            res = bench_lib.bench_groth16(log_n, repeats=repeats,
                                          progress=progress)
        else:
            res = bench_lib.bench_pinocchio(log_n, repeats=repeats,
                                            progress=progress)
    except Exception as e:
        err = f"{type(e).__name__}: {e}"
        print(f"[bench] {name} failed after {_stage_reached(progress)}: "
              f"{err}\n{traceback.format_exc()}", file=sys.stderr, flush=True)
        return {"metric": name, "value": -1, "unit": "s", "vs_baseline": 0,
                "error": err[:300],
                "detail": {"stage_reached": _stage_reached(progress),
                           "stage_timings": progress}}

    n = 1 << log_n
    vs = _ref_cost_s(n, res["msm_terms_per_prove"]) / res["prove_s"]
    rec = {
        "metric": name,
        "value": round(res["prove_s"], 4),
        "unit": "s",
        "vs_baseline": round(vs, 2),
        "detail": {
            "keygen_s": round(res["keygen_s"], 3),
            "prove_first_s": round(res["prove_first_s"], 3),
            "prove_s": round(res["prove_s"], 4),
            "verify_s": round(res["verify_s"], 3),
            "msm_mterms_per_s": round(res["msm_mops_per_s"], 3),
            "verified": res["verified"],
            "rung_wall_s": round(sum(progress.values()), 1)
            if progress else None,
            "total_wall_s": round(_elapsed(), 1),
        },
    }
    return rec


def _plan():
    env = os.environ.get("BENCH_RUNGS")
    if env:
        out = []
        for tok in env.split(","):
            proto, ln = tok.strip().split(":")
            out.append(("groth16" if proto in ("g16", "groth16")
                        else "pinocchio", int(ln)))
        return out
    plan = [("groth16", 12)]
    if LOG_N != 12:
        plan.append(("groth16", LOG_N))
    plan.append(("pinocchio", 14))
    if LOG_N < 20:
        plan.append(("groth16", 20))
    return plan


def main():
    from zukelang_tpu import jax_setup  # noqa: F401  persistent compile cache

    repeats = 3
    if SMOKE:
        from zukelang_tpu.protocols import groth16_device as gd
        gd.DEFAULT_MSM_WINDOW = 4
        gd.DEFAULT_FB_WINDOW = 4
        repeats = 1
        rec = _run_rung("groth16", LOG_N, repeats)
        _emit(rec)
        return

    rungs = _plan()
    results = []
    # wall cost of the completed headline rung gates the optional ones:
    # warm cache -> minutes -> everything runs; cold -> an hour -> skip.
    head_wall = None
    head_failed = False
    for i, (proto, log_n) in enumerate(rungs):
        mandatory = i < 2
        if not mandatory:
            remaining = BUDGET_S - _elapsed()
            if head_wall is None:
                est = 600 if proto == "pinocchio" else 2500
            elif proto == "pinocchio":
                est = max(180, 1.5 * head_wall)
            elif log_n >= 20:
                est = 4 * head_wall + 180
            else:
                est = max(120, head_wall)
            if remaining < est or (head_failed and proto == "groth16"
                                   and log_n >= 20):
                print(f"[bench] skipping {proto} 2^{log_n}: remaining "
                      f"{remaining:.0f}s, est {est:.0f}s, "
                      f"head_failed={head_failed}", file=sys.stderr,
                      flush=True)
                continue
        t_rung = time.time()
        rec = _run_rung(proto, log_n, repeats)
        _emit(rec)
        results.append(rec)
        if proto == "groth16" and log_n == LOG_N:
            head_wall = time.time() - t_rung
            head_failed = rec["value"] < 0

    # final headline: the most significant completed rung, all rungs in detail
    ok = [r for r in results if r["value"] > 0]

    def prio(r):
        g = r["metric"].startswith("groth16")
        ln = int(r["metric"].rsplit("^", 1)[1])
        return (ln >= 20 and g, g and ln == LOG_N, g, ln)

    if not ok:
        best = results[-1] if results else {
            "metric": f"groth16_prove_2^{LOG_N}", "value": -1, "unit": "s",
            "vs_baseline": 0, "error": "no rung attempted"}
        final = dict(best)
    else:
        final = dict(max(ok, key=prio))
    final["detail"] = dict(final.get("detail") or {})
    final["detail"]["rungs"] = [
        {"metric": r["metric"], "value": r["value"],
         "vs_baseline": r.get("vs_baseline"),
         "verified": (r.get("detail") or {}).get("verified"),
         "keygen_s": (r.get("detail") or {}).get("keygen_s"),
         "error": r.get("error")}
        for r in results]
    final["detail"]["total_wall_s"] = round(_elapsed(), 1)
    _emit(final)


if __name__ == "__main__":
    main()
