#!/usr/bin/env python
"""Benchmark driver: SNARK prove on synthetic R1CS, real TPU chip.

Artifact-by-construction design (every line on stdout is one JSON
record in the driver's metric schema, flushed immediately):

  1. A heartbeat record is emitted BEFORE any device work, so even a
     hard timeout leaves a parseable diagnostic (plan + compile-cache
     state) as the last line.
  2. Each rung runs in a CHILD PROCESS with a wall timeout: a cold
     XLA/Mosaic compile cannot be interrupted in-process, so a hung or
     compile-bound rung is killed from outside and the driver moves on
     to the next rung instead of eating the whole window.
  3. The plan is ordered warm-first: the headline 2^16 family leads
     (it is the family the end-of-round validation run warms into
     .jax_cache), followed by rungs sharing that compiled family.

Record shape per completed rung and for the final headline:

  {"metric": "groth16_prove_2^16", "value": N, "unit": "s",
   "vs_baseline": N, "detail": {...}}

Rungs (default): groth16 2^16 only.  A warm rung still pays ~3 min of
keygen re-trace + ~13 min of prove-program re-trace/lowering in a fresh
process (host Python; only the XLA/Mosaic compile is disk-cached), so
one rung is what provably fits the driver window.  The pinocchio 2^14
and groth16 2^20 rungs could not be compile-warmed inside this round's
window, and groth16 2^12 runs the identical canonical-2^16 program
family (it adds no new measurement).  Re-enable any of them explicitly:
BENCH_RUNGS="g16:16,g16:12,pin:14,g16:20" with a matching budget.

The reference (camlspotter/zukelang) publishes no absolute numbers
(BASELINE.md); its prover is a naive per-term scalar-mult fold
(curve.ml:94-103) plus O(n^2) polynomial division (QAP.ml:120-135).
vs_baseline therefore compares against a measured estimate of the
reference's algorithmic cost at the same size — conservative in the
reference's favor (see zukelang_tpu.bench_rung._ref_cost_s).

Env knobs:
  BENCH_LOG_CONSTRAINTS  headline Groth16 rung (default 16)
  BENCH_BUDGET_S         total wall budget in seconds (default 1500)
  BENCH_RUNG_TIMEOUT_S   per-rung wall timeout (default 1440)
  BENCH_SMOKE=1          CI mode: one in-process rung at LOG_N,
                         window 4, 1 repeat
  BENCH_RUNGS            override plan, e.g. "g16:12,g16:16,pin:14"
"""

import json
import os
import signal
import subprocess
import sys
import tempfile
import time

LOG_N = int(os.environ.get("BENCH_LOG_CONSTRAINTS", "16"))
BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", "1500"))
RUNG_TIMEOUT_S = float(os.environ.get("BENCH_RUNG_TIMEOUT_S", "1440"))
SMOKE = os.environ.get("BENCH_SMOKE", "") == "1"

REPO = os.path.dirname(os.path.abspath(__file__))
T_START = time.time()


def _elapsed():
    return time.time() - T_START


def _emit(rec):
    print(json.dumps(rec), flush=True)


def _cache_entries():
    try:
        d = os.path.join(REPO, ".jax_cache")
        return len([f for f in os.listdir(d) if f.endswith("-cache")])
    except OSError:
        return 0


def _plan():
    env = os.environ.get("BENCH_RUNGS")
    if env:
        out = []
        for tok in env.split(","):
            proto, ln = tok.strip().split(":")
            out.append(("groth16" if proto in ("g16", "groth16")
                        else "pinocchio", int(ln)))
        return out
    # Warm-first: the headline family leads (the end-of-round validation
    # run warms exactly this plan, in this order, into .jax_cache).
    # Only rungs whose compiled family was warmed AND which completed the
    # end-of-round validation run are in the default plan (see module
    # docstring); pinocchio:14 / g16:20 run via BENCH_RUNGS.
    return [("groth16", LOG_N)]


def _run_rung_subprocess(proto, log_n, repeats, timeout_s):
    """Run one rung in a child process with a hard wall timeout.

    Returns the rung record; on timeout the child's process group is
    killed (exact pgid of the child we spawned) and an error record
    with the last flushed stage progress is returned."""
    name = f"{proto}_prove_2^{log_n}"
    fd, out_path = tempfile.mkstemp(prefix="zk_rung_", suffix=".json")
    os.close(fd)
    cmd = [sys.executable, "-m", "zukelang_tpu.bench_rung",
           "--proto", proto, "--logn", str(log_n),
           "--repeats", str(repeats), "--out", out_path]
    t0 = time.time()
    try:
        # stdout -> stderr: the child must never pollute the JSON stream
        proc = subprocess.Popen(cmd, cwd=REPO, stdout=sys.stderr,
                                stderr=sys.stderr, start_new_session=True)
        timed_out = False
        try:
            proc.wait(timeout=timeout_s)
        except subprocess.TimeoutExpired:
            timed_out = True
            try:
                os.killpg(proc.pid, signal.SIGKILL)
            except OSError:
                proc.kill()
            proc.wait()
        wall = time.time() - t0

        payload = None
        try:
            with open(out_path) as f:
                payload = json.load(f)
        except (OSError, ValueError):
            pass

        if payload and payload.get("done"):
            rec = payload["record"]
            rec.setdefault("detail", {})["total_wall_s"] = round(_elapsed(), 1)
            return rec
        progress = (payload or {}).get("progress", {})
        reason = ("timeout" if timed_out
                  else f"child exited rc={proc.returncode}")
        print(f"[bench] {name}: {reason} after {wall:.0f}s, "
              f"progress={progress}", file=sys.stderr, flush=True)
        return {"metric": name, "value": -1, "unit": "s", "vs_baseline": 0,
                "error": f"{reason} after {wall:.0f}s",
                "detail": {"stage_timings": progress,
                           "total_wall_s": round(_elapsed(), 1)}}
    finally:
        try:
            os.unlink(out_path)
        except OSError:
            pass


def main():
    if SMOKE:
        # CI mode: in-process, tiny windows, one rung (CPU backends
        # compile large-window bucket programs too slowly), no canonical
        # domain padding (a 2^16 pad would dwarf the smoke size).
        os.environ.setdefault("BENCH_CANON_LOG", "0")
        from zukelang_tpu import jax_setup  # noqa: F401
        from zukelang_tpu.protocols import groth16_device as gd
        from zukelang_tpu.bench_rung import run_rung
        gd.DEFAULT_MSM_WINDOW = 4
        gd.DEFAULT_FB_WINDOW = 4
        _emit(run_rung("groth16", LOG_N, 1, {}))
        return

    rungs = _plan()
    _emit({"metric": "bench_heartbeat", "value": 0, "unit": "s",
           "vs_baseline": 0,
           "detail": {"plan": [f"{p}:{ln}" for p, ln in rungs],
                      "budget_s": BUDGET_S,
                      "rung_timeout_s": RUNG_TIMEOUT_S,
                      "jax_cache_entries": _cache_entries()}})

    results = []
    for i, (proto, log_n) in enumerate(rungs):
        remaining = BUDGET_S - _elapsed()
        if i > 0 and remaining < 120:
            print(f"[bench] skipping {proto} 2^{log_n}: only "
                  f"{remaining:.0f}s of budget left", file=sys.stderr,
                  flush=True)
            continue
        timeout_s = min(RUNG_TIMEOUT_S, max(60.0, remaining - 30.0))
        rec = _run_rung_subprocess(proto, log_n, repeats=3,
                                   timeout_s=timeout_s)
        _emit(rec)
        results.append(rec)

    # final headline: the most significant completed rung, all rungs in
    # detail.rungs
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
