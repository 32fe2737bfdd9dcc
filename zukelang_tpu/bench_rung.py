"""One benchmark rung as a standalone process (child of bench.py).

Runs a single protocol/size through keygen + prove + verify via
zukelang_tpu.bench_lib and writes the result record as JSON to --out.
Stage progress is flushed to the same file as each stage completes, so
the parent can report how far a timed-out rung got before it was killed
(the parent enforces the wall timeout; a hung XLA/Mosaic compile cannot
be interrupted by in-process signals, which is why the rung is a
process and not a thread).

Usage: python -m zukelang_tpu.bench_rung --proto groth16 --logn 16 \
           --repeats 3 --out /tmp/rung.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import traceback


class _FlushingProgress(dict):
    """Progress dict that persists itself to `path` on every update."""

    def __init__(self, path: str):
        super().__init__()
        self._path = path

    def __setitem__(self, k, v):
        super().__setitem__(k, v)
        _atomic_write(self._path, {"done": False, "progress": dict(self)})


def _atomic_write(path: str, obj) -> None:
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(obj, f)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)


def _stage_reached(progress) -> str:
    order = ["build_r1cs_s", "keygen_s", "prove_first_s", "prove_s",
             "verify_s"]
    done = [k for k in order if k in progress]
    return done[-1] if done else "start"


def _ref_cost_s(n: int, msm_terms: int) -> float:
    """Reference cost model (single CPU core, blst-class primitives):
    one 0.25 ms scalar-mult per MSM term (curve.ml:94-103) + n^2 Fr muls
    a 30 ns (poly mul + long division, QAP.ml:120-135).  Under-counts the
    reference's O(n^2) Lagrange interpolation, so ratios are conservative."""
    return msm_terms * 0.25e-3 + (n ** 2) * 30e-9


def run_rung(proto: str, log_n: int, repeats: int, progress: dict) -> dict:
    """Run one rung; returns the result record (ok or error)."""
    from zukelang_tpu import bench_lib

    name = f"{proto}_prove_2^{log_n}"
    t0 = time.time()
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
                           "stage_timings": dict(progress)}}

    n = 1 << log_n
    vs = _ref_cost_s(n, res["msm_terms_per_prove"]) / res["prove_s"]
    return {
        "metric": name,
        "value": round(res["prove_s"], 4),
        "unit": "s",
        "vs_baseline": round(vs, 2),
        "detail": {
            "domain_log": res.get("domain_log", log_n),
            "keygen_s": round(res["keygen_s"], 3),
            "prove_first_s": round(res["prove_first_s"], 3),
            "prove_s": round(res["prove_s"], 4),
            "verify_s": round(res["verify_s"], 3),
            "msm_mterms_per_s": round(res["msm_mops_per_s"], 3),
            "verified": res["verified"],
            "rung_wall_s": round(time.time() - t0, 1),
        },
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--proto", choices=["groth16", "pinocchio"],
                    required=True)
    ap.add_argument("--logn", type=int, required=True)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    from zukelang_tpu import jax_setup  # noqa: F401  persistent compile cache

    progress = _FlushingProgress(args.out)
    rec = run_rung(args.proto, args.logn, args.repeats, progress)
    _atomic_write(args.out, {"done": True, "record": rec,
                             "progress": dict(progress)})


if __name__ == "__main__":
    main()
