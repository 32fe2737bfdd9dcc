"""Command-line driver: compile, prove, verify, and benchmark.

The reference has no CLI (everything runs through dune test mains,
SURVEY.md section 2 B1); this is a convenience layer over the same
pipeline.  Programs are Python files whose last function definition is the
ZK program (frontend syntax).

Examples:
    python -m zukelang_tpu prove prog.py --input input=5 --proof out.json
    python -m zukelang_tpu verify out.json
    python -m zukelang_tpu bench --log-constraints 14
"""

from __future__ import annotations

import argparse
import json
import sys


def _load_program(path: str):
    from .frontend import compile_python
    src = open(path).read()
    return compile_python(src)


def _parse_inputs(pairs):
    from .core import lang as L
    from .golden.field import Fr
    out = {}
    for pair in pairs or []:
        name, _, val = pair.partition("=")
        if val in ("true", "false"):
            out[name] = L.v_bool(val == "true")
        else:
            out[name] = L.v_field(Fr(int(val, 0)))
    return out


def cmd_compile(args):
    from .core import comp
    e = _load_program(args.program)
    c = comp.compile_expr(e)
    print(f"program: {e!r}")
    print(f"gates: {len(c.gates)}")
    for g in c.gates:
        print(f"  {g!r}")
    print(f"public inputs: {sorted(c.circuit.inputs_public)}")
    print(f"outputs: {sorted(c.circuit.outputs)}")
    print(f"mids: {sorted(c.circuit.mids)}")


def cmd_prove(args):
    from . import serialize as S
    from .core import comp, lang as L, qap as qap_mod
    from .core.protocol import registry
    from .golden.field import Fr
    from .rng import Gen
    from .testing.harness import run_pipeline

    e = _load_program(args.program)
    proto = registry()[args.protocol]()
    inputs = _parse_inputs(args.input) or None
    res = run_pipeline(e, proto, seed=args.seed, domain=args.domain,
                       inputs_values=inputs)
    assert res.verified
    doc = {
        "protocol": args.protocol,
        "domain": args.domain,
        "proof": S.PROOF_TO_JSON[args.protocol](res.proof),
        "vkey": S.VKEY_TO_JSON[args.protocol](res.vkey),
        "public": S.var_map_to_json(res.public, S.fr_to_json),
        "output": repr(res.output),
    }
    out = args.proof or "proof.json"
    with open(out, "w") as f:
        json.dump(doc, f, indent=1)
    print(f"proof written to {out} (verified: {res.verified})")


def cmd_verify(args):
    """Standalone verification from a proof document: the vkey, proof and
    public bindings all travel in the JSON written by `prove` (reference
    schema, serialize.py), so no recompilation or trusted setup rerun."""
    from . import serialize as S
    from .core.protocol import registry

    with open(args.proof) as f:
        doc = json.load(f)
    protocol = doc["protocol"]
    proto = registry()[protocol]()
    proof = S.PROOF_OF_JSON[protocol](doc["proof"])
    vkey = S.VKEY_OF_JSON[protocol](doc["vkey"])
    public = S.var_map_of_json(doc["public"], S.fr_of_json)
    ok = proto.verify(public, vkey, proof)
    print(f"{args.proof}: protocol={protocol} verified={ok}")
    if not ok:
        sys.exit(1)


def cmd_bench(args):
    import os
    os.environ["BENCH_LOG_CONSTRAINTS"] = str(args.log_constraints)
    from . import bench_lib
    if args.protocol == "groth16":
        res = bench_lib.bench_groth16(args.log_constraints,
                                      repeats=args.repeats)
    else:
        res = bench_lib.bench_pinocchio(args.log_constraints,
                                        repeats=args.repeats,
                                        zk=args.protocol == "pinocchio_zk")
    print(json.dumps(res, indent=1))


def cmd_test(args):
    from .core.protocol import registry
    from .testing.harness import random_test
    from .testing.suites import SUITE
    proto_f = registry()[args.protocol]
    for name, mk in SUITE:
        random_test(mk(), proto_f(), seed=args.seed)
        print(f"{name}: ok")


def main(argv=None):
    ap = argparse.ArgumentParser(prog="zukelang_tpu")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("compile", help="compile a program and print the circuit")
    p.add_argument("program")
    p.set_defaults(fn=cmd_compile)

    p = sub.add_parser("prove", help="prove a program end to end")
    p.add_argument("program")
    p.add_argument("--protocol", default="groth16",
                   choices=["groth16", "pinocchio", "pinocchio_zk"])
    p.add_argument("--domain", default="reference",
                   choices=["reference", "ntt"])
    p.add_argument("--input", action="append",
                   help="name=value (repeatable); omitted -> random")
    p.add_argument("--proof", help="output path (default proof.json)")
    p.add_argument("--seed", type=int, default=0)
    p.set_defaults(fn=cmd_prove)

    p = sub.add_parser("verify", help="verify a proof document")
    p.add_argument("proof", help="proof JSON written by `prove`")
    p.set_defaults(fn=cmd_verify)

    p = sub.add_parser("bench", help="synthetic R1CS prover benchmark")
    p.add_argument("--log-constraints", type=int, default=14)
    p.add_argument("--repeats", type=int, default=2)
    p.add_argument("--protocol", default="groth16",
                   choices=["groth16", "pinocchio", "pinocchio_zk"])
    p.set_defaults(fn=cmd_bench)

    p = sub.add_parser("test", help="run the reference program suite")
    p.add_argument("--protocol", default="groth16",
                   choices=["groth16", "pinocchio", "pinocchio_zk"])
    p.add_argument("--seed", type=int, default=0)
    p.set_defaults(fn=cmd_test)

    args = ap.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
