#!/usr/bin/env python
"""Freeze golden-path interop fixtures: one proof+vkey+public JSON per
protocol for the cubic demo circuit (x^3 + x + 3, secret x — the
reference's README.md:49 / test/test.ml:195-197 program), with INJECTED
CRS/prover randomness so every byte is reproducible.

These pin the reference JSON schema (protocol.ml:10-14 serializers;
curve.ml:195-211 compressed-point encodings; Fr as decimal strings) and
the deterministic Var numbering / rng consumption order: any change to
either breaks tests/test_fixtures.py.

Run from the repo root:  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
    python scripts/gen_fixtures.py
"""

import json
import os
import sys

sys.path.insert(0, ".")

from zukelang_tpu import serialize as S
from zukelang_tpu.core import var as var_mod
from zukelang_tpu.core import lang as L
from zukelang_tpu.core.protocol import registry
from zukelang_tpu.golden.field import Fr
from zukelang_tpu.rng import InjectedRng
from zukelang_tpu.testing.harness import run_pipeline
from zukelang_tpu.testing.suites import SUITE

FIXDIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests", "fixtures")

# (protocol, n keygen scalars, n prove scalars) — draw orders per
# pinocchio.ml:83-91/:428-430 and groth16.ml:51-55/:124-125.
CASES = [("groth16", 5, 2), ("pinocchio_zk", 8, 3)]

INPUT_X = 4   # x^3 + x + 3 = 71


def cubic():
    return dict(SUITE)["cubic"]()


def main():
    os.makedirs(FIXDIR, exist_ok=True)
    for proto_name, n_key, n_prove in CASES:
        var_counter = 1      # ONE is serial 1 (allocated at import)
        var_mod.reset(var_counter)
        key_scalars = [str(1000 + i) for i in range(n_key)]
        prove_scalars = [str(2000 + i) for i in range(n_prove)]
        proto = registry()[proto_name]()
        res = run_pipeline(
            cubic(), proto, domain="reference",
            inputs_values={"input": L.v_field(Fr(INPUT_X))},
            keygen_rng=InjectedRng([Fr(int(s)) for s in key_scalars]),
            prove_rng=InjectedRng([Fr(int(s)) for s in prove_scalars]))
        assert res.verified
        fix = {
            "protocol": proto_name,
            "program": "cubic: x^3 + x + 3 (test.ml:195-197)",
            "domain": "reference",
            "input": {"input": str(INPUT_X)},
            "var_counter": var_counter,
            "keygen_scalars": key_scalars,
            "prove_scalars": prove_scalars,
            "public": S.var_map_to_json(res.public, S.fr_to_json),
            "vkey": S.VKEY_TO_JSON[proto_name](res.vkey),
            "proof": S.PROOF_TO_JSON[proto_name](res.proof),
        }
        path = os.path.join(FIXDIR, f"{proto_name}_cubic.json")
        with open(path, "w") as f:
            json.dump(fix, f, indent=1, sort_keys=False)
            f.write("\n")
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
