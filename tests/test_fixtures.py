"""Frozen interop fixtures: the serialized proof/vkey/public JSON schema
(reference protocol.ml:10-14, curve.ml:195-211 encodings) and the
deterministic pipeline (Var numbering, rng consumption order, gate
ordering) are pinned by byte-comparison against tests/fixtures/*.json.

Regenerate (only after an INTENTIONAL schema/semantics change) with
scripts/gen_fixtures.py.
"""

import json
import os

import pytest

from zukelang_tpu import serialize as S
from zukelang_tpu.core import lang as L
from zukelang_tpu.core import var as var_mod
from zukelang_tpu.core.protocol import registry
from zukelang_tpu.golden.field import Fr
from zukelang_tpu.rng import InjectedRng
from zukelang_tpu.testing.harness import run_pipeline
from zukelang_tpu.testing.suites import SUITE

FIXDIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fixtures")
FIXTURES = ["groth16_cubic.json", "pinocchio_zk_cubic.json"]


def _load(name):
    with open(os.path.join(FIXDIR, name)) as f:
        return json.load(f)


@pytest.mark.parametrize("name", FIXTURES)
def test_fixture_deserialize_verify_reserialize(name):
    """deserialize -> verify ok; re-serialize -> byte-identical JSON."""
    fix = _load(name)
    proto_name = fix["protocol"]
    proto = registry()[proto_name]()
    vkey = S.VKEY_OF_JSON[proto_name](fix["vkey"])
    proof = S.PROOF_OF_JSON[proto_name](fix["proof"])
    public = S.var_map_of_json(fix["public"], S.fr_of_json)

    assert proto.verify(public, vkey, proof)

    # tamper: any public input change must be rejected
    bad = dict(public)
    k = next(iter(bad))
    bad[k] = bad[k] + Fr(1)
    assert not proto.verify(bad, vkey, proof)

    assert S.VKEY_TO_JSON[proto_name](vkey) == fix["vkey"]
    assert S.PROOF_TO_JSON[proto_name](proof) == fix["proof"]
    assert S.var_map_to_json(public, S.fr_to_json) == fix["public"]


@pytest.mark.parametrize("name", FIXTURES)
def test_fixture_regenerates_bit_exactly(name):
    """The full golden pipeline (compile -> QAP -> keygen -> witness ->
    prove) under the fixture's injected randomness reproduces every frozen
    byte — pins Var numbering, gate/QAP ordering, scalar draw order, and
    the point encodings at once."""
    fix = _load(name)
    proto_name = fix["protocol"]
    saved_counter = var_mod.counter_value()
    try:
        var_mod.reset(fix["var_counter"])
        proto = registry()[proto_name]()
        res = run_pipeline(
            dict(SUITE)["cubic"](), proto, domain=fix["domain"],
            inputs_values={"input": L.v_field(Fr(int(fix["input"]["input"])))},
            keygen_rng=InjectedRng([Fr(int(s))
                                    for s in fix["keygen_scalars"]]),
            prove_rng=InjectedRng([Fr(int(s))
                                   for s in fix["prove_scalars"]]))
    finally:
        var_mod.reset(max(saved_counter, var_mod.counter_value()))
    assert res.verified
    assert S.PROOF_TO_JSON[proto_name](res.proof) == fix["proof"]
    assert S.VKEY_TO_JSON[proto_name](res.vkey) == fix["vkey"]
    assert S.var_map_to_json(res.public, S.fr_to_json) == fix["public"]
