"""Serialization round-trips and schema checks (reference yojson parity)."""

import json

import pytest

from zukelang_tpu import serialize as S
from zukelang_tpu.core import comp, lang as L, qap as qap_mod
from zukelang_tpu.core.var import Var
from zukelang_tpu.golden.curve import G1, G2
from zukelang_tpu.golden.field import Fr
from zukelang_tpu.protocols.groth16 import Groth16
from zukelang_tpu.protocols.pinocchio import Pinocchio
from zukelang_tpu.rng import Gen


def _setup():
    e = L.let_(L.input("input", L.SECRET, L.ty_field),
               lambda x: L.add(L.mul(x, x), L.fnum(1)))
    c = comp.compile_expr(e)
    q = qap_mod.build(c.gates)
    _i, env_lang, env_code = comp.gen_inputs(c.inputs, Gen(2))
    sol = comp.code_eval_list(env_code, c.codes)
    return c, q, sol


def test_scalar_and_point_json():
    f = Fr(123456789)
    assert S.fr_of_json(S.fr_to_json(f)) == f
    g = G1.generator() * 77
    assert S.g1_of_json(S.g1_to_json(g)) == g
    h = G2.generator() * 99
    assert S.g2_of_json(S.g2_to_json(h)) == h


def test_var_map_json():
    m = {Var("x", 3): Fr(5), Var("a", 1): Fr(9)}
    j = S.var_map_to_json(m, S.fr_to_json)
    # sorted binding-list form (var.ml:66-68)
    assert j[0][0] == ["a", 1]
    back = S.var_map_of_json(j, S.fr_of_json)
    assert back == m


def test_groth16_key_and_proof_roundtrip():
    c, q, sol = _setup()
    proto = Groth16()
    pk, vk = proto.keygen(Gen(5), c.circuit, q)
    proof = proto.prove(Gen(6), q, pk, sol)
    public = {v: f for v, f in sol.items() if v not in c.circuit.mids}

    pj = S.groth16_proof_to_json(proof)
    assert set(pj) == {"a", "b", "c"}  # groth16.ml:110-114
    proof2 = S.groth16_proof_of_json(json.loads(S.dumps(pj)))
    assert (proof2.a, proof2.b, proof2.c) == (proof.a, proof.b, proof.c)
    assert proto.verify(public, vk, proof2)

    vkj = S.groth16_vkey_to_json(vk)
    assert set(vkj) == {"one1", "ltgm_io", "one2", "gm", "d", "ab"}
    vk2 = S.groth16_vkey_of_json(json.loads(S.dumps(vkj)))
    assert proto.verify(public, vk2, proof)

    pkj = S.groth16_pkey_to_json(pk)
    pk2 = S.groth16_pkey_of_json(json.loads(S.dumps(pkj)))
    # proofs from the deserialized pkey must be reproducible
    p3 = proto.prove(Gen(6), q, pk2, sol)
    assert (p3.a, p3.b, p3.c) == (proof.a, proof.b, proof.c)


def test_pinocchio_proof_schema_and_roundtrip():
    c, q, sol = _setup()
    proto = Pinocchio(zk=True)
    pk, vk = proto.keygen(Gen(7), c.circuit, q)
    proof = proto.prove(Gen(8), q, pk, sol)
    public = {v: f for v, f in sol.items() if v not in c.circuit.mids}
    j = S.pinocchio_proof_to_json(proof)
    # pinocchio.ml:195-208 field names
    assert set(j) == {"vv", "ww", "yy", "h", "vavv", "waww", "yayy", "bvwy"}
    p2 = S.pinocchio_proof_of_json(json.loads(S.dumps(j)))
    assert proto.verify(public, vk, p2)
    # key schemas
    assert set(S.pinocchio_vkey_to_json(vk)) == {
        "one", "one2", "av", "aw", "ay", "gm2", "bgm", "bgm2", "yt",
        "vv_io", "ww_io", "yy_io"}
    assert set(S.pinocchio_pkey_to_json(pk)) == {
        "vv", "ww", "yy", "vav", "waw", "yay", "si", "bvwy", "si2",
        "vt", "wt", "yt", "vavt", "wawt", "yayt", "vbt", "wbt", "ybt",
        "v_all", "w_all"}
