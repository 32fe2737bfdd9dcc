"""Protocol tests: Groth16 and Pinocchio end-to-end, soundness rejection,
deterministic reproduction with injected randomness."""

import pytest

from zukelang_tpu.core import comp, lang as L, qap as qap_mod
from zukelang_tpu.golden.field import Fr
from zukelang_tpu.protocols.groth16 import Groth16
from zukelang_tpu.protocols.pinocchio import Pinocchio
from zukelang_tpu.rng import Gen, InjectedRng
from zukelang_tpu.testing.harness import random_test, run_pipeline
from zukelang_tpu.testing.suites import SUITE

PROTOCOLS = [
    ("groth16", lambda: Groth16()),
    ("pinocchio", lambda: Pinocchio(zk=False)),
    ("pinocchio_zk", lambda: Pinocchio(zk=True)),
]


def cubic():
    return L.let_(L.input("input", L.SECRET, L.ty_field),
                  lambda x: L.add(L.add(L.mul(L.mul(x, x), x), x), L.fnum(3)))


@pytest.mark.parametrize("pname,mk_proto", PROTOCOLS, ids=[p for p, _ in PROTOCOLS])
@pytest.mark.parametrize("domain", ["reference", "ntt"])
def test_cubic_end_to_end(pname, mk_proto, domain):
    res = random_test(cubic(), mk_proto(), seed=1, domain=domain)
    assert res.verified


@pytest.mark.parametrize("pname,mk_proto", PROTOCOLS, ids=[p for p, _ in PROTOCOLS])
def test_tampered_public_input_rejected(pname, mk_proto):
    proto = mk_proto()
    e = cubic()
    c = comp.compile_expr(e)
    q = qap_mod.build(c.gates)
    pk, vk = proto.keygen(Gen(11), c.circuit, q)
    _i, env_lang, env_code = comp.gen_inputs(c.inputs, Gen(12))
    sol = comp.code_eval_list(env_code, c.codes)
    proof = proto.prove(Gen(13), q, pk, sol)
    public = {v: f for v, f in sol.items() if v not in c.circuit.mids}
    assert proto.verify(public, vk, proof)
    bad = dict(public)
    k = next(iter(bad))
    bad[k] = bad[k] + Fr(1)
    assert not proto.verify(bad, vk, proof)


def test_groth16_proof_deterministic_with_injected_randomness():
    # Injected scalar streams reproduce CRS and proof exactly
    # (Groth16: 5 keygen + 2 prove scalars; SURVEY.md section 4).
    e = cubic()
    c = comp.compile_expr(e)
    q = qap_mod.build(c.gates)
    keyscalars = [Fr(i + 100) for i in range(5)]
    provescalars = [Fr(7), Fr(8)]

    proto = Groth16()
    pk1, vk1 = proto.keygen(InjectedRng(keyscalars), c.circuit, q)
    pk2, vk2 = proto.keygen(InjectedRng(keyscalars), c.circuit, q)
    assert pk1.a == pk2.a and pk1.ti1 == pk2.ti1

    _i, env_lang, env_code = comp.gen_inputs(c.inputs, Gen(3))
    sol = comp.code_eval_list(env_code, c.codes)
    p1 = proto.prove(InjectedRng(provescalars), q, pk1, sol)
    p2 = proto.prove(InjectedRng(provescalars), q, pk2, sol)
    assert (p1.a, p1.b, p1.c) == (p2.a, p2.b, p2.c)
    # and serialized bytes are identical
    assert p1.a.to_compressed_bytes() == p2.a.to_compressed_bytes()


def test_pinocchio_scalar_consumption_order():
    # 8 keygen scalars (pinocchio.ml:83-91), 3 ZK prove scalars (:428-430)
    e = cubic()
    c = comp.compile_expr(e)
    q = qap_mod.build(c.gates)
    rng = InjectedRng([Fr(i + 2) for i in range(8)])
    proto = Pinocchio(zk=True)
    pk, vk = proto.keygen(rng, c.circuit, q)
    assert rng.pos == 8
    _i, env_lang, env_code = comp.gen_inputs(c.inputs, Gen(4))
    sol = comp.code_eval_list(env_code, c.codes)
    prng = InjectedRng([Fr(21), Fr(22), Fr(23)])
    proof = proto.prove(prng, q, pk, sol)
    assert prng.pos == 3
    public = {v: f for v, f in sol.items() if v not in c.circuit.mids}
    assert proto.verify(public, vk, proof)


@pytest.mark.slow
@pytest.mark.parametrize("name,mk", SUITE, ids=[n for n, _ in SUITE])
def test_full_suite_groth16(name, mk):
    assert random_test(mk(), Groth16(), seed=5).verified


@pytest.mark.slow
@pytest.mark.parametrize("name,mk", SUITE, ids=[n for n, _ in SUITE])
def test_full_suite_pinocchio_zk(name, mk):
    assert random_test(mk(), Pinocchio(zk=True), seed=6).verified


def test_check_u32_end_to_end_groth16():
    from zukelang_tpu.core import lang as L
    from zukelang_tpu.protocols.groth16 import Groth16
    from zukelang_tpu.testing.harness import random_test

    e = L.let_(L.check_u32(L.input("x", L.SECRET, L.ty_uint32)),
               lambda x: L.add_u32(x, L.uint32(7)))
    res = random_test(e, Groth16())
    assert res.verified


def test_groth16_batch_verify():
    from zukelang_tpu.core import comp as comp_mod
    from zukelang_tpu.core import lang as L
    from zukelang_tpu.core import qap as qap_mod
    from zukelang_tpu.golden.field import Fr
    from zukelang_tpu.protocols.batch import (Transcript,
                                              batch_verify_groth16,
                                              prove_many)
    from zukelang_tpu.protocols.groth16 import Groth16
    from zukelang_tpu.rng import Gen

    e = L.let_(L.input("x", L.SECRET, L.ty_field),
               lambda x: L.add(L.mul(L.mul(x, x), x), L.add(x, L.fnum(3))))
    compiled = comp_mod.compile_expr(e)
    q = qap_mod.build(compiled.gates)
    proto = Groth16()
    pk, vk = proto.keygen(Gen(b"kg"), compiled.circuit, q)

    sols = []
    for xval in (4, 11, 123456):
        _, env = comp_mod.convert_inputs(compiled.inputs,
                                         {"x": L.v_field(Fr(xval))})
        sols.append(comp_mod.code_eval_list(env, compiled.codes))
    proofs = prove_many(proto, Gen(b"pv"), q, pk, sols)
    stmts = []
    for sol, prf in zip(sols, proofs):
        public = {v: f for v, f in sol.items()
                  if v not in compiled.circuit.mids}
        assert proto.verify(public, vk, prf)
        stmts.append((public, prf))
    assert batch_verify_groth16(vk, stmts)
    # tamper one statement -> reject
    bad = [(dict(p), pr) for p, pr in stmts]
    k = sorted(bad[1][0])[-1]
    bad[1][0][k] = bad[1][0][k] + Fr(1)
    assert not batch_verify_groth16(vk, bad)
    # transcript determinism
    t1 = Transcript(b"t").absorb(b"a", b"xyz").challenge_fr(b"c")
    t2 = Transcript(b"t").absorb(b"a", b"xyz").challenge_fr(b"c")
    assert t1 == t2
