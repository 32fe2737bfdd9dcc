"""JaxEngine vs GoldenEngine: the NTT-domain QAP pipelines must agree."""

import pytest

from zukelang_tpu.core import comp, lang as L, poly, qap as qap_mod
from zukelang_tpu.engine.base import GoldenEngine
from zukelang_tpu.golden.field import Fr
from zukelang_tpu.rng import Gen


def _instance():
    e = L.let_(L.input("input", L.SECRET, L.ty_field),
               lambda x: L.add(L.add(L.mul(L.mul(x, x), x), x), L.fnum(3)))
    c = comp.compile_expr(e)
    q = qap_mod.build(c.gates, domain="ntt")
    _i, env_lang, env_code = comp.gen_inputs(c.inputs, Gen(4))
    sol = comp.code_eval_list(env_code, c.codes)
    return c, q, sol


def test_jax_witness_reduction_matches_golden():
    from zukelang_tpu.engine.jax_engine import JaxEngine
    c, q, sol = _instance()
    ga, gb, gh = GoldenEngine().qap_witness_reduction(q, sol)
    ja, jb, jh = JaxEngine().qap_witness_reduction(q, sol)
    assert poly.equal(ja, ga)
    assert poly.equal(jb, gb)
    assert poly.equal(jh, gh)


def test_jax_qap_eval_at_matches_golden():
    from zukelang_tpu.engine.jax_engine import JaxEngine
    c, q, sol = _instance()
    x = Fr(987654321)
    gv, gw, gy = GoldenEngine().qap_eval_at(q, x)
    jv, jw, jy = JaxEngine().qap_eval_at(q, x)
    assert jv == gv and jw == gw and jy == gy


@pytest.mark.slow
def test_groth16_with_jax_engine_end_to_end():
    from zukelang_tpu.engine.jax_engine import JaxEngine
    from zukelang_tpu.protocols.groth16 import Groth16
    from zukelang_tpu.rng import InjectedRng
    c, q, sol = _instance()
    eng = JaxEngine(msm_window=4)
    golden = Groth16()
    accel = Groth16(engine=eng)
    keys = [Fr(i + 5) for i in range(5)]
    prove_scalars = [Fr(11), Fr(12)]
    pk1, vk1 = golden.keygen(InjectedRng(keys), c.circuit, q)
    pk2, vk2 = accel.keygen(InjectedRng(keys), c.circuit, q)
    assert pk1.a == pk2.a and pk1.ti1 == pk2.ti1 and pk1.ltd_mid == pk2.ltd_mid
    p1 = golden.prove(InjectedRng(prove_scalars), q, pk1, sol)
    p2 = accel.prove(InjectedRng(prove_scalars), q, pk2, sol)
    assert (p1.a, p1.b, p1.c) == (p2.a, p2.b, p2.c)
    public = {v: f for v, f in sol.items() if v not in c.circuit.mids}
    assert accel.verify(public, vk2, p2)
