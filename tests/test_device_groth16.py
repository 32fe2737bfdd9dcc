"""Device-resident Groth16 must produce byte-identical proofs to the golden
protocol given identical injected randomness (NTT domain)."""

import jax.numpy as jnp
import pytest

from zukelang_tpu.core import comp, flat as flat_mod, lang as L, qap as qap_mod
from zukelang_tpu.golden.field import Fr
from zukelang_tpu.protocols.groth16 import Groth16
from zukelang_tpu.rng import Gen, InjectedRng


def _instance():
    e = L.let_(L.input("input", L.SECRET, L.ty_field),
               lambda x: L.add(L.add(L.mul(L.mul(x, x), x), x), L.fnum(3)))
    c = comp.compile_expr(e)
    q = qap_mod.build(c.gates, domain="ntt")
    _i, env_lang, env_code = comp.gen_inputs(c.inputs, Gen(3))
    sol = comp.code_eval_list(env_code, c.codes)
    return c, q, sol


KEY_SCALARS = [Fr(i + 1000) for i in range(5)]
PROVE_SCALARS = [Fr(77), Fr(88)]


@pytest.mark.slow
def test_device_prove_matches_golden(monkeypatch):
    from zukelang_tpu.protocols import groth16_device as gd
    monkeypatch.setattr(gd, "DEFAULT_MSM_WINDOW", 4)
    monkeypatch.setattr(gd, "DEFAULT_FB_WINDOW", 4)
    c, q, sol = _instance()
    proto = Groth16()
    pk, vk = proto.keygen(InjectedRng(KEY_SCALARS), c.circuit, q)
    golden_proof = proto.prove(InjectedRng(PROVE_SCALARS), q, pk, sol)

    fc = flat_mod.flatten(c.gates)
    crs, dvk = gd.keygen_device(
        fc, mids=list(c.circuit.mids),
        ios=list(c.circuit.inputs_public | c.circuit.outputs),
        rng=InjectedRng(KEY_SCALARS))
    wm = jnp.asarray(fc.pack_witness(sol))
    dev_proof = gd.prove_device(crs, fc, wm, InjectedRng(PROVE_SCALARS))

    assert dev_proof.a.to_compressed_bytes() == golden_proof.a.to_compressed_bytes()
    assert dev_proof.b.to_compressed_bytes() == golden_proof.b.to_compressed_bytes()
    assert dev_proof.c.to_compressed_bytes() == golden_proof.c.to_compressed_bytes()

    public = {v: f for v, f in sol.items() if v not in c.circuit.mids}
    assert gd.verify(public, dvk, dev_proof)
    assert proto.verify(public, vk, dev_proof)
