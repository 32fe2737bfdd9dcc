"""Device-resident Pinocchio must produce byte-identical proofs to the
golden protocol given identical injected randomness (NTT domain)."""

import jax.numpy as jnp
import pytest

from zukelang_tpu.core import comp, flat as flat_mod, lang as L, qap as qap_mod
from zukelang_tpu.golden.field import Fr
from zukelang_tpu.protocols.pinocchio import Pinocchio
from zukelang_tpu.rng import Gen, InjectedRng


def _instance():
    e = L.let_(L.input("input", L.SECRET, L.ty_field),
               lambda x: L.add(L.add(L.mul(L.mul(x, x), x), x), L.fnum(3)))
    c = comp.compile_expr(e)
    q = qap_mod.build(c.gates, domain="ntt")
    _i, env_lang, env_code = comp.gen_inputs(c.inputs, Gen(3))
    sol = comp.code_eval_list(env_code, c.codes)
    return c, q, sol


KEY_SCALARS = [Fr(i + 2000) for i in range(8)]
PROVE_SCALARS = [Fr(71), Fr(72), Fr(73)]


def _proof_bytes(p):
    return b"".join(
        getattr(p, f).to_compressed_bytes()
        for f in ("vv", "ww", "yy", "h", "vavv", "waww", "yayy", "bvwy"))


@pytest.mark.slow
@pytest.mark.parametrize("zk", [False, True], ids=["nonzk", "zk"])
def test_device_pinocchio_matches_golden(monkeypatch, zk):
    from zukelang_tpu.protocols import groth16_device as gd
    from zukelang_tpu.protocols import pinocchio_device as pd
    monkeypatch.setattr(gd, "DEFAULT_MSM_WINDOW", 4)
    monkeypatch.setattr(gd, "DEFAULT_FB_WINDOW", 4)
    c, q, sol = _instance()
    proto = Pinocchio(zk=zk)
    pk, vk = proto.keygen(InjectedRng(KEY_SCALARS), c.circuit, q)
    golden_proof = proto.prove(InjectedRng(PROVE_SCALARS), q, pk, sol)

    fc = flat_mod.flatten(c.gates)
    dpk, dvk = pd.keygen_device(
        fc, mids=list(c.circuit.mids),
        ios=list(c.circuit.inputs_public | c.circuit.outputs),
        rng=InjectedRng(KEY_SCALARS))
    wm = jnp.asarray(fc.pack_witness(sol))
    dev_proof = pd.prove_device(dpk, fc, wm, InjectedRng(PROVE_SCALARS),
                                zk=zk)

    assert _proof_bytes(dev_proof) == _proof_bytes(golden_proof)

    public = {v: f for v, f in sol.items() if v not in c.circuit.mids}
    assert pd.verify(public, dvk, dev_proof)
    assert proto.verify(public, vk, dev_proof)

    # vkeys agree point for point
    assert dvk.av == vk.av and dvk.yt == vk.yt and dvk.bgm == vk.bgm
    assert dvk.vv_io == vk.vv_io and dvk.ww_io == vk.ww_io
