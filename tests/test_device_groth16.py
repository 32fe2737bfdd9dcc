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


def test_keypair_checkpoint_roundtrip(tmp_path):
    """save_keypair/load_keypair (the keygen-resume driver's substrate)
    preserve every CRS table byte and every vkey field.  Pure
    serialization — no device programs, default test tier."""
    import numpy as np
    from zukelang_tpu.golden import G1, G2, pairing
    from zukelang_tpu.ops import curve_jax as C
    from zukelang_tpu.protocols import groth16_device as gd

    g1, g2 = G1.generator(), G2.generator()

    def aff_g1(ks):
        p = C.pack_g1([g1 * k for k in ks])
        return (p[0], p[1])          # Z=1 packed => (X, Y) are affine

    def aff_g2(ks):
        p = C.pack_g2([g2 * k for k in ks])
        return (p[0], p[1])

    crs = gd.DeviceCRS(
        alpha_g1=g1 * 11, beta_g1=g1 * 12, beta_g2=g2 * 13,
        delta_g1=g1 * 14, delta_g2=g2 * 15,
        ti1=aff_g1([1, 2, 3, 4]), ti2=aff_g2([1, 2, 3, 4]),
        ltd_mid=aff_g1([5, 6]), tiztd=aff_g1([7, 8, 9]),
        mids_idx=np.array([2, 3], dtype=np.int32), n=4)
    vkey = gd.DeviceVKey(
        one1=g1, ltgm_io={0: g1 * 21, 5: g1 * 22}, one2=g2,
        gm=g2 * 23, d=g2 * 24, ab=pairing(g1 * 3, g2 * 5),
        alpha_g1=g1 * 11, beta_g2=g2 * 13)

    path = str(tmp_path / "ckpt.npz")
    gd.save_keypair(path, crs, vkey)
    crs2, vkey2 = gd.load_keypair(path)

    for name in ("ti1", "ti2", "ltd_mid", "tiztd"):
        for a, b in zip(getattr(crs, name), getattr(crs2, name)):
            assert np.array_equal(np.asarray(a), np.asarray(b)), name
    assert np.array_equal(crs.mids_idx, crs2.mids_idx)
    assert crs.n == crs2.n
    for name in ("alpha_g1", "beta_g1", "beta_g2", "delta_g1", "delta_g2"):
        assert getattr(crs, name) == getattr(crs2, name), name
    assert vkey2.one1 == vkey.one1 and vkey2.one2 == vkey.one2
    assert vkey2.gm == vkey.gm and vkey2.d == vkey.d
    assert vkey2.ab == vkey.ab
    assert vkey2.ltgm_io == vkey.ltgm_io
    assert vkey2.alpha_g1 == vkey.alpha_g1
    assert vkey2.beta_g2 == vkey.beta_g2


@pytest.mark.slow
def test_bench_resume_from_checkpoint(tmp_path, monkeypatch):
    """The resume driver end-to-end: first bench run keygens and writes
    the checkpoint; a second run loads it (skipping keygen) and produces
    a verifying proof with identical CRS randomness."""
    from zukelang_tpu import bench_lib
    from zukelang_tpu.protocols import groth16_device as gd

    monkeypatch.setattr(gd, "DEFAULT_MSM_WINDOW", 4)
    monkeypatch.setattr(gd, "DEFAULT_FB_WINDOW", 4)
    monkeypatch.setenv("BENCH_CANON_LOG", "0")
    ckpt = str(tmp_path / "crs_ckpt")
    monkeypatch.setenv("ZUKELANG_CRS_CHECKPOINT", ckpt)

    first = bench_lib.bench_groth16(6, repeats=1)
    assert first["verified"]
    import os
    assert os.path.exists(ckpt + ".npz")

    prog = {}
    second = bench_lib.bench_groth16(6, repeats=1, progress=prog)
    assert second["verified"]
    assert prog.get("resumed_from_checkpoint") is True
