"""Multi-device sharding tests on the virtual 8-device CPU mesh."""

import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from zukelang_tpu import params
from zukelang_tpu.golden.curve import G1
from zukelang_tpu.golden.field import Fr
from zukelang_tpu.ops import curve_jax as C
from zukelang_tpu.ops import field_jax as F
from zukelang_tpu.ops import ntt as ntt_mod
from zukelang_tpu.parallel import sharded

random.seed(5)


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8, "conftest must provide 8 CPU devices"
    return sharded.make_mesh()


def test_sharded_gate_eval(mesh):
    G, K, V = 64, 2, 16
    rs = np.random.RandomState(0)
    idx = rs.randint(0, V, size=(G, K)).astype(np.int32)
    coefs = [random.randrange(params.R) for _ in range(G * K)]
    coef = np.asarray(F.pack_mont(coefs, F.FR)).reshape(params.FR_LIMBS, G, K)
    wvals = [random.randrange(params.R) for _ in range(V + 1)]
    w = jnp.asarray(F.pack_mont(wvals, F.FR))
    ev = sharded.sharded_gate_eval(mesh, jnp.asarray(idx), jnp.asarray(coef), w)
    got = F.unpack_mont(ev, F.FR)
    exp = [sum(coefs[g * K + k] * wvals[idx[g, k]] for k in range(K)) % params.R
           for g in range(G)]
    assert got == exp


def test_sharded_ntt_matches_single_device(mesh):
    log1, log2 = 3, 4
    N = 1 << (log1 + log2)
    vals = [random.randrange(params.R) for _ in range(N)]
    x_flat = F.pack_mont(vals, F.FR)
    x3 = x_flat.reshape(params.FR_LIMBS, 1 << log1, 1 << log2)
    y = sharded.sharded_ntt(mesh, x3, log1, log2)
    yv = F.unpack_mont(np.asarray(y).reshape(params.FR_LIMBS, N), F.FR)
    ref = F.unpack_mont(ntt_mod.ntt(x_flat), F.FR)
    got = np.array(yv).reshape(1 << log2, 1 << log1)
    # four-step output y[i2, i1] = NTT[i1 + N1*i2]
    for i1 in range(1 << log1):
        for i2 in range(1 << log2):
            assert got[i2, i1] == ref[i1 + (1 << log1) * i2]


def test_sharded_ntt_phase_breakdown(mesh):
    """The per-collective profiler (verdict r4 item 7) runs prefix
    programs whose FULL prefix must equal the production sharded_ntt
    output, and reports all four phases."""
    log1, log2 = 3, 4
    N = 1 << (log1 + log2)
    vals = [random.randrange(params.R) for _ in range(N)]
    x3 = F.pack_mont(vals, F.FR).reshape(
        params.FR_LIMBS, 1 << log1, 1 << log2)
    times = sharded.sharded_ntt_phase_times(mesh, x3, log1, log2, repeats=1)
    assert set(times) == {"col_ntt_s", "twiddle_s", "all_to_all_s",
                          "row_ntt_s", "total_s"}
    assert all(v >= 0 for v in times.values())
    full = sharded._jit_sharded_ntt(mesh, log1, log2, False, "full")(
        x3, jnp.asarray(sharded._twiddle_matrix(log1, log2, False)))
    prod = sharded.sharded_ntt(mesh, x3, log1, log2)
    assert np.array_equal(np.asarray(full), np.asarray(prod))


@pytest.mark.slow
def test_sharded_msm(mesh):
    N = 64
    pts = [G1.generator() * random.randrange(1, params.R) for _ in range(N)]
    scs = [random.randrange(params.R) for _ in range(N)]
    P = C.pack_g1(pts)
    S = F.pack(scs, F.FR)
    got = sharded.sharded_msm_g1(mesh, P, S, c=4)
    assert got == G1.dot(pts, [Fr(s) for s in scs])


PROOF_FIELDS = ("vv", "ww", "yy", "h", "vavv", "waww", "yayy", "bvwy")


@pytest.mark.slow
@pytest.mark.parametrize("zk", [False, True])
def test_sharded_pinocchio_prove(mesh, zk):
    """sharded_pinocchio_prove == single-device pinocchio_device proof
    byte-for-byte under the same injected randomness, and verifies."""
    from zukelang_tpu import bench_lib
    from zukelang_tpu.protocols import groth16_device as gd
    from zukelang_tpu.protocols import pinocchio_device as pd
    from zukelang_tpu.rng import Gen

    old = gd.DEFAULT_MSM_WINDOW, gd.DEFAULT_FB_WINDOW
    gd.DEFAULT_MSM_WINDOW = 4
    gd.DEFAULT_FB_WINDOW = 4
    try:
        inst = bench_lib.make_synthetic_r1cs(6, seed=9)
        fc = inst.fc
        wm = inst.pack_witness()
        pkey, vkey = pd.keygen_device(
            fc, mids=list(inst.mids_cols), ios=list(inst.ios_cols),
            rng=Gen(b"t-pin-keygen"))
        proof_sh = sharded.sharded_pinocchio_prove(
            mesh, pkey, fc, wm, Gen(b"t-pin-prove"), zk=zk, c=4)
        proof_dev = pd.prove_device(pkey, fc, wm, Gen(b"t-pin-prove"), zk=zk)
        for f in PROOF_FIELDS:
            assert getattr(proof_sh, f) == getattr(proof_dev, f), f
        public = {int(c): Fr(inst.witness[c]) for c in inst.ios_cols}
        assert pd.verify(public, vkey, proof_sh)
    finally:
        gd.DEFAULT_MSM_WINDOW, gd.DEFAULT_FB_WINDOW = old


@pytest.mark.slow
def test_dryrun_multichip_entry():
    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge
    ge.dryrun_multichip(8)
