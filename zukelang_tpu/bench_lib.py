"""Synthetic R1CS instances and the benchmark pipeline driver.

BASELINE configs ask for 2^16 / 2^20-constraint synthetic R1CS through the
full NTT + Pippenger Groth16 pipeline.  Circuits of that size are built
directly as flat arrays (building 2^20 python Gate objects would dominate
runtime), with the witness generated host-side to satisfy every gate.

Instance shape: a multiplicative chain.  Witness w_0 = 1 (ONE), w_1 = x
secret; gate g (g = 0..G-1) asserts  w_{g+2} = w_{a_g} * w_{b_g}  with
a_g, b_g random indices < g+2.  One public output (the last wire).

Canonical shape family (`pad_log`): circuits below the canonical size are
padded — trivially-satisfied 0 = 0*0 gates plus unused zero-valued mid
variables — up to a 2^pad_log domain, so every rung <= 2^pad_log reuses
ONE compiled program family (XLA/Mosaic compile cost is ~independent of
size, so per-size program fan-out is what made cold benches take 30+ min
per rung; see docs/PERFORMANCE.md).  The padded proof is a valid proof of
the padded relation, which embeds the original constraints verbatim.
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from typing import List

import numpy as np

from . import params
from .core import flat as flat_mod
from .golden.field import Fr
from .ops import field_jax as F


@dataclass
class SyntheticR1CS:
    fc: flat_mod.FlatCircuit
    witness: List[int]          # values per var column (ints mod r)
    mids_cols: np.ndarray
    ios_cols: np.ndarray

    def pack_witness(self):
        import jax.numpy as jnp
        return jnp.asarray(F.pack_mont(self.witness + [0], F.FR))


def make_synthetic_r1cs(log_constraints: int, seed: int = 1,
                        pad_log: int = None) -> SyntheticR1CS:
    """Build the chain instance; `pad_log` >= log_constraints pads the
    domain with 0 = 0*0 gates and zero-valued dummy mid variables so the
    flattened shapes (gates, vars, mids) match the canonical family."""
    rng = np.random.RandomState(seed)
    G = 1 << log_constraints
    if pad_log is None or pad_log < log_constraints:
        pad_log = log_constraints
    Gp = 1 << pad_log
    V = G + 2            # real vars: ONE, secret, G chain wires
    Vp = Gp + 2          # padded var count (dummies appear in no gate)
    r = params.R

    # vectorized per-gate index draws (a Python randint loop costs minutes
    # at 2^20); uniform-float scaling keeps a_g, b_g < g+2
    his = np.arange(2, G + 2, dtype=np.float64)
    a_idx = np.minimum((rng.random_sample(G) * his).astype(np.int64), G + 1)
    b_idx = np.minimum((rng.random_sample(G) * his).astype(np.int64), G + 1)

    # witness: w0 = 1, w1 = random secret, w_{g+2} = w_a * w_b
    w = [0] * Vp
    w[0] = 1
    w[1] = int.from_bytes(rng.bytes(32), "little") % r
    for g in range(G):
        w[g + 2] = w[a_idx[g]] * w[b_idx[g]] % r

    nl = params.FR_LIMBS
    one_col = np.asarray(F.pack_mont([1], F.FR))  # (nl, 1) Montgomery one

    def side(idx_arr):
        # pad gates reference var 0 with coefficient 0 (affine combo = 0)
        idx_p = np.concatenate(
            [idx_arr, np.zeros(Gp - G, dtype=np.int64)])
        idx = idx_p.reshape(Gp, 1).astype(np.int32)
        coef = np.broadcast_to(one_col.reshape(nl, 1, 1), (nl, Gp, 1)).copy()
        coef[:, G:, :] = 0
        order = np.argsort(idx_p, kind="stable")
        t_var = idx_p[order].astype(np.int32)
        t_gate = order.astype(np.int32)
        t_coef = np.broadcast_to(one_col, (nl, Gp)).copy()
        t_coef[:, order >= G] = 0
        return flat_mod.FlatSide(idx=idx, coef=coef, t_var=t_var,
                                 t_gate=t_gate, t_coef=t_coef)

    lhs_idx = np.arange(2, G + 2, dtype=np.int64)
    fc = flat_mod.FlatCircuit(
        vars_sorted=list(range(Vp)),     # columns ARE the var ids here
        var_index={i: i for i in range(Vp)},
        n_gates=Gp,
        logn=pad_log,
        l=side(a_idx),
        r=side(b_idx),
        lhs=side(lhs_idx),
    )
    # public io: ONE (col 0) and the final output wire; everything else —
    # including the zero-valued dummy pad vars — is mid (their QAP
    # polynomials are identically 0, so they contribute nothing).
    ios = np.array([0, V - 1], dtype=np.int32)
    mids = np.array([i for i in range(1, Vp) if i != V - 1], dtype=np.int32)
    return SyntheticR1CS(fc=fc, witness=w, mids_cols=mids, ios_cols=ios)


def canon_pad_log(log_constraints: int) -> int:
    """Canonical domain for benches: sizes below 2^BENCH_CANON_LOG
    (default 16) are padded up so they share one compiled program family.
    Set BENCH_CANON_LOG=0 to disable (CPU smoke tiers do)."""
    import os
    canon = int(os.environ.get("BENCH_CANON_LOG", "16"))
    return max(log_constraints, canon)


def bench_pinocchio(log_constraints: int, seed: int = 1, repeats: int = 3,
                    zk: bool = True, progress: dict = None):
    """Pinocchio device pipeline on the synthetic R1CS: keygen + the 8-MSM
    prove (10 MSMs with ZK) + 9-pairing verify."""
    import jax
    from .protocols import pinocchio_device as pd
    from .rng import Gen

    prog = progress if progress is not None else {}
    t_all = time.time()
    inst = make_synthetic_r1cs(log_constraints, seed,
                               pad_log=canon_pad_log(log_constraints))
    fc = inst.fc
    prog["build_r1cs_s"] = round(time.time() - t_all, 3)

    t0 = time.time()
    pk, vk = pd.keygen_device(
        fc, mids=list(inst.mids_cols), ios=list(inst.ios_cols),
        rng=Gen(b"bench-pin-keygen"))
    jax.device_get(pk.vv[0][..., :1])
    t_keygen = time.time() - t0
    prog["keygen_s"] = round(t_keygen, 3)

    wm = inst.pack_witness()
    t0 = time.time()
    proof = pd.prove_device(pk, fc, wm, Gen(b"bench-pin-prove"), zk=zk)
    t_first = time.time() - t0
    prog["prove_first_s"] = round(t_first, 3)

    times = []
    for i in range(repeats):
        t0 = time.time()
        proof = pd.prove_device(pk, fc, wm, Gen(b"bench-pin-%d" % i), zk=zk)
        times.append(time.time() - t0)
    t_prove = min(times)
    prog["prove_s"] = round(t_prove, 4)

    t0 = time.time()
    public = {int(c): Fr(inst.witness[c]) for c in inst.ios_cols}
    ok = pd.verify(public, vk, proof)
    t_verify = time.time() - t0
    prog["verify_s"] = round(t_verify, 3)
    assert ok, "benchmark proof failed to verify"

    n = 1 << log_constraints
    # G1-equivalent terms: 5 G1 mid MSMs + h (n) + 2 G2 mid (~3x) + ZK 2 all-var
    msm_terms = 5 * n + n + 3 * 2 * n + (2 * n if zk else 0)
    return {
        "log_constraints": log_constraints,
        "domain_log": fc.logn,
        "keygen_s": t_keygen,
        "prove_first_s": t_first,
        "prove_s": t_prove,
        "verify_s": t_verify,
        "msm_terms_per_prove": msm_terms,
        "msm_mops_per_s": msm_terms / t_prove / 1e6,
        "verified": ok,
        "zk": zk,
    }


def bench_groth16(log_constraints: int, seed: int = 1, repeats: int = 3,
                  progress: dict = None):
    """Full keygen + prove + verify; returns timing dict.

    `progress` (optional dict) is updated IN PLACE as stages complete, so a
    crashing run still reports how far it got and what each finished stage
    cost — the bench driver uses this to distinguish "broken" from "slow".
    """
    import jax
    from .protocols import groth16_device as gd
    from .rng import Gen

    prog = progress if progress is not None else {}
    t_all = time.time()

    inst = make_synthetic_r1cs(log_constraints, seed,
                               pad_log=canon_pad_log(log_constraints))
    fc = inst.fc
    prog["build_r1cs_s"] = round(time.time() - t_all, 3)

    # Resume driver (failure recovery): with ZUKELANG_CRS_CHECKPOINT set,
    # a restarted run reloads the checkpointed keypair and skips keygen —
    # the most expensive stage; a first run keygens then checkpoints.
    import os
    ckpt = os.environ.get("ZUKELANG_CRS_CHECKPOINT")
    if ckpt and not ckpt.endswith(".npz"):
        ckpt += ".npz"
    t0 = time.time()
    if ckpt and os.path.exists(ckpt):
        crs, vkey = gd.load_keypair(ckpt)
        prog["resumed_from_checkpoint"] = True
    else:
        crs, vkey = gd.keygen_device(
            fc, mids=list(inst.mids_cols), ios=list(inst.ios_cols),
            rng=Gen(b"bench-keygen"))
        # NB: block_until_ready does not actually block through the axon
        # TPU tunnel; a device_get of a slice is the reliable barrier.
        jax.device_get(crs.ti1[0][..., :1])
        if ckpt:
            gd.save_keypair(ckpt, crs, vkey)
    t_keygen = time.time() - t0
    prog["keygen_s"] = round(t_keygen, 3)

    wm = inst.pack_witness()
    # warm-up (compilation)
    t0 = time.time()
    proof = gd.prove_device(crs, fc, wm, Gen(b"bench-prove"))
    t_first = time.time() - t0
    prog["prove_first_s"] = round(t_first, 3)

    times = []
    for i in range(repeats):
        t0 = time.time()
        proof = gd.prove_device(crs, fc, wm, Gen(b"bench-prove-%d" % i))
        times.append(time.time() - t0)
    t_prove = min(times)
    prog["prove_s"] = round(t_prove, 4)

    t0 = time.time()
    public = {int(c): Fr(inst.witness[c]) for c in inst.ios_cols}
    ok = gd.verify(public, vkey, proof)
    t_verify = time.time() - t0
    prog["verify_s"] = round(t_verify, 3)
    assert ok, "benchmark proof failed to verify"

    n = 1 << log_constraints
    # MSM throughput: prove does 3 G1 MSMs of n, 1 G1 of n-1, 1 of |mids|,
    # 1 G2 MSM of n.  Count G1-equivalent point-ops (G2 add ~ 3x G1).
    msm_terms = 4 * n + len(inst.mids_cols) + 3 * n
    return {
        "log_constraints": log_constraints,
        "domain_log": fc.logn,
        "keygen_s": t_keygen,
        "prove_first_s": t_first,
        "prove_s": t_prove,
        "verify_s": t_verify,
        "msm_terms_per_prove": msm_terms,
        "msm_mops_per_s": msm_terms / t_prove / 1e6,
        "verified": ok,
    }
