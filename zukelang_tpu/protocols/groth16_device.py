"""Device-resident Groth16: CRS and prover state live on-device as packed
limb arrays; only the 3 proof points and the (small) verifying key ever
leave the chip.

Same math as protocols.groth16 (mirroring src/groth16/groth16.ml) and
byte-identical proofs given the same injected randomness — differentially
tested against the golden path on small circuits.  This is the bench /
production path for 2^16..2^20-constraint R1CS: witness reduction is the
NTT pipeline, CRS generation is fixed-base batches, proving is Pippenger
MSMs, all jitted with shapes padded to powers of two.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import params
from ..core import flat as flat_mod
from ..engine import jax_engine as je
from ..golden.curve import G1, G2, GT
from ..golden.field import Fr
from ..pairing import pairing
from ..ops import curve_jax as C
from ..ops import field_jax as F
from ..ops import msm as msm_mod
from ..ops import ntt as ntt_mod


@dataclass
class DeviceCRS:
    """Proving key on device (groth16.ml:24-34 layout, packed)."""
    alpha_g1: G1               # host single points (tiny)
    beta_g1: G1
    beta_g2: G2
    delta_g1: G1
    delta_g2: G2
    ti1: C.AffinePoint         # {tau^i} G1, batch N (padded), affine (X, Y)
    ti2: C.AffinePoint         # {tau^i} G2
    ltd_mid: C.AffinePoint     # {L_k(tau)/delta} for mids
    tiztd: C.AffinePoint       # {tau^i Z(tau)/delta}
    mids_idx: np.ndarray       # witness columns feeding ltd_mid
    n: int                     # domain size (degree of Z)


@dataclass
class DeviceVKey:
    one1: G1
    ltgm_io: Dict               # var -> G1 (golden; io is small)
    one2: G2
    gm: G2
    d: G2
    ab: GT
    alpha_g1: Optional[G1] = None   # batch-verification extensions
    beta_g2: Optional[G2] = None


@functools.lru_cache(maxsize=8)
def _jit_from_mont(nl: int):
    return jax.jit(lambda S: F.from_mont(S, F.FR)[: params.FR_LIMBS])


def _pad_scalars(scalars_mont: jnp.ndarray, n: int) -> jnp.ndarray:
    cur = scalars_mont.shape[1]
    if cur < n:
        return jnp.pad(scalars_mont, ((0, 0), (0, n - cur)))
    return scalars_mont[:, :n]


def _pad_points(p, n: int, group: str):
    """Pad a Jacobian (X,Y,Z) or affine (X,Y) batch with infinities."""
    cur = p[0].shape[-1]
    if cur == n:
        return p
    inf = C.infinity_g1(n - cur) if group == "g1" else C.infinity_g2(n - cur)
    if len(p) == 2:
        inf = (inf[0], inf[2])  # affine infinity marker is (0, 0)
    return tuple(jnp.concatenate([a, b], axis=-1) for a, b in zip(p, inf))


def _np2(n: int) -> int:
    return 1 << max(4, (n - 1).bit_length())


# MSM window width; None = size-based auto (ops.msm.auto_window).  CPU
# test harnesses pin this to 4 (XLA:CPU compiles the 2^c-bucket window
# program too slowly at larger widths).
DEFAULT_MSM_WINDOW = None

# Fixed-base window width for keygen tables (2^c entries per window).  CPU
# smoke tiers pin this to 4 (the large table build is minutes of XLA:CPU
# point-adds).  On TPU, 16 halves the per-element madd count and gather
# traffic vs 8 (W = 16 windows per 256-bit scalar instead of 32); the
# 2^16-entry-per-window tables are built once on device and persisted to
# .zk_cache (~200 MB G1 / ~400 MB G2 in HBM at dispatch time).
DEFAULT_FB_WINDOW = 16


def _msm_device_deferred(points: C.Point, scalars_mont: jnp.ndarray,
                         group: str, c: int = None):
    """Dispatch one MSM; returns resolve() -> batch-1 device point."""
    if c is None:
        c = DEFAULT_MSM_WINDOW
    # Size by the SCALAR count: points beyond it pair with zero scalars
    # and contribute nothing, so they are truncated.
    n = _np2(scalars_mont.shape[1])
    P = (tuple(x[..., :n] for x in points)
         if points[0].shape[-1] > n else _pad_points(points, n, group))
    S = _jit_from_mont(params.FR_LIMBS)(_pad_scalars(scalars_mont, n))
    return msm_mod.msm_staged_deferred(P, S, group=group, c=c)


def _msm_device(points: C.Point, scalars_mont: jnp.ndarray, group: str,
                c: int = None) -> C.Point:
    """Dispatch one MSM, result stays on device (batch-1 point)."""
    return _msm_device_deferred(points, scalars_mont, group, c)()


def _unpack_many(dev_points, group: str):
    """Batch-1 device points -> golden points with ONE device fetch."""
    if not dev_points:
        return []
    cat = tuple(jnp.concatenate([p[i] for p in dev_points], axis=-1)
                for i in range(3))
    return (C.unpack_g1 if group == "g1" else C.unpack_g2)(cat)


def _msm(points: C.Point, scalars_mont: jnp.ndarray, group: str,
         c: int = None) -> "G1 | G2":
    return _unpack_many([_msm_device(points, scalars_mont, group, c)],
                        group)[0]


def keygen_device(fc: flat_mod.FlatCircuit, mids: Sequence, ios: Sequence,
                  rng) -> Tuple[DeviceCRS, DeviceVKey]:
    """Groth16 setup on device.  mids/ios are Var lists (circuit partition,
    groth16.ml:227-233); scalars drawn in source order alpha, beta, gamma,
    delta, tau (groth16.ml:51-55)."""
    alpha = rng.fr()
    beta = rng.fr()
    gamma = rng.fr()
    delta = rng.fr()
    tau = rng.fr()

    n = fc.domain_size
    r = params.R

    # Per-variable evaluations at tau (device transpose matvec).
    lag = je._lagrange_at(fc.logn, tau.n)
    v_at = je._jit_transpose_matvec(len(fc.vars_sorted))(
        jnp.asarray(fc.l.t_var), jnp.asarray(fc.l.t_gate),
        jnp.asarray(fc.l.t_coef), lag)
    w_at = je._jit_transpose_matvec(len(fc.vars_sorted))(
        jnp.asarray(fc.r.t_var), jnp.asarray(fc.r.t_gate),
        jnp.asarray(fc.r.t_coef), lag)
    y_at = je._jit_transpose_matvec(len(fc.vars_sorted))(
        jnp.asarray(fc.lhs.t_var), jnp.asarray(fc.lhs.t_gate),
        jnp.asarray(fc.lhs.t_coef), lag)

    # L_k(tau) = beta*v_k + alpha*w_k + y_k, then /delta (mids) or /gamma (ios)
    nv = v_at.shape[1]
    l_at = _jit_lin3(nv)(
        v_at, w_at, y_at,
        F.const_mont(beta.n, nv, F.FR), F.const_mont(alpha.n, nv, F.FR))

    mids_idx = np.array([fc.var_index[v] for v in sorted(mids)], dtype=np.int32)
    ios_idx = np.array([fc.var_index[v] for v in sorted(ios)], dtype=np.int32)
    dinv = pow(delta.n, -1, r)
    ginv = pow(gamma.n, -1, r)
    ltd_mid_sc = _jit_scale(len(mids_idx))(
        l_at[:, mids_idx], F.const_mont(dinv, len(mids_idx), F.FR))
    ltgm_io_sc = _jit_scale(len(ios_idx))(
        l_at[:, ios_idx], F.const_mont(ginv, len(ios_idx), F.FR))

    # host: powers of tau and the Z(tau) ladder (O(n) modmuls).  Exactly n
    # entries: the prover truncates every table to the 2^logn domain width
    # anyway (groth16.ml:70-79 materializes 0..n, but tau^n enters the
    # proof only through Z(tau) inside tiztd), and n is already a power of
    # two — n+2 entries would pad the fixed-base batches to 2n, doubling
    # the dominant keygen kernel work.
    ti = []
    acc = 1
    for _ in range(n):
        ti.append(acc)
        acc = acc * tau.n % r
    z_tau = (pow(tau.n, n, r) - 1) % r
    ztd = z_tau * dinv % r
    tizd = [ti[i] * ztd % r for i in range(n - 1)]

    # fixed-base batches, normalized to affine so every prove runs its
    # MSM bucket phase on the 11-mul mixed add (curve_jax.point_madd)
    ti1 = _to_affine("g1")(_fixed_base_std(ti, "g1"))
    ti2 = _to_affine("g2")(_fixed_base_std(ti, "g2"))
    tiztd = _to_affine("g1")(_fixed_base_std(tizd, "g1"))
    ltd_mid = _to_affine("g1")(_fixed_base_mont(ltd_mid_sc, "g1"))
    ltgm_io_pts = C.unpack_g1(_fixed_base_mont(ltgm_io_sc, "g1"))

    g1 = G1.generator()
    g2 = G2.generator()
    crs = DeviceCRS(
        alpha_g1=g1 * alpha, beta_g1=g1 * beta, beta_g2=g2 * beta,
        delta_g1=g1 * delta, delta_g2=g2 * delta,
        ti1=ti1, ti2=ti2, ltd_mid=ltd_mid, tiztd=tiztd,
        mids_idx=mids_idx, n=n)
    vkey = DeviceVKey(
        one1=g1,
        ltgm_io={v: ltgm_io_pts[i] for i, v in enumerate(sorted(ios))},
        one2=g2, gm=g2 * gamma, d=g2 * delta,
        ab=pairing(g1 * alpha, g2 * beta),
        alpha_g1=g1 * alpha, beta_g2=g2 * beta)
    return crs, vkey


@functools.lru_cache(maxsize=32)
def _jit_lin3(n: int):
    def run(v, w, y, b, a):
        return F.add(F.add(F.mont_mul(v, b, F.FR), F.mont_mul(w, a, F.FR), F.FR),
                     y, F.FR)
    return jax.jit(run)


@functools.lru_cache(maxsize=32)
def _jit_scale(n: int):
    def run(x, s):
        return F.mont_mul(x, s, F.FR)
    return jax.jit(run)


# The window table rides in as a jit ARGUMENT (device-resident, cached in
# msm.fixed_base_table_device): baked-constant tables at c=16 are ~300 MB
# of HLO and exceed the axon tunnel's remote-compile request limit.

@functools.lru_cache(maxsize=32)
def _jit_fixed_base_std(n: int, group: str, c: int):
    def run(S_std, table):
        return msm_mod.fixed_base_mul(S_std, group=group, c=c, table=table)
    return jax.jit(run)


@functools.lru_cache(maxsize=32)
def _jit_fixed_base_mont(n: int, group: str, c: int):
    def run(S_mont, table):
        return msm_mod.fixed_base_mul(F.from_mont(S_mont, F.FR)[:params.FR_LIMBS],
                                      group=group, c=c, table=table)
    return jax.jit(run)


def _fixed_base_std(scalars: List[int], group: str) -> C.Point:
    from .. import aot
    n = _np2(len(scalars))
    S = F.pack(scalars + [0] * (n - len(scalars)), F.FR)
    tbl = msm_mod.fixed_base_table_device(group, DEFAULT_FB_WINDOW)
    return aot.maybe_call(
        f"fb_std-{group}-c{DEFAULT_FB_WINDOW}",
        _jit_fixed_base_std(n, group, DEFAULT_FB_WINDOW), S, tbl)


def _fixed_base_mont(scalars_mont: jnp.ndarray, group: str) -> C.Point:
    from .. import aot
    n = _np2(scalars_mont.shape[1])
    tbl = msm_mod.fixed_base_table_device(group, DEFAULT_FB_WINDOW)
    return aot.maybe_call(
        f"fb_mont-{group}-c{DEFAULT_FB_WINDOW}",
        _jit_fixed_base_mont(n, group, DEFAULT_FB_WINDOW),
        _pad_scalars(scalars_mont, n), tbl)


@functools.lru_cache(maxsize=4)
def _to_affine(group: str):
    ops = C.FQ_OPS if group == "g1" else C.FQ2_OPS
    return jax.jit(functools.partial(C.to_affine, ops=ops))


def prove_device(crs: DeviceCRS, fc: flat_mod.FlatCircuit,
                 witness_mont: jnp.ndarray, rng) -> "Proof":
    """Groth16 prove on device (groth16.ml:123-161).

    witness_mont: (nl, V+1) Montgomery witness (flat.pack_witness layout).
    """
    from .groth16 import Proof

    r_sc = rng.fr()
    s_sc = rng.fr()

    a_comb, b_comb, h = je.run_witness_reduction(fc, witness_mont)

    n = crs.n
    npad = _np2(n)
    c_w = DEFAULT_MSM_WINDOW

    def fit_pts(p, group="g1"):
        if p[0].shape[-1] > npad:
            return tuple(x[..., :npad] for x in p)
        return _pad_points(p, npad, group)

    def fit_sc(s):
        return _pad_scalars(s, npad)

    # the whole G1 side (A, B1, H, C-mid) is ONE program dispatch: four
    # MSMs against three shared tables, batched through every stage
    g1_tables = (fit_pts(crs.ti1), fit_pts(crs.tiztd), fit_pts(crs.ltd_mid))
    g1_scalars = [fit_sc(a_comb), fit_sc(b_comb),
                  fit_sc(h[:, : max(1, n - 1)]),
                  fit_sc(witness_mont[:, crs.mids_idx])]
    # dispatch BOTH programs before the first collision-flag sync so the
    # G2 MSM queues behind the G1 side instead of waiting on its resolve
    g1_resolve = msm_mod.msm_many_staged_deferred(
        g1_tables, g1_scalars, pmap=(0, 0, 1, 2), group="g1", c=c_w)
    b_resolve = _msm_device_deferred(crs.ti2, b_comb, "g2", c=c_w)
    G1_d = g1_resolve()
    B_d = b_resolve()
    A_sum, B1_sum, H_sum, Cmid = C.unpack_g1(G1_d)
    (B_sum,) = _unpack_many([B_d], "g2")

    a = crs.alpha_g1 + A_sum + crs.delta_g1 * r_sc
    b = crs.beta_g2 + B_sum + crs.delta_g2 * s_sc
    b1 = crs.beta_g1 + B1_sum + crs.delta_g1 * s_sc
    c = (Cmid + H_sum + a * s_sc + b1 * r_sc
         - crs.delta_g1 * (r_sc * s_sc))
    return Proof(a=a, b=b, c=c)


def verify(public: Dict, vkey: DeviceVKey, proof) -> bool:
    io_sorted = sorted(vkey.ltgm_io.keys())
    if set(public.keys()) != set(io_sorted):
        return False
    lio = G1.dot([vkey.ltgm_io[k] for k in io_sorted],
                 [public[k] for k in io_sorted])
    return (pairing(proof.a, proof.b)
            == vkey.ab + pairing(lio, vkey.gm) + pairing(proof.c, vkey.d))


# ---------------------------------------------------------------------------
# CRS checkpointing (SURVEY.md section 5: native array checkpoints for large
# CRS; the JSON schema in zukelang_tpu.serialize covers the small/interop
# case, this covers multi-GB proving keys)
# ---------------------------------------------------------------------------

def _crs_arrays(crs: DeviceCRS) -> dict:
    arrays = {}
    for name in ("ti1", "ti2", "ltd_mid", "tiztd"):
        pt = getattr(crs, name)
        for i, coord in enumerate("xyz"[: len(pt)]):
            arrays[f"{name}_{coord}"] = np.asarray(pt[i])
    arrays["mids_idx"] = crs.mids_idx
    arrays["n"] = np.array([crs.n])
    for name in ("alpha_g1", "beta_g1", "delta_g1",
                 "beta_g2", "delta_g2"):
        arrays[name] = np.frombuffer(
            getattr(crs, name).to_compressed_bytes(), dtype=np.uint8)
    return arrays


def save_crs(path: str, crs: DeviceCRS) -> None:
    """Write the proving key as a compressed .npz of limb arrays."""
    np.savez_compressed(path, **_crs_arrays(crs))


def save_keypair(path: str, crs: DeviceCRS, vkey: "DeviceVKey") -> None:
    """CRS checkpoint + the verification key in one .npz, enabling a
    keygen-resume driver: a killed/restarted prover run reloads both and
    skips the most expensive stage (the reference has no counterpart —
    SURVEY.md section 5 failure-recovery row)."""
    import json as _json
    from .. import serialize as ser
    vk = {
        "one1": ser.g1_to_json(vkey.one1),
        "one2": ser.g2_to_json(vkey.one2),
        "gm": ser.g2_to_json(vkey.gm),
        "d": ser.g2_to_json(vkey.d),
        "ab": ser.gt_to_json(vkey.ab),
        "ltgm_io": {str(k): ser.g1_to_json(v)
                    for k, v in vkey.ltgm_io.items()},
    }
    if vkey.alpha_g1 is not None:
        vk["alpha_g1"] = ser.g1_to_json(vkey.alpha_g1)
    if vkey.beta_g2 is not None:
        vk["beta_g2"] = ser.g2_to_json(vkey.beta_g2)
    arrays = _crs_arrays(crs)
    arrays["vkey_json"] = np.frombuffer(_json.dumps(vk).encode(),
                                        dtype=np.uint8)
    np.savez_compressed(path, **arrays)


def load_keypair(path: str):
    """Inverse of save_keypair: (DeviceCRS, DeviceVKey)."""
    import json as _json
    from .. import serialize as ser
    crs = load_crs(path)
    z = np.load(path if path.endswith(".npz") else path + ".npz")
    vk = _json.loads(bytes(z["vkey_json"].tobytes()).decode())
    vkey = DeviceVKey(
        one1=ser.g1_of_json(vk["one1"]),
        ltgm_io={int(k): ser.g1_of_json(v)
                 for k, v in vk["ltgm_io"].items()},
        one2=ser.g2_of_json(vk["one2"]),
        gm=ser.g2_of_json(vk["gm"]),
        d=ser.g2_of_json(vk["d"]),
        ab=ser.gt_of_json(vk["ab"]),
        alpha_g1=(ser.g1_of_json(vk["alpha_g1"])
                  if "alpha_g1" in vk else None),
        beta_g2=(ser.g2_of_json(vk["beta_g2"])
                 if "beta_g2" in vk else None),
    )
    return crs, vkey


def load_crs(path: str) -> DeviceCRS:
    from ..golden.curve import G1 as _G1, G2 as _G2
    z = np.load(path)

    def pt(name):
        if f"{name}_z" in z.files:  # pre-affine checkpoint: normalize
            jac = tuple(jnp.asarray(z[f"{name}_{c}"]) for c in "xyz")
            grp = "g2" if name == "ti2" else "g1"
            return _to_affine(grp)(jac)
        return tuple(jnp.asarray(z[f"{name}_{c}"]) for c in "xy")

    return DeviceCRS(
        alpha_g1=_G1.of_compressed_bytes(z["alpha_g1"].tobytes()),
        beta_g1=_G1.of_compressed_bytes(z["beta_g1"].tobytes()),
        beta_g2=_G2.of_compressed_bytes(z["beta_g2"].tobytes()),
        delta_g1=_G1.of_compressed_bytes(z["delta_g1"].tobytes()),
        delta_g2=_G2.of_compressed_bytes(z["delta_g2"].tobytes()),
        ti1=pt("ti1"), ti2=pt("ti2"), ltd_mid=pt("ltd_mid"),
        tiztd=pt("tiztd"),
        mids_idx=z["mids_idx"], n=int(z["n"][0]))
