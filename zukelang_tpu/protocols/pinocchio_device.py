"""Device-resident Pinocchio Protocol 2: CRS and prover state live
on-device as packed limb arrays; only the 8 proof points and the (small)
verifying key leave the chip.

Same math as protocols.pinocchio (mirroring src/pinocchio/pinocchio.ml)
and byte-identical proofs given the same injected randomness — trapdoor
scalars are drawn in source order rv, rw, s, av, aw, ay, b, gm
(pinocchio.ml:83-91), ZK prove adds dv, dw, dy (:428-430).

The prover is 8 Pippenger MSMs over the mid witness (5 G1 + 2 G2 + the
h(s)-in-the-exponent apply_powers, pinocchio.ml:216-237) plus, for ZK,
2 more all-variable G1 MSMs (:451-486); keygen is one transpose matvec
(all QAP polynomials at s), a handful of device scalar combinations, and
12 fixed-base batches.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import params
from ..core import flat as flat_mod
from ..engine import jax_engine as je
from ..golden.curve import G1, G2
from ..golden.field import Fr
from ..ops import curve_jax as C
from ..ops import field_jax as F
from ..ops import msm as msm_mod
from .groth16_device import (_fixed_base_mont, _fixed_base_std, _msm_device,
                             _pad_points, _pad_scalars, _to_affine,
                             _unpack_many)
from .pinocchio import Proof, VKey


@dataclass
class DevicePKey:
    """pinocchio.ml:37-60 layout; per-variable maps become packed point
    batches indexed by witness column."""
    vv: C.Point            # {g_v^{v_k(s)}}      G1, batch |mids|
    ww: C.Point            # {g_w^{w_k(s)}}      G2
    yy: C.Point            # {g_y^{y_k(s)}}      G1
    vav: C.Point           # {g_v^{av v_k(s)}}   G1
    waw: C.Point           # {g_w^{aw w_k(s)}}   G2
    yay: C.Point           # {g_y^{ay y_k(s)}}   G1
    bvwy: C.Point          # {g^{b(rv v + rw w + ry y)}}  G1
    si: C.Point            # {g^{s^i}} i in 0..n-1  G1
    si2: C.Point           # {g2^{s^i}}          G2 (parity with pkey.si2)
    v_all: C.Point         # {g^{v_k(s)}} vars 0..n_main-1, G1 (ZK h' path)
    w_all: C.Point
    # Variable count V is typically n+2 (> the 2^logn domain); rather than
    # pad EVERY prove MSM to 2n, the all-var tables keep n_main = min(V,
    # domain-width) columns on device and the few overflow vars as golden
    # points, folded in host-side (scalar-mult per tail var per proof).
    v_all_tail: List       # golden G1 for vars n_main..V-1
    w_all_tail: List
    vt: G1                 # single blinding-table points (pinocchio.ml:142-150)
    wt: G2
    yt: G1
    vavt: G1
    wawt: G2
    yayt: G1
    vbt: G1
    wbt: G1
    ybt: G1
    t1: G1                 # g^{t(s)} (ZK h' path; avoids holding s^n in si)
    mids_idx: np.ndarray   # witness columns of the mid variables
    n: int                 # NTT domain size (degree of the target)


@functools.lru_cache(maxsize=32)
def _jit_scalar_tables(nv: int):
    """All per-variable exponent tables from (v, w, y at s) in one program:
    rv*v, rw*w, ry*y, av*(rv*v), aw*(rw*w), ay*(ry*y), b*(sum)."""
    def run(v_at, w_at, y_at, rv_c, rw_c, ry_c, av_c, aw_c, ay_c, b_c):
        mm = lambda a, b: F.mont_mul(a, b, F.FR)
        vv = mm(v_at, rv_c)
        ww = mm(w_at, rw_c)
        yy = mm(y_at, ry_c)
        vav = mm(vv, av_c)
        waw = mm(ww, aw_c)
        yay = mm(yy, ay_c)
        bvwy = mm(F.add(F.add(vv, ww, F.FR), yy, F.FR), b_c)
        return vv, ww, yy, vav, waw, yay, bvwy

    return jax.jit(run)


def keygen_device(fc: flat_mod.FlatCircuit, mids: Sequence, ios: Sequence,
                  rng) -> Tuple[DevicePKey, VKey]:
    """Pinocchio KeyGen on device (pinocchio.ml:77-189)."""
    rv = rng.fr()
    rw = rng.fr()
    s = rng.fr()
    av = rng.fr()
    aw = rng.fr()
    ay = rng.fr()
    b = rng.fr()
    gm = rng.fr()
    ry = rv * rw

    n = fc.domain_size
    r = params.R
    t = (pow(s.n, n, r) - 1) % r    # target(s), Z = x^n - 1 on the domain

    # Every QAP polynomial evaluated at s (device transpose matvec).
    lag = je._lagrange_at(fc.logn, s.n)
    V = len(fc.vars_sorted)
    v_at = je._jit_transpose_matvec(V)(
        jnp.asarray(fc.l.t_var), jnp.asarray(fc.l.t_gate),
        jnp.asarray(fc.l.t_coef), lag)
    w_at = je._jit_transpose_matvec(V)(
        jnp.asarray(fc.r.t_var), jnp.asarray(fc.r.t_gate),
        jnp.asarray(fc.r.t_coef), lag)
    y_at = je._jit_transpose_matvec(V)(
        jnp.asarray(fc.lhs.t_var), jnp.asarray(fc.lhs.t_gate),
        jnp.asarray(fc.lhs.t_coef), lag)

    cm = lambda x: F.const_mont(x % r, V, F.FR)
    vv_s, ww_s, yy_s, vav_s, waw_s, yay_s, bvwy_s = _jit_scalar_tables(V)(
        v_at, w_at, y_at, cm(rv.n), cm(rw.n), cm(ry.n),
        cm(av.n), cm(aw.n), cm(ay.n), cm(b.n))

    mids_idx = np.array([fc.var_index[v] for v in sorted(mids)],
                        dtype=np.int32)
    ios_idx = np.array([fc.var_index[v] for v in sorted(ios)],
                       dtype=np.int32)

    def mid_base(tab, group):
        # affine so the prover's 8 MSMs run the 11-mul mixed-add phase
        return _to_affine(group)(_fixed_base_mont(tab[:, mids_idx], group))

    vv_p = mid_base(vv_s, "g1")
    ww_p = mid_base(ww_s, "g2")
    yy_p = mid_base(yy_s, "g1")
    vav_p = mid_base(vav_s, "g1")
    waw_p = mid_base(waw_s, "g2")
    yay_p = mid_base(yay_s, "g1")
    bvwy_p = mid_base(bvwy_s, "g1")
    # all-var tables: keep the prove MSM family at the domain width (see
    # DevicePKey docstring) — overflow vars become golden tail points.
    from .groth16_device import _np2
    cap = _np2(max(n, len(mids_idx)))
    n_main = min(V, cap)
    v_all_p = _to_affine("g1")(_fixed_base_mont(v_at[:, :n_main], "g1"))
    w_all_p = _to_affine("g1")(_fixed_base_mont(w_at[:, :n_main], "g1"))
    if n_main < V:
        v_all_tail = C.unpack_g1(
            _fixed_base_mont(v_at[:, n_main:], "g1"))[: V - n_main]
        w_all_tail = C.unpack_g1(
            _fixed_base_mont(w_at[:, n_main:], "g1"))[: V - n_main]
    else:
        v_all_tail = []
        w_all_tail = []

    # io points are few: through the same device path, unpacked to golden.
    ios_sorted = sorted(ios)
    vv_io = C.unpack_g1(_fixed_base_mont(vv_s[:, ios_idx], "g1"))[:len(ios_idx)]
    ww_io = C.unpack_g2(_fixed_base_mont(ww_s[:, ios_idx], "g2"))[:len(ios_idx)]
    yy_io = C.unpack_g1(_fixed_base_mont(yy_s[:, ios_idx], "g1"))[:len(ios_idx)]

    # powers of s in both groups (pinocchio.ml:133-134).  Exactly n
    # entries (a power of two, so the fixed-base batch is not padded to
    # 2n): the h MSM needs s^0..s^{n-2} only, and the one use of s^n —
    # g^{t(s)} in the ZK h' derivation (pinocchio.ml:451-486) — is the
    # dedicated t1 point below.
    ti = []
    acc = 1
    for _ in range(n):
        ti.append(acc)
        acc = acc * s.n % r
    si = _to_affine("g1")(_fixed_base_std(ti, "g1"))
    si2 = _to_affine("g2")(_fixed_base_std(ti, "g2"))

    g1 = G1.generator()
    g2 = G2.generator()
    ft = Fr(t)
    pkey = DevicePKey(
        vv=vv_p, ww=ww_p, yy=yy_p, vav=vav_p, waw=waw_p, yay=yay_p,
        bvwy=bvwy_p, si=si, si2=si2, v_all=v_all_p, w_all=w_all_p,
        v_all_tail=v_all_tail, w_all_tail=w_all_tail,
        vt=g1 * (rv * ft), wt=g2 * (rw * ft), yt=g1 * (ry * ft),
        vavt=g1 * (rv * av * ft), wawt=g2 * (rw * aw * ft),
        yayt=g1 * (ry * ay * ft),
        vbt=g1 * (rv * b * ft), wbt=g1 * (rw * b * ft),
        ybt=g1 * (ry * b * ft),
        t1=g1 * ft,
        mids_idx=mids_idx, n=n)
    vkey = VKey(
        one=g1, one2=g2,
        av=g2 * av, aw=g1 * aw, ay=g2 * ay,
        gm2=g2 * gm, bgm=g1 * (gm * b), bgm2=g2 * (gm * b),
        yt=g2 * (ry * ft),
        vv_io=dict(zip(ios_sorted, vv_io)),
        ww_io=dict(zip(ios_sorted, ww_io)),
        yy_io=dict(zip(ios_sorted, yy_io)),
    )
    return pkey, vkey


def prove_device(pkey: DevicePKey, fc: flat_mod.FlatCircuit,
                 witness_mont: jnp.ndarray, rng, zk: bool = True) -> Proof:
    """Pinocchio prove on device (pinocchio.ml:193-250 NonZK, :423-515 ZK).

    witness_mont: (nl, V+1) Montgomery witness (flat.pack_witness layout).
    """
    _a, _b, h = je.run_witness_reduction(fc, witness_mont)

    n = pkey.n
    c_mid = witness_mont[:, pkey.mids_idx]
    V = len(fc.vars_sorted)
    from .groth16_device import DEFAULT_MSM_WINDOW, _np2
    # family width: the domain / mids size; all-var MSMs run over their
    # on-device n_main columns, overflow vars fold in as golden tails.
    npad = _np2(max(pkey.si[0].shape[-1], pkey.v_all[0].shape[-1] if zk
                    else 1, c_mid.shape[-1]))
    n_main = min(V, npad)
    c_all = witness_mont[:, :n_main]

    def fit_pts(p, group="g1"):
        return _pad_points(p, npad, group)

    def fit_sc(s):
        return _pad_scalars(s, npad)

    # the whole G1 side (6 or 8 MSMs) is ONE program dispatch; ditto G2
    g1_tables = [fit_pts(pkey.vv), fit_pts(pkey.yy), fit_pts(pkey.si),
                 fit_pts(pkey.vav), fit_pts(pkey.yay), fit_pts(pkey.bvwy)]
    g1_scalars = [fit_sc(c_mid), fit_sc(c_mid),
                  fit_sc(h[:, : max(1, n - 1)]),
                  fit_sc(c_mid), fit_sc(c_mid), fit_sc(c_mid)]
    pmap = [0, 1, 2, 3, 4, 5]
    if zk:
        g1_tables += [fit_pts(pkey.v_all), fit_pts(pkey.w_all)]
        g1_scalars += [fit_sc(c_all), fit_sc(c_all)]
        pmap += [6, 7]
    # dispatch the G1 and G2 programs back-to-back, then resolve: the
    # collision-flag host sync inside resolve would otherwise serialize
    # the two dispatches (the flag check blocks on the whole program)
    g1_resolve = msm_mod.msm_many_staged_deferred(
        tuple(g1_tables), g1_scalars, pmap=tuple(pmap), group="g1",
        c=DEFAULT_MSM_WINDOW)
    g2_resolve = msm_mod.msm_many_staged_deferred(
        (fit_pts(pkey.ww, "g2"), fit_pts(pkey.waw, "g2")),
        [fit_sc(c_mid), fit_sc(c_mid)], pmap=(0, 1), group="g2",
        c=DEFAULT_MSM_WINDOW)
    G1_d = g1_resolve()
    G2_d = g2_resolve()
    g1_pts = C.unpack_g1(G1_d)
    ww, waww = C.unpack_g2(G2_d)
    vv, yy, h_pt, vavv, yayy, bvwy = g1_pts[:6]

    if not zk:
        return Proof(vv=vv, ww=ww, yy=yy, h=h_pt,
                     vavv=vavv, waww=waww, yayy=yayy, bvwy=bvwy)

    # ZK randomization (pinocchio.ml:427-514)
    dv = rng.fr()
    dw = rng.fr()
    dy = rng.fr()
    v_all, w_all = g1_pts[6:]
    if pkey.v_all_tail:
        tail_sc = [Fr(x) for x in
                   F.unpack_mont(witness_mont[:, n_main:V], F.FR)]
        v_all = v_all + G1.dot(pkey.v_all_tail, tail_sc)
        w_all = w_all + G1.dot(pkey.w_all_tail, tail_sc)

    # t(s) in the exponent (precomputed at keygen: t1 = g^{s^n - 1})
    t_g1 = pkey.t1

    h2 = (h_pt + v_all * dw + w_all * dv + t_g1 * (dv * dw)
          - G1.generator() * dy)
    return Proof(
        vv=vv + pkey.vt * dv,
        ww=ww + pkey.wt * dw,
        yy=yy + pkey.yt * dy,
        h=h2,
        vavv=vavv + pkey.vavt * dv,
        waww=waww + pkey.wawt * dw,
        yayy=yayy + pkey.yayt * dy,
        bvwy=bvwy + pkey.vbt * dv + pkey.wbt * dw + pkey.ybt * dy,
    )


def verify(public: Dict, vkey: VKey, proof: Proof) -> bool:
    """Verification is pairing-bound (9 pairings) — the golden verifier."""
    from .pinocchio import Pinocchio
    return Pinocchio().verify(public, vkey, proof)
