"""Distributed MSM / NTT / witness evaluation over a jax.sharding.Mesh.

Design (SURVEY.md section 2 "to build" items):

  * MSM: points/scalars sharded along the term axis; each chip runs the
    full Pippenger bucket pipeline on its shard; the per-chip partial
    results (single points) are all_gather'ed and folded with the group
    law (a psum cannot combine group elements).
  * NTT: four-step scheme.  View N = N1*N2 with the array sharded along
    N2-columns: length-N1 column NTTs are chip-local, then the twiddle
    scaling, then one all_to_all transpose re-shards along N1 so the
    length-N2 row NTTs are chip-local again.  Output is in transposed
    (N2, N1) order — callers compose with the matching inverse.
  * Witness/constraint evaluation: gate rows are embarrassingly parallel
    given a replicated witness; shard the gate axis.

Everything runs under shard_map over a 1-D mesh axis "shard"; collectives
ride ICI on real pods.  Tests exercise the same code on an 8-device CPU
mesh (tests/conftest.py) and the driver's dryrun validates compilation.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .. import params
from ..ops import curve_jax as C
from ..ops import field_jax as F
from ..ops import msm as msm_mod
from ..ops import ntt as ntt_mod

AXIS = "shard"


def make_mesh(n_devices: int = None) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (AXIS,))


# ---------------------------------------------------------------------------
# Data-parallel MSM (group-generic: G1 over Fq, G2 over Fq2)
# ---------------------------------------------------------------------------

def _group_tools(group: str):
    if group == "g1":
        return C.FQ_OPS, C.infinity_g1, C.unpack_g1
    return C.FQ2_OPS, C.infinity_g2, C.unpack_g2


def _fold_gathered(points: C.Point, ops: C.FieldOps) -> C.Point:
    """Fold a small batch (n_devices) of points into one with the group
    law — log-depth halving."""
    return msm_mod._hs_total(points, ops)


@functools.lru_cache(maxsize=32)
def _jit_sharded_window(mesh: Mesh, c: int, ndim: int, group: str = "g1"):
    """One Pippenger window with terms sharded across the mesh: each chip
    buckets+reduces its shard, partials are all_gather'ed and folded.
    Cached per (mesh, window size, group) so repeat calls reuse the
    executable."""
    ops, infinity, _ = _group_tools(group)

    def local(pts, dig):
        partial = msm_mod._weighted_bucket_reduce(
            msm_mod._bucket_sums(pts, dig, 1 << c, ops, infinity),
            ops, infinity)
        gathered = tuple(
            jax.lax.all_gather(x, AXIS, axis=x.ndim - 1, tiled=True)
            for x in partial)
        return _fold_gathered(gathered, ops)

    shard = P(*([None] * (ndim - 1) + [AXIS]))
    return jax.jit(jax.shard_map(
        local, mesh=mesh,
        in_specs=((shard,) * 3, P(AXIS)),
        out_specs=(P(*([None] * ndim)),) * 3,
        check_vma=False,
    ))


def sharded_msm_window(mesh: Mesh, points: C.Point, digits: jnp.ndarray,
                       c: int = 8, group: str = "g1") -> C.Point:
    return _jit_sharded_window(mesh, c, points[0].ndim, group)(points, digits)


@functools.lru_cache(maxsize=32)
def _jit_sharded_msm_all(mesh: Mesh, c: int, ndim: int, group: str,
                         n_windows: int):
    """The FULL Pippenger ladder as ONE shard_map program: each device
    scans its term shard over every window (lax.scan body = bucket sums +
    weighted reduce), a single all_gather collects the per-device window
    partials, the device-axis fold and the Horner window combine run
    replicated.  One dispatch / one collective per MSM — on XLA:CPU this
    also avoids piling W async collectives onto the ~40 s rendezvous
    deadline (per-window dispatch aborted under load)."""
    ops, infinity, _ = _group_tools(group)

    n_dev = mesh.devices.size

    def local(pX, pY, pZ, digits):
        pts = (pX, pY, pZ)

        def body(carry, dig):
            ws = msm_mod._weighted_bucket_reduce(
                msm_mod._bucket_sums(pts, dig, 1 << c, ops, infinity),
                ops, infinity)
            return carry, ws

        _, wsums = jax.lax.scan(body, 0, digits)
        # (W, ..., 1) per-window partials -> batch-last (..., W)
        ws2 = tuple(jnp.moveaxis(v[..., 0], 0, -1) for v in wsums)
        # one collective: (D, ..., W), then window-major batch (..., W*D)
        gath = tuple(jax.lax.all_gather(v, AXIS, axis=0, tiled=False)
                     for v in ws2)
        flat = tuple(
            jnp.moveaxis(v, 0, -1).reshape(v.shape[1:-1]
                                           + (n_windows * n_dev,))
            for v in gath)
        # fold the device axis per window (sorted segments), keep tails
        seg = jnp.repeat(jnp.arange(n_windows, dtype=jnp.int32), n_dev)
        sc = msm_mod._hs_segmented_scan(flat, seg, ops)
        tails = tuple(v[..., n_dev - 1::n_dev] for v in sc)
        return msm_mod._combine_windows(tails, c, n_windows, ops)

    shard = P(*([None] * (ndim - 1) + [AXIS]))
    return jax.jit(jax.shard_map(
        local, mesh=mesh,
        in_specs=(shard, shard, shard, P(None, AXIS)),
        out_specs=(P(*([None] * ndim)),) * 3,
        check_vma=False,
    ))


def sharded_msm_device(mesh: Mesh, points: C.Point, scalars_std: jnp.ndarray,
                       group: str = "g1", c: int = 8,
                       max_windows: int = None) -> C.Point:
    """Full MSM with terms sharded across the mesh; result stays on device
    as a batch-1 Jacobian point (replicated).

    `max_windows` truncates to the low windows — only for dryruns/smoke
    tests on hosts too slow for the full ladder (result is then the MSM of
    the scalars' low c*max_windows bits)."""
    digits = msm_mod._jit_windows_extract(c)(scalars_std)
    n_windows = digits.shape[0]
    if max_windows is not None:
        n_windows = min(n_windows, max_windows)
        digits = digits[:n_windows]
    jac = points if len(points) == 3 else _jit_affine_to_jac(group)(points)
    return _jit_sharded_msm_all(mesh, c, jac[0].ndim, group, n_windows)(
        *jac, digits)


def sharded_msm(mesh: Mesh, points: C.Point, scalars_std: jnp.ndarray,
                group: str = "g1", c: int = 8, max_windows: int = None):
    """sharded_msm_device + one host fetch -> golden G1/G2."""
    final = sharded_msm_device(mesh, points, scalars_std, group, c,
                               max_windows)
    _, _, unpack = _group_tools(group)
    return unpack(final)[0]


def sharded_msm_g1(mesh: Mesh, points: C.Point, scalars_std: jnp.ndarray,
                   c: int = 8, max_windows: int = None):
    return sharded_msm(mesh, points, scalars_std, "g1", c, max_windows)


@functools.lru_cache(maxsize=8)
def _jit_affine_to_jac(group: str):
    ops = C.FQ_OPS if group == "g1" else C.FQ2_OPS
    return jax.jit(functools.partial(C.affine_to_jac, ops=ops))


# ---------------------------------------------------------------------------
# Sharded fixed-base batches (keygen workhorse; embarrassingly parallel:
# scalars sharded over the mesh, window table replicated, no collectives)
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=16)
def _jit_sharded_fixed_base(mesh: Mesh, group: str, c: int):
    ndim = 2 if group == "g1" else 3

    def local(S_std):
        return msm_mod.fixed_base_mul(S_std, group=group, c=c)

    out_shard = P(*([None] * ndim + [AXIS]))
    return jax.jit(jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(None, AXIS),),
        out_specs=(out_shard,) * 3,
        check_vma=False,
    ))


def sharded_fixed_base(mesh: Mesh, scalars_std: jnp.ndarray,
                       group: str = "g1", c: int = 8) -> C.Point:
    """[g * s for s in scalars] with the scalar batch sharded over the
    mesh.  Output points stay sharded along the batch axis — exactly the
    layout the term-sharded MSM consumes."""
    return _jit_sharded_fixed_base(mesh, group, c)(scalars_std)


# ---------------------------------------------------------------------------
# Four-step distributed NTT
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=16)
def _twiddle_matrix(log1: int, log2: int, inverse: bool) -> np.ndarray:
    """(nl, N1, N2) Montgomery twiddles w_N^(i*j).  Cached: the Python
    bigint double loop costs seconds at 2^14+ and used to re-run on
    EVERY sharded_ntt call, a constant host overhead that swamped the
    shrinking per-shard device work (docs/SCALING.json r4 recorded NTT
    eff(8)=0.069, below the 2-core structural floor, because of it)."""
    n1, n2 = 1 << log1, 1 << log2
    logn = log1 + log2
    w = ntt_mod.root_for(logn, inverse)
    r = params.R
    rows = []
    for i in range(n1):
        wi = pow(w, i, r)
        acc = 1
        row = []
        for _ in range(n2):
            row.append(acc * F.FR.R % r)
            acc = acc * wi % r
        rows.append(row)
    flat = [v for row in rows for v in row]
    nb = F.FR.nl * 2
    buf = b"".join(v.to_bytes(nb, "little") for v in flat)
    arr = np.frombuffer(buf, dtype="<u2").reshape(n1 * n2, F.FR.nl)
    return arr.T.astype(np.uint32).reshape(F.FR.nl, n1, n2)


@functools.lru_cache(maxsize=32)
def _jit_sharded_ntt(mesh: Mesh, log1: int, log2: int, inverse: bool,
                     upto: str = "full"):
    """Jitted four-step NTT program, cached per (mesh, shape, direction)
    so repeat calls pay one dispatch instead of a fresh shard_map trace
    (which alone dominated small-N wall time).  `upto` truncates the
    pipeline for the per-phase breakdown: 'col' = column NTTs only,
    'tw' = +twiddle scaling, 'a2a' = +all_to_all, 'full' = +row NTTs."""

    def local(blk, twblk):
        # blk: (nl, N1, N2/D) — column NTTs over axis 1 (local)
        y = ntt_mod.ntt(blk, inverse=inverse)
        if upto == "col":
            return y
        # twiddle scaling w^(i1*i2)
        y = ntt_mod._mm(y, twblk)
        if upto == "tw":
            return y
        # all_to_all: reshard from N2-split to N1-split
        # (nl, N1, N2/D) -> (nl, N1/D, N2)
        y = jax.lax.all_to_all(y, AXIS, split_axis=1, concat_axis=2,
                               tiled=True)
        if upto == "a2a":
            # keep the output axis consistent for the breakdown caller
            return jnp.transpose(y, (0, 2, 1))
        # row NTTs over axis 2 -> transform along N2: transpose axes
        y = jnp.transpose(y, (0, 2, 1))      # (nl, N2, N1/D)
        y = ntt_mod.ntt(y, inverse=inverse)  # transform along N2 axis
        return y                              # (nl, N2, N1/D)

    out_axis = (P(None, None, AXIS) if upto in ("col", "tw")
                else P(None, AXIS, None) if upto == "a2a"
                else P(None, None, AXIS))
    return jax.jit(jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(None, None, AXIS), P(None, None, AXIS)),
        out_specs=out_axis,
        check_vma=False,
    ))


def sharded_ntt(mesh: Mesh, x: jnp.ndarray, log1: int, log2: int,
                inverse: bool = False) -> jnp.ndarray:
    """Four-step NTT of a (nl, N1, N2) coefficient array (row-major view of
    a length N1*N2 polynomial: coeff[i1*N2 + i2] = x[:, i1, i2]), sharded
    along the N2 axis.  Returns evaluations in transposed (nl, N2, N1)
    layout, sharded along N1.
    """
    tw = jnp.asarray(_twiddle_matrix(log1, log2, inverse))
    return _jit_sharded_ntt(mesh, log1, log2, inverse)(x, tw)


def sharded_ntt_phase_times(mesh: Mesh, x: jnp.ndarray, log1: int,
                            log2: int, inverse: bool = False,
                            repeats: int = 3) -> dict:
    """Per-phase wall times of the four-step NTT via prefix programs:
    each phase cost = t(prefix through phase) - t(previous prefix).
    Phases: col (column NTTs), tw (twiddle mul), a2a (all_to_all +
    transpose), row (row NTTs)."""
    tw = jnp.asarray(_twiddle_matrix(log1, log2, inverse))
    import time as _time
    prefixes = ["col", "tw", "a2a", "full"]
    best = {}
    for upto in prefixes:
        fn = _jit_sharded_ntt(mesh, log1, log2, inverse, upto)
        jax.block_until_ready(fn(x, tw))  # compile
        t = None
        for _ in range(repeats):
            t0 = _time.time()
            jax.block_until_ready(fn(x, tw))
            dt = _time.time() - t0
            t = dt if t is None else min(t, dt)
        best[upto] = t
    return {
        "col_ntt_s": round(best["col"], 4),
        "twiddle_s": round(max(best["tw"] - best["col"], 0.0), 4),
        "all_to_all_s": round(max(best["a2a"] - best["tw"], 0.0), 4),
        "row_ntt_s": round(max(best["full"] - best["a2a"], 0.0), 4),
        "total_s": round(best["full"], 4),
    }


# ---------------------------------------------------------------------------
# Gate-sharded witness/constraint evaluation
# ---------------------------------------------------------------------------

def sharded_gate_eval(mesh: Mesh, idx: jnp.ndarray, coef: jnp.ndarray,
                      witness: jnp.ndarray) -> jnp.ndarray:
    """Per-gate affine evaluation with the gate axis sharded and the
    witness replicated: (G,K) idx, (nl,G,K) coef, (nl,V+1) witness ->
    (nl, G) evaluations sharded on G."""

    def local(idx_blk, coef_blk, w):
        from ..engine.jax_engine import _gate_eval
        return _gate_eval(idx_blk, coef_blk, w)

    return jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(AXIS, None), P(None, AXIS, None), P(None, None)),
        out_specs=P(None, AXIS),
        check_vma=False,
    )(idx, coef, witness)


# ---------------------------------------------------------------------------
# One fully-sharded prove step (dryrun / scaling target)
# ---------------------------------------------------------------------------

def sharded_intt(mesh: Mesh, x: jnp.ndarray, log1: int, log2: int) -> jnp.ndarray:
    """Distributed inverse NTT of a (nl, N) coefficient batch via the
    four-step scheme; output in natural coefficient order (the four-step
    output y[i2, i1] = X[i1 + N1*i2] flattens row-major to index order)."""
    nl, n = x.shape
    y = sharded_ntt(mesh, x.reshape(nl, 1 << log1, 1 << log2), log1, log2,
                    inverse=True)
    return y.reshape(nl, n)


def sharded_prove_step(mesh: Mesh, fc_args, witness: jnp.ndarray,
                       ti1: C.Point, logn: int, max_windows: int = None):
    """A representative sharded Groth16 prove step: gate-sharded witness
    evaluation -> four-step all_to_all iNTT -> term-sharded MSM with
    all_gather reduction.  Returns the A-side MSM point (golden G1); used
    by __graft_entry__.dryrun_multichip and scaling tests."""
    l_idx, l_coef = fc_args
    evals = sharded_gate_eval(mesh, l_idx, l_coef, witness)
    n = 1 << logn

    @jax.jit
    def pad(x):
        return jnp.pad(x, ((0, 0), (0, n - x.shape[1])))

    log2_ = max(1, logn // 2)
    log1_ = logn - log2_
    a_coeff = sharded_intt(mesh, pad(evals), log1_, log2_)

    @jax.jit
    def to_std(x):
        return F.from_mont(x, F.FR)[: params.FR_LIMBS]

    a_std = to_std(a_coeff)
    return sharded_msm_g1(mesh, ti1, a_std, c=4, max_windows=max_windows)


# ---------------------------------------------------------------------------
# Fully sharded witness reduction (prove-side QAP algebra on the mesh)
# ---------------------------------------------------------------------------

def _split_logs(logn: int, n_dev: int) -> Tuple[int, int]:
    """N = N1*N2 split for the four-step NTT with both factors divisible
    by the mesh size."""
    log_d = max(1, (n_dev - 1).bit_length())
    log2_ = max(log_d, logn // 2)
    log1_ = logn - log2_
    assert log1_ >= log_d, (
        f"domain 2^{logn} too small for a {n_dev}-device four-step NTT")
    return log1_, log2_


@functools.lru_cache(maxsize=32)
def _jit_pointwise_h(logn: int):
    """Coset pointwise stage: p = a*b - c, h = p * Zinv (constant on the
    coset).  Runs as a plain jitted program over the (sharded) global
    arrays; XLA/GSPMD keeps it elementwise-local."""
    zinv = ntt_mod.zh_on_coset_inv(logn)
    n = 1 << logn

    def run(a_cos, b_cos, c_cos):
        p = F.sub(F.mont_mul(a_cos, b_cos, F.FR), c_cos, F.FR)
        return F.mont_mul(p, F.const_mont(zinv, n, F.FR), F.FR)

    return jax.jit(run)


@functools.lru_cache(maxsize=32)
def _jit_coset_scale(logn: int, inverse: bool):
    def run(x):
        g = jnp.asarray(ntt_mod._coset_powers_host(logn, inverse))
        return F.mont_mul(x, g, F.FR)
    return jax.jit(run)


def sharded_witness_reduction(mesh: Mesh, fc, witness_mont: jnp.ndarray):
    """engine.jax_engine.witness_reduction_fn distributed over the mesh:
    gate-sharded affine evaluation, four-step all_to_all iNTTs, pointwise
    coset quotient, inverse coset NTT.  Returns (a, b, h) Montgomery
    coefficient arrays in natural order (flattened four-step layout IS
    natural order: out[k2, k1] holds X[N1*k2 + k1])."""
    n = fc.domain_size
    logn = fc.logn
    nl = params.FR_LIMBS
    log1_, log2_ = _split_logs(logn, mesh.devices.size)

    @jax.jit
    def pad(x):
        return jnp.pad(x, ((0, 0), (0, n - x.shape[1])))

    def reshape12(x):
        return x.reshape(nl, 1 << log1_, 1 << log2_)

    sides = []
    for side in (fc.l, fc.r, fc.lhs):
        ev = sharded_gate_eval(mesh, jnp.asarray(side.idx),
                               jnp.asarray(side.coef), witness_mont)
        coeff = sharded_ntt(mesh, reshape12(pad(ev)), log1_, log2_,
                            inverse=True).reshape(nl, n)
        sides.append(coeff)
    a, b, cc = sides

    def coset_fwd(x):
        scaled = _jit_coset_scale(logn, False)(x)
        return sharded_ntt(mesh, reshape12(scaled), log1_, log2_,
                           inverse=False).reshape(nl, n)

    a_cos = coset_fwd(a)
    b_cos = coset_fwd(b)
    c_cos = coset_fwd(cc)
    h_cos = _jit_pointwise_h(logn)(a_cos, b_cos, c_cos)
    h = _jit_coset_scale(logn, True)(
        sharded_ntt(mesh, reshape12(h_cos), log1_, log2_,
                    inverse=True).reshape(nl, n))
    return a, b, h


# ---------------------------------------------------------------------------
# Fully sharded Groth16 / Pinocchio proves
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=4)
def _jit_to_std():
    return jax.jit(lambda x: F.from_mont(x, F.FR)[: params.FR_LIMBS])


def _fit(points, scalars_mont: jnp.ndarray, npad: int, group: str):
    """Truncate/pad a (table, scalar) pair to a common power-of-two width
    and convert scalars to standard form (mirrors groth16_device fit_*)."""
    from ..protocols.groth16_device import _pad_points, _pad_scalars
    P_ = (tuple(x[..., :npad] for x in points)
          if points[0].shape[-1] > npad else _pad_points(points, npad, group))
    S = _jit_to_std()(_pad_scalars(scalars_mont, npad))
    return P_, S


def sharded_groth16_prove(mesh: Mesh, crs, fc, witness_mont: jnp.ndarray,
                          rng, c: int = 4):
    """Full Groth16 prove on the mesh (groth16.ml:123-161 semantics):
    gate-sharded witness reduction, then ALL five G1 MSMs + the G2 MSM
    term-sharded with all_gather reduction.  Byte-identical to
    protocols.groth16_device.prove_device under the same injected rng
    (same scalar draw order r, s; groth16.ml:124-125)."""
    from ..protocols.groth16 import Proof
    from ..protocols.groth16_device import _np2

    r_sc = rng.fr()
    s_sc = rng.fr()

    a_comb, b_comb, h = sharded_witness_reduction(mesh, fc, witness_mont)

    n = crs.n
    npad = _np2(n)
    ti1, a_std = _fit(crs.ti1, a_comb, npad, "g1")
    _, b_std = _fit(crs.ti1, b_comb, npad, "g1")
    tiztd, h_std = _fit(crs.tiztd, h[:, : max(1, n - 1)], npad, "g1")
    ltd_mid, mid_std = _fit(crs.ltd_mid, witness_mont[:, crs.mids_idx],
                            npad, "g1")
    ti2, _ = _fit(crs.ti2, b_comb, npad, "g2")

    A_sum = sharded_msm(mesh, ti1, a_std, "g1", c=c)
    B1_sum = sharded_msm(mesh, ti1, b_std, "g1", c=c)
    H_sum = sharded_msm(mesh, tiztd, h_std, "g1", c=c)
    Cmid = sharded_msm(mesh, ltd_mid, mid_std, "g1", c=c)
    B_sum = sharded_msm(mesh, ti2, b_std, "g2", c=c)

    a = crs.alpha_g1 + A_sum + crs.delta_g1 * r_sc
    b = crs.beta_g2 + B_sum + crs.delta_g2 * s_sc
    b1 = crs.beta_g1 + B1_sum + crs.delta_g1 * s_sc
    cpt = (Cmid + H_sum + a * s_sc + b1 * r_sc
           - crs.delta_g1 * (r_sc * s_sc))
    return Proof(a=a, b=b, c=cpt)


def sharded_pinocchio_prove(mesh: Mesh, pkey, fc, witness_mont: jnp.ndarray,
                            rng, zk: bool = True, c: int = 4):
    """Full Pinocchio prove on the mesh (pinocchio.ml:193-250 NonZK,
    :423-515 ZK): 8 term-sharded MSMs (6 G1 + 2 G2) + the h apply_powers,
    ZK adds the 2 all-variable G1 MSMs.  Byte-identical to
    protocols.pinocchio_device.prove_device under the same injected rng."""
    from ..golden.curve import G1
    from ..protocols.pinocchio import Proof
    from ..protocols.groth16_device import _np2

    _a, _b, h = sharded_witness_reduction(mesh, fc, witness_mont)

    n = pkey.n
    c_mid = witness_mont[:, pkey.mids_idx]
    V = len(fc.vars_sorted)
    npad = _np2(max(pkey.si[0].shape[-1],
                    pkey.v_all[0].shape[-1] if zk else 1,
                    c_mid.shape[-1]))
    n_main = min(V, npad)
    c_all = witness_mont[:, :n_main]

    vv_t, mid_std = _fit(pkey.vv, c_mid, npad, "g1")
    yy_t, _ = _fit(pkey.yy, c_mid, npad, "g1")
    si_t, h_std = _fit(pkey.si, h[:, : max(1, n - 1)], npad, "g1")
    vav_t, _ = _fit(pkey.vav, c_mid, npad, "g1")
    yay_t, _ = _fit(pkey.yay, c_mid, npad, "g1")
    bvwy_t, _ = _fit(pkey.bvwy, c_mid, npad, "g1")
    ww_t, _ = _fit(pkey.ww, c_mid, npad, "g2")
    waw_t, _ = _fit(pkey.waw, c_mid, npad, "g2")

    vv = sharded_msm(mesh, vv_t, mid_std, "g1", c=c)
    yy = sharded_msm(mesh, yy_t, mid_std, "g1", c=c)
    h_pt = sharded_msm(mesh, si_t, h_std, "g1", c=c)
    vavv = sharded_msm(mesh, vav_t, mid_std, "g1", c=c)
    yayy = sharded_msm(mesh, yay_t, mid_std, "g1", c=c)
    bvwy = sharded_msm(mesh, bvwy_t, mid_std, "g1", c=c)
    ww = sharded_msm(mesh, ww_t, mid_std, "g2", c=c)
    waww = sharded_msm(mesh, waw_t, mid_std, "g2", c=c)

    if not zk:
        return Proof(vv=vv, ww=ww, yy=yy, h=h_pt,
                     vavv=vavv, waww=waww, yayy=yayy, bvwy=bvwy)

    dv = rng.fr()
    dw = rng.fr()
    dy = rng.fr()
    va_t, all_std = _fit(pkey.v_all, c_all, npad, "g1")
    wa_t, _ = _fit(pkey.w_all, c_all, npad, "g1")
    v_all = sharded_msm(mesh, va_t, all_std, "g1", c=c)
    w_all = sharded_msm(mesh, wa_t, all_std, "g1", c=c)
    if pkey.v_all_tail:
        from ..golden.field import Fr as _Fr
        from ..ops import field_jax as _F
        tail_sc = [_Fr(x) for x in
                   _F.unpack_mont(witness_mont[:, n_main:V], _F.FR)]
        v_all = v_all + G1.dot(pkey.v_all_tail, tail_sc)
        w_all = w_all + G1.dot(pkey.w_all_tail, tail_sc)

    t_g1 = pkey.t1   # g^{t(s)}, precomputed at keygen

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
