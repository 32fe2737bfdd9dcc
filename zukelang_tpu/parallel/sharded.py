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
# Data-parallel MSM
# ---------------------------------------------------------------------------

def _fold_gathered(points: C.Point, ops: C.FieldOps) -> C.Point:
    """Fold a small batch (n_devices) of points into one with the group
    law — log-depth halving."""
    return msm_mod._hs_total(points, ops)


@functools.lru_cache(maxsize=16)
def _jit_sharded_window(mesh: Mesh, c: int, ndim: int):
    """One Pippenger window with terms sharded across the mesh: each chip
    buckets+reduces its shard, partials are all_gather'ed and folded.
    Cached per (mesh, window size) so repeat calls reuse the executable."""

    def local(pts, dig):
        partial = msm_mod._weighted_bucket_reduce(
            msm_mod._bucket_sums(pts, dig, 1 << c, C.FQ_OPS, C.infinity_g1),
            C.FQ_OPS, C.infinity_g1)
        gathered = tuple(
            jax.lax.all_gather(x, AXIS, axis=x.ndim - 1, tiled=True)
            for x in partial)
        return _fold_gathered(gathered, C.FQ_OPS)

    shard = P(*([None] * (ndim - 1) + [AXIS]))
    return jax.jit(jax.shard_map(
        local, mesh=mesh,
        in_specs=((shard,) * 3, P(AXIS)),
        out_specs=(P(*([None] * ndim)),) * 3,
        check_vma=False,
    ))


def sharded_msm_window(mesh: Mesh, points: C.Point, digits: jnp.ndarray,
                       c: int = 8) -> C.Point:
    return _jit_sharded_window(mesh, c, points[0].ndim)(points, digits)


def sharded_msm_g1(mesh: Mesh, points: C.Point, scalars_std: jnp.ndarray,
                   c: int = 8, max_windows: int = None):
    """Full MSM with terms sharded across the mesh.  Host-staged over
    windows (like ops.msm.msm_staged): one compiled sharded window program
    dispatched asynchronously per window, device-side combine, one fetch.
    Returns a golden G1.

    `max_windows` truncates to the low windows — only for dryruns/smoke
    tests on hosts too slow for the full ladder (result is then the MSM of
    the scalars' low c*max_windows bits)."""
    digits = msm_mod._jit_windows_extract(c)(scalars_std)
    n_windows = digits.shape[0]
    if max_windows is not None:
        n_windows = min(n_windows, max_windows)
    dev_results = [sharded_msm_window(mesh, points, digits[w], c=c)
                   for w in range(n_windows)]
    stacked = tuple(
        jnp.concatenate([r[i] for r in dev_results], axis=-1)
        for i in range(3))
    final = msm_mod._jit_window_combine("g1", c, n_windows)(stacked)
    return C.unpack_g1(final)[0]


# ---------------------------------------------------------------------------
# Four-step distributed NTT
# ---------------------------------------------------------------------------

def _twiddle_matrix(log1: int, log2: int, inverse: bool) -> np.ndarray:
    """(nl, N1, N2) Montgomery twiddles w_N^(i*j)."""
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


def sharded_ntt(mesh: Mesh, x: jnp.ndarray, log1: int, log2: int,
                inverse: bool = False) -> jnp.ndarray:
    """Four-step NTT of a (nl, N1, N2) coefficient array (row-major view of
    a length N1*N2 polynomial: coeff[i1*N2 + i2] = x[:, i1, i2]), sharded
    along the N2 axis.  Returns evaluations in transposed (nl, N2, N1)
    layout, sharded along N1.
    """
    n_dev = mesh.devices.size
    tw = jnp.asarray(_twiddle_matrix(log1, log2, inverse))

    def local(blk, twblk):
        # blk: (nl, N1, N2/D) — column NTTs over axis 1 (local)
        y = ntt_mod.ntt(blk, inverse=inverse)
        # twiddle scaling w^(i1*i2)
        y = ntt_mod._mm(y, twblk)
        # all_to_all: reshard from N2-split to N1-split
        # (nl, N1, N2/D) -> (nl, N1/D, N2)
        y = jax.lax.all_to_all(y, AXIS, split_axis=1, concat_axis=2,
                               tiled=True)
        # row NTTs over axis 2 -> transform along N2: transpose axes
        y = jnp.transpose(y, (0, 2, 1))      # (nl, N2, N1/D)
        y = ntt_mod.ntt(y, inverse=inverse)  # transform along N2 axis
        return y                              # (nl, N2, N1/D)

    out = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(None, None, AXIS), P(None, None, AXIS)),
        out_specs=P(None, None, AXIS),
        check_vma=False,
    )(x, tw)
    return out


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
