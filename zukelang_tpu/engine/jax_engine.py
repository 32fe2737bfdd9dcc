"""TPU engine: NTT-domain QAP algebra + Pippenger MSM + fixed-base batches.

Implements the Engine interface with jitted JAX pipelines:

  * witness reduction (prove side): per-gate affine evaluation (dense padded
    matvec) -> iNTT -> coset pointwise ops -> h coefficients.  Replaces the
    O(n^2) paths at QAP.ml:120-135 with O(n log n).
  * evaluation at tau (keygen side): Lagrange-basis values L_g(tau) over
    the radix-2 domain, then a var-sorted transpose matvec via a segmented
    Hillis-Steele scan.  Replaces per-variable Poly.apply
    (pinocchio.ml:104-109, groth16.ml:59-68).
  * dot/powers/of_fr batches -> ops.msm kernels.

Shapes are padded to powers of two and jitted callables cached per shape;
enable the persistent compilation cache (zukelang_tpu.jax_setup) to pay
each compile once per machine.
"""

from __future__ import annotations

import functools
from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import params
from ..core import flat as flat_mod
from ..core import poly as poly_mod
from ..core.qap import QAP
from ..core.var import Var
from ..golden.curve import G1, G2
from ..golden.field import Fr
from ..ops import curve_jax as C
from ..ops import field_jax as F
from ..ops import msm as msm_mod
from ..ops import ntt as ntt_mod
from .base import Engine, GoldenEngine


def _next_pow2(n: int, floor: int = 16) -> int:
    n = max(n, floor)
    return 1 << (n - 1).bit_length()


@functools.lru_cache(maxsize=8)
def _jit_fixed_base(group: str):
    return jax.jit(functools.partial(msm_mod.fixed_base_mul, group=group))


class JaxEngine(Engine):
    name = "jax"

    def __init__(self, msm_window: int = None):
        from .. import jax_setup  # enables persistent cache
        self.msm_window = msm_window
        self._flat_cache: Dict[int, flat_mod.FlatCircuit] = {}

    # -- MSM ---------------------------------------------------------------
    def _dot(self, group, points, scalars):
        n = len(points)
        if n == 0:
            return G1.zero() if group == "g1" else G2.zero()
        npad = _next_pow2(n)
        zero_cls = G1 if group == "g1" else G2
        pts = list(points) + [zero_cls.zero()] * (npad - n)
        scs = [s.n for s in scalars] + [0] * (npad - n)
        P = C.pack_g1(pts) if group == "g1" else C.pack_g2(pts)
        S = F.pack(scs, F.FR)
        return msm_mod.msm_staged(P, S, group=group, c=self.msm_window)

    def g1_dot(self, points, scalars):
        return self._dot("g1", points, scalars)

    def g2_dot(self, points, scalars):
        return self._dot("g2", points, scalars)

    # -- fixed base --------------------------------------------------------
    def _of_fr_batch(self, group, scalars):
        n = len(scalars)
        if n == 0:
            return []
        npad = _next_pow2(n)
        scs = [s.n for s in scalars] + [0] * (npad - n)
        S = F.pack(scs, F.FR)
        res = _jit_fixed_base(group)(S)
        out = C.unpack_g1(res) if group == "g1" else C.unpack_g2(res)
        return out[:n]

    def g1_of_fr_batch(self, scalars):
        return self._of_fr_batch("g1", scalars)

    def g2_of_fr_batch(self, scalars):
        return self._of_fr_batch("g2", scalars)

    def g1_powers(self, d, s):
        pts = msm_mod.g_powers(s.n, d, "g1")
        return C.unpack_g1(pts)

    def g2_powers(self, d, s):
        pts = msm_mod.g_powers(s.n, d, "g2")
        return C.unpack_g2(pts)

    def g1_apply_powers(self, coeffs, xis):
        return self._dot("g1", list(xis[: len(coeffs)]), list(coeffs))

    def g2_apply_powers(self, coeffs, xis):
        return self._dot("g2", list(xis[: len(coeffs)]), list(coeffs))

    # -- QAP algebra -------------------------------------------------------
    def _flat(self, qap: QAP) -> flat_mod.FlatCircuit:
        key = id(qap)
        if key not in self._flat_cache:
            self._flat_cache[key] = flat_mod.flatten(qap.gates)
        return self._flat_cache[key]

    def qap_witness_reduction(self, qap: QAP, sol: Dict[Var, Fr]):
        """-> (A_coeffs, B_coeffs, h_coeffs) as Fr lists.

        NTT domain only; for domain="reference" fall back to golden."""
        if qap.domain != "ntt":
            return GoldenEngine().qap_witness_reduction(qap, sol)
        fc = self._flat(qap)
        w = jnp.asarray(fc.pack_witness(sol))
        a, b, h = run_witness_reduction(fc, w)
        return (_unpack_fr(a), _unpack_fr(b), _unpack_fr(h))

    def qap_eval_at(self, qap: QAP, x: Fr):
        """Evaluate every variable's v/w/y polynomial at x.

        -> three dicts Var -> Fr.  NTT domain: via Lagrange values at x and
        a transpose matvec on device."""
        if qap.domain != "ntt":
            return GoldenEngine().qap_eval_at(qap, x)
        fc = self._flat(qap)
        lag = _lagrange_at(fc.logn, x.n)     # (nl, N) Montgomery L_g(x)
        out = {}
        for name, side in (("v", fc.l), ("w", fc.r), ("y", fc.lhs)):
            res = _transpose_matvec(side, lag, len(fc.vars_sorted))
            out[name] = {v: res[i] for i, v in enumerate(fc.vars_sorted)}
        return out["v"], out["w"], out["y"]

    def qap_eval(self, qap, sol):
        # Engine-interface compatibility: p is not materialized on the fast
        # path; callers needing it should use qap_witness_reduction.
        a, b, h = self.qap_witness_reduction(qap, sol)
        return None, h


# ---------------------------------------------------------------------------
# Device pipelines
# ---------------------------------------------------------------------------

def _unpack_fr(arr) -> List[Fr]:
    return [Fr(v) for v in F.unpack_mont(arr, F.FR)]


def _flat_device_args(fc: flat_mod.FlatCircuit):
    return (
        jnp.asarray(fc.l.idx), jnp.asarray(fc.l.coef),
        jnp.asarray(fc.r.idx), jnp.asarray(fc.r.coef),
        jnp.asarray(fc.lhs.idx), jnp.asarray(fc.lhs.coef),
    )


def _gate_eval(idx, coef, w):
    """Dense padded matvec: (G, K) idx + (nl, G, K) coef + (nl, V+1) witness
    -> (nl, G) evaluations."""
    nl, G, K = coef.shape
    vals = w[:, idx.reshape(-1)]                       # (nl, G*K)
    prod = F.mont_mul(vals, coef.reshape(nl, G * K), F.FR)
    prod = prod.reshape(nl, G, K)
    acc = prod[:, :, 0]
    for k in range(1, K):
        acc = F.add(acc, prod[:, :, k], F.FR)
    return acc


def witness_reduction_fn(logn: int):
    """Builds the (un-jitted) witness-reduction pipeline for one domain
    size: gate evaluation -> iNTT -> coset quotient -> h coefficients."""
    n = 1 << logn
    zinv = ntt_mod.zh_on_coset_inv(logn)

    def run(l_idx, l_coef, r_idx, r_coef, o_idx, o_coef, w):
        va = _gate_eval(l_idx, l_coef, w)
        vb = _gate_eval(r_idx, r_coef, w)
        vc = _gate_eval(o_idx, o_coef, w)

        def pad(x):
            return jnp.pad(x, ((0, 0), (0, n - x.shape[1])))

        a = ntt_mod.intt(pad(va))
        b = ntt_mod.intt(pad(vb))
        c = ntt_mod.intt(pad(vc))
        a_cos = ntt_mod.coset_ntt(a)
        b_cos = ntt_mod.coset_ntt(b)
        c_cos = ntt_mod.coset_ntt(c)
        p_cos = F.sub(F.mont_mul(a_cos, b_cos, F.FR), c_cos, F.FR)
        h_cos = F.mont_mul(p_cos, F.const_mont(zinv, n, F.FR), F.FR)
        h = ntt_mod.coset_intt(h_cos)
        return a, b, h

    return run


@functools.lru_cache(maxsize=32)
def _jit_witness_reduction(logn: int, kl: int, kr: int, ko: int, n_gates: int):
    return jax.jit(witness_reduction_fn(logn))


def run_witness_reduction(fc, witness_mont):
    """Witness reduction through the AOT export cache (zukelang_tpu.aot):
    device provers call this instead of _jit_witness_reduction directly
    so a fresh process skips the re-trace when ZUKELANG_AOT=1."""
    from .. import aot
    args = _flat_device_args(fc)
    kl, kr, ko = (fc.l.idx.shape[1], fc.r.idx.shape[1],
                  fc.lhs.idx.shape[1])
    return aot.maybe_call(
        f"witred-{fc.logn}-{kl}-{kr}-{ko}-{fc.n_gates}",
        _jit_witness_reduction(fc.logn, kl, kr, ko, fc.n_gates),
        *args, witness_mont)


@functools.lru_cache(maxsize=32)
def _lagrange_at_jit(logn: int):
    n = 1 << logn

    def run(x_mont, omegas, z_at_x_over_n):
        # L_g(x) = (Z(x)/N) * omega^g / (x - omega^g)
        diff = F.sub(jnp.broadcast_to(x_mont, omegas.shape), omegas, F.FR)
        dinv = F.inv(diff, F.FR)
        num = F.mont_mul(omegas, dinv, F.FR)
        return F.mont_mul(num, jnp.broadcast_to(z_at_x_over_n, num.shape), F.FR)

    return jax.jit(run)


def _lagrange_at(logn: int, x: int) -> jnp.ndarray:
    """(nl, N) Montgomery Lagrange values L_g(x) over the 2^logn domain."""
    n = 1 << logn
    r = params.R
    w = ntt_mod.root_for(logn)
    omegas = []
    acc = 1
    for _ in range(n):
        omegas.append(acc)
        acc = acc * w % r
    z_at_x = (pow(x, n, r) - 1) % r
    zn = z_at_x * pow(n, -1, r) % r
    return _lagrange_at_jit(logn)(
        F.pack_mont([x] * n, F.FR),
        F.pack_mont(omegas, F.FR),
        F.pack_mont([zn] * n, F.FR),
    )


def _segment_field_sum(values: jnp.ndarray, seg: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Segmented sum of Fr values along the batch axis (seg sorted).
    Returns (scanned values, tail mask is handled by caller)."""
    n = seg.shape[-1]
    logn = max(1, (n - 1).bit_length())
    idx = jnp.arange(n)

    def body(d, x):
        sh = jnp.int32(1) << d
        prev = jnp.roll(x, sh, axis=-1)
        valid = (idx >= sh) & (seg == jnp.roll(seg, sh))
        return jnp.where(valid[None, :], F.add(x, prev, F.FR), x)

    return jax.lax.fori_loop(0, logn, body, values)


@functools.lru_cache(maxsize=64)
def _jit_transpose_matvec(n_vars_pad: int):
    def run(t_var, t_gate, t_coef, weights):
        # weights: (nl, N) per-gate values; gather per nnz, multiply by
        # coefficient, segmented-sum by variable, scatter tails.
        vals = weights[:, t_gate]
        prod = F.mont_mul(vals, t_coef, F.FR)
        scanned = _segment_field_sum(prod, t_var)
        m = t_var.shape[0]
        is_tail = jnp.concatenate([t_var[:-1] != t_var[1:], jnp.array([True])])
        tgt = jnp.where(is_tail, t_var, n_vars_pad)
        out = jnp.zeros((params.FR_LIMBS, n_vars_pad + 1), jnp.uint32)
        out = out.at[:, tgt].set(scanned)
        return out[:, :n_vars_pad]

    return jax.jit(run)


def _transpose_matvec(side: flat_mod.FlatSide, weights: jnp.ndarray,
                      n_vars: int) -> List[Fr]:
    res = _jit_transpose_matvec(n_vars)(
        jnp.asarray(side.t_var), jnp.asarray(side.t_gate),
        jnp.asarray(side.t_coef), weights)
    return _unpack_fr(res)
