#!/usr/bin/env python
"""Prototype: Fq Montgomery multiply with the REDUCTION half on the MXU.

The production multiplier (ops/field_jax.py CIOS variants, embedded in the
Pallas point kernels) runs entirely on the VPU: n^2 16x16->32 product muls
plus n^2 reduction muls per modular multiply.  The Montgomery reduction
operands, however, are CONSTANTS (N' = -p^-1 mod R and p itself), so both
reduction products are [batch x digits] @ [digits x digits] matmuls with
constant right-hand sides — int8 MXU work (docs/PERFORMANCE.md "known
inefficiencies").  This prototype implements the separated-operand-scan
(SOS) variant in plain jnp (XLA lowers the int8 dots to the MXU):

  1. t = a*b            VPU: 24x24 16-bit limb products, two-stream
                        (lo/hi) accumulation — n^2 muls, same as CIOS.
  2. m = t_lo * N' mod R   MXU: 4-bit digits (values 0..15 fit int8
                        exactly), conv matrix of N' truncated at R —
                        dropped columns are multiples of R, so the value
                        is exact mod R; digit-normalize (VPU shifts) and
                        truncate the carry-out: m exact in [0, R).
  3. t + m*p            MXU: m digits @ conv matrix of p; low 384 bits
                        cancel by construction.
  4. >>384, final conditional subtract   VPU.

Outputs one JSON line: correctness vs Python ints + measured rates of
this path, the production mont_mul, and the raw int8 matmul ceiling.

Run (TPU):  python scripts/proto_mxu_mul.py [log2_batch]
"""

import json
import sys
import time

sys.path.insert(0, ".")

from zukelang_tpu import jax_setup  # noqa: F401
from zukelang_tpu import params

import jax
import jax.numpy as jnp
import numpy as np

from zukelang_tpu.ops import field_jax as F

P = params.P
NL = params.FQ_LIMBS          # 24 x 16-bit limbs
D4 = NL * 4                   # 96 x 4-bit digits per operand
R_BITS = NL * params.LIMB_BITS


def _digits4_of_int(x: int, n: int) -> list:
    return [(x >> (4 * i)) & 0xF for i in range(n)]


def _conv_matrix(const: int, rows: int, cols: int) -> np.ndarray:
    """M[i, k] = digit_{k-i}(const): (x_digits @ M)[k] = digit-conv value,
    truncated at `cols` (each dropped column is a multiple of 16^cols)."""
    d = _digits4_of_int(const, cols)
    M = np.zeros((rows, cols), dtype=np.int8)
    for i in range(rows):
        for k in range(i, cols):
            M[i, k] = d[k - i]
    return M


NPRIME_R = (-pow(P, -1, 1 << R_BITS)) % (1 << R_BITS)   # -p^-1 mod 2^384
M_NP = _conv_matrix(NPRIME_R, D4, D4)                   # m = t_lo * N' mod R
M_P = _conv_matrix(P, D4, 2 * D4)                       # m * p (768-bit)


def _normalize4(x, out_digits):
    """Redundant int32 digit rows (N, K) -> exact 4-bit digits (N,
    out_digits); carries beyond out_digits are dropped (callers arrange
    for them to be multiples of the relevant modulus).

    Fold passes shrink digits to [0, 16]; a fold moves a long 0xF carry
    chain only ONE position per pass, so the tail is a Kogge-Stone
    carry-lookahead (log2 K boolean rounds), not more folds."""
    K = x.shape[1]
    pad = out_digits + 8 - K
    if pad > 0:
        x = jnp.pad(x, ((0, 0), (0, pad)))
    elif pad < 0:
        x = x[:, :out_digits + 8]

    def step(_, v):
        lo = v & 0xF
        return lo + jnp.pad((v >> 4)[:, :-1], ((0, 0), (1, 0)))

    # values <= ~2^22 shrink 4 bits per pass -> digits in [0, 16]
    x = jax.lax.fori_loop(0, 5, step, x)

    base = x & 0xF
    g = (x >> 4).astype(jnp.bool_)      # carry generated out of k
    p = base == 15                      # carry propagates through k
    Kp = x.shape[1]
    sh = 1
    while sh < Kp:
        gs = jnp.pad(g[:, :-sh], ((0, 0), (sh, 0)))
        ps = jnp.pad(p[:, :-sh], ((0, 0), (sh, 0)), constant_values=False)
        g = g | (p & gs)
        p = p & ps
        sh *= 2
    cin = jnp.pad(g[:, :-1], ((0, 0), (1, 0)))  # carry into position k
    x = (base + cin.astype(jnp.int32)) & 0xF
    return x[:, :out_digits]


def mont_mul_mxu(a, b):
    """Montgomery product (a*b*R^-1 mod p) of (NL, N) uint32 16-bit-limb
    batches; returns (NL, N) uint32 limbs (< 2p, caller-style redundancy
    resolved by a final conditional subtract)."""
    N = a.shape[1]
    # -- step 1: t = a*b on the VPU, schoolbook with two-stream accumulate
    lo_acc = jnp.zeros((2 * NL, N), jnp.uint32)
    hi_acc = jnp.zeros((2 * NL, N), jnp.uint32)
    for i in range(NL):
        prod = a[i][None, :] * b          # (NL, N) full 32-bit products
        lo = prod & 0xFFFF
        hi = prod >> 16
        lo_acc = lo_acc.at[i:i + NL].add(lo)
        hi_acc = hi_acc.at[i + 1:i + NL + 1].add(hi)
    # redundant 16-bit positions, values <= 24 * 2^16 ~ 2^20.6 (lo and hi
    # streams were accumulated at already-shifted positions above)
    t16 = lo_acc + hi_acc
    # -- split to 4-bit digit rows (N, 192) for the MXU steps
    tT = t16.T.astype(jnp.int32)                       # (N, 48) 16-bit pos
    d0 = tT & 0xF
    d1 = (tT >> 4) & 0xF
    d2 = (tT >> 8) & 0xF
    d3 = tT >> 12                                      # keeps the carry bits
    t4 = jnp.zeros((N, 4 * 2 * NL + 8), jnp.int32)
    t4 = t4.at[:, 0:4 * 2 * NL:4].add(d0)
    t4 = t4.at[:, 1:4 * 2 * NL:4].add(d1)
    t4 = t4.at[:, 2:4 * 2 * NL:4].add(d2)
    t4 = t4.at[:, 3:4 * 2 * NL + 1:4].add(d3)
    t4n = _normalize4(t4, 2 * D4)                      # exact 768-bit digits
    # -- step 2: m = t_lo * N' mod R (MXU)
    t_lo = t4n[:, :D4].astype(jnp.int8)
    m_red = jax.lax.dot_general(
        t_lo, jnp.asarray(M_NP),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    m4 = _normalize4(m_red, D4).astype(jnp.int8)       # m exact in [0, R)
    # -- step 3: t + m*p (MXU), value divisible by R
    mp_red = jax.lax.dot_general(
        m4, jnp.asarray(M_P),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    s_red = mp_red + t4n
    s4 = _normalize4(s_red, 2 * D4)
    hi = s4[:, D4:2 * D4]                              # >> 384 (fits 96 digits)
    # -- pack 4-bit digits back to 16-bit limbs (NL, N)
    c = (hi[:, 0::4] + (hi[:, 1::4] << 4) + (hi[:, 2::4] << 8)
         + (hi[:, 3::4] << 12))[:, :NL]
    c = c.T.astype(jnp.uint32)
    # result < 2p; normalize with one conditional subtract
    return F.cond_sub_p(c, F.FQ) if hasattr(F, "cond_sub_p") else c


def main():
    logn = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    N = 1 << logn
    rng = np.random.RandomState(7)
    xs = [int.from_bytes(rng.bytes(48), "little") % P for _ in range(N)]
    ys = [int.from_bytes(rng.bytes(48), "little") % P for _ in range(N)]
    A = jnp.asarray(F.pack_mont(xs, F.FQ))
    B = jnp.asarray(F.pack_mont(ys, F.FQ))

    f = jax.jit(mont_mul_mxu)
    out = np.asarray(jax.device_get(f(A, B)))
    # correctness vs Python ints (Montgomery form in = Montgomery out)
    got = [sum(int(out[i, j]) << (16 * i) for i in range(NL)) % P
           for j in range(min(N, 64))]
    # mont(x*R, y*R) = x*y*R mod p
    r_mod = (1 << R_BITS) % P
    want = [x * y % P * r_mod % P for x, y in zip(xs[:64], ys[:64])]
    ok = all((g - w) % P == 0 for g, w in zip(got, want))

    def rate(fn, *args):
        fn(*args)
        jax.device_get(fn(*args)[0][..., :1])
        t0 = time.time()
        reps = 5
        for _ in range(reps):
            r = fn(*args)
        jax.device_get(r[0][..., :1])
        return reps * N / (time.time() - t0)

    r_mxu = rate(lambda a, b: (f(a, b),), A, B)
    g = jax.jit(lambda a, b: F.mont_mul(a, b, F.FQ))
    r_prod = rate(lambda a, b: (g(a, b),), A, B)

    # raw int8 matmul ceiling for the two reduction dots
    X8 = jnp.asarray(rng.randint(0, 16, size=(N, D4), dtype=np.int8))
    mm = jax.jit(lambda x: jax.lax.dot_general(
        jax.lax.dot_general(x, jnp.asarray(M_NP),
                            dimension_numbers=(((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32
                            ).astype(jnp.int8),
        jnp.asarray(M_P), dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32))
    r_dots = rate(lambda x: (mm(x),), X8)

    print(json.dumps({
        "metric": "mxu_mont_mul_prototype",
        "correct_first64": bool(ok),
        "batch": N,
        "mxu_path_mul_per_s": round(r_mxu),
        "production_mont_mul_per_s": round(r_prod),
        "raw_reduction_dots_per_s": round(r_dots),
    }), flush=True)


if __name__ == "__main__":
    main()
