"""Differential tests of the JAX/TPU ops layer against the golden backend.

Runs on the host CPU backend (conftest forces it); batch sizes stay small
because XLA:CPU both compiles and executes the grouped-conv limb kernels
far slower than TPU does — these tests check *correctness*; performance is
bench.py's job on the real chip.
"""

import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from zukelang_tpu import params
from zukelang_tpu.golden.curve import G1, G2
from zukelang_tpu.golden.field import Fr
from zukelang_tpu.ops import curve_jax as C
from zukelang_tpu.ops import field_jax as F
from zukelang_tpu.ops import msm
from zukelang_tpu.ops import ntt

random.seed(42)


@pytest.mark.parametrize("spec", [F.FR, F.FQ], ids=["fr", "fq"])
def test_mont_mul_matches_python(spec):
    N = 64
    xs = [random.randrange(spec.p) for _ in range(N)]
    ys = [random.randrange(spec.p) for _ in range(N)]
    a, b = F.pack_mont(xs, spec), F.pack_mont(ys, spec)
    c = jax.jit(lambda a, b: F.mont_mul(a, b, spec))(a, b)
    assert F.unpack_mont(c, spec) == [(x * y) % spec.p for x, y in zip(xs, ys)]


@pytest.mark.parametrize("spec", [F.FR, F.FQ], ids=["fr", "fq"])
def test_field_edge_cases(spec):
    ws = ([0, 1, spec.p - 1, spec.p - 2]
          + [(1 << (16 * k)) % spec.p for k in range(spec.nl)])
    wa = F.pack_mont(ws, spec)
    got = F.unpack_mont(jax.jit(lambda x: F.mont_mul(x, x, spec))(wa), spec)
    assert got == [(x * x) % spec.p for x in ws]
    assert F.unpack_mont(F.add(wa, wa, spec), spec) == [2 * x % spec.p for x in ws]
    assert F.unpack_mont(F.sub(F.neg(wa, spec), wa, spec), spec) == [
        (-2 * x) % spec.p for x in ws]


def test_inv_fermat():
    spec = F.FR
    xs = [0, 1, 5, spec.p - 1] + [random.randrange(spec.p) for _ in range(12)]
    a = F.pack_mont(xs, spec)
    got = F.unpack_mont(jax.jit(lambda a: F.inv(a, spec))(a), spec)
    assert got == [pow(x, -1, spec.p) if x else 0 for x in xs]


def test_ntt_roundtrip_and_values():
    logn = 4
    n = 1 << logn
    coeffs = [random.randrange(params.R) for _ in range(n)]
    x = F.pack_mont(coeffs, F.FR)
    evals = jax.jit(ntt.ntt)(x)
    w = ntt.root_for(logn)
    exp = [sum(c * pow(w, (i * k) % n, params.R) for k, c in enumerate(coeffs))
           % params.R for i in range(n)]
    assert F.unpack_mont(evals, F.FR) == exp
    back = F.unpack_mont(jax.jit(ntt.intt)(evals), F.FR)
    assert back == coeffs


def test_ntt_coset_division():
    # h = p / Z recovered exactly on the coset for p divisible by Z
    logn = 3
    n = 1 << logn
    hc = [random.randrange(params.R) for _ in range(n - 1)] + [0]
    # p = h * (x^n - 1): coefficients
    p = [0] * (2 * n)
    for i, c in enumerate(hc):
        p[i + n] = (p[i + n] + c) % params.R
        p[i] = (p[i] - c) % params.R
    # evaluate p on coset: via coset_ntt of its low+high split
    lo = F.pack_mont(p[:n], F.FR)
    hi = F.pack_mont(p[n:], F.FR)
    glo = ntt.coset_ntt(lo)
    ghi = ntt.coset_ntt(hi)
    # x^n on coset = g^n (constant)
    gn = pow(params.FR_GENERATOR, n, params.R)
    p_cos = F.add(F.mont_mul(ghi, F.const_mont(gn, n, F.FR), F.FR), glo, F.FR)
    zinv = ntt.zh_on_coset_inv(logn)
    h_cos = F.mont_mul(p_cos, F.const_mont(zinv, n, F.FR), F.FR)
    got = F.unpack_mont(ntt.coset_intt(h_cos), F.FR)
    assert got == hc


def test_g1_pointops_match_golden():
    g = G1.generator()
    pts = [g * random.randrange(1, 10 ** 9) for _ in range(7)] + [G1.zero()]
    qts = [g * random.randrange(1, 10 ** 9) for _ in range(7)] + [G1.zero()]
    P, Q = C.pack_g1(pts), C.pack_g1(qts)
    addf = jax.jit(lambda p, q: C.point_add(p, q, C.FQ_OPS))
    assert C.unpack_g1(addf(P, Q)) == [a + b for a, b in zip(pts, qts)]
    assert C.unpack_g1(addf(P, P)) == [a + a for a in pts]
    Pn = C.pack_g1([-a for a in pts])
    assert all(x.is_zero() for x in C.unpack_g1(addf(P, Pn)))
    dbl = jax.jit(lambda p: C.point_double(p, C.FQ_OPS))
    assert C.unpack_g1(dbl(P)) == [a.double() for a in pts]


def test_g2_pointops_match_golden():
    h = G2.generator()
    pts = [h * random.randrange(1, 10 ** 6) for _ in range(3)] + [G2.zero()]
    qts = [h * random.randrange(1, 10 ** 6) for _ in range(3)] + [G2.zero()]
    P, Q = C.pack_g2(pts), C.pack_g2(qts)
    S = jax.jit(lambda p, q: C.point_add(p, q, C.FQ2_OPS))(P, Q)
    assert C.unpack_g2(S) == [a + b for a, b in zip(pts, qts)]


def test_msm_bucket_pipeline_one_window():
    g = G1.generator()
    N = 32
    pts = [g * random.randrange(1, params.R) for _ in range(N - 1)] + [G1.zero()]
    scs = [random.randrange(16) for _ in range(N)]
    P = C.pack_g1(pts)
    digits = jnp.array(scs, dtype=jnp.int32)
    buckets = jax.jit(
        lambda P, d: msm._bucket_sums(P, d, 16, C.FQ_OPS, C.infinity_g1))(P, digits)
    got = C.unpack_g1(buckets)
    exp = [G1.sum([p for p, s in zip(pts, scs) if s == b]) for b in range(16)]
    assert got == exp
    red = jax.jit(
        lambda b: msm._weighted_bucket_reduce(b, C.FQ_OPS, C.infinity_g1))(buckets)
    assert C.unpack_g1(red)[0] == G1.dot(pts, [Fr(s) for s in scs])


@pytest.mark.parametrize("pattern", ["random", "all_same", "distinct",
                                     "long_runs"])
def test_bucket_sums_chunked_tail_carries(pattern):
    """The work-efficient bucket accumulation (chunked segmented scan +
    tail-only carry application) against per-bucket golden sums, with digit
    patterns chosen to stress segments spanning chunk boundaries."""
    g = G1.generator()
    N, K, B = 64, 8, 16
    pts = [g * random.randrange(1, params.R) for _ in range(N - 1)] + [G1.zero()]
    if pattern == "random":
        scs = [random.randrange(B) for _ in range(N)]
    elif pattern == "all_same":
        scs = [7] * N
    elif pattern == "distinct":
        scs = list(range(16)) * 4  # every bucket exactly 4x
    else:  # long_runs: segments of 24/24/16 crossing several 8-wide chunks
        scs = [3] * 24 + [5] * 24 + [11] * 16
    P = C.pack_g1(pts)
    digits = jnp.array(scs, dtype=jnp.int32)
    buckets = jax.jit(lambda P, d: msm._bucket_sums_chunked(
        P, d, B, C.FQ_OPS, C.infinity_g1, K=K))(P, digits)
    got = C.unpack_g1(buckets)
    exp = [G1.sum([p for p, s in zip(pts, scs) if s == b]) for b in range(B)]
    assert got == exp


def test_weighted_bucket_reduce_chunked():
    g = G1.generator()
    B = 32
    bpts = [g * random.randrange(1, params.R) for _ in range(B - 2)] + [
        G1.zero(), G1.zero()]
    random.shuffle(bpts)
    buckets = C.pack_g1(bpts)
    red = jax.jit(lambda b: msm._weighted_bucket_reduce(
        b, C.FQ_OPS, C.infinity_g1, K=8))(buckets)
    exp = G1.dot(bpts, [Fr(b) for b in range(B)])
    assert C.unpack_g1(red)[0] == exp


@pytest.mark.parametrize("c", [5, 12, 16])
def test_scalars_to_windows_arbitrary_width(c):
    scs = [0, 1, params.R - 1] + [random.randrange(params.R) for _ in range(5)]
    S = F.pack(scs, F.FR)
    digits = np.asarray(msm._scalars_to_windows(S, c))
    n_windows = -(-params.FR_LIMBS * 16 // c)
    assert digits.shape == (n_windows, len(scs))
    for j, s in enumerate(scs):
        for w in range(n_windows):
            assert digits[w, j] == (s >> (w * c)) & ((1 << c) - 1)


def test_auto_window_monotone():
    cs = [msm.auto_window(1 << k) for k in range(4, 22)]
    assert all(4 <= c <= 16 for c in cs)
    assert all(a <= b for a, b in zip(cs, cs[1:]))
    assert msm.auto_window(1 << 20) >= 14


@pytest.mark.slow
def test_msm_staged_nondividing_window():
    g = G1.generator()
    N = 16
    pts = [g * random.randrange(1, params.R) for _ in range(N)]
    scs = [random.randrange(params.R) for _ in range(N)]
    P, S = C.pack_g1(pts), F.pack(scs, F.FR)
    got = msm.msm_staged(P, S, group="g1", c=5)
    assert got == G1.dot(pts, [Fr(s) for s in scs])


@pytest.mark.slow
def test_full_msm_small_window():
    # c=4 keeps bucket arrays tiny so XLA:CPU can cope
    g = G1.generator()
    N = 16
    pts = [g * random.randrange(1, params.R) for _ in range(N)]
    scs = [random.randrange(params.R) for _ in range(N)]
    P, S = C.pack_g1(pts), F.pack(scs, F.FR)
    res = jax.jit(lambda p, s: msm.msm_g1(p, s, c=4))(P, S)
    assert C.unpack_g1(res)[0] == G1.dot(pts, [Fr(s) for s in scs])


@pytest.mark.slow
def test_fixed_base_small():
    scs = [0, 1, 2, params.R - 1] + [random.randrange(params.R) for _ in range(12)]
    S = F.pack(scs, F.FR)
    out = jax.jit(lambda s: msm.fixed_base_mul(s, "g1"))(S)
    assert C.unpack_g1(out) == [G1.generator() * Fr(s) for s in scs]


def test_fixed_base_table_clean_cache_under_trace(tmp_path, monkeypatch):
    """Round-2 regression (default tier): the production `_fixed_base_table`
    wrapper must build on a CLEAN cache dir while an outer jit trace is
    active — no persisted `.zk_cache` may mask a broken table-build path."""
    monkeypatch.setenv("ZUKELANG_TABLE_CACHE", str(tmp_path))
    msm._fixed_base_table.cache_clear()
    try:
        scs = [0, 1, 5, params.R - 1]
        S = F.pack(scs, F.FR)
        out = jax.jit(lambda s: msm.fixed_base_mul(s, "g1", c=4))(S)
        assert C.unpack_g1(out) == [G1.generator() * Fr(s) for s in scs]
    finally:
        msm._fixed_base_table.cache_clear()


def test_mont_mul_cios_variant():
    # the fori-loop CIOS fallback must agree with the default path
    spec = F.FQ
    xs = [random.randrange(spec.p) for _ in range(32)] + [0, 1, spec.p - 1]
    a = F.pack_mont(xs, spec)
    got = F.unpack_mont(jax.jit(lambda x: F.mont_mul_cios(x, x, spec))(a), spec)
    assert got == [(x * x) % spec.p for x in xs]


def test_to_affine_roundtrip():
    g = G1.generator()
    pts = [g * random.randrange(1, params.R) for _ in range(7)] + [G1.zero()]
    A = C.to_affine(C.pack_g1(pts), C.FQ_OPS)
    assert C.unpack_g1(C.affine_to_jac(A, C.FQ_OPS)) == pts
    # infinity marker is exactly (0, 0)
    assert not np.asarray(A[0])[:, -1].any()
    assert not np.asarray(A[1])[:, -1].any()
    g2 = G2.generator()
    pts2 = [g2 * random.randrange(1, params.R) for _ in range(3)] + [G2.zero()]
    A2 = C.to_affine(C.pack_g2(pts2), C.FQ2_OPS)
    assert C.unpack_g2(C.affine_to_jac(A2, C.FQ2_OPS)) == pts2


def test_point_madd_matches_golden():
    g = G1.generator()
    # generic + q_inf + p_inf + doubling + opposite lanes
    q = [g * 3, G1.zero(), g * 5, g * 7, g * 9, G1.zero()]
    p = [g * 11, g * 4, G1.zero(), g * 7, -(g * 9), G1.zero()]
    Qa = C.to_affine(C.pack_g1(q), C.FQ_OPS)
    got = C.unpack_g1(C.point_madd(C.pack_g1(p), Qa, C.FQ_OPS))
    assert got == [a + b for a, b in zip(p, q)]


def test_point_madd_g2_matches_golden():
    g2 = G2.generator()
    q = [g2 * 3, G2.zero(), g2 * 5, g2 * 7]
    p = [g2 * 11, g2 * 4, G2.zero(), g2 * 7]
    Qa = C.to_affine(C.pack_g2(q), C.FQ2_OPS)
    got = C.unpack_g2(C.point_madd(C.pack_g2(p), Qa, C.FQ2_OPS))
    assert got == [a + b for a, b in zip(p, q)]


def test_madd_kernel_body_matches_golden():
    """The Pallas madd kernel body math, run as plain jnp (the kernel
    itself only compiles on real TPU; interpret mode is impractically
    slow for the unrolled point formulas)."""
    from zukelang_tpu.ops import pallas_kernels as PK
    spec = F.FQ
    nl = spec.nl
    p_limbs = tuple(int(x) for x in spec.p_limbs)
    one_limbs = tuple(int(x) for x in F._int_to_limbs(spec.r_mod_p, nl))
    g = G1.generator()
    q = [g * 3, G1.zero(), g * 5, g * 7, g * 9]
    p = [g * 11, g * 4, G1.zero(), g * 7, -(g * 9)]
    Pj = C.pack_g1(p)
    Qa = C.to_affine(C.pack_g1(q), C.FQ_OPS)
    rows = lambda arr: [arr[j, :] for j in range(nl)]
    mul = lambda a, b: PK._fq_mul_body(a, b, p_limbs, spec.nprime)
    add = lambda a, b: PK._fq_add_body(a, b, p_limbs)
    sub = lambda a, b: PK._fq_sub_body(a, b, p_limbs)
    one = [jnp.full_like(rows(Pj[0])[0], jnp.uint32(v)) for v in one_limbs]
    X3, Y3, Z3, same = PK._madd_core(
        rows(Pj[0]), rows(Pj[1]), rows(Pj[2]), rows(Qa[0]), rows(Qa[1]),
        mul, add, sub, PK._fq_is_zero_body, PK._select_limbs, one)
    got = C.unpack_g1(tuple(jnp.stack(v) for v in (X3, Y3, Z3)))
    want = [a + b for a, b in zip(p, q)]
    assert list(np.asarray(same)) == [False, False, False, True, False]
    for i in range(5):
        if i == 3:
            continue  # doubling lane: flagged, fixed up by point_madd
        assert got[i] == want[i]


@pytest.mark.slow
def test_msm_staged_affine_bases():
    g = G1.generator()
    N = 16
    pts = [g * random.randrange(1, params.R) for _ in range(N)]
    scs = [random.randrange(params.R) for _ in range(N)]
    Paff = C.to_affine(C.pack_g1(pts), C.FQ_OPS)
    got = msm.msm_staged(Paff, F.pack(scs, F.FR), group="g1", c=4)
    assert got == G1.dot(pts, [Fr(s) for s in scs])


@pytest.mark.parametrize("c", [5, 12, 16])
def test_scalars_to_signed_windows(c):
    scs = [0, 1, params.R - 1] + [random.randrange(params.R) for _ in range(5)]
    S = F.pack(scs, F.FR)
    d = np.asarray(msm._scalars_to_signed_windows(S, c))
    half = 1 << (c - 1)
    assert np.abs(d).max() <= half
    for j, s in enumerate(scs):
        assert sum(int(d[w, j]) << (w * c) for w in range(d.shape[0])) == s


@pytest.mark.slow
def test_msm_staged_signed_negative_digit_path():
    # scalars chosen so signed window extraction produces negative digits
    g = G1.generator()
    N = 16
    scs = [(1 << (5 * w)) - 1 for w in range(1, N + 1)]  # dense 1-bits
    pts = [g * random.randrange(1, params.R) for _ in range(N)]
    P, S = C.pack_g1(pts), F.pack(scs, F.FR)
    got = msm.msm_staged(C.to_affine(P, C.FQ_OPS), S, group="g1", c=5)
    assert got == G1.dot(pts, [Fr(s) for s in scs])


def test_msm_forced_collision_safe_redispatch(monkeypatch):
    """Cover the collided -> safe re-dispatch on the CPU backend (ADVICE
    r4): the real fused path only sets the flag on TPU, so poison the
    fused program to return garbage + collided=True and assert the
    wrapper transparently re-dispatches _jit_msm_safe — the result is
    correct only if the safe program actually ran."""
    n = 32
    g = G1.generator()
    pts = [g * (i + 1) for i in range(n)]
    scs = [random.randrange(params.R) for _ in range(n)]
    Paff = C.to_affine(C.pack_g1(pts), C.FQ_OPS)
    S = F.pack(scs, F.FR)

    real_fused = msm._jit_msm_fused
    safe_calls = []
    real_safe = msm._jit_msm_safe

    def fake_fused(group, c, affine):
        fn = real_fused(group, c, affine)

        def run(points, scalars_std):
            X, Y, Z, _ = fn(points, scalars_std)
            return (jnp.zeros_like(X), jnp.zeros_like(Y),
                    jnp.zeros_like(Z), jnp.ones((), jnp.bool_))

        return run

    def spying_safe(group, c):
        safe_calls.append((group, c))
        return real_safe(group, c)

    monkeypatch.setattr(msm, "_jit_msm_fused", fake_fused)
    monkeypatch.setattr(msm, "_jit_msm_safe", spying_safe)
    got = msm.msm_staged(Paff, S, group="g1", c=8)
    assert safe_calls == [("g1", 8)]
    assert got == G1.dot(pts, [Fr(s) for s in scs])


def test_msm_many_deferred_resolves_after_dispatch():
    """msm_many_staged_deferred (ADVICE r4: defer the collision sync)
    must allow several dispatches before any resolve and still match the
    golden result for each MSM in the batch."""
    n = 32
    g = G1.generator()
    t1 = [g * (i + 3) for i in range(n)]
    t2 = [g * (2 * i + 5) for i in range(n)]
    s1 = [random.randrange(params.R) for _ in range(n)]
    s2 = [random.randrange(params.R) for _ in range(n)]
    T1 = C.to_affine(C.pack_g1(t1), C.FQ_OPS)
    T2 = C.to_affine(C.pack_g1(t2), C.FQ_OPS)
    S1 = jnp.asarray(F.pack_mont(s1, F.FR))
    S2 = jnp.asarray(F.pack_mont(s2, F.FR))

    r_a = msm.msm_many_staged_deferred((T1, T2), [S1, S2], pmap=(0, 1),
                                       group="g1", c=4)
    r_b = msm.msm_many_staged_deferred((T2,), [S1], pmap=(0,),
                                       group="g1", c=4)
    got_a = C.unpack_g1(r_a())
    got_b = C.unpack_g1(r_b())
    assert got_a[0] == G1.dot(t1, [Fr(s) for s in s1])
    assert got_a[1] == G1.dot(t2, [Fr(s) for s in s2])
    assert got_b[0] == G1.dot(t2, [Fr(s) for s in s1])
