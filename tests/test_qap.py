"""QAP build / eval / decompile tests on both domains."""

import pytest

from zukelang_tpu.core import comp, lang as L, poly, qap as qap_mod
from zukelang_tpu.golden.field import Fr
from zukelang_tpu.rng import Gen


def compiled_cubic():
    e = L.let_(L.input("input", L.SECRET, L.ty_field),
               lambda x: L.add(L.add(L.mul(L.mul(x, x), x), x), L.fnum(3)))
    c = comp.compile_expr(e)
    _i, env_lang, env_code = comp.gen_inputs(c.inputs, Gen(5))
    sol = comp.code_eval_list(env_code, c.codes)
    return e, c, sol


@pytest.mark.parametrize("domain", ["reference", "ntt"])
def test_qap_eval_divides(domain):
    e, c, sol = compiled_cubic()
    q = qap_mod.build(c.gates, domain=domain)
    p, h = qap_mod.eval_witness(sol, q)
    # p == h * target exactly
    assert poly.equal(p, poly.mul(h, q.target))


@pytest.mark.parametrize("domain", ["reference", "ntt"])
def test_decompile_inverse(domain):
    e, c, sol = compiled_cubic()
    q = qap_mod.build(c.gates, domain=domain)
    re = qap_mod.decompile(q)
    assert [g.key() for g in re] == [g.key() for g in q.gates]


def test_bad_witness_rejected():
    e, c, sol = compiled_cubic()
    q = qap_mod.build(c.gates)
    bad = dict(sol)
    k = sorted(c.mids)[0]
    bad[k] = bad[k] + Fr(1)
    with pytest.raises(AssertionError):
        qap_mod.eval_witness(bad, q)


def test_reference_domain_points_are_gate_indices():
    # QAP.ml:84-92: interpolation points are consecutive ints 0..n-1
    xs, target = qap_mod.domain_points(4, "reference")
    assert xs == [Fr(0), Fr(1), Fr(2), Fr(3)]
    assert poly.equal(target, poly.z(xs))


def test_ntt_domain_is_roots_of_unity():
    xs, target = qap_mod.domain_points(5, "ntt")
    n = len(xs)
    assert n == 8
    # all are N-th roots of unity and target = x^N - 1
    for x in xs:
        assert x ** n == Fr(1)
    assert len(set(x.n for x in xs)) == n
    assert poly.equal(target, poly.z(xs))


def test_polynomial_division():
    a = [Fr(i) for i in [3, 1, 4, 1, 5, 9]]
    b = [Fr(i) for i in [2, 7, 1]]
    q, r = poly.div_rem(a, b)
    assert poly.equal(poly.add(poly.mul(q, b), r), a)
    assert len(r) < len(b)


def test_lagrange_interpolation():
    pts = [(Fr(1), Fr(3)), (Fr(2), Fr(2)), (Fr(3), Fr(4))]
    f = poly.interpolate(pts)
    for x, y in pts:
        assert poly.apply(f, x) == y
