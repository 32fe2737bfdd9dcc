"""Golden field & tower arithmetic tests (oracle for every TPU kernel)."""

import random

import pytest

from zukelang_tpu import params
from zukelang_tpu.golden.field import Fr, Fq, Fq2, Fq6, Fq12

random.seed(1234)


def rand_fq2():
    return Fq2.of_ints(random.randrange(params.P), random.randrange(params.P))


def rand_fq6():
    return Fq6(rand_fq2(), rand_fq2(), rand_fq2())


def rand_fq12():
    return Fq12(rand_fq6(), rand_fq6())


@pytest.mark.parametrize("F", [Fr, Fq])
def test_prime_field_laws(F):
    for _ in range(20):
        a = F(random.randrange(F.p))
        b = F(random.randrange(F.p))
        c = F(random.randrange(F.p))
        assert a + b == b + a
        assert (a + b) + c == a + (b + c)
        assert a * (b + c) == a * b + a * c
        assert a - a == F(0)
        if not a.is_zero():
            assert a * a.inv() == F(1)
            assert (a / b if not b.is_zero() else a) is not None


def test_fr_root_of_unity():
    w = Fr(params.FR_ROOT_OF_UNITY)
    assert w ** (1 << 32) == Fr(1)
    assert w ** (1 << 31) != Fr(1)


def test_fq2_mul_matches_schoolbook():
    for _ in range(20):
        a, b = rand_fq2(), rand_fq2()
        ref = Fq2(a.c0 * b.c0 - a.c1 * b.c1, a.c0 * b.c1 + a.c1 * b.c0)
        assert a * b == ref
        assert a.square() == a * a
        if not a.is_zero():
            assert a * a.inv() == Fq2.one()


def test_fq6_ring_laws():
    for _ in range(10):
        a, b, c = rand_fq6(), rand_fq6(), rand_fq6()
        assert (a * b) * c == a * (b * c)
        assert a * (b + c) == a * b + a * c
        assert a * a.inv() == Fq6.one()
        # v^3 == xi
        from zukelang_tpu.golden.field import XI
        v = Fq6(Fq2.zero(), Fq2.one(), Fq2.zero())
        assert v * v * v == Fq6(XI, Fq2.zero(), Fq2.zero())


def test_fq12_ring_laws_and_frobenius():
    for _ in range(5):
        a, b = rand_fq12(), rand_fq12()
        assert a.square() == a * a
        assert a * a.inv() == Fq12.one()
        assert (a * b).frobenius() == a.frobenius() * b.frobenius()
        # frobenius is the p-power map
        assert a.frobenius() == a ** params.P
        assert a.frobenius(12) == a


def test_fq_sqrt():
    for _ in range(10):
        a = Fq(random.randrange(params.P))
        sq = a * a
        r = sq.sqrt()
        assert r is not None and r * r == sq


def test_fq2_sqrt():
    for _ in range(10):
        a = rand_fq2()
        sq = a * a
        r = sq.sqrt()
        assert r is not None and r * r == sq
