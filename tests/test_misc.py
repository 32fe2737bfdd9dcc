"""Roots-of-unity, rng, and util tests."""

import pytest

from zukelang_tpu import params, util
from zukelang_tpu.core import lang as L, roots
from zukelang_tpu.golden.field import Fr
from zukelang_tpu.rng import Gen, InjectedRng


def test_two_adic_root_fr():
    n, ga = roots.two_adic_root(params.R)
    assert n == 32                        # FFT.ml:192-204
    assert ga == params.FR_ROOT_OF_UNITY  # generator g=5 search (FFT.ml:209)


def test_f_of_uint_embedding():
    # g^a + g^b = g^(a+b): uint add becomes field mul (lang.ml:19-21)
    five = roots.f_of_uint(params.R, 32, 5)
    seven = roots.f_of_uint(params.R, 32, 7)
    twelve = roots.f_of_uint(params.R, 32, 12)
    assert five * seven % params.R == twelve
    assert L.f_of_uint32(5) == Fr(five)
    # 2-adicity ceiling
    assert roots.f_of_uint(params.R, 33, 1) is None


def test_gen_determinism():
    a, b = Gen(42), Gen(42)
    assert [a.fr() for _ in range(5)] == [b.fr() for _ in range(5)]
    assert Gen(43).fr() != Gen(42).fr()


def test_injected_rng_order_and_exhaustion():
    r = InjectedRng([Fr(1), Fr(2)])
    assert r.fr() == Fr(1) and r.fr() == Fr(2)
    with pytest.raises(RuntimeError):
        r.fr()


def test_with_time_and_stage():
    res, dt = util.with_time(lambda: 42)
    assert res == 42 and dt >= 0
    sink = {}
    with util.stage("x", sink):
        pass
    assert "x" in sink
