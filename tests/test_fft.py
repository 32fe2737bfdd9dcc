"""FFT engine tests — the reference's FFT self-test strategy
(FFT.ml:88-108: roundtrips + differential check vs naive O(n^2) multiply)."""

import random

import numpy as np
import pytest

from zukelang_tpu.core import poly
from zukelang_tpu.golden.field import Fr
from zukelang_tpu.ops import fft
from zukelang_tpu import params
from zukelang_tpu.rng import Gen

random.seed(9)


def rand_poly(n):
    return [Fr(random.randrange(params.R)) for _ in range(n)]


def test_fft_c_roundtrip():
    p = [complex(random.uniform(-10, 10), random.uniform(-10, 10))
         for _ in range(13)]
    vals = fft.fft_c(p)
    back = fft.ifft_c(vals)[: len(p)]
    assert np.allclose(back, p, atol=1e-9)


def test_polynomial_mul_c_matches_naive():
    p1 = [complex(random.uniform(-5, 5)) for _ in range(9)]
    p2 = [complex(random.uniform(-5, 5)) for _ in range(6)]
    got = fft.polynomial_mul_c(p1, p2)
    exp = np.convolve(p1, p2)
    assert np.allclose(got, exp, atol=1e-6)


def test_fft_fr_roundtrip():
    p = rand_poly(11)
    vals = fft.fft_fr(p)
    back = fft.ifft_fr(vals)[: len(p)]
    assert back == p


@pytest.mark.parametrize("n1,n2", [(5, 7), (8, 8), (1, 9)])
def test_polynomial_mul_fr_matches_naive(n1, n2):
    p1, p2 = rand_poly(n1), rand_poly(n2)
    got = fft.polynomial_mul_fr(p1, p2)
    exp = poly.mul(p1, p2)
    assert poly.equal(got, exp)


def test_native_ntt_matches_jax():
    from zukelang_tpu import native
    if not native.available():
        pytest.skip("no native toolchain")
    p = rand_poly(16)
    assert native.fr_ntt(p) == fft.fft_fr(p)
    assert native.fr_ntt(native.fr_ntt(p), inverse=True) == p
