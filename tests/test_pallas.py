"""Pallas kernel tests (interpret mode on CPU; real Mosaic path on TPU)."""

import random

import pytest

from zukelang_tpu.ops import field_jax as F
from zukelang_tpu.ops import pallas_kernels as PK

random.seed(6)


def test_pallas_mont_mul_fr():
    spec = F.FR
    N = 200  # non-multiple of block exercises padding
    xs = [random.randrange(spec.p) for _ in range(N)]
    ys = [random.randrange(spec.p) for _ in range(N)]
    a, b = F.pack_mont(xs, spec), F.pack_mont(ys, spec)
    got = F.unpack_mont(PK.mont_mul_pallas(a, b, spec, block=128), spec)
    assert got == [(x * y) % spec.p for x, y in zip(xs, ys)]


@pytest.mark.slow
def test_pallas_mont_mul_fq():
    spec = F.FQ
    N = 128
    xs = [random.randrange(spec.p) for _ in range(N)]
    ys = [random.randrange(spec.p) for _ in range(N)]
    a, b = F.pack_mont(xs, spec), F.pack_mont(ys, spec)
    got = F.unpack_mont(PK.mont_mul_pallas(a, b, spec, block=128), spec)
    assert got == [(x * y) % spec.p for x, y in zip(xs, ys)]


def test_pallas_mont_mul_edge_values():
    spec = F.FR
    xs = [0, 1, spec.p - 1, spec.p - 2] * 32
    a = F.pack_mont(xs, spec)
    got = F.unpack_mont(PK.mont_mul_pallas(a, a, spec, block=128), spec)
    assert got == [(x * x) % spec.p for x in xs]
