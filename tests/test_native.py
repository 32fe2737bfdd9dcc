"""C++ native backend tests (ctypes bindings over native/zukelang_native.cpp)."""

import random

import pytest

from zukelang_tpu import native, params
from zukelang_tpu.golden.curve import G1
from zukelang_tpu.golden.field import Fr

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="no native toolchain")
random.seed(17)


def test_fr_batches():
    a = [Fr(random.randrange(params.R)) for _ in range(50)]
    b = [Fr(random.randrange(params.R)) for _ in range(50)]
    assert native.fr_mul_batch(a, b) == [x * y for x, y in zip(a, b)]
    assert native.fr_inv_batch(a) == [x.inv() for x in a]
    assert native.fr_inv_batch([Fr(0)]) == [Fr(0)]


def test_g1_scalar_mul():
    g = G1.generator()
    for k in (0, 1, 2, params.R - 1, 123456789):
        assert native.g1_scalar_mul(g, Fr(k)) == g * k


def test_g1_msm_matches_golden():
    g = G1.generator()
    pts = [g * random.randrange(1, 10 ** 9) for _ in range(40)] + [G1.zero()]
    scs = [Fr(random.randrange(params.R)) for _ in range(41)]
    assert native.g1_msm(pts, scs) == G1.dot(pts, scs)


def test_g1_msm_edge_scalars():
    g = G1.generator()
    pts = [g, g * 2, g * 3]
    scs = [Fr(0), Fr(1), Fr(params.R - 1)]
    assert native.g1_msm(pts, scs) == G1.dot(pts, scs)


def test_native_pairing_matches_golden():
    from zukelang_tpu import native
    if not native.available():
        import pytest
        pytest.skip("no native toolchain")
    import random as _r
    _r.seed(5)
    from zukelang_tpu.golden.curve import G1, G2
    from zukelang_tpu.golden.pairing import multi_pairing, pairing

    g1, g2 = G1.generator(), G2.generator()
    cases = [(g1, g2), (g1 * 7, g2 * 3), (G1.zero(), g2), (g1, G2.zero()),
             (g1 * _r.randrange(1 << 64), g2 * _r.randrange(1 << 64))]
    for p, q in cases:
        assert native.gt_pairing(p, q) == pairing(p, q)
    assert native.gt_multi_pairing(cases) == multi_pairing(cases)
    # bilinearity entirely through the native path
    assert native.gt_pairing(g1 * 6, g2 * 11) == native.gt_pairing(g1 * 66, g2)


def test_pairing_dispatcher_env_toggle(monkeypatch):
    from zukelang_tpu import pairing as disp
    from zukelang_tpu.golden.curve import G1, G2
    from zukelang_tpu.golden.pairing import pairing as gold

    g1, g2 = G1.generator() * 3, G2.generator() * 4
    expected = gold(g1, g2)
    assert disp.pairing(g1, g2) == expected
    monkeypatch.setenv("ZUKELANG_NATIVE_PAIRING", "0")
    assert disp.pairing(g1, g2) == expected
