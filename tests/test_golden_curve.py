"""G1/G2 group law, serialization, and pairing tests."""

import random

import pytest

from zukelang_tpu import params
from zukelang_tpu.golden import Fr, G1, G2, GT, pairing, multi_pairing

random.seed(99)


@pytest.mark.parametrize("G", [G1, G2])
def test_group_laws(G):
    g = G.generator()
    assert g.is_on_curve()
    assert (g + g) == g.double()
    assert (g * 5) == g + g + g + g + g
    assert (g * params.R).is_zero()
    assert (g - g).is_zero()
    a = random.randrange(params.R)
    b = random.randrange(params.R)
    assert g * a + g * b == g * ((a + b) % params.R)
    assert (g * a).is_on_curve()
    assert (g * Fr(a)) * Fr(b) == g * Fr((a * b) % params.R)


@pytest.mark.parametrize("G,size", [(G1, 48), (G2, 96)])
def test_compressed_roundtrip(G, size):
    g = G.generator()
    for k in [0, 1, 2, 12345, params.R - 1]:
        pt = g * k
        enc = pt.to_compressed_bytes()
        assert len(enc) == size
        assert G.of_compressed_bytes(enc) == pt


def test_g1_generator_encoding_matches_zcash_vector():
    # Standard test vector for the BLS12-381 G1 generator (ZCash spec).
    exp = ("97f1d3a73197d7942695638c4fa9ac0fc3688c4f9774b905a14e3a3f171bac58"
           "6c55e83ff97a1aeffb3af00adb22c6bb")
    assert G1.generator().to_compressed_bytes().hex() == exp


def test_g2_generator_encoding_matches_zcash_vector():
    exp = ("93e02b6052719f607dacd3a088274f65596bd0d09920b61ab5da61bbdc7f5049"
           "334cf11213945d57e5ac7d055d042b7e"
           "024aa2b2f08f0a91260805272dc51051c6e47ad4fa403b02b4510b647ae3d177"
           "0bac0326a805bbefd48056c8c121bdb8")
    assert G2.generator().to_compressed_bytes().hex() == exp


def test_infinity_encoding_matches_zcash_spec():
    # ZCash BLS12-381 spec: point at infinity encodes as c_flag=1,
    # b_flag=1, a_flag=0 and all-zero payload (curve.ml:195-211 relies
    # on the same blst encodings).
    assert G1.zero().to_compressed_bytes().hex() == "c0" + "00" * 47
    assert G2.zero().to_compressed_bytes().hex() == "c0" + "00" * 95
    assert G1.of_compressed_bytes(bytes([0xC0] + [0] * 47)).is_zero()
    assert G2.of_compressed_bytes(bytes([0xC0] + [0] * 95)).is_zero()


def test_negated_generator_encoding_matches_zcash_spec():
    # Same x, a_flag (0x20) flipped: the spec sets a_flag iff y is the
    # lexicographically larger root; the generators encode with it clear,
    # so their negations are the identical byte strings with byte0 |= 0x20.
    g1 = G1.generator().to_compressed_bytes()
    n1 = (-G1.generator()).to_compressed_bytes()
    assert n1.hex() == ("b7" + g1.hex()[2:])
    g2 = G2.generator().to_compressed_bytes()
    n2 = (-G2.generator()).to_compressed_bytes()
    assert n2.hex() == ("b3" + g2.hex()[2:])


def test_pairing_bilinearity():
    g, h = G1.generator(), G2.generator()
    e = pairing(g, h)
    a, b = Fr(1234567), Fr(7654321)
    assert pairing(g * a, h * b) == e * (a * b)
    assert pairing(g * a, h) + pairing(g * b, h) == e * (a + b)
    assert e != GT.zero()
    assert e * 0 == GT.zero()
    assert pairing(G1.zero(), h) == GT.zero()


def test_multi_pairing_matches_products():
    g, h = G1.generator(), G2.generator()
    pairs = [(g * 3, h * 5), (g * 7, h * 11)]
    assert multi_pairing(pairs) == pairing(*pairs[0]) + pairing(*pairs[1])


def test_gt_serialization_roundtrip():
    e = pairing(G1.generator() * 42, G2.generator())
    assert GT.of_bytes(e.to_bytes()) == e
