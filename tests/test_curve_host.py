"""Host BN254 curve + pairing tests (bilinearity, group laws, degeneracy)."""
import time

from zksc_tpu.curve.bn254_host import (
    F12_ONE, G1_GEN, G2_GEN, R, f12_mul, f12_pow, g1_add, g1_is_on_curve,
    g1_mul, g1_neg, g2_add, g2_is_on_curve, g2_mul, g2_neg, multi_pairing,
    pairing,
)


def test_g1_group_law():
    g2x = g1_mul(G1_GEN, 2)
    assert g1_add(G1_GEN, G1_GEN) == g2x
    assert g1_is_on_curve(g2x)
    assert g1_add(g2x, g1_neg(G1_GEN)) == G1_GEN
    assert g1_mul(G1_GEN, R) is None          # subgroup order
    assert g1_mul(G1_GEN, R + 5) == g1_mul(G1_GEN, 5)


def test_g2_group_law():
    q2 = g2_mul(G2_GEN, 2)
    assert g2_add(G2_GEN, G2_GEN) == q2
    assert g2_is_on_curve(q2)
    assert g2_add(q2, g2_neg(G2_GEN)) == G2_GEN
    assert g2_mul(G2_GEN, R) is None


def test_pairing_bilinearity():
    e = pairing(G1_GEN, G2_GEN)
    assert e != F12_ONE
    # e(2P, Q) == e(P, Q)^2 == e(P, 2Q)
    e2a = pairing(g1_mul(G1_GEN, 2), G2_GEN)
    e2b = pairing(G1_GEN, g2_mul(G2_GEN, 2))
    esq = f12_mul(e, e)
    assert e2a == esq
    assert e2b == esq
    # e(aP, bQ) == e(P,Q)^(ab)
    a, b = 31, 57
    eab = pairing(g1_mul(G1_GEN, a), g2_mul(G2_GEN, b))
    assert eab == f12_pow(e, a * b)


def test_pairing_nondegeneracy_and_order():
    e = pairing(G1_GEN, G2_GEN)
    assert f12_pow(e, R) == F12_ONE


def test_multi_pairing_cancellation():
    # e(P, Q) * e(-P, Q) == 1
    out = multi_pairing([(G1_GEN, G2_GEN), (g1_neg(G1_GEN), G2_GEN)])
    assert out == F12_ONE
