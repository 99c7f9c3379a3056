"""Groth16 end-to-end on a small circuit: setup -> prove (device MSM/NTT) ->
verify (host pairing). Negative tests: wrong public input, tampered proof."""
import random

import numpy as np
import pytest

from zksc_tpu.groth16 import ProverContext, setup, verify
from zksc_tpu.r1cs import check_witness, compile_circuit, generate_witness

RNG = random.Random(7)


def tiny_define(api, v):
    """Toy statement: public out == x^3 + x + 5 for secret x (plus a xor bit
    pair to exercise every constraint type)."""
    x = v["x"][0]
    out = v["out"][0]
    b0, b1 = v["b0"][0], v["b1"][0]
    x2 = api.mul(x, x)
    x3 = api.mul(x2, x)
    api.assert_eq(api.add(x3, x, api.constant(5)), out)
    api.assert_bool(b0)
    api.assert_bool(b1)
    c = api.xor(b0, b1)
    bits = api.to_bits(api.add(c, api.constant(2)), 3)
    api.assert_eq(api.from_bits(bits), api.add(c, api.constant(2)))


PUB = [("out", 1), ("b0", 1)]
PRIV = [("x", 1), ("b1", 1)]


@pytest.fixture(scope="module")
def artifacts():
    cs = compile_circuit(tiny_define, PUB, PRIV)
    pk, vk = setup(cs, rng=lambda: RNG.randrange(2, cs.n_wires * 1000 + 10**9))
    return cs, pk, vk


def _witness(cs, x=3, b0=1, b1=0):
    out = x ** 3 + x + 5
    w = generate_witness(tiny_define, PUB, PRIV,
                         {"out": [[out]], "b0": [[b0]]},
                         {"x": [[x]], "b1": [[b1]]}, batch=1)
    assert check_witness(cs, w)
    return w[:, 0], [out, b0]


def test_prove_and_verify(artifacts):
    cs, pk, vk = artifacts
    w, pub = _witness(cs, x=4, b0=1, b1=1)
    ctx = ProverContext(cs, pk)
    proof = ctx.prove(w, rng=lambda: RNG.randrange(1, 2**200))
    assert verify(vk, proof, pub)


def test_verify_rejects_wrong_public(artifacts):
    cs, pk, vk = artifacts
    w, pub = _witness(cs, x=3)
    ctx = ProverContext(cs, pk)
    proof = ctx.prove(w, rng=lambda: RNG.randrange(1, 2**200))
    assert verify(vk, proof, pub)
    bad = [pub[0] + 1, pub[1]]
    assert not verify(vk, proof, bad)


def test_verify_rejects_tampered_proof(artifacts):
    from zksc_tpu.curve import bn254_host as host
    cs, pk, vk = artifacts
    w, pub = _witness(cs, x=5)
    ctx = ProverContext(cs, pk)
    proof = ctx.prove(w, rng=lambda: RNG.randrange(1, 2**200))
    proof.a = host.g1_add(proof.a, host.G1_GEN)   # still on curve, wrong value
    assert not verify(vk, proof, pub)


def test_proof_json_roundtrip(artifacts):
    from zksc_tpu.groth16.prove import Proof
    cs, pk, vk = artifacts
    w, pub = _witness(cs, x=2)
    ctx = ProverContext(cs, pk)
    proof = ctx.prove(w, rng=lambda: RNG.randrange(1, 2**200))
    d = proof.to_json_dict()
    assert d["protocol"] == "groth16" and d["curve"] == "bn128"
    p2 = Proof.from_json_dict(d)
    assert verify(vk, p2, pub)


def _find_twist_point_outside_subgroup():
    """Find a point on E'(Fp2) (y^2 = x^3 + B2) that is NOT in the order-R
    subgroup, via Fp2 = Fp[u]/(u^2+1) square roots (p = 3 mod 4)."""
    from zksc_tpu.curve import bn254_host as host
    P = host.P

    def fp_sqrt(a):
        r = pow(a, (P + 1) // 4, P)
        return r if r * r % P == a % P else None

    def f2_sqrt(c):
        a, b = c
        if b == 0:
            r = fp_sqrt(a)
            if r is not None:
                return (r, 0)
            r = fp_sqrt(-a % P)
            return None if r is None else (0, r)
        n = fp_sqrt((a * a + b * b) % P)
        if n is None:
            return None
        for sign in (1, -1):
            x0sq = (a + sign * n) * pow(2, -1, P) % P
            x0 = fp_sqrt(x0sq)
            if x0 is not None and x0 != 0:
                x1 = b * pow(2 * x0, -1, P) % P
                return (x0, x1)
        return None

    for xa in range(1, 200):
        x = (xa, 1)
        rhs = host.f2_add(host.f2_mul(x, host.f2_sqr(x)), host.B2)
        y = f2_sqrt(rhs)
        if y is None:
            continue
        pt = (x, y)
        assert host.g2_is_on_curve(pt)
        if not host.g2_in_subgroup(pt):
            return pt
    raise AssertionError("no out-of-subgroup twist point found")


def test_verify_rejects_out_of_subgroup_b(artifacts):
    """BN254's twist cofactor is huge: an on-curve but out-of-subgroup B must
    be rejected before the pairing (gnark gets this from strict proof
    deserialization; advisor r1 medium)."""
    cs, pk, vk = artifacts
    w, pub = _witness(cs, x=6)
    ctx = ProverContext(cs, pk)
    proof = ctx.prove(w, rng=lambda: RNG.randrange(1, 2**200))
    assert verify(vk, proof, pub)
    proof.b = _find_twist_point_outside_subgroup()
    assert not verify(vk, proof, pub)


def test_verify_rejects_noncanonical_coords(artifacts):
    from zksc_tpu.curve import bn254_host as host
    cs, pk, vk = artifacts
    w, pub = _witness(cs, x=7)
    ctx = ProverContext(cs, pk)
    proof = ctx.prove(w, rng=lambda: RNG.randrange(1, 2**200))
    assert verify(vk, proof, pub)
    # same point, coordinates shifted by p: mathematically equal, but the
    # encoding is malleable -> must be rejected
    ax, ay = proof.a
    proof.a = (ax + host.P, ay)
    assert not verify(vk, proof, pub)


def test_verify_rejects_malformed_json(artifacts):
    from zksc_tpu.groth16.prove import Proof
    for bad in ({}, {"pi_a": [1], "pi_b": [[1, 2]], "pi_c": [1, 2]},
                {"pi_a": ["x", "y"], "pi_b": [["0", "0"], ["0", "0"]],
                 "pi_c": ["0", "0"]}):
        try:
            Proof.from_json_dict(bad)
        except (KeyError, ValueError, TypeError, IndexError):
            continue
