"""Phase-2 ceremony (groth16/ceremony.py): contribute -> beacon chain.

Mirrors the reference's ceremony shape (snarkjs zkey contribute + beacon,
circom/scripts/build-circuit.sh:10-20): after any number of contributions the
proof system still works, each link is pairing-verifiable, and tampering with
any published element breaks verification.
"""
import random

import pytest

from zksc_tpu.curve import bn254_host as host
from zksc_tpu.groth16 import ProverContext, setup, verify
from zksc_tpu.groth16.ceremony import (
    apply_beacon, contribute, verify_chain, verify_query_scaling,
)
from zksc_tpu.r1cs import compile_circuit, generate_witness

PUB = [("out", 1)]
PRIV = [("x", 1)]


def define(api, v):
    x = v["x"][0]
    out = v["out"][0]
    acc = x
    for _ in range(6):
        acc = api.mul(acc, x)
    api.assert_eq(api.add(acc, api.constant(3)), out)


@pytest.fixture(scope="module")
def chain():
    cs = compile_circuit(define, PUB, PRIV)
    srng = random.Random(7)
    pk0, vk0 = setup(cs, rng=lambda: srng.randrange(2, host.R))
    pk1, vk1, c1 = contribute(pk0, vk0, entropy=b"first")
    pk2, vk2, c2 = contribute(pk1, vk1, entropy=b"second",
                              prev_transcript=c1.transcript)
    pk3, vk3, c3 = apply_beacon(pk2, vk2, "00aa11bb", n_iters=4,
                                prev_transcript=c2.transcript)
    return cs, (pk0, vk0), (pk3, vk3), [c1, c2, c3]


def _witness(cs, x):
    out = (pow(x, 7, host.R) + 3) % host.R
    w = generate_witness(define, PUB, PRIV, {"out": [[out]]}, {"x": [[x]]},
                         batch=1)
    return w[:, 0], [out]


def test_proof_works_after_contributions(chain):
    cs, (pk0, vk0), (pk3, vk3), _ = chain
    w, pub = _witness(cs, x=4)
    p = ProverContext(cs, pk3).prove(w)
    assert verify(vk3, p, pub)
    # a proof made with the ORIGINAL pk must not verify under the final vk
    p0 = ProverContext(cs, pk0).prove(w)
    assert not verify(vk3, p0, pub)
    assert verify(vk0, p0, pub)


def test_chain_pairing_verification(chain):
    _, (pk0, _), _, cons = chain
    assert verify_chain(pk0.delta_g1, pk0.delta_g2, cons,
                        check_beacon_last=True)


def test_chain_rejects_tampering(chain):
    _, (pk0, _), _, cons = chain
    import copy
    bad = copy.copy(cons[1])
    # swap in an unrelated d_g2 (valid point, wrong scalar) and recompute the
    # transcript so the hash chain is consistent — the forgery must be caught
    # by the PAIRING checks, not merely the hash chain
    bad.d_g2 = host.g2_mul(host.G2_GEN, 12345)
    bad.transcript = bad.chain_hash(cons[0].transcript)
    assert not verify_chain(pk0.delta_g1, pk0.delta_g2,
                            [cons[0], bad])
    # transcript splice: drop a middle link
    assert not verify_chain(pk0.delta_g1, pk0.delta_g2,
                            [cons[0], cons[2]])
    # identity-point contribution (d = 0): pairings are vacuous, so the
    # point validation must reject it (ADVICE r3 soundness finding)
    idc = copy.copy(cons[1])
    idc.d_g1 = idc.d_g2 = None
    idc.delta_g1_after = idc.delta_g2_after = None
    idc.transcript = idc.chain_hash(cons[0].transcript)
    assert not verify_chain(pk0.delta_g1, pk0.delta_g2, [cons[0], idc])
    # out-of-subgroup G2 (on the twist, order != r) must be rejected
    from test_groth16 import _find_twist_point_outside_subgroup
    h = copy.copy(cons[1])
    h.d_g2 = _find_twist_point_outside_subgroup()
    h.transcript = h.chain_hash(cons[0].transcript)
    assert not verify_chain(pk0.delta_g1, pk0.delta_g2, [cons[0], h])


def test_chain_rejects_malformed_beacon(chain):
    """Attacker-controlled beacon records must fail cleanly: huge n_iters
    (DoS) and non-hex beacons return False instead of hanging/raising."""
    import copy
    _, (pk0, _), _, cons = chain
    for bad_beacon in ("aa:64", "aa:-3", "zz:4", "aa", "aa:4:4x"):
        b = copy.copy(cons[2])
        b.beacon = bad_beacon
        b.transcript = b.chain_hash(cons[1].transcript)
        assert not verify_chain(pk0.delta_g1, pk0.delta_g2,
                                [cons[0], cons[1], b])
    # beacon value must match the published d_g1
    bad3 = copy.copy(cons[2])
    bad3.beacon = "deadbeef:4"
    bad3.transcript = bad3.chain_hash(cons[1].transcript)
    assert not verify_chain(pk0.delta_g1, pk0.delta_g2,
                            [cons[0], cons[1], bad3])


def test_chain_requires_beacon_when_asked(chain):
    _, (pk0, _), _, cons = chain
    assert not verify_chain(pk0.delta_g1, pk0.delta_g2, cons[:2],
                            check_beacon_last=True)
    assert verify_chain(pk0.delta_g1, pk0.delta_g2, cons[:2])


def test_query_scaling_check(chain):
    cs, (pk0, _), (pk3, _), _ = chain
    rng = random.Random(13)
    n_h = min(pk0.domain_n, 8)
    assert verify_query_scaling(pk0.h_query, pk3.h_query, pk0.delta_g2,
                                pk3.delta_g2, n_h,
                                rng=lambda: rng.randrange(1, host.R))
    # forged query (scaled by the wrong factor) must fail
    from zksc_tpu.ops import ec
    forged = ec.scale_points(ec.G1_OPS, pk0.h_query, 99991)
    assert not verify_query_scaling(pk0.h_query, forged, pk0.delta_g2,
                                    pk3.delta_g2, n_h,
                                    rng=lambda: rng.randrange(1, host.R))
