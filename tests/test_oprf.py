"""OPRF/TOPRF host-crypto tests: curve laws, DLEQ, full threshold flow
(mirrors the reference's oprf.test.ts flow: keygen -> request -> evaluate
-> finalize, all servers in-process)."""
import random

import pytest

from zksc_tpu.oprf import babyjubjub as bjj
from zksc_tpu.oprf.mimc import mimc_hash
from zksc_tpu.oprf.oprf import (
    KeyShare, dleq_prove, dleq_verify, evaluate, finalize, generate_request,
    generate_threshold_keys, hash_to_point, lagrange_coeff, threshold_finalize,
)

RNG = random.Random(21)
rng = lambda: RNG.randrange(1, bjj.L_ORDER)


def test_curve_laws():
    p = bjj.mul(bjj.BASE, 12345)
    assert bjj.is_on_curve(p)
    assert bjj.add(p, bjj.neg(p)) == bjj.IDENTITY
    assert bjj.add(p, bjj.IDENTITY) == p
    assert bjj.mul(bjj.BASE, bjj.L_ORDER) == bjj.IDENTITY
    a, b = 777, 888
    assert bjj.add(bjj.mul(p, a), bjj.mul(p, b)) == bjj.mul(p, a + b)


def test_mimc_deterministic():
    assert mimc_hash([1, 2]) == mimc_hash([1, 2])
    assert mimc_hash([1, 2]) != mimc_hash([2, 1])
    assert 0 <= mimc_hash([123456789]) < bjj.Q


def test_dleq():
    sk = rng()
    base2 = bjj.mul(bjj.BASE, rng())
    pub1 = bjj.mul(bjj.BASE, sk)
    pub2 = bjj.mul(base2, sk)
    proof = dleq_prove(sk, bjj.BASE, pub1, base2, pub2, rng)
    assert dleq_verify(proof, bjj.BASE, pub1, base2, pub2)
    # wrong statement rejected
    assert not dleq_verify(proof, bjj.BASE, pub1, base2, bjj.mul(base2, sk + 1))


def test_single_server_oprf_deterministic_output():
    sk = rng()
    data = b"user@example.com"
    # two independent maskings must produce the same OPRF output
    req1 = generate_request(data, rng)
    req2 = generate_request(data, rng)
    assert req1.masked_point != req2.masked_point
    o1 = finalize(req1, evaluate(sk, req1.masked_point, rng))
    o2 = finalize(req2, evaluate(sk, req2.masked_point, rng))
    assert o1 == o2
    # different data -> different output
    req3 = generate_request(b"other@example.com", rng)
    o3 = finalize(req3, evaluate(sk, req3.masked_point, rng))
    assert o3 != o1


def test_oprf_rejects_bad_dleq():
    sk = rng()
    req = generate_request(b"x", rng)
    resp = evaluate(sk, req.masked_point, rng)
    resp.dleq.r = (resp.dleq.r + 1) % bjj.L_ORDER
    with pytest.raises(ValueError):
        finalize(req, resp)


def test_threshold_flow_matches_single():
    """5 shares, threshold 1 (mirrors oprf.test.ts: 2 shares recombine)."""
    n, t = 5, 1
    master_pub, shares = generate_threshold_keys(n, t, rng)
    data = b"someone@reclaim.example"
    req = generate_request(data, rng)
    chosen = [shares[1], shares[3]]          # any t+1 shares
    responses = {s.index: evaluate(s.secret, req.masked_point, rng)
                 for s in chosen}
    out = threshold_finalize(req, responses)
    # compare against a different share subset
    chosen2 = [shares[0], shares[4]]
    req2 = generate_request(data, rng)
    responses2 = {s.index: evaluate(s.secret, req2.masked_point, rng)
                  for s in chosen2}
    out2 = threshold_finalize(req2, responses2)
    assert out == out2

    # lagrange sanity: reconstruct sk at x=0
    idx = [s.index for s in chosen]
    sk0 = sum(lagrange_coeff(idx, s.index) * s.secret for s in chosen) % bjj.L_ORDER
    assert bjj.mul(bjj.BASE, sk0) == master_pub
