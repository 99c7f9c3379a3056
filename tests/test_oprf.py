"""OPRF/TOPRF host-crypto tests: curve laws, gnark-parity MiMC, DLEQ, full
threshold flow (mirrors the reference's oprf.test.ts flow: keygen -> request
-> evaluate -> finalize, all servers in-process)."""
import random

import pytest

from zksc_tpu.oprf import babyjubjub as bjj
from zksc_tpu.oprf.mimc import (
    CONSTANTS, N_ROUNDS, Q, int_bytes, mimc_encrypt, mimc_hash,
    mimc_hash_bytes,
)
from zksc_tpu.oprf.oprf import (
    KeyShare, dleq_prove, dleq_verify, evaluate, finalize, generate_request,
    generate_threshold_keys, hash_to_point, lagrange_coeff,
    split_secret_elements, threshold_finalize,
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


def test_mimc_gnark_structure():
    """gnark-crypto parity invariants: 110 keccak-chain constants, x^5 rounds,
    Miyaguchi-Preneel chaining h' = E_h(m) + h + m."""
    from zksc_tpu.utils.keccak import keccak256
    assert N_ROUNDS == 110 and len(CONSTANTS) == 110
    x = keccak256(b"seed")
    x = keccak256(x)
    assert CONSTANTS[0] == int.from_bytes(x, "big") % Q
    x = keccak256(x)
    assert CONSTANTS[1] == int.from_bytes(x, "big") % Q
    # chaining identity
    m1, m2 = 123, 456
    h1 = (mimc_encrypt(m1, 0) + m1) % Q
    h2 = (mimc_encrypt(m2, h1) + h1 + m2) % Q
    assert mimc_hash([m1, m2]) == h2


def test_mimc_byte_semantics():
    """gnark hasher Write: short writes left-pad to one 32-byte block;
    non-canonical blocks rejected; empty chunk hashes as a zero byte."""
    assert mimc_hash_bytes(b"\x01") == mimc_hash([1])
    assert mimc_hash_bytes((2).to_bytes(32, "big"), b"\x03") == mimc_hash([2, 3])
    assert mimc_hash_bytes(b"") == mimc_hash([0])
    with pytest.raises(ValueError):
        mimc_hash_bytes(Q.to_bytes(32, "big"))
    assert int_bytes(0) == b"" and int_bytes(256) == b"\x01\x00"


def test_secret_element_encoding_little_endian():
    """Reference BEtoLE: each 31-byte chunk is interpreted little-endian
    (gnark/utils/oprf.go:44-50)."""
    s = split_secret_elements(b"\x01\x02")
    assert s == [0x0201, 0]
    long = bytes(range(40))
    s0, s1 = split_secret_elements(long)
    assert s0 == int.from_bytes(long[:31], "little")
    assert s1 == int.from_bytes(long[31:], "little")
    with pytest.raises(ValueError):
        split_secret_elements(bytes(63))


def test_dleq():
    sk = rng()
    H = bjj.mul(bjj.BASE, rng())
    xG = bjj.mul(bjj.BASE, sk)
    xH = bjj.mul(H, sk)
    proof = dleq_prove(sk, H, rng)
    assert dleq_verify(proof, xG, xH, H)
    # wrong statement rejected
    assert not dleq_verify(proof, xG, bjj.mul(H, sk + 1), H)
    # tampered response scalar rejected
    proof.r = (proof.r + 1) % bjj.L_ORDER
    assert not dleq_verify(proof, xG, xH, H)


def test_single_server_oprf_deterministic_output():
    sk = rng()
    data = b"user@example.com"
    dom = b"test-domain"
    # two independent maskings must produce the same OPRF output
    req1 = generate_request(data, rng, domain_separator=dom)
    req2 = generate_request(data, rng, domain_separator=dom)
    assert req1.masked_point != req2.masked_point
    o1 = finalize(req1, evaluate(sk, req1.masked_point, rng))
    o2 = finalize(req2, evaluate(sk, req2.masked_point, rng))
    assert o1 == o2
    # different data -> different output
    req3 = generate_request(b"other@example.com", rng, domain_separator=dom)
    o3 = finalize(req3, evaluate(sk, req3.masked_point, rng))
    assert o3 != o1
    # different domain separator -> different point and output
    assert hash_to_point(data, dom) != hash_to_point(data, b"other-domain")


def test_oprf_rejects_bad_dleq():
    sk = rng()
    req = generate_request(b"x", rng)
    resp = evaluate(sk, req.masked_point, rng)
    resp.dleq.r = (resp.dleq.r + 1) % bjj.L_ORDER
    with pytest.raises(ValueError):
        finalize(req, resp)


def test_threshold_flow_matches_single():
    """5 nodes, threshold 2 (any 2 shares recombine — reference semantics:
    threshold IS the recombination count, toprf.go:20-55)."""
    n, t = 5, 2
    master_pub, shares = generate_threshold_keys(n, t, rng)
    data = b"someone@reclaim.example"
    req = generate_request(data, rng)
    chosen = [shares[1], shares[3]]
    responses = {s.index: evaluate(s.secret, req.masked_point, rng)
                 for s in chosen}
    out = threshold_finalize(req, responses, server_public=master_pub)
    # compare against a different share subset
    chosen2 = [shares[0], shares[4]]
    req2 = generate_request(data, rng)
    responses2 = {s.index: evaluate(s.secret, req2.masked_point, rng)
                  for s in chosen2}
    out2 = threshold_finalize(req2, responses2, server_public=master_pub)
    assert out == out2

    # threshold output == single-server output with the master secret
    sk0 = sum(lagrange_coeff([s.index for s in chosen], s.index) * s.secret
              for s in chosen) % bjj.L_ORDER
    assert bjj.mul(bjj.BASE, sk0) == master_pub
    req3 = generate_request(data, rng)
    out3 = finalize(req3, evaluate(sk0, req3.masked_point, rng))
    assert out3 == out

    # wrong share set claiming the master key is rejected
    bad = {shares[0].index: responses2[shares[0].index]}
    with pytest.raises(ValueError):
        threshold_finalize(req2, bad, server_public=master_pub)
