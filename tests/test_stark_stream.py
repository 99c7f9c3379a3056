"""Circle-STARK ChaCha stream engine: prove/verify + security negatives.

Ports the reference's stwo security test strategy (SURVEY.md §4: full
prove+verify round-trip, tampered embedded public inputs must fail, wrong
verifier-supplied inputs must fail, invalid witness rejected at trace gen —
stwo air_stream.rs:433-641 behaviors, tests re-designed for this protocol).
"""
import secrets

import pytest

from zksc_tpu.ops.ciphers import chacha20_encrypt
from zksc_tpu.stark import prover as sp

KEY = bytes(range(32))
NONCE = bytes.fromhex("000000090000004a00000000")
PT = secrets.token_bytes(128)
CT = chacha20_encrypt(KEY, NONCE, 1, PT)


@pytest.fixture(scope="module")
def proof():
    return sp.prove_stream(KEY, NONCE, 1, PT, CT)


def test_prove_verify_roundtrip(proof):
    assert sp.verify_stream(proof, NONCE, 1, PT, CT)


def test_json_roundtrip(proof):
    import json
    d = json.loads(json.dumps(proof.to_json_dict()))
    p2 = sp.StreamProof.from_json_dict(d)
    assert sp.verify_stream(p2, NONCE, 1, PT, CT)


def test_wrong_verifier_inputs_fail(proof):
    bad_ct = bytearray(CT)
    bad_ct[17] ^= 1
    assert not sp.verify_stream(proof, NONCE, 1, PT, bytes(bad_ct))
    bad_pt = bytearray(PT)
    bad_pt[3] ^= 0x80
    assert not sp.verify_stream(proof, NONCE, 1, bytes(bad_pt), CT)
    assert not sp.verify_stream(proof, secrets.token_bytes(12), 1, PT, CT)
    assert not sp.verify_stream(proof, NONCE, 2, PT, CT)


def test_tampered_statement_fails(proof):
    import copy
    p = copy.deepcopy(proof)
    p.stmt.counter0 = 5
    assert not sp.verify_stream(p, NONCE, 5, PT, CT)   # transcript mismatch
    p2 = copy.deepcopy(proof)
    p2.stmt.ct_hash = bytes(32)
    assert not sp.verify_stream(p2, NONCE, 1, PT, CT)


def test_tampered_openings_fail(proof):
    import copy
    p = copy.deepcopy(proof)
    p.openings[0].values = p.openings[0].values.copy()
    p.openings[0].values[123] ^= 1
    assert not sp.verify_stream(p, NONCE, 1, PT, CT)   # merkle path breaks


def test_invalid_witness_rejected():
    bad_ct = bytearray(CT)
    bad_ct[0] ^= 1
    with pytest.raises(AssertionError):
        sp.prove_stream(KEY, NONCE, 1, PT, bytes(bad_ct))


def test_input_validation():
    with pytest.raises(ValueError):
        sp.prove_stream(KEY[:16], NONCE, 1, PT, CT)
    with pytest.raises(ValueError):
        sp.prove_stream(KEY, NONCE, 1, PT[:100], CT[:100])
    with pytest.raises(ValueError):
        sp.prove_stream(KEY, NONCE, (1 << 32) - 2, PT, CT)  # counter overflow


def test_api_stark_engine_roundtrip():
    from zksc_tpu import api
    env = api.generate_proof("chacha20", KEY, CT, NONCE, engine="stark")
    assert api.verify_proof(env, CT, NONCE, engine="stark")
    bad = bytearray(CT)
    bad[9] ^= 1
    assert not api.verify_proof(env, bytes(bad), NONCE, engine="stark")
