"""bincode v1 proof envelope: round-trip + malformed-payload rejection.

Mirrors the reference's proof wire discipline (stwo wasm_api.rs:588-601:
base64(bincode) proofs, 8 MB decode cap) for our Circle-STARK proofs.
"""
import base64

import numpy as np
import pytest

from zksc_tpu.interop import bincode as bc
from zksc_tpu.stark import prover as sp


def _tiny_stream_proof():
    from zksc_tpu.ops.ciphers import chacha20_encrypt
    key = bytes(range(32))
    nonce = bytes(range(12))
    counter0 = 1
    pt = bytes(128)
    ct = chacha20_encrypt(key, nonce, counter0, pt)
    return sp.prove_stream(key, nonce, counter0, pt, ct), (nonce, counter0,
                                                           pt, ct)


@pytest.fixture(scope="module")
def stream_proof():
    return _tiny_stream_proof()


def test_stream_roundtrip_verifies(stream_proof):
    proof, (nonce, counter0, pt, ct) = stream_proof
    raw = bc.encode_stream_proof(proof)
    p2 = bc.decode_stream_proof(raw)
    assert p2.stmt == proof.stmt
    assert p2.trace_root == proof.trace_root
    assert bc.encode_stream_proof(p2) == raw          # canonical
    assert sp.verify_stream(p2, nonce, counter0, pt, ct)


def test_envelope_dispatch(stream_proof):
    proof, (nonce, counter0, pt, ct) = stream_proof
    env = proof.to_envelope()
    assert env["protocol"] == "circle-stark"
    assert env["proof_size_bytes"] == len(base64.b64decode(env["proof"]))
    p2 = sp.StreamProof.from_json_dict(env)           # envelope form
    assert sp.verify_stream(p2, nonce, counter0, pt, ct)
    p3 = sp.StreamProof.from_json_dict(proof.to_json_dict())  # expanded form
    assert sp.verify_stream(p3, nonce, counter0, pt, ct)


def test_envelope_smaller_than_json(stream_proof):
    import json
    proof, _ = stream_proof
    raw = bc.encode_stream_proof(proof)
    js = json.dumps(proof.to_json_dict())
    assert len(raw) < 0.8 * len(js)


def test_malformed_payloads_rejected(stream_proof):
    proof, _ = stream_proof
    raw = bc.encode_stream_proof(proof)
    with pytest.raises(ValueError):
        bc.decode_stream_proof(raw[:-1])              # truncated
    with pytest.raises(ValueError):
        bc.decode_stream_proof(raw + b"\x00")         # trailing bytes
    # absurd length prefix (the nonce Vec<u8> len at offset 8) must be
    # rejected before any allocation happens
    evil = bytearray(raw)
    evil[8:16] = (2**63).to_bytes(8, "little")
    with pytest.raises(ValueError):
        bc.decode_stream_proof(bytes(evil))
    with pytest.raises(ValueError):
        bc.Reader(b"\x00" * (bc._MAX_PROOF_BYTES + 1))  # DoS cap


def test_tampered_bincode_proof_fails_verify(stream_proof):
    proof, (nonce, counter0, pt, ct) = stream_proof
    raw = bytearray(bc.encode_stream_proof(proof))
    raw[40] ^= 1                                       # inside pt_hash region
    p2 = bc.decode_stream_proof(bytes(raw))
    assert not sp.verify_stream(p2, nonce, counter0, pt, ct)
