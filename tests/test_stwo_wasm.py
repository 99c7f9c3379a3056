"""The REFERENCE stwo backend, executed natively as an in-process oracle.

resources/stwo/s2circuits_bg.wasm is the reference's actual Circle-STARK
prover/verifier (rust → wasm-bindgen). Running it under our WASM VM gives
the cross-validation oracle SURVEY.md §4.3 calls for: the reference's own
keystream, circuit shapes, prover and verifier are invokable from tests —
including its negative paths (tampered inputs must fail with stwo's own
error taxonomy, e.g. OodsNotMatching).
"""
import os
import secrets

import pytest

_RES = os.environ.get("ZKSC_REFERENCE_RESOURCES", "/root/reference/resources")

pytestmark = pytest.mark.skipif(
    not os.path.exists(os.path.join(_RES, "stwo", "s2circuits_bg.wasm")),
    reason="reference stwo wasm not present")


@pytest.fixture(scope="module")
def stwo():
    from zksc_tpu.interop.stwo_wasm import load_reference_stwo
    return load_reference_stwo()


def test_circuits_info(stwo):
    info = stwo.get_circuits_info()
    # the reference's exact AIR shapes (stwo wasm_api.rs get_circuits_info)
    assert info["chacha20"]["cols"] == 33280
    assert info["chacha20"]["constraints"] == 54784
    assert info["chacha20"]["block_bytes"] == 64
    assert info["aes128_ctr"]["constraints"] == 34464
    assert info["aes256_ctr"]["constraints"] == 49024


def test_keystream_matches_native_cipher(stwo):
    from zksc_tpu.ops.ciphers import chacha20_encrypt
    key, nonce = secrets.token_bytes(32), secrets.token_bytes(12)
    ks = stwo.debug_chacha20_keystream(key, nonce, 1)
    ref = bytes.fromhex(ks["keystream_hex"])
    ours = chacha20_encrypt(key, nonce, 1, bytes(len(ref)))
    assert ref == ours


def test_reference_prove_verify_roundtrip(stwo):
    """Full reference Circle-STARK prove+verify (~30 s + ~6 s interpreted)
    plus its tampered-ciphertext rejection path."""
    from zksc_tpu.ops.ciphers import chacha20_encrypt
    key, nonce = secrets.token_bytes(32), secrets.token_bytes(12)
    pt = secrets.token_bytes(128)
    ct = chacha20_encrypt(key, nonce, 1, pt)
    res = stwo.generate_chacha20_proof(key, nonce, 1, pt, ct)
    assert res.get("success"), res
    assert res["algorithm"] == "chacha20"
    v = stwo.verify_chacha20_proof(res["proof"], nonce, 1, pt, ct)
    assert v.get("valid") is True, v
    bad = bytearray(ct)
    bad[3] ^= 1
    v2 = stwo.verify_chacha20_proof(res["proof"], nonce, 1, pt, bytes(bad))
    assert v2.get("valid") is not True


def test_reference_rejects_wrong_witness(stwo):
    """ct != chacha(pt) must be rejected at trace-gen time by the
    reference's own validity check (gen_stream.rs invalid-witness path)."""
    key, nonce = secrets.token_bytes(32), secrets.token_bytes(12)
    pt = secrets.token_bytes(128)
    res = stwo.generate_chacha20_proof(key, nonce, 1, pt,
                                       secrets.token_bytes(128))
    assert not res.get("success", False)


@pytest.mark.skipif(os.environ.get("ZKSC_RUN_SLOW") != "1",
                    reason="AES stwo prove is ~2 min interpreted")
def test_reference_aes128_prove_verify(stwo):
    from zksc_tpu.ops.ciphers import aes_ctr_encrypt
    key, nonce = secrets.token_bytes(16), secrets.token_bytes(12)
    pt = secrets.token_bytes(80)
    ct = aes_ctr_encrypt(key, nonce, 2, pt)
    res = stwo.generate_aes_ctr_proof(16, key, nonce, 2, pt, ct)
    assert res.get("success"), res
    v = stwo.verify_aes_ctr_proof(res["proof"], nonce, 2, pt, ct)
    assert v.get("valid") is True, v
