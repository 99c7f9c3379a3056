"""Native WASM VM executing the REFERENCE's circom witness generators.

Cross-validation oracle (SURVEY.md §4.3): the reference's circuit.wasm
(circom-compiled, js/src/snarkjs/operator.ts:54-106) is executed in our C++
interpreter and its witness output compared bit-for-bit against our native
cipher kernels — proving witness-gen semantic parity (bit orders, counter
handling) with the snarkjs engine.
"""
import os
import secrets

import pytest

_RES = os.environ.get("ZKSC_REFERENCE_RESOURCES", "/root/reference/resources")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(_RES, "snarkjs")),
    reason="reference snarkjs resources not present")


def _calc(alg):
    from zksc_tpu.interop.circom_wasm import load_reference_calculator
    return load_reference_calculator(alg)


def _chacha_bits(b):
    from zksc_tpu.interop.circom_wasm import _chacha_bits
    return _chacha_bits(b)


def _be_bits(b):
    from zksc_tpu.interop.circom_wasm import _be_bits
    return _be_bits(b)


def test_chacha20_witness_matches_native_cipher():
    from zksc_tpu.ops.ciphers import chacha20_encrypt
    wc = _calc("chacha20")
    assert wc.version == 2
    assert wc.n_inputs == 256 + 96 + 32 + 1024
    key, nonce = secrets.token_bytes(32), secrets.token_bytes(12)
    pt = secrets.token_bytes(128)
    ct = chacha20_encrypt(key, nonce, 1, pt)
    w = wc.calculate_witness({
        "key": _chacha_bits(key), "nonce": _chacha_bits(nonce),
        "counter": [(1 >> (31 - j)) & 1 for j in range(32)],
        "in": _chacha_bits(ct)})
    assert w[0] == 1
    assert w[1:1025] == _chacha_bits(pt)


def test_repeated_calculations_on_cached_calculator():
    """circom_runtime re-issues init(sanityCheck) per calculation; a cached
    calculator must therefore support back-to-back witness computations
    (regression: second call used to fail with 'Too many signals set')."""
    from zksc_tpu.ops.ciphers import chacha20_encrypt
    wc = _calc("chacha20")
    for _ in range(2):
        key, nonce = secrets.token_bytes(32), secrets.token_bytes(12)
        pt = secrets.token_bytes(128)
        ct = chacha20_encrypt(key, nonce, 1, pt)
        w = wc.calculate_witness({
            "key": _chacha_bits(key), "nonce": _chacha_bits(nonce),
            "counter": [(1 >> (31 - j)) & 1 for j in range(32)],
            "in": _chacha_bits(ct)})
        assert w[1:1025] == _chacha_bits(pt)


def test_aes128_witness_matches_native_cipher():
    from zksc_tpu.ops.ciphers import aes_ctr_encrypt
    wc = _calc("aes-128-ctr")
    key, nonce = secrets.token_bytes(16), secrets.token_bytes(12)
    pt = secrets.token_bytes(80)
    ct = aes_ctr_encrypt(key, nonce, 2, pt)
    w = wc.calculate_witness({
        "key": _be_bits(key), "nonce": _be_bits(nonce),
        "counter": [(2 >> (31 - j)) & 1 for j in range(32)],
        "in": _be_bits(ct)})
    assert w[1:641] == _be_bits(pt)


def test_reference_witness_from_proof_input_and_wtns_roundtrip():
    from zksc_tpu import api
    from zksc_tpu.interop.circom_wasm import reference_witness
    from zksc_tpu.interop.snarkjs import read_wtns, write_wtns
    from zksc_tpu.ops.ciphers import chacha20_encrypt
    key, iv = secrets.token_bytes(32), secrets.token_bytes(12)
    pt = secrets.token_bytes(128)
    ct = chacha20_encrypt(key, iv, 1, pt)
    wi = api.generate_zk_witness("chacha20", key=key, ciphertext=ct, iv=iv)
    w = reference_witness(wi)
    assert w[1:1025] == _chacha_bits(wi.plaintext)
    assert read_wtns(write_wtns(w)) == w


def test_wrong_key_fails_sanity_check():
    """The calculator's constraint sanity check (init(1)) must reject a
    witness built from the wrong key — exercised through the interpreter's
    runtime.exceptionHandler import path."""
    from zksc_tpu.interop.circom_wasm import CircomWasmError
    from zksc_tpu.ops.ciphers import chacha20_encrypt
    wc = _calc("chacha20")
    key, nonce = secrets.token_bytes(32), secrets.token_bytes(12)
    pt = secrets.token_bytes(128)
    ct = chacha20_encrypt(key, nonce, 1, pt)
    # the circuit has no key-vs-output constraint by itself (out is computed
    # FROM key), so instead corrupt an input signal count: missing signals
    # must be detected
    with pytest.raises(CircomWasmError):
        wc.calculate_witness({
            "key": _chacha_bits(key), "nonce": _chacha_bits(nonce),
            "counter": [(1 >> (31 - j)) & 1 for j in range(32)]})


def test_unknown_signal_rejected():
    """An input name the circuit does not declare must trap via the
    calculator's exceptionHandler (error 1: signal not found)."""
    from zksc_tpu.interop.circom_wasm import CircomWasmError
    wc = _calc("chacha20")
    with pytest.raises(CircomWasmError):
        wc.calculate_witness({"no_such_signal": [0]})


def test_non_bit_input_never_yields_valid_witness():
    """A 2 in a bit slot either trips the sanity check or corrupts the
    output — it must never produce the true plaintext bits. (The legacy
    circom circuit does not boolean-constrain inputs — readme.md:26 calls
    it out — so the assert fires only when a violated carry constraint is
    reached; both outcomes are sound here.)"""
    from zksc_tpu.interop.circom_wasm import CircomWasmError
    from zksc_tpu.ops.ciphers import chacha20_encrypt
    wc = _calc("chacha20")
    key, nonce = secrets.token_bytes(32), secrets.token_bytes(12)
    pt = secrets.token_bytes(128)
    ct = chacha20_encrypt(key, nonce, 1, pt)
    bad_key = _chacha_bits(key)
    bad_key[0] ^= 3                    # 0->3 or 1->2: non-bit either way
    try:
        w = wc.calculate_witness({
            "key": bad_key, "nonce": _chacha_bits(nonce),
            "counter": [(1 >> (31 - j)) & 1 for j in range(32)],
            "in": _chacha_bits(ct)})
    except CircomWasmError:
        return                         # sanity check fired: good
    assert w[1:1025] != _chacha_bits(pt)
