"""API layer tests: chunking, counters, public signals, envelopes; plus a
slow-gated full ChaCha20 proof round-trip (needs artifacts; set
ZKSC_RUN_SLOW=1 to run on the CPU mesh, or run bench.py on TPU)."""
import os

import pytest

from zksc_tpu import api
from zksc_tpu.config import CONFIG, get_counter_for_byte_offset
from zksc_tpu.ops.ciphers import chacha20_encrypt


def test_counter_derivation():
    assert get_counter_for_byte_offset("chacha20", 0) == 1
    assert get_counter_for_byte_offset("chacha20", 128) == 3
    assert get_counter_for_byte_offset("aes-128-ctr", 32) == 4
    with pytest.raises(ValueError):
        get_counter_for_byte_offset("chacha20", 100)


def test_generate_zk_witness_shapes():
    key, iv = bytes(32), bytes(12)
    ct = bytes(range(100))            # partial chunk
    wi = api.generate_zk_witness("chacha20", key, ct, iv)
    assert len(wi.ciphertext) == 128 and len(wi.plaintext) == 128
    assert wi.data_len == 100
    assert [b.counter for b in wi.blocks] == [1, 2]
    # plaintext prefix decrypts the data, padding region is keystream
    assert wi.plaintext[:100] == chacha20_encrypt(key, iv, 1, ct)[:100]
    with pytest.raises(ValueError):
        api.generate_zk_witness("chacha20", bytes(31), ct, iv)
    with pytest.raises(ValueError):
        api.generate_zk_witness("chacha20", key, bytes(200), iv)


def test_public_signals_layout():
    key, iv = bytes(32), bytes(12)
    ct = chacha20_encrypt(key, iv, 1, bytes(128))
    wi = api.generate_zk_witness("chacha20", key, ct, iv)
    sig = api.get_public_signals("chacha20", ct, iv, wi.plaintext)
    cfg = CONFIG["chacha20"]
    per_block = 32 + 96 + cfg.block_size_bytes * 8 * 2
    assert len(sig) == cfg.blocks_per_chunk * per_block
    assert set(sig) <= {0, 1}
    # counter bits of block 0 encode 1 (LSB-first)
    assert sig[0] == 1 and sum(sig[1:32]) == 0


def test_envelope_json_roundtrip():
    env = api.ProofEnvelope("chacha20", {"pi_a": ["1", "2", "1"]},
                            bytes(range(128)), 100)
    back = api.ProofEnvelope.from_json(env.to_json())
    assert back.algorithm == env.algorithm
    assert back.plaintext == env.plaintext
    assert back.data_len == 100


@pytest.mark.skipif(
    os.environ.get("ZKSC_RUN_SLOW") != "1"
    or not os.path.exists(os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "artifacts", "chacha20", "pk_meta.json")),
    reason="full chacha proof is minutes-long on the CPU mesh; "
           "set ZKSC_RUN_SLOW=1 (bench.py covers this on TPU)")
def test_full_chacha_proof_roundtrip():
    import secrets
    key, iv = secrets.token_bytes(32), secrets.token_bytes(12)
    data = secrets.token_bytes(128)
    proof = api.generate_proof("chacha20", key, data, iv)
    assert api.verify_proof(proof, data, iv)
    # tamper: flip one ciphertext byte
    bad = bytes([data[0] ^ 1]) + data[1:]
    assert not api.verify_proof(proof, bad, iv)


def test_algorithms_info():
    info = api.get_algorithms_info()
    assert set(info) == {"chacha20", "aes-128-ctr", "aes-256-ctr",
                         "chacha20-toprf", "aes-128-ctr-toprf",
                         "aes-256-ctr-toprf"}
    assert info["chacha20-toprf"]["n_constraints"] > \
        info["chacha20"]["n_constraints"]
    cc = info["chacha20"]
    assert cc["n_constraints"] == 44608 and cc["domain_n"] == 65536
    assert cc["chunk_size_bytes"] == 128 and len(cc["digest"]) == 64
    assert info["aes-128-ctr"]["n_constraints"] > 100000
