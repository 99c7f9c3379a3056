"""ChaCha20 R1CS circuit: constraint satisfaction against real cipher data."""
import numpy as np

from zksc_tpu.ops.ciphers import chacha20_encrypt
from zksc_tpu.r1cs import check_witness, compile_circuit, generate_witness
from zksc_tpu.r1cs.circuits import chacha20 as cc


def _build(blocks=1):
    return compile_circuit(cc.make_define(blocks), cc.public_layout(blocks),
                           cc.private_layout(blocks))


def test_compile_counts():
    cs = _build(blocks=1)
    # per block ~22.2K constraints + 256 key booleanity
    assert 20000 < cs.n_constraints < 25000
    assert cs.n_public == 32 + 96 + 512 + 512
    cs2 = _build(blocks=2)
    assert cs2.n_constraints > 2 * cs.n_constraints - 300
    assert cs2.digest() != cs.digest()


def test_witness_satisfies():
    blocks = 1
    cs = _build(blocks)
    key = bytes(range(32))
    nonce = bytes.fromhex("000000090000004a00000000")
    pt = bytes(range(64, 128))
    ct = chacha20_encrypt(key, nonce, 7, pt)
    # batch lane 2 with different data
    key2 = bytes(reversed(range(32)))
    ct2 = chacha20_encrypt(key2, nonce, 7, pt)
    pub2, priv2 = cc.witness_inputs([key, key2],
                                    [[(nonce, 7)], [(nonce, 7)]],
                                    [[ct], [ct2]], [[pt], [pt]], blocks)
    w = generate_witness(cc.make_define(blocks), cc.public_layout(blocks),
                         cc.private_layout(blocks), pub2, priv2, batch=2)
    assert w.shape[0] == cs.n_wires
    assert check_witness(cs, w)


def test_witness_rejects_wrong_key():
    blocks = 1
    cs = _build(blocks)
    key = bytes(range(32))
    bad_key = bytes(32)
    nonce = bytes(12)
    pt = bytes(64)
    ct = chacha20_encrypt(key, nonce, 1, pt)
    pub, priv = cc.witness_inputs([bad_key], [[(nonce, 1)]], [[ct]], [[pt]], blocks)
    w = generate_witness(cc.make_define(blocks), cc.public_layout(blocks),
                         cc.private_layout(blocks), pub, priv, batch=1)
    assert not check_witness(cs, w)


def test_bits_roundtrip():
    data = bytes(range(64))
    assert cc.bits_to_bytes(cc.bytes_to_bits(data)) == data
