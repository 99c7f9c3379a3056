"""AES-CTR R1CS circuit: constraint satisfaction against real cipher data."""
import pytest

from zksc_tpu.ops.ciphers import aes_ctr_encrypt
from zksc_tpu.r1cs import check_witness, compile_circuit, generate_witness
from zksc_tpu.r1cs.circuits import aes as ac


@pytest.mark.parametrize("key_bits", [128, 256])
def test_aes_witness_satisfies(key_bits):
    blocks = 1
    define = ac.make_define(blocks, key_bits)
    pub_l = ac.public_layout(blocks)
    priv_l = ac.private_layout(blocks, key_bits)
    cs = compile_circuit(define, pub_l, priv_l)
    assert cs.n_public == blocks * (32 + 96 + 128 + 128)

    key = bytes(range(key_bits // 8))
    nonce = bytes.fromhex("00112233445566778899aabb")
    pt = bytes(range(16))
    ct = aes_ctr_encrypt(key, nonce, 2, pt)
    pub, priv = ac.witness_inputs([key], [[(nonce, 2)]], [[ct]], [[pt]], blocks)
    w = generate_witness(define, pub_l, priv_l, pub, priv, batch=1)
    assert check_witness(cs, w)

    # wrong key must fail
    pub2, priv2 = ac.witness_inputs([bytes(key_bits // 8)], [[(nonce, 2)]],
                                    [[ct]], [[pt]], blocks)
    w2 = generate_witness(define, pub_l, priv_l, pub2, priv2, batch=1)
    assert not check_witness(cs, w2)


def test_aes128_counts():
    cs = compile_circuit(ac.make_define(1, 128), ac.public_layout(1),
                         ac.private_layout(1, 128))
    # ~185 constraints/sbox (carryless-mul inverse check) * 200 sboxes + linear
    assert 25000 < cs.n_constraints < 45000
