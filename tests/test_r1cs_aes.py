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


def test_sbox_zero_hint_forgery_rejected(monkeypatch):
    """Regression (advisor r1 high): inv(0)'s hinted bits were unconstrained
    (x==0 kills the carryless product check for ANY v), letting a prover claim
    S(0) != 0x63. The v_spread*z==0 binding must reject a forged hint."""
    import numpy as np

    pub_l = [("x", 8), ("s", 8)]

    def define(api, v):
        for b in v["x"]:
            api.assert_bool(b)
        out = ac._sbox(api, v["x"])
        for o, sb in zip(out, v["s"]):
            api.assert_eq(o, sb)

    cs = compile_circuit(define, pub_l, [])

    def forged_hint(x_vals):
        # claim inv(0) = 5 instead of 0
        outs = [np.asarray([(5 >> i) & 1 for _ in x_vals], dtype=object)
                for i in range(8)]
        outs.append(np.asarray([1 for _ in x_vals], dtype=object))
        return outs

    # forged output byte = affine(5); compute it with plain ints
    v = 5
    forged_s = 0
    for i in range(8):
        bit = ((v >> i) ^ (v >> ((i + 4) % 8)) ^ (v >> ((i + 5) % 8))
               ^ (v >> ((i + 6) % 8)) ^ (v >> ((i + 7) % 8)) ^ (0x63 >> i)) & 1
        forged_s |= bit << i
    assert forged_s != 0x63

    from zksc_tpu.r1cs.tape import clear_tape_cache
    monkeypatch.setattr(ac, "_sbox_hint", forged_hint)
    clear_tape_cache()      # tapes capture hint callables at build time
    pub = {"x": [[0]] * 8, "s": [[(forged_s >> i) & 1] for i in range(8)]}
    w = generate_witness(define, pub_l, [], pub, {}, batch=1)
    assert not check_witness(cs, w)

    # and the honest witness (real hint) still satisfies
    monkeypatch.undo()
    clear_tape_cache()
    pub_ok = {"x": [[0]] * 8, "s": [[(0x63 >> i) & 1] for i in range(8)]}
    w_ok = generate_witness(define, pub_l, [], pub_ok, {}, batch=1)
    assert check_witness(cs, w_ok)


def test_aes128_counts():
    cs = compile_circuit(ac.make_define(1, 128), ac.public_layout(1),
                         ac.private_layout(1, 128))
    # ~185 constraints/sbox (carryless-mul inverse check) * 200 sboxes + linear
    assert 25000 < cs.n_constraints < 45000
