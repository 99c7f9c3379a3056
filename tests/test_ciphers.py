"""Cipher kernel tests against standard vectors (RFC 7539, FIPS 197 / SP 800-38A).

Oracle pattern per SURVEY.md §4.2: standard KATs are the independent oracle.
"""
import jax.numpy as jnp
import numpy as np

from zksc_tpu.ops.ciphers import (
    AES_GF_INV, AES_SBOX, aes_ctr_encrypt, aes_ctr_keystream, aes_expand_key,
    aes_encrypt_blocks, chacha20_encrypt, chacha20_keystream,
)


def test_chacha20_rfc7539_block():
    # RFC 7539 §2.3.2 test vector
    key = bytes(range(32))
    nonce = bytes.fromhex("000000090000004a00000000")
    ks = chacha20_keystream(
        jnp.asarray(np.frombuffer(key, np.uint8))[None, :],
        jnp.asarray(np.frombuffer(nonce, np.uint8))[None, :],
        jnp.asarray([1], dtype=jnp.uint32),
    )
    expected = bytes.fromhex(
        "10f1e7e4d13b5915500fdd1fa32071c4c7d1f4c733c068030422aa9ac3d46c4e"
        "d2826446079faa0914c2d705d98b02a2b5129cd1de164eb9cbd083e8a2503c4e")
    assert bytes(np.asarray(ks)[0].tobytes()) == expected


def test_chacha20_rfc7539_encrypt():
    # RFC 7539 §2.4.2: "Ladies and Gentlemen..." with counter=1
    key = bytes(range(32))
    nonce = bytes.fromhex("000000000000004a00000000")
    plaintext = (b"Ladies and Gentlemen of the class of '99: If I could offer you "
                 b"only one tip for the future, sunscreen would be it.")
    ct = chacha20_encrypt(key, nonce, 1, plaintext)
    expected = bytes.fromhex(
        "6e2e359a2568f98041ba0728dd0d6981e97e7aec1d4360c20a27afccfd9fae0b"
        "f91b65c5524733ab8f593dabcd62b3571639d624e65152ab8f530c359f0861d8"
        "07ca0dbf500d6a6156a38e088a22b65e52bc514d16ccf806818ce91ab7793736"
        "5af90bbf74a35be6b40b8eedf2785e42874d")
    assert ct == expected
    # decrypt round-trip
    assert chacha20_encrypt(key, nonce, 1, ct) == plaintext


def test_chacha20_multiblock_counters():
    """Keystream for counter c+1 must equal block 2 of a 2-block stream."""
    key = bytes(range(32))
    nonce = b"\x01" * 12
    two = chacha20_encrypt(key, nonce, 7, bytes(128))
    second = chacha20_encrypt(key, nonce, 8, bytes(64))
    assert two[64:] == second


def test_aes_sbox_fips197():
    assert AES_SBOX[0x00] == 0x63
    assert AES_SBOX[0x01] == 0x7C
    assert AES_SBOX[0x53] == 0xED
    assert AES_SBOX[0xFF] == 0x16
    # GF inverse sanity: gf_inv consistent with sbox construction
    assert AES_GF_INV[1] == 1
    assert AES_GF_INV[0] == 0


def test_aes128_fips197_block():
    # FIPS 197 Appendix B
    key = bytes.fromhex("2b7e151628aed2a6abf7158809cf4f3c")
    pt = bytes.fromhex("3243f6a8885a308d313198a2e0370734")
    rks = jnp.asarray(aes_expand_key(np.frombuffer(key, np.uint8)))
    out = aes_encrypt_blocks(jnp.asarray(np.frombuffer(pt, np.uint8))[None, :], rks)
    assert bytes(np.asarray(out)[0].tobytes()) == bytes.fromhex(
        "3925841d02dc09fbdc118597196a0b32")


def test_aes256_fips197_expansion_and_block():
    # FIPS 197 Appendix C.3
    key = bytes.fromhex(
        "603deb1015ca71be2b73aef0857d77811f352c073b6108d72d9810a30914dff4")
    pt = bytes.fromhex("00112233445566778899aabbccddeeff")
    key256 = bytes.fromhex("000102030405060708090a0b0c0d0e0f"
                           "101112131415161718191a1b1c1d1e1f")
    rks = jnp.asarray(aes_expand_key(np.frombuffer(key256, np.uint8)))
    out = aes_encrypt_blocks(jnp.asarray(np.frombuffer(pt, np.uint8))[None, :], rks)
    assert bytes(np.asarray(out)[0].tobytes()) == bytes.fromhex(
        "8ea2b7ca516745bfeafc49904b496089")
    # expansion spot checks (C.3 schedule)
    ek = aes_expand_key(np.frombuffer(key, np.uint8))
    assert ek.shape == (15, 16)


def test_aes_ctr_sp80038a():
    # NIST SP 800-38A F.5.1 CTR-AES128: note SP800-38A uses a full 16-byte
    # counter block; our layout is nonce(12) || BE32(counter), so take the
    # first 12 bytes as nonce and the last 4 as the starting counter.
    key = bytes.fromhex("2b7e151628aed2a6abf7158809cf4f3c")
    init_block = bytes.fromhex("f0f1f2f3f4f5f6f7f8f9fafbfcfdfeff")
    nonce, ctr = init_block[:12], int.from_bytes(init_block[12:], "big")
    pt = bytes.fromhex("6bc1bee22e409f96e93d7e117393172a"
                       "ae2d8a571e03ac9c9eb76fac45af8e51")
    ct = aes_ctr_encrypt(key, nonce, ctr, pt)
    assert ct == bytes.fromhex("874d6191b620e3261bef6864990db6ce"
                               "9806f66b7970fdff8617187bb9fffdff")
    assert aes_ctr_encrypt(key, nonce, ctr, ct) == pt


def test_aes_ctr_per_lane_counters():
    key = bytes.fromhex("2b7e151628aed2a6abf7158809cf4f3c")
    nonce = b"\x02" * 12
    nb = jnp.broadcast_to(jnp.asarray(np.frombuffer(nonce, np.uint8)), (3, 12))
    ks = aes_ctr_keystream(key, nb, jnp.asarray([5, 6, 7], dtype=jnp.uint32))
    stream = aes_ctr_encrypt(key, nonce, 5, bytes(48))
    assert bytes(np.asarray(ks).tobytes()) == stream
