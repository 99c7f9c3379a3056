"""AES-CTR LogUp AIR tests: constraint satisfaction, full prove/verify,
negative/security tests (the repo-side counterparts of stwo's
air_ctr.rs prove/verify + tamper tests and sbox_table.rs)."""
import numpy as np
import pytest

from zksc_tpu.ops import ciphers
from zksc_tpu.stark import aes_air, aes_prover
from zksc_tpu.stark.m31 import P31


def _padded_rows(key, nonce, counter0, pt, ct, rows):
    n_blocks = len(pt) // 16
    pad_ks = ciphers.aes_ctr_encrypt(key, nonce, counter0 + n_blocks,
                                     bytes(16 * (rows - n_blocks)))
    pt_rows = np.zeros((rows, 16), dtype=np.uint8)
    ct_rows = np.zeros((rows, 16), dtype=np.uint8)
    pt_rows[:n_blocks] = np.frombuffer(pt, np.uint8).reshape(-1, 16)
    ct_rows[:n_blocks] = np.frombuffer(ct, np.uint8).reshape(-1, 16)
    pt_rows[n_blocks:] = np.frombuffer(pad_ks, np.uint8).reshape(-1, 16)
    return pt_rows, ct_rows


def _constraint_vec(key_size, trace1, trace2, pub, groups, z4, a4, rows):
    vals = np.concatenate([trace1, trace2, pub,
                           np.zeros((1, rows), dtype=np.uint32)]
                          ).astype(np.uint64)
    vals_sh = vals[:, aes_air.sigma_perm(rows, 1)]
    out = []
    for r in range(rows):
        out.append(aes_prover._host_constraints(
            vals[:, r], vals_sh[:, r], groups, z4, a4))
    return np.stack(out)


Z4 = (123456789, 987654321, 192837465, 1029384756 % P31)
A4 = (111111111, 222222222, 333333333, 444444444)


@pytest.mark.parametrize("key_size", [16, 32])
def test_trace_satisfies_all_constraints(key_size):
    key = bytes(range(key_size))
    nonce = bytes(range(12))
    counter0 = 2
    rows = 256
    pt = bytes(range(48))
    ct = ciphers.aes_ctr_encrypt(key, nonce, counter0, pt)
    pt_rows, ct_rows = _padded_rows(key, nonce, counter0, pt, ct, rows)
    n1, n2, groups = aes_air.layout(key_size)
    trace1, lk_u, lk_v = aes_air.generate_trace(key, nonce, counter0,
                                                pt_rows, ct_rows)
    assert trace1.shape == (n1, rows)
    assert (lk_v == aes_air.SBOX[lk_u]).all()
    trace2 = aes_prover._interaction(lk_u, lk_v, trace1[-1].copy(),
                                     Z4, A4, rows)
    assert trace2.shape == (n2, rows)
    pub = aes_air.public_matrix(
        aes_air.public_bytes(nonce, counter0, ct_rows, rows))
    cvec = _constraint_vec(key_size, trace1, trace2, pub, groups,
                           Z4, A4, rows)
    assert not cvec.any(), f"{np.count_nonzero(cvec.any(axis=1))} rows fail"


def test_forged_sbox_breaks_constraints():
    """A tampered SubBytes output must violate the lookup constraint: the
    fraction denominator no longer matches the committed f (or, if f is
    recomputed, the LogUp balance/cum chain breaks)."""
    key = bytes(range(16))
    nonce = bytes(12)
    counter0 = 2
    rows = 256
    pt = bytes(16)
    ct = ciphers.aes_ctr_encrypt(key, nonce, counter0, pt)
    pt_rows, ct_rows = _padded_rows(key, nonce, counter0, pt, ct, rows)
    n1, n2, groups = aes_air.layout(16)
    trace1, lk_u, lk_v = aes_air.generate_trace(key, nonce, counter0,
                                                pt_rows, ct_rows)
    trace2 = aes_prover._interaction(lk_u, lk_v, trace1[-1].copy(),
                                     Z4, A4, rows)
    pub = aes_air.public_matrix(
        aes_air.public_bytes(nonce, counter0, ct_rows, rows))
    # flip one committed bit of the first lookup's output in row 7
    vref = int(groups["lookup"]["V"][0, 0])
    t_bad = trace1.copy()
    t_bad[vref, 7] ^= 1
    cvec = _constraint_vec(16, t_bad, trace2, pub, groups, Z4, A4, rows)
    assert cvec.any(), "forged S-box output accepted by constraints"

    # forging the fraction to match the forged output breaks the cum chain
    lk_u2 = lk_u.copy()
    lk_u2[0, 7] ^= 1            # pretend the input was different
    trace2_bad = aes_prover._interaction(lk_u2, lk_v, trace1[-1].copy(),
                                         Z4, A4, rows)
    cvec = _constraint_vec(16, trace1, trace2_bad, pub, groups, Z4, A4, rows)
    assert cvec.any()


def test_prove_verify_roundtrip_aes128():
    key = bytes(range(16))
    nonce = bytes(range(12))
    counter0 = 2
    pt = bytes(range(80))            # one 5-block chunk
    ct = ciphers.aes_ctr_encrypt(key, nonce, counter0, pt)
    proof = aes_prover.prove_aes_ctr(key, nonce, counter0, pt, ct)
    assert aes_prover.verify_aes_ctr(proof, nonce, counter0, pt, ct, 16)

    # tampered public inputs must fail (air_ctr.rs security-test parity)
    bad_ct = bytearray(ct)
    bad_ct[3] ^= 1
    assert not aes_prover.verify_aes_ctr(proof, nonce, counter0, pt,
                                         bytes(bad_ct), 16)
    bad_pt = bytearray(pt)
    bad_pt[0] ^= 1
    assert not aes_prover.verify_aes_ctr(proof, nonce, counter0,
                                         bytes(bad_pt), ct, 16)
    assert not aes_prover.verify_aes_ctr(proof, nonce, counter0 + 1, pt,
                                         ct, 16)
    assert not aes_prover.verify_aes_ctr(proof, bytes(12), counter0, pt,
                                         ct, 16)
    assert not aes_prover.verify_aes_ctr(proof, nonce, counter0, pt, ct, 32)

    # tampered proof parts must fail
    import copy
    p2 = copy.deepcopy(proof)
    p2.root2 = bytes(32)
    assert not aes_prover.verify_aes_ctr(p2, nonce, counter0, pt, ct, 16)
    p3 = copy.deepcopy(proof)
    p3.openings1[0].values[0] ^= 1
    assert not aes_prover.verify_aes_ctr(p3, nonce, counter0, pt, ct, 16)

    # serialization round-trip
    p4 = aes_prover.AesProof.from_json_dict(proof.to_json_dict())
    assert aes_prover.verify_aes_ctr(p4, nonce, counter0, pt, ct, 16)


def test_prove_rejects_bad_witness():
    key = bytes(range(16))
    nonce = bytes(range(12))
    pt = bytes(32)
    ct = ciphers.aes_ctr_encrypt(key, nonce, 2, pt)
    bad_ct = bytearray(ct)
    bad_ct[0] ^= 1
    with pytest.raises(AssertionError):
        aes_prover.prove_aes_ctr(key, nonce, 2, pt, bytes(bad_ct))
    with pytest.raises(ValueError):
        aes_prover.prove_aes_ctr(key, nonce, 2, pt, ct[:-1])
    with pytest.raises(ValueError):
        aes_prover.prove_aes_ctr(key[:-1], nonce, 2, pt, ct)
    with pytest.raises(ValueError):
        aes_prover.prove_aes_ctr(key, nonce, (1 << 32) - 4, pt, ct)


def test_sigma_perm_is_single_cycle():
    for m in (8, 64, 256):
        perm = aes_air.sigma_perm(m, 1)
        seen = set()
        cur = 0
        for _ in range(m):
            assert cur not in seen
            seen.add(cur)
            cur = int(perm[cur])
        assert cur == 0 and len(seen) == m


def test_prove_verify_roundtrip_aes256():
    """aes-256 full prove/verify + negatives (stwo/README.md:204-209
    tests both key sizes; closes the aes256-untested gap)."""
    key = bytes(range(32))
    nonce = bytes(reversed(range(12)))
    counter0 = 2
    pt = bytes((i * 3 + 1) & 0xFF for i in range(80))
    ct = ciphers.aes_ctr_encrypt(key, nonce, counter0, pt)
    proof = aes_prover.prove_aes_ctr(key, nonce, counter0, pt, ct)
    assert proof.stmt.key_size == 32
    assert aes_prover.verify_aes_ctr(proof, nonce, counter0, pt, ct, 32)

    # wrong-key-size verification must fail
    assert not aes_prover.verify_aes_ctr(proof, nonce, counter0, pt, ct, 16)
    # tampered publics must fail
    bad_ct = bytearray(ct)
    bad_ct[7] ^= 0x10
    assert not aes_prover.verify_aes_ctr(proof, nonce, counter0, pt,
                                         bytes(bad_ct), 32)
    bad_pt = bytearray(pt)
    bad_pt[79] ^= 1
    assert not aes_prover.verify_aes_ctr(proof, nonce, counter0,
                                         bytes(bad_pt), ct, 32)
    assert not aes_prover.verify_aes_ctr(proof, nonce, counter0 + 1, pt,
                                         ct, 32)
    # envelope round-trip
    from zksc_tpu.interop.bincode import proof_from_envelope
    env = proof.to_envelope()
    assert env["algorithm"] == "aes-256-ctr"
    p2 = proof_from_envelope(env)
    assert aes_prover.verify_aes_ctr(p2, nonce, counter0, pt, ct, 32)
