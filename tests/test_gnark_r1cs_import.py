"""Import the reference's exact gnark R1CS binaries and prove we can drive
them: parse, solve a real ChaCha20 witness through the imported constraint
system, and check every constraint (SURVEY.md §2.5 items 3/8; the reference
loads these same files in gnark/libraries/prover/impl/library.go:105-133).

The reference checkout ships resources/gnark/r1cs.{chacha20,aes128,aes256};
these tests are skipped when that checkout is absent.
"""
import os
import secrets

import numpy as np
import pytest

from zksc_tpu.interop.gnark_r1cs import (
    GnarkR1CS, HINT_NBITS, TAG_GENERIC_R1C, parse_r1cs,
)
from zksc_tpu.ops.ciphers import chacha20_encrypt

REF = os.environ.get("ZKSC_REFERENCE_DIR", "/root/reference")
R1CS_DIR = os.path.join(REF, "resources", "gnark")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(R1CS_DIR), reason="reference gnark artifacts not present")


def _load(name: str) -> GnarkR1CS:
    return parse_r1cs(os.path.join(R1CS_DIR, f"r1cs.{name}"))


def test_parse_all_reference_r1cs():
    expected = {
        # (nb_constraints, nb_public incl. one-wire, nb_secret)
        "chacha20": (46912, 2305, 256),
        "aes128": (85955, 226, 16),
        "aes256": (116501, 226, 32),
    }
    for name, (nc, npub, nsec) in expected.items():
        cs = _load(name)
        assert cs.gnark_version == "0.14.0"
        assert cs.nb_constraints == nc
        assert (cs.nb_public, cs.nb_secret) == (npub, nsec)
        # every instruction's calldata record parses and lands back-to-back
        n_r1c = sum(1 for kind, _ in cs.instructions() if kind == "r1c")
        assert n_r1c == nc
        # constraint offsets are the exclusive prefix count of R1Cs
        is_r1c = np.array([k == "r1c" for k, _ in cs.instructions()])
        want = np.concatenate([[0], np.cumsum(is_r1c)[:-1]])
        assert np.array_equal(cs.constraint_offsets, want)
        # levels partition the instruction list exactly
        flat = np.concatenate(cs.levels) if cs.levels else np.array([])
        assert len(flat) == cs.n_instructions
        assert len(np.unique(flat)) == cs.n_instructions


def _chacha_assignment(cs: GnarkR1CS, key: bytes, nonce: bytes,
                       counter: int, ciphertext: bytes):
    """Build name->bit assignments per the reference prover's bit orders
    (gnark/libraries/prover/impl/provers.go:152-174: key/nonce LE u32 words,
    counter raw u32, in/out BE u32 words; all bits LSB-first)."""
    blocks = 2
    plaintext = b"".join(
        chacha20_encrypt(key, nonce, counter + b,
                         ciphertext[64 * b:64 * (b + 1)])
        for b in range(blocks))

    def le_words(data):
        return [int.from_bytes(data[4 * i:4 * i + 4], "little")
                for i in range(len(data) // 4)]

    def be_words(data):
        return [int.from_bytes(data[4 * i:4 * i + 4], "big")
                for i in range(len(data) // 4)]

    key_w = le_words(key)
    nonce_w = le_words(nonce)
    in_w = be_words(ciphertext)
    out_w = be_words(plaintext)

    public, secret = {}, {}
    for name in cs.public_names[1:]:
        parts = name.split("_")
        kind, idx = parts[0], [int(x) for x in parts[1:]]
        if kind == "Counter":
            b, k = idx
            public[name] = ((counter + b) >> k) & 1
        elif kind == "Nonce":
            b, w, k = idx
            public[name] = (nonce_w[w] >> k) & 1
        elif kind == "In":
            w, k = idx[-2], idx[-1]
            if len(idx) == 3:
                w = idx[0] * 16 + idx[1]
            public[name] = (in_w[w] >> k) & 1
        elif kind == "Out":
            w, k = idx[-2], idx[-1]
            if len(idx) == 3:
                w = idx[0] * 16 + idx[1]
            public[name] = (out_w[w] >> k) & 1
        else:
            raise AssertionError(f"unexpected public wire {name}")
    for name in cs.secret_names:
        parts = name.split("_")
        assert parts[0] == "Key"
        w, k = int(parts[1]), int(parts[2])
        secret[name] = (key_w[w] >> k) & 1
    return public, secret, plaintext


def test_chacha20_witness_satisfies_imported_r1cs():
    cs = _load("chacha20")
    assert set(cs.hint_names) == {HINT_NBITS}
    key = secrets.token_bytes(32)
    nonce = secrets.token_bytes(12)
    counter = 7
    ciphertext = secrets.token_bytes(128)
    public, secret, _ = _chacha_assignment(cs, key, nonce, counter, ciphertext)
    w = cs.solve_witness(public, secret)
    assert cs.check_witness(w)


def test_chacha20_wrong_output_fails_imported_r1cs():
    cs = _load("chacha20")
    key = secrets.token_bytes(32)
    nonce = secrets.token_bytes(12)
    ciphertext = secrets.token_bytes(128)
    public, secret, _ = _chacha_assignment(cs, key, nonce, 1, ciphertext)
    # flip one Out bit: the solver must hit an unsatisfiable constraint or
    # the check must fail
    flip = next(n for n in public if n.startswith("Out"))
    public[flip] ^= 1
    try:
        w = cs.solve_witness(public, secret)
    except Exception:
        return
    assert not cs.check_witness(w)


def test_imported_r1cs_converts_to_native_constraint_system():
    cs = _load("chacha20")
    native = cs.to_constraint_system()
    assert native.n_constraints == cs.nb_constraints
    assert native.n_public == cs.nb_public - 1
    assert native.n_wires == cs.n_wires
    # spot-check: first constraint is the boolean constraint on Key_0_0
    a, b, c = native.constraints[0]
    first_secret = cs.nb_public
    assert a == {first_secret: 1}
    assert b[0] == 1 and b[first_secret] == cs.coefficients[3]  # 1 - x
    assert c == {0: 0}
