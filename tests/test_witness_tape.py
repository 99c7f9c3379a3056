"""Native witness-tape executor vs the exact Python witness builder
(SURVEY.md §2.5 item 3 — the reference's witness generation is native too:
gnark Go assignments, circom WASM calculator)."""
import secrets

import numpy as np
import pytest

from zksc_tpu.native import tape_lib
from zksc_tpu.r1cs import check_witness, compile_circuit
from zksc_tpu.r1cs.builder import WitnessBuilder
from zksc_tpu.r1cs.tape import build_tape

needs_native = pytest.mark.skipif(tape_lib() is None,
                                  reason="g++ / native build unavailable")


def _python_witness(define, pub_layout, priv_layout, pub_vals, priv_vals):
    api = WitnessBuilder(1)
    vars_ = {}
    for name, count in pub_layout:
        vars_[name] = [api.alloc_input(pub_vals[name][i]) for i in range(count)]
    for name, count in priv_layout:
        vars_[name] = [api.alloc_input(priv_vals[name][i]) for i in range(count)]
    define(api, vars_)
    return np.stack(api.values)


def _tape_inputs(pub_layout, priv_layout, pub, priv):
    rows = []
    for name, count in list(pub_layout) + list(priv_layout):
        vals = pub[name] if name in pub else priv[name]
        rows.extend([[int(x) for x in vals[i]] for i in range(count)])
    return np.asarray(rows, dtype=np.uint64)


def _run_both(module, define, pub_layout, priv_layout, pub, priv):
    tape = build_tape(define, pub_layout, priv_layout)
    assert tape is not None, "cipher circuits must be tape-compilable"
    w_tape = tape.execute(_tape_inputs(pub_layout, priv_layout, pub, priv))
    w_py = _python_witness(define, pub_layout, priv_layout, pub, priv)
    assert w_tape.shape == w_py.shape
    mism = [i for i in range(w_py.shape[0])
            if int(w_tape[i, 0]) != int(w_py[i, 0])]
    assert not mism, f"first mismatching wires: {mism[:10]}"
    return w_tape


@needs_native
def test_chacha_tape_matches_python_builder():
    from zksc_tpu.ops.ciphers import chacha20_encrypt
    from zksc_tpu.r1cs.circuits import chacha20 as cc
    blocks = 1
    key, nonce = secrets.token_bytes(32), secrets.token_bytes(12)
    ct = secrets.token_bytes(64)
    pt = chacha20_encrypt(key, nonce, 1, ct)
    define = cc.make_define(blocks)
    pub_l, priv_l = cc.public_layout(blocks), cc.private_layout(blocks)
    pub, priv = cc.witness_inputs([key], [[(nonce, 1)]], [[ct]], [[pt]], blocks)
    w = _run_both(cc, define, pub_l, priv_l, pub, priv)
    cs = compile_circuit(define, pub_l, priv_l)
    assert check_witness(cs, w.astype(object))


@needs_native
def test_aes_tape_matches_python_builder():
    from zksc_tpu.ops.ciphers import aes_ctr_encrypt
    from zksc_tpu.r1cs.circuits import aes as ac
    blocks, key_bits = 1, 128
    key, nonce = secrets.token_bytes(16), secrets.token_bytes(12)
    ct = secrets.token_bytes(16)
    pt = aes_ctr_encrypt(key, nonce, 2, ct)
    define = ac.make_define(blocks, key_bits)
    pub_l = ac.public_layout(blocks)
    priv_l = ac.private_layout(blocks, key_bits)
    pub, priv = ac.witness_inputs([key], [[(nonce, 2)]], [[ct]], [[pt]], blocks)
    w = _run_both(ac, define, pub_l, priv_l, pub, priv)
    cs = compile_circuit(define, pub_l, priv_l)
    assert check_witness(cs, w.astype(object))


def test_toprf_circuits_fall_back():
    """Big-field gadgets must be rejected by interval analysis, not
    mis-executed."""
    from zksc_tpu.r1cs.circuits import toprf_variants as tv
    define = tv.make_define("chacha20-toprf", 2, 256)
    tape = build_tape(define, tv.public_layout("chacha20-toprf", 2),
                      tv.private_layout("chacha20-toprf", 2, 256))
    assert tape is None
