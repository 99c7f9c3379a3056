"""Groth16 e2e on a REAL cipher statement (1-block ChaCha, 22,432
constraints, domain 2^15) with committed artifacts — the smallest full
witness -> MSM -> NTT -> pairing round-trip on a cipher circuit.

Slow-gated with regret: XLA:CPU compiles the 2^15 bucket-MSM prover
shapes for >25 minutes in a fresh process (measured), and the persistent
CPU compile cache is disabled because executable (de)serialization
segfaults on the largest EC kernels (see tests/conftest.py). On the TPU
(where the compile cache works) this test runs in seconds —
tools/run_matrix_e2e-style runs and bench.py exercise the same pipeline
there on every round.
"""
import os
import secrets

import numpy as np
import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_CACHE = os.path.join(_REPO, "artifacts", "chacha20-1block")

pytestmark = pytest.mark.skipif(
    os.environ.get("ZKSC_RUN_SLOW") != "1"
    or not os.path.exists(os.path.join(_CACHE, "pk.npz")),
    reason="XLA:CPU compile of the 2^15 prover shapes exceeds 25 min "
           "(cache-disabled workaround, see conftest); set ZKSC_RUN_SLOW=1"
           " or run on TPU")


def test_one_block_chacha_groth16_roundtrip():
    from zksc_tpu.groth16 import ProverContext, verify
    from zksc_tpu.groth16 import artifacts as art
    from zksc_tpu.ops.ciphers import chacha20_encrypt
    from zksc_tpu.r1cs import (check_witness, compile_circuit,
                               generate_witness)
    from zksc_tpu.r1cs.circuits import chacha20 as cc

    cs = compile_circuit(cc.make_define(1), cc.public_layout(1),
                         cc.private_layout(1))
    assert cs.n_constraints == 22432
    pk, vk = art.load_keys(_CACHE)

    key, iv = secrets.token_bytes(32), secrets.token_bytes(12)
    ct = secrets.token_bytes(64)
    pt = chacha20_encrypt(key, iv, 1, ct)        # decrypt
    pub, priv = cc.witness_inputs([key], [[(iv, 1)]], [[ct]], [[pt]], 1)
    w = generate_witness(cc.make_define(1), cc.public_layout(1),
                         cc.private_layout(1), pub, priv, batch=1)
    assert check_witness(cs, w)

    proof = ProverContext(cs, pk).prove(w[:, 0])
    pub_vals = [int(x) for x in w[1:1 + cs.n_public, 0]]
    assert verify(vk, proof, pub_vals)
    bad = list(pub_vals)
    bad[0] ^= 1
    assert not verify(vk, proof, bad)
