"""End-to-end Groth16 prove over the IMPORTED reference R1CS.

The strongest statement-level gnark parity available in-container: the
constraint system is byte-derived from the reference's own compiled
artifact (resources/gnark/r1cs.chacha20, gnark v0.14 binary), the witness
follows the reference prover's exact bit orders, and the proof runs
through our TPU Groth16 pipeline and verifies (reference flow:
gnark/libraries/prover/impl/library.go:105-133).

Slow-gated: setup over 46912 constraints takes minutes on the CPU mesh.
Artifacts are cached under artifacts/imported-gnark-chacha20/ after the
first run (tools/run_imported_r1cs_e2e.py performs the TPU run).
"""
import os
import secrets

import numpy as np
import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_RES = os.environ.get("ZKSC_REFERENCE_RESOURCES",
                      "/root/reference/resources")
_R1CS = os.path.join(_RES, "gnark", "r1cs.chacha20")
_CACHE = os.path.join(_REPO, "artifacts", "imported-gnark-chacha20")

pytestmark = pytest.mark.skipif(
    os.environ.get("ZKSC_RUN_SLOW") != "1" or not os.path.exists(_R1CS),
    reason="imported-R1CS prove is minutes-long; set ZKSC_RUN_SLOW=1 "
           "(tools/run_imported_r1cs_e2e.py covers this on TPU)")


def _setup_cached(cs_native):
    from zksc_tpu.groth16 import artifacts as art
    from zksc_tpu.groth16.setup import setup
    meta = os.path.join(_CACHE, "pk_meta.json")
    if os.path.exists(meta):
        return art.load_keys(_CACHE)
    pk, vk = setup(cs_native)
    art.save_keys(_CACHE, pk, vk)
    return pk, vk


def test_prove_verify_over_imported_reference_r1cs():
    import sys
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from test_gnark_r1cs_import import _chacha_assignment
    from zksc_tpu.groth16 import ProverContext, verify
    from zksc_tpu.interop.gnark_r1cs import parse_r1cs

    cs = parse_r1cs(_R1CS)
    key = secrets.token_bytes(32)
    nonce = secrets.token_bytes(12)
    counter = 5
    ciphertext = secrets.token_bytes(128)
    public, secret, _ = _chacha_assignment(cs, key, nonce, counter,
                                           ciphertext)
    w = cs.solve_witness(public, secret)
    assert cs.check_witness(w)

    cs_native = cs.to_constraint_system()
    pk, vk = _setup_cached(cs_native)
    proof = ProverContext(cs_native, pk).prove(np.array(w, dtype=object))
    pub_vals = [int(x) for x in w[1:cs.nb_public]]
    assert verify(vk, proof, pub_vals)
    # tampered public input must fail
    bad = list(pub_vals)
    bad[0] ^= 1
    assert not verify(vk, proof, bad)
