"""One-shot TPU run of the imported-reference-R1CS Groth16 e2e
(tests/test_gnark_r1cs_prove.py logic) with timings printed as JSON.

Usage: python tools/run_imported_r1cs_e2e.py
"""
import json
import os
import secrets
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))


def main():
    import numpy as np
    from test_gnark_r1cs_import import _chacha_assignment
    from zksc_tpu.groth16 import ProverContext, verify
    from zksc_tpu.interop.gnark_r1cs import parse_r1cs
    from test_gnark_r1cs_prove import _setup_cached, _R1CS

    rep = {}
    t0 = time.time()
    cs = parse_r1cs(_R1CS)
    rep["parse_s"] = round(time.time() - t0, 2)
    rep["n_constraints"] = cs.nb_constraints
    key, nonce = secrets.token_bytes(32), secrets.token_bytes(12)
    ciphertext = secrets.token_bytes(128)
    public, secret, _ = _chacha_assignment(cs, key, nonce, 5, ciphertext)
    t0 = time.time()
    w = cs.solve_witness(public, secret)
    assert cs.check_witness(w)
    rep["witness_s"] = round(time.time() - t0, 2)
    cs_native = cs.to_constraint_system()
    t0 = time.time()
    pk, vk = _setup_cached(cs_native)
    rep["setup_s"] = round(time.time() - t0, 2)
    ctx = ProverContext(cs_native, pk)
    t0 = time.time()
    proof = ctx.prove(np.array(w, dtype=object))
    rep["prove_s"] = round(time.time() - t0, 2)
    pub_vals = [int(x) for x in w[1:cs.nb_public]]
    t0 = time.time()
    rep["valid"] = verify(vk, proof, pub_vals)
    rep["verify_s"] = round(time.time() - t0, 2)
    bad = list(pub_vals)
    bad[0] ^= 1
    rep["tamper_rejected"] = not verify(vk, proof, bad)
    print(json.dumps(rep))
    return 0 if rep["valid"] and rep["tamper_rejected"] else 1


if __name__ == "__main__":
    sys.exit(main())
