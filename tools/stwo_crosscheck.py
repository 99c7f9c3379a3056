"""Behavioral cross-check: our stark engine vs the REFERENCE stwo backend.

Runs both provers on identical inputs and compares acceptance behavior —
the reference executes natively via the WASM VM (interop/stwo_wasm.py), so
no rust/node toolchain is needed. This is the harness for the remaining
bit-exact-emission work (ROADMAP item 2): once our stark prover replicates
stwo's Fiat-Shamir transcript, `--emit` output should verify under the
reference verifier invoked here.

Usage:
  python tools/stwo_crosscheck.py [--algorithm chacha20] [--blocks 2]
"""
import argparse
import json
import os
import secrets
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--algorithm", default="chacha20",
                    choices=["chacha20", "aes-128-ctr", "aes-256-ctr"])
    ap.add_argument("--blocks", type=int, default=2)
    args = ap.parse_args()

    from zksc_tpu.interop.stwo_wasm import load_reference_stwo
    from zksc_tpu.ops.ciphers import aes_ctr_encrypt, chacha20_encrypt

    alg = args.algorithm
    if alg == "chacha20":
        key = secrets.token_bytes(32)
        bs, counter0 = 64, 1
        enc = chacha20_encrypt
    else:
        key = secrets.token_bytes(16 if alg == "aes-128-ctr" else 32)
        bs, counter0 = 16, 2
        enc = aes_ctr_encrypt
    nonce = secrets.token_bytes(12)
    pt = secrets.token_bytes(bs * args.blocks)
    ct = enc(key, nonce, counter0, pt)

    report = {"algorithm": alg, "blocks": args.blocks}

    # ---- reference prover/verifier (native WASM) ----
    sw = load_reference_stwo()
    t0 = time.time()
    if alg == "chacha20":
        ref = sw.generate_chacha20_proof(key, nonce, counter0, pt, ct)
    else:
        ref = sw.generate_aes_ctr_proof(len(key), key, nonce, counter0,
                                        pt, ct)
    report["ref_prove_s"] = round(time.time() - t0, 2)
    report["ref_success"] = bool(ref.get("success"))
    if ref.get("success"):
        t0 = time.time()
        if alg == "chacha20":
            v = sw.verify_chacha20_proof(ref["proof"], nonce, counter0,
                                         pt, ct)
        else:
            v = sw.verify_aes_ctr_proof(ref["proof"], nonce, counter0,
                                        pt, ct)
        report["ref_verify_s"] = round(time.time() - t0, 2)
        report["ref_valid"] = v.get("valid")
        report["ref_proof_bytes"] = ref.get("proof_size_bytes")

    # ---- our stark engine on the same inputs ----
    from zksc_tpu.stark import prover as sp
    if alg == "chacha20":
        t0 = time.time()
        ours = sp.prove_stream(key, nonce, counter0, pt, ct)
        report["our_prove_s"] = round(time.time() - t0, 2)
        t0 = time.time()
        report["our_valid"] = sp.verify_stream(ours, nonce, counter0, pt, ct)
        report["our_verify_s"] = round(time.time() - t0, 2)
        env = ours.to_envelope()
        report["our_proof_bytes"] = env["proof_size_bytes"]
    else:
        from zksc_tpu.stark import aes_prover as ap_
        t0 = time.time()
        ours = ap_.prove_aes_ctr(key, nonce, counter0, pt, ct)
        report["our_prove_s"] = round(time.time() - t0, 2)
        t0 = time.time()
        report["our_valid"] = ap_.verify_aes_ctr(ours, nonce, counter0,
                                                 pt, ct, len(key))
        report["our_verify_s"] = round(time.time() - t0, 2)
        report["our_proof_bytes"] = ours.to_envelope()["proof_size_bytes"]

    # both must accept honest inputs; both must reject a tampered ct
    bad = bytearray(ct)
    bad[0] ^= 1
    if alg == "chacha20":
        rv = sw.verify_chacha20_proof(ref["proof"], nonce, counter0,
                                      pt, bytes(bad))
        ov = sp.verify_stream(ours, nonce, counter0, pt, bytes(bad))
    else:
        rv = sw.verify_aes_ctr_proof(ref["proof"], nonce, counter0,
                                     pt, bytes(bad))
        from zksc_tpu.stark import aes_prover as ap_
        ov = ap_.verify_aes_ctr(ours, nonce, counter0, pt, bytes(bad),
                                len(key))
    report["ref_rejects_tamper"] = rv.get("valid") is not True
    report["our_rejects_tamper"] = ov is not True
    report["agree"] = (report.get("ref_valid") is True
                      and report.get("our_valid") is True
                      and report["ref_rejects_tamper"]
                      and report["our_rejects_tamper"])
    print(json.dumps(report, indent=2))
    return 0 if report["agree"] else 1


if __name__ == "__main__":
    sys.exit(main())
