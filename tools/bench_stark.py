"""STARK engine benchmark at production scale on the default backend.

Mirrors the reference's bench_stream harness shape
(stwo air_stream.rs:643-671: blocks/sec at a range of log sizes) plus an
AES-CTR row. Usage:

    python tools/bench_stark.py [--chacha-logs 10,14,17] [--aes-blocks 1024]

Prints one JSON object per benchmark line.
"""
import argparse
import json
import os
import secrets
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench_chacha(log_rows: int) -> dict:
    from zksc_tpu.ops.ciphers import chacha20_encrypt
    from zksc_tpu.stark import prover as sp
    n_blocks = 1 << log_rows
    key, nonce = secrets.token_bytes(32), secrets.token_bytes(12)
    pt = secrets.token_bytes(64 * n_blocks)
    ct = chacha20_encrypt(key, nonce, 1, pt)
    t0 = time.time()
    proof = sp.prove_stream(key, nonce, 1, pt, ct)
    prove_s = time.time() - t0
    t0 = time.time()
    ok = sp.verify_stream(proof, nonce, 1, pt, ct)
    verify_s = time.time() - t0
    return {"bench": "stark_chacha_stream", "log_rows": log_rows,
            "blocks": n_blocks, "prove_s": round(prove_s, 2),
            "blocks_per_s": round(n_blocks / prove_s, 1),
            "verify_s": round(verify_s, 2), "valid": ok,
            "proof_bytes": proof.to_envelope()["proof_size_bytes"]}


def bench_aes(n_blocks: int) -> dict:
    from zksc_tpu.ops.ciphers import aes_ctr_encrypt
    from zksc_tpu.stark import aes_prover as ap
    key, nonce = secrets.token_bytes(16), secrets.token_bytes(12)
    pt = secrets.token_bytes(16 * n_blocks)
    ct = aes_ctr_encrypt(key, nonce, 2, pt)
    t0 = time.time()
    proof = ap.prove_aes_ctr(key, nonce, 2, pt, ct)
    prove_s = time.time() - t0
    t0 = time.time()
    ok = ap.verify_aes_ctr(proof, nonce, 2, pt, ct, 16)
    verify_s = time.time() - t0
    return {"bench": "stark_aes128_ctr", "blocks": n_blocks,
            "prove_s": round(prove_s, 2),
            "blocks_per_s": round(n_blocks / prove_s, 1),
            "verify_s": round(verify_s, 2), "valid": ok,
            "proof_bytes": proof.to_envelope()["proof_size_bytes"]}


def main():
    ap_ = argparse.ArgumentParser()
    ap_.add_argument("--chacha-logs", default="10,14,17")
    ap_.add_argument("--aes-blocks", type=int, default=1024)
    ap_.add_argument("--repeat", type=int, default=2,
                     help="runs per size (first includes compile)")
    args = ap_.parse_args()
    for log_rows in [int(x) for x in args.chacha_logs.split(",") if x]:
        for r in range(args.repeat):
            rep = bench_chacha(log_rows)
            rep["run"] = r
            print(json.dumps(rep), flush=True)
    if args.aes_blocks:
        for r in range(args.repeat):
            rep = bench_aes(args.aes_blocks)
            rep["run"] = r
            print(json.dumps(rep), flush=True)


if __name__ == "__main__":
    main()
