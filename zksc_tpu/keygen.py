"""Keygen CLI: compile circuits, run trusted setup, write pinned artifacts.

Mirror of the reference's keygen flow (gnark/keygen/keygen.go:40-160 —
compiles all circuits, runs groth16.Setup, writes pk/r1cs/vk artifacts and
pins hashes). Usage:

    python -m zksc_tpu.keygen [--algorithm chacha20|aes-128-ctr|aes-256-ctr]
                              [--out artifacts/]

Runs the fixed-base ladders on the default JAX backend (the TPU when
available).
"""
from __future__ import annotations

import argparse
import json
import os
import time

from .config import SUPPORTED_ALGORITHMS


def run(algorithm: str, out_root: str):
    from .groth16 import artifacts as art
    from .groth16.setup import setup
    from .operators import CircuitSpec

    t0 = time.time()
    spec = CircuitSpec(algorithm)
    cs = spec.cs
    print(f"[{algorithm}] compiled: {cs.n_constraints} constraints, "
          f"{cs.n_wires} wires, {cs.n_public} public "
          f"({time.time() - t0:.1f}s)", flush=True)
    t0 = time.time()
    pk, vk = setup(cs)
    print(f"[{algorithm}] setup done ({time.time() - t0:.1f}s), "
          f"domain 2^{pk.domain_n.bit_length() - 1}", flush=True)
    out_dir = os.path.join(out_root, algorithm)
    art.save_keys(out_dir, pk, vk)
    manifest = {
        "algorithm": algorithm,
        "digest": cs.digest(),
        "n_constraints": cs.n_constraints,
        "n_wires": cs.n_wires,
        "n_public": cs.n_public,
        "domain_n": pk.domain_n,
    }
    with open(os.path.join(out_dir, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1)
    print(f"[{algorithm}] artifacts -> {out_dir}", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--algorithm", choices=SUPPORTED_ALGORITHMS, default=None,
                    help="default: all")
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "artifacts"))
    args = ap.parse_args()
    algs = [args.algorithm] if args.algorithm else list(SUPPORTED_ALGORITHMS)
    for alg in algs:
        run(alg, args.out)


if __name__ == "__main__":
    main()
