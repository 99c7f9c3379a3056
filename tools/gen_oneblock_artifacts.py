"""Generate the 1-block ChaCha test artifacts (artifacts/chacha20-1block).

Same trusted-setup path as `python -m zksc_tpu.keygen`, for the compact
cipher circuit used by tests/test_groth16_cipher_e2e.py.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from zksc_tpu.groth16 import artifacts as art
    from zksc_tpu.groth16.setup import setup
    from zksc_tpu.r1cs import compile_circuit
    from zksc_tpu.r1cs.circuits import chacha20 as cc
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "artifacts", "chacha20-1block")
    cs = compile_circuit(cc.make_define(1), cc.public_layout(1),
                         cc.private_layout(1))
    pk, vk = setup(cs)
    art.save_keys(out, pk, vk)
    print("saved", out, "constraints", cs.n_constraints)


if __name__ == "__main__":
    main()
