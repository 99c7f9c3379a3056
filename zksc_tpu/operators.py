"""Engine operators: pluggable prover/verifier backends per algorithm.

Mirrors the reference's operator layer (js/src/{snarkjs,gnark,stwo}/operator.ts
— one factory per engine adapting the engine-neutral witness into the engine's
native encoding). Round-1 engine: "groth16" — the TPU Groth16 prover over our
own BN254 circuits. The STARK ("stwo"-equivalent) engine lands next.
"""
from __future__ import annotations

import os

import numpy as np

from .api import ZKProofInput
from .config import CONFIG
from .r1cs import check_witness, compile_circuit, generate_witness
from .r1cs.circuits import chacha20 as chacha_circuit

ARTIFACT_ROOT = os.environ.get(
    "ZKSC_ARTIFACT_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
                 if "__file__" in globals() else ".", "artifacts"))


class CircuitSpec:
    """Statement registry entry: circuit definition + witness assembly."""

    def __init__(self, algorithm: str):
        self.algorithm = algorithm
        cfg = CONFIG[algorithm]
        if algorithm == "chacha20":
            self.module = chacha_circuit
            self.blocks = cfg.blocks_per_chunk
            self.define = chacha_circuit.make_define(self.blocks)
            self.pub_layout = chacha_circuit.public_layout(self.blocks)
            self.priv_layout = chacha_circuit.private_layout(self.blocks)
        elif algorithm in ("aes-128-ctr", "aes-256-ctr"):
            from .r1cs.circuits import aes as aes_circuit
            self.module = aes_circuit
            self.blocks = cfg.blocks_per_chunk
            key_bits = cfg.key_size_bytes * 8
            self.define = aes_circuit.make_define(self.blocks, key_bits)
            self.pub_layout = aes_circuit.public_layout(self.blocks)
            self.priv_layout = aes_circuit.private_layout(self.blocks, key_bits)
        else:
            raise ValueError(f"unknown algorithm {algorithm}")
        self._cs = None

    @property
    def cs(self):
        if self._cs is None:
            self._cs = compile_circuit(self.define, self.pub_layout, self.priv_layout)
        return self._cs

    def build_witness(self, wi: ZKProofInput) -> np.ndarray:
        cfg = CONFIG[wi.algorithm]
        bs = cfg.block_size_bytes
        ins = [[wi.ciphertext[b * bs:(b + 1) * bs] for b in range(self.blocks)]]
        outs = [[wi.plaintext[b * bs:(b + 1) * bs] for b in range(self.blocks)]]
        infos = [[(blk.nonce, blk.counter) for blk in wi.blocks]]
        pub, priv = self.module.witness_inputs([wi.key], infos, ins, outs,
                                               self.blocks)
        w = generate_witness(self.define, self.pub_layout, self.priv_layout,
                             pub, priv, batch=1)
        return w[:, 0]


class Groth16Operator:
    """TPU Groth16 prove/verify for one algorithm, with a local artifact store
    (generates keys on first use; pins the circuit digest)."""

    def __init__(self, algorithm: str, artifact_dir: str | None = None,
                 allow_setup: bool = True):
        from .groth16 import ProverContext, artifacts as art
        self.spec = CircuitSpec(algorithm)
        self.algorithm = algorithm
        self._art = art
        self._dir = artifact_dir or os.path.join(ARTIFACT_ROOT, algorithm)
        self._allow_setup = allow_setup
        self._ctx = None
        self._vk = None

    def _ensure_keys(self):
        if self._ctx is not None:
            return
        from .groth16 import ProverContext, setup
        cs = self.spec.cs
        pk = vk = None
        if os.path.exists(os.path.join(self._dir, "pk_meta.json")):
            pk, vk = self._art.load_keys(self._dir, expected_digest=cs.digest())
        elif self._allow_setup:
            pk, vk = setup(cs)
            self._art.save_keys(self._dir, pk, vk)
        else:
            raise FileNotFoundError(
                f"no artifacts for {self.algorithm} under {self._dir} and "
                "setup disabled")
        self._ctx = ProverContext(cs, pk)
        self._vk = vk

    def ensure_vk(self):
        if self._vk is None:
            if os.path.exists(os.path.join(self._dir, "vk.json")):
                self._vk = self._art.load_vk(self._dir)
            else:
                self._ensure_keys()
        return self._vk

    def prove(self, wi: ZKProofInput) -> dict:
        return self.prove_batch([wi])[0]

    def prove_batch(self, wis: list) -> list:
        """Prove several chunks in one device pass (the scale-out unit is the
        independent per-chunk proof, as in the reference's parallel bench)."""
        self._ensure_keys()
        check = os.environ.get("ZKSC_CHECK_WITNESS", "0") == "1"
        witnesses = []
        for wi in wis:
            witness = self.spec.build_witness(wi)
            if check and not check_witness(self.spec.cs, witness[:, None]):
                raise ValueError("witness does not satisfy the circuit "
                                 "(wrong key or corrupted inputs?)")
            witnesses.append(witness)
        proofs = self._ctx.prove_batch(witnesses)
        return [p.to_json_dict() for p in proofs]

    def verify(self, public_bits: list, proof_data: dict) -> bool:
        from .groth16 import verify as g16_verify
        from .groth16.prove import Proof
        vk = self.ensure_vk()
        try:
            proof = Proof.from_json_dict(proof_data)
        except (KeyError, ValueError, TypeError):
            return False
        return g16_verify(vk, proof, public_bits)


def make_operator(algorithm: str, engine: str):
    if engine == "groth16":
        return Groth16Operator(algorithm)
    raise ValueError(f"unknown engine {engine!r} (available: groth16)")
