"""Engine operators: pluggable prover/verifier backends per algorithm.

Mirrors the reference's operator layer (js/src/{snarkjs,gnark,stwo}/operator.ts
— one factory per engine adapting the engine-neutral witness into the engine's
native encoding). Engines: "groth16" (TPU Groth16 over our BN254 circuits,
snarkjs/gnark-equivalent) and "stark" (Circle-STARK over M31, the
stwo-equivalent; chacha20 stream AIR).
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
        self.blocks = cfg.blocks_per_chunk
        key_bits = cfg.key_size_bytes * 8
        if algorithm.endswith("-toprf"):
            from .r1cs.circuits import toprf_variants
            self.module = toprf_variants
            self.define = toprf_variants.make_define(
                algorithm, self.blocks, key_bits)
            self.pub_layout = toprf_variants.public_layout(
                algorithm, self.blocks)
            self.priv_layout = toprf_variants.private_layout(
                algorithm, self.blocks, key_bits)
        elif algorithm == "chacha20":
            self.module = chacha_circuit
            self.define = chacha_circuit.make_define(self.blocks)
            self.pub_layout = chacha_circuit.public_layout(self.blocks)
            self.priv_layout = chacha_circuit.private_layout(self.blocks)
        elif algorithm in ("aes-128-ctr", "aes-256-ctr"):
            from .r1cs.circuits import aes as aes_circuit
            self.module = aes_circuit
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
        if wi.algorithm.endswith("-toprf"):
            from .oprf.locations import compute_bitmask
            from .r1cs.circuits import toprf as toprf_gadget
            bnds = [bs if blk.boundary is None else blk.boundary
                    for blk in wi.blocks]
            total_bits = 8 * bs * self.blocks
            bitmask = compute_bitmask(total_bits, wi.toprf.locations, bnds, bs)
            total_len = sum(l[1] if isinstance(l, tuple) else l.length
                            for l in wi.toprf.locations)
            indices = [r.index for r in wi.toprf.responses]
            from .oprf.oprf import lagrange_coeff
            tp = {
                "toprf_domain": [[int.from_bytes(wi.toprf.domain_separator,
                                                 "big")]],
                "toprf_resp": [], "toprf_coeff": [], "toprf_share_pub": [],
                "toprf_c": [], "toprf_r": [],
                "toprf_out": [[int(wi.toprf.output)]],
            }
            for r in wi.toprf.responses:
                tp["toprf_resp"] += [[int(r.evaluated[0])],
                                     [int(r.evaluated[1])]]
                tp["toprf_share_pub"] += [[int(r.public_key[0])],
                                          [int(r.public_key[1])]]
                tp["toprf_coeff"].append([lagrange_coeff(indices, r.index)])
                tp["toprf_c"].append([int(r.c)])
                tp["toprf_r"].append([int(r.r)])
            pub, priv = self.module.witness_inputs(
                wi.algorithm, [wi.key], infos, ins, outs, self.blocks,
                bitmasks=[bitmask], lens=[total_len], toprf_pubs=[tp],
                masks=[wi.mask])
        else:
            pub, priv = self.module.witness_inputs([wi.key], infos, ins, outs,
                                                   self.blocks)
        w = generate_witness(self.define, self.pub_layout, self.priv_layout,
                             pub, priv, batch=1)
        return w[:, 0]


class Groth16Operator:
    """TPU Groth16 prove/verify for one algorithm, with a local artifact store
    (generates keys on first use; pins the circuit digest)."""

    def __init__(self, algorithm: str, artifact_dir: str | None = None,
                 allow_setup: bool = True, mesh=None):
        from .groth16 import ProverContext, artifacts as art
        self.spec = CircuitSpec(algorithm)
        self.algorithm = algorithm
        self._art = art
        self._dir = artifact_dir or os.path.join(ARTIFACT_ROOT, algorithm)
        self._allow_setup = allow_setup
        self._ctx = None
        self._vk = None
        if mesh is None:
            # opt-in multi-chip proving: ZKSC_MESH=all or a device count
            env = os.environ.get("ZKSC_MESH", "")
            if env:
                import jax
                from .parallel.mesh import make_mesh
                n = len(jax.devices()) if env == "all" else int(env)
                if n > 1:
                    mesh = make_mesh(n)
        self._mesh = mesh

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
        self._ctx = ProverContext(cs, pk, mesh=self._mesh)
        self._vk = vk

    def ensure_vk(self):
        if self._vk is None:
            if os.path.exists(os.path.join(self._dir, "vk.json")):
                self._vk = self._art.load_vk(
                    self._dir, expected_digest=self.spec.cs.digest())
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
        if len(wis) > 1:
            # independent per-chunk witness builds; the native tape executor
            # releases the GIL during its ctypes call, so threads overlap the
            # host-side witness work across the batch
            from concurrent.futures import ThreadPoolExecutor
            with ThreadPoolExecutor(max_workers=min(4, len(wis))) as ex:
                witnesses = list(ex.map(self.spec.build_witness, wis))
        else:
            witnesses = [self.spec.build_witness(wis[0])]
        if check:
            for witness in witnesses:
                if not check_witness(self.spec.cs, witness[:, None]):
                    raise ValueError("witness does not satisfy the circuit "
                                     "(wrong key or corrupted inputs?)")
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


class StarkOperator:
    """Circle-STARK engine ("stark"), the stwo-equivalent backend
    (reference operator shape: js/src/stwo/operator.ts:87-181 — single
    nonce, sequential counters, proof as base64 JSON payload).
    chacha20 uses the stream AIR (stark/prover.py); aes-128-ctr and
    aes-256-ctr use the LogUp lookup AIR (stark/aes_prover.py)."""

    ALGORITHMS = ("chacha20", "aes-128-ctr", "aes-256-ctr")

    def __init__(self, algorithm: str):
        if algorithm not in self.ALGORITHMS:
            raise ValueError(
                f"stark engine supports {self.ALGORITHMS} (got {algorithm!r})")
        self.algorithm = algorithm

    @staticmethod
    def _check_blocks(blocks):
        nonce = blocks[0].nonce
        counter0 = blocks[0].counter
        for i, b in enumerate(blocks):
            if b.nonce != nonce or b.counter != counter0 + i:
                raise ValueError("stark engine requires a single nonce and "
                                 "sequential counters (reference stwo parity)")
        return nonce, counter0

    def prove(self, wi: ZKProofInput) -> dict:
        nonce, counter0 = self._check_blocks(wi.blocks)
        if self.algorithm == "chacha20":
            from .stark import prover as sp
            proof = sp.prove_stream(wi.key, nonce, counter0,
                                    wi.plaintext, wi.ciphertext)
        else:
            from .stark import aes_prover as ap
            proof = ap.prove_aes_ctr(wi.key, nonce, counter0,
                                     wi.plaintext, wi.ciphertext)
        # base64-bincode envelope (reference wire shape, wasm_api.rs:588-601);
        # verify() also accepts the expanded JSON form via from_json_dict
        return proof.to_envelope()

    def prove_batch(self, wis: list) -> list:
        return [self.prove(wi) for wi in wis]

    def verify(self, public_bits: list, proof_data: dict) -> bool:
        """public_bits: the engine-neutral signal vector from
        api.get_public_signals (per block: counter LE bits, nonce bits,
        ciphertext bits, plaintext bits) — decoded back to byte inputs."""
        cfg = CONFIG[self.algorithm]
        bs = cfg.block_size_bytes
        per_block = 32 + 96 + 8 * bs + 8 * bs
        if len(public_bits) != per_block * cfg.blocks_per_chunk:
            return False

        def bits_to_bytes(bits):
            out = bytearray(len(bits) // 8)
            for i, b in enumerate(bits):
                if int(b) not in (0, 1):
                    raise ValueError("non-bit public signal")
                out[i // 8] |= int(b) << (i % 8)
            return bytes(out)

        try:
            nonce = counter0 = None
            cts, pts = [], []
            for blk in range(cfg.blocks_per_chunk):
                off = blk * per_block
                ctr = int.from_bytes(
                    bits_to_bytes(public_bits[off:off + 32]), "little")
                nnc = bits_to_bytes(public_bits[off + 32:off + 128])
                cts.append(bits_to_bytes(
                    public_bits[off + 128:off + 128 + 8 * bs]))
                pts.append(bits_to_bytes(
                    public_bits[off + 128 + 8 * bs:off + per_block]))
                if blk == 0:
                    nonce, counter0 = nnc, ctr
                elif nnc != nonce or ctr != counter0 + blk:
                    return False
            if self.algorithm == "chacha20":
                from .stark import prover as sp
                proof = sp.StreamProof.from_json_dict(proof_data)
                return sp.verify_stream(proof, nonce, counter0,
                                        b"".join(pts), b"".join(cts))
            from .stark import aes_prover as ap
            proof = ap.AesProof.from_json_dict(proof_data)
            return ap.verify_aes_ctr(proof, nonce, counter0,
                                     b"".join(pts), b"".join(cts),
                                     CONFIG[self.algorithm].key_size_bytes)
        except Exception:
            return False


class StwoCompatOperator(StarkOperator):
    """Circle-STARK engine in REFERENCE-interop mode ("stark-stwo"):
    proofs are BIT-EXACT stwo proofs — byte-identical to what the
    reference prover (resources/stwo/s2circuits_bg.wasm) emits for the
    same inputs, and accepted by the reference verifier. The envelope
    uses the reference's exact JSON keys (wasm_api.rs:588-601)."""

    ALGORITHMS = ("chacha20",)

    def prove(self, wi: ZKProofInput) -> dict:
        import base64
        nonce, counter0 = self._check_blocks(wi.blocks)
        from .stark.stwo_compat.prover import prove_stream_bytes
        raw = prove_stream_bytes(wi.key, nonce, counter0,
                                 wi.plaintext, wi.ciphertext)
        return {"success": True,
                "blocks": len(wi.plaintext) // 64,
                "algorithm": "chacha20",
                "protocol": "stwo",
                "proof": base64.b64encode(raw).decode(),
                "proof_size_bytes": len(raw)}

    def verify(self, public_bits: list, proof_data: dict) -> bool:
        import base64
        cfg = CONFIG[self.algorithm]
        bs = cfg.block_size_bytes
        per_block = 32 + 96 + 8 * bs + 8 * bs
        if len(public_bits) != per_block * cfg.blocks_per_chunk:
            return False

        def bits_to_bytes(bits):
            out = bytearray(len(bits) // 8)
            for i, b in enumerate(bits):
                if int(b) not in (0, 1):
                    raise ValueError("non-bit public signal")
                out[i // 8] |= int(b) << (i % 8)
            return bytes(out)

        try:
            nonce = counter0 = None
            cts, pts = [], []
            for blk in range(cfg.blocks_per_chunk):
                off = blk * per_block
                ctr = int.from_bytes(
                    bits_to_bytes(public_bits[off:off + 32]), "little")
                nnc = bits_to_bytes(public_bits[off + 32:off + 128])
                cts.append(bits_to_bytes(
                    public_bits[off + 128:off + 128 + 8 * bs]))
                pts.append(bits_to_bytes(
                    public_bits[off + 128 + 8 * bs:off + per_block]))
                if blk == 0:
                    nonce, counter0 = nnc, ctr
                elif nnc != nonce or ctr != counter0 + blk:
                    return False
            from .stark.stwo_compat.verifier import \
                verify_stream_proof_bytes
            raw = base64.b64decode(proof_data["proof"])
            return verify_stream_proof_bytes(raw, nonce, counter0,
                                             b"".join(pts), b"".join(cts))
        except Exception:
            return False


def make_operator(algorithm: str, engine: str):
    if engine == "groth16":
        return Groth16Operator(algorithm)
    if engine == "stark":
        return StarkOperator(algorithm)
    if engine == "stark-stwo":
        return StwoCompatOperator(algorithm)
    raise ValueError(f"unknown engine {engine!r} "
                     "(available: groth16, stark, stark-stwo)")
