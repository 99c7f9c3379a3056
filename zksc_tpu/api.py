"""Public proving API: generate_proof / verify_proof.

Python mirror of the reference JS orchestration layer (js/src/zk.ts:12-94 —
behavior studied, re-implemented): chunk the ciphertext into cipher blocks,
derive per-block counters from byte offsets, pad to the fixed circuit chunk
size, decrypt locally to obtain the expected plaintext (the witness "out"),
dispatch to an engine operator, wrap the proof envelope.

Engines are pluggable operators (see operators.py); the default engine is the
TPU Groth16 prover ("groth16"). Proof envelope: {algorithm, proofData,
plaintext} like the reference's Proof type (js/src/types.ts:12-22).
"""
from __future__ import annotations

import json
from dataclasses import dataclass, field

from .config import CONFIG, get_counter_for_byte_offset
from .ops import ciphers


@dataclass
class BlockInfo:
    nonce: bytes
    counter: int


@dataclass
class ZKProofInput:
    algorithm: str
    key: bytes
    blocks: list                   # [BlockInfo] per cipher block in the chunk
    ciphertext: bytes              # padded to chunk size
    plaintext: bytes               # padded to chunk size (expected output)
    data_len: int                  # unpadded ciphertext length


@dataclass
class ProofEnvelope:
    algorithm: str
    proof_data: dict
    plaintext: bytes               # full padded chunk (CTR padding keystream
    data_len: int = 0              # is inherently revealed); caller slices to
                                   # data_len for the useful plaintext

    def to_json(self) -> str:
        return json.dumps({
            "algorithm": self.algorithm,
            "proofData": self.proof_data,
            "plaintext": self.plaintext.hex(),
            "dataLen": self.data_len,
        })

    @classmethod
    def from_json(cls, s: str) -> "ProofEnvelope":
        d = json.loads(s)
        return cls(d["algorithm"], d["proofData"], bytes.fromhex(d["plaintext"]),
                   d.get("dataLen", len(d["plaintext"]) // 2))


def _decrypt(algorithm: str, key: bytes, nonce: bytes, counter: int,
             data: bytes) -> bytes:
    if algorithm == "chacha20":
        return ciphers.chacha20_encrypt(key, nonce, counter, data)
    return ciphers.aes_ctr_encrypt(key, nonce, counter, data)


def generate_zk_witness(algorithm: str, key: bytes, ciphertext: bytes,
                        iv: bytes, offset_bytes: int = 0) -> ZKProofInput:
    """Build the engine-neutral witness input for one chunk.

    ciphertext: at most one chunk of data starting at offset_bytes within the
    full stream (offset must be block-aligned); iv: the 12-byte nonce.
    """
    cfg = CONFIG[algorithm]
    if len(key) != cfg.key_size_bytes:
        raise ValueError(f"key must be {cfg.key_size_bytes} bytes")
    if len(iv) != cfg.iv_size_bytes:
        raise ValueError(f"iv must be {cfg.iv_size_bytes} bytes")
    if not ciphertext:
        raise ValueError("empty ciphertext")
    if len(ciphertext) > cfg.chunk_size_bytes:
        raise ValueError(
            f"ciphertext longer than chunk ({cfg.chunk_size_bytes} bytes); "
            "split the stream into chunks and prove each separately")
    start_counter = get_counter_for_byte_offset(algorithm, offset_bytes)
    padded_ct = ciphertext + bytes(cfg.chunk_size_bytes - len(ciphertext))
    plaintext = _decrypt(algorithm, key, iv, start_counter, padded_ct)
    blocks = [BlockInfo(nonce=iv, counter=start_counter + b)
              for b in range(cfg.blocks_per_chunk)]
    return ZKProofInput(algorithm=algorithm, key=key, blocks=blocks,
                        ciphertext=padded_ct, plaintext=plaintext,
                        data_len=len(ciphertext))


def get_public_signals(algorithm: str, ciphertext: bytes, iv: bytes,
                       plaintext: bytes, offset_bytes: int = 0) -> list:
    """Public signal bit-vector in circuit order (verifier side): for each
    block [counter bits, nonce bits, in bits, out bits]."""
    import struct

    from .r1cs.circuits.chacha20 import bytes_to_bits
    cfg = CONFIG[algorithm]
    if len(ciphertext) > cfg.chunk_size_bytes:
        raise ValueError("ciphertext longer than one chunk")
    if len(plaintext) != cfg.chunk_size_bytes:
        raise ValueError("plaintext must be the full padded chunk")
    start_counter = get_counter_for_byte_offset(algorithm, offset_bytes)
    padded_ct = ciphertext + bytes(cfg.chunk_size_bytes - len(ciphertext))
    padded_pt_claim = plaintext
    sig = []
    bs = cfg.block_size_bytes
    for b in range(cfg.blocks_per_chunk):
        sig += bytes_to_bits(struct.pack("<I", start_counter + b))
        sig += bytes_to_bits(iv)
        sig += bytes_to_bits(padded_ct[b * bs:(b + 1) * bs])
        sig += bytes_to_bits(padded_pt_claim[b * bs:(b + 1) * bs])
    return sig


_OPERATORS = {}


def get_operator(algorithm: str, engine: str = "groth16"):
    key = (algorithm, engine)
    if key not in _OPERATORS:
        from .operators import make_operator
        _OPERATORS[key] = make_operator(algorithm, engine)
    return _OPERATORS[key]


def generate_proof(algorithm: str, key: bytes, ciphertext: bytes, iv: bytes,
                   offset_bytes: int = 0, engine: str = "groth16") -> ProofEnvelope:
    """Prove knowledge of `key` s.t. ciphertext decrypts to the returned
    plaintext. One chunk per call (mirror of js/src/zk.ts:12 generateProof)."""
    witness_input = generate_zk_witness(algorithm, key, ciphertext, iv, offset_bytes)
    operator = get_operator(algorithm, engine)
    proof_data = operator.prove(witness_input)
    return ProofEnvelope(algorithm=algorithm, proof_data=proof_data,
                         plaintext=witness_input.plaintext,
                         data_len=witness_input.data_len)


def get_algorithms_info(engine: str = "groth16") -> dict:
    """Circuit metadata per supported algorithm (mirror of the reference's
    get_circuits_info, stwo wasm_api.rs:994-1008): constraint/wire counts,
    NTT domain, chunk geometry, and the pinned circuit digest."""
    from .operators import CircuitSpec
    info = {}
    for alg, cfg in CONFIG.items():
        spec = CircuitSpec(alg)
        cs = spec.cs
        info[alg] = {
            "engine": engine,
            "n_constraints": cs.n_constraints,
            "n_wires": cs.n_wires,
            "n_public": cs.n_public,
            "domain_n": max(4, 1 << (cs.n_constraints - 1).bit_length()),
            "chunk_size_bytes": cfg.chunk_size_bytes,
            "blocks_per_chunk": cfg.blocks_per_chunk,
            "digest": cs.digest(),
        }
    return info


def generate_proofs(algorithm: str, requests: list, engine: str = "groth16") -> list:
    """Batch variant of generate_proof. requests: list of dicts with keys
    {key, ciphertext, iv, offset_bytes?}; proves all chunks in one device
    pass (mirrors the reference's batch-of-witness parallel proving)."""
    wis = [generate_zk_witness(algorithm, r["key"], r["ciphertext"], r["iv"],
                               r.get("offset_bytes", 0)) for r in requests]
    operator = get_operator(algorithm, engine)
    if hasattr(operator, "prove_batch"):
        datas = operator.prove_batch(wis)
    else:
        datas = [operator.prove(wi) for wi in wis]
    return [ProofEnvelope(algorithm=algorithm, proof_data=d,
                          plaintext=wi.plaintext, data_len=wi.data_len)
            for d, wi in zip(datas, wis)]


def verify_proof(proof: ProofEnvelope, ciphertext: bytes, iv: bytes,
                 offset_bytes: int = 0, engine: str = "groth16") -> bool:
    """Verify a proof envelope against public data (mirror js/src/zk.ts:44)."""
    operator = get_operator(proof.algorithm, engine)
    if len(proof.plaintext) != CONFIG[proof.algorithm].chunk_size_bytes:
        return False
    pub = get_public_signals(proof.algorithm, ciphertext, iv, proof.plaintext,
                             offset_bytes)
    return operator.verify(pub, proof.proof_data)
