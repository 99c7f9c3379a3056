"""Bit-exact interop with the reference stwo backend (stwo @ f117d48).

The reference's stwo engine (stwo/src/wasm_api.rs) serializes
`StreamProof { stmt, stark_proof: StarkProof<Blake2sMerkleHasher> }` with
bincode v1 and verifies it with a Blake2s Fiat-Shamir channel. This package
re-implements that exact wire format and transcript so proofs produced by
OUR Circle-STARK prover are accepted by the REFERENCE verifier (and vice
versa). Every byte-level fact here was established empirically against the
reference WASM module executed in-process (native/wasm_vm.cc call tracing
of its blake2s compression calls) — see NOTES.md for the derivation log.
"""
from .codec import decode_stream_proof, encode_stream_proof  # noqa: F401
from .channel import Blake2sChannel  # noqa: F401
