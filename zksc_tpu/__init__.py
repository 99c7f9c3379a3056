"""zksc_tpu — TPU-native ZK proving framework for symmetric-cipher statements.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
reclaimprotocol/zk-symmetric-crypto: prove in zero knowledge that you know the
symmetric key decrypting a TLS ciphertext chunk to a given plaintext
(ChaCha20 / AES-128-CTR / AES-256-CTR, with optional TOPRF redaction),
with the Groth16 (BN254) prover's MSM/NTT and witness generation running as
TPU kernels.
"""
__version__ = "0.1.0"
