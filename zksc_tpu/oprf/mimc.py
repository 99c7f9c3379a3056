"""MiMC hash over BN254 Fr (Miyaguchi-Preneel sponge, x^7 rounds).

Fills the MiMC role in the reference's OPRF transcript hashing and
hash-to-curve (gnark-crypto mimc — behavior studied; constants here are
derived from our own documented seed, so cross-stack bit-exactness with gnark
is deferred to the gnark-compat milestone; the protocol layer only needs a
collision-resistant hash both sides agree on).

Round constants: c_i = sha256("zksc-tpu-mimc-bn254" || be32(i)) mod r,
91 rounds, exponent 7 (gcd(7, r-1) == 1).
"""
from __future__ import annotations

import hashlib

Q = 21888242871839275222246405745257275088548364400416034343698204186575808495617
N_ROUNDS = 91
EXPONENT = 7

_SEED = b"zksc-tpu-mimc-bn254"


def _constants():
    out = []
    for i in range(N_ROUNDS):
        h = hashlib.sha256(_SEED + i.to_bytes(4, "big")).digest()
        out.append(int.from_bytes(h, "big") % Q)
    return out


CONSTANTS = _constants()


def mimc_permute(x: int, k: int) -> int:
    """One MiMC-p/p permutation of x with key k."""
    for c in CONSTANTS:
        x = pow((x + k + c) % Q, EXPONENT, Q)
    return (x + k) % Q


def mimc_hash(values) -> int:
    """Miyaguchi-Preneel chaining over a list of field elements."""
    h = 0
    for v in values:
        v %= Q
        h = (mimc_permute(v, h) + v + h) % Q
    return h
