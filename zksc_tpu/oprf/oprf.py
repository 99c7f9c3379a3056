"""(Threshold) OPRF over BabyJubJub: blind - evaluate - finalize, with DLEQ
proofs and Shamir threshold shares.

Protocol parity with the reference's host-side OPRF layer
(gnark/utils/oprf.go:33-143, toprf.go:20-151, dleq.go:22-82 — behavior
studied, implemented fresh):

  request:  secret data -> <=2 31-byte field elements; H = hash_to_point(data);
            random mask r; masked = [r]H
  evaluate: subgroup-check masked; response = [sk]masked; DLEQ proof that
            log_{base}(pub) == log_{masked}(response)
  finalize: verify DLEQ; unmasked = [r^-1]response; output =
            MiMC(x, y, s0, s1)
  threshold: Shamir shares of sk over the subgroup order; per-share evaluate;
            Lagrange recombination of responses at x=0.
"""
from __future__ import annotations

import secrets
from dataclasses import dataclass

from . import babyjubjub as bjj
from .mimc import mimc_hash

L = bjj.L_ORDER


def split_secret_elements(data: bytes) -> list:
    """Secret bytes -> up to 2 field elements of <= 31 bytes each (big-endian),
    mirroring the reference's encoding (gnark/utils/oprf.go:33-48 semantics)."""
    if len(data) > 62:
        raise ValueError("secret data longer than 62 bytes")
    chunks = [data[:31], data[31:62]]
    return [int.from_bytes(c, "big") for c in chunks]


def hash_to_point(data: bytes):
    """H = [MiMC(s0, s1)] * Base (matches the reference's MiMC->scalar-mult
    construction; not a constant-time/uniform map — same caveat as reference)."""
    s0, s1 = split_secret_elements(data)
    scalar = mimc_hash([s0, s1]) % L
    if scalar == 0:
        scalar = 1
    return bjj.mul(bjj.BASE, scalar)


# ---------------- DLEQ (Chaum-Pedersen) ----------------

@dataclass
class DLEQProof:
    c: int
    r: int


def dleq_prove(sk: int, base1, pub1, base2, pub2, rng=None) -> DLEQProof:
    """Prove log_{base1}(pub1) == log_{base2}(pub2) == sk."""
    if rng is None:
        rng = lambda: secrets.randbelow(L - 1) + 1
    k = rng()
    t1 = bjj.mul(base1, k)
    t2 = bjj.mul(base2, k)
    c = mimc_hash([t1[0], t1[1], t2[0], t2[1],
                   pub1[0], pub1[1], pub2[0], pub2[1]]) % L
    r = (k - c * sk) % L
    return DLEQProof(c=c, r=r)


def dleq_verify(proof: DLEQProof, base1, pub1, base2, pub2) -> bool:
    t1 = bjj.add(bjj.mul(base1, proof.r), bjj.mul(pub1, proof.c))
    t2 = bjj.add(bjj.mul(base2, proof.r), bjj.mul(pub2, proof.c))
    c = mimc_hash([t1[0], t1[1], t2[0], t2[1],
                   pub1[0], pub1[1], pub2[0], pub2[1]]) % L
    return c == proof.c


# ---------------- single-server OPRF ----------------

@dataclass
class OPRFRequest:
    mask: int
    masked_point: tuple
    secret_elements: list


@dataclass
class OPRFResponse:
    evaluated: tuple
    public_key: tuple
    dleq: DLEQProof


def generate_request(data: bytes, rng=None) -> OPRFRequest:
    if rng is None:
        rng = lambda: secrets.randbelow(L - 1) + 1
    h = hash_to_point(data)
    mask = rng()
    return OPRFRequest(mask=mask, masked_point=bjj.mul(h, mask),
                       secret_elements=split_secret_elements(data))


def evaluate(sk: int, masked_point, rng=None) -> OPRFResponse:
    """Server side: respond to a blinded request."""
    if not bjj.in_subgroup(masked_point):
        raise ValueError("masked point not in prime subgroup")
    evaluated = bjj.mul(masked_point, sk)
    pub = bjj.mul(bjj.BASE, sk)
    proof = dleq_prove(sk, bjj.BASE, pub, masked_point, evaluated, rng)
    return OPRFResponse(evaluated=evaluated, public_key=pub, dleq=proof)


def finalize(request: OPRFRequest, response: OPRFResponse) -> int:
    if not dleq_verify(response.dleq, bjj.BASE, response.public_key,
                       request.masked_point, response.evaluated):
        raise ValueError("DLEQ verification failed")
    unmasked = bjj.mul(response.evaluated, pow(request.mask, -1, L))
    s0, s1 = request.secret_elements
    return mimc_hash([unmasked[0], unmasked[1], s0, s1])


# ---------------- threshold (Shamir) ----------------

@dataclass
class KeyShare:
    index: int          # x-coordinate (1-based)
    secret: int
    public_key: tuple


def generate_threshold_keys(n: int, threshold: int, rng=None):
    """Returns (master_public_key, [KeyShare]*n). threshold+1 shares recombine."""
    if rng is None:
        rng = lambda: secrets.randbelow(L - 1) + 1
    coeffs = [rng() for _ in range(threshold + 1)]
    sk = coeffs[0]
    shares = []
    for i in range(1, n + 1):
        acc = 0
        for j, cf in enumerate(coeffs):
            acc = (acc + cf * pow(i, j, L)) % L
        shares.append(KeyShare(index=i, secret=acc,
                               public_key=bjj.mul(bjj.BASE, acc)))
    return bjj.mul(bjj.BASE, sk), shares


def lagrange_coeff(indices: list, i: int) -> int:
    """Lagrange basis coefficient at x=0 for share index i."""
    num, den = 1, 1
    for j in indices:
        if j == i:
            continue
        num = num * (L - j) % L
        den = den * ((i - j) % L) % L
    return num * pow(den, -1, L) % L


def threshold_finalize(request: OPRFRequest, responses: dict) -> int:
    """responses: {share_index: OPRFResponse}; needs threshold+1 entries.
    Verifies each DLEQ, Lagrange-combines the evaluations, unmasks, hashes."""
    indices = sorted(responses)
    combined = bjj.IDENTITY
    for i in indices:
        resp = responses[i]
        if not dleq_verify(resp.dleq, bjj.BASE, resp.public_key,
                           request.masked_point, resp.evaluated):
            raise ValueError(f"DLEQ verification failed for share {i}")
        lam = lagrange_coeff(indices, i)
        combined = bjj.add(combined, bjj.mul(resp.evaluated, lam))
    unmasked = bjj.mul(combined, pow(request.mask, -1, L))
    s0, s1 = request.secret_elements
    return mimc_hash([unmasked[0], unmasked[1], s0, s1])
