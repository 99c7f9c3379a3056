"""FRI low-degree test: accept low-degree, reject high-degree/tampered."""
import random

import numpy as np

from zksc_tpu.stark.channel import Channel
from zksc_tpu.stark.fri import FriContext
from zksc_tpu.stark.m31 import P31

RNG = random.Random(17)

LOG_N = 7
LOG_BLOWUP = 2
CTX = FriContext(LOG_N, LOG_BLOWUP)


def low_degree_evals():
    """QM31 poly of degree < N/blowup: 4 independent M31 component polys."""
    n = 1 << LOG_N
    k = n >> LOG_BLOWUP
    comps = []
    for _ in range(4):
        coeffs = np.zeros(n, dtype=np.uint32)
        coeffs[:k] = [RNG.randrange(P31) for _ in range(k)]
        comps.append(np.asarray(CTX.fft.evaluate(coeffs)))
    return np.stack(comps, axis=1)


def test_fri_accepts_low_degree():
    evals = low_degree_evals()
    proof = CTX.prove(evals, Channel(), n_queries=8, pow_bits=4)
    assert CTX.verify(proof, Channel(), n_queries=8, pow_bits=4)


def test_fri_rejects_high_degree():
    n = 1 << LOG_N
    evals = np.stack([
        np.array([RNG.randrange(P31) for _ in range(n)], dtype=np.uint32)
        for _ in range(4)], axis=1)
    proof = CTX.prove(evals, Channel(), n_queries=8, pow_bits=4)
    assert not CTX.verify(proof, Channel(), n_queries=8, pow_bits=4)


def test_fri_rejects_tampered_value():
    evals = low_degree_evals()
    proof = CTX.prove(evals, Channel(), n_queries=8, pow_bits=4)
    o = proof.openings[0][1]
    o.value = tuple((v + 1) % P31 for v in o.value)
    assert not CTX.verify(proof, Channel(), n_queries=8, pow_bits=4)


def test_fri_rejects_wrong_last_value():
    evals = low_degree_evals()
    proof = CTX.prove(evals, Channel(), n_queries=8, pow_bits=4)
    proof.last_value = tuple((v + 1) % P31 for v in proof.last_value)
    assert not CTX.verify(proof, Channel(), n_queries=8, pow_bits=4)


def test_fri_rejects_bad_pow():
    evals = low_degree_evals()
    proof = CTX.prove(evals, Channel(), n_queries=8, pow_bits=4)
    proof.pow_nonce += 12345
    assert not CTX.verify(proof, Channel(), n_queries=8, pow_bits=4)
