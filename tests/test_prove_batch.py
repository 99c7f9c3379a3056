"""Batched proving on the tiny circuit: k witnesses -> k valid proofs."""
import random

import pytest

from zksc_tpu.groth16 import ProverContext, setup, verify
from zksc_tpu.r1cs import compile_circuit, generate_witness

RNG = random.Random(31)


def define(api, v):
    x, out = v["x"][0], v["out"][0]
    x2 = api.mul(x, x)
    api.assert_eq(api.add(x2, api.constant(1)), out)


PUB, PRIV = [("out", 1)], [("x", 1)]


@pytest.fixture(scope="module")
def artifacts():
    cs = compile_circuit(define, PUB, PRIV)
    pk, vk = setup(cs, rng=lambda: RNG.randrange(2, 10**30))
    return cs, pk, vk


def test_prove_batch_two(artifacts):
    cs, pk, vk = artifacts
    ctx = ProverContext(cs, pk)
    ws, pubs = [], []
    for x in (3, 9):
        out = x * x + 1
        w = generate_witness(define, PUB, PRIV, {"out": [[out]]},
                             {"x": [[x]]}, 1)
        ws.append(w[:, 0])
        pubs.append([out])
    proofs = ctx.prove_batch(ws, rng=lambda: RNG.randrange(1, 2**200))
    assert len(proofs) == 2
    assert verify(vk, proofs[0], pubs[0])
    assert verify(vk, proofs[1], pubs[1])
    # cross-check: proof 0 does not verify against proof 1's publics
    assert not verify(vk, proofs[0], pubs[1])
