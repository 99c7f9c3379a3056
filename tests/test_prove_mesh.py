"""Multi-chip prover determinism (SURVEY §4.3): a proof computed with every
MSM lane axis sharded over the 8-device mesh must be bit-identical to the
single-device proof of the same witness + rng, and must verify.

This exercises the REAL prove path (ProverContext with mesh= — the Pippenger
bucket MSMs run under shard_map, ops/msm.py:_window_sums_sharded), not a toy
MSM: the distribution layer the reference lacks (SURVEY §2.6).
"""
import random

import pytest

from zksc_tpu.curve import bn254_host as host
from zksc_tpu.groth16 import ProverContext, setup, verify
from zksc_tpu.parallel.mesh import make_mesh
from zksc_tpu.r1cs import check_witness, compile_circuit, generate_witness

PUB = [("out", 1)]
PRIV = [("x", 1)]


def define(api, v):
    x = v["x"][0]
    out = v["out"][0]
    acc = x
    for _ in range(12):
        acc = api.mul(acc, x)
    api.assert_eq(api.add(acc, x, api.constant(41)), out)
    bits = api.to_bits(api.add(x, api.constant(2)), 8)
    api.assert_eq(api.from_bits(bits), api.add(x, api.constant(2)))


@pytest.fixture(scope="module")
def artifacts():
    cs = compile_circuit(define, PUB, PRIV)
    srng = random.Random(23)
    pk, vk = setup(cs, rng=lambda: srng.randrange(2, host.R))
    return cs, pk, vk


def _witness(cs, x):
    out = (pow(x, 13, host.R) + x + 41) % host.R
    w = generate_witness(define, PUB, PRIV, {"out": [[out]]}, {"x": [[x]]},
                         batch=1)
    assert check_witness(cs, w)
    return w[:, 0], [out]


def test_mesh_proof_equals_single_device_proof(artifacts):
    """Sharded-Pippenger prove (force_pippenger routes the tiny circuit to
    the production bucket MSMs under shard_map) must be bit-identical to the
    single-device ladder proof of the same witness + rng."""
    cs, pk, vk = artifacts
    w, pub = _witness(cs, x=9)
    rng1, rng8 = random.Random(31), random.Random(31)
    p1 = ProverContext(cs, pk).prove(w, rng=lambda: rng1.randrange(host.R))
    p8 = ProverContext(cs, pk, mesh=make_mesh(8),
                       force_pippenger=True).prove(
        w, rng=lambda: rng8.randrange(host.R))
    assert (p1.a, p1.b, p1.c) == (p8.a, p8.b, p8.c)
    assert verify(vk, p8, pub)


def test_mesh_ladder_proof_verifies(artifacts):
    """The mesh-sharded fused-ladder path (what the driver's dryrun runs for
    tiny circuits) proves and verifies; tampered public input fails."""
    cs, pk, vk = artifacts
    w, pub = _witness(cs, x=5)
    p = ProverContext(cs, pk, mesh=make_mesh(4)).prove(w)
    assert verify(vk, p, pub)
    assert not verify(vk, p, [(pub[0] + 1) % host.R])


def test_sharded_h_pipeline_bitexact(artifacts):
    """The mesh H-pipeline (reduce-scattered COO matvec + hypercube-exchange
    NTT stages) must produce bit-identical quotient limbs to the
    single-device pipeline — same arithmetic, same order, only grouped into
    cross-device and local parts (SURVEY §2.6 NTT stage sharding)."""
    import numpy as np

    cs, pk, vk = artifacts
    w, _ = _witness(cs, x=11)
    ctx1 = ProverContext(cs, pk)
    ctx8 = ProverContext(cs, pk, mesh=make_mesh(8))
    assert ctx8._h_sharded is not None, \
        "tiny-circuit domain must tile the 8-device mesh"
    z_mont, _, _ = ctx1._witnesses_to_device([w])
    h1 = np.asarray(ctx1.compute_h_batch(z_mont))
    h8 = np.asarray(ctx8.compute_h_batch(z_mont))
    assert h1.shape == h8.shape
    assert (h1 == h8).all()
