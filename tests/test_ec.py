"""Device EC ops / MSM vs host BN254 oracle."""
import random

import jax.numpy as jnp
import numpy as np

from zksc_tpu.curve import bn254_host as host
from zksc_tpu.fields import Fp, Fr
from zksc_tpu.ops.ec import (
    G1_OPS, G2_OPS, JacPoint, g1_jac_to_host_affine, g1_points_to_device,
    g2_jac_to_host_affine, g2_points_to_device, jac_add, jac_double,
    msm_double_and_add, scalars_to_bits,
)

RNG = random.Random(99)


def rand_g1(n):
    return [host.g1_mul(host.G1_GEN, RNG.randrange(1, host.R)) for _ in range(n)]


def dev_bits(scalars):
    plain = Fr.to_device(scalars, mont=False)
    return scalars_to_bits(Fr, plain, 254)


def test_jac_double_add_vs_host():
    pts = rand_g1(4)
    dev = g1_points_to_device(Fp, pts)
    doubled = g1_jac_to_host_affine(Fp, jac_double(G1_OPS, dev), host.P)
    assert doubled == [host.g1_mul(p, 2) for p in pts]

    pts2 = rand_g1(4)
    dev2 = g1_points_to_device(Fp, pts2)
    summed = g1_jac_to_host_affine(Fp, jac_add(G1_OPS, dev, dev2), host.P)
    assert summed == [host.g1_add(a, b) for a, b in zip(pts, pts2)]


def test_jac_add_edge_cases():
    p = rand_g1(1)[0]
    cases_a = [p, None, p, p]
    cases_b = [None, p, p, host.g1_neg(p)]
    da = g1_points_to_device(Fp, cases_a)
    db = g1_points_to_device(Fp, cases_b)
    out = g1_jac_to_host_affine(Fp, jac_add(G1_OPS, da, db), host.P)
    assert out == [p, p, host.g1_mul(p, 2), None]


def test_msm_g1_vs_host():
    n = 8
    pts = rand_g1(n - 1) + [None]           # include an infinity point
    scalars = [RNG.randrange(host.R) for _ in range(n - 1)] + [12345]
    dev = g1_points_to_device(Fp, pts)
    res = msm_double_and_add(G1_OPS, dev, dev_bits(scalars), 254)
    got = g1_jac_to_host_affine(Fp, res, host.P)[0]
    want = None
    for s, p in zip(scalars, pts):
        want = host.g1_add(want, host.g1_mul(p, s))
    assert got == want


def test_msm_g1_zero_scalars():
    pts = rand_g1(2)
    scalars = [0, 0]
    dev = g1_points_to_device(Fp, pts)
    res = msm_double_and_add(G1_OPS, dev, dev_bits(scalars), 254)
    assert g1_jac_to_host_affine(Fp, res, host.P)[0] is None


def test_g2_ops_and_msm():
    n = 4
    pts = [host.g2_mul(host.G2_GEN, RNG.randrange(1, host.R)) for _ in range(n)]
    dev = g2_points_to_device(Fp, pts)
    doubled = g2_jac_to_host_affine(Fp, jac_double(G2_OPS, dev), host.P)
    assert doubled == [host.g2_mul(p, 2) for p in pts]

    scalars = [RNG.randrange(host.R) for _ in range(n)]
    res = msm_double_and_add(G2_OPS, dev, dev_bits(scalars), 254)
    got = g2_jac_to_host_affine(Fp, res, host.P)[0]
    want = None
    for s, p in zip(scalars, pts):
        want = host.g2_add(want, host.g2_mul(p, s))
    assert got == want


def test_jac_add_incomplete_cases():
    from zksc_tpu.ops.ec import jac_add_incomplete
    p = rand_g1(1)[0]
    cases_a = [p, None, p, None]
    cases_b = [None, p, host.g1_neg(p), None]
    da = g1_points_to_device(Fp, cases_a)
    db = g1_points_to_device(Fp, cases_b)
    out = g1_jac_to_host_affine(Fp, jac_add_incomplete(G1_OPS, da, db), host.P)
    assert out == [p, p, None, None]
    # distinct points add correctly
    q = rand_g1(1)[0]
    da2 = g1_points_to_device(Fp, [p])
    db2 = g1_points_to_device(Fp, [q])
    out2 = g1_jac_to_host_affine(Fp, jac_add_incomplete(G1_OPS, da2, db2), host.P)
    assert out2 == [host.g1_add(p, q)]
