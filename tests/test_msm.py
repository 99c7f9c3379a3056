"""Pippenger MSM + windowed fixed-base vs host oracle (small shapes).

Mirrors the reference's oracle test pattern (SURVEY.md §4.2: every kernel gets
an independent-implementation oracle): device MSMs are checked against naive
host big-int EC arithmetic, including the structurally-degenerate cases that
broke an incomplete-addition formulation (0/1 scalars, duplicate table
points, identity entries, zero scalars).
"""
import random

import jax.numpy as jnp
import pytest

from zksc_tpu.curve import bn254_host as host
from zksc_tpu.fields.limb import Fp, Fr
from zksc_tpu.ops import ec, msm

RNG = random.Random(11)


def _rand_g1(n):
    return [host.g1_mul(host.G1_GEN, RNG.randrange(1, host.R)) for _ in range(n)]


def _naive(pts, scalars, mul=host.g1_mul, add=host.g1_add):
    acc = None
    for p, s in zip(pts, scalars):
        acc = add(acc, mul(p, s))
    return acc


def test_pippenger_g1_random():
    n, n_bits = 32, 40
    pts = _rand_g1(n)
    pts[3] = None                      # identity in the table
    scalars = [RNG.randrange(0, 1 << n_bits) for _ in range(n)]
    scalars[5] = 0
    dev = ec.g1_points_to_device(Fp, pts)
    sp = Fr.to_device(scalars, mont=False)
    res = msm.msm_pippenger(ec.G1_OPS, dev, sp, n_bits, c=5)
    assert res[0] == _naive(pts, scalars)


def test_pippenger_g1_bit_scalars_and_duplicates():
    """0/1 scalars (the witness-wire case) and duplicated table points make
    whole digit runs identical across windows — the case that forces complete
    additions inside the scan."""
    n, n_bits = 32, 40
    pts = _rand_g1(n)
    pts[7] = pts[2]
    pts[8] = pts[2]
    scalars = [RNG.randrange(0, 2) for _ in range(n)]
    scalars[0] = (1 << 39) | 3        # one wide scalar so all windows count
    dev = ec.g1_points_to_device(Fp, pts)
    sp = Fr.to_device(scalars, mont=False)
    res = msm.msm_pippenger(ec.G1_OPS, dev, sp, n_bits, c=5)
    assert res[0] == _naive(pts, scalars)


def test_pippenger_g1_batch():
    n, n_bits, k = 32, 32, 3
    pts = _rand_g1(n)
    rows = [[RNG.randrange(0, 1 << n_bits) for _ in range(n)] for _ in range(k)]
    dev = ec.g1_points_to_device(Fp, pts)
    sp = jnp.stack([Fr.to_device(r, mont=False) for r in rows], axis=1)
    res = msm.msm_pippenger(ec.G1_OPS, dev, sp, n_bits, c=6)
    for j in range(k):
        assert res[j] == _naive(pts, rows[j])


def test_pippenger_g2():
    n, n_bits = 16, 32
    pts = [host.g2_mul(host.G2_GEN, RNG.randrange(1, host.R)) for _ in range(n)]
    scalars = [RNG.randrange(0, 1 << n_bits) for _ in range(n)]
    scalars[1] = 1
    scalars[2] = 1
    dev = ec.g2_points_to_device(Fp, pts)
    sp = Fr.to_device(scalars, mont=False)
    res = msm.msm_pippenger(ec.G2_OPS, dev, sp, n_bits, c=5)
    expected = _naive(pts, scalars, mul=host.g2_mul, add=host.g2_add)
    assert res[0] == expected


def test_fixed_base_g1():
    scalars = [0, 1, 2, host.R - 1, RNG.randrange(host.R), 1 << 200]
    res = msm.batch_scalar_mul_fixed_base(scalars, host.G1_GEN, g2=False)
    for s, p in zip(scalars, res):
        assert p == host.g1_mul(host.G1_GEN, s)


def test_fixed_base_g2():
    scalars = [0, 1, 7, RNG.randrange(host.R)]
    res = msm.batch_scalar_mul_fixed_base(scalars, host.G2_GEN, g2=True)
    for s, p in zip(scalars, res):
        assert p == host.g2_mul(host.G2_GEN, s)
