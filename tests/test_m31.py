"""M31/CM31/QM31 field tests vs python-int oracles."""
import random

import numpy as np

from zksc_tpu.stark.m31 import (
    P31, cm31_inv, cm31_mul, m31_add, m31_inv, m31_mul, m31_neg, m31_sub,
    m31_to_device, qm31_inv, qm31_mul, qm31_sub,
)

RNG = random.Random(5)


def test_m31_ops():
    a = [RNG.randrange(P31) for _ in range(64)] + [0, P31 - 1, 1]
    b = [RNG.randrange(P31) for _ in range(64)] + [P31 - 1, P31 - 1, 0]
    da, db = m31_to_device(a), m31_to_device(b)
    assert np.asarray(m31_add(da, db)).tolist() == [(x + y) % P31 for x, y in zip(a, b)]
    assert np.asarray(m31_sub(da, db)).tolist() == [(x - y) % P31 for x, y in zip(a, b)]
    assert np.asarray(m31_mul(da, db)).tolist() == [(x * y) % P31 for x, y in zip(a, b)]
    assert np.asarray(m31_neg(da)).tolist() == [(-x) % P31 for x in a]


def test_m31_inv():
    a = [RNG.randrange(1, P31) for _ in range(8)]
    got = np.asarray(m31_inv(m31_to_device(a))).tolist()
    assert got == [pow(x, -1, P31) for x in a]


def _cm(x):
    return (m31_to_device([x[0]]), m31_to_device([x[1]]))


def cm_host_mul(a, b):
    return ((a[0] * b[0] - a[1] * b[1]) % P31, (a[0] * b[1] + a[1] * b[0]) % P31)


def test_cm31():
    a, b = (123456789, 987654321), (111111111, 222222222)
    got = cm31_mul(_cm(a), _cm(b))
    want = cm_host_mul(a, b)
    assert (int(got[0][0]), int(got[1][0])) == want
    inv = cm31_inv(_cm(a))
    prod = cm31_mul(_cm(a), inv)
    assert (int(prod[0][0]), int(prod[1][0])) == (1, 0)


def test_qm31_mul_inv():
    q = lambda a, b, c, d: (_cm((a, b)), _cm((c, d)))
    x = q(1, 2, 3, 4)
    y = q(5, 6, 7, 8)
    xy = qm31_mul(x, y)
    # oracle in python ints: (a0 + a1 u)(b0 + b1 u), u^2 = 2 + i
    a0, a1 = (1, 2), (3, 4)
    b0, b1 = (5, 6), (7, 8)
    t0 = cm_host_mul(a0, b0)
    t1 = cm_host_mul(a1, b1)
    t2 = cm_host_mul((a0[0] + a1[0], a0[1] + a1[1]), (b0[0] + b1[0], b0[1] + b1[1]))
    u2t1 = cm_host_mul((2, 1), t1)
    c0 = ((t0[0] + u2t1[0]) % P31, (t0[1] + u2t1[1]) % P31)
    c1 = ((t2[0] - t0[0] - t1[0]) % P31, (t2[1] - t0[1] - t1[1]) % P31)
    got = ((int(xy[0][0][0]), int(xy[0][1][0])), (int(xy[1][0][0]), int(xy[1][1][0])))
    assert got == (c0, c1)
    inv = qm31_inv(x)
    one = qm31_mul(x, inv)
    flat = (int(one[0][0][0]), int(one[0][1][0]), int(one[1][0][0]), int(one[1][1][0]))
    assert flat == (1, 0, 0, 0)
