"""Field-arithmetic oracle tests: limb kernels vs python bigints.

Mirrors the reference oracle pattern (SURVEY.md §4.2): every TPU kernel gets an
independent host implementation to check against.
"""
import random

import jax.numpy as jnp
import numpy as np
import pytest

from zksc_tpu.fields import Fp, Fr, LimbField

RNG = random.Random(1234)


def rand_elems(F, n):
    return [RNG.randrange(F.p) for _ in range(n)]


@pytest.mark.parametrize("F", [Fp, Fr], ids=["Fp", "Fr"])
def test_roundtrip(F):
    xs = rand_elems(F, 7) + [0, 1, F.p - 1]
    dev = F.to_device(xs)
    assert F.from_device(dev) == [x % F.p for x in xs]


@pytest.mark.parametrize("F", [Fp, Fr], ids=["Fp", "Fr"])
def test_add_sub_neg(F):
    n = 33
    a, b = rand_elems(F, n), rand_elems(F, n)
    a += [0, F.p - 1, F.p - 1]
    b += [0, F.p - 1, 1]
    da, db = F.to_device(a), F.to_device(b)
    assert F.from_device(F.add(da, db)) == [(x + y) % F.p for x, y in zip(a, b)]
    assert F.from_device(F.sub(da, db)) == [(x - y) % F.p for x, y in zip(a, b)]
    assert F.from_device(F.neg(da)) == [(-x) % F.p for x in a]


@pytest.mark.parametrize("F", [Fp, Fr], ids=["Fp", "Fr"])
def test_mont_mul(F):
    n = 17
    a, b = rand_elems(F, n), rand_elems(F, n)
    a += [0, 1, F.p - 1]
    b += [F.p - 1, F.p - 1, F.p - 1]
    da, db = F.to_device(a), F.to_device(b)
    got = F.from_device(F.mont_mul(da, db))
    assert got == [(x * y) % F.p for x, y in zip(a, b)]


def test_mont_pow_inv():
    F = Fr
    a = rand_elems(F, 5)
    da = F.to_device(a)
    got = F.from_device(F.mont_pow(da, 12345))
    assert got == [pow(x, 12345, F.p) for x in a]
    inv = F.from_device(F.inv(da))
    assert inv == [pow(x, -1, F.p) for x in a]


def test_to_from_mont():
    F = Fp
    a = rand_elems(F, 9)
    plain = F.to_device(a, mont=False)
    m = F.to_mont(plain)
    assert F.from_device(m) == a
    back = F.from_mont(m)
    assert F.from_device(back, mont=False) == a


def test_normalize_and_wide_reduce():
    """Simulate a segment-sum accumulation: limbs holding full uint32 sums."""
    F = Fr
    vals = rand_elems(F, 4)
    k = 500  # 500-fold accumulation
    raw_int = sum(vals) * (k // len(vals)) + sum(vals[: k % len(vals)])
    # build raw uint32 limbs by summing per-limb without carries
    accum = [np.zeros(1, dtype=np.uint64) for _ in range(F.L)]
    reps = [vals[i % len(vals)] for i in range(k)]
    for v in reps:
        from zksc_tpu.fields import int_to_limbs
        lv = int_to_limbs(v, F.L)
        for j in range(F.L):
            accum[j] += np.uint64(lv[j])
    assert all(int(x[0]) < 2**32 for x in accum)
    raw = [jnp.asarray(np.asarray(x, dtype=np.uint32)) for x in accum]
    norm = F.normalize_u32_limbs(raw)
    red = F.mont_reduce_wide(norm)
    # values were plain residues, so result is sum * R^{-1}; undo via to_mont
    got = F.from_device(F.to_mont(red), mont=False)
    assert got[0] == (sum(reps)) % F.p
    assert (sum(reps)) % F.p == raw_int % F.p


def test_eq_select_iszero():
    F = Fp
    a = F.to_device([5, 0, 7])
    b = F.to_device([5, 0, 8])
    np.testing.assert_array_equal(np.asarray(F.eq(a, b)), [True, True, False])
    np.testing.assert_array_equal(np.asarray(F.is_zero(a)), [False, True, False])
    sel = F.select(F.eq(a, b), a, F.to_device([1, 1, 1]))
    assert F.from_device(sel) == [5, 0, 1]


def test_small_field_generic():
    """LimbField is generic over modulus — check with a small prime."""
    F = LimbField(65521, 2, name="F65521")
    a, b = [123, 456, 65520], [789, 65520, 65520]
    da, db = F.to_device(a), F.to_device(b)
    assert F.from_device(F.mont_mul(da, db)) == [(x * y) % F.p for x, y in zip(a, b)]
