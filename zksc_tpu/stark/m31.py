"""Mersenne-31 field arithmetic (M31, CM31, QM31) for the Circle-STARK path.

TPU-native equivalent of stwo's SIMD field backend (reference behavior:
stwo/src/chacha/mod.rs Fu32/M31 packing — studied, re-designed): M31 elements
live one-per-lane in uint32 arrays; multiplication uses 16-bit splitting so
every intermediate fits uint32 (no 64-bit emulation on TPU).

  M31:  p = 2^31 - 1
  CM31: M31[i] / (i^2 + 1)           (elements = (a, b) tuples)
  QM31: CM31[u] / (u^2 - (2 + i))    (elements = ((a,b),(c,d)))

All functions are elementwise over arbitrary-shape uint32 arrays (values < p).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

P31 = (1 << 31) - 1


def m31_reduce_u32(x):
    """Reduce a full uint32 value (< 2^32) to [0, p)."""
    r = (x & P31) + (x >> 31)
    return jnp.where(r >= P31, r - P31, r)


def m31_add(a, b):
    return m31_reduce_u32(a + b)        # a+b < 2^32 since a,b < 2^31


def m31_sub(a, b):
    return m31_reduce_u32(a + (P31 - b))


def m31_neg(a):
    r = P31 - a
    return jnp.where(r == P31, jnp.uint32(0), r)


def m31_mul(a, b):
    """Product via 16-bit splitting; all intermediates < 2^32.

    a*b = ah*bh*2^32 + (ah*bl + al*bh)*2^16 + al*bl
    2^32 = 2 (mod p); x*2^16 (x < 2^32) = (x >> 15) + (x & 0x7FFF) * 2^16.
    """
    al, ah = a & 0xFFFF, a >> 16
    bl, bh = b & 0xFFFF, b >> 16
    hh = ah * bh                        # < 2^30
    mid = ah * bl + al * bh             # < 2^32
    ll = al * bl                        # < 2^32
    t = m31_reduce_u32(hh + hh)         # hh * 2^32 mod p
    mid_lo = (mid & 0x7FFF) << 16       # < 2^31
    mid_hi = mid >> 15                  # < 2^17
    t = m31_add(t, m31_reduce_u32(mid_lo + mid_hi))
    return m31_add(t, m31_reduce_u32(ll))


def m31_pow(a, e: int):
    result = jnp.ones_like(a)
    for bit in bin(e)[2:]:
        result = m31_mul(result, result)
        if bit == "1":
            result = m31_mul(result, a)
    return result


def m31_inv(a):
    return m31_pow(a, P31 - 2)


# ---------------- CM31 = M31[i]/(i^2+1) ----------------

def cm31_add(a, b):
    return (m31_add(a[0], b[0]), m31_add(a[1], b[1]))


def cm31_sub(a, b):
    return (m31_sub(a[0], b[0]), m31_sub(a[1], b[1]))


def cm31_neg(a):
    return (m31_neg(a[0]), m31_neg(a[1]))


def cm31_mul(a, b):
    t0 = m31_mul(a[0], b[0])
    t1 = m31_mul(a[1], b[1])
    t2 = m31_mul(m31_add(a[0], a[1]), m31_add(b[0], b[1]))
    return (m31_sub(t0, t1), m31_sub(m31_sub(t2, t0), t1))


def cm31_inv(a):
    d = m31_inv(m31_add(m31_mul(a[0], a[0]), m31_mul(a[1], a[1])))
    return (m31_mul(a[0], d), m31_mul(m31_neg(a[1]), d))


# ---------------- QM31 = CM31[u]/(u^2 - (2+i)) ----------------

def _mul_2pi(a):
    """Multiply a CM31 element by (2 + i)."""
    two_a = cm31_add(a, a)
    ia = (m31_neg(a[1]), a[0])
    return cm31_add(two_a, ia)


def qm31_add(a, b):
    return (cm31_add(a[0], b[0]), cm31_add(a[1], b[1]))


def qm31_sub(a, b):
    return (cm31_sub(a[0], b[0]), cm31_sub(a[1], b[1]))


def qm31_mul(a, b):
    t0 = cm31_mul(a[0], b[0])
    t1 = cm31_mul(a[1], b[1])
    t2 = cm31_mul(cm31_add(a[0], a[1]), cm31_add(b[0], b[1]))
    c0 = cm31_add(t0, _mul_2pi(t1))
    c1 = cm31_sub(cm31_sub(t2, t0), t1)
    return (c0, c1)


def qm31_inv(a):
    """(a0 + a1 u)^-1 = (a0 - a1 u) / (a0^2 - (2+i) a1^2)."""
    d = cm31_sub(cm31_mul(a[0], a[0]), _mul_2pi(cm31_mul(a[1], a[1])))
    di = cm31_inv(d)
    return (cm31_mul(a[0], di), cm31_mul(cm31_neg(a[1]), di))


# host helpers
def m31_to_device(vals):
    return jnp.asarray(np.asarray(vals, dtype=np.uint32))


def qm31_const(a: int, b: int, c: int, d: int, shape=()):
    mk = lambda v: jnp.full(shape, v, dtype=jnp.uint32)
    return ((mk(a), mk(b)), (mk(c), mk(d)))
