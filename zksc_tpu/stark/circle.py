"""Circle group over M31 and the circle FFT (Circle-STARK core primitive).

TPU-native equivalent of stwo's circle-domain machinery (reference behavior:
stwo twiddle precompute at air_stream.rs:185-189 — studied; implemented fresh
from the Circle-STARKs construction):

  - circle C(M31): x^2 + y^2 = 1, a cyclic group of order 2^31
  - size-N standard coset: odd powers {G_{n+1}^(2i+1)}, closed under
    conjugation (x, y) -> (x, -y)
  - circle FFT: one y-fold layer, then log2(N)-1 x-fold layers through the
    doubling map pi(x) = 2x^2 - 1

Domain ordering (documented, self-consistent): index i < N/2 holds
G_{n+1}^(2i+1); index N/2 + i holds its conjugate. At every x-level the
+-x pairing is (i, m-1-i). Evaluations <-> coefficients in this basis
roundtrip exactly; stwo bit-exact ordering is a later compat milestone.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .m31 import P31, m31_add, m31_inv, m31_mul, m31_sub

ORDER_LOG = 31     # |C(M31)| = 2^31


def _host_mul(p1, p2):
    x1, y1 = p1
    x2, y2 = p2
    return ((x1 * x2 - y1 * y2) % P31, (x1 * y2 + y1 * x2) % P31)


def _host_pow(p, k):
    result = (1, 0)
    addend = p
    while k:
        if k & 1:
            result = _host_mul(result, addend)
        addend = _host_mul(addend, addend)
        k >>= 1
    return result


@functools.lru_cache(maxsize=1)
def circle_generator():
    """A generator of the full 2^31 circle group (found programmatically)."""
    for x in range(2, 1000):
        # y^2 = 1 - x^2; find a square root if one exists (p % 4 == 3 would
        # allow pow((p+1)/4) but p = 2^31-1 ≡ 3 mod 4 -> sqrt = v^((p+1)/4))
        v = (1 - x * x) % P31
        y = pow(v, (P31 + 1) // 4, P31)
        if y * y % P31 != v:
            continue
        g = (x, y)
        # order divides 2^31; generator iff g^(2^30) != identity
        if _host_pow(g, 1 << 30) != (1, 0):
            return g
    raise RuntimeError("no circle generator found")


class CircleFFT:
    """Precomputed domain + twiddles for a fixed power-of-two size N."""

    def __init__(self, log_n: int):
        assert 2 <= log_n <= 30
        self.log_n = log_n
        self.n = n = 1 << log_n
        g_big = _host_pow(circle_generator(), 1 << (ORDER_LOG - (log_n + 1)))
        # first-half points: odd powers g_big^(2i+1)
        pts = []
        cur = g_big
        step = _host_mul(g_big, g_big)
        for _ in range(n // 2):
            pts.append(cur)
            cur = _host_mul(cur, step)
        xs = np.array([p[0] for p in pts], dtype=np.uint32)
        ys = np.array([p[1] for p in pts], dtype=np.uint32)
        self.domain_x = np.concatenate([xs, xs])
        self.domain_y = np.concatenate([ys, (P31 - ys) % P31])
        # per-level x twiddles (first half of each level's domain)
        self._x_levels = []
        cur_x = xs
        while len(cur_x) >= 2:
            self._x_levels.append(cur_x[: len(cur_x) // 2].copy())
            cur_x = (2 * cur_x[: len(cur_x) // 2].astype(np.uint64) ** 2 - 1) % P31
            cur_x = cur_x.astype(np.uint32)
        inv2 = pow(2, -1, P31)
        self._inv2 = jnp.uint32(inv2)
        self._inv_y = jnp.asarray(
            np.array([pow(int(y), -1, P31) for y in ys], dtype=np.uint32))
        self._inv_x_levels = [
            jnp.asarray(np.array([pow(int(x), -1, P31) for x in lvl],
                                 dtype=np.uint32))
            for lvl in self._x_levels]
        self._x_levels_dev = [jnp.asarray(lvl) for lvl in self._x_levels]

    # ---- transforms ----

    @functools.partial(jax.jit, static_argnums=0)
    def interpolate(self, evals):
        """evals uint32[N] on the domain -> coefficients uint32[N]."""
        n = self.n
        half = n // 2
        a, b = evals[:half], evals[half:]
        inv2 = self._inv2
        f0 = m31_mul(m31_add(a, b), inv2)
        f1 = m31_mul(m31_mul(m31_sub(a, b), inv2), self._inv_y)
        g = jnp.stack([f0, f1])                   # [chunks, m]
        for inv_x in self._inv_x_levels:
            m = g.shape[1]
            lo, hi = g[:, : m // 2], g[:, m // 2:][:, ::-1]
            g0 = m31_mul(m31_add(lo, hi), inv2)
            g1 = m31_mul(m31_mul(m31_sub(lo, hi), inv2), inv_x[None, :])
            g = jnp.concatenate([g0, g1])         # [2*chunks, m/2]
        return g[:, 0]

    @functools.partial(jax.jit, static_argnums=0)
    def evaluate(self, coeffs):
        """coefficients uint32[N] -> evaluations uint32[N] on the domain."""
        g = coeffs[:, None]                       # [N, 1]
        for x_lvl in reversed(self._x_levels_dev):
            c = g.shape[0] // 2
            g0, g1 = g[:c], g[c:]
            t = m31_mul(x_lvl[None, : g0.shape[1]], g1)
            lo = m31_add(g0, t)
            hi = m31_sub(g0, t)[:, ::-1]
            g = jnp.concatenate([lo, hi], axis=1)
        f0, f1 = g[0], g[1]
        ys = jnp.asarray(self.domain_y[: self.n // 2])
        t = m31_mul(ys, f1)
        return jnp.concatenate([m31_add(f0, t), m31_sub(f0, t)])
