"""Vectorized circle FFT for the stwo-compat prover (numpy int64, M31).

Interpolation (values -> coeffs in the canonical circle-FFT basis
b_j = y^(j&1) * x^((j>>1)&1) * prod_k pi_k(x)^bits, pi_{k+1} = 2pi_k^2-1)
and evaluation (coeffs -> values on a same-or-larger circle domain), both
in the bit-reversed storage order used throughout (fold siblings
adjacent). Replaces the O(N^2) dense-matrix path of trace.LdeContext for
large log sizes; validated bit-exactly against it (tests).

Butterflies:
  ifft level 0 (y):   e = (v0+v1)/2,  o = (v0-v1) / (2*y)
  ifft level k (x):   e = (v0+v1)/2,  o = (v0-v1) / (2*t)
  fft              :  v0 = e + t*o,   v1 = e - t*o
with twiddles at the pair's local position in the level's (line) domain;
coefficient index bit k selects the e/o branch of level k (bit 0 = y).
"""
from __future__ import annotations

import numpy as np

from .circle import CanonicCoset, LOG_ORDER, bit_reverse, point_at_index
from .field import P

_INV2 = pow(2, P - 2, P)


def _twiddle_layers(log_size: int):
    """layers[0][k] = y at circle-domain stored index 2k; layers[l>=1][k]
    = x of the (l-1)-times-doubled line domain at stored index 2k."""
    dom = CanonicCoset(log_size).circle_domain()
    n = 1 << log_size
    layers = [np.array([dom.at_stored(2 * k)[1] for k in range(n // 2)],
                       dtype=np.int64)]
    init = dom.half_coset.initial_index
    step = dom.half_coset.step_index
    log = dom.half_coset.log_size
    for _ in range(log_size - 1):
        xs = np.array([
            point_at_index((init + bit_reverse(2 * k, log) * step)
                           % (1 << LOG_ORDER))[0]
            for k in range(1 << (log - 1))], dtype=np.int64)
        layers.append(xs)
        init = (init * 2) % (1 << LOG_ORDER)
        step = (step * 2) % (1 << LOG_ORDER)
        log -= 1
    return layers


_TW_CACHE: dict = {}


def _tw(log_size: int):
    if log_size not in _TW_CACHE:
        layers = _twiddle_layers(log_size)
        inv = [np.array([pow(int(t), P - 2, P) for t in l],
                        dtype=np.int64) for l in layers]
        _TW_CACHE[log_size] = (layers, inv)
    return _TW_CACHE[log_size]


def interpolate(values: np.ndarray) -> np.ndarray:
    """values: [n, cols] int64, stored order -> coeffs [n, cols]."""
    values = np.asarray(values, dtype=np.int64) % P
    n = values.shape[0]
    log_size = n.bit_length() - 1
    _, inv = _tw(log_size)

    def rec(v, level):
        m = v.shape[0]
        if m == 1:
            return v
        v0, v1 = v[0::2], v[1::2]
        t = inv[level][:m // 2][:, None]
        e = ((v0 + v1) * _INV2) % P
        o = ((v0 - v1) % P * t % P * _INV2) % P
        ce = rec(e, level + 1)
        co = rec(o, level + 1)
        out = np.empty_like(v)
        out[0::2] = ce
        out[1::2] = co
        return out

    return rec(values, 0)


def evaluate(coeffs: np.ndarray, log_domain: int) -> np.ndarray:
    """coeffs: [m, cols] (m = 2^log_space, basis coeff order) -> values
    [2^log_domain, cols] on CanonicCoset(log_domain)'s circle domain."""
    coeffs = np.asarray(coeffs, dtype=np.int64) % P
    m = coeffs.shape[0]
    n = 1 << log_domain
    if m < n:
        coeffs = np.concatenate(
            [coeffs, np.zeros((n - m, coeffs.shape[1]), dtype=np.int64)])
    layers, _ = _tw(log_domain)

    def rec(c, level):
        mm = c.shape[0]
        if mm == 1:
            return c
        e = rec(c[0::2], level + 1)
        o = rec(c[1::2], level + 1)
        t = layers[level][:mm // 2][:, None]
        to = (t * o) % P
        out = np.empty_like(c)
        out[0::2] = (e + to) % P
        out[1::2] = (e - to) % P
        return out

    return rec(coeffs, 0)


def lde(values: np.ndarray, log_blowup: int = 1) -> np.ndarray:
    """values [n, cols] on CanonicCoset(log n) -> evals on the
    2^(log n + log_blowup) commitment domain (stored order)."""
    n = values.shape[0]
    log_size = n.bit_length() - 1
    return evaluate(interpolate(values), log_size + log_blowup)
