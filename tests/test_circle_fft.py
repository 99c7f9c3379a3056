"""Circle FFT tests: domain validity, roundtrip, basis sanity."""
import random

import numpy as np

from zksc_tpu.stark.circle import CircleFFT, circle_generator, _host_pow
from zksc_tpu.stark.m31 import P31

RNG = random.Random(9)


def test_generator_order():
    g = circle_generator()
    assert (g[0] ** 2 + g[1] ** 2) % P31 == 1
    assert _host_pow(g, 1 << 31) == (1, 0)
    assert _host_pow(g, 1 << 30) != (1, 0)


def test_domain_on_circle():
    fft = CircleFFT(4)
    x, y = fft.domain_x.astype(np.uint64), fft.domain_y.astype(np.uint64)
    assert np.all((x * x + y * y) % P31 == 1)
    assert len(set(zip(fft.domain_x.tolist(), fft.domain_y.tolist()))) == fft.n


def test_roundtrip():
    for log_n in (3, 5, 8):
        fft = CircleFFT(log_n)
        vals = np.array([RNG.randrange(P31) for _ in range(fft.n)],
                        dtype=np.uint32)
        coeffs = fft.interpolate(vals)
        back = fft.evaluate(coeffs)
        assert np.asarray(back).tolist() == vals.tolist(), f"log_n={log_n}"


def test_constant_poly():
    fft = CircleFFT(4)
    c = 123456
    vals = np.full(fft.n, c, dtype=np.uint32)
    coeffs = np.asarray(fft.interpolate(vals))
    assert coeffs[0] == c
    assert not coeffs[1:].any()


def test_linearity():
    fft = CircleFFT(5)
    a = np.array([RNG.randrange(P31) for _ in range(fft.n)], dtype=np.uint32)
    b = np.array([RNG.randrange(P31) for _ in range(fft.n)], dtype=np.uint32)
    ca = np.asarray(fft.interpolate(a)).astype(np.uint64)
    cb = np.asarray(fft.interpolate(b)).astype(np.uint64)
    cab = np.asarray(fft.interpolate(((a.astype(np.uint64) + b) % P31).astype(np.uint32)))
    assert np.all((ca + cb) % P31 == cab)
