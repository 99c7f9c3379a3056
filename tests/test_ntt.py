"""NTT tests: roundtrip, naive-DFT oracle, coset evaluation."""
import random

from zksc_tpu.fields import Fr
from zksc_tpu.ops.ntt import NTTContext, bit_reverse_perm, find_2adic_root

RNG = random.Random(42)

# one shared domain size: each distinct n compiles its own stage shapes, and
# XLA:CPU compile time dominates this suite otherwise
N = 16
_CTX = NTTContext(Fr, N)


def naive_dft(coeffs, w, p):
    n = len(coeffs)
    return [sum(c * pow(w, i * k, p) for k, c in enumerate(coeffs)) % p
            for i in range(n)]


def test_root_of_unity():
    w = find_2adic_root(Fr, 16)
    assert pow(w, 16, Fr.p) == 1
    assert pow(w, 8, Fr.p) != 1


def test_dif_dit_roundtrip():
    n = N
    ctx = _CTX
    vals = [RNG.randrange(Fr.p) for _ in range(n)]
    dev = Fr.to_device(vals)
    coeffs_br = ctx.dif_inverse(dev)
    back = ctx.dit_forward(coeffs_br)
    assert Fr.from_device(back) == vals


def test_inverse_matches_naive_dft():
    n = N
    ctx = _CTX
    coeffs = [RNG.randrange(Fr.p) for _ in range(n)]
    evals = naive_dft(coeffs, ctx.w, Fr.p)
    got_br = Fr.from_device(ctx.dif_inverse(Fr.to_device(evals)))
    br = bit_reverse_perm(n)
    got = [got_br[int(br[i])] for i in range(n)]
    assert got == coeffs


def test_coset_evaluation():
    n = N
    ctx = _CTX
    coeffs = [RNG.randrange(Fr.p) for _ in range(n)]
    evals = naive_dft(coeffs, ctx.w, Fr.p)
    coeffs_br = ctx.dif_inverse(Fr.to_device(evals))
    coset = Fr.from_device(ctx.coset_evals_from_coeffs_br(coeffs_br))
    expected = [sum(c * pow(ctx.shift * pow(ctx.w, i, Fr.p) % Fr.p, k, Fr.p)
                    for k, c in enumerate(coeffs)) % Fr.p for i in range(n)]
    assert coset == expected
    # and back
    back_br = ctx.coeffs_br_from_coset_evals(Fr.to_device(coset))
    br = bit_reverse_perm(n)
    got = Fr.from_device(back_br)
    assert [got[int(br[i])] for i in range(n)] == coeffs


def test_quotient_pipeline():
    """(a*b - c) / Z_H via coset: recover a random quotient h exactly."""
    n = N
    ctx = _CTX
    p = Fr.p
    # random h (deg < n-1), random a (deg < n); set b=a, c = a*a - h*Z_H on domain
    h = [RNG.randrange(p) for _ in range(n - 1)] + [0]
    a = [RNG.randrange(p) for _ in range(n)]

    def poly_eval(cs, x):
        return sum(c * pow(x, k, p) for k, c in enumerate(cs)) % p

    dom = [pow(ctx.w, i, p) for i in range(n)]
    a_ev = [poly_eval(a, x) for x in dom]
    c_ev = a_ev[:]  # c := a*b - h*Z_H; on the domain Z_H=0 so c = a*b there
    c_ev = [x * x % p for x in a_ev]
    # device pipeline
    da = Fr.to_device(a_ev)
    dc = Fr.to_device(c_ev)
    a_br = ctx.dif_inverse(da)
    c_br = ctx.dif_inverse(dc)
    a_cs = ctx.coset_evals_from_coeffs_br(a_br)
    c_cs = ctx.coset_evals_from_coeffs_br(c_br)
    prod = Fr.mont_mul(a_cs, a_cs)
    num = Fr.sub(prod, c_cs)
    zinv = Fr.broadcast_const(pow(ctx.z_coset_int, -1, p), (n,))
    h_cs = Fr.mont_mul(num, zinv)
    h_br = ctx.coeffs_br_from_coset_evals(h_cs)
    br = bit_reverse_perm(n)
    got = Fr.from_device(h_br)
    got_nat = [got[int(br[i])] for i in range(n)]
    # expected h: (a^2 - c)/Z_H where c interpolates a^2 on the domain.
    # Build c coefficients: c = a^2 - q*Z_H for the true quotient q = deg-(n-2)
    # part; instead verify by re-evaluating: h(x)*Z_H(x) == a(x)^2 - c(x) at a
    # random off-domain point.
    x = RNG.randrange(p)
    lhs = poly_eval(got_nat, x) * (pow(x, n, p) - 1) % p
    # interpolate c from evals: use naive inverse DFT
    n_inv = pow(n, -1, p)
    c_coeffs = [sum(ev * pow(ctx.w_inv, i * k, p) for i, ev in enumerate(c_ev))
                * n_inv % p for k in range(n)]
    rhs = (poly_eval(a, x) ** 2 - poly_eval(c_coeffs, x)) % p
    assert lhs == rhs
