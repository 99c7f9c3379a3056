"""ChaCha20 stream trace generation + circle-domain LDE (stwo-compatible).

Trace: one row per ChaCha block; 33280 M31 bit columns in the exact
read-order of the AIR evaluator (air.py). Rows are stored in natural block
order; stwo treats stored order as bit-reversed domain order, so stored
row r is the evaluation at trace_domain.at(bit_reverse(r)).

LDE: interpolation in the circle-FFT space via the explicit basis
  b_j(x, y) = y^(j&1) * x^((j>>1)&1) * prod_k pi_k(x)^((j>>(2+k))&1),
  pi_0 = x, pi_{k+1} = 2*pi_k^2 - 1
(dimension 2^log for a circle domain of size 2^log), evaluated on the
commitment domain. Implemented as dense M31 matrices — correctness path
for interop-scale sizes; the TPU prover batches this with the circle FFT.
"""
from __future__ import annotations

import numpy as np

from .field import P
from .circle import CanonicCoset, bit_reverse

MASK32 = 0xFFFFFFFF


def _rotl(x, r):
    return ((x << r) | (x >> (32 - r))) & MASK32


def generate_trace_row(key_words, nonce_words, counter):
    """One block's 33280 column values (python ints 0/1... and carries).
    Returns (cols, keystream_words)."""
    cols = []

    def push_u32(x):
        for i in range(32):
            cols.append((x >> i) & 1)

    def add32(a, b):
        s = a + b
        res = s & MASK32
        push_u32(res)
        # carries: carry[i] = carry out of bit i
        c = 0
        for i in range(32):
            c = ((a >> i & 1) + (b >> i & 1) + c) >> 1
            cols.append(c)
        return res

    def xor_rotl(a, b, r):
        res = _rotl(a ^ b, r)
        push_u32(res)
        return res

    state = [0x61707865, 0x3320646E, 0x79622D32, 0x6B206574,
             *key_words, counter & MASK32, *nonce_words]
    for w in state:
        push_u32(w)
    v = list(state)

    def qr(a, b, c, d):
        v[a] = add32(v[a], v[b])
        v[d] = xor_rotl(v[a], v[d], 16)
        v[c] = add32(v[c], v[d])
        v[b] = xor_rotl(v[c], v[b], 12)
        v[a] = add32(v[a], v[b])
        v[d] = xor_rotl(v[a], v[d], 8)
        v[c] = add32(v[c], v[d])
        v[b] = xor_rotl(v[c], v[b], 7)

    for _ in range(10):
        qr(0, 4, 8, 12)
        qr(1, 5, 9, 13)
        qr(2, 6, 10, 14)
        qr(3, 7, 11, 15)
        qr(0, 5, 10, 15)
        qr(1, 6, 11, 12)
        qr(2, 7, 8, 13)
        qr(3, 4, 9, 14)

    keystream = [add32(v[i], state[i]) for i in range(16)]
    return cols, keystream


def generate_stream_trace(key_words, nonce_words, counters, plaintexts,
                          ciphertexts):
    """counters/plaintexts/ciphertexts: per row (block). plaintexts and
    ciphertexts are 16-word lists per row. Returns (trace, valid) with
    trace as an int64 numpy array [n_rows, 33280]."""
    n = len(counters)
    rows = []
    valid = True
    for r in range(n):
        cols, ks = generate_trace_row(key_words, nonce_words, counters[r])
        for w in plaintexts[r]:
            for i in range(32):
                cols.append((w >> i) & 1)
        for w in ciphertexts[r]:
            for i in range(32):
                cols.append((w >> i) & 1)
        for i in range(16):
            if ks[i] ^ plaintexts[r][i] != ciphertexts[r][i]:
                valid = False
        rows.append(cols)
    return np.array(rows, dtype=np.int64), valid


# ---- circle-FFT-space interpolation / evaluation ----

def basis_eval_m31(x: int, y: int, log_size: int):
    """All 2^log basis values at an M31 point, index order j."""
    pis = [x]
    for _ in range(log_size - 2):
        pis.append((2 * pis[-1] * pis[-1] - 1) % P)
    out = []
    for j in range(1 << log_size):
        v = y if (j & 1) else 1
        for k in range(log_size - 1):
            if (j >> (1 + k)) & 1:
                v = v * pis[k] % P
        out.append(v)
    return out


def basis_eval_qm31(point, log_size: int):
    """Basis values at a QM31 point (for OODS sampling)."""
    from . import field as F
    x, y = point
    pis = [x]
    for _ in range(log_size - 2):
        p2 = F.mul(pis[-1], pis[-1])
        pis.append(F.sub(F.add(p2, p2), F.ONE))
    out = []
    for j in range(1 << log_size):
        v = y if (j & 1) else F.ONE
        for k in range(log_size - 1):
            if (j >> (1 + k)) & 1:
                v = F.mul(v, pis[k])
        out.append(v)
    return out


class LdeContext:
    """Dense interpolation/evaluation matrices for log_size -> log_size+1."""

    def __init__(self, log_size: int):
        self.log_size = log_size
        n = 1 << log_size
        tdom = CanonicCoset(log_size).circle_domain()
        rows = []
        for stored in range(n):
            pt = tdom.at(bit_reverse(stored, log_size))
            rows.append(basis_eval_m31(pt[0], pt[1], log_size))
        B = np.array(rows, dtype=object)             # n x n basis matrix
        self.B_inv = _mat_inv_mod(B, P)              # values -> coeffs
        cdom = CanonicCoset(log_size + 1).circle_domain()
        rows = []
        for stored in range(2 * n):
            pt = cdom.at(bit_reverse(stored, log_size + 1))
            rows.append(basis_eval_m31(pt[0], pt[1], log_size))
        self.E = np.array(rows, dtype=object)        # 2n x n eval matrix
        self.tdom, self.cdom = tdom, cdom

    def coeffs(self, values):
        """values: [n, cols] stored-order -> basis coeffs [n, cols]."""
        return _matmul_mod(self.B_inv, values, P)

    def lde(self, values):
        """values: [n, cols] -> commitment-domain evals [2n, cols]."""
        return _matmul_mod(self.E, self.coeffs(values), P)


def _matmul_mod(A, B, p):
    A = np.asarray(A, dtype=object)
    B = np.asarray(B, dtype=object)
    return (A @ B) % p


def _mat_inv_mod(A, p):
    n = A.shape[0]
    M = [[int(A[i][j]) % p for j in range(n)] + [1 if k == i else 0
         for k in range(n)] for i, _ in enumerate(range(n)) for _ in [0]][:]
    # Gauss-Jordan over F_p
    M = [[int(A[i][j]) % p for j in range(n)]
         + [1 if j == i else 0 for j in range(n)] for i in range(n)]
    for col in range(n):
        piv = next(r for r in range(col, n) if M[r][col] % p)
        M[col], M[piv] = M[piv], M[col]
        inv = pow(M[col][col], p - 2, p)
        M[col] = [v * inv % p for v in M[col]]
        for r in range(n):
            if r != col and M[r][col]:
                f = M[r][col]
                M[r] = [(a - f * b) % p for a, b in zip(M[r], M[col])]
    return np.array([[M[i][n + j] for j in range(n)] for i in range(n)],
                    dtype=object)
