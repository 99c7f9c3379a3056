"""ChaCha20 stream AIR replica — constraint evaluation at a point.

Mirrors the reference evaluator exactly (column read order and constraint
emission order), operating on QM31 values — used for the verifier's OODS
composition check and the prover's composition polynomial:
  stwo/src/chacha/bitwise/constraints_stream.rs (ChaChaStreamEvalAtRow)

Column layout (33280 cols, all single-sample at offset 0):
  initial state bits (16 x 32, LSB-first), then per quarter-round op the
  result bits (+ carries for adds), final keystream adds, plaintext bits,
  public ciphertext bits. Constraint count 54784.

The accumulator follows stwo's PointEvaluationAccumulator: the running
sum is acc = acc * alpha + constraint, i.e. the FIRST emitted constraint
ends up with the HIGHEST alpha power.
"""
from __future__ import annotations

from . import field as F

N_COLS = 33280
N_CONSTRAINTS = 54784
STATE_SIZE = 16

_QR_IDX = [(0, 4, 8, 12), (1, 5, 9, 13), (2, 6, 10, 14), (3, 7, 11, 15),
           (0, 5, 10, 15), (1, 6, 11, 12), (2, 7, 8, 13), (3, 4, 9, 14)]


class _QM31Ops:
    add = staticmethod(F.add)
    sub = staticmethod(F.sub)
    mul = staticmethod(F.mul)
    one = F.ONE
    zero = F.ZERO


class _M31VecOps:
    """Element = numpy int64 vector of M31 values (one per position)."""

    def __init__(self, npos):
        import numpy as np
        self.np = np
        self.one = np.ones(npos, dtype=np.int64)
        self.zero = np.zeros(npos, dtype=np.int64)

    def add(self, a, b):
        return (a + b) % F.P

    def sub(self, a, b):
        return (a - b) % F.P

    def mul(self, a, b):
        return (a * b) % F.P


class _Eval:
    """Walks columns in order, collecting constraint values."""

    def __init__(self, cols, ops):
        self.cols = cols
        self.ops = ops
        self.i = 0
        self.constraints = []

    def next_mask(self):
        v = self.cols[self.i]
        self.i += 1
        return v

    def con(self, v):
        self.constraints.append(v)

    def next_u32(self):
        o = self.ops
        bits = []
        for _ in range(32):
            b = self.next_mask()
            self.con(o.mul(b, o.sub(o.one, b)))          # boolean
            bits.append(b)
        return bits

    def add_u32(self, a, b):
        o = self.ops
        result = self.next_u32()
        carries = [self.next_mask() for _ in range(32)]
        for i in range(32):
            cin = o.zero if i == 0 else carries[i - 1]
            c = carries[i]
            self.con(o.mul(c, o.sub(o.one, c)))          # carry boolean
            # result + 2*carry - a - b - carry_in
            self.con(o.sub(o.sub(o.sub(o.add(result[i], o.add(c, c)),
                                       a[i]), b[i]), cin))
        return result

    def xor_rotl_u32(self, a, b, r):
        o = self.ops
        result = self.next_u32()
        for i in range(32):
            src = (i + 32 - r) % 32
            ab = o.mul(a[src], b[src])
            self.con(o.add(o.sub(o.sub(result[i], a[src]), b[src]),
                           o.add(ab, ab)))
        return result

    def quarter_round(self, v, a, b, c, d):
        v[a] = self.add_u32(v[a], v[b])
        v[d] = self.xor_rotl_u32(v[a], v[d], 16)
        v[c] = self.add_u32(v[c], v[d])
        v[b] = self.xor_rotl_u32(v[c], v[b], 12)
        v[a] = self.add_u32(v[a], v[b])
        v[d] = self.xor_rotl_u32(v[a], v[d], 8)
        v[c] = self.add_u32(v[c], v[d])
        v[b] = self.xor_rotl_u32(v[c], v[b], 7)


def _walk(cols, ops):
    e = _Eval(cols, ops)
    initial = [e.next_u32() for _ in range(STATE_SIZE)]
    v = list(initial)
    for _ in range(10):
        for (a, b, c, d) in _QR_IDX:
            e.quarter_round(v, a, b, c, d)
    keystream = [e.add_u32(v[i], initial[i]) for i in range(STATE_SIZE)]
    plaintext = [e.next_u32() for _ in range(STATE_SIZE)]
    ciphertext = [e.next_u32() for _ in range(STATE_SIZE)]
    o = ops
    for i in range(STATE_SIZE):
        for bi in range(32):
            a, b = keystream[i][bi], plaintext[i][bi]
            ab = o.mul(a, b)
            computed = o.sub(o.add(a, b), o.add(ab, ab))
            e.con(o.sub(computed, ciphertext[i][bi]))
    assert e.i == N_COLS, e.i
    assert len(e.constraints) == N_CONSTRAINTS, len(e.constraints)
    return e.constraints


def evaluate_constraints(cols):
    """cols: 33280 QM31 values (the per-column samples at one point).
    Returns the list of 54784 constraint values in emission order."""
    return _walk(cols, _QM31Ops())


def evaluate_constraints_m31(cols_matrix):
    """cols_matrix: [33280, npos] int64 M31 values (LDE evals). Returns
    [54784, npos] int64 constraint values (prover-side, all positions)."""
    import numpy as np
    npos = cols_matrix.shape[1]
    cols = [cols_matrix[i] for i in range(cols_matrix.shape[0])]
    out = _walk(cols, _M31VecOps(npos))
    return np.stack(out)


def accumulate(constraints, alpha):
    """stwo PointEvaluationAccumulator: acc = acc*alpha + c, in order."""
    acc = F.ZERO
    for c in constraints:
        acc = F.add(F.mul(acc, alpha), c)
    return acc
