"""Batched elliptic-curve ops and multi-scalar multiplication on TPU.

Replaces the reference's Groth16 MSM hot loop (gnark-crypto asm Pippenger /
snarkjs wasm — SURVEY.md §2.5 item 1) with vectorized JAX formulations:

  - Points in Jacobian coordinates as limb arrays (see zksc_tpu.fields.limb),
    identity encoded as Z == 0. Formulas are branch-free: all cases computed,
    results selected with `where`, so everything maps onto fixed-shape VPU ops.
  - Generic over the coordinate field via a small "field ops" adapter so the
    same point formulas serve G1 (Fp) and G2 (Fp2 = Fp[i]/(i^2+1)).
  - msm_double_and_add: baseline O(254) batched ladder (correctness anchor).
  - Pippenger (windowed bucket method) lives in msm.py.

Curve: BN254 y^2 = x^3 + 3 (a=0), G2 twist y^2 = x^3 + 3/(9+i).
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..fields.limb import Fp, LimbField


class FpOps:
    """Field-ops adapter over the base field (element = uint32[L, *batch])."""

    def __init__(self, F: LimbField):
        self.F = F

    def mul(self, a, b): return self.F.mont_mul(a, b)
    def add(self, a, b): return self.F.add(a, b)
    def sub(self, a, b): return self.F.sub(a, b)
    def neg(self, a): return self.F.neg(a)

    def mul_many(self, pairs):
        """Batch k independent products into ONE field multiply: point formulas
        call this per dependency level, so the XLA graph has a handful of wide
        multiply instances instead of ~15 narrow ones (compile time and VPU
        utilization both improve)."""
        A = jnp.stack([p[0] for p in pairs], axis=1)
        B = jnp.stack([p[1] for p in pairs], axis=1)
        R = self.F.mont_mul(A, B)
        return [R[:, i] for i in range(len(pairs))]

    def select(self, cond, a, b):
        return jnp.where(cond[None], a, b)

    def is_zero(self, a): return self.F.is_zero(a)

    def zeros_like(self, a): return jnp.zeros_like(a)

    def const(self, value: int, like):
        return self.F.broadcast_const(value, like.shape[1:])

    def tile_lanes(self, a, k: int):
        return jnp.tile(a, (1, k))

    def lane_width(self, a) -> int:
        return a.shape[-1]

    def lane_map(self, fn, a):
        """Apply a lane-axis array transform (gather/slice/reshape/...) to the
        raw storage. For Fp the storage IS the logical lane layout."""
        return fn(a)

    def lane_map2(self, fn, a, b):
        return fn(a, b)


class Fp2Ops:
    """Fp2 = Fp[i]/(i^2+1); element = ONE array [L, 2N]: c0 in the first N
    lanes, c1 in the last N.

    Folding the component axis into the lane axis keeps every op a full-width
    VPU op — the earlier (c0, c1)-tuple layout produced [L, 2, N]-shaped
    intermediates whose sublane dim of 2 wasted 4x of each vector register,
    and stack/unstack copies broke fusion (measured ~3x slower point ops)."""

    def __init__(self, F: LimbField):
        self.F = F

    @staticmethod
    def _halves(a):
        n = a.shape[-1] // 2
        return a[..., :n], a[..., n:]

    def mul(self, a, b):
        F = self.F
        n = a.shape[-1] // 2
        a0, a1 = self._halves(a)
        b0, b1 = self._halves(b)
        sums = F.add(jnp.concatenate([a0, b0], axis=-1),
                     jnp.concatenate([a1, b1], axis=-1))
        A = jnp.concatenate([a, sums[..., :n]], axis=-1)     # [L, 3N]
        B = jnp.concatenate([b, sums[..., n:]], axis=-1)
        R = F.mont_mul(A, B)
        t0, t1, t2 = R[..., :n], R[..., n:2 * n], R[..., 2 * n:]
        d = F.sub(jnp.concatenate([t0, t2], axis=-1),
                  jnp.concatenate([t1, t0], axis=-1))
        c1 = F.sub(d[..., n:], t1)
        return jnp.concatenate([d[..., :n], c1], axis=-1)

    def mul_many(self, pairs):
        """k Fp2 products as one width-3kN base multiply (lane-concatenated)."""
        if len(pairs) == 1:
            return [self.mul(*pairs[0])]
        F = self.F
        k = len(pairs)
        n = pairs[0][0].shape[-1] // 2
        a0 = jnp.concatenate([a[..., :n] for (a, b) in pairs], axis=-1)
        a1 = jnp.concatenate([a[..., n:] for (a, b) in pairs], axis=-1)
        b0 = jnp.concatenate([b[..., :n] for (a, b) in pairs], axis=-1)
        b1 = jnp.concatenate([b[..., n:] for (a, b) in pairs], axis=-1)
        m = k * n
        sums = F.add(jnp.concatenate([a0, b0], axis=-1),
                     jnp.concatenate([a1, b1], axis=-1))
        A = jnp.concatenate([a0, a1, sums[..., :m]], axis=-1)
        B = jnp.concatenate([b0, b1, sums[..., m:]], axis=-1)
        R = F.mont_mul(A, B)
        t0, t1, t2 = R[..., :m], R[..., m:2 * m], R[..., 2 * m:]
        d = F.sub(jnp.concatenate([t0, t2], axis=-1),
                  jnp.concatenate([t1, t0], axis=-1))
        c0, c1 = d[..., :m], F.sub(d[..., m:], t1)
        return [jnp.concatenate([c0[..., i * n:(i + 1) * n],
                                 c1[..., i * n:(i + 1) * n]], axis=-1)
                for i in range(k)]

    def add(self, a, b):
        return self.F.add(a, b)

    def sub(self, a, b):
        return self.F.sub(a, b)

    def neg(self, a):
        return self.F.neg(a)

    def select(self, cond, a, b):
        if cond.shape[-1] * 2 == a.shape[-1]:
            # select per component half and concat the uint32 results:
            # concatenating the i1 mask itself is not implemented in Mosaic
            # ("tpu.concatenate ... vector<...xi1>"), and this form is
            # equivalent everywhere else
            n = cond.shape[-1]
            c = cond[None]
            return jnp.concatenate(
                [jnp.where(c, a[..., :n], b[..., :n]),
                 jnp.where(c, a[..., n:], b[..., n:])], axis=-1)
        return jnp.where(cond[None], a, b)

    def is_zero(self, a):
        z = self.F.is_zero(a)                  # [2N]
        n = z.shape[-1] // 2
        return jnp.logical_and(z[..., :n], z[..., n:])

    def zeros_like(self, a):
        return jnp.zeros_like(a)

    def const(self, value: int, like):
        batch = list(like.shape[1:])
        half = batch[:-1] + [batch[-1] // 2]
        return jnp.concatenate([self.F.broadcast_const(value, tuple(half)),
                                self.F.zeros(tuple(half))], axis=-1)

    def tile_lanes(self, a, k: int):
        """Repeat per-half so [c0|c1] stays contiguous after tiling."""
        a0, a1 = self._halves(a)
        return jnp.concatenate([jnp.tile(a0, (1, k)), jnp.tile(a1, (1, k))],
                               axis=-1)

    def lane_width(self, a) -> int:
        """Logical lane count (points), not raw array width."""
        return a.shape[-1] // 2

    def lane_map(self, fn, a):
        """Apply a lane-axis transform per component half, keeping the
        [c0 | c1] folded layout."""
        a0, a1 = self._halves(a)
        return jnp.concatenate([fn(a0), fn(a1)], axis=-1)

    def lane_map2(self, fn, a, b):
        a0, a1 = self._halves(a)
        b0, b1 = self._halves(b)
        return jnp.concatenate([fn(a0, b0), fn(a1, b1)], axis=-1)


class JacPoint(NamedTuple):
    """Jacobian point; coordinates are field elements (arrays or tuples)."""
    x: object
    y: object
    z: object


def jac_identity_like(fops, coord):
    one = fops.const(1, coord)
    return JacPoint(one, one, fops.zeros_like(coord))


def jac_identity_batch(fops, batch: tuple):
    """Identity point batch; `batch` counts LOGICAL lanes (points)."""
    F = fops.F
    if isinstance(fops, Fp2Ops):
        one = jnp.concatenate([F.broadcast_const(1, batch), F.zeros(batch)],
                              axis=-1)
        zero = jnp.zeros_like(one)
        return JacPoint(one, one, zero)
    return JacPoint(F.broadcast_const(1, batch), F.broadcast_const(1, batch),
                    F.zeros(batch))


def jac_double(fops, P: JacPoint) -> JacPoint:
    """2P, a=0 curve. Complete for the identity (Z=0 -> Z3=0).
    3 batched multiply levels."""
    A, B, Z3 = fops.mul_many([(P.x, P.x), (P.y, P.y),
                              (fops.add(P.y, P.y), P.z)])
    xb = fops.add(P.x, B)
    E = fops.add(fops.add(A, A), A)
    C, t, F_ = fops.mul_many([(B, B), (xb, xb), (E, E)])
    D2 = fops.sub(fops.sub(t, A), C)
    D = fops.add(D2, D2)                      # 2((X+B)^2 - A - C)
    X3 = fops.sub(F_, fops.add(D, D))
    C2 = fops.add(C, C)
    C4 = fops.add(C2, C2)
    C8 = fops.add(C4, C4)
    (Y3a,) = fops.mul_many([(E, fops.sub(D, X3))])
    Y3 = fops.sub(Y3a, C8)
    return JacPoint(X3, Y3, Z3)


def jac_add(fops, P: JacPoint, Q: JacPoint) -> JacPoint:
    """P + Q, complete: handles P=O, Q=O, P=Q, P=-Q via selects."""
    Z1Z1, Z2Z2 = fops.mul_many([(P.z, P.z), (Q.z, Q.z)])
    U1, U2, T1, T2 = fops.mul_many([(P.x, Z2Z2), (Q.x, Z1Z1),
                                    (Q.z, Z2Z2), (P.z, Z1Z1)])
    S1, S2 = fops.mul_many([(P.y, T1), (Q.y, T2)])
    H = fops.sub(U2, U1)
    r = fops.sub(S2, S1)
    HH, rr, Z1Z2 = fops.mul_many([(H, H), (r, r), (P.z, Q.z)])
    HHH, V, Z3 = fops.mul_many([(H, HH), (U1, HH), (Z1Z2, H)])
    X3 = fops.sub(fops.sub(rr, HHH), fops.add(V, V))
    Y3a, Y3b = fops.mul_many([(r, fops.sub(V, X3)), (S1, HHH)])
    Y3 = fops.sub(Y3a, Y3b)
    raw = JacPoint(X3, Y3, Z3)

    p_inf = fops.is_zero(P.z)
    q_inf = fops.is_zero(Q.z)
    same = jnp.logical_and(fops.is_zero(H), fops.is_zero(r))
    # neither infinite:
    dbl = jac_double(fops, P)
    sel = lambda c, a, b: JacPoint(fops.select(c, a.x, b.x),
                                   fops.select(c, a.y, b.y),
                                   fops.select(c, a.z, b.z))
    res = sel(jnp.logical_and(same, jnp.logical_not(jnp.logical_or(p_inf, q_inf))),
              dbl, raw)          # P == Q -> double (P=-Q leaves Z3=0 = identity)
    res = sel(p_inf, Q, res)
    res = sel(q_inf, P, res)
    return res


def jac_add_incomplete(fops, P: JacPoint, Q: JacPoint) -> JacPoint:
    """P + Q handling the identity cases but NOT P == Q (returns the identity
    there instead of 2P). Safe inside MSM ladders: the accumulator equals the
    addend point only when the scalar prefix s satisfies 2s ≡ 1 (mod r) — a
    single 253-bit prefix, probability ~2^-250 for honest inputs, and a wrong
    proof merely fails verification. Saves the embedded jac_double of the
    complete formula (~2x fewer multiplies per ladder step)."""
    Z1Z1, Z2Z2 = fops.mul_many([(P.z, P.z), (Q.z, Q.z)])
    U1, U2, T1, T2 = fops.mul_many([(P.x, Z2Z2), (Q.x, Z1Z1),
                                    (Q.z, Z2Z2), (P.z, Z1Z1)])
    S1, S2 = fops.mul_many([(P.y, T1), (Q.y, T2)])
    H = fops.sub(U2, U1)
    r = fops.sub(S2, S1)
    HH, rr, Z1Z2 = fops.mul_many([(H, H), (r, r), (P.z, Q.z)])
    HHH, V, Z3 = fops.mul_many([(H, HH), (U1, HH), (Z1Z2, H)])
    X3 = fops.sub(fops.sub(rr, HHH), fops.add(V, V))
    Y3a, Y3b = fops.mul_many([(r, fops.sub(V, X3)), (S1, HHH)])
    Y3 = fops.sub(Y3a, Y3b)
    raw = JacPoint(X3, Y3, Z3)
    p_inf = fops.is_zero(P.z)
    q_inf = fops.is_zero(Q.z)
    sel = lambda c, a, b: JacPoint(fops.select(c, a.x, b.x),
                                   fops.select(c, a.y, b.y),
                                   fops.select(c, a.z, b.z))
    res = sel(p_inf, Q, raw)
    res = sel(q_inf, P, res)
    return res


def affine_to_jac(fops, x, y, is_inf=None) -> JacPoint:
    """Affine (x, y) mont-form -> Jacobian; (is_inf mask optional)."""
    one = fops.const(1, x)
    if is_inf is None:
        is_inf = jnp.logical_and(fops.is_zero(x), fops.is_zero(y))
    z = fops.select(is_inf, fops.zeros_like(one), one)
    return JacPoint(x, y, z)


@functools.partial(jax.jit, static_argnums=(0, 2))
def scalars_to_bits(F: LimbField, scalars_plain, n_bits: int):
    """Non-Montgomery scalar limbs uint32[L, N] -> bits uint32[n_bits, N],
    little-endian bit order."""
    outs = []
    for k in range(n_bits):
        outs.append((scalars_plain[k // 16] >> (k % 16)) & 1)
    return jnp.stack(outs)


@functools.partial(jax.jit, static_argnums=0)
def _jac_add_jit(fops, P, Q):
    return jac_add(fops, P, Q)


@functools.partial(jax.jit, static_argnums=0)
def _jac_dbl_jit(fops, P):
    return jac_double(fops, P)


def _msm_step(fops, acc: JacPoint, points: JacPoint, bits_k) -> JacPoint:
    acc = jac_double(fops, acc)
    summed = jac_add_incomplete(fops, acc, points)
    take = bits_k != 0
    return JacPoint(fops.select(take, summed.x, acc.x),
                    fops.select(take, summed.y, acc.y),
                    fops.select(take, summed.z, acc.z))


def _ladder_batch_shape(fops, points: JacPoint, scalar_bits):
    return tuple(scalar_bits.shape[1:])


@functools.partial(jax.jit, static_argnums=(0, 3))
def _ladder_fused(fops, points: JacPoint, scalar_bits, n_bits: int) -> JacPoint:
    """Per-lane s_i * P_i for all lanes (no reduction): one fori_loop body."""
    def body(k, acc):
        return _msm_step(fops, acc, points, scalar_bits[n_bits - 1 - k])

    acc0 = jac_identity_batch(fops, _ladder_batch_shape(fops, points, scalar_bits))
    return jax.lax.fori_loop(0, n_bits, body, acc0)


def _segment_reduce_fori(fops, pts: JacPoint, seg: int) -> JacPoint:
    """Reduce each length-`seg` segment of the lane axis to its first lane:
    log2(seg) rounds of `pts + roll(pts, -stride)`. Lanes j*seg hold segment
    sums afterwards (other lanes are don't-care)."""
    assert seg & (seg - 1) == 0
    rounds = seg.bit_length() - 1
    if rounds == 0:
        return pts

    def body(r, cur):
        stride = seg >> (r + 1)
        shifted = jax.tree.map(lambda a: jnp.roll(a, -stride, axis=-1), cur)
        return jac_add(fops, cur, shifted)

    return jax.lax.fori_loop(0, rounds, body, pts)


@functools.partial(jax.jit, static_argnums=(0, 3, 4))
def _msm_multi_fused(fops, points: JacPoint, bits3, n_bits: int,
                     m: int) -> JacPoint:
    """MSM over k independent scalar sets sharing one point table.

    bits3: [n_bits, k, m]; points: [L, m]. The proof axis folds into the lane
    axis (all arrays stay 2-D, so the k=1 case shares compiled kernels with
    everything else); the reduction runs per length-m segment. Returns
    JacPoint [L, k]."""
    nb_, k, _ = bits3.shape
    bits2 = bits3.reshape(nb_, k * m)
    pts = jax.tree.map(lambda a: fops.tile_lanes(a, k), points)
    acc = _ladder_fused(fops, pts, bits2, n_bits)
    acc = _segment_reduce_fori(fops, acc, m)
    return jax.tree.map(lambda a: a[..., ::m], acc)


def _tree_reduce_fori(fops, pts: JacPoint) -> JacPoint:
    """In-jit fixed-width reduction: fori_loop over log2(N) rounds of
    `pts + roll(pts, -stride)` — ONE jac_add instance in the whole graph."""
    leaf = pts.x[0] if isinstance(pts.x, tuple) else pts.x
    n = leaf.shape[-1]
    assert n & (n - 1) == 0
    rounds = n.bit_length() - 1
    if rounds == 0:
        return pts

    def body(k, cur):
        stride = n >> (k + 1)
        shifted = jax.tree.map(lambda a: jnp.roll(a, -stride, axis=-1), cur)
        return jac_add(fops, cur, shifted)

    out = jax.lax.fori_loop(0, rounds, body, pts)
    return jax.tree.map(lambda a: a[..., :1], out)


@functools.partial(jax.jit, static_argnums=(0, 3))
def _msm_fused(fops, points: JacPoint, scalar_bits, n_bits: int) -> JacPoint:
    return _tree_reduce_fori(fops, _ladder_fused(fops, points, scalar_bits, n_bits))


@functools.partial(jax.jit, static_argnums=0)
def _msm_step_jit(fops, acc, points, bits_k):
    return _msm_step(fops, acc, points, bits_k)


def _msm_multi_unfused(fops, points: JacPoint, bits3, n_bits: int, m: int) -> JacPoint:
    """Step-at-a-time variant of _msm_multi_fused: python loop over ONE
    shape-stable jitted step per bit. Used on CPU (whole-ladder compiles take
    minutes) and for G2 on the TPU (the Fp2 whole-ladder graph takes >15 min
    of remote compile; per-step dispatch costs ~30 ms x n_bits instead)."""
    nb_, k, _ = bits3.shape
    bits2 = bits3.reshape(nb_, k * m)
    pts = jax.tree.map(lambda a: fops.tile_lanes(a, k), points)
    acc = jac_identity_batch(fops, (k * m,))
    for i in range(n_bits):
        acc = _msm_step_jit(fops, acc, pts, bits2[n_bits - 1 - i])
    stride = m // 2
    while stride >= 1:
        shifted = jax.tree.map(lambda a: jnp.roll(a, -stride, axis=-1), acc)
        acc = _jac_add_jit(fops, acc, shifted)
        stride //= 2
    return jax.tree.map(lambda a: a[..., ::m], acc)


def msm_double_and_add(fops, points: JacPoint, scalar_bits, n_bits: int,
                       fused: bool | None = None) -> JacPoint:
    """Baseline batched MSM: sum_i s_i * P_i (shared point table).

    points: JacPoint over m lanes. scalar_bits: uint32[n_bits, m] for a single
    MSM (returns a width-1 point) or uint32[n_bits, k, m] for k independent
    scalar sets (returns a width-k point; the proof axis is folded into the
    lane axis so every shape stays 2-D and the k=1 compiles are reused).

    fused=True compiles the whole ladder as one XLA program — best runtime,
    but XLA:CPU takes minutes to compile it, so the CPU mesh defaults to
    fused=False: a Python loop over shape-stable jitted steps.
    """
    if fused is None:
        # G2 never fuses: its whole-ladder graph takes >15 min of remote
        # TPU compile; G1 fuses on TPU only.
        fused = jax.default_backend() != "cpu" and not isinstance(fops, Fp2Ops)
    single = scalar_bits.ndim == 2
    bits3 = scalar_bits[:, None, :] if single else scalar_bits
    m = fops.lane_width(points.x)      # logical lanes (Fp2 arrays hold 2N)
    if fused:
        return _msm_multi_fused(fops, points, bits3, n_bits, m)
    return _msm_multi_unfused(fops, points, bits3, n_bits, m)


@functools.partial(jax.jit, static_argnums=(0, 2))
def _batch_scale_jit(fops, pts: JacPoint, n_bits: int, bits) -> JacPoint:
    """acc_i = s * P_i for ONE shared scalar s over every lane (no reduction).
    bits: uint32[n_bits], LSB first. Rolled MSB-first double-and-add: a single
    jac_double + jac_add instance regardless of n_bits (compile-cheap)."""
    n = fops.lane_width(pts.x)

    def body(k, acc):
        acc = jac_double(fops, acc)
        summed = jac_add(fops, acc, pts)
        take = jnp.broadcast_to(bits[n_bits - 1 - k] != 0, (n,))
        return JacPoint(fops.select(take, summed.x, acc.x),
                        fops.select(take, summed.y, acc.y),
                        fops.select(take, summed.z, acc.z))

    return jax.lax.fori_loop(0, n_bits, body, jac_identity_batch(fops, (n,)))


def scale_points(fops, pts: JacPoint, scalar: int, n_bits: int = 254) -> JacPoint:
    """Multiply EVERY lane of a point batch by the same host-known scalar.
    Used by the setup ceremony (groth16/ceremony.py) to rerandomize the
    delta-divided pk queries: h_query and c_query are scaled by 1/d on device
    in one dispatch instead of n host scalar-mults."""
    assert 0 <= scalar < (1 << n_bits), "scalar exceeds the ladder width"
    bits = jnp.asarray([(scalar >> i) & 1 for i in range(n_bits)],
                       dtype=jnp.uint32)
    return _batch_scale_jit(fops, pts, n_bits, bits)


def _tree_reduce_rolled(fops, pts: JacPoint) -> JacPoint:
    """Fixed-width reduction: log2(N) rounds of `pts + roll(pts, -stride)`,
    all at width N (single compiled jac_add). Lane 0 holds the total."""
    def width(P):
        leaf = P.x[0] if isinstance(P.x, tuple) else P.x
        return leaf.shape[-1]

    n = width(pts)
    assert n & (n - 1) == 0
    stride = n // 2
    while stride >= 1:
        shifted = jax.tree.map(lambda a: jnp.roll(a, -stride, axis=-1), pts)
        pts = _jac_add_jit(fops, pts, shifted)
        stride //= 2
    return jax.tree.map(lambda a: a[..., :1], pts)


def jac_tree_reduce(fops, pts: JacPoint) -> JacPoint:
    """Reduce a batch of points to one by pairwise addition (log2 N batched adds).
    N must be a power of two (pad with identity)."""
    def width(P):
        leaf = P.x[0] if isinstance(P.x, tuple) else P.x
        return leaf.shape[-1]

    n = width(pts)
    assert n & (n - 1) == 0, "pad batch to a power of two"
    take = lambda t, sl: jax.tree.map(lambda a: a[..., sl], t)
    while n > 1:
        half = n // 2
        pts = jac_add(fops, take(pts, slice(0, half)), take(pts, slice(half, n)))
        n = half
    return pts


# host-side helpers --------------------------------------------------------

def g1_points_to_device(F: LimbField, pts: list) -> JacPoint:
    """List of host affine G1 points (int tuples / None) -> device JacPoint."""
    xs, ys, zs = [], [], []
    for p in pts:
        if p is None:
            xs.append(0); ys.append(1); zs.append(0)
        else:
            xs.append(p[0]); ys.append(p[1]); zs.append(1)
    return JacPoint(F.to_device(xs), F.to_device(ys), F.to_device(zs))


def g2_points_to_device(F: LimbField, pts: list) -> JacPoint:
    """Folded Fp2 layout: coord array = [L, 2N] with c0 | c1 halves."""
    xs0, xs1, ys0, ys1, zs0 = [], [], [], [], []
    for p in pts:
        if p is None:
            xs0.append(0); xs1.append(0); ys0.append(1); ys1.append(0); zs0.append(0)
        else:
            xs0.append(p[0][0]); xs1.append(p[0][1])
            ys0.append(p[1][0]); ys1.append(p[1][1]); zs0.append(1)
    zeros = [0] * len(pts)
    return JacPoint(F.to_device(xs0 + xs1), F.to_device(ys0 + ys1),
                    F.to_device(zs0 + zeros))


def g1_jac_to_host_affine(F: LimbField, pt: JacPoint, p_mod: int) -> list:
    """Device Jacobian G1 -> host affine int tuples (None for identity)."""
    xs = F.from_device(pt.x)
    ys = F.from_device(pt.y)
    zs = F.from_device(pt.z)
    out = []
    for x, y, z in zip(xs, ys, zs):
        if z == 0:
            out.append(None)
            continue
        zi = pow(z, -1, p_mod)
        zi2 = zi * zi % p_mod
        out.append((x * zi2 % p_mod, y * zi2 * zi % p_mod))
    return out


def g2_jac_to_host_affine(F: LimbField, pt: JacPoint, p_mod: int) -> list:
    def halves(a):
        n = a.shape[-1] // 2
        return F.from_device(a[..., :n]), F.from_device(a[..., n:])
    x0, x1 = halves(pt.x)
    y0, y1 = halves(pt.y)
    z0, z1 = halves(pt.z)
    from ..curve.bn254_host import f2_inv, f2_mul
    out = []
    for i in range(len(x0)):
        if z0[i] == 0 and z1[i] == 0:
            out.append(None)
            continue
        zi = f2_inv((z0[i], z1[i]))
        zi2 = f2_mul(zi, zi)
        out.append((f2_mul((x0[i], x1[i]), zi2),
                    f2_mul((y0[i], y1[i]), f2_mul(zi2, zi))))
    return out


G1_OPS = FpOps(Fp)
G2_OPS = Fp2Ops(Fp)
