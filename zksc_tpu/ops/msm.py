"""Pippenger multi-scalar multiplication on TPU (sort + prefix-scan buckets).

Fills the role of the reference's MSM hot loop (gnark-crypto Pippenger inside
groth16.Prove, gnark/libraries/prover/impl/provers.go:175-180; snarkjs WASM
MSM, js/src/snarkjs/operator.ts:112-118 — SURVEY.md §2.5 item 1), re-designed
for vector hardware: bucket accumulation is scatter-heavy on CPUs/GPUs, so
here it becomes a sort + hierarchical prefix scan + boundary gather, all
fixed-shape full-width VPU ops.

Formulation, per c-bit window w (and per proof in a batch):

  digit d_i = bits [w*c, (w+1)*c) of scalar_i
  window sum S_w = sum_d d * B_d            (B_d = sum of P_i with d_i == d)
               = sum_{j>=1} T_j             (T_j = sum of P_i with d_i >= j)

Sorting the window's points by digit DESCENDING makes every T_j a PREFIX of
the sorted sequence: T_j = V[cnt_ge(j) - 1] where V is the inclusive prefix
sum (EC adds) and cnt_ge comes from a digit histogram. So per window:

  1. sort point indices by digit (one global XLA sort, windows+proofs
     concatenated with segment-prefixed keys)
  2. hierarchical prefix scan over the sorted points: chunk-local scans
     (fori_loop, one add instance per level) + a small Hillis-Steele top —
     ~1.1 EC adds per point, no scatters
  3. gather V at the 2^c bucket boundaries, subtract the segment prefix
     (group inverse: negate y), mask empty buckets
  4. shrinking halving-tree reduce over the bucket axis -> S_w

  MSM = sum_w 2^{c*w} * S_w      (tiny Horner combine on host)

Total arithmetic ~ windows * (1.3*n + 2*2^c) EC adds vs the ladder's
n_bits * 2 * n — about 10x less for the 254-bit H query at n = 2^16.

The prefix scan and bucket reduce use COMPLETE additions (ec.jac_add): the
P == Q doubling case occurs STRUCTURALLY there — every window's segment
contains the same point multiset, so e.g. full-segment prefix sums are equal
across windows, and witness vectors full of 0/1 wires make whole digit runs
identical; an incomplete formula would silently zero them (this was observed,
not hypothesized). Only the final V - prefix subtraction and the fixed-base
combine keep incomplete adds, where operand equality would require an
accidental (~2^-250) collision of sums of distinct point sets.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp

from ..fields.limb import Fp, W as LIMB_W
from . import ec
from .ec import JacPoint


def _jp(fops, fn, P: JacPoint) -> JacPoint:
    return JacPoint(fops.lane_map(fn, P.x), fops.lane_map(fn, P.y),
                    fops.lane_map(fn, P.z))


def _jp2(fops, fn, P: JacPoint, Q: JacPoint) -> JacPoint:
    return JacPoint(fops.lane_map2(fn, P.x, Q.x), fops.lane_map2(fn, P.y, Q.y),
                    fops.lane_map2(fn, P.z, Q.z))


@functools.partial(jax.jit, static_argnums=(1, 2))
def scalars_to_digits(scalars_plain, c: int, n_windows: int):
    """Non-Montgomery 16-bit limbs uint32[L, *batch] -> digits
    uint32[n_windows, *batch], digit w = scalar bits [w*c, (w+1)*c).
    Jitted: the eager per-window shift/or/and chain costs ~20 remote
    dispatches (~130 ms for the 254-bit MSM on axon) vs one fused call."""
    assert c <= LIMB_W, "window must fit in two 16-bit limbs"
    L = scalars_plain.shape[0]
    outs = []
    for w in range(n_windows):
        lo_bit = w * c
        lo, off = lo_bit // LIMB_W, lo_bit % LIMB_W
        d = scalars_plain[lo] >> off
        if off + c > LIMB_W and lo + 1 < L:
            d = d | (scalars_plain[lo + 1] << (LIMB_W - off))
        outs.append(d & ((1 << c) - 1))
    return jnp.stack(outs)


def _local_scan(fops, pts: JacPoint, S: int, inclusive: bool):
    """Chunk-local prefix scan along lanes: view [N] as [N//S chunks, S],
    scan within each chunk. Returns (scanned [N] position-major, chunk
    totals [N//S]).

    TPU fast path: a Pallas kernel (pallas_ec.chunk_scan) that keeps the
    whole jac_add dataflow in VMEM per lane tile — the XLA lax.scan below
    materializes the Montgomery pad-accumulators to HBM every step and was
    profiled ~10x slower. XLA path remains for CPU and odd shapes; both
    produce identical limbs."""
    N = fops.lane_width(pts.x)
    C = N // S

    from . import pallas_ec
    if pallas_ec.use_pallas() and C % pallas_ec.tile_for(fops) == 0:
        def ts(a):
            return a.reshape(a.shape[0], C, S).transpose(2, 0, 1)

        def fs(a):
            return a.transpose(1, 2, 0).reshape(a.shape[1], C * S)

        if isinstance(fops, ec.Fp2Ops):
            raws = []
            for a in (pts.x, pts.y, pts.z):
                h = a.shape[-1] // 2
                raws += [a[..., :h], a[..., h:]]
        else:
            raws = [pts.x, pts.y, pts.z]
        ys, carry = pallas_ec.chunk_scan(fops, [ts(a) for a in raws],
                                         S, inclusive)
        ys_pm = [fs(y) for y in ys]
        if isinstance(fops, ec.Fp2Ops):
            fold = lambda arrs: jnp.concatenate(arrs, axis=-1)
            out = JacPoint(fold(ys_pm[0:2]), fold(ys_pm[2:4]),
                           fold(ys_pm[4:6]))
            acc = JacPoint(fold(carry[0:2]), fold(carry[2:4]),
                           fold(carry[4:6]))
        else:
            out = JacPoint(*ys_pm)
            acc = JacPoint(*carry)
        return out, acc

    acc0 = ec.jac_identity_batch(fops, (C,))

    # lax.scan with stacked ys: each step writes its [L, C] slice once
    # (XLA-managed output buffer) instead of dynamic_update_slice'ing the
    # full [L, S*C] carry — the full-buffer updates made this scan ~3.5x
    # slower than its EC-add count.
    def _ts(a):
        # position-major [L, C*S] (lane = chunk*S + t) -> per-step [S, L, C]
        return a.reshape(a.shape[0], C, S).transpose(2, 0, 1)

    def _fs(a):
        # [S, L, C] -> position-major [L, C*S]
        return a.transpose(1, 2, 0).reshape(a.shape[1], C * S)

    # _jp concatenates Fp2 component halves along the LAST axis, which for
    # the [S, L, C] per-step layout is exactly the folded [c0 | c1] form the
    # EC ops expect per step
    xs = _jp(fops, _ts, pts)

    def step(acc, sl):
        summed = ec.jac_add(fops, acc, JacPoint(*sl))
        wr = summed if inclusive else acc
        return summed, (wr.x, wr.y, wr.z)

    acc, ys = jax.lax.scan(step, acc0, (xs.x, xs.y, xs.z))

    def from_steps(y):
        if isinstance(fops, ec.Fp2Ops):
            h = y.shape[-1] // 2
            return jnp.concatenate([_fs(y[..., :h]), _fs(y[..., h:])],
                                   axis=-1)
        return _fs(y)

    out = JacPoint(*(from_steps(y) for y in ys))
    return out, acc


def _hs_scan(fops, pts: JacPoint, exclusive: bool) -> JacPoint:
    """Global prefix scan via Hillis-Steele (log2(N) full-width adds); used
    for the small top level of the hierarchy (and tiny inputs outright).
    Strides stay STATIC (unrolled): a rolled fori with a dynamic jnp.roll
    shift was measured to take XLA:CPU compile from ~1 min to ~8 min."""
    N = fops.lane_width(pts.x)
    iota = jnp.arange(N)

    def shift(P, d):
        rolled = _jp(fops, lambda a: jnp.roll(a, d, axis=-1), P)
        ident = ec.jac_identity_batch(fops, (N,))
        cond = iota < d
        return JacPoint(fops.select(cond, ident.x, rolled.x),
                        fops.select(cond, ident.y, rolled.y),
                        fops.select(cond, ident.z, rolled.z))

    cur = shift(pts, 1) if exclusive else pts
    d = 1
    while d < N:
        cur = ec.jac_add(fops, cur, shift(cur, d))
        d *= 2
    return cur


_SCAN_S = 16          # chunk width per hierarchy level
_HS_MAX = 8192        # switch to Hillis-Steele at/below this width


def _add_wide(fops, P: JacPoint, Q: JacPoint, complete: bool) -> JacPoint:
    """Elementwise point add, routed to the VMEM-resident Pallas kernel when
    the lane count tiles (TPU); XLA otherwise. Identical results."""
    from . import pallas_ec
    n = fops.lane_width(P.x)
    if pallas_ec.use_pallas() and n % pallas_ec.tile_for(fops) == 0:
        return pallas_ec.jac_add_n(fops, P, Q, complete=complete)
    return (ec.jac_add if complete else ec.jac_add_incomplete)(fops, P, Q)


@functools.partial(jax.jit, static_argnums=(0, 3, 4, 5))
def _window_sums(fops, points: JacPoint, digits, c: int, k: int, n: int):
    """Per-(proof, window) bucket-method sums.

    points: JacPoint [L, n] (shared table). digits: uint32 [k, W, n].
    Returns JacPoint [L, k*W]: lane j*W + w = S_w for proof j."""
    W = digits.shape[1]
    two_c = 1 << c
    segs = k * W
    N = segs * n

    # ---- keys: segment-major, digit DESCENDING within segment ----
    f = (two_c - 1) - digits.astype(jnp.int32)                    # flipped
    seg_ids = jnp.arange(segs, dtype=jnp.int32).reshape(k, W, 1)
    key = (seg_ids * two_c + f).reshape(-1)
    idx = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32),
                           (k, W, n)).reshape(-1)

    # histogram -> inclusive counts over flipped digit: cnt_ge(j) = cum[., 2^c-1-j]
    counts = jax.ops.segment_sum(jnp.ones_like(key), key, num_segments=segs * two_c)
    cum = jnp.cumsum(counts.reshape(segs, two_c), axis=-1)        # [segs, 2^c]

    _, sidx = jax.lax.sort([key, idx], num_keys=1)
    pts = _jp(fops, lambda a: a[:, sidx], points)                 # [L, N]

    # ---- hierarchical prefix scan ----
    levels = []                                                   # (scan, stride)
    if N <= _HS_MAX or N % _SCAN_S:
        s0 = _hs_scan(fops, pts, exclusive=False)
    else:
        s0, tot = _local_scan(fops, pts, _SCAN_S, inclusive=True)
        stride = _SCAN_S
        while fops.lane_width(tot.x) > _HS_MAX and \
                fops.lane_width(tot.x) % _SCAN_S == 0:
            e, tot = _local_scan(fops, tot, _SCAN_S, inclusive=False)
            levels.append((e, stride))
            stride *= _SCAN_S
        levels.append((_hs_scan(fops, tot, exclusive=True), stride))

    # ---- bucket boundaries (q-major lanes: lane = q*segs + s) ----
    cnt = cum.T                                                    # [2^c, segs]
    base = (jnp.arange(segs, dtype=jnp.int32) * n)[None, :]
    pos = jnp.clip(base + cnt - 1, 0, N - 1).reshape(-1)
    V = _jp(fops, lambda a: a[:, pos], s0)
    for e, st in levels:
        lim = fops.lane_width(e.x) - 1
        ep = jnp.clip(pos // st, 0, lim)
        V = _add_wide(fops, V, _jp(fops, lambda a: a[:, ep], e),
                      complete=False)

    # subtract the segment prefix (all points of earlier segments): for
    # segment s > 0 that's V_global at position s*n - 1; identity for s == 0
    pre_pos = jnp.clip(jnp.arange(segs, dtype=jnp.int32) * n - 1, 0, N - 1)
    Pre = _jp(fops, lambda a: a[:, pre_pos], s0)
    for e, st in levels:
        lim = fops.lane_width(e.x) - 1
        ep = jnp.clip(pre_pos // st, 0, lim)
        Pre = ec.jac_add_incomplete(fops, Pre,
                                    _jp(fops, lambda a: a[:, ep], e))
    first_seg = jnp.arange(segs) == 0
    Pre = JacPoint(Pre.x, fops.neg(Pre.y),
                   fops.select(first_seg, fops.zeros_like(Pre.z), Pre.z))
    PreT = _jp(fops, lambda a: jnp.tile(a, (1, two_c)), Pre)
    T = _add_wide(fops, V, PreT, complete=False)

    # mask: empty prefix (cnt == 0) and the digit-0 bucket (q == 2^c - 1)
    q_flat = jnp.repeat(jnp.arange(two_c), segs)
    valid = jnp.logical_and(cnt.reshape(-1) > 0, q_flat != two_c - 1)
    ident = ec.jac_identity_batch(fops, (two_c * segs,))
    T = JacPoint(fops.select(valid, T.x, ident.x),
                 fops.select(valid, T.y, ident.y),
                 fops.select(valid, T.z, ident.z))

    # ---- shrinking halving reduce over the bucket axis ----
    half = two_c
    while half > 1:
        half //= 2
        lo = _jp(fops, lambda a: a[:, : half * segs], T)
        hi = _jp(fops, lambda a: a[:, half * segs: 2 * half * segs], T)
        T = _add_wide(fops, lo, hi, complete=True)
    return T                                                       # [L, segs]


@functools.partial(jax.jit, static_argnums=(0, 3))
def _fixed_base_combine(fops, table: JacPoint, digits, c: int):
    """result_i = sum_w table[w * 2^c + digits[w, i]] — one gather + one
    incomplete add per window (fori body, single add instance)."""
    W = digits.shape[0]
    n = digits.shape[1]
    acc0 = ec.jac_identity_batch(fops, (n,))

    def body(w, acc):
        idx = (w * (1 << c) + digits[w]).astype(jnp.int32)
        pt = _jp(fops, lambda a: a[:, idx], table)
        return ec.jac_add_incomplete(fops, acc, pt)

    return jax.lax.fori_loop(0, W, body, acc0)


_FB_TABLES: dict = {}


def _fixed_base_table(base, g2: bool, c: int, n_bits: int):
    """Host-precomputed window table: entry w*2^c + d = d * 2^(c*w) * base."""
    from ..curve import bn254_host as host
    key = (base, g2, c, n_bits)
    if key in _FB_TABLES:
        return _FB_TABLES[key]
    add = host.g2_add if g2 else host.g1_add
    W = -(-n_bits // c)
    rows = []
    cur = base
    for _ in range(W):
        row = [None]
        acc = None
        for _ in range((1 << c) - 1):
            acc = add(acc, cur)
            row.append(acc)
        rows.extend(row)
        for _ in range(c):
            cur = add(cur, cur)
    dev = (ec.g2_points_to_device if g2 else ec.g1_points_to_device)(Fp, rows)
    _FB_TABLES[key] = dev
    return dev


def batch_scalar_mul_fixed_base(scalars: list, base, g2: bool = False,
                                c: int = 8, n_bits: int = 254) -> list:
    """[s_i * base] for many scalars against ONE fixed base — the trusted
    setup's hot loop (fills the role of the per-query exponentiations inside
    gnark's groth16.Setup, gnark/keygen/keygen.go:94). Windowed table lookup:
    ceil(n_bits/c) gathers + adds per lane instead of a 254-step ladder
    (~16x less arithmetic, and no per-bit dispatch for G2).

    Returns host affine points (None = identity)."""
    from ..fields.limb import Fr
    n = len(scalars)
    if n == 0:
        return []
    npad = max(1, 1 << (n - 1).bit_length())
    sp = Fr.to_device(list(scalars) + [0] * (npad - n), mont=False)
    W = -(-n_bits // c)
    digits = scalars_to_digits(sp, c, W)
    table = _fixed_base_table(base, g2, c, n_bits)
    fops = ec.G2_OPS if g2 else ec.G1_OPS
    acc = _fixed_base_combine(fops, table, digits, c)
    from ..curve import bn254_host as host
    if g2:
        return ec.g2_jac_to_host_affine(fops.F, acc, host.P)[:n]
    return ec.g1_jac_to_host_affine(fops.F, acc, host.P)[:n]


def default_window_bits(n_bits: int, n: int) -> int:
    """Balance scan work (W * 1.3n) against bucket work (W * 2*2^c)."""
    best, best_cost = 8, None
    for c in range(6, 17):
        Wn = -(-n_bits // c)
        cost = Wn * (1.3 * n + 2.0 * (1 << c))
        if best_cost is None or cost < best_cost:
            best, best_cost = c, cost
    return best


def _window_sums_sharded(fops, points: JacPoint, digits, c: int, k: int,
                         n: int, mesh) -> JacPoint:
    """Shard the POINT axis over the mesh: every device runs the full bucket
    pipeline on its n/D points (the bucket method is additive over point
    partitions), producing per-device window sums; the tiny cross-device
    combine happens on host. This is the MSM data parallelism of SURVEY §2.6
    — embarrassingly parallel, near-linear scaling, no collectives on the
    hot path."""
    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    axis = mesh.axis_names[0]
    D = mesh.devices.size
    assert n % D == 0, "lane count must divide the mesh"

    if isinstance(fops, ec.Fp2Ops):
        # unfold [L, 2N] -> [L, 2, N] so lane sharding splits points, not
        # the (c0|c1) component halves
        def unfold(a):
            return a.reshape(a.shape[0], 2, a.shape[1] // 2)

        def refold(a):
            return a.reshape(a.shape[0], a.shape[1] * a.shape[2])

        pts_u = jax.tree.map(unfold, points)
        pspec = P(None, None, axis)

        def local(pts, dg):
            pts_f = jax.tree.map(refold, pts)
            out = _window_sums(fops, pts_f, dg, c, k, n // D)
            return jax.tree.map(unfold, out)

        f = shard_map(local, mesh=mesh,
                      in_specs=(pspec, P(None, None, axis)),
                      out_specs=pspec)
        out_u = f(pts_u, digits)
        return jax.tree.map(refold, out_u)       # [L, 2 * D*segs] folded

    f = shard_map(
        lambda pts, dg: _window_sums(fops, pts, dg, c, k, n // D),
        mesh=mesh, in_specs=(P(None, axis), P(None, None, axis)),
        out_specs=P(None, axis))
    return f(points, digits)                     # [L, D * segs]


class MsmPending:
    """In-flight bucket MSM: the per-(device, proof, window) sums live on
    device; the tiny window combine happens at msm_to_host_affine time in
    host Jacobian bigints (~2 ms for W=20, vs 74 ms for the device Horner
    fori, which is latency-bound at one lane per proof)."""

    __slots__ = ("sums", "c", "Wn", "k", "D")

    def __init__(self, sums, c, Wn, k, D):
        self.sums, self.c, self.Wn, self.k, self.D = sums, c, Wn, k, D


def msm_pippenger_device(fops, points: JacPoint, scalars_plain, n_bits: int,
                         c: int | None = None, mesh=None) -> MsmPending:
    """Device half of the bucket MSM: returns an MsmPending whose window
    sums stay on device, WITHOUT synchronizing to host. Callers that run
    several MSMs (the Groth16 prover runs five) launch them all, then
    convert — the conversions' device->host reads are the only sync points,
    so the MSM programs queue back-to-back on the device."""
    single = scalars_plain.ndim == 2
    sp = scalars_plain[:, None, :] if single else scalars_plain
    k, n = int(sp.shape[1]), int(sp.shape[2])
    if c is None:
        c = default_window_bits(n_bits, n)
    Wn = -(-n_bits // c)
    digits = scalars_to_digits(sp, c, Wn)            # [W, k, n]
    digits = jnp.transpose(digits, (1, 0, 2))        # [k, W, n]
    D = 1
    if mesh is not None and mesh.devices.size > 1 and \
            n % mesh.devices.size == 0:
        D = mesh.devices.size
        sums = _window_sums_sharded(fops, points, digits, c, k, n, mesh)
    else:
        sums = _window_sums(fops, points, digits, c, k, n)

    assert D & (D - 1) == 0, "mesh size must be a power of two"
    return MsmPending(sums, c, Wn, k, D)


def msm_to_host_affine(fops, pending: MsmPending, k: int) -> list:
    """Finalize an MsmPending: pull the [L, D*k*Wn] window sums (lane
    d*k*Wn + j*Wn + w), host-add the per-device partials (exact group
    math — the partition cannot change the result), then Horner-combine
    windows in host Jacobian coordinates."""
    from ..curve import bn254_host as host

    g2 = isinstance(fops, ec.Fp2Ops)
    conv = ec.g2_jac_to_host_affine if g2 else ec.g1_jac_to_host_affine
    pts = conv(fops.F, pending.sums, host.P)
    c, Wn, D = pending.c, pending.Wn, pending.D
    out = []
    for j in range(k):
        wins = []
        for w in range(Wn):
            acc = None
            for d in range(D):
                p = pts[(d * pending.k + j) * Wn + w]
                if p is not None:
                    acc = host.jac_add_host(
                        acc, host.jac_from_affine_host(p, g2), g2)
            wins.append(host.jac_to_affine_host(acc, g2))
        out.append(host.combine_windows_host(wins, c, g2=g2))
    return out


def msm_pippenger(fops, points: JacPoint, scalars_plain, n_bits: int,
                  c: int | None = None, mesh=None) -> list:
    """MSM sum_i s_i * P_i via the windowed bucket method.

    points: JacPoint [L, n] (Montgomery limb form). scalars_plain: plain
    (non-Montgomery) 16-bit limbs uint32 [L, n] for one MSM or [L, k, n]
    for k independent scalar sets over the shared table.

    Returns a list of k host affine points (int tuples, None = identity).
    The final window combine (Horner over windows) runs ON DEVICE in one
    fori_loop dispatch (_horner_combine) — the previous host-bigint ladder
    cost ~120 ms per 254-bit MSM; only the k final points cross to host.
    """
    k = int(scalars_plain.shape[1]) if scalars_plain.ndim == 3 else 1
    acc = msm_pippenger_device(fops, points, scalars_plain, n_bits, c, mesh)
    return msm_to_host_affine(fops, acc, k)
