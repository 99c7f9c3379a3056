"""Pallas TPU kernels for the EC hot loops of the bucket MSM.

Why these exist: the XLA formulation of the Pippenger prefix scan
(ops/msm.py:_local_scan) runs ~50x below VPU speed-of-light — profiled at
562 ms for the 1.3M-lane scan of the 254-bit H query — because each
`lax.scan` step materializes the Montgomery-multiply intermediates
([2L+1, lanes] pad-accumulators) to HBM. These kernels keep the whole
Jacobian-add dataflow (≈16 Montgomery muls of 16x16-bit limbs) in VMEM per
lane tile: one HBM read of the inputs, one write of the outputs,
compute-bound in between.

This is the TPU-native replacement for the reference's MSM inner loop
(gnark-crypto asm Pippenger, gnark/libraries/prover/impl/provers.go:175-180;
snarkjs wasm MSM, js/src/snarkjs/operator.ts:112-118) — SURVEY.md §2.5
item 1 calls for "limb-decomposed Pallas Montgomery kernels" explicitly.

Kernels:
  - chunk_scan:  the hierarchy level of the Pippenger prefix scan — view the
    lane axis as [C chunks, S steps] (already transposed to step-major
    [S, L, C] by the caller) and prefix-scan each chunk; grid over C tiles,
    sequential fori over S inside, accumulator lives in VMEM.
  - jac_add_n:   elementwise complete/incomplete point add over the lane
    axis — used for the bucket halving-tree reduce and the boundary
    corrections.

Both serve G1 (Fp coords) and G2 (lane-folded Fp2 coords as separate
component halves, re-folded to [L, 2*TILE] inside the kernel).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import ec
from .ec import JacPoint

TILE = 512          # lanes per program: [16, 512] uint32 = 32 KB per buffer
TILE_FP2 = 256      # Fp2 doubles the array count (6 coords): halve the tile
                    # or the scan kernel's VMEM working set exceeds 16 MB


def tile_for(fops) -> int:
    return TILE_FP2 if isinstance(fops, ec.Fp2Ops) else TILE


class _KernelFpOps(ec.FpOps):
    """FpOps variant for inside Mosaic kernels: mul_many batches the level's
    products along the LANE axis (2-D [L, k*TILE]) instead of stacking a new
    axis (3-D [L, k, TILE]) — 3-D intermediates stall the Mosaic compiler on
    this graph size, lane-concat keeps every op a plain 2-D VPU tile op."""

    def mul_many(self, pairs):
        if len(pairs) == 1:
            return [self.mul(*pairs[0])]
        import jax.numpy as jnp
        n = pairs[0][0].shape[-1]
        A = jnp.concatenate([p[0] for p in pairs], axis=-1)
        B = jnp.concatenate([p[1] for p in pairs], axis=-1)
        R = self.F.mont_mul(A, B)
        return [R[..., i * n:(i + 1) * n] for i in range(len(pairs))]


def _kernel_ops(fops):
    if isinstance(fops, ec.Fp2Ops):
        return fops                      # Fp2 mul_many is already lane-concat
    return _KernelFpOps(fops.F)


def _is_fp2(fops) -> bool:
    return isinstance(fops, ec.Fp2Ops)


def _split(fops, P: JacPoint):
    """JacPoint -> flat list of raw [L, N] arrays (Fp2: component halves)."""
    if _is_fp2(fops):
        out = []
        for a in (P.x, P.y, P.z):
            n = a.shape[-1] // 2
            out += [a[..., :n], a[..., n:]]
        return out
    return [P.x, P.y, P.z]


def _join(fops, arrs) -> JacPoint:
    if _is_fp2(fops):
        x0, x1, y0, y1, z0, z1 = arrs
        cat = lambda a, b: jnp.concatenate([a, b], axis=-1)
        return JacPoint(cat(x0, x1), cat(y0, y1), cat(z0, z1))
    return JacPoint(*arrs)


def _scan_kernel(*refs, fops, S: int, n_arr: int, inclusive: bool,
                 tile: int):
    """refs: n_arr input refs [S, L, tile], n_arr scanned-output refs
    [S, L, tile], n_arr carry refs [L, tile]."""
    fops = _kernel_ops(fops)
    ins = refs[:n_arr]
    outs = refs[n_arr:2 * n_arr]
    carries = refs[2 * n_arr:]
    acc0 = ec.jac_identity_batch(fops, (tile,))

    def body(s, acc):
        p = _join(fops, [r[s] for r in ins])
        summed = ec.jac_add(fops, acc, p)
        wr = summed if inclusive else acc
        for r, a in zip(outs, _split(fops, wr)):
            r[s] = a
        return summed

    acc = jax.lax.fori_loop(0, S, body, acc0)
    for r, a in zip(carries, _split(fops, acc)):
        r[...] = a


@functools.partial(jax.jit, static_argnums=(0, 2, 3))
def chunk_scan(fops, xs, S: int, inclusive: bool):
    """Prefix-scan each length-S chunk of the lane axis.

    xs: list of n_arr step-major arrays [S, L, C] (the caller's _ts
    transpose of position-major [L, C*S] data). Returns (ys, carry):
    ys same-shape scanned values, carry n_arr x [L, C] chunk totals.
    C must be a multiple of TILE."""
    n_arr = len(xs)
    tile = tile_for(fops)
    S_, L, C = xs[0].shape
    assert S_ == S and C % tile == 0
    grid = (C // tile,)
    in_spec = pl.BlockSpec((S, L, tile), lambda i: (0, 0, i),
                           memory_space=pltpu.VMEM)
    carry_spec = pl.BlockSpec((L, tile), lambda i: (0, i),
                              memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_scan_kernel, fops=fops, S=S, n_arr=n_arr,
                          inclusive=inclusive, tile=tile),
        grid=grid,
        in_specs=[in_spec] * n_arr,
        out_specs=tuple([in_spec] * n_arr + [carry_spec] * n_arr),
        out_shape=tuple(
            [jax.ShapeDtypeStruct((S, L, C), jnp.uint32)] * n_arr
            + [jax.ShapeDtypeStruct((L, C), jnp.uint32)] * n_arr),
    )(*xs)
    return list(out[:n_arr]), list(out[n_arr:])


def _add_kernel(*refs, fops, n_arr: int, complete: bool):
    fops = _kernel_ops(fops)
    ps = refs[:n_arr]
    qs = refs[n_arr:2 * n_arr]
    outs = refs[2 * n_arr:]
    P = _join(fops, [r[...] for r in ps])
    Q = _join(fops, [r[...] for r in qs])
    R = (ec.jac_add if complete else ec.jac_add_incomplete)(fops, P, Q)
    for r, a in zip(outs, _split(fops, R)):
        r[...] = a


@functools.partial(jax.jit, static_argnums=(0, 3))
def jac_add_n(fops, P: JacPoint, Q: JacPoint, complete: bool = True):
    """Elementwise point add over the lane axis, one VMEM-resident tile per
    program. Lane count must be a multiple of TILE (callers fall back to the
    XLA path below that)."""
    ps = _split(fops, P)
    qs = _split(fops, Q)
    n_arr = len(ps)
    tile = tile_for(fops)
    L, N = ps[0].shape
    assert N % tile == 0
    grid = (N // tile,)
    spec = pl.BlockSpec((L, tile), lambda i: (0, i), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_add_kernel, fops=fops, n_arr=n_arr,
                          complete=complete),
        grid=grid,
        in_specs=[spec] * (2 * n_arr),
        out_specs=tuple([spec] * n_arr),
        out_shape=tuple([jax.ShapeDtypeStruct((L, N), jnp.uint32)] * n_arr),
    )(*(ps + qs))
    return _join(fops, list(out))


def use_pallas(fops=None) -> bool:
    """Pallas fast path is TPU-only (Mosaic); CPU tests use the XLA path."""
    return jax.default_backend() not in ("cpu",)
