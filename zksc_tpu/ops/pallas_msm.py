"""Pallas TPU kernel for the MSM double-and-add ladder.

The XLA while-loop version materializes intermediates to HBM every step
(~20 ms/step at 2^16 lanes); this kernel keeps the accumulator, the point
tile, and all limb temporaries in VMEM for the WHOLE ladder and reduces each
lane-tile to a single point before writing out — one HBM read of the inputs,
one tiny write, compute-bound in between.

Grid: one program per lane tile (TILE lanes). Outputs one partial point per
tile; the caller tree-reduces the n_tiles partials (cheap).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..fields.limb import Fp
from . import ec

TILE = 256


def _ladder_tile_kernel(bits_ref, px_ref, py_ref, pz_ref,
                        ox_ref, oy_ref, oz_ref, *, n_bits: int):
    fops = ec.G1_OPS
    pts = ec.JacPoint(px_ref[...], py_ref[...], pz_ref[...])
    acc0 = ec.jac_identity_like(fops, pts.x)

    def body(k, acc):
        doubled = ec.jac_double(fops, acc)
        summed = ec.jac_add(fops, doubled, pts)
        take = bits_ref[n_bits - 1 - k, :] != 0
        return ec.JacPoint(fops.select(take, summed.x, doubled.x),
                           fops.select(take, summed.y, doubled.y),
                           fops.select(take, summed.z, doubled.z))

    acc = jax.lax.fori_loop(0, n_bits, body, acc0)

    # in-tile reduction: log2(TILE) rounds of add-with-rolled-self
    rounds = TILE.bit_length() - 1

    def red_body(r, cur):
        stride = TILE >> (r + 1)
        shifted = jax.tree.map(lambda a: pltpu.roll(a, -stride, axis=1), cur)
        return ec.jac_add(fops, cur, shifted)

    acc = jax.lax.fori_loop(0, rounds, red_body, acc)
    ox_ref[...] = acc.x
    oy_ref[...] = acc.y
    oz_ref[...] = acc.z


@functools.partial(jax.jit, static_argnames=("n_bits",))
def msm_g1_pallas(points: ec.JacPoint, scalar_bits, n_bits: int) -> ec.JacPoint:
    """G1 MSM: points [L, N] coords, bits [n_bits, N] -> partials reduced to
    one point. N must be a multiple of TILE."""
    L, N = points.x.shape
    assert N % TILE == 0
    n_tiles = N // TILE
    grid = (n_tiles,)
    lane_spec = pl.BlockSpec((L, TILE), lambda i: (0, i),
                             memory_space=pltpu.VMEM)
    bits_spec = pl.BlockSpec((n_bits, TILE), lambda i: (0, i),
                             memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((L, TILE), lambda i: (0, i),
                            memory_space=pltpu.VMEM)
    partial = pl.pallas_call(
        functools.partial(_ladder_tile_kernel, n_bits=n_bits),
        grid=grid,
        in_specs=[bits_spec, lane_spec, lane_spec, lane_spec],
        out_specs=(out_spec, out_spec, out_spec),
        out_shape=(jax.ShapeDtypeStruct((L, N), jnp.uint32),) * 3,
    )(scalar_bits, points.x, points.y, points.z)
    pts = ec.JacPoint(*[p[:, ::TILE] for p in partial])   # lane 0 of each tile
    # final reduction over n_tiles partials
    return ec._tree_reduce_fori(ec.G1_OPS, pts)
