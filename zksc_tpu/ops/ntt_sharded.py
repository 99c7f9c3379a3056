"""Mesh-sharded radix-2 NTT: butterfly stages with cross-device exchange.

SURVEY.md §2.6 names "NTT butterfly-stage all-to-all" as a required
TPU-native distribution component (the reference is single-process; its
FFTs — gnark-crypto, snarkjs wasm — never shard). This module shards the
lane axis of ops/ntt.py's bit-reversal-free DIF/DIT transforms over a 1-D
jax.sharding.Mesh:

  - stages whose butterfly span exceeds the per-device block exchange the
    partner block with ONE `jax.lax.ppermute` per stage (the partner is
    always device d XOR span/dev_block — a hypercube exchange riding ICI);
    log2(D) such stages total.
  - the remaining stages are block-local and reuse the per-stage twiddle
    tables verbatim (for span <= n/D the n-point transform's tables
    restricted to one block are exactly the same powers).

Results are BIT-IDENTICAL to the single-device transforms (same arithmetic,
same order — the standard DIF/DIT stage structure is just grouped into
cross-device and local parts), so a sharded H-pipeline produces the same
quotient coefficients and, downstream, the same proof.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..parallel.mesh import SHARD_AXIS


def _xor_perm(D: int, off: int):
    return [(i, i ^ off) for i in range(D)]


class ShardedNTT:
    """Sharded wrappers around an NTTContext for a 1-D mesh of D devices.

    Transforms take/return arrays [L, n] whose lane axis is sharded over
    the mesh (NamedSharding P(None, 'shard')); the caller owns placement.
    Twiddle tables are captured as host constants (np arrays), so the
    shard_map bodies close over nothing device-placed."""

    def __init__(self, ntt, mesh):
        from jax import shard_map
        from jax.sharding import NamedSharding, PartitionSpec as P

        self.ntt = ntt
        self.mesh = mesh
        D = self.D = int(mesh.devices.size)
        n, F = ntt.n, ntt.F
        assert n % D == 0 and D & (D - 1) == 0
        C = self.C = n // D
        self.sharding = NamedSharding(mesh, P(None, SHARD_AXIS))

        tw_inv = {ln: np.asarray(t) for ln, t in ntt._tw_inv.items()}
        tw_fwd = {ln: np.asarray(t) for ln, t in ntt._tw_fwd.items()}
        n_inv = ntt.n_inv

        def local_dif(x, length):
            while length >= 2:
                x = x.reshape(F.L, C // length, length)
                u = x[:, :, : length // 2]
                v = x[:, :, length // 2:]
                tw = jnp.asarray(tw_inv[length])[:, None, :]
                hi = F.mont_mul(F.sub(u, v), jnp.broadcast_to(tw, u.shape))
                x = jnp.concatenate([F.add(u, v), hi],
                                    axis=2).reshape(F.L, C)
                length //= 2
            return x

        def local_dit(x):
            length = 2
            while length <= C:
                x = x.reshape(F.L, C // length, length)
                u = x[:, :, : length // 2]
                v = x[:, :, length // 2:]
                tw = jnp.asarray(tw_fwd[length])[:, None, :]
                vw = F.mont_mul(v, jnp.broadcast_to(tw, v.shape))
                x = jnp.concatenate([F.add(u, vw), F.sub(u, vw)],
                                    axis=2).reshape(F.L, C)
                length *= 2
            return x

        def cross_dif(x, d, length):
            half_dev = (length // 2) // C
            other = jax.lax.ppermute(x, SHARD_AXIS, _xor_perm(D, half_dev))
            is_v = (d & half_dev) != 0
            u = jnp.where(is_v, other, x)
            v = jnp.where(is_v, x, other)
            # v-half output is (u - v) * tw at global twiddle offset
            # ((d mod 2*half_dev) - half_dev) * C; u-half ignores tw
            t0 = jnp.maximum(((d % (2 * half_dev)) - half_dev) * C, 0)
            tw = jax.lax.dynamic_slice(jnp.asarray(tw_inv[length]),
                                       (0, t0), (F.L, C))
            return jnp.where(is_v, F.mont_mul(F.sub(u, v), tw), F.add(u, v))

        def cross_dit(x, d, length):
            half_dev = (length // 2) // C
            other = jax.lax.ppermute(x, SHARD_AXIS, _xor_perm(D, half_dev))
            is_v = (d & half_dev) != 0
            u = jnp.where(is_v, other, x)
            v = jnp.where(is_v, x, other)
            # both halves use the twiddle of the V element's position
            dv = jnp.where(is_v, d, d + half_dev)
            tv0 = ((dv % (2 * half_dev)) - half_dev) * C
            tw = jax.lax.dynamic_slice(jnp.asarray(tw_fwd[length]),
                                       (0, tv0), (F.L, C))
            vw = F.mont_mul(v, tw)
            return jnp.where(is_v, F.sub(u, vw), F.add(u, vw))

        def dif_inv_body(x):
            d = jax.lax.axis_index(SHARD_AXIS)
            length = n
            while length > C:
                x = cross_dif(x, d, length)
                length //= 2
            x = local_dif(x, length)
            return F.mont_mul(x, F.broadcast_const(n_inv, (C,)))

        def dit_fwd_body(x):
            d = jax.lax.axis_index(SHARD_AXIS)
            x = local_dit(x)
            length = 2 * C
            while length <= n:
                x = cross_dit(x, d, length)
                length *= 2
            return x

        spec = P(None, SHARD_AXIS)
        self._dif_inverse_f = jax.jit(shard_map(
            dif_inv_body, mesh=mesh, in_specs=(spec,), out_specs=spec,
            check_vma=False))
        self._dit_forward_f = jax.jit(shard_map(
            dit_fwd_body, mesh=mesh, in_specs=(spec,), out_specs=spec,
            check_vma=False))

    def dif_inverse(self, evals):
        """evals (natural order, lane-sharded) -> coeffs (bit-reversed,
        lane-sharded), including the 1/n scale."""
        return self._dif_inverse_f(evals)

    def dit_forward(self, coeffs_br):
        """coeffs (bit-reversed, lane-sharded) -> evals (natural order)."""
        return self._dit_forward_f(coeffs_br)

    def coset_evals_from_coeffs_br(self, coeffs_br):
        scaled = self.ntt.F.mont_mul(coeffs_br, self.ntt.shift_pows_br)
        return self.dit_forward(scaled)

    def coeffs_br_from_coset_evals(self, evals):
        c = self.dif_inverse(evals)
        return self.ntt.F.mont_mul(c, self.ntt.shift_inv_pows_br)
