"""Batched Blake2s-256 in JAX (Merkle hasher + public-input binding for the
Circle-STARK engine; fills the role of stwo's Blake2s usage,
air_stream.rs:31-41 — implemented fresh per RFC 7693).

Layout: one message per batch lane, fixed (static) byte length; lanes hash in
parallel as uint32 vector ops — leaves of a Merkle layer along the batch axis.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

IV = np.array([
    0x6A09E667, 0xBB67AE85, 0x3C6EF372, 0xA54FF53A,
    0x510E527F, 0x9B05688C, 0x1F83D9AB, 0x5BE0CD19], dtype=np.uint32)

SIGMA = np.array([
    [0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15],
    [14, 10, 4, 8, 9, 15, 13, 6, 1, 12, 0, 2, 11, 7, 5, 3],
    [11, 8, 12, 0, 5, 2, 15, 13, 10, 14, 3, 6, 7, 1, 9, 4],
    [7, 9, 3, 1, 13, 12, 11, 14, 2, 6, 5, 10, 4, 0, 15, 8],
    [9, 0, 5, 7, 2, 4, 10, 15, 14, 1, 11, 12, 6, 8, 3, 13],
    [2, 12, 6, 10, 0, 11, 8, 3, 4, 13, 7, 5, 15, 14, 1, 9],
    [12, 5, 1, 15, 14, 13, 4, 10, 0, 7, 6, 3, 9, 2, 8, 11],
    [13, 11, 7, 14, 12, 1, 3, 9, 5, 0, 15, 4, 8, 6, 2, 10],
    [6, 15, 14, 9, 11, 3, 0, 8, 12, 2, 13, 7, 1, 4, 10, 5],
    [10, 2, 8, 4, 7, 6, 1, 5, 15, 11, 9, 14, 3, 12, 13, 0]], dtype=np.int32)


def _rotr(x, n):
    return (x >> n) | (x << (32 - n))


def _g(v, a, b, c, d, x, y):
    v[a] = v[a] + v[b] + x
    v[d] = _rotr(v[d] ^ v[a], 16)
    v[c] = v[c] + v[d]
    v[b] = _rotr(v[b] ^ v[c], 12)
    v[a] = v[a] + v[b] + y
    v[d] = _rotr(v[d] ^ v[a], 8)
    v[c] = v[c] + v[d]
    v[b] = _rotr(v[b] ^ v[c], 7)


def _compress(h, m, t: int, last: bool):
    """h: list of 8 uint32[B]; m: uint32[B, 16]; t: byte counter (static).

    Rounds run in a fori_loop (message schedule gathered per round) so the
    XLA graph holds ONE round body — compile time stays bounded."""
    v = [h[i] for i in range(8)] + [jnp.broadcast_to(jnp.uint32(IV[i]), h[0].shape)
                                    for i in range(8)]
    v[12] = v[12] ^ jnp.uint32(t & 0xFFFFFFFF)
    v[13] = v[13] ^ jnp.uint32((t >> 32) & 0xFFFFFFFF)
    if last:
        v[14] = v[14] ^ jnp.uint32(0xFFFFFFFF)
    sigma_dev = jnp.asarray(SIGMA)

    def round_body(r, vs):
        v = list(vs)
        ms = m[:, sigma_dev[r]]          # [B, 16] message words in round order
        _g(v, 0, 4, 8, 12, ms[:, 0], ms[:, 1])
        _g(v, 1, 5, 9, 13, ms[:, 2], ms[:, 3])
        _g(v, 2, 6, 10, 14, ms[:, 4], ms[:, 5])
        _g(v, 3, 7, 11, 15, ms[:, 6], ms[:, 7])
        _g(v, 0, 5, 10, 15, ms[:, 8], ms[:, 9])
        _g(v, 1, 6, 11, 12, ms[:, 10], ms[:, 11])
        _g(v, 2, 7, 8, 13, ms[:, 12], ms[:, 13])
        _g(v, 3, 4, 9, 14, ms[:, 14], ms[:, 15])
        return tuple(v)

    v = list(jax.lax.fori_loop(0, 10, round_body, tuple(v)))
    return [h[i] ^ v[i] ^ v[i + 8] for i in range(8)]


@functools.partial(jax.jit, static_argnums=1)
def blake2s(data: jnp.ndarray, length: int) -> jnp.ndarray:
    """Blake2s-256 of uint8[B, length] (static length) -> uint8[B, 32]."""
    B = data.shape[0]
    n_blocks = max(1, (length + 63) // 64)
    padded = jnp.zeros((B, n_blocks * 64), dtype=jnp.uint8).at[:, :length].set(
        data[:, :length])
    words = padded.reshape(B, n_blocks, 16, 4).astype(jnp.uint32)
    m_all = (words[..., 0] | (words[..., 1] << 8) | (words[..., 2] << 16)
             | (words[..., 3] << 24))
    h = [jnp.broadcast_to(jnp.uint32(IV[i]), (B,)) for i in range(8)]
    h[0] = h[0] ^ jnp.uint32(0x01010000 ^ 32)      # param block: digest 32B
    for blk in range(n_blocks):
        is_last = blk == n_blocks - 1
        t = length if is_last else (blk + 1) * 64
        h = _compress(h, m_all[:, blk], t, is_last)
    out = jnp.stack(h, axis=1)                     # [B, 8] uint32 LE
    b = jnp.stack([(out >> (8 * i)) & 0xFF for i in range(4)], axis=-1)
    return b.reshape(B, 32).astype(jnp.uint8)


def blake2s_pair(left: jnp.ndarray, right: jnp.ndarray) -> jnp.ndarray:
    """Merkle node hash: uint8[B, 32] x2 -> uint8[B, 32]."""
    return blake2s(jnp.concatenate([left, right], axis=1), 64)
