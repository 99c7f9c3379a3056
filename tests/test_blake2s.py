"""Batched Blake2s vs hashlib oracle.

Shapes are deliberately few and shared (each (batch, length) pair is a
separate XLA compile; CPU compile time dominates this suite otherwise).
"""
import hashlib

import jax.numpy as jnp
import numpy as np

from zksc_tpu.stark.blake2s import blake2s, blake2s_pair


def _oracle(data: bytes) -> bytes:
    return hashlib.blake2s(data, digest_size=32).digest()


def test_empty():
    got = bytes(np.asarray(blake2s(jnp.zeros((1, 0), dtype=jnp.uint8), 0))[0]
                .tobytes())
    assert got == _oracle(b"")


def test_batched_lanes_and_lengths():
    rng = np.random.RandomState(0)
    for length in (3, 64, 65, 200):       # 1-block edge, 2-block, multi-block
        batch = rng.randint(0, 256, size=(3, length)).astype(np.uint8)
        got = np.asarray(blake2s(jnp.asarray(batch), length))
        for j in range(3):
            assert bytes(got[j].tobytes()) == _oracle(batch[j].tobytes()), length


def test_abc_vector():
    arr = jnp.asarray(np.frombuffer(b"abc", np.uint8))[None, :]
    arr = jnp.broadcast_to(arr, (3, 3))
    got = np.asarray(blake2s(arr, 3))
    assert bytes(got[0].tobytes()) == _oracle(b"abc")


def test_pair_hash():
    rng = np.random.RandomState(1)
    l = rng.randint(0, 256, size=(3, 32)).astype(np.uint8)
    r = rng.randint(0, 256, size=(3, 32)).astype(np.uint8)
    got = np.asarray(blake2s_pair(jnp.asarray(l), jnp.asarray(r)))
    for j in range(3):
        assert bytes(got[j].tobytes()) == _oracle(l[j].tobytes() + r[j].tobytes())
