"""Blake2s Merkle commitments for the Circle-STARK engine.

Device-batched tree construction (leaves hashed along the batch axis with
stark.blake2s), host-side path verification (hashlib). Fills the role of
stwo's Merkle commitment scheme (SURVEY.md §2.5 item 4).
"""
from __future__ import annotations

import hashlib
from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from .blake2s import blake2s, blake2s_pair


@dataclass
class MerkleTree:
    layers: list          # [np.uint8[N_i, 32]] from leaves-hash layer to root

    @property
    def root(self) -> bytes:
        return bytes(self.layers[-1][0].tobytes())

    def open(self, index: int) -> list:
        """Auth path (sibling hashes bottom-up) for a leaf index."""
        path = []
        for layer in self.layers[:-1]:
            sib = index ^ 1
            path.append(bytes(layer[sib].tobytes()))
            index //= 2
        return path


DEVICE_THRESHOLD = 1 << 17    # below this, hashlib (C) beats device dispatch
                              # + avoids per-layer-shape XLA compiles


def commit(leaves: np.ndarray) -> MerkleTree:
    """leaves: uint8[N, leaf_len], N a power of two."""
    n, leaf_len = leaves.shape
    assert n & (n - 1) == 0 and n >= 1
    if n < DEVICE_THRESHOLD:
        return _commit_host(leaves)
    cur = np.asarray(blake2s(jnp.asarray(leaves), leaf_len))
    layers = [cur]
    while cur.shape[0] > 1:
        if cur.shape[0] < DEVICE_THRESHOLD:
            rest = _commit_host_nodes(cur)
            return MerkleTree(layers=layers[:-1] + rest)
        left = jnp.asarray(cur[0::2])
        right = jnp.asarray(cur[1::2])
        cur = np.asarray(blake2s_pair(left, right))
        layers.append(cur)
    return MerkleTree(layers=layers)


def _commit_host(leaves: np.ndarray) -> MerkleTree:
    import hashlib as _h
    cur = np.frombuffer(
        b"".join(_h.blake2s(leaves[i].tobytes(), digest_size=32).digest()
                 for i in range(leaves.shape[0])), dtype=np.uint8
    ).reshape(-1, 32)
    return MerkleTree(layers=_commit_host_nodes(cur))


def _commit_host_nodes(cur: np.ndarray) -> list:
    import hashlib as _h
    layers = [cur]
    while cur.shape[0] > 1:
        nxt = np.frombuffer(
            b"".join(_h.blake2s(cur[2 * i].tobytes() + cur[2 * i + 1].tobytes(),
                                digest_size=32).digest()
                     for i in range(cur.shape[0] // 2)), dtype=np.uint8
        ).reshape(-1, 32)
        layers.append(nxt)
        cur = nxt
    return layers


def verify_path(root: bytes, index: int, leaf: bytes, path: list) -> bool:
    """Host-side path check (verifier)."""
    h = hashlib.blake2s(leaf, digest_size=32).digest()
    for sib in path:
        if index & 1:
            h = hashlib.blake2s(sib + h, digest_size=32).digest()
        else:
            h = hashlib.blake2s(h + sib, digest_size=32).digest()
        index //= 2
    return h == root
