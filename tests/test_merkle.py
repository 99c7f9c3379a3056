"""Merkle commitment tests (host path verification vs device/host commit)."""
import numpy as np

from zksc_tpu.stark.merkle import commit, verify_path


def test_commit_open_verify():
    rng = np.random.RandomState(3)
    leaves = rng.randint(0, 256, size=(16, 16)).astype(np.uint8)
    tree = commit(leaves)
    assert len(tree.root) == 32
    for idx in (0, 5, 15):
        path = tree.open(idx)
        assert verify_path(tree.root, idx, leaves[idx].tobytes(), path)
        # wrong leaf rejected
        assert not verify_path(tree.root, idx, b"\x00" * 16, path)
        # wrong index rejected
        assert not verify_path(tree.root, (idx + 1) % 16,
                               leaves[idx].tobytes(), path)


def test_single_leaf():
    leaves = np.zeros((1, 8), dtype=np.uint8)
    tree = commit(leaves)
    assert verify_path(tree.root, 0, leaves[0].tobytes(), tree.open(0))
