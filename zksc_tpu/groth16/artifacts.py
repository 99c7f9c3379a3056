"""Proving/verifying key (de)serialization + local artifact store.

Fills the role of the reference's artifact distribution layer (L3: FileFetch +
resources/ blobs + SHA-256 hash pinning, SURVEY.md §1 L3, §5): keys are stored
under artifacts/<algorithm>/ with the circuit digest pinned; loading verifies
the digest against the freshly compiled circuit before use.
"""
from __future__ import annotations

import json
import os

import jax.numpy as jnp
import numpy as np

from ..ops.ec import JacPoint
from .setup import ProvingKey, VerifyingKey

ARTIFACT_VERSION = 1


def _jac_to_np(pt: JacPoint, g2: bool) -> dict:
    # G2 coords use the folded [L, 2N] layout (ops.ec.Fp2Ops) — same keys as G1
    return {"x": np.asarray(pt.x), "y": np.asarray(pt.y), "z": np.asarray(pt.z)}


def _jac_from_np(d: dict, prefix: str, g2: bool) -> JacPoint:
    if g2 and (prefix + "x0") in d:
        # legacy v1 format: per-component arrays -> fold into [L, 2N]
        g = lambda k: np.asarray(d[prefix + k])
        fold = lambda c0, c1: jnp.asarray(np.concatenate([g(c0), g(c1)], axis=-1))
        return JacPoint(fold("x0", "x1"), fold("y0", "y1"), fold("z0", "z1"))
    g = lambda k: jnp.asarray(d[prefix + k])
    return JacPoint(g("x"), g("y"), g("z"))


def _pt_json(p):
    if p is None:
        return None
    return [str(p[0]), str(p[1])]


def _pt_from_json(j):
    return None if j is None else (int(j[0]), int(j[1]))


def _pt2_json(p):
    if p is None:
        return None
    return [[str(p[0][0]), str(p[0][1])], [str(p[1][0]), str(p[1][1])]]


def _pt2_from_json(j):
    if j is None:
        return None
    return ((int(j[0][0]), int(j[0][1])), (int(j[1][0]), int(j[1][1])))


def save_keys(dirpath: str, pk: ProvingKey, vk: VerifyingKey):
    os.makedirs(dirpath, exist_ok=True)
    arrays = {}
    for name, q, g2 in [("a", pk.a_query, False), ("b1", pk.b_g1_query, False),
                        ("b2", pk.b_g2_query, True), ("c", pk.c_query, False),
                        ("h", pk.h_query, False)]:
        for k, v in _jac_to_np(q, g2).items():
            arrays[f"{name}_{k}"] = v
    np.savez_compressed(os.path.join(dirpath, "pk.npz"), **arrays)
    meta = {
        "version": ARTIFACT_VERSION,
        "digest": pk.digest,
        "n_public": pk.n_public,
        "n_wires": pk.n_wires,
        "domain_n": pk.domain_n,
        "alpha_g1": _pt_json(pk.alpha_g1),
        "beta_g1": _pt_json(pk.beta_g1),
        "delta_g1": _pt_json(pk.delta_g1),
        "beta_g2": _pt2_json(pk.beta_g2),
        "delta_g2": _pt2_json(pk.delta_g2),
    }
    with open(os.path.join(dirpath, "pk_meta.json"), "w") as f:
        json.dump(meta, f)
    vk_json = {
        "version": ARTIFACT_VERSION,
        "digest": vk.digest,
        "protocol": "groth16",
        "curve": "bn128",
        "vk_alpha_1": _pt_json(vk.alpha_g1),
        "vk_beta_2": _pt2_json(vk.beta_g2),
        "vk_gamma_2": _pt2_json(vk.gamma_g2),
        "vk_delta_2": _pt2_json(vk.delta_g2),
        "IC": [_pt_json(p) for p in vk.ic],
    }
    with open(os.path.join(dirpath, "vk.json"), "w") as f:
        json.dump(vk_json, f)


def load_keys(dirpath: str, expected_digest: str | None = None):
    """Returns (pk, vk); verifies the pinned digest if provided (mirrors the
    reference's constant-time pk/r1cs hash check, prover/impl/library.go:81-133)."""
    with open(os.path.join(dirpath, "pk_meta.json")) as f:
        meta = json.load(f)
    if expected_digest is not None and meta["digest"] != expected_digest:
        raise ValueError(
            f"artifact digest mismatch: {meta['digest']} != {expected_digest}")
    data = np.load(os.path.join(dirpath, "pk.npz"))
    pk = ProvingKey(
        n_public=meta["n_public"], n_wires=meta["n_wires"],
        domain_n=meta["domain_n"],
        a_query=_jac_from_np(data, "a_", False),
        b_g1_query=_jac_from_np(data, "b1_", False),
        b_g2_query=_jac_from_np(data, "b2_", True),
        c_query=_jac_from_np(data, "c_", False),
        h_query=_jac_from_np(data, "h_", False),
        alpha_g1=_pt_from_json(meta["alpha_g1"]),
        beta_g1=_pt_from_json(meta["beta_g1"]),
        delta_g1=_pt_from_json(meta["delta_g1"]),
        beta_g2=_pt2_from_json(meta["beta_g2"]),
        delta_g2=_pt2_from_json(meta["delta_g2"]),
        digest=meta["digest"],
    )
    vk = load_vk(dirpath, expected_digest)
    return pk, vk


def load_vk(dirpath: str, expected_digest: str | None = None) -> VerifyingKey:
    with open(os.path.join(dirpath, "vk.json")) as f:
        vj = json.load(f)
    if expected_digest is not None and vj["digest"] != expected_digest:
        raise ValueError("vk digest mismatch")
    return VerifyingKey(
        alpha_g1=_pt_from_json(vj["vk_alpha_1"]),
        beta_g2=_pt2_from_json(vj["vk_beta_2"]),
        gamma_g2=_pt2_from_json(vj["vk_gamma_2"]),
        delta_g2=_pt2_from_json(vj["vk_delta_2"]),
        ic=[_pt_from_json(p) for p in vj["IC"]],
        digest=vj["digest"],
    )
