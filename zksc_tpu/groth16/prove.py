"""Groth16 prover: witness -> proof, with MSM + NTT on TPU.

Pipeline (fills the role of gnark's groth16.Prove / snarkjs groth16.prove —
reference call stacks in SURVEY.md §3.1-3.2; designed TPU-first):

  1. sparse A/B/C constraint evaluation: gather + per-limb segment-sum
     (uint32-lazy accumulation, then one Montgomery wide-reduce per element)
  2. H(x) quotient via coset NTT (ops.ntt, bit-reversal-free pipeline)
  3. four MSMs (A, B1, B2 over wires; H over the domain) on device
  4. final blinding combine (r, s) on host — a handful of point ops.
"""
from __future__ import annotations

import secrets
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..curve import bn254_host as host
from ..fields.limb import Fp, Fr, MASK, W
from ..ops import ec
from ..ops.ntt import NTTContext
from ..r1cs.builder import ConstraintSystem
from .setup import ProvingKey


@dataclass
class Proof:
    a: tuple          # G1 affine
    b: tuple          # G2 affine
    c: tuple          # G1 affine

    def to_json_dict(self) -> dict:
        """snarkjs-shaped proof JSON (decimal strings, projective z=1)."""
        return {
            "pi_a": [str(self.a[0]), str(self.a[1]), "1"],
            "pi_b": [[str(self.b[0][0]), str(self.b[0][1])],
                     [str(self.b[1][0]), str(self.b[1][1])], ["1", "0"]],
            "pi_c": [str(self.c[0]), str(self.c[1]), "1"],
            "protocol": "groth16",
            "curve": "bn128",
        }

    @classmethod
    def from_json_dict(cls, d: dict) -> "Proof":
        a = (int(d["pi_a"][0]), int(d["pi_a"][1]))
        b = ((int(d["pi_b"][0][0]), int(d["pi_b"][0][1])),
             (int(d["pi_b"][1][0]), int(d["pi_b"][1][1])))
        c = (int(d["pi_c"][0]), int(d["pi_c"][1]))
        return cls(a, b, c)


class ProverContext:
    """Precompiled device-side structures for one circuit: sparse matrices,
    NTT tables, and the proving key."""

    def __init__(self, cs: ConstraintSystem, pk: ProvingKey):
        self.cs = cs
        self.pk = pk
        self.ntt = NTTContext(Fr, pk.domain_n)
        self.m_pad = int(pk.a_query.x.shape[-1])
        self.c_pad = int(pk.c_query.x.shape[-1])
        # COO sparse matrices (coefficients in Montgomery form on device)
        self._mats = []
        for sel in range(3):
            rows, cols, coeffs = [], [], []
            for k, lcs in enumerate(cs.constraints):
                for wire, coeff in lcs[sel].items():
                    rows.append(k)
                    cols.append(wire)
                    coeffs.append(coeff)
            self._mats.append((
                jnp.asarray(np.asarray(rows, dtype=np.int32)),
                jnp.asarray(np.asarray(cols, dtype=np.int32)),
                Fr.to_device(coeffs),
            ))

    # ---- device kernels ----

    def _matvec(self, mat, z_mont):
        """<M, z> per constraint row: returns [L, domain_n] Montgomery evals."""
        rows, cols, coeffs = mat
        gathered = z_mont[:, cols]                     # [L, nnz]
        prod = Fr.mont_mul(gathered, coeffs)           # Montgomery form
        # per-limb lazy segment sum; each limb < 2^16, rows have < 2^16 terms
        sums = jax.ops.segment_sum(prod.T, rows, num_segments=self.ntt.n).T
        norm = Fr.normalize_u32_limbs([sums[j] for j in range(Fr.L)])
        plain = Fr.mont_reduce_wide(norm)              # drops one R factor
        return Fr.to_mont(plain)                       # restore Montgomery

    def witness_to_device(self, witness: np.ndarray):
        """Host witness ints [n_wires] -> (z_mont [L, m_pad], z_bits, n_bits).

        The wire-MSM ladder length adapts to the widest witness value: cipher
        circuits keep every wire below 2^34 (bit wires and 33-bit pack sums),
        so their A/B/C MSMs run 34-bit ladders instead of 254 — ~7.5x less
        work. (The bound depends only on circuit structure, not secrets, so
        this is not a timing side-channel.)"""
        vals = [int(v) % host.R for v in witness]
        raw_bits = max(max((v.bit_length() for v in vals), default=1), 1)
        # bucketize so the jit cache stays small and widths are stable
        n_bits = next(b for b in (40, 64, 128, 254) if raw_bits <= b)
        if raw_bits <= 64:
            # vectorized host conversion (the common cipher-circuit case);
            # python-loop limb packing costs seconds per proof otherwise
            arr = np.zeros(self.m_pad, dtype=np.uint64)
            arr[: len(vals)] = vals
            z_plain = jnp.asarray(np.stack(
                [(arr >> (16 * k)).astype(np.uint32) & 0xFFFF if k < 4
                 else np.zeros(self.m_pad, dtype=np.uint32)
                 for k in range(Fr.L)]))
        else:
            z_plain = Fr.to_device(vals + [0] * (self.m_pad - len(vals)),
                                   mont=False)
        z_mont = Fr.to_mont(z_plain)
        z_bits = ec.scalars_to_bits(Fr, z_plain, n_bits)
        return z_mont, z_bits, n_bits

    def compute_h_bits(self, z_mont):
        """Quotient polynomial h = (A.z * B.z - C.z) / Z_H on the coset;
        returns scalar bits [254, domain_n] in bit-reversed coefficient order
        (matching the bit-reversed h_query layout)."""
        az = self._matvec(self._mats[0], z_mont)
        bz = self._matvec(self._mats[1], z_mont)
        cz = self._matvec(self._mats[2], z_mont)
        ntt = self.ntt
        a_br = ntt.dif_inverse(az)
        b_br = ntt.dif_inverse(bz)
        c_br = ntt.dif_inverse(cz)
        a_cs = ntt.coset_evals_from_coeffs_br(a_br)
        b_cs = ntt.coset_evals_from_coeffs_br(b_br)
        c_cs = ntt.coset_evals_from_coeffs_br(c_br)
        num = Fr.sub(Fr.mont_mul(a_cs, b_cs), c_cs)
        zinv = Fr.broadcast_const(pow(ntt.z_coset_int, -1, host.R), (ntt.n,))
        h_cs = Fr.mont_mul(num, zinv)
        h_br = ntt.coeffs_br_from_coset_evals(h_cs)
        h_plain = Fr.from_mont(h_br)
        return ec.scalars_to_bits(Fr, h_plain, 254)

    def prove(self, witness: np.ndarray, rng=None) -> Proof:
        """witness: full wire-value vector [n_wires] (ints)."""
        if rng is None:
            rng = lambda: secrets.randbelow(host.R)
        r_blind, s_blind = rng(), rng()
        pk = self.pk
        z_mont, z_bits, nb = self.witness_to_device(witness)
        h_bits = self.compute_h_bits(z_mont)
        ell = pk.n_public + 1
        priv_bits = z_bits[:, ell:ell + self.c_pad]
        if priv_bits.shape[1] < self.c_pad:
            priv_bits = jnp.pad(priv_bits,
                                ((0, 0), (0, self.c_pad - priv_bits.shape[1])))

        a_msm = ec.msm_double_and_add(ec.G1_OPS, pk.a_query, z_bits, nb)
        b1_msm = ec.msm_double_and_add(ec.G1_OPS, pk.b_g1_query, z_bits, nb)
        # G2 runs unfused: the fused ladder's Fp2 body takes >10 min of XLA
        # compile at production widths, while the per-step kernels compile in
        # ~a minute and the dispatch overhead is negligible at 40-bit ladders.
        b2_msm = ec.msm_double_and_add(ec.G2_OPS, pk.b_g2_query, z_bits, nb,
                                       fused=False)
        c_msm = ec.msm_double_and_add(ec.G1_OPS, pk.c_query, priv_bits, nb)
        h_msm = ec.msm_double_and_add(ec.G1_OPS, pk.h_query, h_bits, 254)

        a_pt = ec.g1_jac_to_host_affine(Fp, a_msm, host.P)[0]
        b1_pt = ec.g1_jac_to_host_affine(Fp, b1_msm, host.P)[0]
        b2_pt = ec.g2_jac_to_host_affine(Fp, b2_msm, host.P)[0]
        c_pt = ec.g1_jac_to_host_affine(Fp, c_msm, host.P)[0]
        h_pt = ec.g1_jac_to_host_affine(Fp, h_msm, host.P)[0]

        # final combine (host; constant #ops)
        g = host
        A = g.g1_add(g.g1_add(pk.alpha_g1, a_pt), g.g1_mul(pk.delta_g1, r_blind))
        B = g.g2_add(g.g2_add(pk.beta_g2, b2_pt),
                     g.g2_mul(pk.delta_g2, s_blind))
        B1 = g.g1_add(g.g1_add(pk.beta_g1, b1_pt), g.g1_mul(pk.delta_g1, s_blind))
        C = g.g1_add(g.g1_add(c_pt, h_pt),
                     g.g1_add(g.g1_mul(A, s_blind),
                              g.g1_add(g.g1_mul(B1, r_blind),
                                       g.g1_mul(pk.delta_g1,
                                                (-r_blind * s_blind) % host.R))))
        return Proof(a=A, b=B, c=C)
