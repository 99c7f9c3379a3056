"""Limb-decomposed modular arithmetic for TPU.

Big prime fields (BN254 Fr/Fp, 254 bits) are represented as vectors of 16-bit
limbs stored in uint32 JAX arrays, laid out **limb-major**: an element batch of
shape ``batch`` is an array of shape ``(L, *batch)`` so each limb slice is a
contiguous vector that tiles onto the TPU VPU ( (8,128) uint32 tiles ).

All multiplications use Montgomery form (R = 2**(16*L)) with the CIOS
(coarsely integrated operand scanning) algorithm. With W=16-bit limbs every
intermediate value fits uint32 exactly:
    t + a_i*b_j + c  <=  (2^16-1) + (2^16-1)^2 + (2^16-1)  =  2^32 - 1.

This replaces the reference's native bigint backends (gnark-crypto asm,
snarkjs wasm bigints — see SURVEY.md §2.5 item 1) with an XLA-friendly
formulation: everything is fixed-shape elementwise uint32 math, unrolled over
the (static) limb count so XLA fuses it into large VPU kernels.
"""
from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

W = 16                      # bits per limb
MASK = (1 << W) - 1


def int_to_limbs(x: int, L: int) -> np.ndarray:
    """Python int -> np.uint32[L] little-endian 16-bit limbs."""
    assert 0 <= x < (1 << (W * L)), "value out of range for limb count"
    return np.array([(x >> (W * i)) & MASK for i in range(L)], dtype=np.uint32)


def limbs_to_int(limbs) -> int:
    limbs = np.asarray(limbs)
    assert limbs.ndim == 1
    return sum(int(v) << (W * i) for i, v in enumerate(limbs))


class LimbField:
    """Vectorized modular arithmetic over a fixed odd prime modulus.

    Elements are jnp.uint32 arrays of shape (L, *batch), normally in Montgomery
    form. The same class serves BN254 Fr (scalar field) and Fp (base field).
    """

    def __init__(self, modulus: int, n_limbs: int | None = None, name: str = "F"):
        self.p = modulus
        self.name = name
        if n_limbs is None:
            n_limbs = (modulus.bit_length() + W - 1) // W
        self.L = n_limbs
        R = 1 << (W * n_limbs)
        assert modulus < R
        self.R_int = R % modulus
        self.R2_int = (R * R) % modulus
        self.R3_int = (R * R * R) % modulus
        self.n0 = (-pow(modulus, -1, 1 << W)) % (1 << W)
        self.p_np = int_to_limbs(modulus, n_limbs)
        self._p_list = [int(v) for v in self.p_np]
        # Anti-diagonal indicator matrices mapping flattened partial products
        # (i, j) -> column i+j (lo parts) / i+j+1 (hi parts). Schoolbook limb
        # products become two int32 matmuls — few large ops instead of many
        # small ones, which keeps both XLA compile time and the op count low.
        L = n_limbs
        E = np.zeros((2 * L + 1, L * L), dtype=np.int32)
        for i in range(L):
            for j in range(L):
                E[i + j, i * L + j] = 1
        self._E_lo = E
        self._E_hi = np.roll(E, 1, axis=0)

    # ---------------- host conversions ----------------

    def to_device(self, values: Sequence[int] | int, mont: bool = True) -> jnp.ndarray:
        """Python ints -> (L, n) uint32 device array (Montgomery form by default)."""
        if isinstance(values, int):
            values = [values]
        vals = [(int(v) % self.p) for v in values]   # int(): accept np ints
        if mont:
            vals = [(v << (W * self.L)) % self.p for v in vals]
        arr = np.zeros((self.L, len(vals)), dtype=np.uint32)
        for j, v in enumerate(vals):
            arr[:, j] = int_to_limbs(v, self.L)
        return jnp.asarray(arr)

    def from_device(self, x, mont: bool = True) -> list[int]:
        """(L, *batch) device array -> flat list of python ints (batch row-major)."""
        arr = np.asarray(jax.device_get(x)).astype(object)
        flat = arr.reshape(self.L, -1)
        out = []
        rinv = pow(self.R_int, -1, self.p) if mont else 1
        for j in range(flat.shape[1]):
            v = sum(int(flat[i, j]) << (W * i) for i in range(self.L))
            out.append((v * rinv) % self.p if mont else v % self.p)
        return out

    # ---------------- shape helpers ----------------

    def zeros(self, batch: tuple) -> jnp.ndarray:
        return jnp.zeros((self.L, *batch), dtype=jnp.uint32)

    def broadcast_const(self, value: int, batch: tuple, mont: bool = True) -> jnp.ndarray:
        v = (value % self.p)
        if mont:
            v = (v << (W * self.L)) % self.p
        limbs = int_to_limbs(v, self.L)
        # built from scalar constants (not a captured array) so the same code
        # traces inside Pallas kernels
        return jnp.stack([jnp.full(batch, int(x), dtype=jnp.uint32)
                          for x in limbs])

    # ---------------- core arithmetic (device, vectorized) ----------------

    def _cond_sub_p(self, t: list) -> list:
        """t (L limbs, each < 2^16, value < 2p) -> t mod p via conditional subtract."""
        borrow = jnp.zeros_like(t[0])
        s = []
        for j in range(self.L):
            d = t[j] - self._p_list[j] - borrow
            s.append(d & MASK)
            borrow = (d >> 31)  # 1 iff underflow (uint32 wraparound sets high bits)
        ge = 1 - borrow  # t >= p
        return [jnp.where(ge.astype(bool), s[j], t[j]) for j in range(self.L)]

    def _cond_sub_p_ext(self, t: list, hi) -> list:
        """Like _cond_sub_p but with an extra high limb `hi` in {0,1,2}: value < 2p guaranteed."""
        borrow = jnp.zeros_like(t[0])
        s = []
        for j in range(self.L):
            d = t[j] - self._p_list[j] - borrow
            s.append(d & MASK)
            borrow = d >> 31
        # subtraction succeeds iff hi > 0 or no borrow
        ge = jnp.logical_or(hi > 0, borrow == 0)
        return [jnp.where(ge, s[j], t[j]) for j in range(self.L)]

    @functools.partial(jax.jit, static_argnums=0)
    def add(self, a, b):
        """(a + b) mod p, inputs/outputs (L, *batch) reduced (< p)."""
        c = jnp.zeros_like(a[0])
        t = []
        for j in range(self.L):
            s = a[j] + b[j] + c
            t.append(s & MASK)
            c = s >> W
        out = self._cond_sub_p_ext(t, c)
        return jnp.stack(out)

    @functools.partial(jax.jit, static_argnums=0)
    def sub(self, a, b):
        """(a - b) mod p."""
        borrow = jnp.zeros_like(a[0])
        t = []
        for j in range(self.L):
            d = a[j] - b[j] - borrow
            t.append(d & MASK)
            borrow = d >> 31
        # if borrow: add p back
        c = jnp.zeros_like(borrow)
        out = []
        for j in range(self.L):
            s = t[j] + jnp.where(borrow.astype(bool), jnp.uint32(self._p_list[j]), jnp.uint32(0)) + c
            out.append(s & MASK)
            c = s >> W
        return jnp.stack(out)

    @functools.partial(jax.jit, static_argnums=0)
    def neg(self, a):
        return self.sub(jnp.zeros_like(a), a)

    @functools.partial(jax.jit, static_argnums=0)
    def double(self, a):
        return self.add(a, a)

    def _carry_seq(self, T):
        """Exact sequential carry propagation over the leading limb axis.
        T: uint32[K, *batch] with limbs < 2^26. Returns same-shape canonical
        (<2^16) limbs plus the final carry (any overflow past the top limb)."""
        K = T.shape[0]
        c = jnp.zeros_like(T[0])
        outs = []
        for k in range(K):
            s = T[k] + c
            outs.append(s & MASK)
            c = s >> W
        return jnp.stack(outs), c

    @functools.partial(jax.jit, static_argnums=0)
    def mont_mul(self, a, b):
        """Montgomery product: a*b*R^{-1} mod p.

        Two formulations with identical results, chosen by backend at trace
        time:
          - CPU: partial products accumulated via two int32 indicator matmuls
            — few ops, so XLA:CPU's superlinear compile time stays bounded
            (LLVM chokes on wide elementwise graphs).
          - TPU: shifted pad-adds — ~11x less arithmetic per lane than the
            matmul form (the indicator matmul wastes 8448 MACs/lane), and the
            TPU compiler handles the larger op count fine.
        """
        if jax.default_backend() == "cpu":
            T = self._mul_phase_mm(a, b)
        else:
            T = self._mul_phase_pad(a, b)
        return self._mont_reduce_phase(a.shape[1:], T)

    def _mul_phase_mm(self, a, b):
        L = self.L
        batch = a.shape[1:]
        prod = a[:, None, ...] * b[None, :, ...]          # [L, L, batch] exact
        lo = (prod & MASK).reshape(L * L, *batch).astype(jnp.int32)
        hi = (prod >> W).reshape(L * L, *batch).astype(jnp.int32)
        lo2 = jnp.tensordot(jnp.asarray(self._E_lo), lo, axes=1)
        hi2 = jnp.tensordot(jnp.asarray(self._E_hi), hi, axes=1)
        return (lo2 + hi2).astype(jnp.uint32)             # [2L+1, batch] < 2^25

    def _mul_phase_pad(self, a, b):
        L = self.L
        batch = a.shape[1:]
        nb = len(batch)
        T = jnp.zeros((2 * L + 1, *batch), dtype=jnp.uint32)
        for i in range(L):
            prod = a[i][None] * b                         # [L, batch] exact
            T = T + jnp.pad(prod & MASK, [(i, L + 1 - i)] + [(0, 0)] * nb) \
                  + jnp.pad(prod >> W, [(i + 1, L - i)] + [(0, 0)] * nb)
        return T                                          # limbs < 2^21

    def _mont_reduce_phase(self, batch, T):
        """Sequential Montgomery reduction with lazy carries (limbs < 2^26)."""
        L = self.L
        nb = len(batch)
        # full-shape constants: Mosaic can't broadcast across sublane+lane at
        # once, and XLA folds these anyway
        p_arr = jnp.stack([jnp.full(batch, int(v), dtype=jnp.uint32)
                           for v in self.p_np])
        for i in range(L):
            m = (T[i] * self.n0) & MASK      # T[i] low 16 bits are exact here
            mp = m[None] * p_arr             # [L, batch]
            mp_lo = jnp.pad(mp & MASK, [(i, L + 1 - i)] + [(0, 0)] * nb)
            mp_hi = jnp.pad(mp >> W, [(i + 1, L - i)] + [(0, 0)] * nb)
            carry = jnp.pad(((T[i] + (mp[0] & MASK)) >> W)[None],
                            [(i + 1, 2 * L - 1 - i)] + [(0, 0)] * nb)
            T = T + mp_lo + mp_hi + carry    # retires limb i (≡ 0 mod 2^16)
        res, c = self._carry_seq(T[L:2 * L])
        out = self._cond_sub_p_ext([res[j] for j in range(L)], T[2 * L] + c)
        return jnp.stack(out)

    @functools.partial(jax.jit, static_argnums=0)
    def mont_sqr(self, a):
        return self.mont_mul(a, a)

    @functools.partial(jax.jit, static_argnums=0)
    def mont_reduce_wide(self, t_limbs: list):
        """Montgomery-reduce a wide value T (list of >= L limbs, each < 2^16):
        returns T * R^{-1} mod p as (L, *batch). Requires T < p*R."""
        L = self.L
        batch = t_limbs[0].shape
        n_ext = len(t_limbs)
        assert n_ext <= 2 * L + 1
        p_arr = jnp.asarray(self.p_np).reshape((L,) + (1,) * len(batch))
        T = jnp.concatenate([
            jnp.stack(t_limbs),
            jnp.zeros((2 * L + 1 - n_ext, *batch), dtype=jnp.uint32),
        ]) if n_ext < 2 * L + 1 else jnp.stack(t_limbs)
        for i in range(L):
            m = (T[i] * self.n0) & MASK      # low 16 bits of limb i are exact
            mp = m[None] * p_arr
            T = T.at[i:i + L].add(mp & MASK)
            T = T.at[i + 1:i + L + 1].add(mp >> W)
            T = T.at[i + 1].add(T[i] >> W)   # retire limb i
        res, c = self._carry_seq(T[L:2 * L])
        out = self._cond_sub_p_ext([res[j] for j in range(L)], T[2 * L] + c)
        return jnp.stack(out)

    def normalize_u32_limbs(self, raw: list):
        """Carry-propagate limbs that may each hold full uint32 values (e.g. after
        a segment-sum accumulation) into canonical 16-bit limbs. Returns a longer
        limb list (len + 2) with each limb < 2^16."""
        lo = [r & MASK for r in raw]
        hi = [r >> W for r in raw]
        zero = jnp.zeros_like(raw[0])
        t = []
        c = zero
        for j in range(len(raw) + 2):
            s = zero
            if j < len(raw):
                s = s + lo[j]
            if 0 < j <= len(raw):
                s = s + hi[j - 1]
            s = s + c
            t.append(s & MASK)
            c = s >> W
        return t

    def mul_const(self, a, k: int):
        """a * k mod p for a host-known int k; a in Montgomery form, result too."""
        return self.mont_mul(a, self.broadcast_const(k, a.shape[1:]))

    @functools.partial(jax.jit, static_argnums=(0, 2))
    def mont_pow(self, a, e: int):
        """a^e (Montgomery in, Montgomery out) with host-known exponent e.

        Uses lax.fori_loop over the exponent bits so the (large, unrolled)
        Montgomery-multiply body is traced/compiled exactly once rather than
        once per bit (~2x254 times for an inverse) — compile-time matters as
        much as run-time under XLA.
        """
        nbits = max(e.bit_length(), 1)
        bits = jnp.asarray([(e >> (nbits - 1 - i)) & 1 for i in range(nbits)],
                           dtype=jnp.uint32)
        one = self.broadcast_const(1, a.shape[1:])

        def body(i, res):
            res = self.mont_mul(res, res)
            take = bits[i].astype(bool)
            return jnp.where(take, self.mont_mul(res, a), res)

        return jax.lax.fori_loop(0, nbits, body, one)

    @functools.partial(jax.jit, static_argnums=0)
    def inv(self, a):
        """Batched modular inverse via Fermat (a^(p-2)); Montgomery in/out. 0 -> 0."""
        return self.mont_pow(a, self.p - 2)

    def eq(self, a, b):
        acc = jnp.ones_like(a[0], dtype=bool)
        for j in range(self.L):
            acc = jnp.logical_and(acc, a[j] == b[j])
        return acc

    def is_zero(self, a):
        acc = jnp.zeros_like(a[0])
        for j in range(self.L):
            acc = acc | a[j]
        return acc == 0

    def select(self, cond, a, b):
        """where(cond, a, b) broadcasting cond over the limb axis."""
        return jnp.where(cond[None, ...], a, b)

    # Montgomery constants as device arrays
    @functools.cached_property
    def one_limbs(self) -> np.ndarray:
        return int_to_limbs(self.R_int, self.L)           # 1 in Montgomery form

    @functools.cached_property
    def r2_limbs(self) -> np.ndarray:
        return int_to_limbs(self.R2_int, self.L)

    @functools.partial(jax.jit, static_argnums=0)
    def to_mont(self, a):
        """Convert non-Montgomery residues (< p) to Montgomery form."""
        r2 = jnp.broadcast_to(
            jnp.asarray(self.r2_limbs).reshape((self.L,) + (1,) * (a.ndim - 1)), a.shape
        )
        return self.mont_mul(a, r2)

    @functools.partial(jax.jit, static_argnums=0)
    def from_mont(self, a):
        """Montgomery -> plain residues: multiply by 1 (i.e. Montgomery reduce)."""
        return self.mont_reduce_wide([a[j] for j in range(self.L)])


# ---------------- BN254 constants ----------------
# Base field and scalar field of the BN254 / alt_bn128 curve used by all three
# reference Groth16 paths (circom/snarkjs, gnark — SURVEY.md §0).
BN254_P = 21888242871839275222246405745257275088696311157297823662689037894645226208583
BN254_R = 21888242871839275222246405745257275088548364400416034343698204186575808495617

Fp = LimbField(BN254_P, 16, name="BN254.Fp")
Fr = LimbField(BN254_R, 16, name="BN254.Fr")
