"""Batched symmetric-cipher kernels (ChaCha20, AES-128/256-CTR) in JAX.

These are the TPU-native equivalents of the reference's native cipher
implementations used for witness/trace generation and padding keystreams
(reference behavior: stwo/src/chacha/block.rs, stwo/src/aes/mod.rs:135-405,
gnark prover's per-block x/crypto usage in
gnark/libraries/prover/impl/provers.go:135-150,223-238 — studied for behavior,
implemented fresh here as batched XLA ops).

Conventions (RFC 7539 / NIST SP 800-38A):
  - ChaCha20: 256-bit key as 8 LE u32 words, 96-bit nonce as 3 LE u32 words,
    32-bit block counter; 64-byte blocks.
  - AES-CTR: 16-byte blocks; IV = 12-byte nonce || 4-byte big-endian counter.

All functions are batched over a leading axis B (one lane per cipher block) so
a whole proof chunk — or a whole batch of proofs — is one fused XLA call.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# ---------------------------------------------------------------------------
# ChaCha20
# ---------------------------------------------------------------------------

CHACHA_CONSTS = np.array([0x61707865, 0x3320646E, 0x79622D32, 0x6B206574],
                         dtype=np.uint32)


def _rotl32(x, n: int):
    return (x << n) | (x >> (32 - n))


def _quarter_round(a, b, c, d):
    a = a + b
    d = _rotl32(d ^ a, 16)
    c = c + d
    b = _rotl32(b ^ c, 12)
    a = a + b
    d = _rotl32(d ^ a, 8)
    c = c + d
    b = _rotl32(b ^ c, 7)
    return a, b, c, d


# Column-round and diagonal-round index patterns of the ChaCha state matrix.
_QR_COLS = [(0, 4, 8, 12), (1, 5, 9, 13), (2, 6, 10, 14), (3, 7, 11, 15)]
_QR_DIAG = [(0, 5, 10, 15), (1, 6, 11, 12), (2, 7, 8, 13), (3, 4, 9, 14)]


def chacha20_block_words(key_words: jnp.ndarray, nonce_words: jnp.ndarray,
                         counter: jnp.ndarray) -> jnp.ndarray:
    """One ChaCha20 block per batch lane.

    key_words: uint32[B, 8] (LE words), nonce_words: uint32[B, 3],
    counter: uint32[B]. Returns keystream words uint32[B, 16].
    """
    B = key_words.shape[0]
    consts = jnp.broadcast_to(jnp.asarray(CHACHA_CONSTS), (B, 4))
    state0 = jnp.concatenate(
        [consts, key_words, counter[:, None], nonce_words], axis=1)
    xs = [state0[:, i] for i in range(16)]
    init = list(xs)

    def double_round(_, xs):
        xs = list(xs)
        for (ia, ib, ic, id_) in _QR_COLS:
            xs[ia], xs[ib], xs[ic], xs[id_] = _quarter_round(
                xs[ia], xs[ib], xs[ic], xs[id_])
        for (ia, ib, ic, id_) in _QR_DIAG:
            xs[ia], xs[ib], xs[ic], xs[id_] = _quarter_round(
                xs[ia], xs[ib], xs[ic], xs[id_])
        return tuple(xs)

    xs = jax.lax.fori_loop(0, 10, double_round, tuple(xs))
    out = [x + x0 for x, x0 in zip(xs, init)]
    return jnp.stack(out, axis=1)


def bytes_to_u32_words_le(data: jnp.ndarray) -> jnp.ndarray:
    """uint8[..., 4k] -> uint32[..., k] little-endian."""
    shaped = data.reshape(*data.shape[:-1], -1, 4).astype(jnp.uint32)
    return (shaped[..., 0] | (shaped[..., 1] << 8) | (shaped[..., 2] << 16)
            | (shaped[..., 3] << 24))


def u32_words_to_bytes_le(words: jnp.ndarray) -> jnp.ndarray:
    """uint32[..., k] -> uint8[..., 4k] little-endian."""
    b = jnp.stack([(words >> (8 * i)) & 0xFF for i in range(4)], axis=-1)
    return b.reshape(*words.shape[:-1], -1).astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames=())
def chacha20_keystream(key_bytes: jnp.ndarray, nonce_bytes: jnp.ndarray,
                       counters: jnp.ndarray) -> jnp.ndarray:
    """Batched keystream: key uint8[B,32], nonce uint8[B,12], counters uint32[B]
    -> keystream bytes uint8[B, 64]."""
    kw = bytes_to_u32_words_le(key_bytes)
    nw = bytes_to_u32_words_le(nonce_bytes)
    ks = chacha20_block_words(kw, nw, counters)
    return u32_words_to_bytes_le(ks)


def _chacha20_block_np(key_words: np.ndarray, nonce_words: np.ndarray,
                       counters: np.ndarray) -> np.ndarray:
    """Pure-numpy twin of chacha20_block_words for host-side use (the API's
    local decrypt is tiny, and paying a device compile for it is wasteful)."""
    B = key_words.shape[0]
    state0 = np.concatenate([
        np.broadcast_to(CHACHA_CONSTS, (B, 4)), key_words,
        counters[:, None].astype(np.uint32), nonce_words], axis=1)
    xs = [state0[:, i].copy() for i in range(16)]

    def rotl(x, n):
        return ((x << np.uint32(n)) | (x >> np.uint32(32 - n))).astype(np.uint32)

    with np.errstate(over="ignore"):
        for _ in range(10):
            for pattern in (_QR_COLS, _QR_DIAG):
                for (ia, ib, ic, id_) in pattern:
                    a, b, c, d = xs[ia], xs[ib], xs[ic], xs[id_]
                    a = a + b; d = rotl(d ^ a, 16)
                    c = c + d; b = rotl(b ^ c, 12)
                    a = a + b; d = rotl(d ^ a, 8)
                    c = c + d; b = rotl(b ^ c, 7)
                    xs[ia], xs[ib], xs[ic], xs[id_] = a, b, c, d
        out = [(x + state0[:, i]).astype(np.uint32) for i, x in enumerate(xs)]
    return np.stack(out, axis=1)


def chacha20_encrypt(key: bytes, nonce: bytes, counter: int, data: bytes) -> bytes:
    """Host-convenience CTR encrypt/decrypt of arbitrary-length data
    (per-block counters counter, counter+1, ...). Pure numpy."""
    n_blocks = (len(data) + 63) // 64
    if n_blocks == 0:
        return b""
    kw = np.frombuffer(key, np.uint8).reshape(8, 4)
    kw = (kw[:, 0].astype(np.uint32) | (kw[:, 1].astype(np.uint32) << 8)
          | (kw[:, 2].astype(np.uint32) << 16) | (kw[:, 3].astype(np.uint32) << 24))
    nw = np.frombuffer(nonce, np.uint8).reshape(3, 4)
    nw = (nw[:, 0].astype(np.uint32) | (nw[:, 1].astype(np.uint32) << 8)
          | (nw[:, 2].astype(np.uint32) << 16) | (nw[:, 3].astype(np.uint32) << 24))
    ctrs = np.arange(counter, counter + n_blocks, dtype=np.uint32)
    ks_words = _chacha20_block_np(np.broadcast_to(kw, (n_blocks, 8)),
                                  np.broadcast_to(nw, (n_blocks, 3)), ctrs)
    ks = np.stack([(ks_words >> (8 * i)) & 0xFF for i in range(4)],
                  axis=-1).astype(np.uint8).reshape(-1)[: len(data)]
    return (np.frombuffer(data, np.uint8) ^ ks).tobytes()


# ---------------------------------------------------------------------------
# AES-128 / AES-256 (CTR mode)
# ---------------------------------------------------------------------------

def _build_aes_sbox() -> np.ndarray:
    """Compute the AES S-box from GF(2^8) inversion + affine map (FIPS 197)."""
    # multiplicative inverse table via exp/log over generator 3
    exp = np.zeros(512, dtype=np.uint16)
    log = np.zeros(256, dtype=np.uint16)
    x = 1
    for i in range(255):
        exp[i] = x
        log[x] = i
        # multiply by generator 0x03 = x * 2 ^ x
        x2 = ((x << 1) ^ (0x11B if x & 0x80 else 0)) & 0xFF
        x = x2 ^ x
    for i in range(255, 512):
        exp[i] = exp[i - 255]
    inv = np.zeros(256, dtype=np.uint8)
    for a in range(1, 256):
        inv[a] = exp[255 - log[a]]
    sbox = np.zeros(256, dtype=np.uint8)
    for a in range(256):
        b = int(inv[a])
        s = 0x63
        for i in range(8):
            bit = ((b >> i) & 1) ^ ((b >> ((i + 4) % 8)) & 1) ^ \
                  ((b >> ((i + 5) % 8)) & 1) ^ ((b >> ((i + 6) % 8)) & 1) ^ \
                  ((b >> ((i + 7) % 8)) & 1)
            s ^= bit << i
        sbox[a] = s
    return sbox


AES_SBOX = _build_aes_sbox()
AES_INV_SBOX = np.zeros(256, dtype=np.uint8)
AES_INV_SBOX[AES_SBOX] = np.arange(256, dtype=np.uint8)
AES_RCON = np.array([0x01, 0x02, 0x04, 0x08, 0x10, 0x20, 0x40, 0x80, 0x1B, 0x36],
                    dtype=np.uint8)
# GF(2^8) multiplicative inverse table (0 -> 0), used by the AES R1CS circuit's
# S-box hint (sound inverse-based S-box instead of the reference circom's
# unconstrained T-table lookups — see SURVEY.md §2.2).
_e = np.zeros(256, dtype=np.uint8)
for _a in range(1, 256):
    for _b in range(1, 256):
        _p, _x, _y = 0, _a, _b
        # carryless multiply then reduce — small one-time host loop
        while _y:
            if _y & 1:
                _p ^= _x
            _y >>= 1
            _x <<= 1
            if _x & 0x100:
                _x ^= 0x11B
        if _p == 1:
            _e[_a] = _b
            break
AES_GF_INV = _e


def _xtime(x):
    """GF(2^8) multiply by 2, batched uint32 holding byte values."""
    return ((x << 1) ^ jnp.where((x & 0x80) != 0, 0x1B, 0)) & 0xFF


def aes_expand_key(key: np.ndarray) -> np.ndarray:
    """Host key expansion: key uint8[16 or 32] -> round keys uint8[R+1, 16]
    (R=10 for AES-128, 14 for AES-256)."""
    key = np.asarray(key, dtype=np.uint8)
    nk = len(key) // 4
    rounds = {4: 10, 8: 14}[nk]
    words = [key[4 * i: 4 * i + 4].copy() for i in range(nk)]
    for i in range(nk, 4 * (rounds + 1)):
        temp = words[i - 1].copy()
        if i % nk == 0:
            temp = np.roll(temp, -1)
            temp = AES_SBOX[temp]
            temp[0] ^= AES_RCON[i // nk - 1]
        elif nk > 6 and i % nk == 4:
            temp = AES_SBOX[temp]
        words.append(words[i - nk] ^ temp)
    return np.stack(words).reshape(rounds + 1, 16)


def aes_encrypt_blocks(blocks: jnp.ndarray, round_keys: jnp.ndarray) -> jnp.ndarray:
    """Batched AES block encryption.

    blocks: uint8[B, 16] (column-major AES state = standard byte order),
    round_keys: uint8[R+1, 16] or uint8[B, R+1, 16] (per-lane keys).
    Returns uint8[B, 16].
    """
    sbox = jnp.asarray(AES_SBOX)
    st = blocks.astype(jnp.uint32)
    rk = round_keys.astype(jnp.uint32)
    if rk.ndim == 2:
        rk = rk[None]
    n_rounds = rk.shape[1] - 1
    st = st ^ rk[:, 0]

    # ShiftRows permutation on byte indices (state stored row-major by word:
    # byte i = row i%4, col i//4 — standard FIPS 197 layout).
    shift_idx = np.array([0, 5, 10, 15, 4, 9, 14, 3, 8, 13, 2, 7, 12, 1, 6, 11])

    def round_fn(st, rki, last: bool):
        st = jnp.take(sbox, st, axis=0).astype(jnp.uint32)  # SubBytes
        st = st[:, shift_idx]                                # ShiftRows
        if not last:                                         # MixColumns
            cols = st.reshape(-1, 4, 4)
            a0, a1, a2, a3 = cols[:, :, 0], cols[:, :, 1], cols[:, :, 2], cols[:, :, 3]
            r0 = _xtime(a0) ^ (_xtime(a1) ^ a1) ^ a2 ^ a3
            r1 = a0 ^ _xtime(a1) ^ (_xtime(a2) ^ a2) ^ a3
            r2 = a0 ^ a1 ^ _xtime(a2) ^ (_xtime(a3) ^ a3)
            r3 = (_xtime(a0) ^ a0) ^ a1 ^ a2 ^ _xtime(a3)
            st = jnp.stack([r0, r1, r2, r3], axis=2).reshape(-1, 16)
        return st ^ rki

    for r in range(1, n_rounds):
        st = round_fn(st, rk[:, r], last=False)
    st = round_fn(st, rk[:, n_rounds], last=True)
    return st.astype(jnp.uint8)


def aes_ctr_counter_blocks(nonce_bytes: jnp.ndarray, counters: jnp.ndarray) -> jnp.ndarray:
    """IV blocks: nonce uint8[B,12] || BE32(counter) -> uint8[B, 16]."""
    ctr_be = jnp.stack([(counters >> 24) & 0xFF, (counters >> 16) & 0xFF,
                        (counters >> 8) & 0xFF, counters & 0xFF],
                       axis=1).astype(jnp.uint8)
    return jnp.concatenate([nonce_bytes, ctr_be], axis=1)


def aes_ctr_keystream(key: bytes, nonce_bytes: jnp.ndarray,
                      counters: jnp.ndarray) -> jnp.ndarray:
    """Batched AES-CTR keystream blocks for one key: uint8[B, 16]."""
    rks = jnp.asarray(aes_expand_key(np.frombuffer(key, np.uint8)))
    ivs = aes_ctr_counter_blocks(nonce_bytes, counters)
    return aes_encrypt_blocks(ivs, rks)


def _aes_encrypt_blocks_np(blocks: np.ndarray, round_keys: np.ndarray) -> np.ndarray:
    """Pure-numpy twin of aes_encrypt_blocks for host-side use."""
    shift_idx = np.array([0, 5, 10, 15, 4, 9, 14, 3, 8, 13, 2, 7, 12, 1, 6, 11])
    st = blocks.astype(np.uint32)
    rk = round_keys.astype(np.uint32)
    n_rounds = rk.shape[0] - 1
    st = st ^ rk[0]

    def xt(x):
        return ((x << 1) ^ np.where((x & 0x80) != 0, 0x1B, 0)) & 0xFF

    for r in range(1, n_rounds + 1):
        st = AES_SBOX[st].astype(np.uint32)
        st = st[:, shift_idx]
        if r != n_rounds:
            cols = st.reshape(-1, 4, 4)
            a0, a1, a2, a3 = cols[:, :, 0], cols[:, :, 1], cols[:, :, 2], cols[:, :, 3]
            r0 = xt(a0) ^ (xt(a1) ^ a1) ^ a2 ^ a3
            r1 = a0 ^ xt(a1) ^ (xt(a2) ^ a2) ^ a3
            r2 = a0 ^ a1 ^ xt(a2) ^ (xt(a3) ^ a3)
            r3 = (xt(a0) ^ a0) ^ a1 ^ a2 ^ xt(a3)
            st = np.stack([r0, r1, r2, r3], axis=2).reshape(-1, 16)
        st = st ^ rk[r]
    return st.astype(np.uint8)


def aes_ctr_encrypt(key: bytes, nonce: bytes, counter: int, data: bytes) -> bytes:
    """Host-convenience AES-CTR over arbitrary-length data. Pure numpy."""
    n_blocks = (len(data) + 15) // 16
    if n_blocks == 0:
        return b""
    rks = aes_expand_key(np.frombuffer(key, np.uint8))
    ctrs = np.arange(counter, counter + n_blocks, dtype=np.uint32)
    ivs = np.concatenate([
        np.broadcast_to(np.frombuffer(nonce, np.uint8), (n_blocks, 12)),
        np.stack([(ctrs >> 24) & 0xFF, (ctrs >> 16) & 0xFF,
                  (ctrs >> 8) & 0xFF, ctrs & 0xFF], axis=1).astype(np.uint8),
    ], axis=1)
    ks = _aes_encrypt_blocks_np(ivs, rks).reshape(-1)[: len(data)]
    return (np.frombuffer(data, np.uint8) ^ ks).tobytes()
