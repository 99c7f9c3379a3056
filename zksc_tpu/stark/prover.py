"""Circle-STARK prover/verifier for the ChaCha20 stream AIR ("stark" engine).

Fills the role of stwo's prove_stream/verify_stream pipeline (reference call
stack studied at stwo/src/chacha/bitwise/air_stream.rs:143-234, 343-421;
protocol re-designed TPU-first, transcript format our own):

  prove:  statement mixed into the channel BEFORE any commitment ->
          trace gen (reject invalid witness) -> blinded low-degree extension
          (zk: random coefficients in the V_N * <anything> slice, so trace
          values are untouched but every off-domain opening is masked) ->
          Merkle commit of LDE rows -> composition polynomial from the
          constraint index groups (one device pass: gathers + m31 ops +
          alpha-power weighted modular sums) -> quotient by V_N -> FRI.
  verify: statement fast-fail (hashes, sizes, DoS caps) -> channel replay ->
          public-column evaluation (the verifier computes nonce/counter/
          ciphertext columns itself — stronger binding than the reference's
          hash-mixing-only) -> FRI verify with per-query ALI consistency:
          the opened trace row must reproduce the FRI layer-0 value
          C(p) / V_N(p).

Soundness budget (documented, mirrors stwo's ~100-bit PcsConfig floor):
rate 1/4 quotient word => ~2 bits/query * 42 queries + 16 PoW bits ≈ 100.

Domain layout: trace on the size-N standard coset; commitments and FRI on a
size-M = 4 * next_pow2(N + 2q) coset, q = ZK_COEFFS blinding coefficients
per column. V_N is the basis function at coefficient index N, so blinding
slots [N, N+q) vanish on the trace domain by construction.
"""
from __future__ import annotations

import functools
import hashlib
import math
import secrets
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from . import chacha_air, merkle
from .channel import Channel
from .circle import CircleFFT
from .fri import FriContext, FriProof, _qm_mul_scalar_np
from .m31 import P31, m31_add, m31_mul, m31_sub

N_QUERIES = 42
POW_BITS = 16
ZK_COEFFS = 50          # > N_QUERIES: openings are q-wise independent
FRI_LOG_BLOWUP = 2      # accepted support = M / 4
# 64-row floor: blinding coefficient slots live at indices [N, N+q) and only
# vanish on the trace domain while they carry the v_logN basis factor, i.e.
# while q < N. (Indices >= 2N drop the factor — observed to break
# divisibility, not hypothesized.)
MIN_LOG_ROWS = 6
# DoS / memory bound. The reference allows log_size 24 (air_stream.rs:176,
# 16M blocks) because its trace is 33280 bit-columns materialized lane-wise
# in Rust; our trace (u32 column matrix + blowup-4 LDE + zk blinding slots)
# costs ~trace_cols * 4 B * 2^(log+2) — at 2^20 rows that is ~100 GB HBM
# pressure streamed in column tiles, the practical ceiling measured on a
# single v5e chip. Raising toward 24 needs the planned column-tiled
# streaming commit (ROADMAP perf item 5).
MAX_LOG_ROWS = 20
CHANNEL_SEED = b"zksc-tpu-stark-chacha-v1"


@dataclass
class StreamStatement:
    log_rows: int
    n_blocks: int            # real (unpadded) blocks
    nonce: bytes
    counter0: int
    pt_hash: bytes
    ct_hash: bytes

    def mix_into(self, ch: Channel):
        ch.mix_u64(self.log_rows)
        ch.mix_u64(self.n_blocks)
        ch.mix_bytes(self.nonce)
        ch.mix_u64(self.counter0)
        ch.mix_bytes(self.pt_hash)
        ch.mix_bytes(self.ct_hash)


@dataclass
class TraceOpening:
    values: np.ndarray       # uint32[n_committed] LDE row at the query index
    path: list


@dataclass
class StreamProof:
    stmt: StreamStatement
    trace_root: bytes
    fri: FriProof
    openings: list           # [per query] TraceOpening

    def to_json_dict(self) -> dict:
        """JSON-serializable proof (base64 payloads), the engine-neutral
        analogue of the reference's base64 bincode envelope
        (stwo wasm_api.rs:588-601)."""
        import base64
        b64 = lambda b: base64.b64encode(b).decode()
        return {
            "protocol": "circle-stark",
            "statement": {
                "logRows": self.stmt.log_rows,
                "nBlocks": self.stmt.n_blocks,
                "nonce": b64(self.stmt.nonce),
                "counter": self.stmt.counter0,
                "ptHash": b64(self.stmt.pt_hash),
                "ctHash": b64(self.stmt.ct_hash),
            },
            "traceRoot": b64(self.trace_root),
            "fri": {
                "roots": [b64(r) for r in self.fri.layer_roots],
                "last": list(self.fri.last_value),
                "pow": self.fri.pow_nonce,
                "logN": self.fri.log_n,
                "logBlowup": self.fri.log_blowup,
                "openings": [[{
                    "v": list(o.value), "pv": list(o.pair_value),
                    "p": [b64(x) for x in o.path],
                    "pp": [b64(x) for x in o.pair_path],
                } for o in per_q] for per_q in self.fri.openings],
            },
            "traceOpenings": [{
                "values": b64(np.ascontiguousarray(o.values).tobytes()),
                "path": [b64(x) for x in o.path],
            } for o in self.openings],
        }

    def to_envelope(self) -> dict:
        """Compact wire form: base64(bincode) payload, the reference's exact
        envelope shape (stwo wasm_api.rs:588-601)."""
        from ..interop.bincode import stream_proof_envelope
        return stream_proof_envelope(self)

    @classmethod
    def from_json_dict(cls, d: dict) -> "StreamProof":
        import base64
        from .fri import FriLayerOpening
        if "proof" in d:       # base64-bincode envelope
            from ..interop.bincode import decode_stream_proof
            return decode_stream_proof(base64.b64decode(d["proof"]))
        ub = base64.b64decode
        s = d["statement"]
        stmt = StreamStatement(
            log_rows=int(s["logRows"]), n_blocks=int(s["nBlocks"]),
            nonce=ub(s["nonce"]), counter0=int(s["counter"]),
            pt_hash=ub(s["ptHash"]), ct_hash=ub(s["ctHash"]))
        f = d["fri"]
        fri = FriProof(
            layer_roots=[ub(r) for r in f["roots"]],
            last_value=tuple(int(x) for x in f["last"]),
            pow_nonce=int(f["pow"]), log_n=int(f["logN"]),
            log_blowup=int(f["logBlowup"]),
            openings=[[FriLayerOpening(
                value=tuple(int(x) for x in o["v"]),
                pair_value=tuple(int(x) for x in o["pv"]),
                path=[ub(x) for x in o["p"]],
                pair_path=[ub(x) for x in o["pp"]],
            ) for o in per_q] for per_q in f["openings"]])
        openings = [TraceOpening(
            values=np.frombuffer(ub(o["values"]), dtype=np.uint32),
            path=[ub(x) for x in o["path"]],
        ) for o in d["traceOpenings"]]
        return cls(stmt=stmt, trace_root=ub(d["traceRoot"]), fri=fri,
                   openings=openings)


def _next_pow2(x: int) -> int:
    return 1 << max(0, (x - 1).bit_length())


def _domain_params(log_rows: int):
    n = 1 << log_rows
    d = _next_pow2(n + 2 * ZK_COEFFS + 1)
    log_m = d.bit_length() - 1 + FRI_LOG_BLOWUP
    return n, 1 << log_m, log_m


@functools.lru_cache(maxsize=8)
def _ffts(log_rows: int):
    _, _, log_m = _domain_params(log_rows)
    return CircleFFT(log_rows), CircleFFT(log_m)


@functools.lru_cache(maxsize=8)
def _vn_evals(log_rows: int) -> np.ndarray:
    """V_N(x) = pi^{(log_rows - 1)}(x) on the M-domain, and its inverses."""
    _, m, log_m = _domain_params(log_rows)
    fft_m = _ffts(log_rows)[1]
    x = fft_m.domain_x.astype(np.uint64)
    for _ in range(log_rows - 1):
        x = (2 * x * x - 1) % P31
    inv = np.array([pow(int(v), -1, P31) for v in x[: m // 2]], dtype=np.uint64)
    # conjugate halves share x, so inverses repeat
    return x.astype(np.uint32), np.concatenate([inv, inv]).astype(np.uint32)


def _alpha_powers(alpha, n: int) -> np.ndarray:
    """[n, 4] uint32 powers alpha^0..alpha^{n-1} (chunked numpy ladder)."""
    af = (alpha[0][0], alpha[0][1], alpha[1][0], alpha[1][1])
    chunk = min(n, 1024)
    base = np.zeros((chunk, 4), dtype=np.uint64)
    base[0] = (1, 0, 0, 0)
    for i in range(1, chunk):
        base[i] = _qm_mul_scalar_np(af, base[i - 1: i])[0]
    out = [base]
    stepv = _qm_mul_scalar_np(af, base[-1:])[0]    # alpha^chunk
    cur = base
    total = chunk
    while total < n:
        step = (int(stepv[0]), int(stepv[1]), int(stepv[2]), int(stepv[3]))
        cur = _qm_mul_scalar_np(step, cur)
        out.append(cur)
        total += chunk
    return np.concatenate(out)[:n].astype(np.uint32)


def _mod_sum(x):
    """Modular sum over axis 0 of m31 uint32 [n, M] via halving folds."""
    n = x.shape[0]
    npad = _next_pow2(n)
    if npad != n:
        x = jnp.concatenate([x, jnp.zeros((npad - n,) + x.shape[1:],
                                          dtype=x.dtype)])
    while x.shape[0] > 1:
        h = x.shape[0] // 2
        x = m31_add(x[:h], x[h:])
    return x[0]


@functools.partial(jax.jit, static_argnums=(5,))
def _composition(vals, groups, weights, vn_inv, zero_row_idx, sizes):
    """vals: uint32[R, M] (committed LDE | public LDE | zero row).
    Returns Q = C(x) / V_N(x) as uint32[4, M] (QM31 components).

    Constraint order (alpha powers): bool, add, addx, xor, eq."""
    two = jnp.uint32(2)

    def g(idx):
        return vals[idx]

    cs = []
    b = g(groups["bool"])
    cs.append(m31_mul(b, m31_sub(jnp.uint32(1), b)))
    a = groups["add"]
    lhs = m31_add(g(a["R"]), m31_mul(two, g(a["C"])))
    rhs = m31_add(g(a["A"]), m31_add(g(a["B"]), g(a["Cin"])))
    cs.append(m31_sub(lhs, rhs))
    ax = groups["addx"]
    u, w = g(ax["U"]), g(ax["W"])
    uw = m31_mul(u, w)
    avirt = m31_sub(m31_add(u, w), m31_mul(two, uw))
    lhs = m31_add(g(ax["R"]), m31_mul(two, g(ax["C"])))
    rhs = m31_add(avirt, m31_add(g(ax["B"]), g(ax["Cin"])))
    cs.append(m31_sub(lhs, rhs))
    x = groups["xor"]
    xa, xb = g(x["A"]), g(x["B"])
    cs.append(m31_sub(m31_add(g(x["R"]), m31_mul(two, m31_mul(xa, xb))),
                      m31_add(xa, xb)))
    e = groups["eq"]
    ks, pt = g(e["KS"]), g(e["PT"])
    cs.append(m31_sub(m31_add(ks, pt),
                      m31_add(m31_mul(two, m31_mul(ks, pt)), g(e["CT"]))))
    call = jnp.concatenate(cs, axis=0)              # [n_constraints, M]

    comps = []
    for c in range(4):
        wc = weights[:, c][:, None]                 # [n, 1]
        comps.append(m31_mul(_mod_sum(m31_mul(wc, call)), vn_inv))
    return jnp.stack(comps)                         # [4, M]


def _n_constraints(groups) -> int:
    return (len(groups["bool"]) + len(groups["add"]["R"])
            + len(groups["addx"]["R"]) + len(groups["xor"]["R"])
            + len(groups["eq"]["KS"]))


def _split_blocks(data: bytes, rows: int, pad_words: np.ndarray) -> np.ndarray:
    """bytes -> uint32[rows, 16] LE words; rows beyond the data take
    pad_words values."""
    n_real = len(data) // 64
    out = pad_words.copy()
    if n_real:
        words = np.frombuffer(data, dtype="<u4").reshape(n_real, 16)
        out[:n_real] = words
    return out


def prove_stream(key: bytes, nonce: bytes, counter0: int, plaintext: bytes,
                 ciphertext: bytes) -> StreamProof:
    from ..ops.ciphers import chacha20_encrypt

    if len(key) != 32 or len(nonce) != 12:
        raise ValueError("key must be 32 bytes, nonce 12")
    if len(plaintext) != len(ciphertext) or len(plaintext) % 64:
        raise ValueError("plaintext/ciphertext must be equal multiples of 64B")
    n_blocks = len(plaintext) // 64
    if n_blocks == 0:
        raise ValueError("empty message")
    log_rows = max(MIN_LOG_ROWS, (n_blocks - 1).bit_length())
    if log_rows > MAX_LOG_ROWS:
        raise ValueError("message too large")
    rows = 1 << log_rows
    if counter0 + rows > 1 << 32:
        raise ValueError("counter overflow")

    # padding rows: plaintext := keystream, ciphertext := 0 (the xor binding
    # then holds with an all-zero public ciphertext column — the pt/ct dual
    # of wasm_api.rs:534-547's padding lanes)
    pad_ks = chacha20_encrypt(key, nonce, counter0 + n_blocks,
                              bytes(64 * (rows - n_blocks)))
    pad_pt = np.zeros((rows, 16), dtype=np.uint32)
    if rows > n_blocks:
        pad_pt[n_blocks:] = np.frombuffer(pad_ks, dtype="<u4").reshape(-1, 16)
    pt_rows = _split_blocks(plaintext, rows, pad_pt)
    ct_rows = _split_blocks(ciphertext, rows,
                            np.zeros((rows, 16), dtype=np.uint32))

    stmt = StreamStatement(
        log_rows=log_rows, n_blocks=n_blocks, nonce=bytes(nonce),
        counter0=counter0,
        pt_hash=hashlib.blake2s(plaintext, digest_size=32).digest(),
        ct_hash=hashlib.blake2s(ciphertext, digest_size=32).digest())

    ch = Channel(CHANNEL_SEED)
    stmt.mix_into(ch)

    n_comm, groups = chacha_air.layout()
    trace = chacha_air.generate_trace(key, nonce, counter0, pt_rows, ct_rows)
    n, m, log_m = _domain_params(log_rows)
    fft_n, fft_m = _ffts(log_rows)

    # blinded LDE of the committed columns
    coeffs = np.asarray(jax.vmap(fft_n.interpolate)(jnp.asarray(trace)))
    cm = np.zeros((n_comm, m), dtype=np.uint32)
    cm[:, :n] = coeffs
    blind = np.frombuffer(secrets.token_bytes(4 * n_comm * ZK_COEFFS),
                          dtype=np.uint32).reshape(n_comm, ZK_COEFFS)
    cm[:, n:n + ZK_COEFFS] = blind % P31
    lde = np.asarray(jax.vmap(fft_m.evaluate)(jnp.asarray(cm)))   # [C, M]

    rowsb = np.ascontiguousarray(lde.T).view(np.uint8).reshape(m, 4 * n_comm)
    tree = merkle.commit(rowsb)
    ch.mix_bytes(tree.root)
    alpha = ch.draw_qm31()
    weights = _alpha_powers(alpha, _n_constraints(groups))

    # public columns: interpolate + extend (no blinding)
    pub_bits = chacha_air.public_bit_matrix(
        chacha_air.public_words(nonce, counter0, ct_rows, rows))
    pub_coeffs = np.asarray(jax.vmap(fft_n.interpolate)(jnp.asarray(pub_bits)))
    pm = np.zeros((pub_bits.shape[0], m), dtype=np.uint32)
    pm[:, :n] = pub_coeffs
    pub_lde = np.asarray(jax.vmap(fft_m.evaluate)(jnp.asarray(pm)))

    vals = jnp.asarray(np.concatenate(
        [lde, pub_lde, np.zeros((1, m), dtype=np.uint32)]))
    gdev = jax.tree.map(jnp.asarray, groups)
    _, vn_inv = _vn_evals(log_rows)
    q_evals = np.asarray(_composition(vals, gdev, jnp.asarray(weights),
                                      jnp.asarray(vn_inv), 0, ()))  # [4, M]

    fri = FriContext(log_m, FRI_LOG_BLOWUP)
    fri_proof, queries = fri.prove(
        np.ascontiguousarray(q_evals.T), ch, n_queries=N_QUERIES,
        pow_bits=POW_BITS, return_queries=True)

    openings = [TraceOpening(values=lde[:, q].copy(), path=tree.open(q))
                for q in queries]
    return StreamProof(stmt=stmt, trace_root=tree.root, fri=fri_proof,
                       openings=openings)


def _host_weighted_sum(weights: np.ndarray, vals: np.ndarray) -> np.ndarray:
    """QM31 sum_i w_i * v_i: weights uint32[n,4], vals uint32[n] m31."""
    v = vals.astype(np.uint64)
    return np.stack([(weights[:, c].astype(np.uint64) * v % P31).sum() % P31
                     for c in range(4)])


def verify_stream(proof: StreamProof, nonce: bytes, counter0: int,
                  plaintext: bytes, ciphertext: bytes) -> bool:
    try:
        stmt = proof.stmt
        if not (MIN_LOG_ROWS <= stmt.log_rows <= MAX_LOG_ROWS):
            return False
        if len(plaintext) != len(ciphertext) or len(plaintext) % 64:
            return False
        n_blocks = len(plaintext) // 64
        rows = 1 << stmt.log_rows
        if (stmt.n_blocks != n_blocks or stmt.nonce != bytes(nonce)
                or stmt.counter0 != counter0 or n_blocks > rows
                or counter0 + rows > 1 << 32):
            return False
        if stmt.pt_hash != hashlib.blake2s(plaintext, digest_size=32).digest():
            return False
        if stmt.ct_hash != hashlib.blake2s(ciphertext, digest_size=32).digest():
            return False

        n, m, log_m = _domain_params(stmt.log_rows)
        if proof.fri.log_n != log_m or proof.fri.log_blowup != FRI_LOG_BLOWUP:
            return False
        if len(proof.openings) != N_QUERIES:
            return False

        ch = Channel(CHANNEL_SEED)
        stmt.mix_into(ch)
        ch.mix_bytes(proof.trace_root)
        alpha = ch.draw_qm31()
        n_comm, groups = chacha_air.layout()
        weights = _alpha_powers(alpha, _n_constraints(groups))

        # verifier-computed public columns on the M-domain
        fft_n, fft_m = _ffts(stmt.log_rows)
        ct_rows = _split_blocks(ciphertext, rows,
                                np.zeros((rows, 16), dtype=np.uint32))
        pub_bits = chacha_air.public_bit_matrix(
            chacha_air.public_words(nonce, counter0, ct_rows, rows))
        pub_coeffs = np.asarray(
            jax.vmap(fft_n.interpolate)(jnp.asarray(pub_bits)))
        pm = np.zeros((pub_bits.shape[0], m), dtype=np.uint32)
        pm[:, :n] = pub_coeffs
        pub_lde = np.asarray(jax.vmap(fft_m.evaluate)(jnp.asarray(pm)))
        vn, _ = _vn_evals(stmt.log_rows)

        order = ["bool"]
        openings_by_pos = {}

        def layer0_expected(qidx: int):
            pos = len(openings_by_pos)
            if pos >= len(proof.openings):
                return (P31, P31, P31, P31)        # impossible value -> fail
            op = proof.openings[pos]
            openings_by_pos[pos] = qidx
            vals_row = np.asarray(op.values, dtype=np.uint32)
            if vals_row.shape != (n_comm,):
                return (P31, P31, P31, P31)
            leaf = vals_row.view(np.uint8).tobytes()
            if not merkle.verify_path(proof.trace_root, qidx, leaf, op.path):
                return (P31, P31, P31, P31)
            full = np.concatenate([vals_row, pub_lde[:, qidx],
                                   np.zeros(1, dtype=np.uint32)])

            def g(idx):
                return full[idx].astype(np.uint64)

            cs = []
            b = g(groups["bool"])
            cs.append(b * ((1 + P31 - b) % P31) % P31)
            a = groups["add"]
            cs.append((g(a["R"]) + 2 * g(a["C"]) + 3 * P31 - g(a["A"])
                       - g(a["B"]) - g(a["Cin"])) % P31)
            ax = groups["addx"]
            u, w = g(ax["U"]), g(ax["W"])
            avirt = (u + w + 2 * P31 - 2 * (u * w % P31)) % P31
            cs.append((g(ax["R"]) + 2 * g(ax["C"]) + 3 * P31 - avirt
                       - g(ax["B"]) - g(ax["Cin"])) % P31)
            x = groups["xor"]
            xa, xb = g(x["A"]), g(x["B"])
            cs.append((g(x["R"]) + 2 * (xa * xb % P31) + 2 * P31 - xa - xb)
                      % P31)
            e = groups["eq"]
            ks, pt = g(e["KS"]), g(e["PT"])
            cs.append((ks + pt + 3 * P31 - 2 * (ks * pt % P31)
                       - g(e["CT"])) % P31)
            call = np.concatenate(cs)
            comb = _host_weighted_sum(weights, call.astype(np.uint32))
            vninv = pow(int(vn[qidx]), -1, P31)
            return tuple(int(c) * vninv % P31 for c in comb)

        fri = FriContext(log_m, FRI_LOG_BLOWUP)
        return fri.verify(proof.fri, ch, n_queries=N_QUERIES,
                          pow_bits=POW_BITS, layer0_expected=layer0_expected)
    except Exception:
        return False
