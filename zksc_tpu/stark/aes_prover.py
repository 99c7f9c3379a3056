"""Circle-STARK prover/verifier for the AES-CTR lookup AIR ("stark" engine).

Fills the role of stwo's prove_aes{128,256}_ctr_with_inputs /
verify_aes_ctr_with_public_inputs two-component pipeline (reference call
stack studied at stwo/src/aes/lookup/air_ctr.rs:239-650; protocol re-designed
TPU-first — see stark/aes_air.py for the AIR and the in-trace LogUp table).

Two-phase commitment (the LogUp interaction pattern):

  prove:  statement mix -> phase-1 commit (bit trace + multiplicity) ->
          draw z, alpha_lk -> phase-2 commit (lookup fractions f, table
          fraction g, cumulative column) -> draw constraint alpha ->
          composition (pointwise + sigma-shifted constraint groups) /V_N ->
          FRI.  Both phases use blinded LDEs (ZK as in stark/prover.py).
  verify: statement fast-fail -> channel replay -> verifier-evaluated public
          columns -> per-query ALI: openings of both trees at q AND sigma(q)
          must reproduce FRI layer 0 = C(q) / V_N(q).

Shift machinery: the cumulative/constancy constraints reference values at
sigma(x) (one-row rotation); on the LDE domain sigma is the fixed index
permutation aes_air.sigma_perm(M, M/N), so the prover gathers and the
verifier requires one extra opening per tree per query.
"""
from __future__ import annotations

import functools
import hashlib
import secrets
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from . import aes_air, merkle
from .channel import Channel
from .circle import CircleFFT
from .fri import FriContext, FriProof
from .m31 import P31, m31_add, m31_mul, m31_sub
from .prover import (
    FRI_LOG_BLOWUP, N_QUERIES, POW_BITS, ZK_COEFFS,
    _alpha_powers, _mod_sum, _next_pow2,
)

MIN_LOG_ROWS = 8         # the S-box table lives in the first 256 rows
MAX_LOG_ROWS = 12        # DoS + memory bound (4096 blocks = 64 KiB / proof)
CHANNEL_SEED = b"zksc-tpu-stark-aes-v1"


@dataclass
class AesStatement:
    key_size: int            # 16 or 32
    log_rows: int
    n_blocks: int
    nonce: bytes
    counter0: int
    pt_hash: bytes
    ct_hash: bytes

    def mix_into(self, ch: Channel):
        ch.mix_u64(self.key_size)
        ch.mix_u64(self.log_rows)
        ch.mix_u64(self.n_blocks)
        ch.mix_bytes(self.nonce)
        ch.mix_u64(self.counter0)
        ch.mix_bytes(self.pt_hash)
        ch.mix_bytes(self.ct_hash)


@dataclass
class RowOpening:
    values: np.ndarray
    path: list


@dataclass
class AesProof:
    stmt: AesStatement
    root1: bytes
    root2: bytes
    fri: FriProof
    openings1: list          # [per query] RowOpening of tree1 at q
    openings1s: list         # ... at sigma(q)
    openings2: list          # tree2 at q
    openings2s: list         # tree2 at sigma(q)

    def to_json_dict(self) -> dict:
        import base64
        b64 = lambda b: base64.b64encode(b).decode()

        def rows(ops):
            return [{"values": b64(np.ascontiguousarray(o.values).tobytes()),
                     "path": [b64(x) for x in o.path]} for o in ops]

        return {
            "protocol": "circle-stark-aes",
            "statement": {
                "keySize": self.stmt.key_size,
                "logRows": self.stmt.log_rows,
                "nBlocks": self.stmt.n_blocks,
                "nonce": b64(self.stmt.nonce),
                "counter": self.stmt.counter0,
                "ptHash": b64(self.stmt.pt_hash),
                "ctHash": b64(self.stmt.ct_hash),
            },
            "root1": b64(self.root1),
            "root2": b64(self.root2),
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
            "rows1": rows(self.openings1), "rows1s": rows(self.openings1s),
            "rows2": rows(self.openings2), "rows2s": rows(self.openings2s),
        }

    def to_envelope(self) -> dict:
        """Compact wire form: base64(bincode) payload, the reference's exact
        envelope shape (stwo wasm_api.rs:588-601)."""
        from ..interop.bincode import aes_proof_envelope
        return aes_proof_envelope(self)

    @classmethod
    def from_json_dict(cls, d: dict) -> "AesProof":
        import base64
        from .fri import FriLayerOpening
        if "proof" in d:       # base64-bincode envelope
            from ..interop.bincode import decode_aes_proof
            return decode_aes_proof(base64.b64decode(d["proof"]))
        ub = base64.b64decode
        s = d["statement"]
        stmt = AesStatement(
            key_size=int(s["keySize"]), log_rows=int(s["logRows"]),
            n_blocks=int(s["nBlocks"]), nonce=ub(s["nonce"]),
            counter0=int(s["counter"]), pt_hash=ub(s["ptHash"]),
            ct_hash=ub(s["ctHash"]))
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

        def rows(lst):
            return [RowOpening(
                values=np.frombuffer(ub(o["values"]), dtype=np.uint32),
                path=[ub(x) for x in o["path"]]) for o in lst]

        return cls(stmt=stmt, root1=ub(d["root1"]), root2=ub(d["root2"]),
                   fri=fri,
                   openings1=rows(d["rows1"]), openings1s=rows(d["rows1s"]),
                   openings2=rows(d["rows2"]), openings2s=rows(d["rows2s"]))


def _domain_params(log_rows: int):
    n = 1 << log_rows
    d = _next_pow2(n + 2 * ZK_COEFFS + 1)
    log_m = d.bit_length() - 1 + FRI_LOG_BLOWUP
    return n, 1 << log_m, log_m


@functools.lru_cache(maxsize=4)
def _ffts(log_rows: int):
    _, _, log_m = _domain_params(log_rows)
    return CircleFFT(log_rows), CircleFFT(log_m)


@functools.lru_cache(maxsize=4)
def _vn_evals(log_rows: int):
    _, m, _ = _domain_params(log_rows)
    fft_m = _ffts(log_rows)[1]
    x = fft_m.domain_x.astype(np.uint64)
    for _ in range(log_rows - 1):
        x = (2 * x * x - 1) % P31
    inv = np.array([pow(int(v), -1, P31) for v in x[: m // 2]],
                   dtype=np.uint64)
    return x.astype(np.uint32), np.concatenate([inv, inv]).astype(np.uint32)


def _m31_shl(x, i: int):
    """x * 2^i mod 2^31-1 = 31-bit rotate left."""
    if i == 0:
        return x
    return ((x << i) & jnp.uint32(P31)) | (x >> (31 - i))


def _byte_val(vals, refs8):
    """sum_i 2^i * vals[refs8[:, i]] (m31) -> [n, M]."""
    acc = vals[refs8[:, 0]]
    for i in range(1, 8):
        acc = m31_add(acc, _m31_shl(vals[refs8[:, i]], i))
    return acc


def _qm4_mul(a, b):
    """QM31 product of stacked [4, ...] uint32 arrays (component layout
    (c0, c1, c2, c3) = (a + b i) + (c + d i) u, u^2 = 2 + i)."""
    a0, a1, a2, a3 = a
    b0, b1, b2, b3 = b
    c0 = m31_sub(m31_mul(a0, b0), m31_mul(a1, b1))
    c1 = m31_add(m31_mul(a0, b1), m31_mul(a1, b0))
    d0 = m31_sub(m31_mul(a2, b2), m31_mul(a3, b3))
    d1 = m31_add(m31_mul(a2, b3), m31_mul(a3, b2))
    e0 = m31_sub(m31_add(d0, d0), d1)
    e1 = m31_add(d0, m31_add(d1, d1))
    y0 = m31_add(m31_sub(m31_mul(a0, b2), m31_mul(a1, b3)),
                 m31_sub(m31_mul(a2, b0), m31_mul(a3, b1)))
    y1 = m31_add(m31_add(m31_mul(a0, b3), m31_mul(a1, b2)),
                 m31_add(m31_mul(a2, b1), m31_mul(a3, b0)))
    return (m31_add(c0, e0), m31_add(c1, e1), y0, y1)


def _qm31_denominators(u, v, z4, a4):
    """(z - (u + alpha*v)) components; u, v m31 arrays, z4/a4 scalar tuples."""
    av = tuple(m31_mul(jnp.uint32(a4[c]), v) for c in range(4))
    d0 = m31_sub(jnp.uint32(z4[0]), m31_add(u, av[0]))
    return (d0,) + tuple(m31_sub(jnp.uint32(z4[c]), av[c])
                         for c in range(1, 4))


def _composition(vals, vals_sh, groups, z4, a4, weights, vn_inv):
    """vals: uint32[R, M] (phase1 | phase2 | public | zero); vals_sh the
    sigma-gathered copy. Returns Q = C/V_N as uint32[4, M].

    Constraint order (alpha powers): bool | const | xor | mix |
    lookup (4 per instance) | table (4) | cum (4) | eq."""
    one = jnp.uint32(1)
    two = jnp.uint32(2)
    cs = []
    b = vals[groups["bool"]]
    cs.append(m31_mul(b, m31_sub(one, b)))
    c = groups["const"]
    cs.append(m31_sub(vals_sh[c], vals[c]))
    x = groups["xor"]
    xa, xb = vals[x["A"]], vals[x["B"]]
    cs.append(m31_sub(m31_add(vals[x["R"]], m31_mul(two, m31_mul(xa, xb))),
                      m31_add(xa, xb)))
    mx = groups["mix"]
    t = vals[mx["T"]]                              # [n_mix, 9, M]
    s = t[:, 0]
    for i in range(1, t.shape[1]):
        s = m31_add(s, t[:, i])
    dec = m31_add(vals[mx["R"]],
                  m31_add(_m31_shl(vals[mx["K0"]], 1),
                          m31_add(_m31_shl(vals[mx["K1"]], 2),
                                  _m31_shl(vals[mx["K2"]], 3))))
    cs.append(m31_sub(s, dec))
    lk = groups["lookup"]
    u = _byte_val(vals, lk["U"])                   # [n_lk, M]
    v = _byte_val(vals, lk["V"])
    den = _qm31_denominators(u, v, z4, a4)
    f = tuple(vals[lk["F"][:, cc]] for cc in range(4))
    prod = _qm4_mul(f, den)
    lk_cs = [m31_sub(prod[0], one)] + [prod[cc] for cc in range(1, 4)]
    # interleave components per instance: row 4j+c
    cs.append(jnp.stack(lk_cs, axis=1).reshape(-1, vals.shape[1]))
    tb = groups["table"]
    tden = _qm31_denominators(vals[tb["TVAL"]][None, :],
                              vals[tb["SVAL"]][None, :], z4, a4)
    g = tuple(vals[tb["G"][cc]][None, :] for cc in range(4))
    gprod = _qm4_mul(g, tden)
    mt = m31_mul(vals[tb["M"]], vals[tb["TACT"]])[None, :]
    tb_cs = [m31_sub(gprod[0], mt)] + [gprod[cc] for cc in range(1, 4)]
    cs.append(jnp.concatenate(tb_cs, axis=0))
    # cum: cum(sx) - cum(x) - (sum_j f_j - g)(sx)
    fsum = tuple(_mod_sum(vals_sh[lk["F"][:, cc]]) for cc in range(4))
    cum_cs = []
    for cc in range(4):
        F_sh = m31_sub(fsum[cc], vals_sh[tb["G"][cc]])
        cum_cs.append(m31_sub(m31_sub(vals_sh[groups["cum"][cc]],
                                      vals[groups["cum"][cc]]), F_sh))
    cs.append(jnp.stack(cum_cs))
    e = groups["eq"]
    ks, pt = vals[e["KS"]], vals[e["PT"]]
    cs.append(m31_sub(m31_add(ks, pt),
                      m31_add(m31_mul(two, m31_mul(ks, pt)), vals[e["CT"]])))
    call = jnp.concatenate(cs, axis=0)
    comps = []
    for cc in range(4):
        wc = weights[:, cc][:, None]
        comps.append(m31_mul(_mod_sum(m31_mul(wc, call)), vn_inv))
    return jnp.stack(comps)


_composition_jit = jax.jit(_composition)


def n_constraints(key_size: int) -> int:
    n1, n2, g = aes_air.layout(key_size)
    return (len(g["bool"]) + len(g["const"]) + len(g["xor"]["R"])
            + len(g["mix"]["R"]) + 4 * len(g["lookup"]["U"]) + 4 + 4
            + len(g["eq"]["KS"]))


def _blinded_lde(cols: np.ndarray, log_rows: int, blind: bool = True):
    """[C, N] trace columns -> [C, M] LDE with random coefficients in the
    blinding slots [N, N+ZK_COEFFS)."""
    n, m, _ = _domain_params(log_rows)
    fft_n, fft_m = _ffts(log_rows)
    coeffs = np.asarray(jax.vmap(fft_n.interpolate)(jnp.asarray(cols)))
    cm = np.zeros((cols.shape[0], m), dtype=np.uint32)
    cm[:, :n] = coeffs
    if blind:
        r = np.frombuffer(secrets.token_bytes(4 * cols.shape[0] * ZK_COEFFS),
                          dtype=np.uint32).reshape(cols.shape[0], ZK_COEFFS)
        cm[:, n:n + ZK_COEFFS] = r % P31
    return np.asarray(jax.vmap(fft_m.evaluate)(jnp.asarray(cm)))


def _interaction(lk_u, lk_v, mult, z4, a4, rows: int):
    """Phase-2 trace: lookup fractions f_j = 1/(z - (u + alpha v)), table
    fraction g = m*tact/(z - (tval + alpha sval)), cumulative column.
    Returns uint32[4*(n_lk+2), rows] in F-major layout [f_j comps | g | cum]."""
    from .m31 import qm31_inv

    u = jnp.asarray(lk_u)
    v = jnp.asarray(lk_v)
    den = _qm31_denominators(u, v, z4, a4)
    dq = ((den[0], den[1]), (den[2], den[3]))
    fq = qm31_inv(dq)
    f = np.stack([np.asarray(fq[0][0]), np.asarray(fq[0][1]),
                  np.asarray(fq[1][0]), np.asarray(fq[1][1])], axis=1)
    # table side
    r = np.arange(rows)
    tval = jnp.asarray(np.where(r < 256, r, 0).astype(np.uint32))
    sval = jnp.asarray(aes_air.SBOX[np.where(r < 256, r, 0)].astype(np.uint32))
    tact = np.where(r < 256, 1, 0).astype(np.uint32)
    tden = _qm31_denominators(tval, sval, z4, a4)
    tq = qm31_inv(((tden[0], tden[1]), (tden[2], tden[3])))
    tinv = np.stack([np.asarray(tq[0][0]), np.asarray(tq[0][1]),
                     np.asarray(tq[1][0]), np.asarray(tq[1][1])])
    g = (tinv.astype(np.uint64) * (mult * tact).astype(np.uint64)) % P31
    g = g.astype(np.uint32)                        # [4, rows]
    fsum = np.zeros((4, rows), dtype=np.uint64)
    for c in range(4):
        fsum[c] = f[:, c].astype(np.uint64).sum(axis=0) % P31
    F = (fsum + P31 - g) % P31                     # [4, rows]
    cum = aes_air.cum_column(F.astype(np.uint32), rows)
    return np.concatenate([f.reshape(-1, rows), g, cum])


def prove_aes_ctr(key: bytes, nonce: bytes, counter0: int, plaintext: bytes,
                  ciphertext: bytes) -> AesProof:
    from ..ops.ciphers import aes_ctr_encrypt

    if len(key) not in (16, 32) or len(nonce) != 12:
        raise ValueError("key must be 16/32 bytes, nonce 12")
    if len(plaintext) != len(ciphertext) or len(plaintext) % 16:
        raise ValueError("plaintext/ciphertext must be equal multiples of 16B")
    n_blocks = len(plaintext) // 16
    if n_blocks == 0:
        raise ValueError("empty message")
    log_rows = max(MIN_LOG_ROWS, (n_blocks - 1).bit_length())
    if log_rows > MAX_LOG_ROWS:
        raise ValueError("message too large")
    rows = 1 << log_rows
    if counter0 + rows > 1 << 32:
        raise ValueError("counter overflow")

    # padding rows: pt := keystream  =>  public ct column is 0 there
    pad_ks = aes_ctr_encrypt(key, nonce, counter0 + n_blocks,
                             bytes(16 * (rows - n_blocks)))
    pt_rows = np.zeros((rows, 16), dtype=np.uint8)
    ct_rows = np.zeros((rows, 16), dtype=np.uint8)
    if n_blocks:
        pt_rows[:n_blocks] = np.frombuffer(plaintext,
                                           dtype=np.uint8).reshape(-1, 16)
        ct_rows[:n_blocks] = np.frombuffer(ciphertext,
                                           dtype=np.uint8).reshape(-1, 16)
    if rows > n_blocks:
        pt_rows[n_blocks:] = np.frombuffer(pad_ks,
                                           dtype=np.uint8).reshape(-1, 16)

    stmt = AesStatement(
        key_size=len(key), log_rows=log_rows, n_blocks=n_blocks,
        nonce=bytes(nonce), counter0=counter0,
        pt_hash=hashlib.blake2s(plaintext, digest_size=32).digest(),
        ct_hash=hashlib.blake2s(ciphertext, digest_size=32).digest())

    ch = Channel(CHANNEL_SEED)
    stmt.mix_into(ch)

    n1, n2, groups = aes_air.layout(len(key))
    trace1, lk_u, lk_v = aes_air.generate_trace(key, nonce, counter0,
                                                pt_rows, ct_rows)
    mult = trace1[-1].copy()
    n, m, log_m = _domain_params(log_rows)

    lde1 = _blinded_lde(trace1, log_rows)
    rows1 = np.ascontiguousarray(lde1.T).view(np.uint8).reshape(m, 4 * n1)
    tree1 = merkle.commit(rows1)
    ch.mix_bytes(tree1.root)
    zq = ch.draw_qm31()
    aq = ch.draw_qm31()
    z4 = (zq[0][0], zq[0][1], zq[1][0], zq[1][1])
    a4 = (aq[0][0], aq[0][1], aq[1][0], aq[1][1])

    trace2 = _interaction(lk_u, lk_v, mult, z4, a4, rows)
    lde2 = _blinded_lde(trace2, log_rows)
    rows2 = np.ascontiguousarray(lde2.T).view(np.uint8).reshape(m, 4 * n2)
    tree2 = merkle.commit(rows2)
    ch.mix_bytes(tree2.root)
    alpha = ch.draw_qm31()
    weights = _alpha_powers(alpha, n_constraints(len(key)))

    pub = aes_air.public_matrix(
        aes_air.public_bytes(nonce, counter0, ct_rows, rows))
    pub_lde = _blinded_lde(pub, log_rows, blind=False)

    vals = np.concatenate([lde1, lde2, pub_lde,
                           np.zeros((1, m), dtype=np.uint32)])
    perm = aes_air.sigma_perm(m, m // n)
    vals_sh = vals[:, perm]
    gdev = jax.tree.map(jnp.asarray, groups)
    _, vn_inv = _vn_evals(log_rows)
    q_evals = np.asarray(_composition_jit(
        jnp.asarray(vals), jnp.asarray(vals_sh), gdev, z4, a4,
        jnp.asarray(weights), jnp.asarray(vn_inv)))

    fri = FriContext(log_m, FRI_LOG_BLOWUP)
    fri_proof, queries = fri.prove(
        np.ascontiguousarray(q_evals.T), ch, n_queries=N_QUERIES,
        pow_bits=POW_BITS, return_queries=True)

    o1, o1s, o2, o2s = [], [], [], []
    for q in queries:
        sq = int(perm[q])
        o1.append(RowOpening(values=lde1[:, q].copy(), path=tree1.open(q)))
        o1s.append(RowOpening(values=lde1[:, sq].copy(), path=tree1.open(sq)))
        o2.append(RowOpening(values=lde2[:, q].copy(), path=tree2.open(q)))
        o2s.append(RowOpening(values=lde2[:, sq].copy(), path=tree2.open(sq)))
    return AesProof(stmt=stmt, root1=tree1.root, root2=tree2.root,
                    fri=fri_proof, openings1=o1, openings1s=o1s,
                    openings2=o2, openings2s=o2s)


def verify_aes_ctr(proof: AesProof, nonce: bytes, counter0: int,
                   plaintext: bytes, ciphertext: bytes,
                   key_size: int) -> bool:
    try:
        stmt = proof.stmt
        if stmt.key_size != key_size or key_size not in (16, 32):
            return False
        if not (MIN_LOG_ROWS <= stmt.log_rows <= MAX_LOG_ROWS):
            return False
        if len(plaintext) != len(ciphertext) or len(plaintext) % 16:
            return False
        n_blocks = len(plaintext) // 16
        rows = 1 << stmt.log_rows
        if (stmt.n_blocks != n_blocks or stmt.nonce != bytes(nonce)
                or stmt.counter0 != counter0 or n_blocks > rows
                or n_blocks == 0 or counter0 + rows > 1 << 32):
            return False
        if stmt.pt_hash != hashlib.blake2s(plaintext,
                                           digest_size=32).digest():
            return False
        if stmt.ct_hash != hashlib.blake2s(ciphertext,
                                           digest_size=32).digest():
            return False

        n, m, log_m = _domain_params(stmt.log_rows)
        if proof.fri.log_n != log_m or proof.fri.log_blowup != FRI_LOG_BLOWUP:
            return False
        if not (len(proof.openings1) == len(proof.openings1s)
                == len(proof.openings2) == len(proof.openings2s)
                == N_QUERIES):
            return False

        n1, n2, groups = aes_air.layout(key_size)
        ch = Channel(CHANNEL_SEED)
        stmt.mix_into(ch)
        ch.mix_bytes(proof.root1)
        zq = ch.draw_qm31()
        aq = ch.draw_qm31()
        z4 = tuple(int(x) for x in
                   (zq[0][0], zq[0][1], zq[1][0], zq[1][1]))
        a4 = tuple(int(x) for x in
                   (aq[0][0], aq[0][1], aq[1][0], aq[1][1]))
        ch.mix_bytes(proof.root2)
        alpha = ch.draw_qm31()
        weights = _alpha_powers(alpha, n_constraints(key_size))

        ct_rows = np.zeros((rows, 16), dtype=np.uint8)
        ct_rows[:n_blocks] = np.frombuffer(ciphertext,
                                           dtype=np.uint8).reshape(-1, 16)
        pub = aes_air.public_matrix(
            aes_air.public_bytes(nonce, counter0, ct_rows, rows))
        pub_lde = _blinded_lde(pub, stmt.log_rows, blind=False)
        vn, _ = _vn_evals(stmt.log_rows)
        perm = aes_air.sigma_perm(m, m // n)

        opened = {}

        def layer0_expected(qidx: int):
            pos = len(opened)
            if pos >= N_QUERIES:
                return (P31, P31, P31, P31)
            opened[pos] = qidx
            sq = int(perm[qidx])
            rows_ok = []
            for ops, tree_root, width, idx in (
                    (proof.openings1, proof.root1, n1, qidx),
                    (proof.openings1s, proof.root1, n1, sq),
                    (proof.openings2, proof.root2, n2, qidx),
                    (proof.openings2s, proof.root2, n2, sq)):
                op = ops[pos]
                vrow = np.asarray(op.values, dtype=np.uint32)
                if vrow.shape != (width,):
                    return (P31, P31, P31, P31)
                if not merkle.verify_path(tree_root, idx,
                                          vrow.view(np.uint8).tobytes(),
                                          op.path):
                    return (P31, P31, P31, P31)
                rows_ok.append(vrow)
            r1, r1s, r2, r2s = rows_ok
            vals = np.concatenate(
                [r1, r2, pub_lde[:, qidx],
                 np.zeros(1, dtype=np.uint32)]).astype(np.uint64)
            vals_sh = np.concatenate(
                [r1s, r2s, pub_lde[:, sq],
                 np.zeros(1, dtype=np.uint32)]).astype(np.uint64)
            call = _host_constraints(vals, vals_sh, groups, z4, a4)
            comb = [0, 0, 0, 0]
            for i, w4 in enumerate(weights):
                for cc in range(4):
                    comb[cc] = (comb[cc] + int(w4[cc]) * int(call[i])) % P31
            vninv = pow(int(vn[qidx]), -1, P31)
            return tuple(c * vninv % P31 for c in comb)

        fri = FriContext(log_m, FRI_LOG_BLOWUP)
        return fri.verify(proof.fri, ch, n_queries=N_QUERIES,
                          pow_bits=POW_BITS,
                          layer0_expected=layer0_expected)
    except Exception:
        return False


def _host_constraints(vals, vals_sh, groups, z4, a4):
    """numpy uint64 mirror of _composition's constraint vector (one point)."""
    P = P31
    out = []
    b = vals[groups["bool"]]
    out.append(b * ((1 + P - b) % P) % P)
    c = groups["const"]
    out.append((vals_sh[c] + P - vals[c]) % P)
    x = groups["xor"]
    xa, xb = vals[x["A"]], vals[x["B"]]
    out.append((vals[x["R"]] + 2 * (xa * xb % P) + 2 * P - xa - xb) % P)
    mx = groups["mix"]
    t = vals[mx["T"]]
    s = t.sum(axis=1) % P
    dec = (vals[mx["R"]] + 2 * vals[mx["K0"]] + 4 * vals[mx["K1"]]
           + 8 * vals[mx["K2"]]) % P
    out.append((s + P - dec) % P)

    def byte_val(refs8, v):
        acc = np.zeros(refs8.shape[0], dtype=np.uint64)
        for i in range(8):
            acc = (acc + (v[refs8[:, i]] << i)) % P
        return acc

    def qmul(a, b):
        a0, a1, a2, a3 = a
        b0, b1, b2, b3 = b
        c0 = (a0 * b0 + P * P - a1 * b1) % P
        c1 = (a0 * b1 + a1 * b0) % P
        d0 = (a2 * b2 + P * P - a3 * b3) % P
        d1 = (a2 * b3 + a3 * b2) % P
        e0 = (2 * d0 + P - d1) % P
        e1 = (d0 + 2 * d1) % P
        y0 = (a0 * b2 + a2 * b0 + 2 * P * P - a1 * b3 - a3 * b1) % P
        y1 = (a0 * b3 + a1 * b2 + a2 * b1 + a3 * b0) % P
        return ((c0 + e0) % P, (c1 + e1) % P, y0, y1)

    def dens(u, v):
        av = tuple(a4[cc] * v % P for cc in range(4))
        return ((z4[0] + P - (u + av[0]) % P) % P,
                (z4[1] + P - av[1]) % P,
                (z4[2] + P - av[2]) % P,
                (z4[3] + P - av[3]) % P)

    lk = groups["lookup"]
    u = byte_val(lk["U"], vals)
    v = byte_val(lk["V"], vals)
    den = dens(u, v)
    f = tuple(vals[lk["F"][:, cc]] for cc in range(4))
    prod = qmul(f, den)
    lk_cs = np.stack([(prod[0] + P - 1) % P, prod[1], prod[2], prod[3]],
                     axis=1).reshape(-1)
    out.append(lk_cs)
    tb = groups["table"]
    tden = dens(vals[tb["TVAL"]], vals[tb["SVAL"]])
    g = tuple(np.asarray([vals[tb["G"][cc]]], dtype=np.uint64)
              for cc in range(4))
    tdenv = tuple(np.asarray([tden[cc]], dtype=np.uint64) for cc in range(4))
    gprod = qmul(g, tdenv)
    mt = vals[tb["M"]] * vals[tb["TACT"]] % P
    out.append(np.asarray([(gprod[0][0] + P - mt) % P, gprod[1][0],
                           gprod[2][0], gprod[3][0]], dtype=np.uint64))
    cum_cs = []
    for cc in range(4):
        fsum = vals_sh[lk["F"][:, cc]].sum() % P
        F_sh = (fsum + P - vals_sh[tb["G"][cc]]) % P
        cum_cs.append((vals_sh[groups["cum"][cc]] + 2 * P
                       - vals[groups["cum"][cc]] - F_sh) % P)
    out.append(np.asarray(cum_cs, dtype=np.uint64))
    e = groups["eq"]
    ks, pt = vals[e["KS"]], vals[e["PT"]]
    out.append((ks + pt + 3 * P - 2 * (ks * pt % P) - vals[e["CT"]]) % P)
    return np.concatenate(out)
