"""stwo-compatible ChaCha20 stream prover — emits proofs the REFERENCE
stwo verifier accepts (byte-identical to the reference prover's output).

Mirrors prove_chacha20_encrypt (wasm_api.rs) + prove_stream_internal
(air_stream.rs) + stwo::prove with the exact transcript, Merkle layout,
quotient combination, FRI folds and bincode schema established in
NOTES.md. The heavy parts (trace, LDE, constraint evaluation, hashing)
are vectorized with numpy; a TPU path can swap in batched kernels.
"""
from __future__ import annotations

import hashlib
import struct

import numpy as np

from . import field as F
from .air import evaluate_constraints_m31, N_CONSTRAINTS
from .channel import Blake2sChannel
from .circle import CanonicCoset, bit_reverse
from .codec import FriLayer, StwoStreamProof, encode_stream_proof
from .fri import (LineDomainIter, fold_circle_pair, fold_line_pair,
                  qm31_leaf)
from .merkle import EMPTY_ROOT, decommit as merkle_decommit
from .quotients import oods_point
from .trace import (basis_eval_qm31, generate_stream_trace,
                    generate_trace_row)


def _commit_leaves(leaves: list) -> tuple:
    layers = [leaves]
    cur = leaves
    while len(cur) > 1:
        cur = [hashlib.blake2s(cur[i] + cur[i + 1]).digest()
               for i in range(0, len(cur), 2)]
        layers.append(cur)
    return cur[0], layers


def _pi_k_m31(x: int, k: int) -> int:
    for _ in range(k):
        x = (2 * x * x - 1) % F.P
    return x


def _sample_columns(coeffs_obj, basis_q):
    """coeffs_obj: [n_basis, n_cols] object array of M31 ints.
    basis_q: n_basis QM31 tuples. Returns list of QM31 samples per col."""
    n_cols = coeffs_obj.shape[1]
    out_coords = []
    for coord in range(4):
        b = np.array([q[coord] for q in basis_q], dtype=object)
        out_coords.append((coeffs_obj.T @ b) % F.P)
    return [(int(out_coords[0][c]), int(out_coords[1][c]),
             int(out_coords[2][c]), int(out_coords[3][c]))
            for c in range(n_cols)]


def prove_stream(key: bytes, nonce: bytes, counter: int, plaintext: bytes,
                 ciphertext: bytes, pow_bits: int = 10, log_blowup: int = 1,
                 n_queries: int = 3):
    """Returns (proof: StwoStreamProof, None) or raises ValueError."""
    if len(key) != 32 or len(nonce) != 12:
        raise ValueError("key must be 32 bytes, nonce 12")
    if not plaintext or len(plaintext) % 64:
        raise ValueError("plaintext must be a non-empty multiple of 64")
    if len(ciphertext) != len(plaintext):
        raise ValueError("ciphertext length mismatch")
    n_blocks = len(plaintext) // 64
    log_size = max((n_blocks - 1).bit_length() if n_blocks > 1 else 0, 4)
    n = 1 << log_size

    key_w = [int.from_bytes(key[i * 4:i * 4 + 4], "little")
             for i in range(8)]
    nonce_w = [int.from_bytes(nonce[i * 4:i * 4 + 4], "little")
               for i in range(3)]
    counters = [(counter + i) & 0xFFFFFFFF for i in range(n)]
    pts, cts = [], []
    for b in range(n):
        if b < n_blocks:
            pts.append([int.from_bytes(plaintext[b * 64 + w * 4:
                                                 b * 64 + w * 4 + 4],
                                       "little") for w in range(16)])
            cts.append([int.from_bytes(ciphertext[b * 64 + w * 4:
                                                  b * 64 + w * 4 + 4],
                                       "little") for w in range(16)])
        else:
            # padding lanes: plaintext 0, ciphertext = keystream
            _, ks = generate_trace_row(key_w, nonce_w, counters[b])
            pts.append([0] * 16)
            cts.append(ks)

    trace, valid = generate_stream_trace(key_w, nonce_w, counters, pts,
                                         cts)
    if not valid:
        raise ValueError("ciphertext does not match encryption")

    from . import cfft
    trace_coeffs = cfft.interpolate(trace)
    lde_i = cfft.evaluate(trace_coeffs, log_size + log_blowup)
    n2 = 2 * n

    pt_hash = hashlib.blake2s(plaintext).digest()
    ct_hash = hashlib.blake2s(ciphertext).digest()

    # --- channel: preprocessed commit + statement ---
    ch = Blake2sChannel()
    ch.mix_root(EMPTY_ROOT)
    ch.mix_u64(log_size)
    for i in range(3):
        ch.mix_u64(nonce_w[i])
    ch.mix_u64(counter)
    for i in range(8):
        ch.mix_u64(struct.unpack_from("<I", pt_hash, 4 * i)[0])
    for i in range(8):
        ch.mix_u64(struct.unpack_from("<I", ct_hash, 4 * i)[0])

    # --- trace tree ---
    leaf_bytes1 = [lde_i[pos].astype("<u4").tobytes() for pos in range(n2)]
    leaves1 = [hashlib.blake2s(b).digest() for b in leaf_bytes1]
    root1, layers1 = _commit_leaves(leaves1)
    ch.mix_root(root1)
    random_coeff = ch.draw_felt()

    # --- composition ---
    cons = evaluate_constraints_m31(lde_i.T)      # [ncon, n2]
    # acc[pos] = sum c_i * alpha^(ncon-1-i)  (per QM31 coordinate)
    apow = [F.ONE] * N_CONSTRAINTS
    for i in range(1, N_CONSTRAINTS):
        apow[i] = F.mul(apow[i - 1], random_coeff)
    acc = []
    for coord in range(4):
        col = np.array([apow[N_CONSTRAINTS - 1 - i][coord]
                        for i in range(N_CONSTRAINTS)], dtype=np.int64)
        hi, lo = col >> 16, col & 0xFFFF
        s = ((cons.T @ hi) % F.P * (1 << 16) + (cons.T @ lo)) % F.P
        acc.append(s)
    cdom = CanonicCoset(log_size + log_blowup).circle_domain()
    xs = np.array([cdom.at(bit_reverse(i, log_size + 1))[0]
                   for i in range(n2)], dtype=np.int64)
    V = np.array([_pi_k_m31(int(x), log_size - 1) for x in xs],
                 dtype=np.int64)
    Vinv = np.array([pow(int(v), F.P - 2, F.P) for v in V],
                    dtype=np.int64)
    comp = [(acc[c] * Vinv) % F.P for c in range(4)]   # f coords [n2]

    # decompose f = g + lambda*V : lambda = <f,V>/<V,V>
    vv = int((V.astype(object) @ V.astype(object)) % F.P)
    vv_inv = pow(vv, F.P - 2, F.P)
    lams, gcols = [], []
    for c in range(4):
        fv = int((comp[c].astype(object) @ V.astype(object)) % F.P)
        lam = fv * vv_inv % F.P
        lams.append(lam)
        gcols.append((comp[c] - lam * V) % F.P)

    # --- composition tree ---
    tree2_cols = gcols + [np.full(n2, lam, dtype=np.int64)
                          for lam in lams]
    leaves2 = [hashlib.blake2s(b"".join(
        struct.pack("<I", int(col[pos])) for col in tree2_cols)).digest()
        for pos in range(n2)]
    root2, layers2 = _commit_leaves(leaves2)
    ch.mix_root(root2)
    oods_t = ch.draw_felt()
    P_pt = oods_point(oods_t)

    # --- sampled values ---
    basis_q = basis_eval_qm31(P_pt, log_size)
    samples_trace = _sample_columns(trace_coeffs.astype(object), basis_q)
    g_mat = np.stack(gcols, axis=1)                      # [n2, 4]
    coeffs_g = cfft.interpolate(g_mat)
    basis_q2 = basis_eval_qm31(P_pt, log_size + 1)
    samples_g = _sample_columns(coeffs_g.astype(object), basis_q2)
    samples_lam = [(lam, 0, 0, 0) for lam in lams]
    sampled_flat = samples_trace + samples_g + samples_lam
    ch.mix_felts(sampled_flat)
    gamma = ch.draw_felt()

    # --- quotient column on the commitment domain ---
    Px, Py = P_pt
    Pcx, Pcy = F.conj(Px), F.conj(Py)
    c_const = F.sub(Pcy, Py)
    gam_pow = F.ONE
    A = F.ZERO
    B = F.ZERO
    gp_coords = np.zeros((4, len(sampled_flat)), dtype=object)
    for j, v in enumerate(sampled_flat):
        a_j = F.sub(F.conj(v), v)
        b_j = F.sub(F.mul(v, c_const), F.mul(a_j, Py))
        A = F.add(A, F.mul(gam_pow, a_j))
        B = F.add(B, F.mul(gam_pow, b_j))
        for coord in range(4):
            gp_coords[coord][j] = gam_pow[coord]
        gam_pow = F.mul(gam_pow, gamma)
    all_cols = np.concatenate(
        [lde_i.astype(object),
         np.stack([c.astype(object) for c in tree2_cols], axis=1)],
        axis=1)                                          # [n2, 33288]
    S = [ (all_cols @ gp_coords[coord]) % F.P for coord in range(4) ]
    ys = np.array([cdom.at(bit_reverse(i, log_size + 1))[1]
                   for i in range(n2)], dtype=np.int64)
    quot = []
    cy = F.sub(Py, Pcy)
    cx = F.sub(Pcx, Px)
    c0 = F.sub(F.mul(Px, Pcy), F.mul(Pcx, Py))
    minus2u = (0, 0, F.P - 2, 0)
    for pos in range(n2):
        Sv = (int(S[0][pos]), int(S[1][pos]), int(S[2][pos]),
              int(S[3][pos]))
        num = F.sub(F.mul(c_const, Sv),
                    F.add(F.mul_m31(A, int(ys[pos])), B))
        den = F.add(F.add(F.mul_m31(cy, int(xs[pos])),
                          F.mul_m31(cx, int(ys[pos]))), c0)
        quot.append(F.mul(F.mul(num, F.inv(den)), minus2u))

    # --- FRI commit phase ---
    dom = cdom
    fri_layers = []                  # (values, root, layers, kind)
    leavesF = [qm31_leaf(v) for v in quot]
    rootF, layersF = _commit_leaves(leavesF)
    ch.mix_root(rootF)
    alpha = ch.draw_felt()
    fri_layers.append((quot, rootF, layersF))
    vals = [fold_circle_pair(quot[2 * k], quot[2 * k + 1],
                             dom.at_stored(2 * k)[1], alpha)
            for k in range(n2 // 2)]
    half = dom.half_coset
    ld = LineDomainIter(half.initial_index, half.step_index,
                        half.log_size)
    inner = []
    while len(vals) > 2:
        leavesI = [qm31_leaf(v) for v in vals]
        rootI, layersI = _commit_leaves(leavesI)
        ch.mix_root(rootI)
        alpha = ch.draw_felt()
        inner.append((vals, rootI, layersI))
        vals = [fold_line_pair(vals[2 * k], vals[2 * k + 1],
                               ld.x_at_stored(2 * k), alpha)
                for k in range(len(vals) // 2)]
        ld = ld.double()
    assert len(vals) == 2 and vals[0] == vals[1], "fri fold inconsistency"
    last_coeff = vals[0]
    ch.mix_felts([last_coeff])

    # --- pow + queries ---
    pow_nonce = ch.grind(pow_bits)
    from .verifier import draw_query_positions
    positions = draw_query_positions(ch, log_size + log_blowup, n_queries)

    # --- assemble proof ---
    p = StwoStreamProof(
        log_size=log_size, nonce=nonce, counter=counter, pt_hash=pt_hash,
        ct_hash=ct_hash, pow_bits=pow_bits, log_blowup=log_blowup,
        log_last_layer=0, n_queries=n_queries)
    p.commitments = [EMPTY_ROOT, root1, root2]
    p.sampled_values = [[], [[v] for v in samples_trace],
                        [[v] for v in samples_g + samples_lam]]
    p.decommitments = [[], merkle_decommit(layers1, positions),
                       merkle_decommit(layers2, positions)]
    p.queried_values = [
        [],
        [[int(lde_i[pos][c]) for pos in positions] for c in range(33280)],
        [[int(col[pos]) for pos in positions] for col in tree2_cols]]
    p.proof_of_work = pow_nonce

    def fri_layer_proof(values, root, layers, pos_list):
        known = sorted(set(pos_list))
        sibs = sorted(s for s in {q ^ 1 for q in known} if s not in known)
        wit_vals = [values[s] for s in sibs]
        all_pos = sorted(set(known) | set(sibs))
        return FriLayer(fri_witness=wit_vals,
                        hash_witness=merkle_decommit(layers, all_pos),
                        commitment=root), sorted(
                            {q // 2 for q in all_pos})

    p.first_layer, cur_pos = fri_layer_proof(*fri_layers[0], positions)
    p.inner_layers = []
    for (vals_l, root_l, layers_l) in inner:
        layer, cur_pos = fri_layer_proof(vals_l, root_l, layers_l,
                                         cur_pos)
        p.inner_layers.append(layer)
    p.last_layer_coeffs = [last_coeff]
    p.last_layer_log_size = 0
    return p


def prove_stream_bytes(key, nonce, counter, plaintext, ciphertext):
    return encode_stream_proof(prove_stream(key, nonce, counter,
                                            plaintext, ciphertext))
