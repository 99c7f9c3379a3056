"""Per-stage timing of the ChaCha20 Groth16 prove path on the current backend.

Usage: python tools/profile_prove.py [batch]
Prints one line per stage (wall seconds, steady-state after warmup).
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax

if jax.default_backend() != "cpu":
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache_tpu"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import secrets

import numpy as np

from zksc_tpu import api
from zksc_tpu.ops import ec, msm


def bench(label, fn, iters=3):
    fn()  # warmup (compile)
    t0 = time.time()
    for _ in range(iters):
        out = fn()
    jax.block_until_ready(out) if hasattr(out, "block_until_ready") or isinstance(out, (list, tuple)) else None
    dt = (time.time() - t0) / iters
    print(f"{label:36s} {dt*1e3:9.1f} ms")
    return dt


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    algorithm = "chacha20"
    key = secrets.token_bytes(32)
    iv = secrets.token_bytes(12)
    data = secrets.token_bytes(128)

    op = api.get_operator(algorithm, "groth16")
    wi = api.generate_zk_witness(algorithm, key=key, ciphertext=data, iv=iv)

    t0 = time.time()
    wit = op.spec.build_witness(wi)
    print(f"{'witness build (host)':36s} {(time.time()-t0)*1e3:9.1f} ms")

    op._ensure_keys()
    ctx = op._ctx  # ProverContext
    pk = ctx.pk
    wits = [wit] * batch

    t0 = time.time()
    z_mont, z_plain, nb = ctx._witnesses_to_device(wits)
    jax.block_until_ready(z_mont)
    print(f"{'witness->device':36s} {(time.time()-t0)*1e3:9.1f} ms  n_bits={nb}")

    def h_fn():
        out = ctx.compute_h_batch(z_mont)
        jax.block_until_ready(out)
        return out
    bench("H pipeline (matvec+NTT)", h_fn)
    h_plain = ctx.compute_h_batch(z_mont)

    ell = pk.n_public + 1
    priv_plain = z_plain[:, :, ell:ell + ctx.c_pad]
    if priv_plain.shape[2] < ctx.c_pad:
        import jax.numpy as jnp
        priv_plain = jnp.pad(priv_plain, ((0, 0), (0, 0), (0, ctx.c_pad - priv_plain.shape[2])))

    for label, fops, pts, sc, bits in [
        ("MSM A (G1, wires)", ec.G1_OPS, pk.a_query, z_plain, nb),
        ("MSM B1 (G1, wires)", ec.G1_OPS, pk.b_g1_query, z_plain, nb),
        ("MSM B2 (G2, wires)", ec.G2_OPS, pk.b_g2_query, z_plain, nb),
        ("MSM C (G1, priv)", ec.G1_OPS, pk.c_query, priv_plain, nb),
        ("MSM H (G1, 254-bit)", ec.G1_OPS, pk.h_query, h_plain, 254),
    ]:
        def msm_fn(fops=fops, pts=pts, sc=sc, bits=bits):
            return msm.msm_pippenger(fops, pts, sc, bits)
        bench(label, msm_fn)

    t0 = time.time()
    proofs = ctx.prove_batch(wits)
    dt = time.time() - t0
    print(f"{'full prove_batch':36s} {dt*1e3:9.1f} ms  ({batch} proofs, "
          f"{batch/dt:.3f} proofs/s)")


if __name__ == "__main__":
    main()
