"""Sharded NTT == single-device NTT, bit-for-bit (SURVEY §2.6: NTT
butterfly-stage exchange over the mesh; §4.3: multi-chip determinism)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from zksc_tpu.fields import Fr
from zksc_tpu.ops.ntt import NTTContext
from zksc_tpu.ops.ntt_sharded import ShardedNTT
from zksc_tpu.parallel.mesh import make_mesh


@pytest.fixture(scope="module", params=[(64, 8), (128, 4)])
def ctx(request):
    n, D = request.param
    ntt = NTTContext(Fr, n)
    mesh = make_mesh(D)
    return ntt, ShardedNTT(ntt, mesh), n


def _rand(n, seed):
    rng = np.random.RandomState(seed)
    vals = [int(v) for v in rng.randint(1, 2**31, size=n)]
    return Fr.to_device(vals)


def test_dif_inverse_matches(ctx):
    ntt, sh, n = ctx
    x = _rand(n, 3)
    want = ntt.dif_inverse(x)
    got = sh.dif_inverse(jax.device_put(x, sh.sharding))
    assert jnp.array_equal(want, got)


def test_dit_forward_matches(ctx):
    ntt, sh, n = ctx
    x = _rand(n, 5)
    want = ntt.dit_forward(x)
    got = sh.dit_forward(jax.device_put(x, sh.sharding))
    assert jnp.array_equal(want, got)


def test_roundtrip_and_coset(ctx):
    ntt, sh, n = ctx
    x = _rand(n, 7)
    xs = jax.device_put(x, sh.sharding)
    # evals -> coeffs(br) -> evals roundtrip
    back = sh.dit_forward(sh.dif_inverse(xs))
    # dif includes 1/n; dit_forward(dif_inverse(x)) == x
    assert jnp.array_equal(back, x)
    # coset pipeline parity with the single-device context
    cbr = ntt.dif_inverse(x)
    want = ntt.coset_evals_from_coeffs_br(cbr)
    got = sh.coset_evals_from_coeffs_br(jax.device_put(cbr, sh.sharding))
    assert jnp.array_equal(want, got)
    want2 = ntt.coeffs_br_from_coset_evals(want)
    got2 = sh.coeffs_br_from_coset_evals(jax.device_put(want, sh.sharding))
    assert jnp.array_equal(want2, got2)
