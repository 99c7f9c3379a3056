"""Worker for test_multihost_2proc: one of two cooperating processes.

Initializes jax.distributed through zksc_tpu.parallel.multihost, builds the
global 8-device mesh (4 virtual CPU devices per process), and runs the
sharded NTT whose hypercube ppermute exchanges now cross a PROCESS boundary
(the DCN analogue), asserting bit-equality with the single-device transform.

Invoked as: python multihost_worker.py <pid> <port> <repo_root>
"""
import os
import sys

pid = int(sys.argv[1])
port = sys.argv[2]
repo = sys.argv[3]

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
sys.path.insert(0, repo)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from zksc_tpu.parallel import multihost  # noqa: E402

assert multihost.initialize(f"localhost:{port}", 2, pid), \
    "distributed init must report active"
assert multihost.initialize() is True, "second call must be idempotent"

import numpy as np  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

from zksc_tpu.fields import Fr  # noqa: E402
from zksc_tpu.ops.ntt import NTTContext  # noqa: E402
from zksc_tpu.ops.ntt_sharded import ShardedNTT  # noqa: E402

mesh = multihost.global_mesh()
assert int(mesh.devices.size) == 8, mesh
assert jax.process_count() == 2

# host_slice must cover [0, n) disjointly across the two processes
s = multihost.host_slice(10)
assert (s == slice(0, 5)) if pid == 0 else (s == slice(5, 10)), s

n = 16
ntt = NTTContext(Fr, n)
sntt = ShardedNTT(ntt, mesh)

rng = np.random.RandomState(0)
vals = [int(v) for v in rng.randint(1, 2**31, size=n)]
full = np.asarray(Fr.to_device(vals))                  # [L, n] Montgomery
ref = np.asarray(ntt.dif_inverse(full))                # single-device truth

sh = NamedSharding(mesh, P(None, "shard"))
cols = slice(pid * (n // 2), (pid + 1) * (n // 2))     # this process's lanes
garr = jax.make_array_from_process_local_data(sh, full[:, cols], full.shape)

out = sntt.dif_inverse(garr)
for shard in out.addressable_shards:
    got = np.asarray(shard.data)
    want = ref[(slice(None), shard.index[1])]
    assert (got == want).all(), f"proc {pid} shard {shard.index} mismatch"

print(f"MULTIHOST-NTT-OK proc={pid}", flush=True)
