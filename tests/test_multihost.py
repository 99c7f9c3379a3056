"""Multi-host orchestration helpers (SURVEY §2.6: jax.distributed layer).
Single-process CI exercises the topology math and the mesh constructors."""
from zksc_tpu.parallel import multihost


def test_host_slice_partitions_exactly():
    for n_items in (0, 1, 7, 8, 23):
        for n_procs in (1, 2, 3, 8):
            covered = []
            for p in range(n_procs):
                s = multihost.host_slice(n_items, process_id=p,
                                         num_processes=n_procs)
                covered.extend(range(n_items)[s])
            assert covered == list(range(n_items)), (n_items, n_procs)


def test_host_slice_balance():
    sizes = [len(range(100)[multihost.host_slice(100, process_id=p,
                                                 num_processes=8)])
             for p in range(8)]
    assert max(sizes) - min(sizes) <= 1


def test_local_and_global_mesh_single_host():
    m = multihost.global_mesh()
    lm = multihost.local_mesh()
    assert m.devices.size == 8 and lm.devices.size == 8  # CPU test mesh


def test_initialize_single_host_noop():
    assert multihost.initialize() is False  # no cluster env -> inactive


def test_two_process_distributed_ntt():
    """REAL multi-process validation (SURVEY §2.6 multi-host orchestration):
    two jax.distributed processes (4 virtual CPU devices each) form one
    8-device global mesh and run the sharded NTT whose ppermute exchanges
    cross the process boundary — the DCN analogue of a 2-host TPU pod.
    Each process checks its shards bit-match the single-device transform."""
    import os
    import socket
    import subprocess
    import sys

    here = os.path.dirname(os.path.abspath(__file__))
    repo = os.path.dirname(here)
    worker = os.path.join(here, "multihost_worker.py")
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [subprocess.Popen(
        [sys.executable, worker, str(pid), str(port), repo],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env, text=True)
        for pid in range(2)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=360)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out[-3000:]}"
        assert f"MULTIHOST-NTT-OK proc={pid}" in out
