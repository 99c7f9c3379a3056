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
