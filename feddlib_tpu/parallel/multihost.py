"""Multi-host runtime — the MPI/Teuchos::Comm replacement at process level
(SURVEY.md §2.8 row 1: 'multi-host JAX runtime (jax.distributed), host-side
process groups; collectives over ICI/DCN').

FEDDLib runs one MPI rank per subdomain; feddlib_tpu runs one PROCESS per
host and one mesh-axis entry per DEVICE.  Within a host, devices talk over
ICI; across hosts, XLA routes the same collectives (psum / all_gather in
the halo plans, parallel/spmd.py) over DCN — the program does not change.

Setup-phase host work (mesh read, partitioning, symbolic fillComplete,
overlap growth, GDSW interface classification) is replicated on every
process, mirroring the reference's 'every rank reads the whole mesh'
simplicity (MeshPartitioner_def.hpp:258: each rank runs the same serial
METIS call).  Plans are deterministic, so all processes derive identical
gather/scatter indices and shard only the device-resident arrays they own.

Usage on an N-host slice (one process per host):

    from feddlib_tpu.parallel import multihost
    multihost.initialize(coordinator="host0:1234",
                         num_processes=N, process_id=rank)
    axis = multihost.global_device_axis()   # spans ALL hosts' devices
    # ... build DistributedCsr / DistributedSolver on `axis` as usual

Single-process (tests, one chip, the virtual CPU mesh) needs no
initialize(): `global_device_axis()` falls back to the local devices.
"""

from __future__ import annotations

from typing import Optional

import jax

from feddlib_tpu.parallel.spmd import DeviceAxis

_initialized = False


def initialize(coordinator: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Join the multi-process JAX runtime (jax.distributed.initialize).

    With no arguments, auto-detects cluster environment variables (GKE/GCE
    TPU metadata), matching jax.distributed defaults.  Idempotent."""
    global _initialized
    if _initialized:
        return
    kwargs = {}
    if coordinator is not None:
        kwargs["coordinator_address"] = coordinator
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)
    _initialized = True


def is_multiprocess() -> bool:
    return jax.process_count() > 1


def global_device_axis(n_dev: Optional[int] = None) -> DeviceAxis:
    """1-D DD mesh over the GLOBAL device list (all hosts).

    jax.devices() already returns every process's devices once the
    distributed runtime is initialized; DeviceAxis.make therefore spans
    hosts transparently and shard_map programs place each partition on its
    owning host's chips."""
    return DeviceAxis.make(n_dev)


def process_local_slice(axis: DeviceAxis):
    """(start, stop) partition indices whose devices live on THIS process —
    use to restrict host-side uploads to locally-addressable shards on
    multi-host platforms where jax.Array shards must be fed per-host."""
    devs = list(axis.mesh.devices.ravel())
    pid = jax.process_index()
    local = [i for i, d in enumerate(devs) if d.process_index == pid]
    if not local:
        return (0, 0)
    return (min(local), max(local) + 1)
