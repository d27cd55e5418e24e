"""Device mesh utilities: the genome data-parallel axis.

The engine's parallel structure (SURVEY.md §2.4): per-genome stages shard
over a 1-D ('g',) mesh (ICI within host, DCN across hosts); cross-genome
reductions are psums of id-indexed accumulators; gene/protein tables are
small and replicated.
"""
from __future__ import annotations


import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


_dist_initialized = False


def init_distributed() -> None:
    """Multi-host bring-up: call jax.distributed.initialize when the
    standard coordinator env vars are present (no-op on single host).
    Idempotent; driven by JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES /
    JAX_PROCESS_ID as set by the pod launcher."""
    global _dist_initialized
    if _dist_initialized:
        return
    _dist_initialized = True
    import os
    addr = os.environ.get("JAX_COORDINATOR_ADDRESS")
    if not addr:
        return
    jax.distributed.initialize(
        coordinator_address=addr,
        num_processes=int(os.environ.get("JAX_NUM_PROCESSES", "1")),
        process_id=int(os.environ.get("JAX_PROCESS_ID", "0")))


def make_mesh(n_devices: int = 0) -> Mesh:
    init_distributed()
    devs = jax.devices()
    if n_devices <= 0 or jax.process_count() > 1:
        # multi-process: the mesh must span every process's devices, or
        # some process would own no addressable shard of any array
        n_devices = len(devs)
    n_devices = min(n_devices, len(devs))
    return Mesh(np.array(devs[:n_devices]), axis_names=("g",))


def genome_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("g"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def pad_genomes(G: int, mesh: Mesh) -> int:
    d = mesh.devices.size
    return ((G + d - 1) // d) * d


def put_sharded(x: np.ndarray, mesh: Mesh, axis: int = 0):
    """Host array (replicated on every process) -> device array sharded on
    the 'g' mesh axis at dimension `axis`. Single-process: a plain
    device_put; multi-process (jax.distributed): a global array assembled
    from each process's addressable shards of the SAME host data — the
    single-controller emulation that makes the sharded engine run
    unchanged on N hosts."""
    sh = NamedSharding(mesh, P(*((None,) * axis + ("g",))))
    if jax.process_count() == 1:
        return jax.device_put(x, sh)
    return jax.make_array_from_callback(x.shape, sh, lambda idx: x[idx],
                                        dtype=x.dtype)


def pull_global(arr) -> np.ndarray:
    """Device array -> full host numpy on EVERY process (allgather across
    hosts when the array is sharded over them)."""
    if jax.process_count() == 1 or arr.is_fully_addressable:
        return np.asarray(arr)
    from jax.experimental import multihost_utils
    return np.asarray(multihost_utils.process_allgather(arr, tiled=True))
