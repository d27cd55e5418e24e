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


def _transfer_chunk_bytes() -> int:
    """Max bytes per single host->device transfer, 0 = unlimited.
    The experimental axon PJRT plugin segfaults on very large uploads
    (~200 MB observed); chunking each logical array into <=32 MB
    device_puts and concatenating ON DEVICE dodges that while keeping the
    result bitwise identical. CPU meshes skip chunking (no such bug, and
    the concat would just burn time)."""
    import os
    env = os.environ.get("PANGENE_MAX_TRANSFER_MB")
    if env is not None:
        return int(float(env) * (1 << 20))
    return 0 if jax.default_backend() == "cpu" else 32 << 20


def parallel_transfer_threads() -> int:
    """>1 enables overlapping host<->device transfers on a small thread
    pool: the PJRT client releases the GIL during the network send, so a
    second thread can serialize chunk k+1 while chunk k transmits
    (the tunnel is the bottleneck at ~60 MB/s). Default OFF — the
    experimental axon plugin has a segfault history and concurrent
    transfer calls are only enabled after a successful chip trial
    (set PANGENE_PARALLEL_TRANSFER=2)."""
    import os
    try:
        return max(1, int(os.environ.get("PANGENE_PARALLEL_TRANSFER", "1")))
    except ValueError:
        return 1


def _put_chunked(x: np.ndarray, sh: NamedSharding, g_axis: int, lim: int):
    """device_put x in <=lim-byte slices along the largest non-sharded
    axis, then concatenate on device under the target sharding."""
    import jax.numpy as jnp
    cands = [a for a in range(x.ndim) if a != g_axis and x.shape[a] > 1]
    if not cands:
        return jax.device_put(x, sh)
    ax = max(cands, key=lambda a: x.shape[a])
    n_chunks = min(-(-x.nbytes // lim), x.shape[ax])
    step = -(-x.shape[ax] // n_chunks)
    pieces = []
    idx = [slice(None)] * x.ndim
    for lo in range(0, x.shape[ax], step):
        idx[ax] = slice(lo, lo + step)
        pieces.append(np.ascontiguousarray(x[tuple(idx)]))

    def put_one(piece):
        if piece.nbytes > lim:
            return _put_chunked(piece, sh, g_axis, lim)
        return jax.device_put(piece, sh)

    nt = parallel_transfer_threads()
    if nt > 1 and len(pieces) > 1:
        from concurrent.futures import ThreadPoolExecutor
        with ThreadPoolExecutor(nt) as ex:
            parts = list(ex.map(put_one, pieces))
    else:
        parts = [put_one(p) for p in pieces]
    cat = jax.jit(lambda *ps: jnp.concatenate(ps, axis=ax),
                  out_shardings=sh)
    return cat(*parts)


def put_sharded(x: np.ndarray, mesh: Mesh, axis: int = 0):
    """Host array (replicated on every process) -> device array sharded on
    the 'g' mesh axis at dimension `axis`. Single-process: a plain
    device_put (chunked into bounded slices on TPU backends, see
    _transfer_chunk_bytes); multi-process (jax.distributed): a global
    array assembled from each process's addressable shards of the SAME
    host data — the single-controller emulation that makes the sharded
    engine run unchanged on N hosts."""
    sh = NamedSharding(mesh, P(*((None,) * axis + ("g",))))
    if jax.process_count() == 1:
        lim = _transfer_chunk_bytes()
        if lim and x.nbytes > lim:
            return _put_chunked(x, sh, axis, lim)
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
