"""Device mesh utilities: the genome data-parallel axis.

The engine's parallel structure (SURVEY.md §2.4): per-genome stages shard
over a 1-D ('g',) mesh (ICI within host, DCN across hosts); cross-genome
reductions are psums of id-indexed accumulators; gene/protein tables are
small and replicated.
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int = 0) -> Mesh:
    devs = jax.devices()
    if n_devices <= 0:
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
