"""Chunked host->device transfer (parallel/mesh._put_chunked): the axon
PJRT plugin segfaults on very large single uploads, so put_sharded splits
them into bounded device_puts and concatenates ON DEVICE. These tests pin
bitwise equality and sharding of the reassembled arrays on the CPU mesh
for every layout the engine ships (g-axis at dim 0 and dim 1, dtypes used
by the packed blocks, recursion when one slice still exceeds the limit)."""
import numpy as np
import pytest

jax = pytest.importorskip("jax")

from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pangene_tpu.parallel import mesh as mesh_mod


@pytest.fixture(scope="module")
def mesh():
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 virtual devices")
    return Mesh(np.array(devs[:8]), axis_names=("g",))


@pytest.mark.parametrize("shape,axis,dtype", [
    ((16, 64), 0, np.int64),          # plain [G, H]
    ((12, 16, 640), 1, np.int32),     # packed block, 'g' on axis 1
    ((4, 16, 640), 1, np.int64),
    ((5, 16, 33), 1, np.uint8),
    ((2, 16, 4096), 1, np.int32),     # few leading rows -> recursion
])
def test_chunked_equals_direct(mesh, shape, axis, dtype):
    rng = np.random.default_rng(0)
    x = rng.integers(0, 120, size=shape).astype(dtype)
    sh = NamedSharding(mesh, P(*((None,) * axis + ("g",))))
    # force tiny chunks so every branch (split choice, recursion) runs
    got = mesh_mod._put_chunked(x, sh, axis, lim=1 << 12)
    assert got.sharding.is_equivalent_to(sh, x.ndim)
    np.testing.assert_array_equal(np.asarray(got), x)
    direct = jax.device_put(x, sh)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(direct))


def test_put_sharded_env_override(mesh, monkeypatch):
    monkeypatch.setenv("PANGENE_MAX_TRANSFER_MB", "0.001")
    x = np.arange(16 * 512, dtype=np.int64).reshape(16, 512)
    got = mesh_mod.put_sharded(x, mesh, 0)
    np.testing.assert_array_equal(np.asarray(got), x)
    monkeypatch.setenv("PANGENE_MAX_TRANSFER_MB", "0")
    got2 = mesh_mod.put_sharded(x, mesh, 0)
    np.testing.assert_array_equal(np.asarray(got2), x)
