"""Mesh construction + bootstrap edge cases (parallel.mesh)."""

import jax
import pytest

from miekki_tpu.parallel.mesh import initialize_distributed, local_mesh


def test_local_mesh_default_covers_all_devices():
    mesh = local_mesh()
    assert mesh.shape["db"] == len(jax.devices())


def test_local_mesh_shape_validation():
    with pytest.raises(ValueError, match="mesh shape"):
        local_mesh(shape=(3,))  # 8 devices, wrong product
    with pytest.raises(ValueError, match="axis_names"):
        local_mesh(shape=(2, 4), axis_names=("data",))


def test_local_mesh_subset_devices():
    mesh = local_mesh(devices=jax.devices()[:4])
    assert mesh.shape["db"] == 4


def test_initialize_distributed_is_noop_single_process(monkeypatch):
    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    initialize_distributed()  # must not raise or try to bootstrap
    assert jax.process_count() == 1
