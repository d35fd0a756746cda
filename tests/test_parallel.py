"""Mesh / multi-host plumbing (parallel/mesh.py).

The multi-slice branch of make_hybrid_mesh needs real TPU slice
topology; here we pin the single-slice fallback and the no-op contract
of init_distributed (multi-host is exercised by the driver's
dryrun_multichip over the virtual CPU mesh)."""

import jax
import numpy as np
from jax.sharding import NamedSharding

from styler_tpu.core.config import default_config
from styler_tpu.parallel import (
    batch_sharding,
    init_distributed,
    make_hybrid_mesh,
    make_mesh,
    param_sharding_for,
)


def test_hybrid_mesh_single_slice_fallback():
    cfg = default_config()
    mesh = make_hybrid_mesh(cfg)
    assert mesh.shape[cfg.mesh_data_axis] == len(jax.devices())
    assert mesh.shape[cfg.mesh_model_axis] == 1


def test_hybrid_mesh_model_axis():
    cfg = default_config()
    mesh = make_hybrid_mesh(cfg, model=2)
    assert mesh.shape[cfg.mesh_model_axis] == 2
    assert (
        mesh.shape[cfg.mesh_data_axis] * mesh.shape[cfg.mesh_model_axis]
        == len(jax.devices())
    )


def test_init_distributed_noop(monkeypatch):
    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    assert init_distributed() is False


def test_param_sharding_rules():
    cfg = default_config()
    mesh = make_mesh(cfg, model=2)
    # large matrix with a divisible dim -> sharded on the model axis
    sh = param_sharding_for((512, 512), mesh, cfg)
    assert isinstance(sh, NamedSharding)
    assert cfg.mesh_model_axis in (sh.spec or ())
    # small params replicate
    sh_small = param_sharding_for((8,), mesh, cfg)
    assert all(s is None for s in (sh_small.spec or (None,)))


def test_batch_sharding_spec():
    cfg = default_config()
    mesh = make_mesh(cfg)
    sh = batch_sharding(mesh, cfg)
    assert sh.spec[0] == cfg.mesh_data_axis
    x = jax.device_put(np.zeros((8, 4), np.float32), sh)
    assert x.sharding == sh
