"""Device mesh + sharding for SPMD training/inference.

The reference's only parallelism is single-process nn.DataParallel
(reference train.py:33). TPU-native replacement: one jitted program over a
``jax.sharding.Mesh``; the batch axis is sharded over the ``data`` mesh
axis, parameters are replicated (an optional ``model`` axis is plumbed
through for larger variants), and XLA inserts the gradient all-reduce
over ICI.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from styler_tpu.core.config import Config


def make_mesh(
    config: Optional[Config] = None,
    data: Optional[int] = None,
    model: int = 1,
    devices=None,
) -> Mesh:
    """Build an (data x model) mesh over the available devices."""
    config = config or Config()
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if data is None:
        data = n // model
    assert data * model == n, f"mesh {data}x{model} != {n} devices"
    dev_array = np.asarray(devices).reshape(data, model)
    return Mesh(dev_array, (config.mesh_data_axis, config.mesh_model_axis))


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize multi-host JAX (one process per host) when requested.

    The reference is single-host only (SURVEY.md §2.2: nn.DataParallel,
    no comm backend). Multi-host here is pure plumbing: after
    ``jax.distributed.initialize`` every host runs the same jitted SPMD
    program over the global mesh and XLA routes collectives over
    ICI within a slice and DCN across slices.

    Returns True if distributed mode was initialized. No-ops (returns
    False) when neither arguments nor the standard environment
    (JAX_COORDINATOR_ADDRESS / TPU metadata autodetection) request it,
    so single-host callers pay nothing.
    """
    import os

    requested = coordinator_address or num_processes or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    if not requested:
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def make_hybrid_mesh(
    config: Optional[Config] = None,
    model: int = 1,
    devices=None,
) -> Mesh:
    """DCN-aware (data x model) mesh for multi-slice topologies.

    Data parallelism spans slices (gradient all-reduce crosses DCN once
    per step — the only traffic this ~30 M-param model needs across the
    slow links), while any model axis stays inside a slice so its
    collectives ride ICI. Falls back to :func:`make_mesh` on
    single-slice / CPU topologies, so callers can use it unconditionally.
    """
    config = config or Config()
    devices = devices if devices is not None else jax.devices()
    slice_ids = {getattr(d, "slice_index", 0) for d in devices}
    num_slices = len(slice_ids)
    if num_slices <= 1:
        return make_mesh(config, model=model, devices=devices)
    from jax.experimental import mesh_utils

    per_slice = len(devices) // num_slices
    assert per_slice % model == 0, (
        f"model axis {model} must divide the {per_slice} devices of a slice"
    )
    dev_array = mesh_utils.create_hybrid_device_mesh(
        mesh_shape=(per_slice // model, model),
        dcn_mesh_shape=(num_slices, 1),
        devices=devices,
    )
    return Mesh(dev_array, (config.mesh_data_axis, config.mesh_model_axis))


def batch_sharding(mesh: Mesh, config: Optional[Config] = None) -> NamedSharding:
    """Shard the leading (batch) axis over the data axis."""
    config = config or Config()
    return NamedSharding(mesh, P(config.mesh_data_axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Dict, mesh: Mesh, config: Optional[Config] = None) -> Dict:
    """Device-put every array in the batch with its batch axis sharded."""
    sh = batch_sharding(mesh, config)
    return {k: jax.device_put(v, sh) for k, v in batch.items()}


def replicate_state(state, mesh: Mesh):
    return jax.device_put(state, replicated(mesh))


def param_sharding_for(
    shape, mesh: Mesh, config: Optional[Config] = None, min_elems: int = 1 << 16
) -> NamedSharding:
    """Tensor-parallel sharding rule for one parameter array.

    Large matrices (>= min_elems) are sharded along their largest
    dimension divisible by the model-axis size; everything else is
    replicated. At this model scale (~30 M params) TP is optional —
    SURVEY.md §2.2 — but the rule gives real dp x tp shardings for the
    multichip path and scales to wider variants unchanged.
    """
    config = config or Config()
    axis = config.mesh_model_axis
    n = mesh.shape[axis]
    if n > 1 and np.prod(shape) >= min_elems:
        divisible = [i for i, d in enumerate(shape) if d % n == 0 and d >= n]
        if divisible:
            dim = max(divisible, key=lambda i: shape[i])
            spec = [None] * len(shape)
            spec[dim] = axis
            return NamedSharding(mesh, P(*spec))
    return replicated(mesh)


def shard_state(state, mesh: Mesh, config: Optional[Config] = None):
    """device_put a train state with dp x tp shardings: every float
    array leaf (params AND the optimizer moments, which mirror param
    shapes) gets the tensor-parallel rule; scalars replicate."""
    shardings = jax.tree_util.tree_map(
        lambda leaf: param_sharding_for(getattr(leaf, "shape", ()), mesh, config),
        state,
    )
    return jax.device_put(state, shardings)
