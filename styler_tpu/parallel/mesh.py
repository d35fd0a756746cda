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
