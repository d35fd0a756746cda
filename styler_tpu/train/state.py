"""Train state: params + batch stats (PostNet BatchNorm) + optimizer."""

from __future__ import annotations

from typing import Any

import flax
import jax
import optax
from flax.training import train_state

from styler_tpu.core.config import Config
from styler_tpu.models import STYLER
from styler_tpu.train.optimizer import make_optimizer


class TrainState(train_state.TrainState):
    batch_stats: Any = None


def create_train_state(
    config: Config, rng: jax.Array, example_batch: dict
) -> tuple[STYLER, TrainState]:
    """Initialize model variables from an example batch and build the
    optimizer (reference train.py:33-56)."""
    from styler_tpu.train.step import FORWARD_KEYS

    model = STYLER(config)
    variables = model.init(
        rng, **{k: example_batch[k] for k in FORWARD_KEYS if k in example_batch}
    )
    tx = make_optimizer(config)
    state = TrainState.create(
        apply_fn=model.apply,
        params=variables["params"],
        tx=tx,
        batch_stats=variables.get("batch_stats", flax.core.freeze({})),
    )
    return model, state
