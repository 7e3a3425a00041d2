"""Training state pytree."""

from __future__ import annotations

from typing import Any

import flax.struct
import optax


@flax.struct.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: int
    epoch: int

    @classmethod
    def create(cls, params, tx: optax.GradientTransformation) -> "TrainState":
        return cls(params=params, opt_state=tx.init(params), step=0, epoch=0)
