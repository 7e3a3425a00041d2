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
    # EMA_DECAY > 0: exponential moving average of params, updated inside
    # the jitted train step; eval/serve prefer it when present (the
    # production T5 recipe — averaged weights generalize better than the
    # last noisy SGD iterate). None when EMA is off: the field contributes
    # no pytree leaves, so non-EMA checkpoints/shardings are unchanged.
    ema_params: Any = None

    @classmethod
    def create(
        cls, params, tx: optax.GradientTransformation, ema: bool = False
    ) -> "TrainState":
        # host-side copy so ema and params never alias device buffers (the
        # train step donates the whole state; aliased donated leaves would
        # be unsound)
        ema_params = (
            __import__("jax").tree.map(
                lambda x: x.copy() if hasattr(x, "copy") else x, params
            )
            if ema
            else None
        )
        return cls(
            params=params, opt_state=tx.init(params), step=0, epoch=0,
            ema_params=ema_params,
        )
