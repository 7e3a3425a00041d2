"""Optimizers, schedules, loss.

Reference training properties
(`/root/reference/core/executor/base_executor.py:167-170`): Adam(LR, BETAS,
eps=1e-9) + CE(ignore_index=pad) + a 0.95**epoch LR decay; the Customized/
Phoneme executors use LinearLR warmup over ``warmup_step`` steps and freeze
the encoder for ``NUM_FREEZE_EPOCH`` epochs
(`CustomizedLaTr_Executor.py:151-158,245`).

Note: the reference calls its "per-epoch" LambdaLR scheduler once per
*training step* (`LaTr_Executor.py:167`), collapsing the LR after a few
hundred steps. We implement the intended per-epoch decay; the schedule is a
function of (step, steps_per_epoch).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import optax


def epoch_decay_schedule(base_lr: float, steps_per_epoch: int, gamma: float = 0.95):
    def schedule(step):
        epoch = step // max(1, steps_per_epoch)
        return base_lr * gamma**epoch

    return schedule


def linear_warmup_schedule(base_lr: float, warmup_steps: int):
    """torch LinearLR(total_iters=warmup) equivalent: ramps from
    base_lr/3 (torch's default start_factor) to base_lr."""

    def schedule(step):
        frac = jnp.minimum(step / max(1, warmup_steps), 1.0)
        return base_lr * (1.0 / 3.0 + (1.0 - 1.0 / 3.0) * frac)

    return schedule


def schedule_from_config(config, default_schedule, steps_per_epoch: int):
    """YAML ``LR_SCHEDULE`` overrides the family-default schedule
    (LaTr/PreSTU/SaL: the reference's 0.95**epoch decay; Customized/Phoneme:
    LinearLR warmup). Absent/empty -> ``default_schedule`` unchanged.

    * ``cosine`` — optional linear warmup over ``WARMUP_STEPS`` then cosine
      decay to ``LR_MIN`` (default 0) across NUM_EPOCHS x steps_per_epoch.
    * ``constant`` — optional linear warmup then flat LR.
    """
    kind = str(config.get("LR_SCHEDULE", "") or "").lower()
    if not kind:
        return default_schedule
    base = float(config.LR)
    warmup = int(config.get("WARMUP_STEPS", 0) or 0)
    total = max(1, int(config.get("NUM_EPOCHS", 1)) * max(1, steps_per_epoch))
    if kind == "cosine":
        total = max(total, warmup + 1)  # optax needs decay_steps > warmup
        return optax.warmup_cosine_decay_schedule(
            init_value=0.0 if warmup else base,
            peak_value=base,
            warmup_steps=warmup,
            decay_steps=total,  # optax counts warmup inside decay_steps
            end_value=float(config.get("LR_MIN", 0.0) or 0.0),
        )
    if kind == "constant":
        if not warmup:
            return lambda step: base

        def schedule(step):
            return base * jnp.minimum((step + 1) / warmup, 1.0)

        return schedule
    raise ValueError(f"unknown LR_SCHEDULE {kind!r} (cosine | constant)")


def build_optimizer(
    lr_schedule: Callable,
    betas=(0.9, 0.98),
    eps: float = 1e-9,
    freeze_predicate: Optional[Callable[[tuple], bool]] = None,
    mu_dtype=None,
    kind: str = "adam",
    grad_clip: Optional[float] = None,
    weight_decay: float = 0.0,
):
    """Optimizer with schedule; optionally zero updates for frozen subtrees
    (optax.masked equivalent of the reference's requires_grad freeze).

    ``kind`` (YAML ``OPTIMIZER``):
    * ``adam`` (default) — the reference's optimizer
      (`/root/reference/core/executor/base_executor.py:167`). ``mu_dtype``
      (YAML ``OPT_MU_DTYPE: bfloat16``) stores the first moment in a reduced
      dtype: -25 % optimizer memory and HBM traffic per step. The second
      moment stays f32 (its rsqrt needs the dynamic range).
    * ``adamw`` — adam with decoupled weight decay (``WEIGHT_DECAY``, also
      implied by ``OPTIMIZER: adam`` + ``WEIGHT_DECAY > 0``).
    * ``adafactor`` — the T5-native memory-light optimizer: factored second
      moments (row+col vectors instead of a full matrix per weight) and no
      first moment, cutting the optimizer state from 2x params to ~zero and
      with it the per-step optimizer HBM traffic that bounds the train step
      (docs/DESIGN.md). ``multiply_by_parameter_scale=False`` so the YAML
      ``LR`` means what it says (betas/eps are adam-only and ignored).

    ``grad_clip`` (YAML ``GRAD_CLIP``): global-norm gradient clipping applied
    before the update rule — the clip sees the full (accumulated, mesh-summed)
    gradient, so the threshold means the same thing at any GRAD_ACCUM/mesh
    layout. The reference has no clipping; this is an additive stability knob.
    """
    if kind == "adafactor":
        tx = optax.adafactor(
            lr_schedule, multiply_by_parameter_scale=False, momentum=None,
            weight_decay_rate=weight_decay or None,
        )
    elif kind in ("adam", "adamw"):
        if kind == "adamw" or weight_decay:
            tx = optax.adamw(
                lr_schedule, b1=betas[0], b2=betas[1], eps=eps,
                mu_dtype=mu_dtype, weight_decay=weight_decay,
            )
        else:
            tx = optax.adam(
                lr_schedule, b1=betas[0], b2=betas[1], eps=eps, mu_dtype=mu_dtype
            )
    else:
        raise ValueError(f"unknown OPTIMIZER {kind!r} (adam | adamw | adafactor)")
    if grad_clip:
        tx = optax.chain(optax.clip_by_global_norm(float(grad_clip)), tx)
    if freeze_predicate is None:
        return tx

    def label_tree(params):
        flat = jax.tree_util.tree_flatten_with_path(params)[0]
        labels = {}
        for path, _ in flat:
            labels[path] = "frozen" if freeze_predicate(path) else "train"
        return jax.tree_util.tree_unflatten(
            jax.tree_util.tree_structure(params),
            [labels[p] for p, _ in flat],
        )

    return optax.multi_transform(
        {"train": tx, "frozen": optax.set_to_zero()}, label_tree
    )


def mu_dtype_from_config(config):
    """YAML ``OPT_MU_DTYPE`` ('bfloat16'/'float32') -> dtype or None."""
    name = config.get("OPT_MU_DTYPE", None)
    return None if name in (None, "", "float32") else jnp.dtype(name)


def optimizer_kind_from_config(config) -> str:
    """YAML ``OPTIMIZER`` ('adam' | 'adamw' | 'adafactor'); default adam."""
    return str(config.get("OPTIMIZER", "adam") or "adam").lower()


def optimizer_extras_from_config(config) -> dict:
    """YAML ``GRAD_CLIP`` (float global-norm threshold, 0/absent = off) and
    ``WEIGHT_DECAY`` (decoupled decay rate, 0/absent = off) ->
    `build_optimizer` kwargs. Fails fast on nonsense values."""
    clip = float(config.get("GRAD_CLIP", 0) or 0)
    wd = float(config.get("WEIGHT_DECAY", 0) or 0)
    if clip < 0:
        raise ValueError(f"GRAD_CLIP must be > 0 (or 0/absent = off), got {clip}")
    if wd < 0:
        raise ValueError(f"WEIGHT_DECAY must be >= 0, got {wd}")
    return {"grad_clip": clip or None, "weight_decay": wd}


def cross_entropy_loss(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    pad_id: int,
    label_smoothing: float = 0.0,
):
    """Token-mean CE over non-pad targets (torch CrossEntropyLoss
    ignore_index semantics). logits (..., V) f32, targets (...) int.

    ``label_smoothing`` (YAML ``LABEL_SMOOTHING``, e.g. 0.1 — the standard
    T5 recipe): smoothed target = (1-a)·one_hot + a/V. Implemented without
    materializing the one-hot: the smoothed CE is
    (1-a)·NLL(target) - (a/V)·sum(logp), one extra reduction over logits
    the existing log_softmax already touched — no extra HBM pass."""
    mask = (targets != pad_id).astype(jnp.float32)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    ll = jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    if label_smoothing:
        a = float(label_smoothing)
        v = logits.shape[-1]
        ll = (1.0 - a) * ll + (a / v) * logp.sum(axis=-1)
    return -(ll * mask).sum() / jnp.maximum(mask.sum(), 1.0)
