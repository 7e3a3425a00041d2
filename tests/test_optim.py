"""Optimizer construction knobs (train/optim.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from phoneme_vqa_tpu.train.optim import (
    build_optimizer,
    epoch_decay_schedule,
    linear_warmup_schedule,
    mu_dtype_from_config,
)


def _tiny_tree():
    return {"w": jnp.ones((4, 3), jnp.float32), "b": jnp.zeros((3,), jnp.float32)}


def test_mu_dtype_knob_stores_bf16_first_moment():
    tx = build_optimizer(lambda s: 1e-3, mu_dtype=jnp.bfloat16)
    params = _tiny_tree()
    opt_state = tx.init(params)
    mus = [l for l in jax.tree.leaves(opt_state) if getattr(l, "dtype", None) == jnp.bfloat16]
    assert mus, "no bf16 leaves in opt state"
    # nu must stay f32 (rsqrt dynamic range)
    adam = opt_state[0]
    assert all(l.dtype == jnp.bfloat16 for l in jax.tree.leaves(adam.mu))
    assert all(l.dtype == jnp.float32 for l in jax.tree.leaves(adam.nu))
    # an update step still moves params in the right direction
    grads = jax.tree.map(jnp.ones_like, params)
    updates, _ = tx.update(grads, opt_state, params)
    assert all(np.all(np.asarray(u) < 0) for u in jax.tree.leaves(updates))


def test_mu_dtype_close_to_f32_reference():
    """bf16 mu tracks the f32-mu trajectory closely over a few steps."""
    def run(mu_dtype):
        tx = build_optimizer(lambda s: 1e-2, mu_dtype=mu_dtype)
        params = _tiny_tree()
        opt_state = tx.init(params)
        rng = np.random.RandomState(0)
        for _ in range(10):
            grads = jax.tree.map(
                lambda p: jnp.asarray(rng.randn(*p.shape), jnp.float32), params
            )
            updates, opt_state = tx.update(grads, opt_state, params)
            params = jax.tree.map(lambda p, u: p + u, params, updates)
        return params

    a, b = run(None), run(jnp.bfloat16)
    for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=3e-3)


def test_mu_dtype_from_config():
    class C(dict):
        def get(self, k, d=None):
            return super().get(k, d)

    assert mu_dtype_from_config(C()) is None
    assert mu_dtype_from_config(C(OPT_MU_DTYPE="float32")) is None
    assert mu_dtype_from_config(C(OPT_MU_DTYPE="bfloat16")) == jnp.bfloat16


def test_schedules():
    s = epoch_decay_schedule(1.0, steps_per_epoch=10)
    assert s(0) == 1.0 and np.isclose(s(10), 0.95) and np.isclose(s(25), 0.95**2)
    w = linear_warmup_schedule(3.0, warmup_steps=6)
    assert np.isclose(float(w(0)), 1.0) and np.isclose(float(w(6)), 3.0)
    assert np.isclose(float(w(12)), 3.0)


def test_adafactor_knob_factored_state_and_descent():
    """OPTIMIZER: adafactor — factored second moments (no full-matrix state)
    and the loss still descends on a toy quadratic."""
    from phoneme_vqa_tpu.train.optim import optimizer_kind_from_config

    class _C(dict):
        def get(self, k, d=None):
            return dict.get(self, k, d)

    assert optimizer_kind_from_config(_C()) == "adam"
    assert optimizer_kind_from_config(_C(OPTIMIZER="Adafactor")) == "adafactor"

    params = {"w": jnp.ones((256, 192), jnp.float32)}
    tx_ada = build_optimizer(lambda s: 1e-2, kind="adafactor")
    tx_adam = build_optimizer(lambda s: 1e-2, kind="adam")
    n_param = 256 * 192
    size = lambda st: sum(
        int(np.prod(l.shape)) for l in jax.tree.leaves(st)
        if hasattr(l, "shape") and l.ndim > 0
    )
    # adam: mu + nu = 2x params; adafactor: row + col vectors only
    assert size(tx_adam.init(params)) >= 2 * n_param
    assert size(tx_ada.init(params)) < n_param // 10

    target = jnp.asarray(np.random.RandomState(0).randn(256, 192), jnp.float32)
    loss = lambda p: jnp.mean((p["w"] - target) ** 2)
    state, p = tx_ada.init(params), params
    losses = []
    for _ in range(40):
        l, g = jax.value_and_grad(loss)(p)
        updates, state = tx_ada.update(g, state, p)
        p = optax.apply_updates(p, updates)
        losses.append(float(l))
    assert losses[-1] < losses[0] * 0.7, losses


def test_grad_clip_caps_update_to_global_norm():
    """GRAD_CLIP: a huge gradient produces the same update as the same
    direction scaled to the clip threshold — and small grads are untouched."""
    params = _tiny_tree()
    clipped = build_optimizer(lambda s: 1e-3, grad_clip=1.0)
    plain = build_optimizer(lambda s: 1e-3)

    big = jax.tree.map(lambda p: 1e6 * jnp.ones_like(p), params)
    gnorm = optax.global_norm(big)
    scaled = jax.tree.map(lambda g: g / gnorm, big)  # norm exactly 1.0

    u_clip, _ = clipped.update(big, clipped.init(params), params)
    u_ref, _ = plain.update(scaled, plain.init(params), params)
    for a, b in zip(jax.tree.leaves(u_clip), jax.tree.leaves(u_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5)

    small = jax.tree.map(lambda p: 1e-3 * jnp.ones_like(p), params)
    u_small_clip, _ = clipped.update(small, clipped.init(params), params)
    u_small, _ = plain.update(small, plain.init(params), params)
    for a, b in zip(jax.tree.leaves(u_small_clip), jax.tree.leaves(u_small)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_weight_decay_decays_params():
    """WEIGHT_DECAY > 0 (adam -> adamw): with zero gradients the update
    still pulls params toward zero at lr * wd; plain adam leaves a tiny
    eps-driven drift instead."""
    params = {"w": jnp.full((4, 3), 2.0, jnp.float32)}
    zeros = jax.tree.map(jnp.zeros_like, params)

    wd = build_optimizer(lambda s: 1e-1, weight_decay=1e-2)
    u, _ = wd.update(zeros, wd.init(params), params)
    # decoupled decay: update = -lr * wd * param = -0.1 * 0.01 * 2 = -2e-3
    np.testing.assert_allclose(np.asarray(u["w"]), -2e-3, rtol=1e-5)

    plain = build_optimizer(lambda s: 1e-1)
    u0, _ = plain.update(zeros, plain.init(params), params)
    assert np.allclose(np.asarray(u0["w"]), 0.0, atol=1e-8)


def test_adafactor_weight_decay_and_extras_from_config():
    from phoneme_vqa_tpu.train.optim import optimizer_extras_from_config

    class _C(dict):
        def get(self, k, d=None):
            return dict.get(self, k, d)

    assert optimizer_extras_from_config(_C()) == {
        "grad_clip": None, "weight_decay": 0.0,
    }
    assert optimizer_extras_from_config(_C(GRAD_CLIP=1.0, WEIGHT_DECAY=0.01)) == {
        "grad_clip": 1.0, "weight_decay": 0.01,
    }

    params = {"w": jnp.full((64, 48), 2.0, jnp.float32)}
    tx = build_optimizer(lambda s: 1e-1, kind="adafactor", weight_decay=1e-2)
    u, _ = tx.update(jax.tree.map(jnp.zeros_like, params), tx.init(params), params)
    assert np.all(np.asarray(u["w"]) < 0), "adafactor weight decay did not engage"


def test_grad_clip_through_executor(tmp_path):
    """GRAD_CLIP through the real executor: trains + checkpoints cleanly."""
    from phoneme_vqa_tpu import registry_setup  # noqa: F401
    from phoneme_vqa_tpu.config import get_config
    from phoneme_vqa_tpu.utils.registry import EXECUTORS

    from .fixtures import make_latr_fixture, tiny_latr_yaml

    paths = make_latr_fixture(tmp_path)
    yaml_path = tiny_latr_yaml(
        paths, str(tmp_path / "ck"), NUM_EPOCHS=1, GRAD_CLIP=1.0,
        WEIGHT_DECAY=0.01,
    )
    config = get_config(yaml_path)
    ex = EXECUTORS.get(config.EXECUTOR)(config, mode="train")
    ex.run()
    assert int(ex.state.epoch) == 1


def test_label_smoothing_matches_explicit_onehot_form():
    """The reduction-form smoothed CE equals the textbook smoothed-one-hot
    cross entropy, and a=0 reproduces plain CE exactly."""
    from phoneme_vqa_tpu.train.optim import cross_entropy_loss

    rng = np.random.RandomState(0)
    V, pad = 11, 0
    logits = jnp.asarray(rng.randn(4, 7, V), jnp.float32)
    targets = jnp.asarray(rng.randint(0, V, (4, 7)), jnp.int32)
    a = 0.1

    got = float(cross_entropy_loss(logits, targets, pad, label_smoothing=a))

    logp = np.asarray(jax.nn.log_softmax(logits, axis=-1))
    onehot = np.eye(V)[np.asarray(targets)]
    smoothed = (1 - a) * onehot + a / V
    mask = (np.asarray(targets) != pad).astype(np.float32)
    want = -(smoothed * logp).sum(-1) * mask
    want = want.sum() / mask.sum()
    np.testing.assert_allclose(got, want, rtol=1e-5)

    plain = float(cross_entropy_loss(logits, targets, pad))
    plain0 = float(cross_entropy_loss(logits, targets, pad, label_smoothing=0.0))
    assert plain == plain0
    assert got > plain  # smoothing adds entropy penalty at random logits


def test_label_smoothing_through_executor(tmp_path):
    """LABEL_SMOOTHING through the real executor: the epoch-1 train loss
    differs from the unsmoothed run (knob actually reaches the jitted loss),
    and an out-of-range value fails fast."""
    import pytest

    from phoneme_vqa_tpu import registry_setup  # noqa: F401
    from phoneme_vqa_tpu.config import get_config
    from phoneme_vqa_tpu.utils.registry import EXECUTORS

    from .fixtures import make_latr_fixture, tiny_latr_yaml

    paths = make_latr_fixture(tmp_path)

    def train_loss(tag, **kw):
        yaml_path = tiny_latr_yaml(paths, str(tmp_path / tag), NUM_EPOCHS=1, **kw)
        ex = EXECUTORS.get("LaTr_Executor")(get_config(yaml_path), mode="train")
        ex.run()
        import json
        line = open(str(tmp_path / tag / "metrics.jsonl")).readline()
        return json.loads(line)["train_loss"]

    smooth = train_loss("ls", LABEL_SMOOTHING=0.1)
    plain = train_loss("nols")
    assert abs(smooth - plain) > 1e-4, (smooth, plain)

    bad = tiny_latr_yaml(paths, str(tmp_path / "bad"), LABEL_SMOOTHING=1.5)
    ex = EXECUTORS.get("LaTr_Executor")(get_config(bad), mode="train")
    with pytest.raises(ValueError, match="LABEL_SMOOTHING"):
        ex.run()


def test_lr_schedule_from_config():
    """LR_SCHEDULE: cosine (warmup -> peak -> LR_MIN) and constant
    (warmup -> flat); absent -> the family default untouched."""
    import pytest

    from phoneme_vqa_tpu.train.optim import schedule_from_config

    class _C(dict):
        def get(self, k, d=None):
            return dict.get(self, k, d)

        def __getattr__(self, k):
            return self[k]

    default = epoch_decay_schedule(1.0, 10)
    assert schedule_from_config(_C(LR=1.0), default, 10) is default

    c = _C(LR=2.0, LR_SCHEDULE="cosine", WARMUP_STEPS=10, NUM_EPOCHS=10,
           LR_MIN=0.2)
    s = schedule_from_config(c, default, 10)  # total = 100 steps
    assert float(s(0)) < 0.3  # warmup starts near 0
    assert np.isclose(float(s(10)), 2.0)  # peak after warmup
    assert np.isclose(float(s(100)), 0.2)  # decays to LR_MIN
    mid = float(s(55))
    assert 0.2 < mid < 2.0

    k = schedule_from_config(
        _C(LR=3.0, LR_SCHEDULE="constant", WARMUP_STEPS=6), default, 10
    )
    assert float(k(0)) < 3.0 and np.isclose(float(k(5)), 3.0)
    assert np.isclose(float(k(500)), 3.0)
    flat = schedule_from_config(_C(LR=3.0, LR_SCHEDULE="constant"), default, 10)
    assert flat(0) == 3.0 and flat(999) == 3.0

    with pytest.raises(ValueError, match="LR_SCHEDULE"):
        schedule_from_config(_C(LR=1.0, LR_SCHEDULE="polynomial"), default, 10)


def test_lr_schedule_through_executor(tmp_path):
    """LR_SCHEDULE: cosine through the real executor trains cleanly."""
    from phoneme_vqa_tpu import registry_setup  # noqa: F401
    from phoneme_vqa_tpu.config import get_config
    from phoneme_vqa_tpu.utils.registry import EXECUTORS

    from .fixtures import make_latr_fixture, tiny_latr_yaml

    paths = make_latr_fixture(tmp_path)
    yaml_path = tiny_latr_yaml(
        paths, str(tmp_path / "ck"), NUM_EPOCHS=1, LR_SCHEDULE="cosine",
        WARMUP_STEPS=2,
    )
    ex = EXECUTORS.get("LaTr_Executor")(get_config(yaml_path), mode="train")
    ex.run()
    assert int(ex.state.epoch) == 1
    # the live LR lands in metrics.jsonl
    import json

    line = json.loads(open(str(tmp_path / "ck" / "metrics.jsonl")).readline())
    assert "lr" in line and 0.0 <= line["lr"] <= 1e-3, line


def test_grad_clip_ignores_frozen_gradients():
    """GRAD_CLIP + freeze (LoRA): the clip lives inside the multi_transform
    'train' branch, so the global norm covers ONLY trainable leaves — a huge
    gradient on a frozen subtree must not shrink the adapter update."""
    params = {"base": {"w": jnp.ones((4,))}, "lora": {"a": jnp.ones((4,))}}
    freeze = lambda p: bool(p) and getattr(p[0], "key", str(p[0])) == "base"
    tx = build_optimizer(lambda s: 1e-1, grad_clip=1.0, freeze_predicate=freeze)

    giant = {"base": {"w": 1e9 * jnp.ones((4,))}, "lora": {"a": 1e-3 * jnp.ones((4,))}}
    quiet = {"base": {"w": jnp.zeros((4,))}, "lora": {"a": 1e-3 * jnp.ones((4,))}}
    u_giant, _ = tx.update(giant, tx.init(params), params)
    u_quiet, _ = tx.update(quiet, tx.init(params), params)
    np.testing.assert_array_equal(
        np.asarray(u_giant["lora"]["a"]), np.asarray(u_quiet["lora"]["a"])
    )
    assert np.all(np.asarray(u_giant["base"]["w"]) == 0)


def test_build_optimizer_rejects_unknown_kind():
    import pytest

    with pytest.raises(ValueError):
        build_optimizer(lambda s: 1e-3, kind="sgd")


def test_adafactor_executor_train_and_resume(tmp_path):
    """OPTIMIZER: adafactor through the real executor: trains, checkpoints
    its factored opt state, and auto-resumes with exact param values."""
    from phoneme_vqa_tpu import registry_setup  # noqa: F401
    from phoneme_vqa_tpu.config import get_config
    from phoneme_vqa_tpu.utils.registry import EXECUTORS

    from .fixtures import make_latr_fixture, tiny_latr_yaml

    paths = make_latr_fixture(tmp_path)
    yaml_path = tiny_latr_yaml(
        paths, str(tmp_path / "ck"), NUM_EPOCHS=1, OPTIMIZER="adafactor"
    )
    config = get_config(yaml_path)
    ex = EXECUTORS.get(config.EXECUTOR)(config, mode="train")
    ex.run()
    resumed = EXECUTORS.get(config.EXECUTOR)(config, mode="train")
    assert int(resumed.state.epoch) == 1
    a = np.asarray(jax.tree.leaves(ex.state.params)[0])
    b = np.asarray(jax.tree.leaves(resumed.state.params)[0])
    np.testing.assert_array_equal(a, b)
