"""LoRA parameter-efficient finetuning (train/lora.py).

Pins:
* adapter init is exact-identity (B zeros -> merged == base bitwise)
* target selection: attn vs all vs explicit; SCAN_LAYERS 3-D stacked kernels;
  non-kernel / embedding leaves excluded; zero matches fail fast
* the optimizer allocates NO state for the base tree (the memory claim)
* executor end-to-end: trains with LORA_RANK, base params bitwise frozen,
  adapters move, eval-from-checkpoint merges without LORA_* config keys
* checkpoint interop both ways (LoRA ckpt -> flat run merges; flat ckpt ->
  LoRA run becomes the frozen base)
* TP sharding rules fire on the composite tree ("base/" prefix transparent)
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from phoneme_vqa_tpu.config import Config
from phoneme_vqa_tpu.train import lora


def _tiny_params():
    rng = np.random.RandomState(0)

    def w(*shape):
        return jnp.asarray(rng.randn(*shape).astype(np.float32))

    return {
        "encoder": {
            "block_0": {
                "attn": {
                    "q": {"kernel": w(8, 8)},
                    "k": {"kernel": w(8, 8)},
                    "v": {"kernel": w(8, 8)},
                    "o": {"kernel": w(8, 8)},
                },
                "ffn": {"wi_0": {"kernel": w(8, 16)}, "wo": {"kernel": w(16, 8)}},
                "ln0": {"weight": w(8)},
            },
            # SCAN_LAYERS stacked layout: leading (num_layers,) axis
            "blocks": {
                "attn": {"q": {"kernel": w(3, 8, 8)}},
                "ffn": {"wo": {"kernel": w(3, 16, 8)}},
            },
        },
        "shared": {"embedding": w(32, 8)},
    }


def _spec(**kw):
    return lora.from_config(Config({"LORA_RANK": 2, **kw}))


def test_from_config_off_and_on():
    assert lora.from_config(Config({})) is None
    assert lora.from_config(Config({"LORA_RANK": 0})) is None
    spec = lora.from_config(Config({"LORA_RANK": 4}))
    assert spec.rank == 4 and spec.alpha == 8.0 and spec.scale == 2.0
    spec = lora.from_config(
        Config({"LORA_RANK": 4, "LORA_ALPHA": 4, "LORA_TARGETS": "q,v"})
    )
    assert spec.scale == 1.0 and spec.targets == ("q", "v")


def test_target_selection_attn_vs_all():
    params = _tiny_params()
    attn = lora.init_lora(params, _spec(), jax.random.PRNGKey(0))
    flat = {"/".join(getattr(k, "key", str(k)) for k in p): None
            for p, _ in jax.tree_util.tree_flatten_with_path(attn)[0]}
    # q/k/v/o adapted (incl. the scanned q); ffn, ln, embedding not
    assert any("attn/q/kernel" in k for k in flat)
    assert any("blocks/attn/q/kernel" in k for k in flat)
    assert not any("ffn" in k for k in flat)
    assert not any("embedding" in k or "ln0" in k for k in flat)

    allt = lora.init_lora(
        params, _spec(LORA_TARGETS="all"), jax.random.PRNGKey(0)
    )
    flat_all = {"/".join(getattr(k, "key", str(k)) for k in p): None
                for p, _ in jax.tree_util.tree_flatten_with_path(allt)[0]}
    assert any("wi_0" in k for k in flat_all)
    assert any("blocks/ffn/wo" in k for k in flat_all)
    assert not any("embedding" in k for k in flat_all)


def test_no_match_fails_fast():
    with pytest.raises(ValueError, match="matched no kernel"):
        lora.init_lora(
            _tiny_params(), _spec(LORA_TARGETS="nonexistent"),
            jax.random.PRNGKey(0),
        )


def test_merge_identity_at_init():
    params = _tiny_params()
    adapters = lora.init_lora(params, _spec(), jax.random.PRNGKey(0))
    merged = lora.merge_lora(params, adapters, scale=2.0)
    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_flatten_with_path(params)[0],
        jax.tree_util.tree_flatten_with_path(merged)[0],
    ):
        assert pa == pb
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_merge_applies_delta_and_scale():
    params = _tiny_params()
    spec = _spec(LORA_TARGETS="q")
    adapters = lora.init_lora(params, spec, jax.random.PRNGKey(0))
    # plant a non-zero B on the 2-D q
    node = adapters["encoder"]["block_0"]["attn"]["q"]["kernel"]
    node["b"] = jnp.ones_like(node["b"])
    merged = lora.merge_lora(params, adapters, scale=0.5)
    want = params["encoder"]["block_0"]["attn"]["q"]["kernel"] + 0.5 * (
        node["a"] @ node["b"]
    )
    np.testing.assert_allclose(
        np.asarray(merged["encoder"]["block_0"]["attn"]["q"]["kernel"]),
        np.asarray(want), rtol=1e-6,
    )
    # untouched leaf passes through by reference
    assert merged["shared"]["embedding"] is params["shared"]["embedding"]
    # scanned q: batched matmul shape is preserved
    sq = merged["encoder"]["blocks"]["attn"]["q"]["kernel"]
    assert sq.shape == (3, 8, 8)


def test_optimizer_allocates_no_base_state():
    """The multi_transform freeze must leave base leaves stateless — LoRA's
    optimizer-memory claim."""
    from phoneme_vqa_tpu.train.optim import build_optimizer

    params = _tiny_params()
    adapters = lora.init_lora(params, _spec(), jax.random.PRNGKey(0))
    composite = {"base": params, "lora": adapters}
    tx = build_optimizer(
        lambda step: 1e-3, freeze_predicate=lora.freeze_base_predicate
    )
    opt_state = tx.init(composite)
    n_adapter = lora.n_params(adapters)
    n_state = sum(
        int(np.prod(np.shape(x)))
        for x in jax.tree.leaves(opt_state)
        if hasattr(x, "shape") and np.ndim(x) > 0
    )
    # adam: mu + nu for adapters only (plus O(1) scalars)
    assert n_state <= 2 * n_adapter + 16
    assert n_state >= 2 * n_adapter


def test_tp_rules_fire_through_composite():
    """tree_shardings' path rules see "base/.../q/kernel" and still shard;
    adapter b of q gets the matching output-dim sharding."""
    from jax.sharding import Mesh
    from phoneme_vqa_tpu.parallel.mesh import tree_shardings

    devs = jax.devices()
    assert len(devs) >= 8
    mesh = Mesh(np.asarray(devs[:4]).reshape(2, 2), ("data", "model"))
    params = _tiny_params()
    adapters = lora.init_lora(params, _spec(), jax.random.PRNGKey(0))
    composite = {"base": params, "lora": adapters}
    sh = tree_shardings(mesh, composite)
    q_spec = sh["base"]["encoder"]["block_0"]["attn"]["q"]["kernel"].spec
    assert tuple(q_spec) == (None, "model")
    o_spec = sh["base"]["encoder"]["block_0"]["attn"]["o"]["kernel"].spec
    assert tuple(o_spec) == ("model", None)
    b_spec = sh["lora"]["encoder"]["block_0"]["attn"]["q"]["kernel"]["b"].spec
    assert tuple(b_spec) == (None, "model")


# ---------------------------------------------------------------- executor e2e


@pytest.fixture(scope="module")
def lora_trained(tmp_path_factory):
    from phoneme_vqa_tpu import registry_setup  # noqa: F401
    from phoneme_vqa_tpu.config import get_config
    from phoneme_vqa_tpu.data.synthetic import make_latr_fixture, tiny_latr_yaml
    from phoneme_vqa_tpu.utils.registry import EXECUTORS

    root = tmp_path_factory.mktemp("lora_fixture")
    paths = make_latr_fixture(root)
    save_path = str(root / "ckpts")
    yaml_path = tiny_latr_yaml(
        paths, save_path, NUM_EPOCHS=2, LORA_RANK=4, LORA_ALPHA=8
    )
    config = get_config(yaml_path)
    executor = EXECUTORS.get(config.EXECUTOR)(config, mode="train")
    base_before = jax.tree.map(np.array, executor.state.params["base"])
    lora_before = jax.tree.map(np.array, executor.state.params["lora"])
    executor.run()
    return config, executor, base_before, lora_before, paths, root


@pytest.mark.slow
def test_executor_trains_adapters_only(lora_trained):
    _, executor, base_before, lora_before, _, _ = lora_trained
    assert lora.is_composite(executor.state.params)
    # base bitwise frozen
    for a, b in zip(
        jax.tree.leaves(base_before),
        jax.tree.leaves(jax.tree.map(np.asarray, executor.state.params["base"])),
    ):
        np.testing.assert_array_equal(a, b)
    # at least one adapter B moved off zero
    bs = [
        np.asarray(leaf)
        for path, leaf in jax.tree_util.tree_flatten_with_path(
            executor.state.params["lora"]
        )[0]
        if getattr(path[-1], "key", "") == "b"
    ]
    assert any(np.abs(b).max() > 0 for b in bs)


@pytest.mark.slow
def test_eval_serving_merge_without_lora_keys(lora_trained):
    """Eval from a LoRA checkpoint with NO LORA_* config keys: the persisted
    lora_scale merges the adapters; answers equal the in-memory merged
    decode."""
    from phoneme_vqa_tpu.config import get_config
    from phoneme_vqa_tpu.utils.registry import EXECUTORS

    config, train_ex, *_ = lora_trained
    train_preds = train_ex.infer(
        train_ex.val_data, config.EVAL_BATCH_SIZE, config.max_eval_length
    )
    plain = Config({k: v for k, v in config.items()
                    if not str(k).startswith("LORA")})
    ev = EXECUTORS.get(plain.EXECUTOR)(plain, mode="eval", evaltype="last")
    assert not lora.is_composite(ev.state.params)
    ev._load_trained_checkpoint("last")
    eval_preds = ev.infer(
        ev.val_data, plain.EVAL_BATCH_SIZE, plain.max_eval_length
    )
    assert eval_preds == train_preds


@pytest.mark.slow
def test_flat_ckpt_resumes_into_lora_run(lora_trained):
    """A flat (non-LoRA) checkpoint becomes the frozen base of a fresh LoRA
    run via the params-only salvage; merged params == flat params at start."""
    from phoneme_vqa_tpu.config import get_config
    from phoneme_vqa_tpu.data.synthetic import tiny_latr_yaml
    from phoneme_vqa_tpu.utils.registry import EXECUTORS

    config, _, _, _, paths, root = lora_trained
    # 1) train a flat run for 1 epoch
    flat_save = str(root / "flat_ckpts")
    flat_cfg = get_config(tiny_latr_yaml(paths, flat_save, NUM_EPOCHS=1))
    flat_ex = EXECUTORS.get(flat_cfg.EXECUTOR)(flat_cfg, mode="train")
    flat_ex.run()
    flat_params = jax.tree.map(np.array, flat_ex.state.params)
    # 2) a LoRA run pointed at the flat checkpoint dir salvages it as base
    lora_cfg = get_config(
        tiny_latr_yaml(paths, flat_save, NUM_EPOCHS=1, LORA_RANK=4)
    )
    lora_ex = EXECUTORS.get(lora_cfg.EXECUTOR)(lora_cfg, mode="train")
    assert lora.is_composite(lora_ex.state.params)
    for a, b in zip(
        jax.tree.leaves(flat_params),
        jax.tree.leaves(
            jax.tree.map(np.asarray, lora_ex.state.params["base"])
        ),
    ):
        np.testing.assert_array_equal(a, b)


@pytest.mark.slow
def test_lora_composes_with_grad_accum_and_scan(lora_trained):
    """LORA + GRAD_ACCUM_STEPS + SCAN_LAYERS all on: one epoch trains and
    the loss is finite (the three memory levers stack)."""
    from phoneme_vqa_tpu.config import get_config
    from phoneme_vqa_tpu.data.synthetic import tiny_latr_yaml
    from phoneme_vqa_tpu.utils.registry import EXECUTORS

    _, _, _, _, paths, root = lora_trained
    save = str(root / "stack_ckpts")
    cfg = get_config(
        tiny_latr_yaml(
            paths, save, NUM_EPOCHS=1, LORA_RANK=2, GRAD_ACCUM_STEPS=2,
            SCAN_LAYERS=True, REMAT=True,
        )
    )
    ex = EXECUTORS.get(cfg.EXECUTOR)(cfg, mode="train")
    loss = ex._train_epoch(1)
    assert np.isfinite(loss)
