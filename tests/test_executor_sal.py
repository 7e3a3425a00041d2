"""SaL family end-to-end + 2D bias unit tests."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from phoneme_vqa_tpu import registry_setup  # noqa: F401
from phoneme_vqa_tpu.config import get_config
from phoneme_vqa_tpu.utils.registry import EXECUTORS

from .fixtures import make_sal_fixture, tiny_sal_yaml



pytestmark = pytest.mark.slow

def test_scp_table_matches_reference_semantics():
    """Grid distance table == the reference's create_grid_all_dists
    (SaL_utils.py:172-195) up to the flatten."""
    from phoneme_vqa_tpu.models.rel_bias_2d import GRID, _grid_distance_table

    table = _grid_distance_table()
    assert table.shape == (121, 121)
    # spot checks: dist((0,0),(3,4)) = 5 -> x5 = 25
    assert table[0 * GRID + 0, 3 * GRID + 4] == 25
    assert table[5 * GRID + 5, 5 * GRID + 5] == 0
    # symmetry
    np.testing.assert_array_equal(table, table.T)


def test_sal_2d_bias_shapes_and_block():
    from phoneme_vqa_tpu.models.rel_bias_2d import Sal2DPositionBias

    bias_mod = Sal2DPositionBias(num_heads=4)
    coords = jnp.asarray(np.random.RandomState(0).uniform(0, 1, (2, 6, 4)), jnp.float32)
    params = bias_mod.init(jax.random.PRNGKey(0), 16, coords, 4, 6)
    out = bias_mod.apply(params, 16, coords, 4, 6).materialize()
    assert out.shape == (2, 4, 16, 16)
    # outside the OCR block the bias must be batch-independent (pure 1D)
    np.testing.assert_allclose(out[0, :, :4, :4], out[1, :, :4, :4], rtol=1e-6)


@pytest.fixture(scope="module")
def sal_trained(tmp_path_factory):
    root = tmp_path_factory.mktemp("sal_fixture")
    paths = make_sal_fixture(root)
    save_path = str(root / "ckpts")
    yaml_path = tiny_sal_yaml(paths, save_path)
    config = get_config(yaml_path)
    executor = EXECUTORS.get(config.EXECUTOR)(config, mode="train")
    executor.run()
    return config, save_path


def test_sal_train_eval_predict(sal_trained):
    config, save_path = sal_trained
    assert os.path.isdir(os.path.join(save_path, "last_ckp"))
    scores = EXECUTORS.get(config.EXECUTOR)(config, mode="eval", evaltype="last").run()
    assert set(scores) == {"F1", "Accuracy", "CIDEr", "ROUGE", "BLEU"}
    results = EXECUTORS.get(config.EXECUTOR)(
        config, mode="predict", predicttype="best"
    ).run()
    assert len(results) == 6 and set(results[0]) == {"gens", "gts"}


def test_sal_bias_augmentation_flag():
    """Train-time distance augmentation scales buckets only when enabled and
    non-deterministic (reference API flag, never enabled by its configs)."""
    from phoneme_vqa_tpu.models.rel_bias_2d import Sal2DPositionBias

    coords = jnp.asarray(np.random.RandomState(1).uniform(0, 1, (1, 5, 4)), jnp.float32)
    mod = Sal2DPositionBias(num_heads=2, augmentation=True)
    params = mod.init(jax.random.PRNGKey(0), 10, coords, 2, 5)
    det = mod.apply(params, 10, coords, 2, 5).materialize()
    det2 = mod.apply(params, 10, coords, 2, 5, True).materialize()
    np.testing.assert_array_equal(np.asarray(det), np.asarray(det2))
    aug = mod.apply(params, 10, coords, 2, 5, False,
                    rngs={"dropout": jax.random.PRNGKey(9)}).materialize()
    assert aug.shape == det.shape
