"""All 9 shipped config presets load and resolve against the registries."""

import glob
import os

import pytest

from phoneme_vqa_tpu import registry_setup  # noqa: F401
from phoneme_vqa_tpu.config import get_config
from phoneme_vqa_tpu.utils.registry import EXECUTORS, MODEL_CONFIGS, MODELS

PRESETS = sorted(glob.glob(os.path.join(os.path.dirname(__file__), "..", "configs", "*.yaml")))


def test_nine_presets_exist():
    assert len(PRESETS) == 9


@pytest.mark.parametrize("path", PRESETS, ids=[os.path.basename(p) for p in PRESETS])
def test_preset_resolves(path):
    cfg = get_config(path)
    assert cfg.EXECUTOR in EXECUTORS
    assert cfg.MODEL_CLASS in MODELS
    assert cfg.MODEL_MOD_CONFIG_CLASS in MODEL_CONFIGS
    # required training keys present
    for key in ("LR", "BETAS", "NUM_EPOCHS", "TRAIN_BATCH_SIZE",
                "EVAL_BATCH_SIZE", "max_eval_length", "SAVE_PATH"):
        assert key in cfg, key
    # model config builds from the YAML (with any extra builder args defaulted)
    builder = MODEL_CONFIGS.get(cfg.MODEL_MOD_CONFIG_CLASS)()
    model_cfg = builder.build(cfg)
    assert model_cfg.t5.d_model == 768


def test_missing_required_keys_fail_fast(tmp_path):
    """A config missing data paths names ALL missing keys up front instead of
    failing deep inside featurization."""
    import pytest
    import yaml

    from phoneme_vqa_tpu import registry_setup  # noqa: F401
    from phoneme_vqa_tpu.config import get_config
    from phoneme_vqa_tpu.utils.registry import EXECUTORS

    p = tmp_path / "broken.yaml"
    yaml.safe_dump({"EXECUTOR": "LaTr_Executor"}, open(p, "w"))
    config = get_config(str(p))
    with pytest.raises(ValueError, match="qa_train_path"):
        EXECUTORS.get(config.EXECUTOR)(config, mode="train")
