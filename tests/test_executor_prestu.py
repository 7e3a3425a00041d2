"""PreSTU executor end-to-end (shares the LaTr fixture tree)."""

import os

import pytest

from phoneme_vqa_tpu import registry_setup  # noqa: F401
from phoneme_vqa_tpu.config import get_config
from phoneme_vqa_tpu.utils.registry import EXECUTORS

from .fixtures import make_latr_fixture, tiny_latr_yaml



pytestmark = pytest.mark.slow

def test_prestu_train_eval(tmp_path):
    paths = make_latr_fixture(tmp_path)
    save_path = str(tmp_path / "ckpts")
    yaml_path = tiny_latr_yaml(
        paths,
        save_path,
        EXECUTOR="PreSTU_Executor",
        MODEL_CLASS="PreSTU",
        MODEL_MOD_CONFIG_CLASS="PreSTU_config",
    )
    config = get_config(yaml_path)
    executor = EXECUTORS.get(config.EXECUTOR)(config, mode="train")
    executor.run()
    assert os.path.isdir(os.path.join(save_path, "last_ckp"))
    scores = EXECUTORS.get(config.EXECUTOR)(config, mode="eval", evaltype="last").run()
    assert set(scores) == {"F1", "Accuracy", "CIDEr", "ROUGE", "BLEU"}
