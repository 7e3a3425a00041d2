"""Reference-checkpoint migration: a torch.save .pth from the reference
trains' format converts into our orbax checkpoint and produces IDENTICAL
answer strings through our eval path."""

import os
import subprocess
import sys

import jax
import numpy as np
import pytest

from phoneme_vqa_tpu import registry_setup  # noqa: F401
from phoneme_vqa_tpu.config import get_config
from phoneme_vqa_tpu.data.loader import batch_iterator
from phoneme_vqa_tpu.utils.registry import EXECUTORS

from .fixtures import make_latr_fixture, tiny_latr_yaml
from .reference_loader import REFERENCE_ROOT

torch = pytest.importorskip("torch")
pytest.importorskip("transformers")

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(
        not os.path.isdir(REFERENCE_ROOT), reason="reference tree not mounted"
    ),
]

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_convert_reference_pth_then_identical_answers(tmp_path):
    from .test_e2e_reference_parity import _reference_model

    max_len = 10
    paths = make_latr_fixture(tmp_path)
    yaml_path = tiny_latr_yaml(
        paths, str(tmp_path / "ck"), NUM_EPOCHS=1, SAVE=True,
        DTYPE="float32", max_eval_length=max_len,
    )
    config = get_config(yaml_path)

    # a "trained" reference checkpoint in the reference's on-disk format
    # (base_executor.py:100-124)
    ref = _reference_model()
    pth = str(tmp_path / "best_ckp.pth")
    torch.save(
        {"state_dict": ref.state_dict(), "epoch": 3, "best_score": 0.5}, pth
    )

    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=REPO)
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "import_reference_ckpt.py"),
         "--config-file", yaml_path, "--ckpt", pth, "--name", "best"],
        capture_output=True, text=True, timeout=420, env=env, cwd=REPO,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert os.path.isdir(os.path.join(str(tmp_path / "ck"), "best_ckp"))

    # our eval path on the converted checkpoint
    ex = EXECUTORS.get(config.EXECUTOR)(config, mode="eval")
    ex._load_trained_checkpoint("best")
    ex._place_state()
    ours = ex.infer(ex.val_data, config.EVAL_BATCH_SIZE, max_len)

    # the reference model's own decode on the same arrays
    ref_rows = []
    for batch, n_valid in batch_iterator(
        ex.val_data, config.EVAL_BATCH_SIZE, pad_final=False
    ):
        with torch.no_grad():
            emb, mask = ref.calculate_embedding(
                torch.tensor(batch["pixel_values"]),
                torch.tensor(batch["coordinates"], dtype=torch.long),
                torch.tensor(batch["input_ids"], dtype=torch.long),
                torch.tensor(batch["ocr_attention_mask"], dtype=torch.long),
                torch.tensor(batch["src_attention_mask"], dtype=torch.long),
                torch.tensor(batch["tokenized_ocr"], dtype=torch.long),
            )
            out = ref.backbone.generate(
                inputs_embeds=emb, attention_mask=mask.long(),
                max_length=max_len, do_sample=False, num_beams=1,
            )
        ref_rows.extend(np.asarray(out)[:n_valid].tolist())
    theirs = ex._decode_rows(ref_rows)
    assert ours == theirs, list(zip(ours, theirs))
    assert len(ours) == 6


def test_import_reference_state_dict_reports_unmappable(tmp_path):
    """Loud failure: a tensor with no destination or a wrong shape lands in
    report.failed, never silently dropped."""
    from phoneme_vqa_tpu.models.hf_import import (
        ImportReport,
        import_reference_state_dict,
    )

    params = {"visual_projector": {"kernel": np.zeros((4, 8)), "bias": np.zeros(8)}}
    report = ImportReport()
    import_reference_state_dict(
        params,
        {
            "visual_projector.weight": np.zeros((8, 4)),
            "visual_projector.bias": np.zeros(9),  # wrong shape
        },
        report=report,
    )
    assert "visual_projector.weight" in report.mapped
    assert any(k == "visual_projector.bias" for k, _ in report.failed)
