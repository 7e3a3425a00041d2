"""Data-layer featurization parity vs the reference torch datasets.

The reference datasets accept any HF-call-compatible tokenizer, so we feed
them our offline deterministic tokenizer and compare every featurized array
(question ids, subword-aligned OCR ids/boxes/masks, answer labels)
element-for-element. (PreSTU is excluded: the reference class calls an
undefined method — `PreSTUDataset.py:69` vs `:87` — and cannot featurize.)
"""

import os

import numpy as np
import pandas as pd
import pytest

from phoneme_vqa_tpu.data.adapters import textlayout_obj_adapt, textlayout_ocr_adapt
from phoneme_vqa_tpu.data.latr import LaTrDataset
from phoneme_vqa_tpu.data.sal import SaLDataset
from phoneme_vqa_tpu.tokenizers.backbone import FallbackSubwordTokenizer

from .fixtures import make_latr_fixture, make_sal_fixture
from .reference_loader import REFERENCE_ROOT, load_reference_package

needs_reference = pytest.mark.skipif(
    not os.path.isdir(REFERENCE_ROOT), reason="reference tree not mounted"
)


@needs_reference
def test_latr_featurization_parity(tmp_path):
    paths = make_latr_fixture(tmp_path)
    qa_df = pd.read_csv(paths["train"])[["image_id", "question", "answer", "filename"]]
    ocr_df = textlayout_ocr_adapt(paths["ocr"])
    tok = FallbackSubwordTokenizer(vocab_size=512)

    ref_mod = load_reference_package("core.data.LaTrDataset")
    ref_ds = ref_mod.LaTrDataset(
        qa_df=qa_df, ocr_df=ocr_df, tokenizer=tok, base_img_path=paths["img"],
        max_ocr_element=8, max_ocr_length=12, max_input_length=8,
        max_output_length=10,
    )
    ours = LaTrDataset(
        qa_df=qa_df, ocr_df=ocr_df, tokenizer=tok, base_img_path=paths["img"],
        max_ocr_element=8, max_ocr_length=12, max_input_length=8,
        max_output_length=10,
    ).dataset

    n = len(ours)
    assert n == len(ref_ds.data["input_ids"])
    for i in range(n):
        np.testing.assert_array_equal(
            ours.arrays["input_ids"][i], ref_ds.data["input_ids"][i], err_msg=f"q{i}"
        )
        np.testing.assert_array_equal(
            ours.arrays["tokenized_ocr"][i], ref_ds.data["tokenized_ocr"][i],
            err_msg=f"ocr{i}",
        )
        np.testing.assert_array_equal(
            ours.arrays["ocr_attention_mask"][i], ref_ds.data["ocr_attention_mask"][i],
            err_msg=f"ocrmask{i}",
        )
        # reference stores float boxes; its __getitem__ casts to int64 (trunc)
        np.testing.assert_array_equal(
            ours.arrays["coordinates"][i],
            np.asarray(ref_ds.data["coordinates"][i], np.float64).astype(np.int64),
            err_msg=f"coords{i}",
        )
        np.testing.assert_array_equal(
            ours.arrays["label_ids"][i], ref_ds.data["label_ids"][i],
            err_msg=f"labels{i}",
        )
        np.testing.assert_array_equal(
            ours.arrays["src_attention_mask"][i],
            ref_ds.data["src_attention_mask"][i], err_msg=f"srcmask{i}",
        )


@needs_reference
def test_sal_featurization_parity(tmp_path):
    paths = make_sal_fixture(tmp_path)
    qa_df = pd.read_csv(paths["train"])[["image_id", "question", "answer", "filename"]]
    ocr_df = textlayout_ocr_adapt(paths["ocr_features"], h_scale=1, w_scale=1)
    obj_df = textlayout_obj_adapt(paths["obj_features"], h_scale=1, w_scale=1)
    tok = FallbackSubwordTokenizer(vocab_size=512)

    kwargs = dict(
        qa_df=qa_df, ocr_df=ocr_df, obj_df=obj_df, tokenizer=tok,
        ocr_hidden=512, obj_hidden=64,
        max_ocr_element=6, max_ocr_length=12, max_obj_element=4,
        max_obj_length=8, max_input_length=8, max_output_length=10,
    )
    ref_mod = load_reference_package("core.data.SaLDataset")
    ref_ds = ref_mod.SaLDataset(
        base_ocr_feature_path=paths["ocr_features"],
        base_obj_feature_path=paths["obj_features"],
        **kwargs,
    )
    ours = SaLDataset(
        base_ocr_feature_path=paths["ocr_features"],
        base_obj_feature_path=paths["obj_features"],
        **kwargs,
    ).dataset

    n = len(ours)
    assert n == len(ref_ds.data["input_ids"])
    for i in range(n):
        for ours_key, ref_key in [
            ("input_ids", "input_ids"),
            ("src_attention_mask", "src_attention_mask"),
            ("tokenized_ocr", "tokenized_ocr"),
            ("ocr_attention_mask", "ocr_attention_mask"),
            ("tokenized_obj", "tokenized_obj"),
            ("obj_attention_mask", "obj_attention_mask"),
            ("label_ids", "label_ids"),
        ]:
            np.testing.assert_array_equal(
                ours.arrays[ours_key][i], ref_ds.data[ref_key][i],
                err_msg=f"{ours_key}[{i}]",
            )
        np.testing.assert_allclose(
            ours.arrays["ocr_coordinates"][i],
            np.asarray(ref_ds.data["ocr_coordinates"][i], np.float32),
            rtol=1e-6, err_msg=f"ocr_coords[{i}]",
        )
        np.testing.assert_allclose(
            ours.arrays["obj_coordinates"][i],
            np.asarray(ref_ds.data["obj_coordinates"][i], np.float32),
            rtol=1e-6, err_msg=f"obj_coords[{i}]",
        )

    # per-batch lazy features == the reference's __getitem__ features.
    # The reference resolves files as str(float(image_id)) ("0.0.npy") and
    # requires region_features stored as torch tensors; mirror that on disk.
    import torch

    for root in (paths["ocr_features"], paths["obj_features"]):
        for fname in list(os.listdir(root)):
            stem = fname[:-4]
            target = os.path.join(root, f"{float(stem)}.npy")
            src = os.path.join(root, fname)
            if not os.path.isfile(target):
                rec = np.load(src, allow_pickle=True).tolist()
                if "region_features" in rec:
                    rec["region_features"] = torch.tensor(
                        np.asarray(rec["region_features"])
                    )
                np.save(target, rec, allow_pickle=True)

    idx = np.arange(min(3, n))
    got_batch = ours.gather(idx)
    for i in idx.tolist():
        item = ref_ds[i]
        np.testing.assert_allclose(
            got_batch["ocr_features"][i], item["ocr_features"].numpy(),
            rtol=1e-6, err_msg=f"ocr_feat[{i}]",
        )
        np.testing.assert_allclose(
            got_batch["obj_features"][i], item["obj_features"].numpy(),
            rtol=1e-6, err_msg=f"obj_feat[{i}]",
        )
