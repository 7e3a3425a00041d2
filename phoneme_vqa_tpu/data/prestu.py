"""PreSTU dataset: question and OCR fused into one token stream.

Contract (`/root/reference/core/data/PreSTUDataset.py:87-129`):
``input_ids = [pad] question [eos] ocr [eos] [pad]...`` padded to
``max_input_length + max_ocr_length`` with a joint attention mask.
(The reference's class calls an undefined ``create_properties`` —
`PreSTUDataset.py:69` vs `:87` — we implement the intended behavior.)
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..utils.logger import get_logger
from ..utils.registry import DATASETS
from . import feature_cache
from .loader import ArrayDataset, make_image_loader

log = get_logger(__name__)


def fuse_question_ocr(tokenizer, question: str, ocr_texts, max_q: int, max_ocr: int):
    q_ids = tokenizer(
        question.strip(), max_length=max_q - 2, truncation=True,
        add_special_tokens=False,
    )["input_ids"]
    try:
        ocr_ids = tokenizer(
            list(ocr_texts), is_split_into_words=True, add_special_tokens=False
        )["input_ids"]
    except Exception:
        ocr_ids = []
    ocr_ids = list(ocr_ids)[: max_ocr - 1]

    total = max_q + max_ocr
    valid = len(q_ids) + len(ocr_ids) + 3  # pad + eos + eos
    ids = (
        [tokenizer.pad_token_id]
        + list(q_ids)
        + [tokenizer.eos_token_id]
        + ocr_ids
        + [tokenizer.eos_token_id]
        + [tokenizer.pad_token_id] * (total - valid)
    )
    mask = [1] * valid + [0] * (total - valid)
    return ids, mask


@DATASETS.register("PreSTUDataset")
class PreSTUDataset:
    def __init__(
        self,
        qa_df: pd.DataFrame,
        ocr_df: pd.DataFrame,
        tokenizer,
        base_img_path: str,
        max_ocr_element: int = 50,
        max_ocr_length: int = 100,
        max_input_length: int = 30,
        max_output_length: int = 20,
        truncation: bool = True,
        transform=None,
        answer_encoder=None,
        cache_dir=None,  # FEATURE_CACHE (data/feature_cache.py)
        cache_tag="",
    ):
        df = pd.merge(
            qa_df, ocr_df[["image_id", "texts"]], on="image_id", how="inner"
        ).reset_index(drop=True)
        parts = {
            "cls": type(self).__name__,
            "df": feature_cache.df_fingerprint(df),
            "tok": feature_cache.tokenizer_tag(tokenizer),
            "tag": cache_tag,
            "max_ocr_element": max_ocr_element,
            "max_ocr_length": max_ocr_length,
            "max_input_length": max_input_length,
            "max_output_length": max_output_length,
        }
        arrays, image_ids, answers = feature_cache.get_or_build(
            cache_dir, parts,
            lambda: self._featurize(
                df, tokenizer, max_ocr_element, max_ocr_length,
                max_input_length, max_output_length, answer_encoder,
            ),
        )
        self.dataset = ArrayDataset(
            arrays,
            image_ids=image_ids,
            answers=answers,
            lazy_fields={"pixel_values": make_image_loader(base_img_path, image_ids)},
        )

    @staticmethod
    def _featurize(df, tokenizer, max_ocr_element, max_ocr_length,
                   max_input_length, max_output_length, answer_encoder):
        from .latr import encode_prefixed

        n = len(df)
        total = max_input_length + max_ocr_length
        input_ids = np.zeros((n, total), np.int32)
        src_mask = np.zeros((n, total), np.int32)
        label_rows, label_mask_rows = [], []

        for i in range(n):
            ids, mask = fuse_question_ocr(
                tokenizer,
                str(df["question"][i]),
                df["texts"][i][:max_ocr_element],
                max_input_length,
                max_ocr_length,
            )
            input_ids[i], src_mask[i] = ids, mask
            answer = str(df["answer"][i])
            if answer_encoder is None:
                a_ids, a_mask = encode_prefixed(tokenizer, answer, max_output_length)
            else:
                a_ids, a_mask = answer_encoder(answer, max_output_length)
            label_rows.append(a_ids)
            label_mask_rows.append(a_mask)
            if i + 1 == 1 or (i + 1) % 1000 == 0 or i + 1 == n:
                log.info(f"Encoding... {i + 1}/{n}")

        arrays = {
            "input_ids": input_ids,
            "src_attention_mask": src_mask,
            "label_ids": np.asarray(label_rows, np.int32),
            "label_attention_mask": np.asarray(label_mask_rows, np.int32),
        }
        return arrays, list(df["image_id"]), list(df["answer"])

    def __len__(self) -> int:
        return len(self.dataset)
