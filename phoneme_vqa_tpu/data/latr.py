"""LaTr dataset: question + OCR-layout + answer featurization into packed arrays.

Featurization contract (`/root/reference/core/data/LaTrDataset.py:12-146`):

* question/answer are encoded as ``"<pad> " + text`` padded to max length
  (the "<pad> " prefix doubles as the T5 decoder-start convention)
* OCR words (capped at ``max_ocr_element``) are tokenized twice — jointly
  and per-word — to build the subword→word alignment; each subword inherits
  its word's bbox as a 6-tuple (x0, y0, x1, y1, w, h)
* the OCR stream is closed with an EOS token/box and padded with pad
  token/zero boxes to ``max_ocr_length``
* pixel values are lazy-loaded per batch from ``{base_img_path}/{id}.npy``

Output is an `ArrayDataset` of fixed-shape int32 arrays — one contiguous
featurization pass, no per-item __getitem__.
"""

from __future__ import annotations

from typing import List

import numpy as np
import pandas as pd

from ..utils.logger import get_logger
from ..utils.registry import DATASETS
from . import feature_cache
from .loader import ArrayDataset, make_image_loader

log = get_logger(__name__)

PAD_TOKEN_BOX = [0, 0, 0, 0, 0, 0]
EOS_TOKEN_BOX = [1000, 1000, 1000, 1000, 1000, 1000]


def encode_prefixed(tokenizer, text: str, max_length: int):
    """``"<pad> " + text`` -> (ids, mask) fixed length."""
    enc = tokenizer(
        "<pad> " + text.strip(),
        padding="max_length",
        max_length=max_length,
        truncation=True,
    )
    return enc["input_ids"], enc["attention_mask"]


def align_ocr_subwords(
    tokenizer, ocr_texts: List[str], bounding_box, max_ocr_element: int, max_ocr_length: int
):
    """Subword-aligned OCR ids + per-subword 6-tuple boxes + mask."""
    ocr_texts = list(ocr_texts)[:max_ocr_element]
    bounding_box = list(bounding_box)[:max_ocr_element]
    boxes6 = [
        [b[0], b[1], b[2], b[3], b[2] - b[0], b[3] - b[1]] for b in bounding_box
    ]

    try:
        joint_ids = tokenizer(
            ocr_texts, is_split_into_words=True, add_special_tokens=False
        )["input_ids"]
        per_word_ids = tokenizer(
            ocr_texts, is_split_into_words=False, add_special_tokens=False
        )["input_ids"]
    except Exception:
        joint_ids, per_word_ids = [], []

    word_of_subword: List[int] = []
    for w, ids in enumerate(per_word_ids):
        word_of_subword.extend([w] * len(ids))

    room = max_ocr_length - 1  # keep a slot for EOS
    sub_boxes = [boxes6[w] for w in word_of_subword[:room]]
    n = len(sub_boxes)
    pad_n = max_ocr_length - n - 1

    ids = list(joint_ids[:n]) + [tokenizer.eos_token_id] + [tokenizer.pad_token_id] * pad_n
    boxes = sub_boxes + [EOS_TOKEN_BOX] + [PAD_TOKEN_BOX] * pad_n
    mask = [1] * (n + 1) + [0] * pad_n
    return ids, boxes, mask


@DATASETS.register("LaTrDataset")
class LaTrDataset:
    """Builds the packed-array dataset for the LaTr family."""

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
        answer_encoder=None,  # optional override (Customized*/Phoneme* families)
        cache_dir=None,  # FEATURE_CACHE: persist/reload the packed arrays
        cache_tag="",  # answer-encoder identity (executor-provided)
    ):
        self.tokenizer = tokenizer
        df = pd.merge(
            qa_df, ocr_df[["image_id", "bboxes", "texts"]], on="image_id", how="inner"
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
        n = len(df)
        input_ids = np.zeros((n, max_input_length), np.int32)
        src_mask = np.zeros((n, max_input_length), np.int32)
        ocr_ids = np.zeros((n, max_ocr_length), np.int32)
        ocr_mask = np.zeros((n, max_ocr_length), np.int32)
        coords = np.zeros((n, max_ocr_length, 6), np.int32)
        label_rows = []
        label_mask_rows = []

        for i in range(n):
            q_ids, q_mask = encode_prefixed(
                tokenizer, str(df["question"][i]), max_input_length
            )
            input_ids[i], src_mask[i] = q_ids, q_mask
            o_ids, o_boxes, o_mask = align_ocr_subwords(
                tokenizer, df["texts"][i], df["bboxes"][i], max_ocr_element, max_ocr_length
            )
            ocr_ids[i], ocr_mask[i] = o_ids, o_mask
            coords[i] = np.asarray(o_boxes, np.float64).astype(np.int32)

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
            "tokenized_ocr": ocr_ids,
            "ocr_attention_mask": ocr_mask,
            "coordinates": coords,
            "label_ids": np.asarray(label_rows, np.int32),
            "label_attention_mask": np.asarray(label_mask_rows, np.int32),
        }
        return arrays, list(df["image_id"]), list(df["answer"])

    def __len__(self) -> int:
        return len(self.dataset)
