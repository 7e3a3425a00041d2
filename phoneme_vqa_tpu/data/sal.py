"""SaL dataset: question + OCR(+context tokens)+features + OBJ+features.

Contract (`/root/reference/core/data/SaLDataset.py:12-223`):
* OCR words get a ``<c>`` context token appended per word; subwords AND the
  context token inherit the word's 4-float bbox (in [0,1]) and the word's
  det⊕rec feature vector (512-d)
* OBJ labels are tokenized per word (no context token); each subword gets
  the region's bbox and its 2048-d region feature
* streams are closed with EOS (box 0.9999^4) and padded (box zeros)
* question/answer: "<pad> "-prefixed, padded to max length
* per-image features are lazy-loaded from
  ``{base_*_feature_path}/{image_id}.npy``
"""

from __future__ import annotations

from typing import List

import numpy as np
import pandas as pd

from ..utils.logger import get_logger
from ..utils.registry import DATASETS
from . import feature_cache
from .latr import encode_prefixed
from .loader import ArrayDataset

log = get_logger(__name__)

PAD_BOX = [0.0, 0.0, 0.0, 0.0]
EOS_BOX = [0.9999, 0.9999, 0.9999, 0.9999]


def _word_aligned_stream(
    tokenizer, texts, boxes, max_length: int, context_token_id=None
):
    """Returns (ids, boxes4, mask, word_ids) fixed to ``max_length``."""
    try:
        per_word = tokenizer(
            list(texts), is_split_into_words=False, add_special_tokens=False
        )["input_ids"]
    except Exception:
        per_word = []

    flat_ids: List[int] = []
    word_ids: List[int] = []
    for w, ids in enumerate(per_word):
        ids = list(ids)
        if context_token_id is not None:
            ids = ids + [context_token_id]
        flat_ids.extend(ids)
        word_ids.extend([w] * len(ids))

    room = max_length - 1
    kept_words = word_ids[:room]
    n = len(kept_words)
    pad_n = max_length - n - 1
    ids = flat_ids[:n] + [tokenizer.eos_token_id] + [tokenizer.pad_token_id] * pad_n
    out_boxes = [list(boxes[w]) for w in kept_words] + [EOS_BOX] + [PAD_BOX] * pad_n
    mask = [1] * (n + 1) + [0] * pad_n
    return ids, out_boxes, mask, kept_words


def _feature_gather(features_per_word, word_ids, max_length: int, hidden: int):
    """Feature row per stream position (word's features for each subword;
    zeros for EOS/padding)."""
    out = np.zeros((max_length, hidden), np.float32)
    for pos, w in enumerate(word_ids):
        out[pos] = features_per_word[w]
    return out


@DATASETS.register("SaLDataset")
class SaLDataset:
    def __init__(
        self,
        qa_df: pd.DataFrame,
        ocr_df: pd.DataFrame,
        obj_df: pd.DataFrame,
        tokenizer,
        base_ocr_feature_path: str,
        base_obj_feature_path: str,
        ocr_hidden: int = 512,
        obj_hidden: int = 2048,
        max_ocr_element: int = 50,
        max_ocr_length: int = 150,
        max_obj_element: int = 25,
        max_obj_length: int = 50,
        max_input_length: int = 30,
        max_output_length: int = 128,
        truncation: bool = True,
        transform=None,
        context_token: str = "<c>",
        answer_encoder=None,
        cache_dir=None,  # FEATURE_CACHE (data/feature_cache.py)
        cache_tag="",
    ):
        self.base_ocr_feature_path = base_ocr_feature_path
        self.base_obj_feature_path = base_obj_feature_path
        self.ocr_hidden = ocr_hidden
        self.obj_hidden = obj_hidden
        self.max_ocr_length = max_ocr_length
        self.max_obj_length = max_obj_length
        ctx_enc = tokenizer(context_token)
        ctx_ids = ctx_enc["input_ids"] if isinstance(ctx_enc, dict) else ctx_enc.input_ids
        self.context_token_id = ctx_ids[0]

        df = pd.merge(
            qa_df, ocr_df[["image_id", "bboxes", "texts"]], on="image_id", how="inner"
        )
        df = pd.merge(
            df, obj_df[["image_id", "obj_bboxes", "obj_labels"]],
            on="image_id", how="inner",
        ).reset_index(drop=True)

        parts = {
            "cls": type(self).__name__,
            "df": feature_cache.df_fingerprint(df),
            "tok": feature_cache.tokenizer_tag(tokenizer),
            "tag": cache_tag,
            "context_token": context_token,
            "max_ocr_element": max_ocr_element,
            "max_ocr_length": max_ocr_length,
            "max_obj_element": max_obj_element,
            "max_obj_length": max_obj_length,
            "max_input_length": max_input_length,
            "max_output_length": max_output_length,
        }
        arrays, image_ids, answers = feature_cache.get_or_build(
            cache_dir, parts,
            lambda: self._featurize(
                df, tokenizer, self.context_token_id, max_ocr_element,
                max_ocr_length, max_obj_element, max_obj_length,
                max_input_length, max_output_length, answer_encoder,
            ),
        )
        arrays = dict(arrays)
        # subword->word alignment for the lazy feature gathers, packed to
        # fixed shape (-1 = no word) so it caches like any other array
        self._ocr_word_ids = np.asarray(arrays.pop("_ocr_word_ids"))
        self._obj_word_ids = np.asarray(arrays.pop("_obj_word_ids"))
        self.dataset = ArrayDataset(
            arrays,
            image_ids=image_ids,
            answers=answers,
            lazy_fields={
                "ocr_features": self._load_ocr_features,
                "obj_features": self._load_obj_features,
            },
        )
        self._image_ids = image_ids

    @staticmethod
    def _featurize(df, tokenizer, context_token_id, max_ocr_element,
                   max_ocr_length, max_obj_element, max_obj_length,
                   max_input_length, max_output_length, answer_encoder):
        n = len(df)
        arr = lambda *shape: np.zeros(shape, np.int32)
        input_ids = arr(n, max_input_length)
        src_mask = arr(n, max_input_length)
        ocr_ids = arr(n, max_ocr_length)
        ocr_mask = arr(n, max_ocr_length)
        ocr_coords = np.zeros((n, max_ocr_length, 4), np.float32)
        obj_ids = arr(n, max_obj_length)
        obj_mask = arr(n, max_obj_length)
        obj_coords = np.zeros((n, max_obj_length, 4), np.float32)
        label_rows, label_mask_rows = [], []
        ocr_word_ids = np.full((n, max_ocr_length), -1, np.int32)
        obj_word_ids = np.full((n, max_obj_length), -1, np.int32)

        for i in range(n):
            texts = list(df["texts"][i])[:max_ocr_element]
            boxes = list(df["bboxes"][i])[:max_ocr_element]
            o_ids, o_boxes, o_mask, o_words = _word_aligned_stream(
                tokenizer, texts, boxes, max_ocr_length, context_token_id
            )
            ocr_ids[i], ocr_mask[i] = o_ids, o_mask
            ocr_coords[i] = np.asarray(o_boxes, np.float32)
            ocr_word_ids[i, : len(o_words)] = o_words

            labels = list(df["obj_labels"][i])[:max_obj_element]
            oboxes = list(df["obj_bboxes"][i])[:max_obj_element]
            b_ids, b_boxes, b_mask, b_words = _word_aligned_stream(
                tokenizer, labels, oboxes, max_obj_length, None
            )
            obj_ids[i], obj_mask[i] = b_ids, b_mask
            obj_coords[i] = np.asarray(b_boxes, np.float32)
            obj_word_ids[i, : len(b_words)] = b_words

            q_ids, q_mask = encode_prefixed(
                tokenizer, str(df["question"][i]), max_input_length
            )
            input_ids[i], src_mask[i] = q_ids, q_mask
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
            "ocr_coordinates": ocr_coords,
            "tokenized_obj": obj_ids,
            "obj_attention_mask": obj_mask,
            "obj_coordinates": obj_coords,
            "label_ids": np.asarray(label_rows, np.int32),
            "label_attention_mask": np.asarray(label_mask_rows, np.int32),
            "_ocr_word_ids": ocr_word_ids,
            "_obj_word_ids": obj_word_ids,
        }
        return arrays, list(df["image_id"]), list(df["answer"])

    def __len__(self) -> int:
        return len(self.dataset)

    # -- lazy per-batch feature loading (SaLDataset.py:55-88) -------------------

    def _load_npy(self, root: str, idx: int) -> dict:
        import os

        image_id = self._image_ids[idx]
        for stem in (str(image_id), str(int(float(image_id)))):
            path = os.path.join(root, stem + ".npy")
            if os.path.isfile(path):
                return np.load(path, allow_pickle=True).tolist()
        raise FileNotFoundError(f"feature file for image {image_id} in {root}")

    @staticmethod
    def _valid_words(packed_row) -> np.ndarray:
        row = np.asarray(packed_row)
        return row[row >= 0]

    def _load_ocr_features(self, indices) -> np.ndarray:
        out = np.zeros((len(indices), self.max_ocr_length, self.ocr_hidden), np.float32)
        for row, idx in enumerate(np.asarray(indices).tolist()):
            rec = self._load_npy(self.base_ocr_feature_path, idx)
            per_word = np.concatenate(
                [np.asarray(rec["det_features"]), np.asarray(rec["rec_features"])],
                axis=-1,
            )
            out[row] = _feature_gather(
                per_word, self._valid_words(self._ocr_word_ids[idx]),
                self.max_ocr_length, self.ocr_hidden,
            )
        return out

    def _load_obj_features(self, indices) -> np.ndarray:
        out = np.zeros((len(indices), self.max_obj_length, self.obj_hidden), np.float32)
        for row, idx in enumerate(np.asarray(indices).tolist()):
            rec = self._load_npy(self.base_obj_feature_path, idx)
            per_word = np.asarray(rec["region_features"])
            out[row] = _feature_gather(
                per_word, self._valid_words(self._obj_word_ids[idx]),
                self.max_obj_length, self.obj_hidden,
            )
        return out
