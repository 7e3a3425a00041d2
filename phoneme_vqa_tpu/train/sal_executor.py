"""SaL executor (contract: /root/reference/core/executor/SaL_Executor.py):
question + OCR-with-features + OBJ-with-features streams, ``<c>`` context
token added to the tokenizer, 2D position bias model. OCR/OBJ dataframes are
adapted from the *feature* directories with scale 1 (coords stay in [0,1])."""

from __future__ import annotations

from typing import Dict

import numpy as np

from ..data.adapters import textlayout_obj_adapt, textlayout_ocr_adapt
from ..data.sal import SaLDataset
from ..tokenizers.backbone import load_backbone_tokenizer
from ..utils.logger import get_logger
from ..utils.registry import EXECUTORS
from .base_executor import BaseExecutor
from .latr_executor import LaTrExecutor

log = get_logger(__name__)


@EXECUTORS.register("SaL_Executor")
class SaLExecutor(LaTrExecutor):
    REQUIRED_TRAIN_KEYS = BaseExecutor.REQUIRED_TRAIN_KEYS + (
        "base_ocr_feature_path", "base_obj_feature_path", "context_token",
        "max_ocr_element", "max_ocr_length", "max_obj_element",
        "max_obj_length", "backbone_name",
    )
    BATCH_KEYS = (
        "input_ids",
        "src_attention_mask",
        "tokenized_ocr",
        "ocr_attention_mask",
        "ocr_coordinates",
        "ocr_features",
        "tokenized_obj",
        "obj_attention_mask",
        "obj_coordinates",
        "obj_features",
    )
    DATASET_CLS = SaLDataset

    def _create_tokenizers(self):
        self.tokenizer = load_backbone_tokenizer(
            self.config.backbone_name,
            vocab_size=self.config.get("t5_vocab_size", 36096),
        )
        if hasattr(self.tokenizer, "add_tokens"):
            self.tokenizer.add_tokens([self.config.context_token])

    def _new_vocab_size(self) -> int:
        try:
            return len(self.tokenizer)
        except TypeError:
            return self.config.get("t5_vocab_size", 36096)

    def _build_model_config(self, cfg_builder):
        return cfg_builder.build(self.config, self._new_vocab_size())

    def _make_dataset(self, qa_df, ocr_df, obj_df=None):
        return self.DATASET_CLS(
            qa_df=qa_df,
            ocr_df=ocr_df,
            obj_df=obj_df,
            tokenizer=self.tokenizer,
            base_ocr_feature_path=self.config.base_ocr_feature_path,
            base_obj_feature_path=self.config.base_obj_feature_path,
            ocr_hidden=self.config.ocr_hidden,
            obj_hidden=self.config.obj_hidden,
            max_ocr_element=self.config.max_ocr_element,
            max_ocr_length=self.config.max_ocr_length,
            max_obj_element=self.config.max_obj_element,
            max_obj_length=self.config.max_obj_length,
            max_input_length=self.config.max_q_length,
            max_output_length=self.config.max_a_length,
            context_token=self.config.context_token,
            answer_encoder=self._answer_encoder(),
            **self._feature_cache_args(),
        ).dataset

    def _adapt_frames(self):
        ocr_df = textlayout_ocr_adapt(
            self.config.base_ocr_feature_path, h_scale=1, w_scale=1,
            cache_dir=self.config.get("FEATURE_CACHE", None) or None,
        )
        obj_df = textlayout_obj_adapt(
            self.config.base_obj_feature_path, h_scale=1, w_scale=1,
            cache_dir=self.config.get("FEATURE_CACHE", None) or None,
        )
        return ocr_df, obj_df

    def _create_data_utils(self):
        self._create_tokenizers()
        train_df = self._read_qa(self.config.qa_train_path)
        val_df = self._read_qa(self.config.qa_val_path)
        self.val_answer = [str(a) for a in val_df["answer"]]
        self._prepare_decode_tokenizer(train_df, val_df)
        ocr_df, obj_df = self._adapt_frames()
        log.info("# Creating Datasets")
        self.train_data = self._make_dataset(train_df, ocr_df, obj_df)
        self.val_data = self._make_dataset(val_df, ocr_df, obj_df)

    def _init_eval_predict_mode(self):
        self._create_tokenizers()
        ocr_df, obj_df = self._adapt_frames()
        if self.mode == "eval":
            log.info("###Load eval data ...")
            val_df = self._read_qa(self.config.qa_val_path)
            self.val_answer = [str(a) for a in val_df["answer"]]
            self._prepare_decode_tokenizer(val_df, val_df)
            self.val_data = self._make_dataset(val_df, ocr_df, obj_df)
        else:
            log.info("###Load predict data ...")
            pred_df = self._read_qa(self.config.qa_predict_path)
            self.predict_answer = [str(a) for a in pred_df["answer"]]
            self._prepare_decode_tokenizer(pred_df, pred_df)
            self.predict_data = self._make_dataset(pred_df, ocr_df, obj_df)

    def _dummy_batch(self) -> Dict[str, np.ndarray]:
        c = self.config
        return {
            "input_ids": np.zeros((1, c.max_q_length), np.int32),
            "src_attention_mask": np.ones((1, c.max_q_length), np.int32),
            "tokenized_ocr": np.zeros((1, c.max_ocr_length), np.int32),
            "ocr_attention_mask": np.ones((1, c.max_ocr_length), np.int32),
            "ocr_coordinates": np.zeros((1, c.max_ocr_length, 4), np.float32),
            "ocr_features": np.zeros((1, c.max_ocr_length, c.ocr_hidden), np.float32),
            "tokenized_obj": np.zeros((1, c.max_obj_length), np.int32),
            "obj_attention_mask": np.ones((1, c.max_obj_length), np.int32),
            "obj_coordinates": np.zeros((1, c.max_obj_length, 4), np.float32),
            "obj_features": np.zeros((1, c.max_obj_length, c.obj_hidden), np.float32),
        }
