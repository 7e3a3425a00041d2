"""LaTr executor (contract: /root/reference/core/executor/LaTr_Executor.py:25-208).

All generic machinery (jitted train step, whole-sequence jitted greedy
generate, metric eval) lives in BaseExecutor; this class binds the LaTr
dataset/featurization and model batch keys.
"""

from __future__ import annotations

import os
from typing import Dict

import jax
import numpy as np
import pandas as pd

from ..data.adapters import textlayout_ocr_adapt
from ..data.latr import LaTrDataset
from ..data.loader import num_batches
from ..tokenizers.backbone import load_backbone_tokenizer
from ..utils.logger import get_logger
from ..utils.registry import EXECUTORS, MODEL_CONFIGS, MODELS
from .base_executor import BaseExecutor
from .checkpoint import CheckpointManager
from .optim import (
    build_optimizer,
    epoch_decay_schedule,
    mu_dtype_from_config,
    optimizer_extras_from_config,
    optimizer_kind_from_config,
    schedule_from_config,
)
from .state import TrainState

log = get_logger(__name__)


@EXECUTORS.register("LaTr_Executor")
class LaTrExecutor(BaseExecutor):
    REQUIRED_TRAIN_KEYS = BaseExecutor.REQUIRED_TRAIN_KEYS + (
        "ocr_path", "base_img_path", "max_ocr_element", "max_ocr_length",
        "backbone_name",
    )
    BATCH_KEYS = (
        "pixel_values",
        "coordinates",
        "input_ids",
        "src_attention_mask",
        "ocr_attention_mask",
        "tokenized_ocr",
    )
    DATASET_CLS = LaTrDataset

    # -- data ------------------------------------------------------------------

    def _make_dataset(self, qa_df, ocr_df):
        return self.DATASET_CLS(
            qa_df=qa_df,
            ocr_df=ocr_df,
            tokenizer=self.tokenizer,
            base_img_path=self.config.base_img_path,
            max_ocr_element=self.config.max_ocr_element,
            max_ocr_length=self.config.max_ocr_length,
            max_input_length=self.config.max_q_length,
            max_output_length=self.config.max_a_length,
            answer_encoder=self._answer_encoder(),
            **self._feature_cache_args(),
        ).dataset

    def _answer_encoder(self):
        return None  # backbone tokenizer; Customized/Phoneme override

    def _feature_cache_args(self) -> dict:
        """``FEATURE_CACHE: <dir>`` -> dataset cache kwargs. The tag covers
        the answer-encoding tokenizer: the Customized/Phoneme families encode
        answers with their decode tokenizer, whose vocab is not captured by
        the dataframe fingerprint (data/feature_cache.py)."""
        from ..data import feature_cache

        cache_dir = self.config.get("FEATURE_CACHE", None) or None
        if getattr(self, "mode", None) == "serve":
            cache_dir = None  # per-request micro-batches: caching is churn
        tok = getattr(self, "decode_tokenizer", None)
        tag = feature_cache.tokenizer_tag(tok) if tok is not None else ""
        return {"cache_dir": cache_dir, "cache_tag": tag}

    def _read_qa(self, path):
        return pd.read_csv(path)[["image_id", "question", "answer", "filename"]]

    def _create_tokenizers(self):
        self.tokenizer = load_backbone_tokenizer(
            self.config.backbone_name,
            vocab_size=self.config.get("t5_vocab_size", 36096),
        )

    def _create_data_utils(self):
        self._create_tokenizers()
        train_df = self._read_qa(self.config.qa_train_path)
        val_df = self._read_qa(self.config.qa_val_path)
        self.val_answer = [str(a) for a in val_df["answer"]]
        self._prepare_decode_tokenizer(train_df, val_df)
        ocr_df = textlayout_ocr_adapt(
            self.config.ocr_path,
            cache_dir=self.config.get("FEATURE_CACHE", None) or None,
        )
        log.info("# Creating Datasets")
        self.train_data = self._make_dataset(train_df, ocr_df)
        self.val_data = self._make_dataset(val_df, ocr_df)

    def _prepare_decode_tokenizer(self, train_df, val_df):
        pass  # Customized/Phoneme families build their answer tokenizer here

    def _init_eval_predict_mode(self):
        self._create_tokenizers()
        ocr_df = textlayout_ocr_adapt(
            self.config.ocr_path,
            cache_dir=self.config.get("FEATURE_CACHE", None) or None,
        )
        if self.mode == "eval":
            log.info("###Load eval data ...")
            val_df = self._read_qa(self.config.qa_val_path)
            self.val_answer = [str(a) for a in val_df["answer"]]
            self._prepare_decode_tokenizer(val_df, val_df)
            self.val_data = self._make_dataset(val_df, ocr_df)
        else:
            log.info("###Load predict data ...")
            pred_df = self._read_qa(self.config.qa_predict_path)
            self.predict_answer = [str(a) for a in pred_df["answer"]]
            self._prepare_decode_tokenizer(pred_df, pred_df)
            self.predict_data = self._make_dataset(pred_df, ocr_df)

    def _init_serve_mode(self):
        """Online-serving init (`serve.py`): tokenizers + adapted feature
        stores only. No QA CSV is read — requests featurize per batch through
        `_make_dataset` in the serving engine. BPE answer tokenizers must
        load their persisted vocab — serving has no answer corpus to train
        on, so a missing vocab file is a hard error (training on the empty
        corpus would both serve garbage and persist a degenerate vocab that
        poisons the next training run)."""
        self._create_tokenizers()
        if "BPE" in str(self.config.get("DecodeTokenizer", "")):
            vocab_path = self.config.get("vocab_save_path", "bpevocab.json")
            if not os.path.isfile(vocab_path):
                raise FileNotFoundError(
                    f"serve mode requires the trained BPE vocab at "
                    f"{vocab_path!r} (run --mode train first)"
                )
        empty = pd.DataFrame({"answer": pd.Series([], dtype=str)})
        self._prepare_decode_tokenizer(empty, empty)
        self._serve_frames_cache = None

    @property
    def serve_frames(self):
        """(ocr_df, obj_df) feature stores, adapted lazily on first access —
        consumers that never featurize (e.g. the checkpoint converter) pay
        nothing and need no feature files on disk."""
        if getattr(self, "_serve_frames_cache", None) is None:
            if hasattr(self, "_adapt_frames"):  # SaL family: OCR + obj stores
                self._serve_frames_cache = self._adapt_frames()
            else:
                self._serve_frames_cache = (
                    textlayout_ocr_adapt(
                        self.config.ocr_path,
                        cache_dir=self.config.get("FEATURE_CACHE", None) or None,
                    ),
                    None,
                )
        return self._serve_frames_cache

    # -- model -----------------------------------------------------------------

    def _build_model(self):
        log.info("# Building model architecture ...")
        cfg_builder = MODEL_CONFIGS.get(self.config.MODEL_MOD_CONFIG_CLASS)()
        self.model_config = self._build_model_config(cfg_builder)
        model_cls = MODELS.get(self.config.MODEL_CLASS)
        self.model = model_cls(self.model_config)
        if self._defer_params_init():
            # eval/predict/serve restore a checkpoint before any decode:
            # don't burn startup materializing random params on device
            # (~2 min at base scale through this chip's tunnel) just to
            # overwrite them — build the tree abstractly; `_ensure_params`
            # materializes lazily if no restore ever happens
            self.params = jax.eval_shape(self._init_params)
            self._abstract_params = True
        else:
            self.params = self._init_params()
        self.state = TrainState(params=self.params, opt_state=(), step=0, epoch=0)
        self.ckpt = CheckpointManager(self.config.SAVE_PATH)
        self._maybe_import_pretrained()

    def _build_model_config(self, cfg_builder):
        return cfg_builder.build(self.config)

    def _dummy_batch(self) -> Dict[str, np.ndarray]:
        c = self.config
        vit_hw = self.model_config.vit.image_size
        return {
            "pixel_values": np.zeros((1, 3, vit_hw, vit_hw), np.float32),
            "coordinates": np.zeros((1, c.max_ocr_length, 6), np.int32),
            "input_ids": np.zeros((1, c.max_q_length), np.int32),
            "src_attention_mask": np.ones((1, c.max_q_length), np.int32),
            "ocr_attention_mask": np.ones((1, c.max_ocr_length), np.int32),
            "tokenized_ocr": np.zeros((1, c.max_ocr_length), np.int32),
        }

    def _maybe_import_pretrained(self):
        """HF weight import when local weights exist (zero-egress gating)."""
        path = self.config.get("pretrained_weights_path")
        if path:
            from ..models.hf_import import import_latr_weights

            self.params = import_latr_weights(self.params, path)
            self.state = self.state.replace(params=self.params)
            log.info(f"# Imported pretrained weights from {path}")

    # -- training ----------------------------------------------------------------

    def _init_training_properties(self):
        c = self.config
        steps_per_epoch = num_batches(
            len(self.train_data), c.TRAIN_BATCH_SIZE, drop_last=True
        )
        schedule = schedule_from_config(
            c, epoch_decay_schedule(c.LR, steps_per_epoch), steps_per_epoch
        )
        self._lr_schedule = schedule  # metrics.jsonl logs the live LR
        self.tx = build_optimizer(
            schedule, betas=tuple(c.BETAS), mu_dtype=mu_dtype_from_config(c),
            kind=optimizer_kind_from_config(c),
            freeze_predicate=self._freeze_predicate(),
            **optimizer_extras_from_config(c),
        )
        self.state = TrainState.create(
            self.params, self.tx, ema=self._ema_decay() > 0
        )
        self._maybe_resume()
        self.train_step = self._make_train_step()
