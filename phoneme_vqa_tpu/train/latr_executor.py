"""LaTr executor: T5+ViT+layout VQA train/eval/predict.

Contract: `/root/reference/core/executor/LaTr_Executor.py:25-208` —
backbone tokenizer for questions/OCR/answers, LaTrDataset featurization,
teacher-forced CE with shift-by-one labels, greedy generate + decode for
metrics.

TPU-native: one jitted train step (donated state, batch sharded over the
mesh data axis — grads psum'd by XLA) and one jitted whole-sequence greedy
generate per (batch_size, max_length) signature.
"""

from __future__ import annotations

import functools
from typing import Dict, List

import jax
import numpy as np
import optax
import pandas as pd

from ..data.adapters import textlayout_ocr_adapt
from ..data.latr import LaTrDataset
from ..data.loader import batch_iterator, num_batches
from ..models.latr import LaTr, make_generate_fn
from ..tokenizers.backbone import load_backbone_tokenizer
from ..utils.logger import get_logger
from ..utils.registry import EXECUTORS, MODEL_CONFIGS, MODELS
from .base_executor import BaseExecutor
from .checkpoint import CheckpointManager
from .optim import build_optimizer, cross_entropy_loss, epoch_decay_schedule
from .state import TrainState

log = get_logger(__name__)


@EXECUTORS.register("LaTr_Executor")
class LaTrExecutor(BaseExecutor):
    BATCH_KEYS = (
        "pixel_values",
        "coordinates",
        "input_ids",
        "src_attention_mask",
        "ocr_attention_mask",
        "tokenized_ocr",
    )

    # -- data ------------------------------------------------------------------

    def _make_dataset(self, qa_df, ocr_df):
        return LaTrDataset(
            qa_df=qa_df,
            ocr_df=ocr_df,
            tokenizer=self.tokenizer,
            base_img_path=self.config.base_img_path,
            max_ocr_element=self.config.max_ocr_element,
            max_ocr_length=self.config.max_ocr_length,
            max_input_length=self.config.max_q_length,
            max_output_length=self.config.max_a_length,
        ).dataset

    def _read_qa(self, path):
        return pd.read_csv(path)[["image_id", "question", "answer", "filename"]]

    def _create_data_utils(self):
        self.tokenizer = load_backbone_tokenizer(
            self.config.backbone_name,
            vocab_size=self.config.get("t5_vocab_size", 36096),
        )
        train_df = self._read_qa(self.config.qa_train_path)
        val_df = self._read_qa(self.config.qa_val_path)
        self.val_answer = [str(a) for a in val_df["answer"]]
        ocr_df = textlayout_ocr_adapt(self.config.ocr_path)
        log.info("# Creating Datasets")
        self.train_data = self._make_dataset(train_df, ocr_df)
        self.val_data = self._make_dataset(val_df, ocr_df)

    def _init_eval_predict_mode(self):
        self.tokenizer = load_backbone_tokenizer(
            self.config.backbone_name,
            vocab_size=self.config.get("t5_vocab_size", 36096),
        )
        ocr_df = textlayout_ocr_adapt(self.config.ocr_path)
        if self.mode == "eval":
            log.info("###Load eval data ...")
            val_df = self._read_qa(self.config.qa_val_path)
            self.val_answer = [str(a) for a in val_df["answer"]]
            self.val_data = self._make_dataset(val_df, ocr_df)
        else:
            log.info("###Load predict data ...")
            pred_df = self._read_qa(self.config.qa_predict_path)
            self.predict_answer = [str(a) for a in pred_df["answer"]]
            self.predict_data = self._make_dataset(pred_df, ocr_df)

    # -- model -----------------------------------------------------------------

    def _build_model(self):
        log.info("# Building model architecture ...")
        cfg_builder = MODEL_CONFIGS.get(self.config.MODEL_MOD_CONFIG_CLASS)()
        self.model_config = cfg_builder.build(self.config)
        model_cls = MODELS.get(self.config.MODEL_CLASS)
        self.model = model_cls(self.model_config)
        self.params = self._init_params()
        # a TrainState always exists (eval mode restores params into it)
        self.state = TrainState(params=self.params, opt_state=(), step=0, epoch=0)
        self.ckpt = CheckpointManager(self.config.SAVE_PATH)
        self._maybe_import_pretrained()

    def _init_params(self):
        dummy = self._dummy_batch()
        labels = np.zeros((1, 2), np.int32)
        params = self.model.init(
            jax.random.PRNGKey(self.config.get("SEED", 13)),
            dummy["pixel_values"],
            dummy["coordinates"],
            dummy["input_ids"],
            labels,
            dummy["src_attention_mask"],
            np.ones_like(labels),
            dummy["ocr_attention_mask"],
            dummy["tokenized_ocr"],
        )["params"]
        n = sum(x.size for x in jax.tree.leaves(params))
        log.info(f"# Model parameters: {n / 1e6:.1f}M")
        return params

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
        schedule = epoch_decay_schedule(c.LR, steps_per_epoch)
        self.tx = build_optimizer(schedule, betas=tuple(c.BETAS))
        self.state = TrainState.create(self.params, self.tx)
        self._maybe_resume()
        self.train_step = self._make_train_step()

    def _loss_from_batch(self, params, batch):
        labels = batch["label_ids"]
        label_mask = batch["label_attention_mask"]
        logits = self.model.apply(
            {"params": params},
            batch["pixel_values"],
            batch["coordinates"],
            batch["input_ids"],
            labels[:, :-1],
            batch["src_attention_mask"],
            label_mask[:, :-1],
            batch["ocr_attention_mask"],
            batch["tokenized_ocr"],
        )
        return cross_entropy_loss(
            logits, labels[:, 1:], self.tokenizer.pad_token_id
        )

    def _make_train_step(self):
        tx = self.tx

        @functools.partial(jax.jit, donate_argnums=(0,))
        def step(state: TrainState, batch):
            loss, grads = jax.value_and_grad(self._loss_from_batch)(
                state.params, batch
            )
            updates, opt_state = tx.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            return (
                state.replace(
                    params=params, opt_state=opt_state, step=state.step + 1
                ),
                loss,
            )

        return step

    def _train_epoch(self, epoch: int) -> float:
        c = self.config
        total, it = 0.0, 0
        n_steps = num_batches(len(self.train_data), c.TRAIN_BATCH_SIZE, drop_last=True)
        for batch, _ in batch_iterator(
            self.train_data, c.TRAIN_BATCH_SIZE, shuffle=True,
            seed=c.get("SEED", 13) + epoch, drop_last=True,
        ):
            self.state, loss = self.train_step(self.state, self._shard(batch))
            total += float(loss)
            it += 1
            if it == 1 or it % 20 == 0 or it == n_steps:
                log.info(
                    f"--TRAINING--|Epoch: {epoch}| Step: {it}/{n_steps} "
                    f"| Loss: {round(total / it, 2)}"
                )
        return total / max(it, 1)

    # -- inference ----------------------------------------------------------------

    def _get_generate_fn(self, max_length: int):
        key = max_length
        if key not in self._generate_fns:
            self._generate_fns[key] = jax.jit(
                make_generate_fn(self.model, max_length)
            )
        return self._generate_fns[key]

    def infer(self, dataset, batch_size: int, max_length: int) -> List[str]:
        generate = self._get_generate_fn(max_length)
        out_rows: List[List[int]] = []
        for batch, n_valid in batch_iterator(dataset, batch_size, pad_final=True):
            model_batch = {k: batch[k] for k in self.BATCH_KEYS}
            ids = generate(self.state.params, self._shard(model_batch))
            out_rows.extend(np.asarray(ids)[:n_valid].tolist())
        return self._decode_rows(out_rows)

    def _decode_rows(self, rows: List[List[int]]) -> List[str]:
        """Cut [start, ..., eos] -> tokens between, then detokenize
        (reference: base_executor.py:233-241 + batch_decode skip specials)."""
        eos = self.tokenizer.eos_token_id
        cut = []
        for row in rows:
            try:
                cut.append(row[1 : row.index(eos)])
            except ValueError:
                cut.append(row)
        return self.tokenizer.batch_decode(cut, skip_special_tokens=True)
