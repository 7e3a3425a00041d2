"""Phoneme-decoding executors.

* PhonemeLaTr / PhonemePreSTU — structured (onset, rhyme, tone) triple
  streams via the StructuredPhonemeTokenizer; three CE losses summed
  (`/root/reference/core/executor/PhonemeLaTr_Executor.py:181-190`), encoder
  freeze + LinearLR warmup (`:152-159,266`).
  (The reference's `core/executor/__init__.py:10` ships broken for
  PhonemePreSTU — imports a dataset instead of the executor — making that
  mode unlaunchable; here it works.)
* PhonemeSaL — flat phoneme stream via the closed-vocabulary flat
  PhonemeTokenizer (`PhonemeSaL_Executor.py:19-275`); answers run through
  `preprocess_sentence` first (`PhonemeSaLDataset.py:130-136`).
"""

from __future__ import annotations

from typing import List

import jax
import numpy as np

from ..models.phoneme import PhonemeLaTrConfig, phoneme_decoder_from_yaml
from ..phonology.compose import preprocess_sentence
from ..tokenizers.phoneme_flat import PhonemeTokenizer
from ..tokenizers.phoneme_structured import StructuredPhonemeTokenizer
from ..utils.logger import get_logger
from ..utils.registry import EXECUTORS
from .customized_executor import _CustomizedMixin, CustomizedSaLExecutor
from .latr_executor import LaTrExecutor
from .optim import cross_entropy_loss
from .prestu_executor import PreSTUExecutor

log = get_logger(__name__)


class _PhonemeTripleExecMixin(_CustomizedMixin):
    """Structured triple-stream plumbing (tokenizer, 3-way loss, decode)."""

    def _prepare_decode_tokenizer(self, train_df=None, val_df=None):
        self.decode_tokenizer = StructuredPhonemeTokenizer(
            vocab_path=self.config.get("vocab_path"),
            annotation_paths=list(self.config.get("annotation_paths", []) or []),
        )

    def _answer_encoder(self):
        tok = self.decode_tokenizer

        def encode(answer: str, max_length: int):
            triples = tok.encode(answer, max_length)
            mask = [int(t[0] != tok.pad_id) for t in triples]
            return triples, mask

        return encode

    def _build_model_config(self, cfg_builder):
        tok = self.decode_tokenizer
        base = cfg_builder.build(self.config)
        return PhonemeLaTrConfig(
            t5=base.t5,
            vit=base.vit,
            max_2d_position_embeddings=getattr(
                base, "max_2d_position_embeddings", 1024
            ),
            freeze_vit=True,
            phoneme_decoder=phoneme_decoder_from_yaml(
                self.config, base.t5,
                onset_vocab=tok.onset_size,
                rhyme_vocab=tok.rhyme_size,
                tone_vocab=tok.tone_size,
                pad_id=tok.pad_id, bos_id=tok.bos_id, eos_id=tok.eos_id,
            ),
        )

    def _loss_from_batch(self, params, batch, dropout_rng=None):
        labels = batch["label_ids"]  # (B, T, 3)
        mask = batch["label_attention_mask"]  # (B, T)
        onset, rhyme, tone = self.model.apply(
            {"params": params},
            self._model_batch(batch),
            labels[:, :-1, :],
            mask[:, :-1],
            deterministic=dropout_rng is None,
            rngs=None if dropout_rng is None else {"dropout": dropout_rng},
        )
        pad = self.decode_tokenizer.pad_id
        ls = self._label_smoothing()
        return (
            cross_entropy_loss(onset, labels[:, 1:, 0], pad, label_smoothing=ls)
            + cross_entropy_loss(rhyme, labels[:, 1:, 1], pad, label_smoothing=ls)
            + cross_entropy_loss(tone, labels[:, 1:, 2], pad, label_smoothing=ls)
        )

    def _build_generate_fn(self, max_length: int, with_scores: bool = False):
        from ..models.generate import (
            make_multi_head_beam_generate_fn,
            make_multi_head_generate_fn,
        )

        tok = self.decode_tokenizer
        c = self.config
        if c.get("isgreedy", True) or c.get("num_beam", 1) <= 1:
            fn = make_multi_head_generate_fn(
                self.model, max_length, num_components=3,
                bos_id=tok.bos_id, eos_id=tok.eos_id, pad_id=tok.pad_id,
                stop_component=0, with_scores=with_scores,
            )
        else:
            fn = make_multi_head_beam_generate_fn(
                self.model, max_length, num_beams=int(c.num_beam),
                bos_id=tok.bos_id, eos_id=tok.eos_id, pad_id=tok.pad_id,
                stop_component=0, with_scores=with_scores,
            )
        return jax.jit(fn)

    def _decode_rows(self, rows) -> List[str]:
        return self.decode_tokenizer.batch_decode(np.asarray(rows))

    def _dummy_labels(self):
        return np.zeros((1, 2, 3), np.int32)

    def _init_params(self):
        dummy = self._dummy_batch()
        labels = self._dummy_labels()
        params = self.model.init(
            jax.random.PRNGKey(self.config.get("SEED", 13)),
            dummy,
            labels,
            np.ones(labels.shape[:2], np.int32),
        )["params"]
        n = sum(x.size for x in jax.tree.leaves(params))
        log.info(f"# Model parameters: {n / 1e6:.1f}M")
        return params


@EXECUTORS.register("PhonemeLaTr_Executor")
class PhonemeLaTrExecutor(_PhonemeTripleExecMixin, LaTrExecutor):
    pass


@EXECUTORS.register("PhonemePreSTU_Executor")
class PhonemePreSTUExecutor(_PhonemeTripleExecMixin, PreSTUExecutor):
    pass


@EXECUTORS.register("PhonemeSaL_Executor")
class PhonemeSaLExecutor(CustomizedSaLExecutor):
    """Flat phoneme stream over the SaL encoder."""

    def _prepare_decode_tokenizer(self, train_df=None, val_df=None):
        self.decode_tokenizer = PhonemeTokenizer()

    def _answer_encoder(self):
        tok = self.decode_tokenizer

        def encode(answer: str, max_length: int):
            ids = tok.encode(preprocess_sentence(answer), max_length)
            mask = [int(i != tok.pad_idx) for i in ids]
            return ids, mask

        return encode
