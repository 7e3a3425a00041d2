"""Customized{LaTr,PreSTU,SaL} executors: pluggable answer tokenizer, custom
decoder head, LinearLR warmup, encoder-freeze epochs.

Contract: `/root/reference/core/executor/CustomizedLaTr_Executor.py:25-280`
(BPE corpus prepared from train+val answers :276-280, encoder freeze for
NUM_FREEZE_EPOCH :151-158, LinearLR warmup :245, model built with
tgt_vocab_size=len(decode_tokenizer) :238; the reference's
`CustomizedSaL_Executor.py:81` ``self.optimizer`` typo is fixed by design).
"""

from __future__ import annotations

from typing import List

import jax
import numpy as np

from ..data.loader import num_batches
from ..utils.logger import get_logger
from ..utils.registry import EXECUTORS, TOKENIZERS
from .latr_executor import LaTrExecutor
from .optim import (
    build_optimizer,
    linear_warmup_schedule,
    mu_dtype_from_config,
    optimizer_extras_from_config,
    optimizer_kind_from_config,
    schedule_from_config,
)
from .prestu_executor import PreSTUExecutor
from .sal_executor import SaLExecutor
from .state import TrainState

log = get_logger(__name__)


class _CustomizedMixin:
    """Decode-tokenizer plumbing + freeze-aware training, shared by all
    Customized* executors."""

    FREEZE_SUBTREES = ("t5",)

    # -- decode tokenizer -------------------------------------------------------

    def _prepare_decode_tokenizer(self, train_df, val_df):
        name = self.config.DecodeTokenizer
        cls = TOKENIZERS.get(name)
        if "BPE" in name:
            corpus = [str(a) for a in train_df["answer"]] + [
                str(a) for a in val_df["answer"]
            ]
            self.decode_tokenizer = cls(
                data=corpus,
                step=self.config.get("bpe_step", 1000),
                save_path=self.config.get("vocab_save_path", "bpevocab.json"),
                max_vocab_size=self.config.get("max_vocab_size", 5000),
            )
        else:
            self.decode_tokenizer = cls()

    def _answer_encoder(self):
        tok = self.decode_tokenizer

        def encode(answer: str, max_length: int):
            ids = list(tok(answer, max_length=max_length, padding=True))[:max_length]
            ids = ids + [tok.pad_id] * (max_length - len(ids))
            mask = [int(i != tok.pad_id) for i in ids]
            return ids, mask

        return encode

    def _loss_pad_id(self) -> int:
        return self.decode_tokenizer.pad_id

    def _build_model_config(self, cfg_builder):
        tok = self.decode_tokenizer
        return cfg_builder.build(
            self.config,
            tgt_vocab_size=len(tok),
            pad_id=tok.pad_id,
            bos_id=tok.bos_id,
            eos_id=tok.eos_id,
        )

    def _build_generate_fn(self, max_length: int, with_scores: bool = False):
        from ..models.generate import make_beam_generate_fn, make_generate_fn

        tok = self.decode_tokenizer
        c = self.config
        if c.get("isgreedy", True) or c.get("num_beam", 1) <= 1:
            fn = make_generate_fn(
                self.model, max_length,
                bos_id=tok.bos_id, eos_id=tok.eos_id, pad_id=tok.pad_id,
                with_scores=with_scores,
            )
        else:
            fn = make_beam_generate_fn(
                self.model, max_length, num_beams=int(c.num_beam),
                bos_id=tok.bos_id, eos_id=tok.eos_id, pad_id=tok.pad_id,
                with_scores=with_scores,
            )
        return jax.jit(fn)

    def _decode_rows(self, rows) -> List[str]:
        decoded = self.decode_tokenizer.batch_decode(rows)
        # Byte/Char tokenizers return 1-element lists per row
        return [d[0] if isinstance(d, list) else d for d in decoded]

    # -- training: warmup schedule + encoder freeze --------------------------------

    def _init_training_properties(self):
        c = self.config
        steps_per_epoch = num_batches(
            len(self.train_data), c.TRAIN_BATCH_SIZE, drop_last=True
        )
        schedule = schedule_from_config(
            c,
            linear_warmup_schedule(c.LR, c.get("warmup_step", 1000)),
            steps_per_epoch,
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

    def _make_train_step(self):
        import functools

        import optax

        tx = self.tx
        freeze_subtrees = self.FREEZE_SUBTREES
        base_rng = jax.random.PRNGKey(self.config.get("SEED", 13))
        accum = self._grad_accum_steps()
        ema_decay = self._ema_decay()

        @functools.partial(jax.jit, donate_argnums=(0,))
        def step(state, batch, encoder_lr_scale):
            dropout_rng = jax.random.fold_in(base_rng, state.step)
            loss, grads = self._value_and_grad_accum(
                state.params, batch, dropout_rng, accum
            )
            # NUM_FREEZE_EPOCH zeroes the encoder's grads; under LoRA the
            # trainable leaves live in grads["lora"], mirroring the same
            # subtree names (the base is already frozen by the optimizer)
            roots = [grads["lora"]] if "lora" in grads else [grads]
            for root in roots:
                for name in freeze_subtrees:
                    if name in root:
                        root[name] = jax.tree.map(
                            lambda g: g * encoder_lr_scale, root[name]
                        )
            updates, opt_state = tx.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            ema = state.ema_params
            if ema_decay and ema is not None:
                import jax.numpy as jnp

                ema = jax.tree.map(
                    lambda e, p: (
                        e * ema_decay + p.astype(e.dtype) * (1.0 - ema_decay)
                        if jnp.issubdtype(e.dtype, jnp.floating) else p
                    ),
                    ema, params,
                )
            return (
                state.replace(
                    params=params, opt_state=opt_state, step=state.step + 1,
                    ema_params=ema,
                ),
                loss,
            )

        return step

    def _train_epoch(self, epoch: int) -> float:
        from ..data.loader import batch_iterator
        from ..utils.profiling import StepTimer

        c = self.config
        frozen = epoch <= c.get("NUM_FREEZE_EPOCH", 0)
        scale = np.float32(0.0 if frozen else 1.0)
        if frozen:
            log.info(f"Epoch {epoch}: encoder frozen")
        total, it = 0.0, 0
        n_steps = num_batches(len(self.train_data), c.TRAIN_BATCH_SIZE, drop_last=True)
        timer = StepTimer()
        timer.start()
        batches = self._maybe_prefetch(batch_iterator(
            self.train_data, c.TRAIN_BATCH_SIZE, shuffle=True,
            seed=c.get("SEED", 13) + epoch, drop_last=True,
        ))
        for batch, _ in batches:
            self.state, loss = self.train_step(self.state, self._shard(batch), scale)
            total += float(loss)
            timer.tick(c.TRAIN_BATCH_SIZE)
            it += 1
            if it == 1 or it % 20 == 0 or it == n_steps:
                log.info(
                    f"--TRAINING--|Epoch: {epoch}| Step: {it}/{n_steps} "
                    f"| Loss: {round(total / it, 2)} | {timer.summary()}"
                )
        return total / max(it, 1)


@EXECUTORS.register("CustomizedLaTr_Executor")
class CustomizedLaTrExecutor(_CustomizedMixin, LaTrExecutor):
    pass


@EXECUTORS.register("CustomizedPreSTU_Executor")
class CustomizedPreSTUExecutor(_CustomizedMixin, PreSTUExecutor):
    pass


@EXECUTORS.register("CustomizedSaL_Executor")
class CustomizedSaLExecutor(_CustomizedMixin, SaLExecutor):
    def _build_model_config(self, cfg_builder):
        tok = self.decode_tokenizer
        return cfg_builder.build(
            self.config,
            tgt_vocab_size=len(tok),
            pad_id=tok.pad_id,
            bos_id=tok.bos_id,
            eos_id=tok.eos_id,
            new_token_embedding_size=self._new_vocab_size(),
        )
