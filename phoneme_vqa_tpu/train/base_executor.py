"""Base executor: train / eval / predict orchestration.

Contract (`/root/reference/core/executor/base_executor.py:24-275`):
* ctor branches on mode; ``run()`` dispatches train/evaluate/predict
* train: per-epoch train + metric eval, best/last checkpointing on Accuracy,
  auto-resume from last_ckp
* evaluate: load {evaltype} checkpoint, compute metric dict
* predict: load {predicttype} checkpoint, optionally score, dump
  ``results.json`` with the reference's ``[{"gens": ..., "gts": ...}]`` schema
* metric computation dedups consecutive repeated answers via groupby
  (`base_executor.py:256`) and keys samples "0_", "1_", ...

TPU-native: the train step and the full greedy generate are jitted once and
reused every batch; batches are sharded over the mesh data axis; per-step
wall-clock and samples/sec are logged (the reference logs loss only).
"""

from __future__ import annotations

import functools
import itertools
import json
import os
import time
from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from .. import evaluation
from ..parallel.mesh import (
    create_mesh,
    pad_batch_to_devices,
    place_tree,
    shard_batch,
)
from ..utils.logger import get_logger

log = get_logger(__name__)


class BaseExecutor:
    def __init__(self, config, mode: str = "train", evaltype: str = "last",
                 predicttype: str = "best"):
        log.info("---Initializing Executor---")
        self.config = config
        self.mode = mode
        self.evaltype = evaltype
        self.predicttype = predicttype
        self.best_score = 0.0
        self.mesh = create_mesh(config.get("MESH"))
        self._generate_fns: Dict = {}
        if config.get("DEBUG_NANS"):
            from ..utils.profiling import enable_nan_checks

            enable_nan_checks(True)
        # kernel dispatch knobs (defaults follow the v5e measurements in
        # docs/DESIGN.md; both overridable per run)
        from ..ops import attention as _attn

        if config.get("FLASH") is not None:
            _attn.enable_flash(bool(config.get("FLASH")))
        if config.get("SAL_FUSED") is not None:
            _attn.enable_sal_fused(bool(config.get("SAL_FUSED")))

        if mode == "train":
            config.require(*self.REQUIRED_TRAIN_KEYS)
            self._create_data_utils()
            self._build_model()
            self._init_training_properties()
        elif mode in ("eval", "predict"):
            config.require(
                "qa_predict_path" if mode == "predict" else "qa_val_path"
            )
            self._init_eval_predict_mode()
            self._build_model()
        elif mode == "serve":
            # online serving (serve.py): tokenizers + feature stores + model
            # only — no QA CSVs read, no eval/predict dataset featurized
            self._init_serve_mode()
            self._build_model()
        else:
            raise ValueError(f"unknown mode {mode!r}")
        self._place_state()

    # -- subclass hooks -------------------------------------------------------

    # keys every train run needs; executor families extend with their data
    # paths (fail-fast with all missing keys named, rather than a cryptic
    # error deep inside featurization — the reference had no validation)
    REQUIRED_TRAIN_KEYS: tuple = (
        "EXECUTOR", "NUM_EPOCHS", "LR", "BETAS",
        "TRAIN_BATCH_SIZE", "EVAL_BATCH_SIZE",
        "max_q_length", "max_a_length", "max_eval_length",
        "qa_train_path", "qa_val_path",
        "MODEL_CLASS", "MODEL_MOD_CONFIG_CLASS",
    )

    def _create_data_utils(self):
        raise NotImplementedError

    def _init_eval_predict_mode(self):
        raise NotImplementedError

    def _init_serve_mode(self):
        raise NotImplementedError

    def _build_model(self):
        raise NotImplementedError

    def _init_training_properties(self):
        raise NotImplementedError

    def _train_epoch(self, epoch: int) -> float:
        raise NotImplementedError

    def infer(self, dataset, batch_size: int, max_length: int) -> List[str]:
        raise NotImplementedError

    # -- driver ---------------------------------------------------------------

    def run(self):
        if self.mode == "train":
            log.info("# Training on epochs... #")
            return self.train()
        if self.mode == "eval":
            return self.evaluate()
        if self.mode == "predict":
            return self.predict()

    def train(self):
        folder = self.config.SAVE_PATH or "./models"
        os.makedirs(folder, exist_ok=True)

        log.info("#----------- START TRAINING -----------------#")
        self._maybe_attach_vit_cache(("train_data", "val_data"))
        t_start = time.perf_counter()
        start_epoch = int(self.state.epoch)
        # EARLY_STOP_PATIENCE: stop after N epochs without an Accuracy
        # improvement (0/absent = the reference's fixed-epoch contract).
        # best_epoch starts at the resume point so a resumed run gets a
        # full patience window, not an instant stop.
        patience = int(self.config.get("EARLY_STOP_PATIENCE", 0) or 0)
        best_epoch, best_acc = start_epoch, 0.0

        for epoch in range(start_epoch + 1, self.config.NUM_EPOCHS + 1):
            t_ep = time.perf_counter()
            train_loss = self._train_epoch(epoch)
            scores = self._evaluate_metrics()
            acc = scores["Accuracy"]
            # VAL_LOSS: true — also track the teacher-forced validation loss
            # each epoch (overfitting signal the answer metrics can hide)
            val_loss = (
                self.validate_loss() if self.config.get("VAL_LOSS") else None
            )
            log.info(
                f"Epoch {epoch}: loss={train_loss:.4f} "
                + (f"val_loss={val_loss:.4f} " if val_loss is not None else "")
                + f"({time.perf_counter() - t_ep:.1f}s) {scores}"
            )
            if acc > best_acc:
                best_acc, best_epoch = acc, epoch

            self.state = self.state.replace(epoch=epoch)
            lr_fn = getattr(self, "_lr_schedule", None)
            self._log_metrics(
                {"epoch": epoch, "train_loss": float(train_loss),
                 **({"lr": float(lr_fn(int(self.state.step)))} if lr_fn else {}),
                 **({"val_loss": float(val_loss)} if val_loss is not None else {}),
                 **{k: (list(map(float, v)) if isinstance(v, (list, tuple))
                        else float(v)) for k, v in scores.items()}}
            )
            if self.config.SAVE:
                # the reference saves best only on strict improvement
                # (base_executor.py:100); we additionally seed best_ckp on the
                # first epoch so predict-from-best is never unlaunchable
                if acc > self.best_score or not self.ckpt.exists("best"):
                    self.best_score = max(self.best_score, acc)
                    self._save_checkpoint("best")
                self._save_checkpoint("last")

            if patience and epoch - best_epoch >= patience:
                log.info(
                    f"# Early stop at epoch {epoch}: no Accuracy improvement "
                    f"for {patience} epochs (best {best_acc:.4f} @ {best_epoch})"
                )
                break

        self.ckpt.wait()  # drain async checkpoint writes
        log.info(
            f"\n# BEST RESULT:\n\tEpoch: {best_epoch}\n\tBest Accuracy: {best_acc:.4f}"
        )
        log.info(
            f"#----------- TRAINING END-Time: {time.perf_counter() - t_start} ----#"
        )
        return best_acc

    def evaluate(self):
        log.info("###Evaluate Mode###")
        self._load_trained_checkpoint(self.evaltype)
        self._maybe_attach_vit_cache(("val_data",))
        scores = self._evaluate_metrics()
        log.info("\t#EVALUATION:\n")
        log.info(scores)
        return scores

    def predict(self):
        log.info("###Predict Mode###")
        self._load_trained_checkpoint(self.predicttype)
        self._maybe_attach_vit_cache(("predict_data",))
        log.info("## START PREDICTING ... ")

        if self.config.get_predict_score:
            results, scores = self._evaluate_metrics(return_results=True)
            log.info("\t#PREDICTION:\n")
            log.info(f"\t{scores}")
        else:
            want_conf = bool(self.config.get("PREDICT_SCORES"))
            preds = self.infer(
                self.predict_data, self.config.PREDICT_BATCH_SIZE,
                self.config.max_predict_length,
                return_scores=want_conf,
            )
            if want_conf:
                preds, confs = preds
                results = [
                    {"gens": p, "confidence": float(np.exp(c))}
                    for p, c in zip(preds, confs)
                ]
            else:
                results = [{"gens": p} for p in preds]

        out_dir = self.config.SAVE_PATH or "."
        out_path = os.path.join(out_dir, "results.json")
        with open(out_path, "w", encoding="utf-8") as f:
            json.dump(results, f, ensure_ascii=False, indent=4)
        log.info("Saved Results !")
        return results

    # -- metrics ---------------------------------------------------------------

    def _evaluate_metrics(self, return_results: bool = False):
        # PREDICT_SCORES: true — decode with the score-accumulating
        # executable and attach per-answer confidence (exp of the mean
        # emitted-token log-prob, the number serving reports) to results.json.
        # Additive: the reference schema [{"gens", "gts"}] is unchanged
        # without the knob.
        want_conf = return_results and bool(self.config.get("PREDICT_SCORES"))
        confs = None
        if self.mode == "predict":
            preds = self.infer(
                self.predict_data, self.config.PREDICT_BATCH_SIZE,
                self.config.max_predict_length,
                return_scores=want_conf,
            )
            if want_conf:
                preds, confs = preds
            answers_gt = [a.strip() for a in self.predict_answer]
        else:
            preds = self.infer(
                self.val_data, self.config.EVAL_BATCH_SIZE,
                self.config.max_eval_length,
            )
            answers_gt = [a.strip() for a in self.val_answer]

        answers_gen = [[p.strip()] for p in preds]
        gens, gts = {}, {}
        for i, (gt_i, gen_i) in enumerate(zip(answers_gt, answers_gen)):
            # dedup consecutive repeats, as the reference does
            gen_join = " ".join(k for k, _ in itertools.groupby(gen_i))
            gens[f"{i}_"] = [gen_join]
            gts[f"{i}_"] = [gt_i]

        score, _ = evaluation.compute_scores(gts, gens)
        if self.mode == "predict" and return_results:
            results = [
                {"gens": gen, "gts": gt}
                for gen, gt in zip(answers_gen, answers_gt)
            ]
            if confs is not None:
                for row, c in zip(results, confs):
                    row["confidence"] = float(np.exp(c))
            return results, score
        return score

    def validate_loss(self, batch_size: int = None) -> float:
        """Mean teacher-forced loss over the validation set (the reference's
        Customized/Phoneme executors carry an equivalent `_evaluate` val-loss
        loop, e.g. PhonemeLaTr_Executor.py:228-244, though their train loops
        never call it; available here for monitoring)."""
        from ..data.loader import batch_iterator

        c = self.config
        batch_size = batch_size or c.EVAL_BATCH_SIZE
        self._ensure_params()
        if not hasattr(self, "_val_loss_fn"):
            self._val_loss_fn = jax.jit(self._loss_from_batch)
        loss_fn = self._val_loss_fn
        total, n = 0.0, 0
        for batch, _ in batch_iterator(self.val_data, batch_size, drop_last=True):
            total += float(loss_fn(self.state.params, self._shard(batch)))
            n += 1
        return total / max(n, 1)

    # -- checkpointing -----------------------------------------------------------

    def _ckpt_tree(self):
        tree = {
            "params": self.state.params,
            "opt_state": self.state.opt_state,
            "step": np.asarray(self.state.step, np.int64),
            "epoch": np.asarray(self.state.epoch, np.int64),
            # 0 at epoch boundaries; >0 for a SAVE_EVERY_STEPS mid-epoch
            # checkpoint — resume continues the interrupted epoch from the
            # NEXT batch (the shuffle is seeded per epoch, so the remaining
            # trajectory is exactly what the uninterrupted run would do)
            "step_in_epoch": np.asarray(
                getattr(self, "_step_in_epoch", 0), np.int64
            ),
            "best_score": np.asarray(self.best_score, np.float32),
        }
        if self.state.ema_params is not None:
            tree["ema_params"] = self.state.ema_params
        if hasattr(self, "_lora_scale"):
            # persisted so eval/predict/serve can merge WITHOUT the LORA_*
            # config keys (the checkpoint is self-describing)
            tree["lora_scale"] = np.asarray(self._lora_scale, np.float32)
        return tree

    def _save_checkpoint(self, name: str):
        self.ckpt.save(name, self._ckpt_tree())

    def _log_metrics(self, record: dict) -> None:
        """Structured per-epoch metrics (SURVEY §5: structured observability).
        Appends one JSON line to SAVE_PATH/metrics.jsonl."""
        if not self.config.get("SAVE_PATH"):
            return
        import time as _time

        record = dict(record, step=int(self.state.step), wall_time=_time.time())
        os.makedirs(self.config.SAVE_PATH, exist_ok=True)
        with open(
            os.path.join(self.config.SAVE_PATH, "metrics.jsonl"), "a",
            encoding="utf-8",
        ) as f:
            f.write(json.dumps(record, ensure_ascii=False) + "\n")

    def _maybe_resume(self):
        """Auto-resume full training state from last_ckp if present
        (reference: base_executor.py:174-184). A corrupt/unreadable last_ckp
        (e.g. disk fault, partial copy) degrades to best_ckp and then to a
        fresh start with a loud warning, instead of permanently wedging an
        auto-restarted training job at startup."""
        for name in ("last", "best"):
            if not self.ckpt.exists(name):
                continue
            try:
                restored = self.ckpt.restore(name, self._ckpt_tree())
            except Exception as e:
                # params-only checkpoint (e.g. a converted reference .pth,
                # scripts/import_reference_ckpt.py): resume the params with a
                # fresh optimizer rather than discarding them
                if self._try_params_only_resume(name):
                    return
                log.warning(
                    f"(!) {name}_ckp exists but is unreadable ({e!r}) — "
                    "falling back to an older checkpoint / fresh start"
                )
                continue
            self.state = self.state.replace(
                params=restored["params"],
                opt_state=restored["opt_state"],
                step=int(restored["step"]),
                epoch=int(restored["epoch"]),
                ema_params=restored.get("ema_params", self.state.ema_params),
            )
            self.best_score = float(restored["best_score"])
            # mid-epoch checkpoint (SAVE_EVERY_STEPS): continue epoch+1 from
            # the batch AFTER the one this checkpoint followed, instead of
            # replaying the whole epoch (the reference loses up to an epoch
            # per preemption: base_executor.py:174-184)
            self._resume_step_in_epoch = int(restored.get("step_in_epoch", 0))
            at = (
                f", step {self._resume_step_in_epoch} into epoch "
                f"{int(self.state.epoch) + 1}"
                if self._resume_step_in_epoch
                else ""
            )
            log.info(
                f"###Resumed from {name}_ckp (epoch {int(self.state.epoch)}{at})"
            )
            return

    @staticmethod
    def _salvage_ema(raw: dict, params):
        """Params-only resume for an EMA run: keep the checkpoint's saved
        average when it structurally matches the salvaged params, else
        re-seed the average from them."""
        try:
            ema = jax.tree.map(np.asarray, raw["ema_params"])
            ok = jax.tree.structure(ema) == jax.tree.structure(params) and all(
                np.shape(a) == np.shape(b)
                for a, b in zip(jax.tree.leaves(ema), jax.tree.leaves(params))
            )
            if ok:
                return ema
        except Exception:
            pass
        return jax.tree.map(np.array, params)

    def _try_params_only_resume(self, name: str) -> bool:
        """Salvage the params from a checkpoint whose full restore failed —
        either a params-only tree (converted reference .pth) or a full
        checkpoint whose opt_state no longer matches (e.g. OPTIMIZER switched
        adam → adafactor mid-run). Trained params are recoverable in both
        cases; only the optimizer starts fresh."""
        from . import lora

        try:
            raw = self.ckpt.restore_raw(name)
            if "params" not in raw:
                return False
            params = jax.tree.map(np.asarray, raw["params"])
            # LoRA layout mismatches are both recoverable: a composite
            # checkpoint into a flat run merges (adapters folded in); a flat
            # checkpoint into a LoRA run becomes the frozen base (current
            # zero-initialized adapters keep the merged model identical)
            if lora.is_composite(params) and not lora.is_composite(
                self.state.params
            ):
                params = jax.tree.map(
                    np.asarray,
                    lora.merge_lora(
                        params["base"], params["lora"],
                        float(raw.get("lora_scale", 1.0)),
                    ),
                )
            ours_tpl = self.state.params
            ours_is_lora = lora.is_composite(ours_tpl)
            their_lora = None
            if ours_is_lora:
                ours_tpl = ours_tpl["base"]
                if lora.is_composite(params):
                    # LoRA-to-LoRA salvage (e.g. OPTIMIZER switched): keep
                    # their trained adapters when the shapes still match
                    ok_adapters = jax.tree.structure(
                        params["lora"]
                    ) == jax.tree.structure(self.state.params["lora"]) and all(
                        np.shape(a) == np.shape(b)
                        for a, b in zip(
                            jax.tree.leaves(params["lora"]),
                            jax.tree.leaves(self.state.params["lora"]),
                        )
                    )
                    their_lora = params["lora"] if ok_adapters else None
                    params = params["base"]
            # checkpoint saved under the other SCAN_LAYERS layout: convert
            # (block_{i} <-> stacked blocks) instead of discarding the run
            from ..models.scan_utils import (
                has_scanned_blocks, stack_block_params, unstack_block_params,
            )
            ours_scanned = has_scanned_blocks(ours_tpl)
            if ours_scanned != has_scanned_blocks(params):
                params = (
                    stack_block_params(params)
                    if ours_scanned
                    else unstack_block_params(params)
                )
            ours = jax.tree.leaves(ours_tpl)
            theirs = jax.tree.leaves(params)
            if len(ours) != len(theirs) or any(
                np.shape(a) != np.shape(b) for a, b in zip(ours, theirs)
            ):
                return False
            if ours_is_lora:
                params = {
                    "base": params,
                    "lora": (
                        their_lora
                        if their_lora is not None
                        else self.state.params["lora"]
                    ),
                }
        except Exception:
            return False
        # restore step as well: epoch_decay_schedule keys on step, so a
        # params-only resume at epoch N must not restart at the epoch-0 LR
        self.state = self.state.replace(
            params=params,
            step=int(raw.get("step", 0)),
            epoch=int(raw.get("epoch", 0)),
            # EMA run resumed from a non-EMA checkpoint: re-seed the average
            # from the salvaged params (best available estimate); a matching
            # saved average survives the salvage
            ema_params=(
                None if self.state.ema_params is None
                else self._salvage_ema(raw, params)
            ),
        )
        self.best_score = float(raw.get("best_score", 0.0))
        self._resume_step_in_epoch = int(raw.get("step_in_epoch", 0) or 0)
        log.info(
            f"###Resumed PARAMS ONLY from {name}_ckp (converted/partial/"
            "optimizer-mismatched checkpoint) — optimizer starts fresh at "
            f"step {int(self.state.step)}"
        )
        return True

    def _load_trained_checkpoint(self, loadtype: str):
        """Eval/predict/serve: restore params only (no optimizer template
        needed). A LoRA composite checkpoint is merged to flat weights here
        using its persisted ``lora_scale`` — downstream decode never sees the
        split tree, and no LORA_* config keys are needed to serve one."""
        from . import lora

        restored = self.ckpt.restore_raw(loadtype)
        # prefer the EMA weights when the checkpoint carries them (that is
        # what EMA training produces them FOR; EVAL_EMA: false opts out,
        # e.g. to compare raw vs averaged weights on the same checkpoint)
        source = "params"
        if "ema_params" in restored and self.config.get("EVAL_EMA", True):
            source = "ema_params"
            log.info("## using EMA weights from the checkpoint")
        raw_params = jax.tree.map(np.asarray, restored[source])
        if lora.is_composite(raw_params):
            raw_params = lora.merge_lora(
                raw_params["base"], raw_params["lora"],
                float(restored.get("lora_scale", 1.0)),
            )
        if (
            self.mode != "train"
            and getattr(self.model_config.t5, "dtype", None) == jnp.bfloat16
        ):
            # eval/predict/serve only ever run the bf16 inference cast of
            # these weights (`_inference_params`) — cast HOST-SIDE before
            # placement so the device never holds the f32 masters: halves
            # both the restore H2D bytes and the serving HBM footprint.
            # Same bits as the on-device cast (both round-to-nearest-even).
            raw_params = jax.tree.map(
                lambda x: x.astype(jnp.bfloat16)
                if x.dtype == np.float32 else x,
                raw_params,
            )
        params = place_tree(self.mesh, raw_params)
        self.state = self.state.replace(params=params)
        self._abstract_params = False  # the deferred init is now satisfied
        self.best_score = float(restored["best_score"])
        # drop the cached bf16 inference tree: it is keyed on id(params),
        # which can collide with a freed tree's address after a hot reload
        self._bf16_params_cache = None

    def _place_state(self):
        """Shard params + optimizer state over the mesh (TP rules when
        ``MESH.model > 1``, replicated otherwise). The adam mu/nu subtrees
        carry the parameter path names, so the same path-keyed rules apply;
        ``MESH.zero1: true`` additionally shards the moments over the data
        axis (ZeRO-1 — 1/dp optimizer memory per chip). XLA derives every
        collective (grad psum over ``data``, activation all-gathers over
        ``model``, the ZeRO reduce-scatter/all-gather pair) from these
        placements — the train step itself is sharding-agnostic."""
        if getattr(self, "_abstract_params", False):
            return  # nothing to place: the tree is ShapeDtypeStructs
        mesh_cfg = self.config.get("MESH") or {}
        zero1 = bool(mesh_cfg.get("zero1")) if hasattr(mesh_cfg, "get") else False
        self.state = self.state.replace(
            params=place_tree(self.mesh, self.state.params),
            opt_state=place_tree(self.mesh, self.state.opt_state, zero1=zero1),
            ema_params=(
                None if self.state.ema_params is None
                else place_tree(self.mesh, self.state.ema_params)
            ),
        )

    # -- generic train/infer machinery (uniform batch-dict model surface) --------

    BATCH_KEYS: tuple = ()

    def _model_batch(self, batch: dict) -> dict:
        keys = self.BATCH_KEYS
        if "vit_encodings" in batch and "pixel_values" in keys:
            # VIT_CACHE: the dataset supplies precomputed frozen-ViT
            # encodings instead of pixels (see _maybe_attach_vit_cache)
            keys = tuple(k for k in keys if k != "pixel_values") + (
                "vit_encodings",
            )
        return {k: batch[k] for k in keys}

    def _defer_params_init(self) -> bool:
        """Whether construction should build the param tree ABSTRACTLY
        (`jax.eval_shape` — no device work, no HBM) instead of materializing
        random weights. True for eval/predict/serve: those modes restore a
        checkpoint before any decode (`evaluate`/`predict` unconditionally,
        `serve.py --ckpt best|last` right after construction), so a real
        on-device init is pure wasted startup — ~2 min at base scale through
        this chip's tunnel (docs/SERVING.md "cold start"). Train mode and
        explicit pretrained imports (which write INTO the random tree) init
        eagerly as before."""
        return (
            self.mode != "train"
            and not self.config.get("pretrained_weights_path")
        )

    def _ensure_params(self):
        """Materialize deferred random-init params if no checkpoint restore
        beat first use to it (tests, `serve.py --ckpt none`) — behavior then
        matches the eager init exactly, the cost just moves to first use.
        Returns the concrete param tree either way."""
        if getattr(self, "_abstract_params", False):
            log.info("# no checkpoint restored — materializing random-init params")
            self._abstract_params = False
            self.params = self._init_params()
            self.state = self.state.replace(params=self.params)
            self._place_state()
        return self.state.params

    def _init_params(self):
        import jax as _jax

        dummy = self._dummy_batch()
        labels = np.zeros((1, 2), np.int32)
        params = self.model.init(
            _jax.random.PRNGKey(self.config.get("SEED", 13)),
            dummy,
            labels,
            np.ones_like(labels),
        )["params"]
        n = sum(x.size for x in jax.tree.leaves(params))
        log.info(f"# Model parameters: {n / 1e6:.1f}M")
        return params

    def _maybe_enable_lora(self):
        """``LORA_RANK: N`` (train mode): wrap ``self.params`` into the
        ``{"base", "lora"}`` composite and return the freeze predicate for
        `build_optimizer` — the optimizer then trains ONLY the adapters and
        allocates no state for the base (train/lora.py). Returns None when
        LoRA is off (params untouched)."""
        from . import lora

        spec = lora.from_config(self.config)
        if spec is None:
            return None
        rng = jax.random.PRNGKey(self.config.get("SEED", 13) + 1)
        adapters = lora.init_lora(self.params, spec, rng)
        self._lora_scale = spec.scale
        self.params = {"base": self.params, "lora": adapters}
        log.info(
            f"# LoRA: rank {spec.rank}, alpha {spec.alpha}, "
            f"{lora.n_params(adapters) / 1e6:.2f}M trainable adapter params "
            f"({lora.n_params(self.params['base']) / 1e6:.1f}M base frozen)"
        )
        return lora.freeze_base_predicate

    def _freeze_predicate(self):
        """The `build_optimizer` freeze predicate composing LoRA with the
        model's structural ViT freeze.

        The reference freezes its ViT with ``requires_grad=False``
        (`/root/reference/core/model/LaTr.py:54-56`): torch optimizers then
        never touch those params at all. Our ``freeze_vit`` models only
        stop_gradient the ViT output — gradients are zero, but a DECOUPLED
        weight-decay rule (OPTIMIZER: adamw / WEIGHT_DECAY > 0, adafactor's
        weight_decay_rate) decays every param regardless of its gradient,
        silently drifting the "frozen" ViT (and staling VIT_CACHE's
        encodings). Masking the whole vit subtree to optax.set_to_zero
        restores the reference semantics under ANY update rule — and
        allocates no optimizer state for the ViT as a bonus."""
        lora_pred = self._maybe_enable_lora()
        if lora_pred is not None:
            return lora_pred  # LoRA already freezes the entire base tree
        if not getattr(self.model_config, "freeze_vit", False):
            return None

        def frozen(path) -> bool:
            return bool(path) and getattr(path[0], "key", str(path[0])) == "vit"

        return frozen

    def _resolve_params(self, params):
        """LoRA composite -> merged full params (identity otherwise). Called
        inside jit (train/val loss) and before the bf16 inference cast; the
        merge itself is jitted (inlined when already tracing) so the eval
        path pays one dispatch, not one per adapter."""
        from . import lora

        if not lora.is_composite(params):
            return params
        if not hasattr(self, "_lora_merge_fn"):
            scale = getattr(self, "_lora_scale", 1.0)
            self._lora_merge_fn = jax.jit(
                lambda p: lora.merge_lora(p["base"], p["lora"], scale)
            )
        return self._lora_merge_fn(params)

    def _loss_from_batch(self, params, batch, dropout_rng=None):
        from .optim import cross_entropy_loss

        params = self._resolve_params(params)
        labels = batch["label_ids"]
        label_mask = batch["label_attention_mask"]
        logits = self.model.apply(
            {"params": params},
            self._model_batch(batch),
            labels[:, :-1],
            label_mask[:, :-1],
            deterministic=dropout_rng is None,
            rngs=None if dropout_rng is None else {"dropout": dropout_rng},
        )
        return cross_entropy_loss(
            logits, labels[:, 1:], self._loss_pad_id(),
            label_smoothing=self._label_smoothing(),
        )

    def _loss_pad_id(self) -> int:
        return self.tokenizer.pad_token_id

    def _label_smoothing(self) -> float:
        """YAML ``LABEL_SMOOTHING`` in [0, 1): smoothed-target CE (the
        standard T5 recipe uses 0.1). 0/absent = the reference's plain CE."""
        a = float(self.config.get("LABEL_SMOOTHING", 0) or 0)
        if a and not (0.0 < a < 1.0):
            raise ValueError(f"LABEL_SMOOTHING must be in [0, 1), got {a}")
        return a

    def _ema_decay(self) -> float:
        """EMA_DECAY in (0, 1): keep an exponential moving average of the
        params, updated inside the jitted train step (one fused
        multiply-add over the param tree — HBM traffic comparable to the
        adam mu update). Checkpoints persist it; eval/predict/serve prefer
        it (EVAL_EMA: false opts out). 0/absent = off, zero cost."""
        d = float(self.config.get("EMA_DECAY", 0) or 0)
        if d and not (0.0 < d < 1.0):
            raise ValueError(f"EMA_DECAY must be in (0, 1), got {d}")
        return d

    def _grad_accum_steps(self) -> int:
        """``GRAD_ACCUM_STEPS: N`` splits each global batch into N sequential
        microbatches inside ONE jitted step (`lax.scan`), accumulating grads
        and applying a single optimizer update — activation memory drops to
        ~1/N so the effective batch can grow past the HBM ceiling. Loss/grads
        are the mean over microbatches (each microbatch's masked-mean CE
        weighted equally — exact when microbatch token counts match)."""
        accum = int(self.config.get("GRAD_ACCUM_STEPS", 1) or 1)
        bs = int(self.config.TRAIN_BATCH_SIZE)
        if accum > 1 and bs % accum:
            raise ValueError(
                f"GRAD_ACCUM_STEPS={accum} must divide TRAIN_BATCH_SIZE={bs}: "
                "each microbatch is batch/accum rows"
            )
        return accum

    def _value_and_grad_accum(self, params, batch, dropout_rng, accum: int):
        """(loss, grads) of the batch — direct, or accumulated over `accum`
        microbatches without materializing the full-batch activations."""
        if accum <= 1:
            return jax.value_and_grad(self._loss_from_batch)(
                params, batch, dropout_rng
            )
        micro = jax.tree.map(
            lambda x: x.reshape((accum, x.shape[0] // accum) + x.shape[1:]),
            batch,
        )

        def body(carry, mb):
            g_acc, l_acc, i = carry
            rng = (
                None if dropout_rng is None
                else jax.random.fold_in(dropout_rng, i)
            )
            loss, grads = jax.value_and_grad(self._loss_from_batch)(
                params, mb, rng
            )
            g_acc = jax.tree.map(jnp.add, g_acc, grads)
            return (g_acc, l_acc + loss, i + 1), None

        zeros = jax.tree.map(jnp.zeros_like, params)
        (grads, loss, _), _ = jax.lax.scan(
            body, (zeros, jnp.float32(0.0), jnp.int32(0)), micro
        )
        inv = 1.0 / accum
        return loss * inv, jax.tree.map(lambda g: g * inv, grads)

    def _make_train_step(self):
        import functools

        import optax

        tx = self.tx
        base_rng = jax.random.PRNGKey(self.config.get("SEED", 13))
        accum = self._grad_accum_steps()
        ema_decay = self._ema_decay()
        if self.config.get("SCAN_LAYERS") and not self.config.get("REMAT"):
            # measured on v5e (docs/DESIGN.md): the scanned train backward
            # saves every block's activations and OOMs at base scale B=32
            log.warning(
                "(!) SCAN_LAYERS training without REMAT keeps all per-layer "
                "activations alive through the scan backward — expect OOM at "
                "production scale; set REMAT: true (measured faster anyway)"
            )

        @functools.partial(jax.jit, donate_argnums=(0,))
        def step(state, batch):
            dropout_rng = jax.random.fold_in(base_rng, state.step)
            loss, grads = self._value_and_grad_accum(
                state.params, batch, dropout_rng, accum
            )
            updates, opt_state = tx.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            ema = state.ema_params
            if ema_decay and ema is not None:
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
        from ..data.loader import batch_iterator, num_batches
        from ..utils.profiling import StepTimer, maybe_trace

        c = self.config
        total, it = 0.0, 0
        # multi-host: each host featurizes only its interleaved row slice of
        # the global batch; shard_batch assembles the global array
        # (process_count == 1 → identity)
        host, n_hosts = jax.process_index(), jax.process_count()
        if c.TRAIN_BATCH_SIZE % n_hosts:
            # flooring here would silently shrink the global batch (and the
            # effective LR scale) on every host — fail fast instead
            raise ValueError(
                f"TRAIN_BATCH_SIZE={c.TRAIN_BATCH_SIZE} must divide the host "
                f"count ({n_hosts}): each host featurizes batch/hosts rows. "
                f"Use {pad_batch_to_devices(c.TRAIN_BATCH_SIZE, n_hosts)}."
            )
        local_bs = max(1, c.TRAIN_BATCH_SIZE // n_hosts)
        n_steps = num_batches(
            len(self.train_data) // n_hosts, local_bs, drop_last=True
        )
        timer = StepTimer()
        timer.start()
        profile_dir = c.get("PROFILE_DIR") if epoch == 1 else None
        batches = batch_iterator(
            self.train_data, local_bs, shuffle=True,
            seed=c.get("SEED", 13) + epoch, drop_last=True,
            shard=host, num_shards=n_hosts,
        )
        batches = self._maybe_prefetch(batches)
        # preemption safety (SURVEY §5): SAVE_EVERY_STEPS refreshes last_ckp
        # inside the epoch (tagged with step_in_epoch), and a resumed run
        # fast-forwards the epoch-seeded shuffle past the already-trained
        # batches — at most SAVE_EVERY_STEPS steps of work are lost AND
        # replayed to a preemption (the reference replays the whole epoch)
        save_every = int(c.get("SAVE_EVERY_STEPS", 0) or 0)
        skip = int(getattr(self, "_resume_step_in_epoch", 0) or 0)
        self._resume_step_in_epoch = 0  # only the interrupted epoch skips
        if skip:
            log.info(
                f"--TRAINING--|Epoch: {epoch}| fast-forwarding {skip} "
                f"already-trained batches from the mid-epoch checkpoint"
            )
        with maybe_trace(profile_dir, "train_epoch"):
            for batch, _ in batches:
                if it < skip:
                    it += 1
                    continue
                self.state, loss = self.train_step(
                    self.state, self._shard(batch, process_local=True)
                )
                total += float(loss)
                timer.tick(c.TRAIN_BATCH_SIZE)
                it += 1
                if it == skip + 1 or it % 20 == 0 or it == n_steps:
                    log.info(
                        f"--TRAINING--|Epoch: {epoch}| Step: {it}/{n_steps} "
                        f"| Loss: {round(total / max(it - skip, 1), 2)} "
                        f"| {timer.summary()}"
                    )
                if save_every and c.get("SAVE") and it % save_every == 0:
                    # tagged even at it == n_steps: the epoch-end bookkeeping
                    # (eval, epoch counter) hasn't run yet, so a resume must
                    # skip ALL batches rather than replay a trained epoch
                    self._step_in_epoch = it
                    self._save_checkpoint("last")
                    self._step_in_epoch = 0
        return total / max(it - skip, 1)

    def _build_generate_fn(self, max_length: int, with_scores: bool = False):
        from ..models.generate import (
            make_generate_fn,
            make_sample_generate_fn,
            make_speculative_generate_fn,
        )

        if self.config.get("SAMPLE"):
            if self.config.get("SPEC_DECODE"):
                log.warning(
                    "(!) SAMPLE and SPEC_DECODE both set — sampling wins "
                    "(speculative verification is greedy-only)"
                )
            jitted = jax.jit(make_sample_generate_fn(
                self.model, max_length,
                temperature=float(self.config.get("TEMPERATURE", 1.0)),
                top_k=int(self.config.get("TOP_K", 0) or 0),
                top_p=float(self.config.get("TOP_P", 1.0)),
                seed=int(self.config.get("SEED", 13)),
                with_scores=with_scores,
            ))
            # fold a per-call counter into the key: repeated infer calls /
            # batches on the same input draw DIFFERENT noise (the module's
            # point — diverse answers, self-consistency voting), while one
            # process stays reproducible from SEED. The key is a traced
            # argument, so no recompile per call.
            base_rng = jax.random.PRNGKey(int(self.config.get("SEED", 13)))
            calls = itertools.count()

            def generate(params, batch):
                return jitted(
                    params, batch, jax.random.fold_in(base_rng, next(calls))
                )

            return generate
        spec_k = int(self.config.get("SPEC_DECODE", 0) or 0)
        if spec_k > 1:
            if not getattr(type(self.model), "spec_decode_supported", False):
                log.warning(
                    f"(!) SPEC_DECODE={spec_k} ignored: "
                    f"{type(self.model).__name__} uses a custom decoder cache"
                )
            else:
                return jax.jit(make_speculative_generate_fn(
                    self.model, max_length, spec_k, with_scores=with_scores
                ))
        return jax.jit(
            make_generate_fn(self.model, max_length, with_scores=with_scores)
        )

    def _get_generate_fn(self, max_length: int, with_scores: bool = False):
        key = (max_length, with_scores)
        if key not in self._generate_fns:
            self._generate_fns[key] = self._build_generate_fn(
                max_length, with_scores
            )
        return self._generate_fns[key]

    def _inference_params(self):
        """bf16 inference weights when the model computes in bf16 (halves the
        weight-read traffic that dominates the decode loop); f32 training
        masters are untouched. Cached per params object: eval calls within an
        epoch reuse one cast tree instead of re-casting ~1.5 GB per call.

        EMA training decodes with the EMA weights (so mid-train metric eval —
        and therefore best-checkpoint selection — scores the same weights
        eval/serve will load); EVAL_EMA: false opts out."""
        self._ensure_params()  # deferred-init executors materialize here
        source = self.state.params
        if self.state.ema_params is not None and self.config.get("EVAL_EMA", True):
            source = self.state.ema_params
        if getattr(self.model_config.t5, "dtype", None) != jnp.bfloat16:
            return self._resolve_params(source)
        key = (id(source), int(self.state.step))
        cached = getattr(self, "_bf16_params_cache", None)
        if cached is not None and cached[0] == key:
            return cached[1]
        casted = jax.tree.map(
            lambda x: x.astype(jnp.bfloat16)
            if hasattr(x, "dtype") and x.dtype == jnp.float32
            else x,
            self._resolve_params(source),
        )
        self._bf16_params_cache = (key, casted)
        return casted

    def infer(
        self, dataset, batch_size: int, max_length: int,
        return_scores: bool = False,
    ) -> List[str]:
        """Decode answer strings for every dataset row. ``return_scores=True``
        returns ``(answers, scores)`` where scores[i] is the mean emitted-
        token log-probability of answer i (``exp`` of it = the confidence
        number serving reports); it compiles a separate scoring executable,
        cached per (max_length, True)."""
        return self.infer_async(dataset, batch_size, max_length, return_scores)()

    def infer_async(
        self, dataset, batch_size: int, max_length: int,
        return_scores: bool = False,
    ):
        """Dispatch the decode WITHOUT materializing: returns a zero-arg
        ``resolve()`` producing :meth:`infer`'s result. JAX dispatch is
        async, so the device starts immediately and the caller can overlap
        host work (featurize/H2D of the NEXT batch — the serving engine's
        pipelining) with this decode, materializing later."""
        from ..data.loader import batch_iterator

        if self._use_pool_decode(batch_size):
            return self._infer_pool_async(
                dataset, batch_size, max_length, return_scores
            )
        generate = self._get_generate_fn(max_length, with_scores=return_scores)
        params = self._inference_params()
        pending: List = []
        batches = self._maybe_prefetch(
            batch_iterator(dataset, batch_size, pad_final=True)
        )
        # dispatch every batch asynchronously and materialize at the end:
        # host-side featurization of batch i+1 overlaps device decode of
        # batch i, and the per-dispatch host sync is paid once, not per batch
        for batch, n_valid in batches:
            out = generate(params, self._shard(self._model_batch(batch)))
            pending.append((out, n_valid))

        def resolve():
            out_rows: List = []
            out_scores: List = []
            for out, n_valid in pending:
                ids = out[0] if return_scores else out
                out_rows.extend(np.asarray(ids)[:n_valid].tolist())
                if return_scores:
                    out_scores.extend(
                        np.asarray(out[1], np.float64)[:n_valid].tolist()
                    )
            answers = self._decode_rows(out_rows)
            if return_scores:
                return answers, out_scores
            return answers

        return resolve

    # -- slot-refill offline decode (EVAL_CONTINUOUS) ------------------------------

    def _use_pool_decode(self, batch_size: int = 0) -> bool:
        """``EVAL_CONTINUOUS: true`` routes offline infer through the
        slot-refill pool decode (`decode/pool.py`) — same answers, fewer
        decode steps on variable-length answers. Greedy-only (SAMPLE /
        SPEC_DECODE / beam configs keep the batch path). A data-parallel
        mesh that would actually shard the eval batch keeps the sharded
        batch decode (the pool program is not sharding-annotated); when the
        batch path would fall back to replicated anyway (odd batch size, or
        mesh of 1) the pool decode loses nothing."""
        c = self.config
        if not c.get("EVAL_CONTINUOUS"):
            return False
        from ..parallel.mesh import DATA_AXIS, mesh_size

        reason = None
        if c.get("SAMPLE") or int(c.get("SPEC_DECODE", 0) or 0) > 1:
            reason = "SAMPLE/SPEC_DECODE configs use the batch decode"
        elif not (c.get("isgreedy", True) or c.get("num_beam", 1) <= 1):
            reason = "beam search uses the batch decode"
        elif not hasattr(type(self.model), "decode_step_k"):
            reason = f"{type(self.model).__name__} has no decode_step_k"
        elif (
            self.mesh is not None
            and mesh_size(self.mesh) > 1
            and batch_size > 0
            and batch_size % int(self.mesh.shape[DATA_AXIS]) == 0
        ):
            reason = "data-parallel mesh evals via the sharded batch decode"
        if reason is not None:
            if not getattr(self, "_warned_pool", False):
                log.warning(f"(!) EVAL_CONTINUOUS ignored: {reason}")
                self._warned_pool = True
            return False
        return True

    def _get_pool_fns(self, max_length: int):
        key = ("pool", max_length)
        if key in self._generate_fns:
            return self._generate_fns[key]
        from ..decode.pool import pool_greedy_decode

        model = self.model
        ncomp = int(getattr(type(model), "decode_components", 1))
        ids = getattr(model, "decode_token_ids", None)
        if ids is None:  # stock T5 families: the backbone vocabulary's ids
            t5c = model.cfg.t5
            ids = (t5c.decoder_start_token_id, t5c.eos_token_id,
                   t5c.pad_token_id)
        bos, eos, pad = (int(i) for i in ids)

        encode = jax.jit(
            lambda params, mb: model.apply(
                {"params": params}, mb, max_length,
                method=type(model).encode_for_generate,
            )
        )

        @functools.partial(jax.jit, static_argnames=("num_slots", "scores"))
        def decode(params, pool_cache, pool_mask, full_bias, num_slots,
                   scores):
            def step_k(tokens, cache, pos, enc_mask):
                return model.apply(
                    {"params": params}, tokens, cache, pos, full_bias,
                    enc_mask, method=type(model).decode_step_k,
                )

            return pool_greedy_decode(
                step_k, pool_cache, pool_mask, num_slots, max_length,
                bos, eos, pad, num_components=ncomp, with_scores=scores,
            )

        fns = (encode, decode)
        self._generate_fns[key] = fns
        return fns

    def _infer_pool_async(
        self, dataset, batch_size: int, max_length: int,
        return_scores: bool = False,
    ):
        """`infer_async` through the slot-refill pool decode: rows are
        prefilled per batch (same encoder work as the batch path), their
        caches stay device-resident as pool chunks of ``EVAL_POOL_ROWS``,
        and each chunk decodes in ONE compiled while_loop with
        ``EVAL_SLOTS`` refilling slots (decode/pool.py has the design)."""
        from ..data.loader import batch_iterator

        encode, decode = self._get_pool_fns(max_length)
        params = self._inference_params()
        num_slots = int(self.config.get("EVAL_SLOTS", 0) or batch_size)
        pool_max = int(self.config.get("EVAL_POOL_ROWS", 128))
        pool_max = max(pool_max, batch_size)

        pending: List = []
        caches: List = []
        masks: List = []
        pooled = 0
        full_bias = None

        def flush():
            nonlocal caches, masks, pooled
            if not pooled:
                return
            if len(caches) == 1:
                pc, pm = caches[0], masks[0]
            else:
                pc = jax.tree.map(
                    lambda *xs: jnp.concatenate(xs, axis=1), *caches
                )
                pm = jnp.concatenate(masks, axis=0)
            out = decode(params, pc, pm, full_bias,
                         num_slots=num_slots, scores=return_scores)
            pending.append((out, pooled))
            caches, masks, pooled = [], [], 0

        batches = self._maybe_prefetch(
            batch_iterator(dataset, batch_size, pad_final=True)
        )
        for batch, n_valid in batches:
            cache, full_bias, enc_mask = encode(params, self._model_batch(batch))
            if n_valid != enc_mask.shape[0]:  # final padded batch: drop pads
                cache = {
                    n: jax.lax.slice_in_dim(cache[n], 0, n_valid, axis=1)
                    for n in cache
                }
                enc_mask = enc_mask[:n_valid]
            caches.append(cache)
            masks.append(enc_mask)
            pooled += n_valid
            if pooled >= pool_max:
                flush()
        flush()

        def resolve():
            out_rows: List = []
            out_scores: List = []
            for out, n_valid in pending:
                ids = out[0] if return_scores else out
                out_rows.extend(np.asarray(ids)[:n_valid].tolist())
                if return_scores:
                    out_scores.extend(
                        np.asarray(out[1], np.float64)[:n_valid].tolist()
                    )
            answers = self._decode_rows(out_rows)
            if return_scores:
                return answers, out_scores
            return answers

        return resolve

    def _decode_rows(self, rows) -> List[str]:
        """Cut [start, ..., eos] -> tokens between, then detokenize
        (reference: base_executor.py:233-241)."""
        eos = self.tokenizer.eos_token_id
        cut = []
        for row in rows:
            try:
                cut.append(row[1 : row.index(eos)])
            except ValueError:
                cut.append(row)
        return self.tokenizer.batch_decode(cut, skip_special_tokens=True)

    # -- helpers ------------------------------------------------------------------

    def _maybe_attach_vit_cache(self, dataset_attrs) -> None:
        """``VIT_CACHE: true`` — precompute frozen-ViT encodings once per
        unique image and feed them as a batch input, removing the ViT
        forward from every subsequent step (data/vit_cache.py has the full
        rationale). Exact by construction — the encoder has no dropout —
        and valid only while the ViT weights cannot change under the cache:

        * eval/predict: always (weights are static after the restore)
        * train: only when the model config freezes the ViT structurally
          (the LaTr family) AND no LoRA adapters target it. Structural
          freeze means the optimizer masks the vit subtree to set_to_zero
          (`_freeze_predicate`), so no update rule — decoupled weight decay
          included — can drift the weights under the cache.

        Idempotent per dataset; multi-host runs precompute on every host
        (duplicate work, never wrong — each host gathers from its own table).
        """
        c = self.config
        if not c.get("VIT_CACHE"):
            return
        if getattr(self.model_config, "vit", None) is None:
            log.warning(
                f"(!) VIT_CACHE ignored: {c.MODEL_CLASS} has no image encoder"
            )
            return
        if self.mode == "train":
            if not getattr(self.model_config, "freeze_vit", False):
                log.warning(
                    f"(!) VIT_CACHE ignored in train mode: {c.MODEL_CLASS} "
                    "trains its ViT, the cache would go stale every step"
                )
                return
            params_root = self.state.params
            if isinstance(params_root, dict) and "vit" in params_root.get(
                "lora", {}
            ):
                log.warning(
                    "(!) VIT_CACHE ignored: LoRA adapters target the ViT"
                )
                return

        from ..data.vit_cache import attach_vit_cache

        self._ensure_params()
        params = self._resolve_params(self.state.params)
        encode = jax.jit(
            lambda p, pix: self.model.apply(
                {"params": p}, pix, method="encode_image"
            )
        )
        batch_size = int(c.get("VIT_CACHE_BATCH", 0) or c.EVAL_BATCH_SIZE)
        max_bytes = int(float(c.get("VIT_CACHE_MAX_GB", 8)) * 2**30)
        for attr in dataset_attrs:
            dataset = getattr(self, attr, None)
            if dataset is None:
                continue
            t0 = time.perf_counter()
            ok, reason = attach_vit_cache(
                dataset,
                lambda pix: encode(params, pix),
                batch_size,
                max_bytes,
            )
            log.info(
                f"# VIT_CACHE {attr}: "
                + (f"{reason} ({time.perf_counter() - t0:.1f}s)" if ok
                   else f"skipped — {reason}")
            )

    def _maybe_prefetch(self, iterator):
        """Background-thread prefetch when NUMWORKERS > 0 (the reference's
        DataLoader worker knob)."""
        if self.config.get("NUMWORKERS", 0):
            from ..data.loader import prefetch

            return prefetch(iterator, depth=max(2, int(self.config.NUMWORKERS)))
        return iterator

    def _shard(self, batch: dict, process_local: bool = False) -> dict:
        return shard_batch(self.mesh, batch, process_local=process_local)

    @property
    def n_devices(self) -> int:
        return len(jax.devices())
