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

import itertools
import json
import os
import time
from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from .. import evaluation
from ..parallel.mesh import create_mesh, shard_batch
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
        self.mesh = create_mesh()
        self._generate_fns: Dict = {}

        if mode == "train":
            self._create_data_utils()
            self._build_model()
            self._init_training_properties()
        elif mode in ("eval", "predict"):
            self._init_eval_predict_mode()
            self._build_model()
        else:
            raise ValueError(f"unknown mode {mode!r}")

    # -- subclass hooks -------------------------------------------------------

    def _create_data_utils(self):
        raise NotImplementedError

    def _init_eval_predict_mode(self):
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

        best_epoch, best_acc = 0, 0.0
        log.info("#----------- START TRAINING -----------------#")
        t_start = time.perf_counter()
        start_epoch = int(self.state.epoch)

        for epoch in range(start_epoch + 1, self.config.NUM_EPOCHS + 1):
            t_ep = time.perf_counter()
            train_loss = self._train_epoch(epoch)
            scores = self._evaluate_metrics()
            acc = scores["Accuracy"]
            log.info(
                f"Epoch {epoch}: loss={train_loss:.4f} "
                f"({time.perf_counter() - t_ep:.1f}s) {scores}"
            )
            if acc > best_acc:
                best_acc, best_epoch = acc, epoch

            self.state = self.state.replace(epoch=epoch)
            if self.config.SAVE:
                # the reference saves best only on strict improvement
                # (base_executor.py:100); we additionally seed best_ckp on the
                # first epoch so predict-from-best is never unlaunchable
                if acc > self.best_score or not self.ckpt.exists("best"):
                    self.best_score = max(self.best_score, acc)
                    self._save_checkpoint("best")
                self._save_checkpoint("last")

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
        scores = self._evaluate_metrics()
        log.info("\t#EVALUATION:\n")
        log.info(scores)
        return scores

    def predict(self):
        log.info("###Predict Mode###")
        self._load_trained_checkpoint(self.predicttype)
        log.info("## START PREDICTING ... ")

        if self.config.get_predict_score:
            results, scores = self._evaluate_metrics(return_results=True)
            log.info("\t#PREDICTION:\n")
            log.info(f"\t{scores}")
        else:
            preds = self.infer(
                self.predict_data, self.config.PREDICT_BATCH_SIZE,
                self.config.max_predict_length,
            )
            results = [{"gens": p} for p in preds]

        out_dir = self.config.SAVE_PATH or "."
        out_path = os.path.join(out_dir, "results.json")
        with open(out_path, "w", encoding="utf-8") as f:
            json.dump(results, f, ensure_ascii=False, indent=4)
        log.info("Saved Results !")
        return results

    # -- metrics ---------------------------------------------------------------

    def _evaluate_metrics(self, return_results: bool = False):
        if self.mode == "predict":
            preds = self.infer(
                self.predict_data, self.config.PREDICT_BATCH_SIZE,
                self.config.max_predict_length,
            )
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
            return results, score
        return score

    # -- checkpointing -----------------------------------------------------------

    def _ckpt_tree(self):
        return {
            "params": self.state.params,
            "opt_state": self.state.opt_state,
            "step": np.asarray(self.state.step, np.int64),
            "epoch": np.asarray(self.state.epoch, np.int64),
            "best_score": np.asarray(self.best_score, np.float32),
        }

    def _save_checkpoint(self, name: str):
        self.ckpt.save(name, self._ckpt_tree())

    def _maybe_resume(self):
        """Auto-resume full training state from last_ckp if present
        (reference: base_executor.py:174-184)."""
        if self.ckpt.exists("last"):
            restored = self.ckpt.restore("last", self._ckpt_tree())
            self.state = self.state.replace(
                params=restored["params"],
                opt_state=restored["opt_state"],
                step=int(restored["step"]),
                epoch=int(restored["epoch"]),
            )
            self.best_score = float(restored["best_score"])
            log.info(f"###Resumed from last_ckp (epoch {int(self.state.epoch)})")

    def _load_trained_checkpoint(self, loadtype: str):
        """Eval/predict: restore params only (no optimizer template needed)."""
        restored = self.ckpt.restore_raw(loadtype)
        params = jax.tree.map(jnp.asarray, restored["params"])
        self.state = self.state.replace(params=params)
        self.best_score = float(restored["best_score"])

    # -- helpers ------------------------------------------------------------------

    def _shard(self, batch: dict) -> dict:
        return shard_batch(self.mesh, batch)

    @property
    def n_devices(self) -> int:
        return len(jax.devices())
