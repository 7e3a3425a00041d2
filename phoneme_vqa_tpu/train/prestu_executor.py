"""PreSTU executor (contract: /root/reference/core/executor/PreSTU_Executor.py:25)
— LaTr minus coordinates/OCR tensors; question⊕OCR fused input stream."""

from __future__ import annotations

from typing import Dict

import numpy as np

from ..data.prestu import PreSTUDataset
from ..utils.registry import EXECUTORS
from .latr_executor import LaTrExecutor


@EXECUTORS.register("PreSTU_Executor")
class PreSTUExecutor(LaTrExecutor):
    BATCH_KEYS = ("pixel_values", "input_ids", "src_attention_mask")
    DATASET_CLS = PreSTUDataset

    def _dummy_batch(self) -> Dict[str, np.ndarray]:
        c = self.config
        vit_hw = self.model_config.vit.image_size
        total = c.max_q_length + c.max_ocr_length
        return {
            "pixel_values": np.zeros((1, 3, vit_hw, vit_hw), np.float32),
            "input_ids": np.zeros((1, total), np.int32),
            "src_attention_mask": np.ones((1, total), np.int32),
        }
