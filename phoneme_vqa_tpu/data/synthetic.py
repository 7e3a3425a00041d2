"""Synthetic dataset fixtures: tiny qa CSVs + OCR/object/image .npy trees
matching the reference's on-disk formats (`/root/reference/core/data/utils.py`,
`LaTrDataset.py:40-42`, `SaLDataset.py:55-88`)."""

from __future__ import annotations

import os

import numpy as np
import pandas as pd

QUESTIONS = [
    "cái gì màu đỏ",
    "quán tên gì",
    "mấy giờ mở cửa",
    "địa chỉ ở đâu",
    "giá bao nhiêu",
    "số điện thoại là gì",
]
ANSWERS = [
    "biển hiệu",
    "quán phở hà nội",
    "7 giờ sáng",
    "số 5 nguyễn huệ",
    "30 nghìn đồng",
    "0123456789",
]
OCR_WORDS = [
    ["quán", "phở", "hà", "nội"],
    ["mở", "cửa", "7", "giờ"],
    ["số", "5", "nguyễn", "huệ"],
]


def make_latr_fixture(root, n_images: int = 3, n_rows: int = 12, image_hw: int = 32):
    """Creates ocr/ img/ dirs + train/val/predict CSVs. Returns dict of paths."""
    root = str(root)
    ocr_dir = os.path.join(root, "ocr")
    img_dir = os.path.join(root, "img")
    os.makedirs(ocr_dir, exist_ok=True)
    os.makedirs(img_dir, exist_ok=True)

    rng = np.random.RandomState(7)
    for i in range(n_images):
        words = OCR_WORDS[i % len(OCR_WORDS)]
        boxes = rng.uniform(0.05, 0.9, size=(len(words), 4))
        boxes[:, 2:] = np.clip(boxes[:, :2] + 0.05, 0, 0.999)  # x1>x0, y1>y0
        np.save(
            os.path.join(ocr_dir, f"{i}.npy"),
            {"texts": words, "boxes": boxes},
            allow_pickle=True,
        )
        img = rng.randn(1, 3, image_hw, image_hw).astype(np.float32)
        np.save(os.path.join(img_dir, f"{float(i)}.npy"), {"image": img},
                allow_pickle=True)

    rows = []
    for r in range(n_rows):
        rows.append(
            {
                "image_id": float(r % n_images),
                "question": QUESTIONS[r % len(QUESTIONS)],
                "answer": ANSWERS[r % len(ANSWERS)],
                "filename": f"{r % n_images}.jpg",
            }
        )
    df = pd.DataFrame(rows)
    paths = {}
    for split, sl in (("train", slice(0, n_rows)), ("val", slice(0, 6)),
                      ("predict", slice(0, 6))):
        p = os.path.join(root, f"qa_{split}.csv")
        df[sl].to_csv(p, index=False)
        paths[split] = p
    paths["ocr"] = ocr_dir
    paths["img"] = img_dir
    paths["root"] = root
    return paths


def make_sal_fixture(root, n_images: int = 3, n_rows: int = 12):
    """OCR feature dir (texts/boxes/det+rec features) + OBJ feature dir
    (object_list/region_boxes/height/width/region_features) + CSVs."""
    root = str(root)
    ocr_dir = os.path.join(root, "ocr_features")
    obj_dir = os.path.join(root, "obj_features")
    os.makedirs(ocr_dir, exist_ok=True)
    os.makedirs(obj_dir, exist_ok=True)

    rng = np.random.RandomState(11)
    for i in range(n_images):
        words = OCR_WORDS[i % len(OCR_WORDS)]
        boxes = rng.uniform(0.05, 0.85, size=(len(words), 4))
        boxes[:, 2:] = np.clip(boxes[:, :2] + 0.1, 0, 0.999)
        np.save(
            os.path.join(ocr_dir, f"{i}.npy"),
            {
                "texts": words,
                "boxes": boxes,
                "det_features": rng.randn(len(words), 256).astype(np.float32),
                "rec_features": rng.randn(len(words), 256).astype(np.float32),
            },
            allow_pickle=True,
        )
        objs = ["người", "xe", "bảng"][: 2 + i % 2]
        np.save(
            os.path.join(obj_dir, f"{i}.npy"),
            {
                "object_list": objs,
                "region_boxes": rng.uniform(10, 200, size=(len(objs), 4)),
                "height": 224,
                "width": 224,
                "region_features": rng.randn(len(objs), 64).astype(np.float32),
            },
            allow_pickle=True,
        )

    rows = []
    for r in range(n_rows):
        rows.append(
            {
                "image_id": float(r % n_images),
                "question": QUESTIONS[r % len(QUESTIONS)],
                "answer": ANSWERS[r % len(ANSWERS)],
                "filename": f"{r % n_images}.jpg",
            }
        )
    df = pd.DataFrame(rows)
    paths = {"ocr_features": ocr_dir, "obj_features": obj_dir, "root": root}
    for split, sl in (("train", slice(0, n_rows)), ("val", slice(0, 6)),
                      ("predict", slice(0, 6))):
        p = os.path.join(root, f"qa_{split}.csv")
        df[sl].to_csv(p, index=False)
        paths[split] = p
    return paths


def tiny_sal_yaml(paths, save_path, **overrides) -> str:
    import yaml

    cfg = {
        "EXECUTOR": "SaL_Executor",
        "DEVICE": "tpu",
        "SAVE": True,
        "SAVE_PATH": save_path,
        "LR": 1e-3,
        "BETAS": [0.9, 0.98],
        "warmup_step": 10,
        "NUM_EPOCHS": 1,
        "NUM_FREEZE_EPOCH": 0,
        "TRAIN_BATCH_SIZE": 8,
        "EVAL_BATCH_SIZE": 8,
        "PREDICT_BATCH_SIZE": 8,
        "max_predict_length": 10,
        "max_eval_length": 8,
        "get_predict_score": True,
        "max_ocr_element": 6,
        "max_ocr_length": 12,
        "max_obj_element": 4,
        "max_obj_length": 8,
        "max_q_length": 8,
        "max_a_length": 10,
        "base_ocr_feature_path": paths["ocr_features"],
        "base_obj_feature_path": paths["obj_features"],
        "qa_train_path": paths["train"],
        "qa_val_path": paths["val"],
        "qa_predict_path": paths["predict"],
        "context_token": "<c>",
        "NUMWORKERS": 0,
        "MODEL_CLASS": "SaL",
        "MODEL_MOD_CONFIG_CLASS": "SaL_config",
        "backbone_name": "VietAI/vit5-base",
        "ocr_hidden": 512,
        "obj_hidden": 64,
        "max_2d_position_embeddings": 1024,
        "t5_vocab_size": 512,
        "d_model": 32,
        "d_kv": 8,
        "num_heads": 4,
        "d_ff": 64,
        "num_encoder_layers": 2,
        "num_t5_decoder_layers": 2,
        "dropout_rate": 0.0,
        "DTYPE": "float32",
    }
    cfg.update(overrides)
    path = os.path.join(paths["root"], "tiny_sal.yaml")
    with open(path, "w", encoding="utf-8") as f:
        yaml.safe_dump(cfg, f)
    return path


def tiny_latr_yaml(paths, save_path, **overrides) -> str:
    """Writes a tiny LaTr YAML config pointing at the fixture."""
    import yaml

    cfg = {
        "EXECUTOR": "LaTr_Executor",
        "DEVICE": "tpu",
        "SAVE": True,
        "SAVE_PATH": save_path,
        "LR": 1e-3,
        "BETAS": [0.9, 0.98],
        "warmup_step": 10,
        "NUM_EPOCHS": 1,
        "TRAIN_BATCH_SIZE": 8,
        "EVAL_BATCH_SIZE": 8,
        "PREDICT_BATCH_SIZE": 8,
        "max_predict_length": 10,
        "max_eval_length": 8,
        "get_predict_score": True,
        "ocr_path": paths["ocr"],
        "max_ocr_element": 8,
        "max_ocr_length": 12,
        "max_q_length": 8,
        "max_a_length": 10,
        "base_img_path": paths["img"],
        "qa_train_path": paths["train"],
        "qa_val_path": paths["val"],
        "qa_predict_path": paths["predict"],
        "NUMWORKERS": 0,
        "MODEL_CLASS": "LaTr",
        "MODEL_MOD_CONFIG_CLASS": "LaTr_config",
        "backbone_name": "VietAI/vit5-base",
        "vit_model_name": "google/vit-base-patch16-224-in21k",
        "max_2d_position_embeddings": 1024,
        # tiny architecture (offline override keys)
        "t5_vocab_size": 512,
        "d_model": 32,
        "d_kv": 8,
        "num_heads": 4,
        "d_ff": 64,
        "num_encoder_layers": 2,
        "num_t5_decoder_layers": 2,
        "dropout_rate": 0.0,
        "vit_image_size": 32,
        "vit_patch_size": 16,
        "vit_hidden_size": 32,
        "vit_num_layers": 2,
        "vit_num_heads": 4,
        "vit_mlp_dim": 64,
        "DTYPE": "float32",
    }
    cfg.update(overrides)
    path = os.path.join(paths["root"], "tiny_latr.yaml")
    with open(path, "w", encoding="utf-8") as f:
        yaml.safe_dump(cfg, f)
    return path
