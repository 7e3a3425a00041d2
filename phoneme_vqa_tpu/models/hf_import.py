"""HF → flax parameter import for vit5-base (T5) and ViT.

The reference loads pretrained weights with
``T5ForConditionalGeneration.from_pretrained`` / ``ViTModel.from_pretrained``
(`/root/reference/core/model/LaTr.py:47-50`). In zero-egress environments the
weights may not exist; this module maps a *local* torch state_dict
(pytorch_model.bin / model.safetensors) onto our parameter tree. Unmapped
destination leaves keep their random init; a summary is logged.
"""

from __future__ import annotations

import os
from typing import Dict

import numpy as np

from ..utils.logger import get_logger

log = get_logger(__name__)


def _load_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a torch checkpoint directory or file into numpy arrays."""
    candidates = (
        [path]
        if os.path.isfile(path)
        else [
            os.path.join(path, n)
            for n in ("model.safetensors", "pytorch_model.bin")
            if os.path.isfile(os.path.join(path, n))
        ]
    )
    if not candidates:
        raise FileNotFoundError(f"no weights found under {path}")
    f = candidates[0]
    if f.endswith(".safetensors"):
        from safetensors.numpy import load_file

        return load_file(f)
    import torch

    sd = torch.load(f, map_location="cpu", weights_only=True)
    return {k: v.numpy() for k, v in sd.items()}


def _t5_block_map(prefix: str, i: int, decoder: bool) -> Dict[str, str]:
    """HF t5 block param names -> our module path names."""
    hf = f"{prefix}.block.{i}.layer"
    if not decoder:
        m = {
            f"{hf}.0.SelfAttention.q.weight": f"block_{i}/attn/q",
            f"{hf}.0.SelfAttention.k.weight": f"block_{i}/attn/k",
            f"{hf}.0.SelfAttention.v.weight": f"block_{i}/attn/v",
            f"{hf}.0.SelfAttention.o.weight": f"block_{i}/attn/o",
            f"{hf}.0.layer_norm.weight": f"block_{i}/ln0",
            f"{hf}.1.DenseReluDense.wi_0.weight": f"block_{i}/ffn/wi_0",
            f"{hf}.1.DenseReluDense.wi_1.weight": f"block_{i}/ffn/wi_1",
            f"{hf}.1.DenseReluDense.wi.weight": f"block_{i}/ffn/wi",
            f"{hf}.1.DenseReluDense.wo.weight": f"block_{i}/ffn/wo",
            f"{hf}.1.layer_norm.weight": f"block_{i}/ln1",
        }
    else:
        m = {
            f"{hf}.0.SelfAttention.q.weight": f"block_{i}/self_attn/q",
            f"{hf}.0.SelfAttention.k.weight": f"block_{i}/self_attn/k",
            f"{hf}.0.SelfAttention.v.weight": f"block_{i}/self_attn/v",
            f"{hf}.0.SelfAttention.o.weight": f"block_{i}/self_attn/o",
            f"{hf}.0.layer_norm.weight": f"block_{i}/ln0",
            f"{hf}.1.EncDecAttention.q.weight": f"block_{i}/cross_attn/q",
            f"{hf}.1.EncDecAttention.k.weight": f"block_{i}/cross_attn/k",
            f"{hf}.1.EncDecAttention.v.weight": f"block_{i}/cross_attn/v",
            f"{hf}.1.EncDecAttention.o.weight": f"block_{i}/cross_attn/o",
            f"{hf}.1.layer_norm.weight": f"block_{i}/ln1",
            f"{hf}.2.DenseReluDense.wi_0.weight": f"block_{i}/ffn/wi_0",
            f"{hf}.2.DenseReluDense.wi_1.weight": f"block_{i}/ffn/wi_1",
            f"{hf}.2.DenseReluDense.wi.weight": f"block_{i}/ffn/wi",
            f"{hf}.2.DenseReluDense.wo.weight": f"block_{i}/ffn/wo",
            f"{hf}.2.layer_norm.weight": f"block_{i}/ln2",
        }
    return m


def import_t5_params(t5_params: dict, sd: Dict[str, np.ndarray]) -> dict:
    """Map a HF T5 state_dict into our T5 param subtree (in place copy)."""
    import copy

    out = copy.deepcopy(t5_params)

    def put(path: str, value: np.ndarray):
        node = out
        parts = path.split("/")
        for p in parts[:-1]:
            if p not in node:
                return False
            node = node[p]
        leaf = parts[-1]
        if leaf not in node:
            return False
        target = node[leaf]
        if not isinstance(target, dict):
            return False
        key = next(
            (k for k in ("kernel", "embedding", "weight") if k in target), None
        )
        if key is None:
            return False
        tgt = target[key]
        # flax Dense kernels are (in, out); HF Linear weights are (out, in)
        v = value.T if (key == "kernel" and tgt.shape == value.T.shape) else value
        if tgt.shape != v.shape:
            return False
        target[key] = np.asarray(v, np.float32)
        return True

    hits = 0
    mapping = {
        "shared.weight": "shared",
        "encoder.final_layer_norm.weight": "encoder/final_ln",
        "decoder.final_layer_norm.weight": "decoder/final_ln",
        "encoder.block.0.layer.0.SelfAttention.relative_attention_bias.weight": "encoder/rel_bias/rel_embedding",
        "decoder.block.0.layer.0.SelfAttention.relative_attention_bias.weight": "decoder/rel_bias/rel_embedding",
        "lm_head.weight": "lm_head",
    }
    n_enc = len([k for k in t5_params["encoder"] if k.startswith("block_")])
    n_dec = len([k for k in t5_params["decoder"] if k.startswith("block_")])
    for i in range(n_enc):
        for hf_k, ours in _t5_block_map("encoder", i, decoder=False).items():
            mapping[hf_k] = f"encoder/{ours}"
    for i in range(n_dec):
        for hf_k, ours in _t5_block_map("decoder", i, decoder=True).items():
            mapping[hf_k] = f"decoder/{ours}"

    for hf_key, our_path in mapping.items():
        if hf_key in sd and put(our_path, sd[hf_key]):
            hits += 1

    # embeddings: flax nn.Embed stores under 'embedding'
    if "shared.weight" in sd:
        out["shared"]["embedding"] = np.asarray(sd["shared.weight"], np.float32)
        hits += 1
    log.info(f"T5 import: mapped {hits} tensors")
    return out


def import_vit_params(vit_params: dict, sd: Dict[str, np.ndarray]) -> dict:
    """Map a HF ViTModel state_dict into our ViT param subtree."""
    import copy

    out = copy.deepcopy(vit_params)

    def put(path, value):
        node = out
        parts = path.split("/")
        for p in parts[:-1]:
            node = node[p]
        node[parts[-1]] = np.asarray(value, np.float32)

    put("cls_token", sd["embeddings.cls_token"])
    put("position_embeddings", sd["embeddings.position_embeddings"])
    # torch conv (out, in, kh, kw) -> flax (kh, kw, in, out)
    put(
        "patch_embed/kernel",
        sd["embeddings.patch_embeddings.projection.weight"].transpose(2, 3, 1, 0),
    )
    put("patch_embed/bias", sd["embeddings.patch_embeddings.projection.bias"])
    put("final_ln/scale", sd["layernorm.weight"])
    put("final_ln/bias", sd["layernorm.bias"])

    n_layers = len([k for k in vit_params if k.startswith("block_")])
    for i in range(n_layers):
        hf = f"encoder.layer.{i}"
        pairs = {
            f"{hf}.attention.attention.query": f"block_{i}/attention/query",
            f"{hf}.attention.attention.key": f"block_{i}/attention/key",
            f"{hf}.attention.attention.value": f"block_{i}/attention/value",
            f"{hf}.attention.output.dense": f"block_{i}/attention/out",
            f"{hf}.intermediate.dense": f"block_{i}/fc1",
            f"{hf}.output.dense": f"block_{i}/fc2",
        }
        for hf_k, ours in pairs.items():
            put(f"{ours}/kernel", sd[f"{hf_k}.weight"].T)
            put(f"{ours}/bias", sd[f"{hf_k}.bias"])
        for hf_ln, ours_ln in (
            ("layernorm_before", "ln_before"),
            ("layernorm_after", "ln_after"),
        ):
            put(f"block_{i}/{ours_ln}/scale", sd[f"{hf}.{hf_ln}.weight"])
            put(f"block_{i}/{ours_ln}/bias", sd[f"{hf}.{hf_ln}.bias"])
    log.info(f"ViT import: mapped {n_layers} blocks + embeddings")
    return out


def import_latr_weights(params: dict, weights_root: str) -> dict:
    """weights_root may contain 't5/' and 'vit/' checkpoint dirs."""
    import copy

    out = copy.deepcopy(params)
    t5_dir = os.path.join(weights_root, "t5")
    if os.path.isdir(t5_dir):
        out["t5"] = import_t5_params(out["t5"], _load_state_dict(t5_dir))
    vit_dir = os.path.join(weights_root, "vit")
    if os.path.isdir(vit_dir) and "vit" in out:
        out["vit"] = import_vit_params(out["vit"], _load_state_dict(vit_dir))
    return out
