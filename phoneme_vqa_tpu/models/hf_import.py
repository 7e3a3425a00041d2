"""HF → flax parameter import for vit5-base (T5) and ViT.

The reference loads pretrained weights with
``T5ForConditionalGeneration.from_pretrained`` / ``ViTModel.from_pretrained``
(`/root/reference/core/model/LaTr.py:47-50`). In zero-egress environments the
weights may not exist; this module maps a *local* torch state_dict
(pytorch_model.bin / model.safetensors) onto our parameter tree. Unmapped
destination leaves keep their random init; a summary is logged.
"""

from __future__ import annotations

import dataclasses
import functools
import os
from typing import Dict, List, Tuple

import numpy as np

from ..utils.logger import get_logger
from .scan_utils import (
    has_scanned_blocks,
    stack_block_params,
    unstack_block_params,
)

log = get_logger(__name__)


def _scan_agnostic(fn):
    """Accept the target param subtree in either layer layout (``SCAN_LAYERS``):
    the by-name import walks ``block_{i}`` paths, so a scanned tree is
    unstacked first and restacked after."""

    @functools.wraps(fn)
    def wrapped(params, *a, **kw):
        if has_scanned_blocks(params):
            return stack_block_params(fn(unstack_block_params(params), *a, **kw))
        return fn(params, *a, **kw)

    return wrapped


@dataclasses.dataclass
class ImportReport:
    """Every HF key's fate, so a partial import can never pass silently.

    * ``mapped``      — HF keys copied into the tree
    * ``failed``      — (hf_key, reason) pairs: shape mismatch / missing dest
    * ``unused``      — HF keys present in the checkpoint but not in our map
    """

    mapped: List[str] = dataclasses.field(default_factory=list)
    failed: List[Tuple[str, str]] = dataclasses.field(default_factory=list)
    unused: List[str] = dataclasses.field(default_factory=list)

    def merge(self, other: "ImportReport") -> None:
        self.mapped += other.mapped
        self.failed += other.failed
        self.unused += other.unused

    def log_summary(self, what: str) -> None:
        log.info(f"{what} import: mapped {len(self.mapped)} tensors")
        for key, reason in self.failed:
            log.warning(f"{what} import FAILED for {key!r}: {reason}")
        if self.unused:
            log.warning(
                f"{what} import: {len(self.unused)} checkpoint tensors unused "
                f"(first few: {self.unused[:5]})"
            )

    def raise_if_failed(self, what: str) -> None:
        if self.failed:
            lines = "\n".join(f"  {k}: {r}" for k, r in self.failed)
            raise ValueError(f"{what} weight import failed for:\n{lines}")


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


@_scan_agnostic
def import_t5_params(
    t5_params: dict,
    sd: Dict[str, np.ndarray],
    strict: bool = False,
    report: ImportReport = None,
) -> dict:
    """Map a HF T5 state_dict into our T5 param subtree (in place copy).

    Loud by design: every key that cannot be placed (missing destination,
    shape mismatch — e.g. SaL's +1 context-token vocab row vs a stock
    checkpoint's ``shared.weight``) is logged as a WARNING and recorded in
    ``report.failed``; ``strict=True`` raises instead."""
    import copy

    out = copy.deepcopy(t5_params)
    rep = report if report is not None else ImportReport()

    def put(path: str, value: np.ndarray) -> str:
        """Returns '' on success, else a failure reason."""
        node = out
        parts = path.split("/")
        for p in parts[:-1]:
            if p not in node:
                return f"no destination module {p!r} on path {path!r}"
            node = node[p]
        leaf = parts[-1]
        if leaf not in node:
            return f"no destination leaf {leaf!r} on path {path!r}"
        target = node[leaf]
        if not isinstance(target, dict):
            return f"destination {path!r} is not a module"
        key = next(
            (k for k in ("kernel", "embedding", "weight") if k in target), None
        )
        if key is None:
            return f"destination {path!r} has no kernel/embedding/weight"
        tgt = target[key]
        # flax Dense kernels are (in, out); HF Linear weights are (out, in)
        v = value.T if (key == "kernel" and tgt.shape == value.T.shape) else value
        if tgt.shape != v.shape:
            return (
                f"shape mismatch at {path!r}: ours {tuple(tgt.shape)} vs "
                f"checkpoint {tuple(v.shape)}"
            )
        target[key] = np.asarray(v, np.float32)
        return ""
    mapping = {
        "shared.weight": "shared",
        "encoder.final_layer_norm.weight": "encoder/final_ln",
        "decoder.final_layer_norm.weight": "decoder/final_ln",
        "encoder.block.0.layer.0.SelfAttention.relative_attention_bias.weight": "encoder/rel_bias/rel_embedding",
        "decoder.block.0.layer.0.SelfAttention.relative_attention_bias.weight": "decoder/rel_bias/rel_embedding",
    }
    # tied models re-export shared.weight as lm_head.weight; only map it when
    # we actually carry a separate head
    if "lm_head" in t5_params:
        mapping["lm_head.weight"] = "lm_head"
    # encoder-only models (Customized*/Phoneme* families replace the T5
    # decoder with a custom one) never materialize a "decoder" subtree
    def _n_blocks(stack: str) -> int:
        return len([k for k in t5_params.get(stack, ()) if k.startswith("block_")])

    n_enc = _n_blocks("encoder")
    n_dec = _n_blocks("decoder")
    for i in range(n_enc):
        for hf_k, ours in _t5_block_map("encoder", i, decoder=False).items():
            mapping[hf_k] = f"encoder/{ours}"
    for i in range(n_dec):
        for hf_k, ours in _t5_block_map("decoder", i, decoder=True).items():
            mapping[hf_k] = f"decoder/{ours}"

    for hf_key, our_path in mapping.items():
        if hf_key not in sd:
            continue
        reason = put(our_path, sd[hf_key])
        if reason:
            rep.failed.append((hf_key, reason))
        else:
            rep.mapped.append(hf_key)

    mapped_set = set(mapping)
    rep.unused += [
        k for k in sd
        if k not in mapped_set
        # HF T5 ties lm_head to shared and re-exports both spellings
        and k not in ("encoder.embed_tokens.weight", "decoder.embed_tokens.weight",
                      "lm_head.weight")
    ]
    if report is None:
        rep.log_summary("T5")
    if strict:
        rep.raise_if_failed("T5")
    return out


@_scan_agnostic
def import_vit_params(
    vit_params: dict,
    sd: Dict[str, np.ndarray],
    strict: bool = False,
    report: ImportReport = None,
) -> dict:
    """Map a HF ViTModel state_dict into our ViT param subtree."""
    import copy

    out = copy.deepcopy(vit_params)
    rep = report if report is not None else ImportReport()

    def put(path, value):
        node = out
        parts = path.split("/")
        try:
            for p in parts[:-1]:
                node = node[p]
            tgt = node[parts[-1]]
        except (KeyError, TypeError):
            rep.failed.append((path, f"no destination {path!r}"))
            return
        if tuple(np.shape(tgt)) != tuple(np.shape(value)):
            rep.failed.append(
                (path,
                 f"shape mismatch at {path!r}: ours {tuple(np.shape(tgt))} vs "
                 f"checkpoint {tuple(np.shape(value))}")
            )
            return
        node[parts[-1]] = np.asarray(value, np.float32)
        rep.mapped.append(path)

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
    if report is None:
        rep.log_summary("ViT")
    if strict:
        rep.raise_if_failed("ViT")
    return out


def import_latr_weights(
    params: dict, weights_root: str, strict: bool = False
) -> dict:
    """weights_root may contain 't5/' and 'vit/' checkpoint dirs."""
    import copy

    out = copy.deepcopy(params)
    report = ImportReport()
    t5_dir = os.path.join(weights_root, "t5")
    if os.path.isdir(t5_dir):
        out["t5"] = import_t5_params(
            out["t5"], _load_state_dict(t5_dir), report=report
        )
    vit_dir = os.path.isdir(os.path.join(weights_root, "vit"))
    if vit_dir and "vit" in out:
        out["vit"] = import_vit_params(
            out["vit"], _load_state_dict(os.path.join(weights_root, "vit")),
            report=report,
        )
    report.log_summary("LaTr weights")
    if strict:
        report.raise_if_failed("LaTr weights")
    return out


# ---------------------------------------------------------------------------
# Reference-checkpoint import (migration path from hieunghia-pat/phoneme-VQA)
# ---------------------------------------------------------------------------

def import_torch_decoder_layers(
    dec_params: dict, sd: Dict[str, np.ndarray], prefix: str,
    report: ImportReport,
) -> None:
    """torch ``nn.TransformerDecoder`` layer state dict -> our CustomDecoder
    layer params (packed in_proj qkv split three ways, post-LN norms).
    ``prefix`` addresses the layer list, e.g. ``decoder.decoder.layers``."""
    def _set(dst, leaf, key, value):
        # shape-checked f32 assignment, like every other import path
        if tuple(np.shape(dst.get(leaf))) != tuple(value.shape):
            report.failed.append(
                (key, f"shape {value.shape} != ours {np.shape(dst.get(leaf))}")
            )
        else:
            dst[leaf] = np.asarray(value, np.float32)
            report.mapped.append(key)

    i = 0
    while f"{prefix}.{i}.self_attn.in_proj_weight" in sd:
        dst = dec_params.get(f"layer_{i}")
        if dst is None:
            report.failed.append(
                (f"{prefix}.{i}", f"our decoder has no layer_{i}")
            )
            i += 1
            continue
        d_model = sd[f"{prefix}.{i}.self_attn.in_proj_weight"].shape[1]
        for src, name in (("self_attn", "self_attn"), ("multihead_attn", "cross_attn")):
            w = sd[f"{prefix}.{i}.{src}.in_proj_weight"]
            b = sd[f"{prefix}.{i}.{src}.in_proj_bias"]
            for j, proj in enumerate(("q", "k", "v")):
                _set(dst[name][proj], "kernel", f"{prefix}.{i}.{src}.{proj}",
                     w[j * d_model : (j + 1) * d_model].T)
                _set(dst[name][proj], "bias", f"{prefix}.{i}.{src}.{proj}.b",
                     b[j * d_model : (j + 1) * d_model])
            _set(dst[name]["out"], "kernel", f"{prefix}.{i}.{src}.out_proj.weight",
                 sd[f"{prefix}.{i}.{src}.out_proj.weight"].T)
            _set(dst[name]["out"], "bias", f"{prefix}.{i}.{src}.out_proj.bias",
                 sd[f"{prefix}.{i}.{src}.out_proj.bias"])
        _set(dst["fc1"], "kernel", f"{prefix}.{i}.linear1.weight",
             sd[f"{prefix}.{i}.linear1.weight"].T)
        _set(dst["fc1"], "bias", f"{prefix}.{i}.linear1.bias",
             sd[f"{prefix}.{i}.linear1.bias"])
        _set(dst["fc2"], "kernel", f"{prefix}.{i}.linear2.weight",
             sd[f"{prefix}.{i}.linear2.weight"].T)
        _set(dst["fc2"], "bias", f"{prefix}.{i}.linear2.bias",
             sd[f"{prefix}.{i}.linear2.bias"])
        for k, ln in (("ln1", "norm1"), ("ln2", "norm2"), ("ln3", "norm3")):
            _set(dst[k], "scale", f"{prefix}.{i}.{ln}.weight", sd[f"{prefix}.{i}.{ln}.weight"])
            _set(dst[k], "bias", f"{prefix}.{i}.{ln}.bias", sd[f"{prefix}.{i}.{ln}.bias"])
        i += 1


_SPATIAL_TABLE_ORDER = (
    "top_left_x", "top_left_y", "bottom_right_x", "bottom_right_y",
    "width_emb", "height_emb",
)


@_scan_agnostic
def import_reference_state_dict(
    params: dict, sd: Dict[str, np.ndarray], report: ImportReport = None
) -> dict:
    """Map a REFERENCE model ``state_dict()`` (any of the nine families,
    `/root/reference/core/model/*.py`) into our param tree by prefix routing:

    * ``backbone.`` (stock HF T5 / T52d) or ``encoder.`` (Customized/Phoneme
      encoder-only T5) -> ``import_t5_params``
    * ``vit.`` -> ``import_vit_params``
    * ``visual_projector`` / ``spatial_feat_extractor`` (LaTr families)
    * ``rel2Dbias`` + per-stream projectors/norms (SaL families)
    * ``tgt_tok_emb`` / ``lm_head`` / ``decoder.decoder.layers`` (custom
      decoder families; a plain-``nn.Embedding`` tgt_tok_emb — PhonemeSaL —
      is reparameterized into our sqrt(d)-scaled embedding)

    Returns a new tree; every checkpoint tensor's fate lands in ``report``.
    """
    import copy

    out = copy.deepcopy(params)
    rep = report if report is not None else ImportReport()
    sd = {k: np.asarray(v) for k, v in sd.items()}

    def group(prefix):
        pl = prefix + "."
        return {k[len(pl):]: v for k, v in sd.items() if k.startswith(pl)}

    t5_sd = group("backbone") or group("encoder")
    if t5_sd:
        if "rel2Dbias.Relative1D.relative_attention_bias.weight" in sd:
            # SaL families inject the 2D bias; the encoder's own layer-0
            # relative bias exists in the checkpoint but is never used
            t5_sd.pop(
                "encoder.block.0.layer.0.SelfAttention"
                ".relative_attention_bias.weight",
                None,
            )
        out["t5"] = import_t5_params(out["t5"], t5_sd, report=rep)
    vit_sd = group("vit")
    if vit_sd and "vit" in out:
        out["vit"] = import_vit_params(out["vit"], vit_sd, report=rep)
    elif vit_sd:
        rep.failed.append(
            ("vit.*", f"checkpoint has {len(vit_sd)} ViT tensors but our "
                      "model has no vit subtree (wrong --config-file family?)")
        )

    def put(dst_path, key, value):
        node = out
        for p in dst_path[:-1]:
            node = node.get(p)
            if node is None:
                rep.failed.append((key, f"no destination {'/'.join(dst_path)}"))
                return
        leaf = dst_path[-1]
        if leaf not in node:
            rep.failed.append((key, f"no destination {'/'.join(dst_path)}"))
        elif tuple(np.shape(node[leaf])) != tuple(value.shape):
            rep.failed.append(
                (key, f"shape {value.shape} != ours {np.shape(node[leaf])}")
            )
        else:
            node[leaf] = value.astype(np.float32)
            rep.mapped.append(key)

    if "visual_projector.weight" in sd:
        put(("visual_projector", "kernel"), "visual_projector.weight",
            sd["visual_projector.weight"].T)
        put(("visual_projector", "bias"), "visual_projector.bias",
            sd["visual_projector.bias"])
    if "spatial_feat_extractor.top_left_x.weight" in sd:
        tables = np.stack(
            [sd[f"spatial_feat_extractor.{n}.weight"] for n in _SPATIAL_TABLE_ORDER]
        )
        put(("spatial", "tables"), "spatial_feat_extractor.*", tables)
    if "rel2Dbias.Relative1D.relative_attention_bias.weight" in sd:
        put(("rel2d", "rel1d", "embedding"),
            "rel2Dbias.Relative1D.relative_attention_bias.weight",
            sd["rel2Dbias.Relative1D.relative_attention_bias.weight"])
        put(("rel2d", "scp", "embedding"),
            "rel2Dbias.SCP.relative_attention_bias.weight",
            sd["rel2Dbias.SCP.relative_attention_bias.weight"])
    for stream in ("ocr", "obj"):
        if f"{stream}_feature_projector.weight" not in sd:
            continue
        put((f"{stream}_feature_projector", "kernel"),
            f"{stream}_feature_projector.weight",
            sd[f"{stream}_feature_projector.weight"].T)
        put((f"{stream}_feature_projector", "bias"),
            f"{stream}_feature_projector.bias",
            sd[f"{stream}_feature_projector.bias"])
        put((f"{stream}_bbox_projector", "kernel"),
            f"{stream}_bbox_projector.weight",
            sd[f"{stream}_bbox_projector.weight"].T)
        put((f"{stream}_bbox_projector", "bias"),
            f"{stream}_bbox_projector.bias",
            sd[f"{stream}_bbox_projector.bias"])
        put((f"{stream}_norm", "weight"),
            f"{stream}_feature_layer_norm.weight",
            sd[f"{stream}_feature_layer_norm.weight"])

    dec = out.get("decoder")
    dec_keys = [
        k for k in sd
        if k.startswith(("tgt_tok_emb.", "lm_head.", "decoder."))
    ]
    if dec is None and dec_keys:
        rep.failed.append(
            ("decoder.*", f"checkpoint has {len(dec_keys)} custom-decoder "
                          "tensors but our model has no decoder subtree "
                          "(wrong --config-file family?)")
        )
    if dec is not None:
        if "tgt_tok_emb.embedding.weight" in sd:  # sqrt(d)-scaled TokenEmbedding
            put(("decoder", "embed", "embedding"), "tgt_tok_emb.embedding.weight",
                sd["tgt_tok_emb.embedding.weight"])
        elif "tgt_tok_emb.weight" in sd:  # plain nn.Embedding (PhonemeSaL):
            # our embed is sqrt(d)-scaled — import weight/sqrt(d) for equality
            w = sd["tgt_tok_emb.weight"]
            put(("decoder", "embed", "embedding"), "tgt_tok_emb.weight",
                w / np.sqrt(w.shape[1]))
        if "lm_head.weight" in sd:
            put(("decoder", "lm_head", "kernel"), "lm_head.weight",
                sd["lm_head.weight"].T)
            put(("decoder", "lm_head", "bias"), "lm_head.bias", sd["lm_head.bias"])
        import_torch_decoder_layers(dec, sd, "decoder.decoder.layers", rep)

    if report is None:
        rep.log_summary("reference checkpoint")
    return out
