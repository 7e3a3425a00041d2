"""LoRA parameter-efficient finetuning (framework addition; no reference
counterpart — the reference's only finetuning control is the all-or-nothing
encoder freeze, `/root/reference/core/executor/CustomizedLaTr_Executor.py:151-158`).

Design: adapters live in a tree that mirrors the targeted kernel paths, and
training state carries the composite ``{"base": <frozen params>, "lora":
<adapters>}``. The merged weight ``W + (alpha/rank) * A @ B`` is rebuilt
inside the jitted step (two tiny matmuls per target — XLA fuses the add into
the consumer), so NO model code changes: every family, the SCAN_LAYERS
stacked layout, TP sharding and grad accumulation compose unchanged.
Freezing the base rides the existing ``optax.multi_transform`` path, so the
optimizer allocates NO state for base params — the HBM win that makes large
effective batches affordable (measured in docs/DESIGN.md).

YAML knobs::

    LORA_RANK: 8          # > 0 activates LoRA
    LORA_ALPHA: 16        # scale numerator; default 2*rank
    LORA_TARGETS: attn    # attn (default) | all | [substring, ...]

``attn`` adapts every attention projection (T5 q/k/v/o, custom-decoder
q/k/v/out, ViT query/key/value/out); ``all`` additionally adapts the FFN
matmuls (wi*/wo, fc1/fc2, mlp dense).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

ATTN_MODULES = ("q", "k", "v", "o", "out", "query", "key", "value")
FFN_MODULES = ("wi", "wi_0", "wi_1", "wo", "fc1", "fc2", "lin1", "lin2")


@dataclass(frozen=True)
class LoraSpec:
    rank: int
    alpha: float
    targets: tuple

    @property
    def scale(self) -> float:
        return self.alpha / self.rank


def from_config(config) -> Optional[LoraSpec]:
    rank = int(config.get("LORA_RANK", 0) or 0)
    if rank <= 0:
        return None
    alpha = float(config.get("LORA_ALPHA", 2 * rank))
    raw = config.get("LORA_TARGETS", "attn")
    if isinstance(raw, str):
        if raw == "attn":
            targets = ATTN_MODULES
        elif raw == "all":
            targets = ATTN_MODULES + FFN_MODULES
        else:
            targets = tuple(t.strip() for t in raw.split(",") if t.strip())
    else:
        targets = tuple(raw)
    return LoraSpec(rank=rank, alpha=alpha, targets=targets)


def is_composite(params) -> bool:
    """True for the ``{"base", "lora"}`` split tree LoRA training carries."""
    return isinstance(params, dict) and set(params.keys()) == {"base", "lora"}


def _is_target(path, leaf, targets: Sequence[str]) -> bool:
    keys = [getattr(p, "key", str(p)) for p in path]
    if not keys or keys[-1] != "kernel":
        return False
    shape = np.shape(leaf)
    # 2-D kernels, or the SCAN_LAYERS (num_layers, in, out) stacked form
    if len(shape) == 2:
        module = keys[-2] if len(keys) >= 2 else ""
    elif len(shape) == 3 and any(k == "blocks" for k in keys):
        module = keys[-2] if len(keys) >= 2 else ""
    else:
        return False
    return module in targets


def init_lora(params, spec: LoraSpec, rng) -> dict:
    """Adapter tree mirroring the targeted kernels: each ``.../m/kernel`` of
    shape (..., in, out) becomes ``.../m/kernel: {"a": (..., in, r),
    "b": (..., r, out)}``. ``a`` is gaussian (1/sqrt(in)), ``b`` zeros — the
    merged model starts EXACTLY at the base model. Untargeted paths are
    absent from the tree (the optimizer sees only adapter leaves)."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    out: dict = {}
    n_target = 0
    for path, leaf in flat:
        if not _is_target(path, leaf, spec.targets):
            continue
        n_target += 1
        shape = np.shape(leaf)
        lead, d_in, d_out = shape[:-2], shape[-2], shape[-1]
        rng, sub = jax.random.split(rng)
        a = (
            jax.random.normal(sub, lead + (d_in, spec.rank), jnp.float32)
            / np.sqrt(d_in)
        )
        b = jnp.zeros(lead + (spec.rank, d_out), jnp.float32)
        node = out
        keys = [getattr(p, "key", str(p)) for p in path]
        for k in keys[:-1]:
            node = node.setdefault(k, {})
        node[keys[-1]] = {"a": a, "b": b}
    if n_target == 0:
        raise ValueError(
            f"LORA_TARGETS={spec.targets} matched no kernel in the model — "
            "check the module names (e.g. 'attn' covers q/k/v/o)"
        )
    return out


def merge_lora(base, lora, scale: float):
    """Full params: targeted kernels become ``W + scale * (A @ B)`` (batched
    matmul handles the scanned (L, in, r) @ (L, r, out) layout); everything
    else passes through by reference."""

    def walk(b, l):
        if isinstance(l, dict) and set(l.keys()) == {"a", "b"} and not isinstance(
            b, dict
        ):
            delta = jnp.matmul(
                l["a"].astype(jnp.float32), l["b"].astype(jnp.float32)
            )
            return (b + scale * delta).astype(b.dtype)
        return {
            k: walk(b[k], l[k]) if k in l else b[k] for k in b
        }

    return walk(base, lora)


def resolve(params, scale: float):
    """Composite -> merged full params; flat trees pass through untouched."""
    if is_composite(params):
        return merge_lora(params["base"], params["lora"], scale)
    return params


def unmatched_adapter_paths(base, lora) -> list:
    """Adapter leaves with no matching base kernel (path missing, or the
    (in, out) dims disagree — e.g. an adapter trained under the other
    SCAN_LAYERS layout or a different model family). ``merge_lora`` silently
    skips unmatched subtrees, so callers that accept external adapters
    (multi-adapter serving) must reject on a non-empty result instead of
    serving a half-applied model."""
    bad: list = []

    def walk(b, l, path):
        if isinstance(l, dict) and set(l.keys()) == {"a", "b"} and not isinstance(
            b, dict
        ):
            la, lb = np.shape(l["a"]), np.shape(l["b"])
            ok = (
                b is not None
                and np.shape(b)[:-2] == la[:-2]
                and np.shape(b)[-2] == la[-2]
                and np.shape(b)[-1] == lb[-1]
            )
            if not ok:
                bad.append(path)
            return
        for k in l:
            walk(
                b.get(k) if isinstance(b, dict) else None,
                l[k], f"{path}/{k}" if path else k,
            )

    walk(base, lora, "")
    return bad


def freeze_base_predicate(path) -> bool:
    """`build_optimizer` freeze predicate for the composite tree: every leaf
    under the top-level "base" key is frozen (optax allocates no state for
    it)."""
    return bool(path) and getattr(path[0], "key", str(path[0])) == "base"


def n_params(tree) -> int:
    return sum(int(np.prod(np.shape(x))) for x in jax.tree.leaves(tree))
