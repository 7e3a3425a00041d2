"""Fused SaL-bias attention kernel: parity, gradients, and the full model
path (VERDICT r1 item 2 — the kernel the north star actually asked for).

Runs the pallas kernel through the interpreter on CPU; the same code path is
what executes on TPU hardware (where it is ON by default for the SaL family).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from phoneme_vqa_tpu.ops import sal_fused_attention as sfa
from phoneme_vqa_tpu.ops.sal_fused_attention import (
    SENTINEL,
    sal_attention,
    sal_fused_attention,
    sal_reference_attention,
)


def _inputs(b=3, h=4, l=37, d=16, seed=0, dtype=np.float32):
    rng = np.random.RandomState(seed)
    q = rng.randn(b, h, l, d).astype(dtype)
    k = rng.randn(b, h, l, d).astype(dtype)
    v = rng.randn(b, h, l, d).astype(dtype)
    bias1d = (rng.randn(h, l, l) * 0.5).astype(np.float32)
    cb = np.zeros((h, 122, 122), np.float32)
    cb[:, :121, :121] = (rng.randn(h, 121, 121) * 0.3).astype(np.float32)
    cell = rng.randint(0, 121, (b, l)).astype(np.int32)
    n_q = min(5, l // 3)
    cell[:, :n_q] = SENTINEL  # question block: no grid cell
    cell[:, l - max(1, l // 8):] = SENTINEL
    mask = np.ones((b, l), np.int32)
    if b > 1:
        mask[1, (3 * l) // 4:] = 0
    return tuple(map(jnp.asarray, (q, k, v, bias1d, cb, cell, mask)))


@pytest.mark.parametrize("shape", [(3, 4, 37, 16), (2, 2, 336, 64), (1, 3, 8, 24)])
def test_kernel_matches_reference(shape):
    args = _inputs(*shape)
    want = np.asarray(sal_reference_attention(*args))
    got = np.asarray(sal_fused_attention(*args, interpret=True))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_kernel_all_sentinel_equals_plain_1d_bias():
    """With no OCR cells at all, the kernel must reduce to 1D-bias attention."""
    from phoneme_vqa_tpu.ops.attention import reference_attention

    q, k, v, bias1d, cb, _, mask = _inputs()
    cell = jnp.full((q.shape[0], q.shape[2]), SENTINEL, jnp.int32)
    got = np.asarray(
        sal_fused_attention(q, k, v, bias1d, cb, cell, mask, interpret=True)
    )
    want = np.asarray(
        reference_attention(q, k, v, bias=bias1d[None], key_mask=mask.astype(bool))
    )
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_custom_vjp_grads_match_reference():
    """Kernel-forward / XLA-recompute-backward == pure XLA gradients,
    including the bias embedding tables (they are trained parameters)."""
    args = _inputs(b=2, h=2, l=21, d=8)
    q, k, v, bias1d, cb, cell, mask = args

    def loss_fused(q, k, v, b1, cb_):
        return jnp.sum(sal_attention(q, k, v, b1, cb_, cell, mask) ** 2)

    def loss_ref(q, k, v, b1, cb_):
        return jnp.sum(sal_reference_attention(q, k, v, b1, cb_, cell, mask) ** 2)

    sfa.set_interpret(True)
    try:
        g_fused = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4))(q, k, v, bias1d, cb)
    finally:
        sfa.set_interpret(False)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(q, k, v, bias1d, cb)
    for a, b, name in zip(g_fused, g_ref, ["dq", "dk", "dv", "dbias1d", "dcell_bias"]):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4, err_msg=name
        )


def test_sal_model_fused_path_matches_materialized():
    """Full SaL forward + greedy decode through the fused kernel (interpret)
    == the materialized-bias path: the production TPU path is numerically the
    path every CPU test validates."""
    from phoneme_vqa_tpu.models.generate import make_generate_fn

    from .test_parallel import _sal_model_and_batch

    model, params, batch = _sal_model_and_batch(b=4)
    gen = make_generate_fn(model, max_length=6)

    plain = np.asarray(jax.jit(gen)(params, batch))
    sfa.set_interpret(True)
    try:
        fused = np.asarray(gen(params, batch))  # unjitted: interpreter inside
    finally:
        sfa.set_interpret(False)
    np.testing.assert_array_equal(plain, fused)


def test_fused_bias_materialize_matches_legacy_formulation():
    """FusedSalBias.materialize == the direct (B, H, L, L) construction the
    module used to return (and the reference torch modules compute)."""
    from phoneme_vqa_tpu.models.rel_bias_2d import GRID, Sal2DPositionBias
    from phoneme_vqa_tpu.ops.rel_bias import relative_position_bucket

    h, b, l_ocr, seq = 4, 2, 6, 16
    max_ques = 4
    coords = jnp.asarray(
        np.random.RandomState(0).uniform(0.02, 0.97, (b, l_ocr, 4)), jnp.float32
    )
    mod = Sal2DPositionBias(num_heads=h)
    params = mod.init(jax.random.PRNGKey(0), seq, coords, max_ques, l_ocr)
    fused = mod.apply(params, seq, coords, max_ques, l_ocr)
    got = np.asarray(fused.materialize())

    # legacy direct construction
    w1d = np.asarray(params["params"]["rel1d"]["embedding"])
    wscp = np.asarray(params["params"]["scp"]["embedding"])
    pos = np.arange(seq)
    b1 = relative_position_bucket(
        jnp.asarray(pos[None] - pos[:, None]), True, 32, 128
    )
    bias = np.broadcast_to(
        w1d[np.asarray(b1)].transpose(2, 0, 1)[None], (b, h, seq, seq)
    ).copy()
    cx = np.asarray(coords[..., (0, 2)].mean(-1))
    cy = np.asarray(coords[..., (1, 3)].mean(-1))
    ix = np.clip(np.floor(cx * GRID).astype(int), 0, GRID - 1)
    iy = np.clip(np.floor(cy * GRID).astype(int), 0, GRID - 1)
    cell = ix * GRID + iy
    xs, ys = np.mgrid[0:GRID, 0:GRID]
    cells = np.stack([xs.ravel(), ys.ravel()], 1).astype(np.float64)
    table = (np.sqrt(((cells[:, None] - cells[None]) ** 2).sum(-1)) * 5).astype(
        np.int32
    )
    dist = table[cell[:, :, None], cell[:, None, :]]
    bscp = np.asarray(relative_position_bucket(jnp.asarray(dist), True, 32, 100))
    sl = slice(max_ques, max_ques + l_ocr)
    bias[:, :, sl, sl] += wscp[bscp].transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, bias, rtol=1e-6, atol=1e-6)


@pytest.mark.slow
def test_trained_weights_fused_agreement(tmp_path):
    """Fused vs materialized agreement at TRAINED weights, through the real
    executor decode (VERDICT r2: the 93%-at-random-init bf16 number must not
    be the only end-to-end signal). A tiny SaL trained to memorization emits
    IDENTICAL answer strings through both paths — at converged weights the
    logit argmax has real margins, so path agreement is a hard gate."""
    import os

    from phoneme_vqa_tpu import registry_setup  # noqa: F401
    from phoneme_vqa_tpu.config import get_config
    from phoneme_vqa_tpu.data.synthetic import make_sal_fixture, tiny_sal_yaml
    from phoneme_vqa_tpu.utils.registry import EXECUTORS

    paths = make_sal_fixture(str(tmp_path), n_rows=96)
    yaml_path = tiny_sal_yaml(
        paths, os.path.join(str(tmp_path), "ck"), NUM_EPOCHS=1, SAVE=False,
        LR=3e-3, TRAIN_BATCH_SIZE=8, dropout_rate=0.0,
    )
    config = get_config(yaml_path)
    ex = EXECUTORS.get(config.EXECUTOR)(config, mode="train")
    losses = [ex._train_epoch(epoch) for epoch in range(1, 17)]
    assert losses[-1] < losses[0] * 0.5, losses  # acc == 1.0 is the real gate

    gens_mat = ex.infer(ex.val_data, 8, 8)  # CPU w/o interpret: materialized
    ex._generate_fns.clear()  # drop the cached executable traced w/o kernel
    sfa.set_interpret(True)
    try:
        gens_fused = ex.infer(ex.val_data, 8, 8)
    finally:
        sfa.set_interpret(False)
        ex._generate_fns.clear()
    answers = [str(a) for a in ex.val_answer]
    acc = sum(g == a for g, a in zip(gens_mat, answers)) / len(answers)
    assert acc == 1.0, list(zip(gens_mat, answers))
    assert gens_fused == gens_mat
