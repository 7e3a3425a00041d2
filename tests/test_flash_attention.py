"""Pallas fused attention vs the XLA reference (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from phoneme_vqa_tpu.ops.attention import reference_attention
from phoneme_vqa_tpu.ops.flash_attention import fused_attention


def _rand(shape, seed):
    return jnp.asarray(np.random.RandomState(seed).randn(*shape), jnp.float32)


@pytest.mark.parametrize("with_bias", [False, True])
@pytest.mark.parametrize("with_mask", [False, True])
@pytest.mark.parametrize("causal", [False, True])
def test_fused_matches_reference(with_bias, with_mask, causal):
    b, h, lq, lk, d = 2, 3, 17, 23, 8
    q, k, v = _rand((b, h, lq, d), 0), _rand((b, h, lk, d), 1), _rand((b, h, lk, d), 2)
    # causal only makes sense for self-attention (square)
    if causal:
        lk = lq
        k, v = _rand((b, h, lk, d), 1), _rand((b, h, lk, d), 2)
    bias = _rand((b, h, lq, lk), 3) if with_bias else None
    mask = None
    if with_mask:
        mask = jnp.asarray(np.random.RandomState(4).rand(b, lk) > 0.3, jnp.int32)
        mask = mask.at[:, 0].set(1)  # at least one key attendable

    want = reference_attention(q, k, v, bias, mask, causal=causal, scale=0.5)
    got = fused_attention(q, k, v, bias, mask, causal=causal, scale=0.5, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)


def test_fused_broadcast_bias():
    b, h, l, d = 2, 2, 9, 8
    q, k, v = _rand((b, h, l, d), 0), _rand((b, h, l, d), 1), _rand((b, h, l, d), 2)
    bias = _rand((1, h, l, l), 3)
    want = reference_attention(q, k, v, bias, None, scale=None)
    got = fused_attention(q, k, v, bias, None, scale=None, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)


def test_flash_custom_vjp_matches_reference_grad():
    from phoneme_vqa_tpu.ops import attention as attn_mod

    b, h, l, d = 1, 2, 16, 8
    q, k, v = _rand((b, h, l, d), 0), _rand((b, h, l, d), 1), _rand((b, h, l, d), 2)
    bias = _rand((1, h, l, l), 3)

    def loss_ref(q, k, v, bias):
        return jnp.sum(reference_attention(q, k, v, bias, None, True, 0.3) ** 2)

    # the custom-vjp wrapper's backward recomputes the reference path, so its
    # grads must match the reference exactly (forward uses interpret kernel)
    import phoneme_vqa_tpu.ops.flash_attention as fa

    orig = fa.fused_attention
    fa.fused_attention = lambda *a, **kw: orig(*a, **dict(kw, interpret=True))
    try:
        def loss_flash(q, k, v, bias):
            return jnp.sum(attn_mod._flash(q, k, v, bias, None, True, 0.3) ** 2)

        g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(q, k, v, bias)
        g_fl = jax.grad(loss_flash, argnums=(0, 1, 2, 3))(q, k, v, bias)
        for a, b_ in zip(g_ref, g_fl):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=1e-4, atol=1e-5)
    finally:
        fa.fused_attention = orig
