"""SaL 2D position bias numeric parity vs the reference torch modules.

Same embedding weights -> identical bias tensors, isolating each component:
the T5 1D sequence bias and the SCP grid bias (whose reference implementation
does a numpy round trip per batch; ours is a constant-table gather).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from phoneme_vqa_tpu.models.rel_bias_2d import Sal2DPositionBias

from .reference_loader import REFERENCE_ROOT, load_reference_package

needs_reference = pytest.mark.skipif(
    not os.path.isdir(REFERENCE_ROOT), reason="reference tree not mounted"
)

H = 4


def _our_bias(params, seq_len, coords, max_ques, max_ocr):
    mod = Sal2DPositionBias(num_heads=H)
    fused = mod.apply(params, seq_len, jnp.asarray(coords, jnp.float32), max_ques, max_ocr)
    return np.asarray(fused.materialize())


def _init_params(seq_len, coords):
    mod = Sal2DPositionBias(num_heads=H)
    return mod.init(
        jax.random.PRNGKey(0), seq_len, jnp.asarray(coords, jnp.float32), 0, coords.shape[1]
    )


@needs_reference
def test_scp_and_1d_bias_parity():
    import torch

    sal_utils = load_reference_package("core.model.modules.SaL_utils")

    rng = np.random.RandomState(0)
    b, l = 2, 6
    coords = rng.uniform(0.02, 0.97, (b, l, 4)).astype(np.float32)

    params = jax.tree.map(np.array, _init_params(l, coords))
    w1d = params["params"]["rel1d"]["embedding"]
    wscp = params["params"]["scp"]["embedding"]

    # reference modules on CPU with our weights
    ref_1d = sal_utils.RelativePositionBias1D(num_heads=H, device="cpu")
    ref_1d.relative_attention_bias.weight.data = torch.tensor(w1d)
    ref_scp = sal_utils.SCPRelativePositionBias(num_heads=H, device="cpu")
    ref_scp.relative_attention_bias.weight.data = torch.tensor(wscp)

    with torch.no_grad():
        want_1d = ref_1d(
            input_ids=torch.zeros((b, l), dtype=torch.long), attention_mask=None,
            coordinates=None,
        ).numpy()  # (1, H, L, L)
        want_scp = ref_scp(
            input_ids=None, attention_mask=None,
            coordinates=torch.tensor(coords),
        ).numpy()  # (B, H, L, L)

    # isolate 1D: zero the SCP table
    p_zero_scp = jax.tree.map(np.array, params)
    p_zero_scp["params"]["scp"]["embedding"][:] = 0.0
    got = _our_bias(p_zero_scp, l, coords, 0, l)
    # reference's aggregated forward repeats the 1D bias per batch and adds
    # the SCP block; with scp zeroed our full output equals the 1D bias
    np.testing.assert_allclose(got, np.repeat(want_1d, b, 0), rtol=1e-5, atol=1e-6)

    # isolate SCP: zero the 1D table; the [0:l, 0:l] block must equal SCP
    p_zero_1d = jax.tree.map(np.array, params)
    p_zero_1d["params"]["rel1d"]["embedding"][:] = 0.0
    got = _our_bias(p_zero_1d, l, coords, 0, l)
    np.testing.assert_allclose(got, want_scp, rtol=1e-5, atol=1e-6)
