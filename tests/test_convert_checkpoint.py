"""Checkpoint-converter fidelity: instantiate the REAL reference torch modules
(CPU, stubbed deps), take their state_dicts, convert, and check every tensor
lands in our flax tree with matching shape."""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from flax import traverse_util

from autofocusformermod_tpu.engine.convert_checkpoint import (
    convert_reference_state_dict,
)

HAS_REF = os.path.isdir("/root/reference/mask2former")


def _to_numpy_sd(module, prefix=""):
    return {prefix + k: v.detach().numpy() for k, v in module.state_dict().items()}


@pytest.fixture(scope="module")
def ref():
    from reference_models import load_reference_modules

    return load_reference_modules()


@pytest.mark.skipif(not HAS_REF, reason="reference absent")
def test_backbone_conversion_covers_flax_tree(ref):
    import torch

    torch.manual_seed(0)
    # AFF-Mini-ish dims, 1 block per stage for speed
    ref_bb = ref["aff"].AFF(
        embed_dim=[32, 128, 256, 384],
        depths=[1, 1, 1, 1],
        num_heads=[2, 4, 8, 16],
        mlp_ratio=2.0,
    )
    sd = _to_numpy_sd(ref_bb, "backbone.")
    params, stats = convert_reference_state_dict(sd)

    from autofocusformermod_tpu.models.aff import AFF

    model = AFF(
        embed_dim=(32, 128, 256, 384),
        depths=(1, 1, 1, 1),
        num_heads=(2, 4, 8, 16),
        mlp_ratio=2.0,
        drop_path_rate=0.0,
        use_pallas=False,
    )
    x = jnp.zeros((1, 128, 128, 3))  # keep n > nbhd at all downsample stages
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    flat = traverse_util.flatten_dict({"backbone": variables["params"]})
    flat_bs = traverse_util.flatten_dict({"backbone": variables["batch_stats"]})

    missing = [k for k in flat if k not in params]
    assert not missing, f"flax params not covered by converter: {missing[:10]}"
    for k in flat:
        assert flat[k].shape == params[k].shape, (
            k, flat[k].shape, params[k].shape
        )
    for k in flat_bs:
        assert k in stats and flat_bs[k].shape == stats[k].shape

    extra = [k for k in params if k not in flat]
    assert not extra, f"converted tensors with no flax home: {extra[:10]}"


@pytest.mark.skipif(not HAS_REF, reason="reference absent")
def test_decoder_conversion_covers_flax_tree(ref):
    import torch

    torch.manual_seed(0)
    ref_dec = ref["decoder"].MultiScaleMaskedTransformerDecoder(
        in_channels=64,
        num_classes=7,
        hidden_dim=64,
        num_queries=5,
        nheads=2,
        dim_feedforward=64,
        dec_layers=3,
        pre_norm=False,
        mask_dim=64,
        enforce_input_project=False,
    )
    sd = _to_numpy_sd(ref_dec, "sem_seg_head.predictor.")
    params, _ = convert_reference_state_dict(sd)

    from autofocusformermod_tpu.models.transformer_decoder import (
        MultiScaleMaskedTransformerDecoder,
    )

    model = MultiScaleMaskedTransformerDecoder(
        in_channels=64, num_classes=7, hidden_dim=64, num_queries=5, nheads=2,
        dim_feedforward=64, dec_layers=3, mask_dim=64,
    )
    n = 64
    x = [jnp.zeros((1, n, 64))] * 3
    pos = [jnp.zeros((1, n, 2))] * 3
    mf = jnp.zeros((1, n, 64))
    variables = model.init(
        jax.random.PRNGKey(0), x, pos, mf, pos[0], (8, 8), True
    )
    flat = traverse_util.flatten_dict({"head": {"predictor": variables["params"]}})

    missing = [k for k in flat if k not in params]
    assert not missing, f"missing: {missing[:10]}"
    for k in flat:
        assert flat[k].shape == params[k].shape, (k, flat[k].shape, params[k].shape)


@pytest.mark.skipif(not HAS_REF, reason="reference absent")
def test_pixel_decoder_conversion_covers_flax_tree(ref):
    import torch

    torch.manual_seed(0)
    ShapeSpec = __import__("sys").modules["detectron2.layers"].ShapeSpec
    input_shape = {
        "res2": ShapeSpec(channels=32, stride=4),
        "res3": ShapeSpec(channels=48, stride=8),
        "res4": ShapeSpec(channels=56, stride=16),
        "res5": ShapeSpec(channels=64, stride=32),
    }
    ref_pd = ref["pixel_decoder"].MSDeformAttnPixelDecoder(
        input_shape=input_shape,
        transformer_dropout=0.0,
        transformer_nheads=2,
        transformer_dim_feedforward=64,
        transformer_enc_layers=2,
        conv_dim=32,
        mask_dim=32,
        norm="GN",
        transformer_in_features=["res3", "res4", "res5"],
        common_stride=4,
        shepard_power=3.0,
        shepard_power_learnable=True,
    )
    sd = _to_numpy_sd(ref_pd, "sem_seg_head.pixel_decoder.")
    params, _ = convert_reference_state_dict(sd)

    from autofocusformermod_tpu.models.pixel_decoder import MSDeformAttnPixelDecoder

    model = MSDeformAttnPixelDecoder(
        in_features=("res2", "res3", "res4", "res5"),
        transformer_in_features=("res3", "res4", "res5"),
        conv_dim=32,
        mask_dim=32,
        transformer_nheads=2,
        transformer_dim_feedforward=64,
        transformer_enc_layers=2,
        shepard_power=3.0,
        shepard_power_learnable=True,
    )
    feats = {}
    sizes = {"res2": 256, "res3": 64, "res4": 16, "res5": 4}
    chans = {"res2": 32, "res3": 48, "res4": 56, "res5": 64}
    ys, xs = np.meshgrid(np.arange(16), np.arange(16), indexing="ij")
    grid = np.stack([xs, ys], 2).reshape(-1, 2).astype(np.float32)
    for f, nres in sizes.items():
        feats[f] = jnp.zeros((1, nres, chans[f]))
        feats[f + "_pos"] = jnp.asarray(grid[None, :nres])
        feats[f + "_spatial_shape"] = (16, 16)
    variables = model.init(jax.random.PRNGKey(0), feats, True)
    flat = traverse_util.flatten_dict(
        {"head": {"pixel_decoder": variables["params"]}}
    )
    missing = [k for k in flat if k not in params]
    assert not missing, f"missing: {missing[:10]}"
    for k in flat:
        assert flat[k].shape == params[k].shape, (k, flat[k].shape, params[k].shape)
