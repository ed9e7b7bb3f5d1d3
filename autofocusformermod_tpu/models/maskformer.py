"""MaskFormer meta-architecture: backbone -> pixel decoder -> mask decoder.

TPU-native rebuild of reference mask2former/maskformer_model.py and
meta_arch/mask_former_head.py.  The nn.Module produces the raw prediction
dict; losses (Hungarian + criterion) and inference post-processing are pure
functions applied by the train/eval steps — keeping the module functional and
the host-callback matcher out of the model graph.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from .aff import AFF, aff_from_config
from .pixel_decoder import MSDeformAttnPixelDecoder, pixel_decoder_from_config
from .transformer_decoder import (
    MultiScaleMaskedTransformerDecoder,
    transformer_decoder_from_config,
)


class MaskFormerHead(nn.Module):
    """pixel_decoder.forward_features -> transformer predictor
    (mask_former_head.py:111-128).

    ``f32_islands`` (parallel.precision.ISLAND_PARAM_PATHS) re-creates the
    reference's non-uniform AMP: its pixel decoder runs fp32 under autocast
    (reference msdeformattn_pc.py:464 ``@autocast(enabled=False)``).  An
    active island upcasts its input activations to fp32 and runs its matmuls
    at HIGHEST precision (true-fp32 grade — TPU DEFAULT precision would
    quantize fp32 operands back to bf16, voiding the island); its params are
    kept fp32 by ``amp_variables``.
    """

    pixel_decoder: MSDeformAttnPixelDecoder
    predictor: MultiScaleMaskedTransformerDecoder
    f32_islands: Tuple[str, ...] = ()
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, features: Dict, deterministic: bool = True) -> Dict:
        from ..parallel.precision import f32_outputs

        amp = self.compute_dtype != jnp.float32

        if amp and "pixel_decoder" in self.f32_islands:
            features = f32_outputs(features)
            with jax.default_matmul_precision("float32"):
                mask_features, mf_pos, _, multi_scale_features, multi_scale_poss = (
                    self.pixel_decoder(features, deterministic)
                )
            if "decoder" not in self.f32_islands:
                # decoder stays bf16; mask_features keep fp32 so the mask
                # logits (the thresholded decision) never round through bf16
                multi_scale_features = [
                    f.astype(self.compute_dtype) for f in multi_scale_features
                ]
        else:
            mask_features, mf_pos, _, multi_scale_features, multi_scale_poss = (
                self.pixel_decoder(features, deterministic)
            )

        finest = self.pixel_decoder.in_features[0]
        mask_size = features[finest + "_spatial_shape"]

        if amp and "decoder" in self.f32_islands:
            multi_scale_features = [
                f.astype(jnp.float32) for f in multi_scale_features
            ]
            mask_features = mask_features.astype(jnp.float32)
            with jax.default_matmul_precision("float32"):
                return self.predictor(
                    multi_scale_features, multi_scale_poss, mask_features,
                    mf_pos, mask_size, deterministic,
                )
        return self.predictor(
            multi_scale_features, multi_scale_poss, mask_features, mf_pos,
            mask_size, deterministic,
        )


class MaskFormer(nn.Module):
    """(maskformer_model.py:21-381).  __call__ takes normalized NHWC images and
    returns {'pred_logits', 'pred_masks', 'aux_outputs'}."""

    backbone: AFF
    head: MaskFormerHead
    pixel_mean: Sequence[float] = (123.675, 116.28, 103.53)
    pixel_std: Sequence[float] = (58.395, 57.12, 57.375)
    # bf16 under SOLVER.AMP.ENABLED (the reference's torch.cuda.amp,
    # train_net.py); pair with parallel.precision.amp_variables so params
    # arrive bf16 too — fp32 params would promote everything back.
    compute_dtype: Any = jnp.float32
    # fp32 islands under AMP (see MaskFormerHead docstring); "backbone" is
    # handled here, the rest inside the head
    f32_islands: Tuple[str, ...] = ()

    def normalize(self, images: jnp.ndarray) -> jnp.ndarray:
        """images: (b, H, W, 3) raw RGB (uint8 or float) -> normalized f32.
        The cast lives on device: host batches ship uint8 (north star)."""
        images = images.astype(jnp.float32)
        mean = jnp.asarray(self.pixel_mean, images.dtype)
        std = jnp.asarray(self.pixel_std, images.dtype)
        return (images - mean) / std

    @nn.compact
    def __call__(self, images: jnp.ndarray, train: bool = False) -> Dict:
        amp = self.compute_dtype != jnp.float32
        if amp and "backbone" in self.f32_islands:
            x = self.normalize(images)
            with jax.default_matmul_precision("float32"):
                features = self.backbone(x, train=train)
            if "pixel_decoder" not in self.f32_islands:
                # cast features down, but positions stay fp32 geometry
                features = {
                    k: (v.astype(self.compute_dtype)
                        if hasattr(v, "dtype") and v.dtype == jnp.float32
                        and not k.endswith("_pos") else v)
                    for k, v in features.items()
                }
        else:
            x = self.normalize(images).astype(self.compute_dtype)
            features = self.backbone(x, train=train)
        out = self.head(features, deterministic=not train)
        if self.compute_dtype != jnp.float32:
            # losses/matching/inference are fp32 islands
            from ..parallel.precision import f32_outputs

            out = f32_outputs(out)
        return out


def maskformer_from_config(cfg, use_pallas: Optional[bool] = None) -> MaskFormer:
    """MaskFormer meta-arch; the backbone follows MODEL.BACKBONE.NAME
    (reference maskformer_model.py:99 build_backbone).  AFF is the primary
    path; build_resnet_backbone serves the R50 baseline configs with an
    on-grid point-cloud adapter."""
    name = cfg.MODEL.BACKBONE.NAME
    if name == "AutoFocusFormer":
        backbone = aff_from_config(cfg, use_pallas=use_pallas)
        feature_channels = {
            f"res{i + 2}": int(c) for i, c in enumerate(cfg.MODEL.AFF.EMBED_DIM)
        }
    elif name == "build_resnet_backbone":
        from .resnet import resnet_from_config

        backbone = resnet_from_config(cfg)
        c = cfg.MODEL.RESNETS.RES2_OUT_CHANNELS
        feature_channels = {f"res{i + 2}": c * 2**i for i in range(4)}
    elif name == "D2SwinTransformer":
        from .swin import swin_from_config

        backbone = swin_from_config(cfg)
        c = cfg.MODEL.SWIN.EMBED_DIM
        feature_channels = {f"res{i + 2}": c * 2**i for i in range(4)}
    else:
        from .registry import BACKBONE_REGISTRY

        backbone = BACKBONE_REGISTRY.get(name)(cfg)
        feature_channels = {}
    amp = bool(cfg.SOLVER.AMP.ENABLED)
    compute_dtype = jnp.bfloat16 if amp else jnp.float32
    if amp:
        from ..parallel.precision import active_f32_islands

        islands = active_f32_islands()
    else:
        islands = ()
    pixel_decoder = pixel_decoder_from_config(cfg, feature_channels)
    predictor = transformer_decoder_from_config(
        cfg, cfg.MODEL.SEM_SEG_HEAD.CONVS_DIM,
        f32_mask_head=amp and "mask_head" in islands,
    )
    head = MaskFormerHead(
        pixel_decoder=pixel_decoder, predictor=predictor,
        f32_islands=islands, compute_dtype=compute_dtype,
    )
    return MaskFormer(
        backbone=backbone,
        head=head,
        pixel_mean=tuple(cfg.MODEL.PIXEL_MEAN),
        pixel_std=tuple(cfg.MODEL.PIXEL_STD),
        compute_dtype=compute_dtype,
        f32_islands=islands,
    )


# ---------------------------------------------------------------- inference
def upsample_masks(mask_pred: jnp.ndarray, out_hw: Tuple[int, int]) -> jnp.ndarray:
    """Bilinear-resize (b, q, h, w) mask logits to the padded input size
    (maskformer_model.py:223-228)."""
    b, q, h, w = mask_pred.shape
    return jax.image.resize(mask_pred, (b, q, *out_hw), method="bilinear")


def semantic_inference(mask_cls: jnp.ndarray, mask_pred: jnp.ndarray) -> jnp.ndarray:
    """(q, nc+1) logits + (q, h, w) mask logits -> (nc, h, w) class scores
    (maskformer_model.py:281-285)."""
    cls = jax.nn.softmax(mask_cls, axis=-1)[..., :-1]
    masks = jax.nn.sigmoid(mask_pred)
    return jnp.einsum("qc,qhw->chw", cls, masks)
