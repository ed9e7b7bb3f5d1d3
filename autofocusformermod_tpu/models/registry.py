"""Model registries — the detectron2-style plugin surface
(BACKBONE_REGISTRY / SEM_SEG_HEADS_REGISTRY / TRANSFORMER_DECODER_REGISTRY /
META_ARCH_REGISTRY used throughout the reference)."""

from __future__ import annotations

from typing import Callable, Dict


class Registry:
    def __init__(self, name: str):
        self._name = name
        self._map: Dict[str, Callable] = {}

    def register(self, obj: Callable = None, *, name: str = None):
        if obj is None:
            return lambda o: self.register(o, name=name)
        key = name or obj.__name__
        if key in self._map:
            raise KeyError(f"{key} already registered in {self._name}")
        self._map[key] = obj
        return obj

    def get(self, name: str) -> Callable:
        if name not in self._map:
            raise KeyError(
                f"'{name}' not in {self._name} registry; have {sorted(self._map)}"
            )
        return self._map[name]

    def __contains__(self, name: str) -> bool:
        return name in self._map


BACKBONE_REGISTRY = Registry("BACKBONE")
SEM_SEG_HEADS_REGISTRY = Registry("SEM_SEG_HEADS")
TRANSFORMER_DECODER_REGISTRY = Registry("TRANSFORMER_DECODER")
META_ARCH_REGISTRY = Registry("META_ARCH")


def _register_builtins():
    from .aff import aff_from_config
    from .swin import swin_from_config
    from .maskformer import maskformer_from_config
    from .maskfiner import maskfiner_from_config
    from .pixel_decoder import pixel_decoder_from_config
    from .transformer_decoder import transformer_decoder_from_config

    from .resnet import resnet_from_config

    BACKBONE_REGISTRY.register(aff_from_config, name="AutoFocusFormer")
    BACKBONE_REGISTRY.register(resnet_from_config, name="build_resnet_backbone")
    BACKBONE_REGISTRY.register(swin_from_config, name="D2SwinTransformer")
    SEM_SEG_HEADS_REGISTRY.register(
        pixel_decoder_from_config, name="MSDeformAttnPixelDecoder"
    )
    from .maskfiner import MSDeformAttnPixelDecoderMaskFiner

    SEM_SEG_HEADS_REGISTRY.register(
        MSDeformAttnPixelDecoderMaskFiner, name="MSDeformAttnPixelDecoderMaskFiner"
    )
    SEM_SEG_HEADS_REGISTRY.register(
        # projection-only variant: the reference's ..._proj.py is the same
        # decoder with no transformer encoder layers
        lambda **kw: MSDeformAttnPixelDecoderMaskFiner(
            **{**kw, "transformer_enc_layers": 0}
        ),
        name="MSDeformAttnPixelDecoderMaskFinerProj",
    )
    from .maskfiner import ProjPixelDecoderMaskFiner

    SEM_SEG_HEADS_REGISTRY.register(
        ProjPixelDecoderMaskFiner, name="ProjMaskFinerOracleTeacher"
    )
    SEM_SEG_HEADS_REGISTRY.register(
        lambda **kw: MSDeformAttnPixelDecoderMaskFiner(
            **{**kw, "activation": "lrelu"}
        ),
        name="MSDeformAttnPixelDecoderMaskFinerOracleTeacher",
    )
    SEM_SEG_HEADS_REGISTRY.register(
        lambda **kw: MSDeformAttnPixelDecoderMaskFiner(**{**kw, "hierup": True}),
        name="MSDeformAttnPixelDecoderMaskFinerHierUp",
    )
    from .pixel_decoder_grid import MSDeformAttnPixelDecoderGrid

    SEM_SEG_HEADS_REGISTRY.register(
        MSDeformAttnPixelDecoderGrid, name="MSDeformAttnPixelDecoderSwin"
    )
    TRANSFORMER_DECODER_REGISTRY.register(
        transformer_decoder_from_config, name="MultiScaleMaskedTransformerDecoder"
    )
    TRANSFORMER_DECODER_REGISTRY.register(
        transformer_decoder_from_config,  # grid_attn_mask read from cfg name
        name="MultiScaleMaskedTransformerDecoderSwin",
    )
    from .maskfiner import MultiScaleMaskFinerTransformerDecoder

    for _n in (
        "MultiScaleMaskFinerTransformerDecoder",
        "MultiScaleMaskFinerTransformerDecoderOracleTeacher",
        "MultiScaleMaskFinerTransformerDecoderCat",
        "MultiScaleMaskFinerTransformerDecoder5S",
        "MultiScaleMaskFinerTransformerDecoderSingleScale",
    ):
        TRANSFORMER_DECODER_REGISTRY.register(
            MultiScaleMaskFinerTransformerDecoder, name=_n
        )
    META_ARCH_REGISTRY.register(maskformer_from_config, name="MaskFormer")
    META_ARCH_REGISTRY.register(maskfiner_from_config, name="MaskFiner")

    from .meta_arch_variants import (
        maskfiner_oracle_from_config,
        maskfiner_oracle_teacher_bb_from_config,
        maskfiner_oracle_teacher_from_config,
        maskformer_swin_from_config,
    )
    from .mrml import maskformer_ml_from_config, mixres_metaloss_from_config
    from .updown import updown_from_config

    META_ARCH_REGISTRY.register(maskformer_ml_from_config, name="MaskFormerML")
    SEM_SEG_HEADS_REGISTRY.register(
        lambda cfg, fc: pixel_decoder_from_config(cfg, fc).clone(
            mask_on_full_grid=True
        ),
        name="MSDeformAttnPixelDecoderUp",
    )

    META_ARCH_REGISTRY.register(maskformer_swin_from_config, name="MaskFormerSwin")
    META_ARCH_REGISTRY.register(
        maskfiner_oracle_teacher_from_config, name="MaskFinerOracleTeacher"
    )
    META_ARCH_REGISTRY.register(maskfiner_oracle_from_config, name="MaskFinerOracle")
    # BB = ONE composite backbone (UpDownBackbone) + a single final-stage
    # head (reference maskfiner_oracle_teacher_model_bb.py); SW = same model
    # with sliding-window eval (maskfiner_oracle_teacher_model_sw.py).
    META_ARCH_REGISTRY.register(
        maskfiner_oracle_teacher_bb_from_config, name="MaskFinerOracleTeacherBB"
    )
    META_ARCH_REGISTRY.register(
        maskfiner_oracle_teacher_bb_from_config, name="MaskFinerOracleTeacherSW"
    )
    BACKBONE_REGISTRY.register(
        mixres_metaloss_from_config, name="MixResMetaLoss"
    )
    BACKBONE_REGISTRY.register(
        lambda cfg: mixres_metaloss_from_config(cfg).clone(
            mean_activation_scores=True
        ),
        name="MixResMeanAct",
    )
    BACKBONE_REGISTRY.register(
        lambda cfg: mixres_metaloss_from_config(cfg).clone(
            use_cluster_attention=True
        ),
        name="MixResMetaLossNeighbour",
    )
    BACKBONE_REGISTRY.register(updown_from_config, name="UpDownBackbone")
    BACKBONE_REGISTRY.register(
        lambda cfg: updown_from_config(cfg, down_only=True),
        name="OracleTeacherBackbone",
    )

    # per-cascade-stage backbones, reference signature (cfg, layer_index)
    from .maskfiner import build_backbone_indexed

    BACKBONE_REGISTRY.register(
        lambda cfg, layer_index=0: build_backbone_indexed(
            cfg, layer_index, name="MixResViT"
        ),
        name="MixResViT",
    )
    BACKBONE_REGISTRY.register(
        lambda cfg, layer_index=1: build_backbone_indexed(
            cfg, layer_index, name="MixResNeighbour"
        ),
        name="MixResNeighbour",
    )
    BACKBONE_REGISTRY.register(
        lambda cfg, layer_index=1: build_backbone_indexed(
            cfg, layer_index, name="MixResNeighbourXAttn"
        ),
        name="MixResNeighbourXAttn",
    )
    BACKBONE_REGISTRY.register(
        lambda cfg, layer_index=0: build_backbone_indexed(
            cfg, layer_index, name="ConvNeXtV2"
        ),
        name="ConvNeXtV2",
    )


_register_builtins()


def build_model(cfg):
    """Build the configured meta-architecture (detectron2 build_model shape)."""
    return META_ARCH_REGISTRY.get(cfg.MODEL.META_ARCHITECTURE)(cfg)


def build_backbone(cfg):
    return BACKBONE_REGISTRY.get(cfg.MODEL.BACKBONE.NAME)(cfg)
