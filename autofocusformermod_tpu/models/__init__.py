from .aff import AFF, aff_from_config
from .pixel_decoder import MSDeformAttnPixelDecoder, pixel_decoder_from_config
from .transformer_decoder import (
    MultiScaleMaskedTransformerDecoder,
    transformer_decoder_from_config,
)
from .swin import SwinTransformer, swin_from_config
from .convnextv2 import ConvNeXtV2
from .mixres import MixResViT, MixResNeighbour
from .maskfiner import MaskFiner, MaskPredictor, maskfiner_from_config
from .tta import SemanticSegmentorWithTTA
from .mrml import MixResMetaLoss, metaloss_l1
from .updown import UpDownBackbone
from .oracle import (
    gt_edge_map,
    mix_teacher_mask,
    oracle_upsampling_mask,
    upsampling_mse_loss,
)
from .meta_arch_variants import (
    MaskFinerOracleTeacher,
    maskfiner_oracle_teacher_from_config,
    maskformer_swin_from_config,
)
from .registry import (
    BACKBONE_REGISTRY,
    META_ARCH_REGISTRY,
    SEM_SEG_HEADS_REGISTRY,
    TRANSFORMER_DECODER_REGISTRY,
    build_backbone,
    build_model,
)
from .maskformer import (
    MaskFormer,
    MaskFormerHead,
    maskformer_from_config,
    semantic_inference,
    upsample_masks,
)

__all__ = [
    "AFF",
    "aff_from_config",
    "MSDeformAttnPixelDecoder",
    "pixel_decoder_from_config",
    "MultiScaleMaskedTransformerDecoder",
    "transformer_decoder_from_config",
    "MaskFormer",
    "MaskFormerHead",
    "maskformer_from_config",
    "semantic_inference",
    "upsample_masks",
    "SwinTransformer",
    "swin_from_config",
    "ConvNeXtV2",
    "MixResViT",
    "MixResNeighbour",
    "MaskFiner",
    "MaskPredictor",
    "maskfiner_from_config",
    "SemanticSegmentorWithTTA",
    "MixResMetaLoss",
    "metaloss_l1",
    "UpDownBackbone",
    "gt_edge_map",
    "mix_teacher_mask",
    "oracle_upsampling_mask",
    "upsampling_mse_loss",
    "MaskFinerOracleTeacher",
    "maskfiner_oracle_teacher_from_config",
    "maskformer_swin_from_config",
    "BACKBONE_REGISTRY",
    "META_ARCH_REGISTRY",
    "SEM_SEG_HEADS_REGISTRY",
    "TRANSFORMER_DECODER_REGISTRY",
    "build_backbone",
    "build_model",
]
