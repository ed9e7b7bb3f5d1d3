from .aff import AFF, aff_from_config
from .pixel_decoder import MSDeformAttnPixelDecoder, pixel_decoder_from_config
from .transformer_decoder import (
    MultiScaleMaskedTransformerDecoder,
    transformer_decoder_from_config,
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
]
