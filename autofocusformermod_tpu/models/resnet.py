"""ResNet backbone (detectron2 build_resnet_backbone equivalent).

The reference's R50 baseline configs (e.g. configs/ade20k/semantic-
segmentation/maskformer2_R50_bs16_160k.yaml:1-8 via detectron2) use
``MODEL.BACKBONE.NAME: build_resnet_backbone`` with MODEL.RESNETS.*.
Detectron2's ResNet uses FrozenBatchNorm2d — batch stats are constants from
the pretrained checkpoint — which maps here to flax BatchNorm evaluated with
``use_running_average=True`` unconditionally (the ``batch_stats`` collection
holds the frozen statistics and is never mutated).

Outputs follow the framework-wide on-grid point-cloud convention (feat,
_pos on the stride-4 canvas, _spatial_shape), so the point-cloud pixel
decoder consumes R50 features directly — in the reference the pc pixel
decoder would KeyError on detectron2 grid tensors, making the R50 configs
vestigial; here they actually build and run.
"""

from __future__ import annotations

from typing import Dict, Sequence

import jax.numpy as jnp
import numpy as np
import flax.linen as nn


class FrozenBN(nn.Module):
    """BatchNorm with permanently frozen statistics (detectron2
    FrozenBatchNorm2d)."""

    features: int

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((self.features,))
        ).value
        var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((self.features,))
        ).value
        return (x - mean) / jnp.sqrt(var + 1e-5) * scale + bias


class Bottleneck(nn.Module):
    """1x1 -> 3x3 -> 1x1 bottleneck with projection shortcut on stride/width
    change (detectron2 BottleneckBlock)."""

    out_channels: int
    bottleneck_channels: int
    stride: int = 1
    stride_in_1x1: bool = False

    @nn.compact
    def __call__(self, x):
        s1 = self.stride if self.stride_in_1x1 else 1
        s3 = 1 if self.stride_in_1x1 else self.stride
        shortcut = x
        if x.shape[-1] != self.out_channels or self.stride != 1:
            shortcut = nn.Conv(
                self.out_channels, (1, 1), strides=(self.stride, self.stride),
                use_bias=False, name="shortcut",
            )(x)
            shortcut = FrozenBN(self.out_channels, name="shortcut_norm")(shortcut)
        y = nn.Conv(
            self.bottleneck_channels, (1, 1), strides=(s1, s1),
            use_bias=False, name="conv1",
        )(x)
        y = nn.relu(FrozenBN(self.bottleneck_channels, name="conv1_norm")(y))
        y = nn.Conv(
            self.bottleneck_channels, (3, 3), strides=(s3, s3),
            padding=((1, 1), (1, 1)), use_bias=False, name="conv2",
        )(y)
        y = nn.relu(FrozenBN(self.bottleneck_channels, name="conv2_norm")(y))
        y = nn.Conv(self.out_channels, (1, 1), use_bias=False, name="conv3")(y)
        y = FrozenBN(self.out_channels, name="conv3_norm")(y)
        return nn.relu(y + shortcut)


_STAGE_BLOCKS = {18: (2, 2, 2, 2), 34: (3, 4, 6, 3), 50: (3, 4, 6, 3),
                 101: (3, 4, 23, 3), 152: (3, 8, 36, 3)}


class ResNet(nn.Module):
    """4-stage bottleneck ResNet producing the on-grid point-cloud dict."""

    depth: int = 50
    stem_out_channels: int = 64
    res2_out_channels: int = 256
    stride_in_1x1: bool = False
    out_features: Sequence[str] = ("res2", "res3", "res4", "res5")

    @nn.compact
    def __call__(self, x, train: bool = False) -> Dict:
        assert self.depth in (50, 101, 152), (
            f"only bottleneck ResNets supported, got depth {self.depth}"
        )
        b = x.shape[0]
        # stem: 7x7/2 + BN + relu + maxpool 3x3/2
        y = nn.Conv(
            self.stem_out_channels, (7, 7), strides=(2, 2),
            padding=((3, 3), (3, 3)), use_bias=False, name="stem_conv1",
        )(x)
        y = nn.relu(FrozenBN(self.stem_out_channels, name="stem_conv1_norm")(y))
        y = nn.max_pool(
            y, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1))
        )
        outs: Dict = {}
        blocks = _STAGE_BLOCKS[self.depth]
        out_ch = self.res2_out_channels
        bott_ch = out_ch // 4
        for stage in range(4):
            stride = 1 if stage == 0 else 2
            for i in range(blocks[stage]):
                y = Bottleneck(
                    out_channels=out_ch,
                    bottleneck_channels=bott_ch,
                    stride=stride if i == 0 else 1,
                    stride_in_1x1=self.stride_in_1x1,
                    name=f"res{stage + 2}_{i}",
                )(y)
            name = f"res{stage + 2}"
            if name in self.out_features:
                h, w = y.shape[1], y.shape[2]
                grid_stride = 2 ** stage
                ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
                pos = (
                    np.stack([xs, ys], 2).reshape(1, -1, 2).astype(np.float32)
                    * grid_stride
                )
                outs[name] = y.reshape(b, h * w, out_ch)
                outs[name + "_pos"] = jnp.broadcast_to(
                    jnp.asarray(pos), (b, h * w, 2)
                )
                outs[name + "_spatial_shape"] = (h, w)
            out_ch *= 2
            bott_ch *= 2
        return outs


def resnet_from_config(cfg) -> ResNet:
    r = cfg.MODEL.RESNETS
    return ResNet(
        depth=r.DEPTH,
        stem_out_channels=r.STEM_OUT_CHANNELS,
        res2_out_channels=r.RES2_OUT_CHANNELS,
        stride_in_1x1=r.STRIDE_IN_1X1,
        out_features=tuple(r.OUT_FEATURES),
    )
