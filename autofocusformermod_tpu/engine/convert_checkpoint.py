"""Convert reference PyTorch checkpoints (.pth / detectron2 .pkl) into the
flax parameter tree.

The reference distributes AFF+Mask2Former checkpoints (README.md:51-82) whose
state-dict names follow mask2former/modeling layout; this maps every tensor:

  - torch Conv2d weight (out, in, kh, kw)  -> flax kernel (kh, kw, in, out)
  - torch Linear weight (out, in)          -> flax kernel (in, out)
  - LayerNorm/BatchNorm weight/bias        -> scale/bias (+ batch_stats)
  - torch MultiheadAttention in_proj_weight (3c, c) packed qkv
      -> q_proj/k_proj/v_proj kernels
  - nn.Embedding weight                    -> Embed.embedding

Name translation mirrors the module correspondences documented in
models/aff.py, models/pixel_decoder.py and models/transformer_decoder.py.
"""

from __future__ import annotations

import pickle
import re
from typing import Any, Dict, Optional, Tuple

import numpy as np
from flax import traverse_util


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a torch .pth or detectron2 .pkl into {name: np.ndarray}."""
    if path.endswith(".pkl"):
        with open(path, "rb") as f:
            data = pickle.load(f, encoding="latin1")
        sd = data.get("model", data)
        return {k: np.asarray(v) for k, v in sd.items() if hasattr(v, "shape")}
    import torch

    data = torch.load(path, map_location="cpu", weights_only=False)
    sd = data.get("model", data.get("state_dict", data))
    return {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v) for k, v in sd.items()}


def _strip_prefix(sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    out = {}
    for k, v in sd.items():
        k = re.sub(r"^(module\.)", "", k)
        out[k] = v
    return out


def _conv_kernel(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 1, 0))


def _linear_kernel(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (1, 0))


def convert_reference_state_dict(
    sd: Dict[str, np.ndarray],
) -> Tuple[Dict[tuple, np.ndarray], Dict[tuple, np.ndarray]]:
    """Translate reference names -> (flat params, flat batch_stats) with
    tuple paths matching our flax tree."""
    sd = _strip_prefix(sd)
    params: Dict[tuple, np.ndarray] = {}
    stats: Dict[tuple, np.ndarray] = {}

    def put(path, value):
        params[tuple(path)] = value

    def linear(src, dst):
        if src + ".weight" in sd:
            put(dst + ["kernel"], _linear_kernel(sd[src + ".weight"]))
        if src + ".bias" in sd:
            put(dst + ["bias"], sd[src + ".bias"])

    def norm(src, dst):
        if src + ".weight" in sd:
            put(dst + ["scale"], sd[src + ".weight"])
        if src + ".bias" in sd:
            put(dst + ["bias"], sd[src + ".bias"])

    def conv(src, dst):
        if src + ".weight" in sd:
            put(dst + ["kernel"], _conv_kernel(sd[src + ".weight"]))
        if src + ".bias" in sd:
            put(dst + ["bias"], sd[src + ".bias"])

    def mha(src, dst):
        """torch MultiheadAttention -> q/k/v/out_proj Dense."""
        if src + ".in_proj_weight" in sd:
            w = sd[src + ".in_proj_weight"]
            b = sd.get(src + ".in_proj_bias")
            c = w.shape[1]
            for i, name in enumerate(["q_proj", "k_proj", "v_proj"]):
                put(dst + [name, "kernel"], _linear_kernel(w[i * c : (i + 1) * c]))
                if b is not None:
                    put(dst + [name, "bias"], b[i * c : (i + 1) * c])
        linear(src + ".out_proj", dst + ["out_proj"])

    def weight_net(src, dst):
        """nn.Sequential(Linear, LayerNorm, GELU) -> WeightNet."""
        linear(src + ".0", dst + ["linear"])
        norm(src + ".1", dst + ["norm"])

    # ---------------------------------------------------------- backbone
    bb = "backbone."
    conv(bb + "patch_embed.proj1", ["backbone", "patch_embed", "proj1"])
    conv(bb + "patch_embed.proj2", ["backbone", "patch_embed", "proj2"])
    if bb + "patch_embed.bn.weight" in sd:
        put(["backbone", "patch_embed", "bn", "scale"], sd[bb + "patch_embed.bn.weight"])
        put(["backbone", "patch_embed", "bn", "bias"], sd[bb + "patch_embed.bn.bias"])
        stats[("backbone", "patch_embed", "bn", "mean")] = sd[
            bb + "patch_embed.bn.running_mean"
        ]
        stats[("backbone", "patch_embed", "bn", "var")] = sd[
            bb + "patch_embed.bn.running_var"
        ]
    norm(bb + "patch_embed.norm", ["backbone", "patch_embed", "norm"])

    layer_ids = sorted(
        {
            int(m.group(1))
            for k in sd
            for m in [re.match(r"backbone\.layers\.(\d+)\.", k)]
            if m
        }
    )
    for li in layer_ids:
        lsrc = f"{bb}layers.{li}"
        ldst = ["backbone", f"layers_{li}"]
        block_ids = sorted(
            {
                int(m.group(1))
                for k in sd
                for m in [re.match(rf"backbone\.layers\.{li}\.blocks\.(\d+)\.", k)]
                if m
            }
        )
        for bi in block_ids:
            bsrc = f"{lsrc}.blocks.{bi}"
            bdst = ldst + [f"blocks_{bi}"]
            norm(bsrc + ".norm1", bdst + ["norm1"])
            norm(bsrc + ".norm2", bdst + ["norm2"])
            for lin in ["q", "kv", "pos_embed", "proj"]:
                linear(f"{bsrc}.attn.{lin}", bdst + ["attn", lin])
            for p in ["blank_k", "blank_v"]:
                if f"{bsrc}.attn.{p}" in sd:
                    put(bdst + ["attn", p], sd[f"{bsrc}.attn.{p}"])
            linear(bsrc + ".mlp.fc1", bdst + ["mlp", "fc1"])
            linear(bsrc + ".mlp.fc2", bdst + ["mlp", "fc2"])
            for g in ["gamma1", "gamma2"]:
                if f"{bsrc}.{g}" in sd:
                    put(bdst + [g], sd[f"{bsrc}.{g}"])
        linear(lsrc + ".prob_net", ldst + ["prob_net"])
        weight_net(lsrc + ".downsample.weight_net", ldst + ["downsample", "weight_net"])
        norm(lsrc + ".downsample.norm", ldst + ["downsample", "norm"])
        linear(lsrc + ".downsample.linear", ldst + ["downsample", "linear"])
    for i in range(4):
        norm(f"{bb}norm{i}", ["backbone", f"norm{i}"])

    # ------------------------------------------------------ pixel decoder
    pd = "sem_seg_head.pixel_decoder."
    pdd = ["head", "pixel_decoder"]
    n_proj = len({k for k in sd if k.startswith(pd + "input_proj.")}) and max(
        int(re.match(rf"{re.escape(pd)}input_proj\.(\d+)\.", k).group(1))
        for k in sd
        if k.startswith(pd + "input_proj.")
    ) + 1
    for i in range(n_proj or 0):
        linear(f"{pd}input_proj.{i}.0", pdd + [f"input_proj_{i}_dense"])
        norm(f"{pd}input_proj.{i}.1", pdd + [f"input_proj_{i}_norm"])
    if pd + "transformer.level_embed" in sd:
        put(pdd + ["level_embed"], sd[pd + "transformer.level_embed"])
    enc_ids = sorted(
        {
            int(m.group(1))
            for k in sd
            for m in [re.match(rf"{re.escape(pd)}transformer\.encoder\.layers\.(\d+)\.", k)]
            if m
        }
    )
    for i in enc_ids:
        esrc = f"{pd}transformer.encoder.layers.{i}"
        edst = pdd + [f"encoder_layer_{i}"]
        for lin in ["sampling_offsets", "attention_weights", "value_proj", "output_proj"]:
            linear(f"{esrc}.self_attn.{lin}", edst + ["self_attn", lin])
        if f"{esrc}.self_attn.shepard_power" in sd:
            put(edst + ["self_attn", "shepard_power"], sd[f"{esrc}.self_attn.shepard_power"])
        norm(esrc + ".norm1", edst + ["norm1"])
        norm(esrc + ".norm2", edst + ["norm2"])
        linear(esrc + ".linear1", edst + ["linear1"])
        linear(esrc + ".linear2", edst + ["linear2"])
    # FPN adapters / output PointConvs
    for i in [1]:
        linear(f"{pd}adapter_{i}.0", pdd + [f"adapter_{i}_dense"])
        norm(f"{pd}adapter_{i}.1", pdd + [f"adapter_{i}_norm"])
        weight_net(f"{pd}layer_{i}.0.weight_net", pdd + [f"layer_{i}_pointconv", "weight_net"])
        norm(f"{pd}layer_{i}.0.norm", pdd + [f"layer_{i}_pointconv", "norm"])
        linear(f"{pd}layer_{i}.0.linear", pdd + [f"layer_{i}_pointconv", "linear"])
        norm(f"{pd}layer_{i}.1", pdd + [f"layer_{i}_norm"])
    linear(pd + "mask_features", pdd + ["mask_features"])

    # ------------------------------------------------- transformer decoder
    pr = "sem_seg_head.predictor."
    prd = ["head", "predictor"]
    for emb in ["query_feat", "query_embed", "level_embed"]:
        if f"{pr}{emb}.weight" in sd:
            put(prd + [emb, "embedding"], sd[f"{pr}{emb}.weight"])
    dec_ids = sorted(
        {
            int(m.group(1))
            for k in sd
            for m in [
                re.match(
                    rf"{re.escape(pr)}transformer_cross_attention_layers\.(\d+)\.", k
                )
            ]
            if m
        }
    )
    for i in dec_ids:
        mha(
            f"{pr}transformer_cross_attention_layers.{i}.multihead_attn",
            prd + [f"cross_{i}", "multihead_attn"],
        )
        norm(
            f"{pr}transformer_cross_attention_layers.{i}.norm",
            prd + [f"cross_{i}", "norm"],
        )
        mha(
            f"{pr}transformer_self_attention_layers.{i}.self_attn",
            prd + [f"self_{i}", "self_attn"],
        )
        norm(
            f"{pr}transformer_self_attention_layers.{i}.norm",
            prd + [f"self_{i}", "norm"],
        )
        linear(
            f"{pr}transformer_ffn_layers.{i}.linear1", prd + [f"ffn_{i}", "linear1"]
        )
        linear(
            f"{pr}transformer_ffn_layers.{i}.linear2", prd + [f"ffn_{i}", "linear2"]
        )
        norm(f"{pr}transformer_ffn_layers.{i}.norm", prd + [f"ffn_{i}", "norm"])
    norm(pr + "decoder_norm", prd + ["decoder_norm"])
    linear(pr + "class_embed", prd + ["class_embed"])
    for i in range(3):
        linear(f"{pr}mask_embed.layers.{i}", prd + ["mask_embed", f"layers_{i}"])
    for i in range(8):
        linear(f"{pr}input_proj.{i}", prd + [f"input_proj_{i}"])

    return params, stats


def load_reference_weights(path: str, params_template) -> Optional[Any]:
    """Load + convert + merge into the template tree; returns None when the
    file is missing (training from scratch)."""
    import os

    if not os.path.exists(path):
        print(f"[convert_checkpoint] {path} not found; training from scratch")
        return None
    sd = load_torch_state_dict(path)
    flat_new, _ = convert_reference_state_dict(sd)
    flat = traverse_util.flatten_dict(params_template)
    import jax.numpy as jnp

    hits, misses = 0, []
    for k in flat:
        if k in flat_new:
            assert flat[k].shape == flat_new[k].shape, (
                f"shape mismatch at {k}: {flat[k].shape} vs {flat_new[k].shape}"
            )
            flat[k] = jnp.asarray(flat_new[k])
            hits += 1
        else:
            misses.append(k)
    print(
        f"[convert_checkpoint] loaded {hits}/{len(flat)} tensors"
        + (f"; missing e.g. {misses[:5]}" if misses else "")
    )
    return traverse_util.unflatten_dict(flat)
