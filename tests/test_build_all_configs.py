"""Every shipped YAML must produce a constructible model.

VERDICT r1 item 4: `merge_from_file` passing is not enough — registry gaps
only surface when build_model(cfg) actually runs.  Construction of flax
modules is cheap (no init), so the full tree is tested.
"""

import os
import glob

import pytest

from autofocusformermod_tpu.config import add_maskformer2_config, get_cfg

ROOT = os.path.join(os.path.dirname(__file__), "..", "configs")
ALL_YAMLS = sorted(
    os.path.relpath(p, ROOT) for p in glob.glob(f"{ROOT}/**/*.yaml", recursive=True)
)


def _load(rel):
    cfg = get_cfg()
    add_maskformer2_config(cfg)
    cfg.merge_from_file(os.path.join(ROOT, rel))
    return cfg


@pytest.mark.parametrize("rel", ALL_YAMLS)
def test_config_builds_model(rel):
    import flax.linen as nn

    from autofocusformermod_tpu.models.registry import build_model

    cfg = _load(rel)
    model = build_model(cfg)
    assert isinstance(model, nn.Module), rel


# One representative shipped config per meta-architecture family, run
# through init + an eval forward at a small crop.  Construction alone
# (above) misses apply-time crashes — e.g. the list-valued DROP_PATH_RATE
# regression only surfaced when a DropPath module first *ran*.  These use
# the real shipped field values, not shrunken stand-ins.
FORWARD_REPS = [
    ("ade20k/semantic-segmentation/aff/maskformer2_aff_mini_bs32_80k.yaml",
     128),                                                  # MaskFormer + AFF
    ("ade20k/semantic-segmentation/maskfiner/maskfiner_mini_bs32_80k.yaml",
     128),                                                  # MaskFiner cascade
    ("cityscapes/semantic-segmentation/maskfiner/"
     "maskfiner_updown_mini_bs32_45k.yaml", 128),           # OracleTeacherBB
    ("cityscapes/semantic-segmentation/maskfiner/"
     "maskfiner_updown_tiny_sw_bs16_90k.yaml", 128),        # OracleTeacherSW
    ("ade20k/semantic-segmentation/maskfiner/"
     "maskfiner_oracle_teacher_bs32_80k.yaml", 128),        # OracleTeacher
    # MaskFormerML: maskformer2_ml_R50_bs16_160k.yaml is upstream-broken
    # (MaskFormerML requires an MRML-family backbone for its metaloss{i}
    # features, and the bare MODEL.MRML defaults have EMBED_DIM[0]=32 with
    # NUM_HEADS[0]=3 — the reference's own Attention.forward reshape,
    # mrml.py:97, cannot run it either); the runnable family representative
    # is the mixres-metaloss config, which overrides both.
    ("ade20k/semantic-segmentation/mixres-metaloss/"
     "maskformer2_mrml_mini_bs32_80k.yaml", 128),           # MaskFormerML
    ("ade20k/semantic-segmentation/maskformer2_swin_bs16_160k.yaml",
     224),                                                  # MaskFormerSwin
]


@pytest.mark.slow
@pytest.mark.parametrize("rel,size", FORWARD_REPS,
                         ids=[r.rsplit("/", 1)[-1] for r, _ in FORWARD_REPS])
def test_representative_config_forward(rel, size):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from autofocusformermod_tpu.models.registry import build_model

    cfg = _load(rel)
    model = build_model(cfg)
    x = jnp.asarray(
        np.random.default_rng(0).uniform(0, 255, (1, size, size, 3)),
        jnp.float32,
    )
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    out = model.apply(variables, x, train=False)
    masks = np.asarray(out["pred_masks"], np.float32)
    assert masks.ndim == 4 and np.isfinite(masks).all(), rel
