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
