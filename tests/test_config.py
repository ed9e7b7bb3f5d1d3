import os

import pytest

from autofocusformermod_tpu.config import CfgNode, get_cfg, add_maskformer2_config, add_deeplab_config

REF_CONFIGS = "/root/reference/configs"


def _full_cfg():
    cfg = get_cfg()
    add_deeplab_config(cfg)
    add_maskformer2_config(cfg)
    return cfg


def test_defaults_match_reference_values():
    cfg = _full_cfg()
    assert cfg.MODEL.MASK_FORMER.HIDDEN_DIM == 256
    assert cfg.MODEL.AFF.CLUSTER_SIZE == 8
    assert cfg.MODEL.AFF.NBHD_SIZE == [48, 48, 48, 48]
    assert cfg.MODEL.MASK_FORMER.TRAIN_NUM_POINTS == 112 * 112
    assert cfg.MODEL.MASK_FINER.DEC_LAYERS == [4, 7, 10, 10]
    assert cfg.SOLVER.BACKBONE_MULTIPLIER == 0.1


def test_merge_from_list_type_checks():
    cfg = _full_cfg()
    cfg.merge_from_list(["SOLVER.BASE_LR", "0.0002", "MODEL.AFF.DS_RATE", "0.2"])
    assert cfg.SOLVER.BASE_LR == 0.0002
    assert cfg.MODEL.AFF.DS_RATE == 0.2
    with pytest.raises(AssertionError):
        cfg.merge_from_list(["NON.EXISTENT.KEY", "1"])


def test_freeze():
    cfg = _full_cfg()
    cfg.freeze()
    with pytest.raises(AttributeError):
        cfg.SOLVER.BASE_LR = 1.0
    cfg.defrost()
    cfg.SOLVER.BASE_LR = 1.0


@pytest.mark.skipif(not os.path.isdir(REF_CONFIGS), reason="reference configs absent")
def test_loads_reference_aff_mini_yaml():
    cfg = _full_cfg()
    cfg.merge_from_file(
        os.path.join(
            REF_CONFIGS,
            "ade20k/semantic-segmentation/aff/maskformer2_aff_mini_bs32_80k.yaml",
        )
    )
    assert cfg.MODEL.BACKBONE.NAME == "AutoFocusFormer"
    assert cfg.MODEL.AFF.EMBED_DIM == [32, 128, 256, 384]
    assert cfg.MODEL.AFF.NUM_HEADS == [2, 4, 8, 16]
    assert cfg.MODEL.MASK_FORMER.DEC_LAYERS == 10
    assert cfg.MODEL.MASK_FORMER.CLASS_WEIGHT == 2.0
    assert cfg.SOLVER.IMS_PER_BATCH == 32
    assert cfg.SOLVER.MAX_ITER == 80000
    # eval-tag list from the base yaml
    assert cfg.INPUT.MIN_SIZE_TRAIN == [int(x * 0.1 * 512) for x in range(5, 21)]
    # tuple coercion through yaml strings
    assert cfg.DATASETS.TRAIN == ("ade20k_sem_seg_train",)
    assert cfg.INPUT.CROP.SIZE == (512, 512)


@pytest.mark.skipif(not os.path.isdir(REF_CONFIGS), reason="reference configs absent")
def test_loads_every_reference_yaml():
    import glob

    files = glob.glob(os.path.join(REF_CONFIGS, "**", "*.yaml"), recursive=True)
    assert len(files) > 50
    failures = []
    for f in files:
        cfg = _full_cfg()
        try:
            cfg.merge_from_file(f)
        except Exception as e:  # noqa: BLE001
            failures.append((f, repr(e)))
    assert not failures, failures[:5]


def test_loads_own_config_tree():
    import glob

    files = glob.glob("configs/**/*.yaml", recursive=True)
    assert len(files) >= 97, "full reference config tree should be shipped"
    for f in files:
        if os.path.basename(f).lower().startswith("base"):
            continue
        cfg = _full_cfg()
        cfg.merge_from_file(f)
        # queries: 100 everywhere except cityscapes instance/panoptic (250)
        assert cfg.MODEL.MASK_FORMER.NUM_OBJECT_QUERIES in (100, 250), f


def test_own_aff_mini_matches_reference_values():
    cfg = _full_cfg()
    cfg.merge_from_file("configs/ade20k/maskformer2_aff_mini_bs32_80k.yaml")
    ref = _full_cfg()
    if os.path.isdir(REF_CONFIGS):
        ref.merge_from_file(os.path.join(
            REF_CONFIGS,
            "ade20k/semantic-segmentation/aff/maskformer2_aff_mini_bs32_80k.yaml"))
        for key in ["EMBED_DIM", "DEPTHS", "NUM_HEADS", "MLP_RATIO",
                    "CLUSTER_SIZE", "NBHD_SIZE", "ALPHA", "DS_RATE"]:
            assert cfg.MODEL.AFF[key] == ref.MODEL.AFF[key], key
        assert cfg.SOLVER.IMS_PER_BATCH == ref.SOLVER.IMS_PER_BATCH
        assert cfg.SOLVER.MAX_ITER == ref.SOLVER.MAX_ITER
        assert cfg.MODEL.MASK_FORMER.DEC_LAYERS == ref.MODEL.MASK_FORMER.DEC_LAYERS
