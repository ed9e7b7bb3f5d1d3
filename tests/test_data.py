"""Data pipeline tests: transforms, semantic mapper on synthetic files, loader."""

import os
import tempfile

import numpy as np
import pytest
from PIL import Image

from autofocusformermod_tpu.data import transforms as T
from autofocusformermod_tpu.data.mapper_semantic import MaskFormerSemanticDatasetMapper
from autofocusformermod_tpu.data.mapper_panoptic_instance import (
    COCOInstanceLSJDatasetMapper,
    rle_decode,
)
from autofocusformermod_tpu.data.loader import TrainLoader

RNG = np.random.default_rng(0)


def test_resize_shortest_edge():
    img = RNG.integers(0, 255, (300, 500, 3), dtype=np.uint8)
    seg = RNG.integers(0, 5, (300, 500)).astype(np.int32)
    out, oseg = T.resize_shortest_edge(img, seg, 512, 2048)
    assert min(out.shape[:2]) == 512
    assert oseg.shape == out.shape[:2]
    # max_size cap
    out2, _ = T.resize_shortest_edge(img, seg, 2000, 2048)
    assert max(out2.shape[:2]) <= 2048


def test_random_crop_and_pad():
    rng = np.random.default_rng(1)
    img = RNG.integers(0, 255, (600, 700, 3), dtype=np.uint8)
    seg = np.zeros((600, 700), np.int32)
    seg[:10] = 255
    c_img, c_seg = T.random_crop_with_category_constraint(rng, img, seg, (512, 512))
    assert c_img.shape == (512, 512, 3)
    p_img, p_seg = T.pad_to_size(c_img, c_seg, (512, 640))
    assert p_img.shape == (512, 640, 3)
    assert (p_seg[:, 512:] == 255).all()  # gt padded with ignore


def test_color_aug_preserves_dtype_shape():
    rng = np.random.default_rng(2)
    img = RNG.integers(0, 255, (64, 64, 3), dtype=np.uint8)
    out = T.color_aug_ssd(rng, img)
    assert out.shape == img.shape and out.dtype == np.uint8


def test_lsj_fixed_output():
    rng = np.random.default_rng(3)
    img = RNG.integers(0, 255, (480, 640, 3), dtype=np.uint8)
    out, seg = T.large_scale_jitter(rng, img, None, 256)
    assert out.shape == (256, 256, 3)


@pytest.fixture()
def synthetic_semantic_dataset(tmp_path):
    img_path = tmp_path / "img.jpg"
    seg_path = tmp_path / "img.png"
    Image.fromarray(
        RNG.integers(0, 255, (300, 400, 3), dtype=np.uint8)
    ).save(img_path)
    seg = np.zeros((300, 400), np.uint8)
    seg[:, 200:] = 3
    seg[:20] = 255
    Image.fromarray(seg).save(seg_path)
    return [{"file_name": str(img_path), "sem_seg_file_name": str(seg_path)}]


def test_semantic_mapper_train_targets(synthetic_semantic_dataset):
    mapper = MaskFormerSemanticDatasetMapper(
        is_train=True, min_size_train=(256,), crop_size=(256, 256),
        size_divisibility=256, max_gt=10, color_aug_ssd=False,
    )
    out = mapper(synthetic_semantic_dataset[0])
    assert out["image"].shape == (256, 256, 3)
    assert out["image"].dtype == np.uint8          # host never touches floats
    assert out["sem_seg_map"].shape == (256, 256)
    v = out["valid"]
    assert v.sum() >= 1
    # device-side mask derivation: each valid label has pixels in the map
    from autofocusformermod_tpu.parallel.train_step import _device_masks
    import jax.numpy as jnp
    masks = np.asarray(_device_masks({
        "sem_seg_map": jnp.asarray(out["sem_seg_map"][None]),
        "labels": jnp.asarray(out["labels"][None]),
        "valid": jnp.asarray(v[None]),
    }))[0]
    for i in np.nonzero(v)[0]:
        assert masks[i].sum() > 0
        np.testing.assert_array_equal(
            masks[i] > 0, out["sem_seg_map"] == out["labels"][i]
        )
    # padded slots are all-zero even when label 0 exists in the map
    for i in np.nonzero(~v)[0]:
        assert masks[i].sum() == 0


def test_semantic_mapper_eval(synthetic_semantic_dataset):
    mapper = MaskFormerSemanticDatasetMapper(is_train=False, min_size_test=256)
    out = mapper(synthetic_semantic_dataset[0])
    assert "sem_seg" in out and out["sem_seg"].shape == out["image"].shape[:2]
    assert out["height"] == 300 and out["width"] == 400


def test_train_loader_batches(synthetic_semantic_dataset):
    mapper = MaskFormerSemanticDatasetMapper(
        is_train=True, min_size_train=(128,), crop_size=(128, 128),
        size_divisibility=128, max_gt=5, color_aug_ssd=False,
    )
    loader = TrainLoader(
        synthetic_semantic_dataset * 4, mapper, batch_size=2, num_workers=2,
    )
    batch = next(loader)
    assert batch["image"].shape == (2, 128, 128, 3)
    assert batch["image"].dtype == np.uint8
    assert batch["sem_seg_map"].shape == (2, 128, 128)
    assert batch["valid"].dtype == bool
    loader.close()


def test_rle_decode_uncompressed():
    # column-major runs: 2x3 mask
    rle = {"size": [2, 3], "counts": [1, 2, 3]}
    m = rle_decode(rle)
    assert m.shape == (2, 3)
    assert m.reshape(-1, order="F").tolist() == [0, 1, 1, 0, 0, 0]


def test_cityscapes_panoptic_labelid_remap(tmp_path):
    """segments_info category_ids must arrive as contiguous trainIds, not raw
    cityscapes labelIds (reference uses detectron2's _convert_category_id)."""
    import json

    from autofocusformermod_tpu.data.datasets_coco import (
        CITYSCAPES_LABELID_TO_TRAINID,
        load_cityscapes_panoptic,
    )

    ann = {
        "image_id": "frankfurt_000000_000294",
        "file_name": "frankfurt_000000_000294_gtFine_panoptic.png",
        "segments_info": [
            {"id": 1, "category_id": 7, "iscrowd": 0, "area": 10},   # road -> 0
            {"id": 2, "category_id": 26, "iscrowd": 0, "area": 10},  # car -> 13
            {"id": 3, "category_id": 4, "iscrowd": 0, "area": 10},   # static: dropped
        ],
    }
    gt_json = tmp_path / "pan.json"
    gt_json.write_text(json.dumps({"annotations": [ann]}))
    out = load_cityscapes_panoptic(str(tmp_path), str(gt_json), str(tmp_path))
    segs = out[0]["segments_info"]
    assert [s["category_id"] for s in segs] == [0, 13]
    assert all(
        0 <= v <= 18 for v in CITYSCAPES_LABELID_TO_TRAINID.values()
    ) and len(CITYSCAPES_LABELID_TO_TRAINID) == 19


def test_prepare_cocofied_lvisv1(tmp_path):
    import importlib.util
    import json

    spec = importlib.util.spec_from_file_location(
        "prep_lvisv1", "datasets/prepare_cocofied_lvisv1.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    lvis = {
        "images": [
            {"id": 10, "coco_url": "http://x/val2017/a.jpg",
             "not_exhaustive_category_ids": [1, 3], "neg_category_ids": [2]},
            {"id": 11, "coco_url": "http://x/train2017/b.jpg",
             "not_exhaustive_category_ids": [], "neg_category_ids": []},
        ],
        "annotations": [
            {"id": 100, "image_id": 10, "category_id": 1},   # person -> 1
            {"id": 101, "image_id": 10, "category_id": 3},   # unmapped
            {"id": 102, "image_id": 11, "category_id": 1},   # train2017 img
        ],
        "categories": [
            {"id": 1, "synset": "person.n.01", "name": "person"},
            {"id": 2, "synset": "bicycle.n.01", "name": "bicycle"},
            {"id": 3, "synset": "aerosol.n.02", "name": "aerosol_can"},
        ],
    }
    src = tmp_path / "lvis_v1_val.json"
    json.dump(lvis, open(src, "w"))
    dst = tmp_path / "out.json"
    mod.cocofy_lvis_v1(src, dst)
    out = json.load(open(dst))
    assert len(out["images"]) == 1 and out["images"][0]["id"] == 1
    assert out["images"][0]["file_name"] == "a.jpg"
    assert out["images"][0]["not_exhaustive_category_ids"] == [1]  # person only
    assert out["images"][0]["neg_category_ids"] == [2]             # bicycle
    assert len(out["annotations"]) == 1
    assert out["annotations"][0]["category_id"] == 1
    assert out["annotations"][0]["image_id"] == 1
    assert [c["id"] for c in out["categories"]] == [1]  # only cats w/ instances


def test_coco_semantic2_lsj_mapper(synthetic_semantic_dataset):
    """coco_semantic2 mapper (reference coco_semantic_dataset_mapper2.py):
    fixed-size LSJ output, caffe-shifted dataset ids remapped to contiguous
    train ids, removed classes sent to ignore."""
    from autofocusformermod_tpu.data.mapper_semantic import (
        COCOSemanticLSJDatasetMapper,
        stuff_remap_lut,
    )

    # synthetic gt uses values {0, 3, 255}; pretend dataset ids 0->7, 3->1
    lut = stuff_remap_lut({0: 7, 3: 1}, ignore_label=255)
    mapper = COCOSemanticLSJDatasetMapper(
        image_size=256, min_scale=0.5, max_scale=2.0,
        size_divisibility=32, max_gt=10, seed=0, dataset_id_remap=lut,
    )
    out = mapper(synthetic_semantic_dataset[0])
    assert out["image"].shape == (256, 256, 3)
    assert out["image"].dtype == np.uint8
    assert out["sem_seg_map"].shape == (256, 256)
    present = set(np.unique(out["sem_seg_map"]))
    assert present <= {1, 7, 255}               # remapped ids only
    got = set(out["labels"][out["valid"]])
    assert got <= {1, 7} and len(got) >= 1


def test_stuff_remap_lut_removed_classes():
    from autofocusformermod_tpu.data.mapper_semantic import (
        _COCO_STUFF_REMOVED_DATASET_IDS,
        stuff_remap_lut,
    )
    from autofocusformermod_tpu.data.datasets_coco import COCO_STUFF_171_IDS

    mapping = {k - 1: i for i, k in enumerate(COCO_STUFF_171_IDS)}
    lut = stuff_remap_lut(mapping, 255)
    # all 171 kept classes map to contiguous [0, 171)
    kept = sorted(lut[k - 1] for k in COCO_STUFF_171_IDS)
    assert kept == list(range(171))
    # the 11 removed caffe-shifted ids map to ignore even if present in the
    # metadata mapping (reference coco_semantic_dataset_mapper2.py:97-107)
    for did in _COCO_STUFF_REMOVED_DATASET_IDS:
        assert lut[did] == 255
    assert lut[255] == 255


def test_coco_stuff_171_registration():
    from autofocusformermod_tpu.data.catalog import MetadataCatalog
    from autofocusformermod_tpu.data.datasets import register_all_builtin

    register_all_builtin()
    meta = MetadataCatalog.get("coco_2017_train_stuff_sem_seg")
    mapping = meta.get("stuff_dataset_id_to_contiguous_id")
    assert mapping and len(mapping) == 171
    assert len(meta.get("stuff_classes")) == 171
    assert meta.get("ignore_label") == 255
