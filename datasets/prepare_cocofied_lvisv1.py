#!/usr/bin/env python
"""Cocofy LVIS **v1** annotations (reference datasets/prepare_cocofied_lvisv1.py).

Unlike the v0.5 script (prepare_cocofied_lvis.py, name-matching), v1 maps LVIS
categories onto COCO's 80 through WordNet SYNSETS — the official
coco_to_synset.json correspondence from the LVIS API — and additionally:

  - drops images whose ``coco_url`` points at train2017 (v1 val overlaps the
    COCO train split; evaluation must not leak training images),
  - renumbers image and annotation ids contiguously from 1,
  - rewrites per-image ``not_exhaustive_category_ids`` / ``neg_category_ids``
    into COCO ids, keeping only mapped categories,
  - keeps only categories that end up with at least one instance.

Usage: DETECTRON2_DATASETS=/path python datasets/prepare_cocofied_lvisv1.py
"""

import json
import os
from pathlib import Path

# Official LVIS synset <-> COCO category-id correspondence
# (github.com/lvis-dataset/lvis-api data/coco_to_synset.json — public
# mapping data, same constant the reference embeds).
SYNSET_TO_COCO_ID = {
    "person.n.01": 1, "bicycle.n.01": 2, "car.n.01": 3, "motorcycle.n.01": 4,
    "airplane.n.01": 5, "bus.n.01": 6, "train.n.01": 7, "truck.n.01": 8,
    "boat.n.01": 9, "traffic_light.n.01": 10, "fireplug.n.01": 11,
    "stop_sign.n.01": 13, "parking_meter.n.01": 14, "bench.n.01": 15,
    "bird.n.01": 16, "cat.n.01": 17, "dog.n.01": 18, "horse.n.01": 19,
    "sheep.n.01": 20, "beef.n.01": 21, "elephant.n.01": 22, "bear.n.01": 23,
    "zebra.n.01": 24, "giraffe.n.01": 25, "backpack.n.01": 27,
    "umbrella.n.01": 28, "bag.n.04": 31, "necktie.n.01": 32, "bag.n.06": 33,
    "frisbee.n.01": 34, "ski.n.01": 35, "snowboard.n.01": 36, "ball.n.06": 37,
    "kite.n.03": 38, "baseball_bat.n.01": 39, "baseball_glove.n.01": 40,
    "skateboard.n.01": 41, "surfboard.n.01": 42, "tennis_racket.n.01": 43,
    "bottle.n.01": 44, "wineglass.n.01": 46, "cup.n.01": 47, "fork.n.01": 48,
    "knife.n.01": 49, "spoon.n.01": 50, "bowl.n.03": 51, "banana.n.02": 52,
    "apple.n.01": 53, "sandwich.n.01": 54, "orange.n.01": 55,
    "broccoli.n.02": 56, "carrot.n.03": 57, "frank.n.02": 58, "pizza.n.01": 59,
    "doughnut.n.02": 60, "cake.n.03": 61, "chair.n.01": 62, "sofa.n.01": 63,
    "pot.n.04": 64, "bed.n.01": 65, "dining_table.n.01": 67, "toilet.n.02": 70,
    "television_receiver.n.01": 72, "laptop.n.01": 73, "mouse.n.04": 74,
    "remote_control.n.01": 75, "computer_keyboard.n.01": 76,
    "cellular_telephone.n.01": 77, "microwave.n.02": 78, "oven.n.01": 79,
    "toaster.n.02": 80, "sink.n.01": 81, "electric_refrigerator.n.01": 82,
    "book.n.01": 84, "clock.n.01": 85, "vase.n.01": 86, "scissors.n.01": 87,
    "teddy.n.01": 88, "hand_blower.n.01": 89, "toothbrush.n.01": 90,
}


def cocofy_lvis_v1(src: Path, dst: Path) -> None:
    with open(src) as f:
        lvis = json.load(f)

    cat_id_to_synset = {c["id"]: c["synset"] for c in lvis["categories"]}

    # images: drop train2017-derived, renumber, remap category-id lists
    new_images = []
    old_to_new_img = {}
    dropped = set()
    for img in lvis["images"]:
        split, file_name = img["coco_url"].split("/")[-2:]
        if split == "train2017":
            dropped.add(img["id"])
            continue
        new_id = len(new_images) + 1
        old_to_new_img[img["id"]] = new_id
        rec = dict(img, id=new_id, file_name=file_name)
        for key in ["not_exhaustive_category_ids", "neg_category_ids"]:
            rec[key] = sorted({
                SYNSET_TO_COCO_ID[cat_id_to_synset[cid]]
                for cid in img.get(key, [])
                if cat_id_to_synset.get(cid) in SYNSET_TO_COCO_ID
            })
        new_images.append(rec)

    # annotations: remap categories + image ids, renumber
    new_annos = []
    used_coco_ids = set()
    for ann in lvis["annotations"]:
        if ann["image_id"] in dropped:
            continue
        synset = cat_id_to_synset.get(ann["category_id"])
        if synset not in SYNSET_TO_COCO_ID:
            continue
        coco_id = SYNSET_TO_COCO_ID[synset]
        used_coco_ids.add(coco_id)
        new_annos.append(dict(
            ann,
            id=len(new_annos) + 1,
            category_id=coco_id,
            image_id=old_to_new_img[ann["image_id"]],
        ))

    new_categories = [
        dict(c, id=SYNSET_TO_COCO_ID[c["synset"]])
        for c in lvis["categories"]
        if c["synset"] in SYNSET_TO_COCO_ID
        and SYNSET_TO_COCO_ID[c["synset"]] in used_coco_ids
    ]

    out = dict(lvis, images=new_images, annotations=new_annos,
               categories=new_categories)
    with open(dst, "w") as f:
        json.dump(out, f)
    print(f"{src} -> {dst}: {len(new_images)} images, "
          f"{len(new_annos)} annos, {len(new_categories)} categories")


if __name__ == "__main__":
    root = Path(os.environ.get("DETECTRON2_DATASETS", "datasets")) / "lvis"
    for split in ["lvis_v1_val"]:
        src = root / f"{split}.json"
        if not src.exists():
            print(f"skip {src} (not found)")
            continue
        cocofy_lvis_v1(src, root / f"{split}_cocofied.json")
