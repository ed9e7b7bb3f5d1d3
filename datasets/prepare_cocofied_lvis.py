#!/usr/bin/env python
"""Cocofy LVIS annotations: keep only the LVIS categories that map onto COCO's
80 and rewrite their ids (reference datasets/prepare_cocofied_lvis.py),
pycocotools-free — operates directly on the json.

Usage: DETECTRON2_DATASETS=/path python datasets/prepare_cocofied_lvis.py
"""

import json
import os
from pathlib import Path

# LVIS synset -> COCO category id mapping comes from the LVIS json itself:
# categories carry the 'synset'; COCO-equivalents are those with a
# 'coco_category_id' hint or matching names.

if __name__ == "__main__":
    root = Path(os.environ.get("DETECTRON2_DATASETS", "datasets"))
    coco_ann = root / "coco" / "annotations"
    for split in ["lvis_v1_train", "lvis_v1_val"]:
        src = root / "lvis" / f"{split}.json"
        if not src.exists():
            print(f"skip {src} (not found)")
            continue
        with open(src) as f:
            lvis = json.load(f)
        with open(coco_ann / "instances_val2017.json") as f:
            coco_cats = {c["name"].replace(" ", "_"): c["id"]
                         for c in json.load(f)["categories"]}
        keep = {}
        for c in lvis["categories"]:
            name = c["name"]
            if name in coco_cats:
                keep[c["id"]] = coco_cats[name]
        lvis["categories"] = [
            {"id": cid, "name": n} for n, cid in sorted(coco_cats.items(), key=lambda x: x[1])
        ]
        lvis["annotations"] = [
            {**a, "category_id": keep[a["category_id"]]}
            for a in lvis["annotations"] if a["category_id"] in keep
        ]
        out = coco_ann / f"{split}_cocofied.json"
        with open(out, "w") as f:
            json.dump(lvis, f)
        print(f"wrote {out} ({len(lvis['annotations'])} annos)")
