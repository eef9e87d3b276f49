"""Shared synthetic-dataset helper for tests."""

import json

import numpy as np

from alpha_yolo_quant_tpu.eval.records import COCO_NAMES

RNG = np.random.default_rng(123)


def write_synthetic_coco(tmp_path, n_images=5):
    from PIL import Image

    img_dir = tmp_path / "images"
    img_dir.mkdir(exist_ok=True)
    images, annotations = [], []
    aid = 1
    for i in range(n_images):
        w, h = 96, 80
        Image.fromarray(RNG.integers(0, 255, (h, w, 3),
                                     dtype=np.uint8)).save(
            img_dir / f"{i:012d}.jpg")
        images.append({"id": i, "file_name": f"{i:012d}.jpg",
                       "height": h, "width": w})
        x, y = RNG.uniform(5, 40, 2)
        bw, bh = RNG.uniform(15, 30, 2)
        annotations.append({"id": aid, "image_id": i, "category_id": 18,
                            "bbox": [float(x), float(y), float(bw),
                                     float(bh)], "iscrowd": 0})
        aid += 1
    cats = [{"id": cid, "name": COCO_NAMES[j]}
            for j, cid in enumerate(range(1, 81))]
    ann_path = tmp_path / "instances.json"
    ann_path.write_text(json.dumps({"images": images,
                                    "annotations": annotations,
                                    "categories": cats}))
    return str(img_dir), str(ann_path)
