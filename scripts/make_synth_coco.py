"""Generate a synthetic local-COCO dataset (JPEG images + instances
json) for eval-harness wall-clock validation when no real COCO-val is
mounted. Usage: python scripts/make_synth_coco.py <dir> <n_images>"""
import json
import os
import sys

import numpy as np
from PIL import Image

out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/synth_coco"
n = int(sys.argv[2]) if len(sys.argv) > 2 else 512
img_dir = os.path.join(out, "images")
os.makedirs(img_dir, exist_ok=True)
rng = np.random.default_rng(0)

cats = [{"id": i + 1, "name": f"c{i}"} for i in range(80)]
images, annotations = [], []
aid = 1
for i in range(n):
    h, w = int(rng.integers(360, 640)), int(rng.integers(420, 640))
    arr = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    name = f"{i:06d}.jpg"
    Image.fromarray(arr).save(os.path.join(img_dir, name), quality=80)
    images.append({"id": i, "file_name": name, "height": h, "width": w})
    for _ in range(int(rng.integers(1, 6))):
        bw, bh = rng.uniform(20, w / 2), rng.uniform(20, h / 2)
        x, y = rng.uniform(0, w - bw), rng.uniform(0, h - bh)
        annotations.append({
            "id": aid, "image_id": i,
            "category_id": int(rng.integers(1, 81)),
            "bbox": [float(x), float(y), float(bw), float(bh)],
            "area": float(bw * bh), "iscrowd": 0})
        aid += 1

with open(os.path.join(out, "instances.json"), "w") as f:
    json.dump({"images": images, "annotations": annotations,
               "categories": cats}, f)
print(f"wrote {n} images + {aid-1} annotations to {out}")
