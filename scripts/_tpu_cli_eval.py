import sys; sys.path.insert(0, "/root/repo"); sys.path.insert(0, "/root/repo/tests")
import os, numpy as np
# build a synthetic COCO dir with 64 images at 640-ish sizes
import json
from PIL import Image
from alpha_yolo_quant_tpu.eval.records import COCO_NAMES
rng = np.random.default_rng(0)
base = "/tmp/synth_coco"
os.makedirs(base + "/images", exist_ok=True)
images, annotations = [], []
aid = 1
for i in range(64):
    w, h = 640, 480
    Image.fromarray(rng.integers(0,255,(h,w,3),dtype=np.uint8)).save(f"{base}/images/{i:012d}.jpg")
    images.append({"id": i, "file_name": f"{i:012d}.jpg", "height": h, "width": w})
    annotations.append({"id": aid, "image_id": i, "category_id": 18,
                        "bbox": [100.0, 100.0, 120.0, 90.0], "iscrowd": 0}); aid += 1
cats = [{"id": c, "name": COCO_NAMES[j]} for j, c in enumerate(range(1, 81))]
json.dump({"images": images, "annotations": annotations, "categories": cats},
          open(f"{base}/instances.json", "w"))

from alpha_yolo_quant_tpu import cli
out = "/tmp/synth_art/8_nano"
cli.main(["prepare", "--out", out])
wpath = out + "/results/weights_batchnf.npz"
cli.main(["calibrate", "--out", out, "--weights", wpath,
          "--coco-images", base + "/images", "--coco-ann", base + "/instances.json",
          "--batch-size", "8", "--limit", "16"])
cli.main(["eval-int8", "--out", out, "--weights", wpath,
          "--max-a", out + "/results/max_a.txt", "--full-quant",
          "--engine", "s8", "--prefetch",
          "--coco-images", base + "/images", "--coco-ann", base + "/instances.json",
          "--batch-size", "16"])
print(open(out + "/results/runs_val/results.txt").read(), flush=True)
