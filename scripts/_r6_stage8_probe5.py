"""8b parity with a NOISE image (tie-free scores) + f64 exponent wrap:
does the exact-tail comparison become exact?

env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
    python scripts/_r6_stage8_probe5.py
"""
import os
import sys
import tempfile

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")
os.environ["JAX_PLATFORMS"] = "cpu"

import numpy as np
from PIL import Image

import reference_stage8 as rs8
import test_stage8_parity as tsp

from alpha_yolo_quant_tpu.config import QuantConfig
from alpha_yolo_quant_tpu.models.graph import build_yolov8_graph
from alpha_yolo_quant_tpu.models.params import init_params
from alpha_yolo_quant_tpu.quantize.calibrate import collect_stats, reduce_stats
from alpha_yolo_quant_tpu.quantize.transform import build_quantized_model

tmp = tempfile.mkdtemp(prefix="s8bn_")
rng = np.random.default_rng(7)
noise = rng.integers(0, 256, (640, 640, 3), np.uint8)
os.makedirs(os.path.join(tmp, "utils"), exist_ok=True)
Image.fromarray(noise).save(os.path.join(tmp, "utils", "cats_2_640.jpg"),
                            format="PNG")
img = (noise.astype(np.float32) / 255.0).transpose(2, 0, 1)[None]

cfg = QuantConfig(model="yolov8n", k=8, image_size=640, full_quant=True)
graph = build_yolov8_graph(cfg)
params = init_params(graph, seed=3)
max_a = reduce_stats(collect_stats(graph, params, [img]), "max")
model = build_quantized_model(graph, params, max_a, cfg)

rs8.write_runtime_inputs(tmp, model, params, k=8, full=True)
rs8.run_stage(tmp, "stage_7", k=8)
m8 = rs8.run_stage(tmp, "stage_8_torch_full_quant", k=8, golden_img=img)

ours = tsp._our_detections(model, params, img, full=True)
stock = tsp._ref_detections(m8, img)
print("stock:", stock.shape[0], "ours:", ours.shape[0])

tsp._wrap_f64(m8)
exact = tsp._ref_detections(m8, img)
print("exact-tail:", exact.shape[0], "ours:", ours.shape[0])

# score tie diagnostics
import torch

cap = {}
orig = m8.coord_quant


def rec(p):
    cap["plane"] = p.detach().numpy().copy()
    return orig(p)


m8.coord_quant = rec
with torch.no_grad():
    m8.model(torch.from_numpy(img.copy()))
m8.coord_quant = orig
cls = cap["plane"][0, 4:]
conf = cls.max(0)
top = np.sort(conf)[::-1][:1000]
print("unique top-1000 scores:", len(np.unique(top)))

mn = min(exact.shape[0], ours.shape[0])
if exact.shape[0] == ours.shape[0]:
    print("classes equal:", (exact[:, 5] == ours[:, 5]).all())
    print("conf maxreldiff:",
          np.abs(exact[:mn, 4] - ours[:mn, 4]).max())
    print("box maxdiff:", np.abs(exact[:mn, :4] - ours[:mn, :4]).max())
else:
    for i in range(mn):
        if not np.allclose(exact[i], ours[i], atol=1e-3):
            print("first diff row", i, "\n ref", exact[i], "\n our",
                  ours[i])
            break
