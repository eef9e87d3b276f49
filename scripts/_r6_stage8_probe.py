"""Exploratory: run reference stage_7 + stage_8/8b from the mount on our
synthetic artifacts; compare packed dicts and final detections vs our
interpreter (per_image_amax). CPU only.

env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
    python scripts/_r6_stage8_probe.py [full]
"""
import os
import sys
import tempfile

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")
os.environ["JAX_PLATFORMS"] = "cpu"

import numpy as np

full = len(sys.argv) > 1 and sys.argv[1] == "full"

import reference_stage6 as rs6
import reference_stage8 as rs8

from alpha_yolo_quant_tpu.config import QuantConfig
from alpha_yolo_quant_tpu.models.graph import build_yolov8_graph
from alpha_yolo_quant_tpu.models.params import init_params
from alpha_yolo_quant_tpu.quantize.calibrate import collect_stats, reduce_stats
from alpha_yolo_quant_tpu.quantize.transform import build_quantized_model
from alpha_yolo_quant_tpu.export.pickles import packed_state_dict

cfg = QuantConfig(model="yolov8n", k=8, image_size=640, full_quant=full)
graph = build_yolov8_graph(cfg)
params = init_params(graph, seed=3)
img = rs6.golden_image()
max_a = reduce_stats(collect_stats(graph, params, [img]), "max")
model = build_quantized_model(graph, params, max_a, cfg)

tmp = tempfile.mkdtemp(prefix="stage8probe_")
print("tmp:", tmp)
main = rs8.write_runtime_inputs(tmp, model, params, k=8, full=full)

# ---- stage 7 ----
m7 = rs8.run_stage(tmp, "stage_7", k=8)
import torch

ref_sd = torch.load(os.path.join(main, "results", "QUANT_WEIGHTS_8.pickle"),
                    map_location="cpu")
ours_sd = packed_state_dict(model, params)
print("stage_7 keys:", len(ref_sd), "ours:", len(ours_sd))
bad = 0
for k_, v in ref_sd.items():
    a = v.numpy()
    b = np.asarray(ours_sd[k_], np.float32).reshape(a.shape)
    if not np.array_equal(a, b):
        bad += 1
        print("  MISMATCH", k_, a.shape, np.abs(a - b).max())
print("stage_7 packed-dict mismatches:", bad)

# ---- stage 8 ----
leaf = "stage_8_torch_full_quant" if full else "stage_8_torch"
m8 = rs8.run_stage(tmp, leaf, k=8, golden_img=img)
with torch.no_grad():
    if full:
        timg = m8.img
    else:
        timg = torch.from_numpy(img.copy())
    boxes_r, classes_r = m8.model(timg)
print("reference detections:", None if boxes_r is None else boxes_r.shape)
if boxes_r is not None:
    br = boxes_r.numpy()
    cr = classes_r.numpy()
    print("ref first rows:\n", np.c_[br[:5], cr[:5]])

# ---- ours ----
import jax.numpy as jnp

from alpha_yolo_quant_tpu.postprocess.nms import NmsParams, scale_boxes
from alpha_yolo_quant_tpu.runtime.interpreter import (
    EngineOptions, build_int_pipeline, eval_nms_params,
)

if full:
    nmsp = eval_nms_params(model, 0.25)   # 8192 int threshold
else:
    nmsp = NmsParams(conf_thres=1e-8, pre_topk=None)
fn, _ = build_int_pipeline(model, dfl_w_float=params["dfl"]["w"],
                           nms_params=nmsp,
                           options=EngineOptions(per_image_amax=True))
det, n = fn(jnp.asarray(img))
n = int(np.asarray(n)[0])
rows = np.asarray(det)[0][:n]
bo = scale_boxes((640, 640), rows[:, :4], (640, 640))
print("ours detections:", n)
print("our first rows:\n", np.c_[np.asarray(bo)[:5], rows[:5, 4:6]])

if boxes_r is not None:
    nr = br.shape[0]
    print("counts ref/ours:", nr, n)
    mn = min(nr, n)
    db = np.abs(br[:mn] - np.asarray(bo)[:mn])
    dc = np.abs(cr[:mn, 0] - rows[:mn, 4])
    dk = np.abs(cr[:mn, 1] - rows[:mn, 5])
    print("max box diff:", db.max(), "max conf diff:", dc.max(),
          "max cls diff:", dk.max())
