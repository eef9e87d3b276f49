"""Eval-harness wall-clock validation on TPU: 512 synthetic COCO images
through the full int8 pipeline at batch 64 via eval.harness.evaluate —
reports device img/s vs host-inclusive wall img/s (target: wall within
2x of device)."""
import sys; sys.path.insert(0, "/root/repo")  # noqa: E702
import numpy as np
import jax

from alpha_yolo_quant_tpu.config import QuantConfig
from alpha_yolo_quant_tpu.data.coco import CocoValDataset
from alpha_yolo_quant_tpu.eval.harness import evaluate
from alpha_yolo_quant_tpu.models.graph import build_yolov8_graph
from alpha_yolo_quant_tpu.models.params import init_params
from alpha_yolo_quant_tpu.quantize.calibrate import (
    collect_stats, reduce_stats,
)
from alpha_yolo_quant_tpu.quantize.transform import build_quantized_model
from alpha_yolo_quant_tpu.runtime.interpreter import build_int_pipeline

print("backend:", jax.default_backend(), flush=True)
cfg = QuantConfig(model="yolov8n", k=8, full_quant=True, image_size=640)
graph = build_yolov8_graph(cfg)
params = init_params(graph, seed=0)
calib = np.random.default_rng(1).uniform(
    0, 1, (2, 3, 640, 640)).astype(np.float32)
max_a = reduce_stats(collect_stats(graph, params, [calib]), "max")
model = build_quantized_model(graph, params, max_a, cfg)
fn, _ = build_int_pipeline(model, engine="auto")
step = jax.jit(fn)

ds = CocoValDataset("/tmp/synth_coco/images", "/tmp/synth_coco/instances.json")
print("dataset:", len(ds), "images", flush=True)
for pf in (False, True):
    res = evaluate(step, ds, batch_size=64, image_size=640, prefetch=pf)
    print(f"prefetch={pf}: mAP50-95={res.map50_95:.4f}  "
          f"device={res.images_per_s:.1f} img/s  "
          f"wall={res.images_per_s_wall:.1f} img/s  "
          f"ratio={res.images_per_s / max(res.images_per_s_wall, 1e-9):.2f}x"
          f"  wall_s={res.wall_s:.1f}", flush=True)
print("done", flush=True)
