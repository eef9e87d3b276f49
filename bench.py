"""Headline benchmark: end-to-end YOLOv8n inference throughput on one chip.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": "img/s",
"vs_baseline": N} where baseline is the BASELINE.json target of
2,000 img/s/chip int8 on v5e-1.

Runs the best available runtime: the fused int8 engine once the quantized
runtime lands; fp32 graph forward + decode + batched NMS until then.
"""

import json
import time

import numpy as np

BASELINE_IMG_S = 2000.0
BATCH = 128
WARMUP = 3
ITERS = 10


def main():
    import jax

    from alpha_yolo_quant_tpu.config import QuantConfig
    from alpha_yolo_quant_tpu.models.graph import build_yolov8_graph
    from alpha_yolo_quant_tpu.models.params import init_params
    from alpha_yolo_quant_tpu.quantize.calibrate import (
        collect_stats, reduce_stats,
    )
    from alpha_yolo_quant_tpu.quantize.transform import build_quantized_model
    from alpha_yolo_quant_tpu.runtime.interpreter import build_int_pipeline

    cfg = QuantConfig(model="yolov8n", k=8, full_quant=True)
    graph = build_yolov8_graph(cfg)
    params = init_params(graph, seed=0)
    metric = "yolov8n_640_int8_e2e"

    calib = np.random.default_rng(1).uniform(
        0, 1, (2, 3, cfg.image_size, cfg.image_size)).astype(np.float32)
    max_a = reduce_stats(collect_stats(graph, params, [calib]), "max")
    model = build_quantized_model(graph, params, max_a, cfg)
    fn, _ = build_int_pipeline(model, engine="s8")
    step = jax.jit(fn)

    images = np.random.default_rng(0).uniform(
        0, 1, (BATCH, 3, cfg.image_size, cfg.image_size)).astype(np.float32)
    images = jax.device_put(images)

    for _ in range(WARMUP):
        jax.block_until_ready(step(images))
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = step(images)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0

    img_s = BATCH * ITERS / dt
    print(json.dumps({
        "metric": metric,
        "value": round(img_s, 2),
        "unit": "img/s",
        "vs_baseline": round(img_s / BASELINE_IMG_S, 4),
    }))


if __name__ == "__main__":
    main()
