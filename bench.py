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
    fn, _ = build_int_pipeline(model, engine="auto")

    import jax.numpy as jnp

    # Chain iterations through a data dependency and fetch a scalar at the
    # end: the remote executor reports buffers "ready" lazily, so plain
    # block_until_ready over repeated identical calls can under-measure.
    @jax.jit
    def chained(images, n_iters):
        def body(i, carry):
            imgs, acc = carry
            det, n_det = step_inner(imgs)
            probe = det[0, 0, 0]
            imgs = jnp.where(probe > 1e30, imgs + 1.0, imgs)
            return (imgs, acc + probe)
        (_, acc) = jax.lax.fori_loop(0, n_iters, body, (images,
                                                        jnp.float32(0)))
        return acc

    step_inner = fn
    images = np.random.default_rng(0).uniform(
        0, 1, (BATCH, 3, cfg.image_size, cfg.image_size)).astype(np.float32)
    images = jax.device_put(images)

    float(chained(images, WARMUP))          # compile + warm
    t0 = time.perf_counter()
    float(chained(images, ITERS))           # host fetch forces completion
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
