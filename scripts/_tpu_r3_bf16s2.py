"""A/B the auto-flavor stride-2 bf16 conv (AUTO_BF16_S2): the round-3
profiler trace showed the s8-path stride-2 convs at 2-3% MXU (stem
2.97 ms, P2-s2 2.40+1.18 ms — the worst layers in the net); the
stride-1-only bf16 restriction came from a round-1 micro with ~3 ms of
harness artifact per number.
"""
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

import numpy as np
import jax
import jax.numpy as jnp

from _slope import slope_time
from alpha_yolo_quant_tpu.config import QuantConfig
from alpha_yolo_quant_tpu.models.graph import build_yolov8_graph
from alpha_yolo_quant_tpu.models.params import init_params
from alpha_yolo_quant_tpu.quantize.calibrate import (
    collect_stats, reduce_stats,
)
from alpha_yolo_quant_tpu.quantize.transform import build_quantized_model
from alpha_yolo_quant_tpu.runtime import interpreter as it

print("backend:", jax.devices()[0].platform, flush=True)

B = 128
cfg = QuantConfig(model="yolov8n", k=8, full_quant=True, image_size=640)
graph = build_yolov8_graph(cfg)
params = init_params(graph, seed=0)
rng = np.random.default_rng(1)
calib = rng.uniform(0, 1, (2, 3, 640, 640)).astype(np.float32)
max_a = reduce_stats(collect_stats(graph, params, [calib]), "max")
model = build_quantized_model(graph, params, max_a, cfg)
plan = device_plan = it.device_plan(model)

n_s2 = sum(1 for c in model.convs.values()
           if c.node.kernel == 3 and c.node.stride == 2
           and c.bf16_single_ok)
print("bf16-eligible stride-2 3x3 layers:", n_s2, flush=True)

images = jax.device_put(rng.uniform(0, 1, (B, 3, 640, 640)).astype(
    np.float32))


def make_fwd():
    def fwd(imgs):
        xq = it.quantize_input(imgs, 8, out_dtype=jnp.bfloat16)
        return it.int_forward(model, plan, xq, engine="auto",
                              head_requant=True)
    return fwd


it.AUTO_BF16_S2 = False
fwd_off = jax.jit(make_fwd())
o_off = fwd_off(images[:2])
it.AUTO_BF16_S2 = True
fwd_on = jax.jit(make_fwd())
o_on = fwd_on(images[:2])
ok = all(np.array_equal(np.asarray(o_off[r]).astype(np.int64),
                        np.asarray(o_on[r]).astype(np.int64))
         for r in model.graph.outputs)
print("s2-bf16 == s8 on TPU (B=2):", ok, flush=True)

it.AUTO_BF16_S2 = False
slope_time("fwd s2=s8  (current)", make_fwd(), images)
it.AUTO_BF16_S2 = True
slope_time("fwd s2=bf16 (probe) ", make_fwd(), images)

# e2e with the flag on
it.AUTO_BF16_S2 = True
fn_on, _ = it.build_int_pipeline(model, engine="auto")
slope_time("e2e s2=bf16         ", fn_on, images)
print("done", flush=True)
