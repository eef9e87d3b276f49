import sys; sys.path.insert(0, "/root/repo")
import numpy as np, time, jax, jax.numpy as jnp
t0=time.time()
def lap(msg): print(f"{msg}: {time.time()-t0:.1f}s", flush=True)
from alpha_yolo_quant_tpu.config import QuantConfig
from alpha_yolo_quant_tpu.models.graph import build_yolov8_graph
from alpha_yolo_quant_tpu.models.params import init_params
from alpha_yolo_quant_tpu.quantize.calibrate import collect_stats, reduce_stats
from alpha_yolo_quant_tpu.quantize.transform import build_quantized_model
from alpha_yolo_quant_tpu.runtime.interpreter import build_int_pipeline, quantize_input, int_forward, device_plan
print("devices", jax.devices(), flush=True)
lap("imports")
cfg = QuantConfig(k=8, full_quant=True, image_size=640)
g = build_yolov8_graph(cfg)
p = init_params(g, seed=0)
calib = np.random.default_rng(1).uniform(0,1,(2,3,640,640)).astype(np.float32)
lap("setup")
max_a = reduce_stats(collect_stats(g, p, [calib]), "max")
lap("calibration")
qm = build_quantized_model(g, p, max_a, cfg)
lap("transform")
plan = device_plan(qm)
xq = quantize_input(jnp.asarray(calib[:1]), 8)
outs = jax.jit(lambda x: int_forward(qm, plan, x))(xq)
jax.block_until_ready(outs)
lap("int_forward compile+run")
fn, _ = build_int_pipeline(qm)
step = jax.jit(fn)
x = jnp.asarray(np.random.default_rng(2).uniform(0,1,(16,3,640,640)).astype(np.float32))
out = step(x); jax.block_until_ready(out)
lap("pipeline compile+first")
t1=time.time()
for _ in range(5): out = step(x)
jax.block_until_ready(out)
print("int8 interp img/s:", 16*5/(time.time()-t1), flush=True)
