import sys; sys.path.insert(0, "/root/repo")
import numpy as np, time, jax, jax.numpy as jnp
from alpha_yolo_quant_tpu.config import QuantConfig
from alpha_yolo_quant_tpu.models.graph import build_yolov8_graph
from alpha_yolo_quant_tpu.models.params import init_params
from alpha_yolo_quant_tpu.quantize.calibrate import collect_stats, reduce_stats
from alpha_yolo_quant_tpu.quantize.transform import build_quantized_model
from alpha_yolo_quant_tpu.runtime.interpreter import quantize_input, int_forward, device_plan, build_int_pipeline

def bench(name, fn, *args, iters=10):
    out = fn(*args); jax.block_until_ready(out)
    t=time.time()
    for _ in range(iters): out = fn(*args)
    jax.block_until_ready(out)
    dt=(time.time()-t)/iters*1000
    print(f"{name}: {dt:.2f} ms", flush=True)
    return out, dt

cfg = QuantConfig(k=8, full_quant=True, image_size=640)
g = build_yolov8_graph(cfg); p = init_params(g, seed=0)
calib = np.random.default_rng(1).uniform(0,1,(1,3,640,640)).astype(np.float32)
max_a = reduce_stats(collect_stats(g, p, [calib]), "max")
qm = build_quantized_model(g, p, max_a, cfg)
plan = device_plan(qm, pallas=True)
x16 = jnp.asarray(np.random.default_rng(2).uniform(0,1,(16,3,640,640)).astype(np.float32))
xq = jax.jit(lambda a: quantize_input(a,8))(x16)
o1,_ = bench("fwd s8      b16", jax.jit(lambda a: int_forward(qm, plan, a, engine="s8")), xq)
o2,_ = bench("fwd fused   b16", jax.jit(lambda a: int_forward(qm, plan, a, engine="fused")), xq)
for r in qm.graph.outputs:
    assert np.array_equal(np.asarray(o1[r],dtype=np.int64), np.asarray(o2[r],dtype=np.int64)), r
print("parity ok", flush=True)
fn, _ = build_int_pipeline(qm, engine="fused"); e2e = jax.jit(fn)
x64 = jnp.asarray(np.random.default_rng(3).uniform(0,1,(64,3,640,640)).astype(np.float32))
_, dt = bench("e2e fused b64", e2e, x64, iters=5)
print("img/s b64:", 64/dt*1000, flush=True)
x128 = jnp.asarray(np.random.default_rng(4).uniform(0,1,(128,3,640,640)).astype(np.float32))
_, dt = bench("e2e fused b128", e2e, x128, iters=5)
print("img/s b128:", 128/dt*1000, flush=True)
