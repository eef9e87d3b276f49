import sys; sys.path.insert(0, "/root/repo")
import numpy as np, time, jax, jax.numpy as jnp
from jax import lax
from alpha_yolo_quant_tpu.config import QuantConfig
from alpha_yolo_quant_tpu.models.graph import build_yolov8_graph
from alpha_yolo_quant_tpu.models.params import init_params
from alpha_yolo_quant_tpu.quantize.calibrate import collect_stats, reduce_stats
from alpha_yolo_quant_tpu.quantize.transform import build_quantized_model
from alpha_yolo_quant_tpu.runtime.interpreter import build_int_pipeline

cfg = QuantConfig(k=8, full_quant=True, image_size=640)
g = build_yolov8_graph(cfg); p = init_params(g, seed=0)
max_a = reduce_stats(collect_stats(g, p, [np.random.default_rng(1).uniform(0,1,(1,3,640,640)).astype(np.float32)]), "max")
qm = build_quantized_model(g, p, max_a, cfg)
fn, _ = build_int_pipeline(qm, engine="auto")
B = 128
x = jnp.asarray(np.random.default_rng(2).uniform(0,1,(B,3,640,640)).astype(np.float32))

@jax.jit
def run(a, n):
    def body(i, c):
        a, acc = c
        det, nd = fn(a)
        pr = det[0,0,0]
        a = jnp.where(pr > 1e30, a + 1.0, a)
        return (a, acc + pr)
    a, acc = lax.fori_loop(0, n, body, (a, jnp.float32(0)))
    return acc

r = run(x, 2); r.block_until_ready()
t=time.time(); v=float(run(x, 10))
dt = (time.time()-t)/10*1000
print(f"full pipeline chained b128: {dt:.2f} ms -> {B/dt*1000:.0f} img/s", flush=True)
