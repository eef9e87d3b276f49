import sys; sys.path.insert(0, "/root/repo")
import numpy as np, time, jax, jax.numpy as jnp
from alpha_yolo_quant_tpu.config import QuantConfig
from alpha_yolo_quant_tpu.models.graph import build_yolov8_graph
from alpha_yolo_quant_tpu.models.params import init_params
from alpha_yolo_quant_tpu.models.forward import forward_float
print("devices", jax.devices(), flush=True)
cfg = QuantConfig(k=8, image_size=640)
g = build_yolov8_graph(cfg)
p = init_params(g, seed=0)
x = jnp.asarray(np.random.default_rng(0).uniform(0,1,(1,3,640,640)).astype(np.float32))
t=time.time()
f1 = jax.jit(lambda pp, xx: forward_float(g, pp, xx)[0])
out = f1(p, x); jax.block_until_ready(out)
print("fwd no taps compile+run:", time.time()-t, flush=True)
t=time.time()
f2 = jax.jit(lambda pp, xx: forward_float(g, pp, xx, collect_taps=True)[1])
out = f2(p, x); jax.block_until_ready(out)
print("fwd WITH taps compile+run:", time.time()-t, flush=True)
