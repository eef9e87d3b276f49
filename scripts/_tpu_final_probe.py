import sys; sys.path.insert(0, "/root/repo")
import numpy as np, time, jax, jax.numpy as jnp
from jax import lax
from alpha_yolo_quant_tpu.config import QuantConfig
from alpha_yolo_quant_tpu.models.graph import build_yolov8_graph
from alpha_yolo_quant_tpu.models.params import init_params
from alpha_yolo_quant_tpu.quantize.calibrate import collect_stats, reduce_stats
from alpha_yolo_quant_tpu.quantize.transform import build_quantized_model
from alpha_yolo_quant_tpu.runtime.interpreter import (
    quantize_input, int_forward, device_plan, decode_full_quant)

def chained(name, f, a0, iters=8):
    @jax.jit
    def run(a):
        def body(i, c):
            a, acc = c
            o = f(a)
            leaf = jax.tree_util.tree_leaves(o)[0]
            pr = leaf.reshape(-1)[0].astype(jnp.float32)
            a = jnp.where(pr > 1e30, a + 1.0, a)
            return (a, acc + pr)
        a, acc = lax.fori_loop(0, iters, body, (a, jnp.float32(0)))
        return acc
    r = run(a0); r.block_until_ready()
    t=time.time(); v=float(run(a0))
    print(f"{name}: {(time.time()-t)/iters*1000:.2f} ms", flush=True)

B=128
cfg = QuantConfig(k=8, full_quant=True, image_size=640)
g = build_yolov8_graph(cfg); p = init_params(g, seed=0)
max_a = reduce_stats(collect_stats(g, p, [np.random.default_rng(1).uniform(0,1,(1,3,640,640)).astype(np.float32)]), "max")
qm = build_quantized_model(g, p, max_a, cfg)
plan = device_plan(qm)
x = jnp.asarray(np.random.default_rng(2).uniform(0,1,(B,3,640,640)).astype(np.float32))
chained("quantize_input b128      ", lambda a: quantize_input(a, 8), x)
chained("fwd auto b128            ", lambda a: int_forward(qm, plan, quantize_input(a,8), engine="auto"), x)
chained("fwd+decode b128          ", lambda a: decode_full_quant(qm, plan, int_forward(qm, plan, quantize_input(a,8), engine="auto"), sigmoid_cls=False), x)
