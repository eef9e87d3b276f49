import sys; sys.path.insert(0, "/root/repo")
import numpy as np, time, jax, jax.numpy as jnp
from jax import lax
from alpha_yolo_quant_tpu.config import QuantConfig
from alpha_yolo_quant_tpu.models.graph import build_yolov8_graph
from alpha_yolo_quant_tpu.models.params import init_params
from alpha_yolo_quant_tpu.quantize.calibrate import collect_stats, reduce_stats
from alpha_yolo_quant_tpu.quantize.transform import build_quantized_model
from alpha_yolo_quant_tpu.runtime.interpreter import build_int_pipeline
from alpha_yolo_quant_tpu.postprocess.nms import non_max_suppression, q_nms_params

cfg = QuantConfig(k=8, full_quant=True, image_size=640)
g = build_yolov8_graph(cfg); p = init_params(g, seed=0)
max_a = reduce_stats(collect_stats(g, p, [np.random.default_rng(1).uniform(0,1,(1,3,640,640)).astype(np.float32)]), "max")
qm = build_quantized_model(g, p, max_a, cfg)
fn_no, _ = build_int_pipeline(qm, engine="auto", with_nms=False)
B = 128
x = jnp.asarray(np.random.default_rng(2).uniform(0,1,(B,3,640,640)).astype(np.float32))

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

chained("pipeline w/o NMS", fn_no, x)
# NMS alone on realistic decode output distribution
preds = fn_no(x)
preds = jax.device_get(preds)
pj = jnp.asarray(preds)
from alpha_yolo_quant_tpu.runtime.interpreter import cls_int_conf_threshold
import dataclasses as dc
pnms = dc.replace(q_nms_params(qm.head.anchor_scale), conf_thres=cls_int_conf_threshold(qm))
chained("NMS alone (real preds)", lambda q: non_max_suppression(q, pnms), pj)
