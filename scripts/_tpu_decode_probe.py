import sys; sys.path.insert(0, "/root/repo")
import numpy as np, time, jax, jax.numpy as jnp
from alpha_yolo_quant_tpu.config import QuantConfig
from alpha_yolo_quant_tpu.models.graph import build_yolov8_graph
from alpha_yolo_quant_tpu.models.params import init_params
from alpha_yolo_quant_tpu.quantize.calibrate import collect_stats, reduce_stats
from alpha_yolo_quant_tpu.quantize.transform import build_quantized_model
from alpha_yolo_quant_tpu.runtime.interpreter import quantize_input, int_forward, device_plan
from alpha_yolo_quant_tpu.ops.intmath import requantize_i32

def bench(name, fn, *args, iters=10):
    out = fn(*args); jax.block_until_ready(out)
    t=time.time()
    for _ in range(iters): out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name}: {(time.time()-t)/iters*1000:.2f} ms", flush=True)
    return out

B=16
cfg = QuantConfig(k=8, full_quant=True, image_size=640)
g = build_yolov8_graph(cfg); p = init_params(g, seed=0)
calib = np.random.default_rng(1).uniform(0,1,(1,3,640,640)).astype(np.float32)
max_a = reduce_stats(collect_stats(g, p, [calib]), "max")
qm = build_quantized_model(g, p, max_a, cfg)
plan = device_plan(qm)
print("cls lut gather fallback:", plan["head"]["cls_sig_lut"].use_gather,
      "corrections:", len(plan["head"]["cls_sig_lut"].corrections), flush=True)
print("exp lut gather fallback:", plan["head"]["exp_lut"].use_gather,
      "corrections:", len(plan["head"]["exp_lut"].corrections), flush=True)
x = jnp.asarray(np.random.default_rng(2).uniform(0,1,(B,3,640,640)).astype(np.float32))
outs = jax.jit(lambda a: int_forward(qm, plan, a))(quantize_input(x, 8))
jax.block_until_ready(outs)
h = qm.head; hp = plan["head"]
# piecewise decode
def box_req(o):
    return [requantize_i32(o[f"{l}_box"], hp["box_r"][l], hp["box_s"][l], 127) for l in ("p3","p4","p5")]
def cls_req(o):
    return [requantize_i32(o[f"{l}_cls"], hp["cls_r"][l], hp["cls_s"][l], 2**15-1) for l in ("p3","p4","p5")]
bench("box requant", jax.jit(box_req), outs)
cq = bench("cls requant", jax.jit(cls_req), outs)
bench("cls sigmoid lut", jax.jit(lambda c: [hp["cls_sig_lut"].apply(t) for t in c]), cq)
def reshape_cat(o):
    return jnp.concatenate([requantize_i32(o[f"{l}_box"], hp["box_r"][l], hp["box_s"][l], 127).reshape(B,64,-1) for l in ("p3","p4","p5")], 2)
box = bench("box requant+cat", jax.jit(reshape_cat), outs)
def softmax_part(bx):
    bins = bx.reshape(B,4,16,-1).transpose(0,2,1,3)
    y = bins - jnp.max(bins, axis=1, keepdims=True)
    e = hp["exp_lut"].apply(y)
    ssum = jnp.maximum(jnp.sum(e, axis=1, keepdims=True),1)
    ne = 127*e
    q0 = jnp.floor(ne.astype(jnp.float32)/ssum.astype(jnp.float32)).astype(jnp.int32)
    r = ne - q0*ssum
    return q0 + (r>=ssum).astype(jnp.int32) - (r<0).astype(jnp.int32)
bench("softmax", jax.jit(softmax_part), box)
from alpha_yolo_quant_tpu.runtime.interpreter import decode_full_quant
bench("decode_full total", jax.jit(lambda o: decode_full_quant(qm, plan, o)), outs)
