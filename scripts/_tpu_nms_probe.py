import sys; sys.path.insert(0, "/root/repo")
import numpy as np, time, jax, jax.numpy as jnp
from jax import lax
from alpha_yolo_quant_tpu.postprocess import nms as N

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

B, NC, NA = 128, 80, 8400
rng = np.random.default_rng(0)
pred = np.zeros((B, 84, NA), np.float32)
pred[:, 0:2] = rng.uniform(1000, 200000, (B,2,NA))
pred[:, 2:4] = rng.uniform(1000, 60000, (B,2,NA))
pred[:, 4:] = rng.integers(0, 32768, (B,NC,NA))
x0 = jnp.asarray(pred)
p = N.q_nms_params(412.1635)

def sel_only(pr):
    return jax.vmap(lambda q: N._select_candidates(q, p.max_nms, jnp.float32(p.conf_thres), p.pre_topk))(pr)
chained("selection (top1000)      ", sel_only, x0)

def sel_mask(pr):
    def single(q):
        boxes, conf, cls, valid = N._select_candidates(q, p.max_nms, jnp.float32(p.conf_thres), p.pre_topk)
        off = cls * p.max_wh
        keep = N._greedy_nms_mask(boxes + off[:, None], conf, valid, p.iou_thres, p.max_det, p.plus_one, p.quantized)
        return keep
    return jax.vmap(single)(pr)
chained("selection + fixpoint mask", sel_mask, x0)
chained("full nms                 ", lambda pr: N.non_max_suppression(pr, p), x0)
