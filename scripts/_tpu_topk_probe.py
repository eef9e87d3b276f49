import sys; sys.path.insert(0, "/root/repo")
import numpy as np, time, jax, jax.numpy as jnp
from jax import lax

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

B, NA = 128, 8400
rng = np.random.default_rng(0)
scores = jnp.asarray(rng.integers(0, 32768, (B, NA)).astype(np.float32))
chained("batched top_k 1000      ", lambda s: lax.top_k(s, 1000)[1], scores)
chained("vmapped top_k 1000      ", lambda s: jax.vmap(lambda q: lax.top_k(q, 1000)[1])(s), scores)
chained("argsort full desc       ", lambda s: jnp.argsort(-s, axis=-1)[:, :1000], scores)
chained("sort values only        ", lambda s: jnp.sort(s, axis=-1), scores)
try:
    chained("approx_max_k r=1.0      ", lambda s: lax.approx_max_k(s, 1000, recall_target=1.0)[1], scores)
except Exception as e:
    print("approx_max_k fail", str(e)[:120], flush=True)
# gather after topk (the full selection includes box gather (8400,4))
boxes = jnp.asarray(rng.uniform(0, 1e5, (B, NA, 4)).astype(np.float32))
def sel(s):
    _, idx = lax.top_k(s, 1000)
    return jnp.take_along_axis(boxes, idx[:, :, None], axis=1)
chained("top_k + box gather      ", sel, scores)
