import sys; sys.path.insert(0, "/root/repo")
import numpy as np, time, jax, jax.numpy as jnp
from jax import lax

def bench(name, fn, *args, iters=20):
    out = fn(*args); jax.block_until_ready(out)
    t=time.time()
    for _ in range(iters): out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name}: {(time.time()-t)/iters*1000:.3f} ms", flush=True)

for (B,Ci,H,W,Co,k,s) in [(64,16,320,320,32,3,2), (64,32,160,160,64,3,2), (64,16,160,160,16,3,1)]:
    x = jnp.asarray(np.random.randint(-127,128,(B,Ci,H,W),dtype=np.int8))
    w = jnp.asarray(np.random.randint(-127,128,(Co,Ci,k,k),dtype=np.int8))
    pad=1
    def direct(x):
        return lax.conv_general_dilated(x, w, (s,s), [(pad,pad),(pad,pad)],
            dimension_numbers=("NCHW","OIHW","NCHW"), preferred_element_type=jnp.int32)
    wmat = w.reshape(Co, -1).T  # (Ci*k*k, Co)
    def patches_matmul(x):
        p = lax.conv_general_dilated_patches(x, (k,k), (s,s), [(pad,pad),(pad,pad)],
            dimension_numbers=("NCHW","OIHW","NCHW"))  # (B, Ci*k*k, H', W') int8?
        b,ckk,ho,wo = p.shape
        pm = p.transpose(0,2,3,1).reshape(-1, ckk)
        return jnp.dot(pm, wmat, preferred_element_type=jnp.int32).reshape(b,ho,wo,Co)
    print(f"--- {B}x{Ci}x{H}x{W}->{Co} k{k}s{s}", flush=True)
    bench("direct s8      ", jax.jit(direct), x)
    try:
        bench("patches+matmul ", jax.jit(patches_matmul), x)
    except Exception as e:
        print("patches failed:", repr(e)[:200], flush=True)
