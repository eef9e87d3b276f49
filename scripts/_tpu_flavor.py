import sys; sys.path.insert(0, "/root/repo")
import numpy as np, time, jax, jax.numpy as jnp
from jax import lax
rng = np.random.default_rng(0)

def chained(name, f, a0, iters=12):
    @jax.jit
    def run(a):
        def body(i, c):
            a, acc = c
            o = f(a)
            pr = o.reshape(-1)[0].astype(jnp.int32)
            a = jnp.where(pr > 2**30, a ^ jnp.int8(1), a)
            return (a, acc + pr)
        a, acc = lax.fori_loop(0, iters, body, (a, jnp.int32(0)))
        return acc
    r = run(a0); r.block_until_ready()
    t=time.time(); v=int(run(a0))
    print(f"{name}: {(time.time()-t)/iters*1000:.3f} ms", flush=True)

for (B,Ci,H,W,Co,k,s) in [(64,3,640,640,16,3,2),(64,16,320,320,32,3,2),(64,32,160,160,32,1,1),(64,16,160,160,16,3,1),(64,64,80,80,128,3,2),(64,384,20,20,256,1,1)]:
    x0 = jnp.asarray(rng.integers(-127,128,(B,Ci,H,W),dtype=np.int8))
    wc = jnp.asarray(rng.integers(-127,128,(Co,Ci,k,k),dtype=np.int8))
    pad = k//2
    def s8c(a):
        acc = lax.conv_general_dilated(a, wc, (s,s), [(pad,pad),(pad,pad)],
            dimension_numbers=("NCHW","OIHW","NCHW"), preferred_element_type=jnp.int32)
        return jnp.clip(jnp.right_shift(acc,8), -127,127).astype(jnp.int8)
    wb = wc.astype(jnp.bfloat16)
    def bfc(a):
        acc = lax.conv_general_dilated(a.astype(jnp.bfloat16), wb, (s,s), [(pad,pad),(pad,pad)],
            dimension_numbers=("NCHW","OIHW","NCHW"), preferred_element_type=jnp.float32).astype(jnp.int32)
        return jnp.clip(jnp.right_shift(acc,8), -127,127).astype(jnp.int8)
    print(f"--- {Ci}->{Co} @{H} k{k}s{s}", flush=True)
    chained("  s8   ", s8c, x0)
    chained("  bf16 ", bfc, x0)
