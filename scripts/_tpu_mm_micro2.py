import sys; sys.path.insert(0, "/root/repo")
import numpy as np, time, jax, jax.numpy as jnp
from jax import lax

def bench(name, fn, inputs, iters=16):
    outs = [fn(*i) for i in inputs[:1]]; jax.block_until_ready(outs)
    t=time.time()
    outs = []
    for j in range(iters):
        outs.append(fn(*inputs[j % len(inputs)]))
    jax.block_until_ready(outs)
    print(f"{name}: {(time.time()-t)/iters*1000:.3f} ms", flush=True)

rng = np.random.default_rng(0)
# sanity: 4096^3 bf16 matmul ~ 137 GFLOP -> expect ~0.35-0.7ms on v5e (197 TFLOPs)
A = [ (jnp.asarray(rng.integers(-3,3,(4096,4096)).astype(np.float32).astype(jnp.bfloat16)),
       jnp.asarray(rng.integers(-3,3,(4096,4096)).astype(np.float32).astype(jnp.bfloat16))) for _ in range(4)]
bench("sanity 4096^3 bf16", jax.jit(lambda a,b: jnp.dot(a,b,preferred_element_type=jnp.float32)), A)

B,Ci,H,W,Co,k,s = 64,16,320,320,32,3,2
M = 64*160*160; K = Ci*k*k
PM = [(jnp.asarray(rng.integers(-127,128,(M,K),dtype=np.int8)),
       jnp.asarray(rng.integers(-127,128,(K,Co),dtype=np.int8))) for _ in range(4)]
bench("matmul s8 M1.6M K144 N32", jax.jit(lambda a,b: jnp.dot(a,b,preferred_element_type=jnp.int32)), PM)
X = [(jnp.asarray(rng.integers(-127,128,(B,Ci,H,W),dtype=np.int8)),) for _ in range(4)]
bench("patches only            ", jax.jit(lambda a: lax.conv_general_dilated_patches(a,(k,k),(s,s),[(1,1),(1,1)],dimension_numbers=("NCHW","OIHW","NCHW"))), X)
wc = jnp.asarray(rng.integers(-127,128,(Co,Ci,k,k),dtype=np.int8))
bench("direct conv s8          ", jax.jit(lambda a: lax.conv_general_dilated(a,wc,(s,s),[(1,1),(1,1)],dimension_numbers=("NCHW","OIHW","NCHW"),preferred_element_type=jnp.int32)), X)
def pm_conv(a):
    p = lax.conv_general_dilated_patches(a,(k,k),(s,s),[(1,1),(1,1)],dimension_numbers=("NCHW","OIHW","NCHW"))
    b,ckk,ho,wo = p.shape
    return jnp.dot(p.transpose(0,2,3,1).reshape(-1,ckk), PM[0][1], preferred_element_type=jnp.int32).reshape(b,ho,wo,Co)
bench("patches+matmul          ", jax.jit(pm_conv), X)
