import sys; sys.path.insert(0, "/root/repo")
import numpy as np, time, jax, jax.numpy as jnp
from jax import lax

def bench(name, fn, *args, iters=20):
    out = fn(*args); jax.block_until_ready(out)
    t=time.time()
    for _ in range(iters): out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name}: {(time.time()-t)/iters*1000:.3f} ms", flush=True)

B,Ci,H,W,Co,k,s = 64,16,320,320,32,3,2
Ho=Wo=160
M = B*Ho*Wo; K = Ci*k*k
x = jnp.asarray(np.random.randint(-127,128,(B,Ci,H,W),dtype=np.int8))
pm = jnp.asarray(np.random.randint(-127,128,(M,K),dtype=np.int8))
wmat = jnp.asarray(np.random.randint(-127,128,(K,Co),dtype=np.int8))
print(f"M={M} K={K} N={Co}", flush=True)
bench("patches only       ", jax.jit(lambda a: lax.conv_general_dilated_patches(a,(k,k),(s,s),[(1,1),(1,1)],dimension_numbers=("NCHW","OIHW","NCHW"))), x)
bench("matmul s8->s32     ", jax.jit(lambda a,b: jnp.dot(a,b,preferred_element_type=jnp.int32)), pm, wmat)
bench("matmul bf16->f32   ", jax.jit(lambda a,b: jnp.dot(a.astype(jnp.bfloat16),b.astype(jnp.bfloat16),preferred_element_type=jnp.float32)), pm, wmat)
# wider N for comparison
w128 = jnp.asarray(np.random.randint(-127,128,(K,128),dtype=np.int8))
bench("matmul s8  N=128   ", jax.jit(lambda a,b: jnp.dot(a,b,preferred_element_type=jnp.int32)), pm, w128)
# NHWC patches?
xn = jnp.asarray(np.random.randint(-127,128,(B,H,W,Ci),dtype=np.int8))
bench("patches NHWC       ", jax.jit(lambda a: lax.conv_general_dilated_patches(a,(k,k),(s,s),[(1,1),(1,1)],dimension_numbers=("NHWC","HWIO","NHWC"))), xn)
# direct conv reference
wc = jnp.asarray(np.random.randint(-127,128,(Co,Ci,k,k),dtype=np.int8))
bench("direct conv s8     ", jax.jit(lambda a: lax.conv_general_dilated(a,wc,(s,s),[(1,1),(1,1)],dimension_numbers=("NCHW","OIHW","NCHW"),preferred_element_type=jnp.int32)), x)
