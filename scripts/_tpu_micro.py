import sys; sys.path.insert(0, "/root/repo")
import numpy as np, time, jax, jax.numpy as jnp
from alpha_yolo_quant_tpu.ops.nn import conv2d_int_exact, conv2d_f32
from alpha_yolo_quant_tpu.ops.intmath import requantize_i32

def bench(fn, *args, iters=20):
    out = fn(*args); jax.block_until_ready(out)
    t=time.time()
    for _ in range(iters): out = fn(*args)
    jax.block_until_ready(out)
    return (time.time()-t)/iters*1000

B=16
x = jnp.asarray(np.random.randint(-127,128,(B,64,160,160),dtype=np.int32))
w = jnp.asarray(np.random.randint(-127,128,(128,64,3,3),dtype=np.int32))
xf = x.astype(jnp.float32); wf = w.astype(jnp.float32)
print("f32 conv        ms:", bench(jax.jit(lambda a,b: conv2d_f32(a,b,None,2,1)), xf, wf), flush=True)
print("int exact conv  ms:", bench(jax.jit(lambda a,b: conv2d_int_exact(a,b,2,1)), x, w), flush=True)
r = jnp.asarray(np.random.randint(1,255,(1,64,1,1),dtype=np.int32))
s = jnp.asarray(np.full((1,64,1,1),20,dtype=np.int32))
print("requant_i32     ms:", bench(jax.jit(lambda a: requantize_i32(a,r,s,127)), x), flush=True)
table = jnp.asarray(np.random.randint(0,128,(255,),dtype=np.int32))
print("lut take        ms:", bench(jax.jit(lambda a: jnp.take(table, jnp.clip(a+127,0,254))), x), flush=True)
# one-hot matmul LUT alternative
def lut_onehot(a):
    idx = jnp.clip(a+127,0,254)
    oh = jax.nn.one_hot(idx, 255, dtype=jnp.bfloat16)
    return jnp.einsum("bchwk,k->bchw", oh, table.astype(jnp.bfloat16), preferred_element_type=jnp.float32).astype(jnp.int32)
print("lut onehot      ms:", bench(jax.jit(lut_onehot), x), flush=True)
# int8-dot conv via lax with preferred int32
from jax import lax
def conv_s8(a,b):
    return lax.conv_general_dilated(a.astype(jnp.int8), b.astype(jnp.int8), (2,2), [(1,1),(1,1)],
        dimension_numbers=("NCHW","OIHW","NCHW"), preferred_element_type=jnp.int32)
try:
    print("s8 conv         ms:", bench(jax.jit(conv_s8), x, w), flush=True)
except Exception as e:
    print("s8 conv failed:", repr(e)[:200], flush=True)
