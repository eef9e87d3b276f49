import sys; sys.path.insert(0, "/root/repo")
import numpy as np, time, jax, jax.numpy as jnp
from jax import lax
from alpha_yolo_quant_tpu.ops.nn import s2d_weights, space_to_depth2
rng = np.random.default_rng(0)
B = 64
x0 = jnp.asarray(rng.integers(-127,128,(B,3,640,640),dtype=np.int8))
wc = jnp.asarray(rng.integers(-127,128,(16,3,3,3),dtype=np.int8))
ws = jnp.asarray(s2d_weights(np.asarray(wc, np.int8)))

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

def direct(a):
    acc = lax.conv_general_dilated(a, wc, (2,2), [(1,1),(1,1)],
        dimension_numbers=("NCHW","OIHW","NCHW"), preferred_element_type=jnp.int32)
    return jnp.clip(jnp.right_shift(acc,8), -127,127).astype(jnp.int8)
def s2d(a):
    y = space_to_depth2(a)
    acc = lax.conv_general_dilated(y, ws, (1,1), [(1,0),(1,0)],
        dimension_numbers=("NCHW","OIHW","NCHW"), preferred_element_type=jnp.int32)
    return jnp.clip(jnp.right_shift(acc,8), -127,127).astype(jnp.int8)
def s2d_bf16(a):
    y = space_to_depth2(a).astype(jnp.bfloat16)
    acc = lax.conv_general_dilated(y, ws.astype(jnp.bfloat16), (1,1), [(1,0),(1,0)],
        dimension_numbers=("NCHW","OIHW","NCHW"), preferred_element_type=jnp.float32).astype(jnp.int32)
    return jnp.clip(jnp.right_shift(acc,8), -127,127).astype(jnp.int8)
print("s2d match:", bool(jnp.array_equal(direct(x0), s2d(x0))), flush=True)
chained("P1 direct s8", direct, x0)
chained("P1 s2d s8   ", s2d, x0)
chained("P1 s2d bf16 ", s2d_bf16, x0)
