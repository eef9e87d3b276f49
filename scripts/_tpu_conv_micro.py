import sys; sys.path.insert(0, "/root/repo")
import numpy as np, time, jax, jax.numpy as jnp
from jax import lax

def bench(name, fn, x, iters=20):
    out = fn(x); jax.block_until_ready(out)
    t=time.time()
    o = x
    out = fn(x)
    for _ in range(iters-1):
        out = fn(x)   # same input; device queue serializes anyway
    jax.block_until_ready(out)
    print(f"{name}: {(time.time()-t)/iters*1000:.3f} ms", flush=True)

shapes = [  # (B, Cin, H, W, Cout, k, s) — representative layers
    (16, 3, 640, 640, 16, 3, 2),    # P1
    (16, 16, 320, 320, 32, 3, 2),   # P2
    (16, 32, 160, 160, 32, 1, 1),   # c2f conv
    (16, 64, 80, 80, 128, 3, 2),    # P4
    (16, 128, 40, 40, 256, 3, 2),   # P5
]
for (B,Ci,H,W,Co,k,s) in shapes:
    x8 = jnp.asarray(np.random.randint(-127,128,(B,Ci,H,W),dtype=np.int8))
    w8 = jnp.asarray(np.random.randint(-127,128,(Co,Ci,k,k),dtype=np.int8))
    xf = x8.astype(jnp.float32); wf = w8.astype(jnp.float32)
    pad = k//2
    def f32conv(x):
        return lax.conv_general_dilated(x, wf, (s,s), [(pad,pad),(pad,pad)],
            dimension_numbers=("NCHW","OIHW","NCHW"))
    def bf16x2(x):
        x32 = x.astype(jnp.int32)
        hi = jnp.right_shift(x32,4).astype(jnp.bfloat16); lo = jnp.bitwise_and(x32,15).astype(jnp.bfloat16)
        wb = w8.astype(jnp.bfloat16)
        c = lambda p: lax.conv_general_dilated(p, wb, (s,s), [(pad,pad),(pad,pad)],
            dimension_numbers=("NCHW","OIHW","NCHW"), preferred_element_type=jnp.float32)
        return c(hi).astype(jnp.int32)*16 + c(lo).astype(jnp.int32)
    def s8conv(x):
        return lax.conv_general_dilated(x, w8, (s,s), [(pad,pad),(pad,pad)],
            dimension_numbers=("NCHW","OIHW","NCHW"), preferred_element_type=jnp.int32)
    def bf16x1(x):
        wb = w8.astype(jnp.bfloat16)
        return lax.conv_general_dilated(x.astype(jnp.bfloat16), wb, (s,s), [(pad,pad),(pad,pad)],
            dimension_numbers=("NCHW","OIHW","NCHW"), preferred_element_type=jnp.float32)
    print(f"--- {B}x{Ci}x{H}x{W} -> {Co} k{k}s{s}", flush=True)
    bench("  f32 ", jax.jit(f32conv), xf)
    bench("  bf16x2", jax.jit(bf16x2), x8)
    bench("  bf16x1", jax.jit(bf16x1), x8)
    try:
        bench("  s8  ", jax.jit(s8conv), x8)
    except Exception as e:
        print("  s8 failed:", repr(e)[:150], flush=True)
