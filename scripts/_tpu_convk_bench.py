import sys; sys.path.insert(0, "/root/repo")
import functools
import numpy as np, time, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax import lax

def conv3x3_kernel_factory(TH, W, CIN, COUT, taps=9):
    def kern(x0_ref, x1_ref, x2_ref, w_ref, b_ref, o_ref):
        acc = jnp.zeros((TH, W, COUT), jnp.int32)
        i = 0
        for xr in (x0_ref, x1_ref, x2_ref):
            t = xr[0]
            for dx in range(3):
                part = t[:, dx:dx+W, :]
                wslc = w_ref[i*CIN:(i+1)*CIN, :]
                acc = acc + lax.dot_general(part, wslc, (((2,),(0,)), ((),())),
                                            preferred_element_type=jnp.int32)
                i += 1
        # epilogue-ish: requant-lite (shift) + int8 store to cut write bytes
        o_ref[0] = jnp.clip(jnp.right_shift(acc + b_ref[:], 8), -127, 127).astype(jnp.int8)
    return kern

def build(B, H, W, CIN, COUT, TH):
    kern = conv3x3_kernel_factory(TH, W, CIN, COUT)
    x_spec = pl.BlockSpec((1, TH, W+2, CIN), lambda b, i: (b, i, 0, 0))
    def f(x):  # x: (B,H,W,CIN) int8
        xp = jnp.pad(x, ((0,0),(1,1),(1,1),(0,0)))
        views = [xp[:, dy:dy+H] for dy in range(3)]
        w = W_GLOBAL; bias = BIAS_GLOBAL
        return pl.pallas_call(kern, grid=(B, H//TH),
            in_specs=[x_spec, x_spec, x_spec,
                      pl.BlockSpec((9*CIN, COUT), lambda b,i:(0,0)),
                      pl.BlockSpec((1,1,COUT), lambda b,i:(0,0,0))],
            out_specs=pl.BlockSpec((1, TH, W, COUT), lambda b,i:(b,i,0,0)),
            out_shape=jax.ShapeDtypeStruct((B,H,W,COUT), jnp.int8))(
            views[0], views[1], views[2], w, bias)
    return f

def chained_bench(name, f, x0, iters=16):
    @jax.jit
    def run(a):
        def body(i, c):
            a, acc = c
            o = f(a)
            p = o[0,0,0,0].astype(jnp.int32)
            a = jnp.where(p > 2**30, a ^ jnp.int8(1), a)
            return (a, acc + p)
        a, acc = lax.fori_loop(0, iters, body, (a, jnp.int32(0)))
        return acc
    r = run(x0); r.block_until_ready()
    t = time.time(); v = int(run(x0))
    print(f"{name}: {(time.time()-t)/iters*1000:.3f} ms", flush=True)

rng = np.random.default_rng(0)
for (B,CIN,H,W,COUT,TH) in [(64,16,160,160,16,16), (64,32,80,80,32,16), (64,64,80,80,64,8)]:
    x0 = jnp.asarray(rng.integers(-127,128,(B,H,W,CIN),dtype=np.int8))
    W_GLOBAL = jnp.asarray(rng.integers(-127,128,(9*CIN,COUT),dtype=np.int8))
    BIAS_GLOBAL = jnp.asarray(rng.integers(-1000,1000,(1,1,COUT),dtype=np.int32))
    f = build(B,H,W,CIN,COUT,TH)
    # correctness
    wc = W_GLOBAL.reshape(3,3,CIN,COUT).transpose(3,2,0,1)
    ref = lax.conv_general_dilated(x0.transpose(0,3,1,2), wc, (1,1), [(1,1),(1,1)],
        dimension_numbers=("NCHW","OIHW","NCHW"), preferred_element_type=jnp.int32).transpose(0,2,3,1)
    ref = jnp.clip(jnp.right_shift(ref + BIAS_GLOBAL.reshape(1,1,1,COUT), 8), -127, 127).astype(jnp.int8)
    got = f(x0)
    print(f"B{B} C{CIN}->{COUT} @{H}: match={bool(jnp.array_equal(got, ref))}", flush=True)
    chained_bench("  pallas conv3x3", f, x0)
    def xla_conv(a):
        acc = lax.conv_general_dilated(a.transpose(0,3,1,2), wc, (1,1), [(1,1),(1,1)],
            dimension_numbers=("NCHW","OIHW","NCHW"), preferred_element_type=jnp.int32).transpose(0,2,3,1)
        return jnp.clip(jnp.right_shift(acc + BIAS_GLOBAL.reshape(1,1,1,COUT), 8), -127, 127).astype(jnp.int8)
    chained_bench("  xla conv+epi  ", xla_conv, x0)
