import sys; sys.path.insert(0, "/root/repo")
import numpy as np, time, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax import lax
TH, W, CIN, COUT = 16, 160, 16, 32

def make(x, w):
    wc = w.reshape(3,3,CIN,COUT).transpose(3,2,0,1)
    r = lax.conv_general_dilated(x.transpose(0,3,1,2), wc, (1,1), "VALID",
        dimension_numbers=("NCHW","OIHW","NCHW"), preferred_element_type=jnp.int32)
    return r.transpose(0,2,3,1)

def try_it(name, kernel, B=1):
    x = jnp.asarray(np.random.randint(-127,128,(B, TH+2, W+2, CIN),dtype=np.int8))
    w = jnp.asarray(np.random.randint(-127,128,(9*CIN, COUT),dtype=np.int8))
    try:
        f = lambda xx: pl.pallas_call(kernel, grid=(B,),
            in_specs=[pl.BlockSpec((1, TH+2, W+2, CIN), lambda b: (b,0,0,0)),
                      pl.BlockSpec((9*CIN, COUT), lambda b: (0,0))],
            out_specs=pl.BlockSpec((1, TH, W, COUT), lambda b: (b,0,0,0)),
            out_shape=jax.ShapeDtypeStruct((B, TH, W, COUT), jnp.int32))(xx, w)
        out = f(x)
        print(name, "match:", bool(jnp.array_equal(out, make(x, w))), flush=True)
        return f, x
    except Exception as e:
        tail = str(e)
        i = tail.find("The MLIR")
        print(name, "FAIL:", (tail[i:i+300] if i>=0 else tail[-300:]), flush=True)
        return None, None

def kf(x_ref, w_ref, o_ref):  # 9 tap-dots over all rows via dot_general 3Dx2D
    t = x_ref[0]
    acc = jnp.zeros((TH, W, COUT), jnp.int32)
    for i, (dy, dx) in enumerate([(a,b) for a in range(3) for b in range(3)]):
        part = t[dy:dy+TH, dx:dx+W, :]
        wslc = w_ref[i*CIN:(i+1)*CIN, :]
        acc = acc + lax.dot_general(part, wslc, (((2,),(0,)), ((),())),
                                    preferred_element_type=jnp.int32)
    o_ref[0] = acc
try_it("9 tap dot_general 3D", kf)
