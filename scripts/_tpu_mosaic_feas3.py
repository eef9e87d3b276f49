import sys; sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax import lax
TH, W, CIN, COUT = 16, 160, 16, 32

def make(x, w):
    wc = w.reshape(3,3,CIN,COUT).transpose(3,2,0,1)
    r = lax.conv_general_dilated(x.transpose(0,3,1,2), wc, (1,1), "VALID",
        dimension_numbers=("NCHW","OIHW","NCHW"), preferred_element_type=jnp.int32)
    return r.transpose(0,2,3,1)

def try_it(name, kernel):
    B=1
    x = jnp.asarray(np.random.randint(-127,128,(B, TH+2, W+2, CIN),dtype=np.int8))
    w = jnp.asarray(np.random.randint(-127,128,(9*CIN, COUT),dtype=np.int8))
    try:
        out = pl.pallas_call(kernel, grid=(B,),
            in_specs=[pl.BlockSpec((1, TH+2, W+2, CIN), lambda b: (b,0,0,0)),
                      pl.BlockSpec((9*CIN, COUT), lambda b: (0,0))],
            out_specs=pl.BlockSpec((1, TH, W, COUT), lambda b: (b,0,0,0)),
            out_shape=jax.ShapeDtypeStruct((B, TH, W, COUT), jnp.int32))(x, w)
        print(name, "match:", bool(jnp.array_equal(out, make(x, w))), flush=True)
    except Exception as e:
        tail = str(e)[-700:]
        print(name, "FAIL:", tail[tail.find("The MLIR"):][:300] or tail[:300], flush=True)

def kd(x_ref, w_ref, o_ref):  # i32 concat
    t = x_ref[0]
    for r in range(TH):
        parts = [t[dy+r, dx:dx+W, :].astype(jnp.int32) for dy in range(3) for dx in range(3)]
        p = jnp.concatenate(parts, axis=-1).astype(jnp.int8)
        o_ref[0, r] = jnp.dot(p, w_ref[:], preferred_element_type=jnp.int32)
try_it("i32-concat rows", kd)

def ke(x_ref, w_ref, o_ref):  # 9 accumulated dots, rows batched as 3D? keep (TH*W impossible) -> per-row
    t = x_ref[0]
    for r in range(TH):
        acc = jnp.zeros((W, COUT), jnp.int32)
        for i, (dy, dx) in enumerate([(a,b) for a in range(3) for b in range(3)]):
            part = t[dy+r, dx:dx+W, :]
            wslc = w_ref[i*CIN:(i+1)*CIN, :]
            acc = acc + jnp.dot(part, wslc, preferred_element_type=jnp.int32)
        o_ref[0, r] = acc
try_it("9-dot rows     ", ke)
