import sys; sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax import lax

TH, W, CIN, COUT = 16, 160, 16, 32

def make_ref(x, w):
    wc = w.reshape(3,3,CIN,COUT).transpose(3,2,0,1)
    r = lax.conv_general_dilated(x.transpose(0,3,1,2), wc, (1,1), "VALID",
        dimension_numbers=("NCHW","OIHW","NCHW"), preferred_element_type=jnp.int32)
    return r.transpose(0,2,3,1)   # (B, TH, W, COUT)

def try_variant(name, kernel, out_shape3):
    B = 2
    x = jnp.asarray(np.random.randint(-127,128,(B, TH+2, W+2, CIN),dtype=np.int8))
    w = jnp.asarray(np.random.randint(-127,128,(9*CIN, COUT),dtype=np.int8))
    try:
        out = pl.pallas_call(
            kernel, grid=(B,),
            in_specs=[pl.BlockSpec((1, TH+2, W+2, CIN), lambda b: (b,0,0,0)),
                      pl.BlockSpec((9*CIN, COUT), lambda b: (0,0))],
            out_specs=pl.BlockSpec((1,) + out_shape3, lambda b: (b,0,0,0)[:1+len(out_shape3)]),
            out_shape=jax.ShapeDtypeStruct((B,) + out_shape3, jnp.int32),
        )(x, w)
        ref = make_ref(x, w).reshape((B,) + out_shape3)
        print(f"{name}: match={bool(jnp.array_equal(out, ref))}", flush=True)
    except Exception as e:
        print(f"{name}: FAIL {repr(e)[:160]}", flush=True)

# (b) dot_general on 3D lhs, no reshape
def kb(x_ref, w_ref, o_ref):
    t = x_ref[0]
    parts = [t[dy:dy+TH, dx:dx+W, :] for dy in range(3) for dx in range(3)]
    p = jnp.concatenate(parts, axis=-1)        # (TH, W, 9CIN)
    o_ref[0] = lax.dot_general(p, w_ref[:], (((2,),(0,)), ((),())),
                               preferred_element_type=jnp.int32)
try_variant("3D dot_general", kb, (TH, W, COUT))

# (c) per-row 2D dots
def kc(x_ref, w_ref, o_ref):
    t = x_ref[0]
    for r in range(TH):
        parts = [t[dy+r, dx:dx+W, :] for dy in range(3) for dx in range(3)]
        p = jnp.concatenate(parts, axis=-1)    # (W, 9CIN)
        o_ref[0, r] = jnp.dot(p, w_ref[:], preferred_element_type=jnp.int32)
try_variant("per-row dots  ", kc, (TH, W, COUT))
