import sys; sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax import lax
TH, W, CIN, COUT = 16, 160, 16, 32
def kc(x_ref, w_ref, o_ref):
    t = x_ref[0]
    for r in range(2):
        parts = [t[dy+r, dx:dx+W, :] for dy in range(3) for dx in range(3)]
        p = jnp.concatenate(parts, axis=-1)
        o_ref[0, r] = jnp.dot(p, w_ref[:], preferred_element_type=jnp.int32)
B=1
x = jnp.asarray(np.random.randint(-127,128,(B, TH+2, W+2, CIN),dtype=np.int8))
w = jnp.asarray(np.random.randint(-127,128,(9*CIN, COUT),dtype=np.int8))
try:
    out = pl.pallas_call(kc, grid=(B,),
        in_specs=[pl.BlockSpec((1, TH+2, W+2, CIN), lambda b: (b,0,0,0)),
                  pl.BlockSpec((9*CIN, COUT), lambda b: (0,0))],
        out_specs=pl.BlockSpec((1, 2, W, COUT), lambda b: (b,0,0,0)),
        out_shape=jax.ShapeDtypeStruct((B, 2, W, COUT), jnp.int32))(x, w)
    print("ok", out.shape, flush=True)
except Exception as e:
    print("...TAIL...", str(e)[-2500:], flush=True)
