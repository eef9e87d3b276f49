import sys; sys.path.insert(0, "/root/repo")
import numpy as np, time, jax, jax.numpy as jnp
from jax import lax
rng = np.random.default_rng(0)
N_IT = 16

def bench_chained(name, make_step, a0):
    """run step N_IT times inside one jit with a data dependency between
    iterations; fetch a scalar at the end (defeats lazy remote exec)."""
    @jax.jit
    def run(a):
        def body(i, carry):
            a, acc = carry
            out = make_step(a)
            probe = out.reshape(-1)[0].astype(jnp.int32)
            # data-dependent, non-foldable perturbation of the input
            a = jnp.where(probe > 2**30, a ^ jnp.int8(1), a) if a.dtype == jnp.int8 \
                else jnp.where(probe > 2**30, a + 1, a)
            return (a, acc + probe)
        a, acc = lax.fori_loop(0, N_IT, body, (a, jnp.int32(0)))
        return acc
    r = run(a0); r.block_until_ready()
    t = time.time()
    r = run(a0)
    v = int(r)  # host fetch forces completion
    dt = (time.time() - t) / N_IT * 1000
    print(f"{name}: {dt:.3f} ms", flush=True)

# sanity 4096^3 bf16 (expect ~0.7ms @ ~200 TFLOPs)
Ab = jnp.asarray(rng.integers(-3,3,(4096,4096)).astype(np.float32)).astype(jnp.bfloat16)
Bb = jnp.asarray(rng.integers(-3,3,(4096,4096)).astype(np.float32)).astype(jnp.bfloat16)
def mm_sanity(a):
    return jnp.dot(a, Bb, preferred_element_type=jnp.float32)
@jax.jit
def run_sane(a):
    def body(i, c):
        a, acc = c
        o = mm_sanity(a)
        p = o[0,0]
        a = jnp.where(p > 1e30, a + jnp.bfloat16(1), a)
        return (a, acc + p)
    a, acc = lax.fori_loop(0, N_IT, body, (a, jnp.float32(0)))
    return acc
r = run_sane(Ab); r.block_until_ready()
t=time.time(); v=float(run_sane(Ab)); print(f"sanity 4096^3 bf16: {(time.time()-t)/N_IT*1000:.3f} ms", flush=True)

B,Ci,H,W,Co,k,s = 64,16,320,320,32,3,2
x0 = jnp.asarray(rng.integers(-127,128,(B,Ci,H,W),dtype=np.int8))
wc = jnp.asarray(rng.integers(-127,128,(Co,Ci,k,k),dtype=np.int8))
bench_chained("direct conv s8 16->32@320", lambda a: lax.conv_general_dilated(a,wc,(s,s),[(1,1),(1,1)],dimension_numbers=("NCHW","OIHW","NCHW"),preferred_element_type=jnp.int32), x0)
K = Ci*k*k; M = B*160*160
wmat = jnp.asarray(rng.integers(-127,128,(K,Co),dtype=np.int8))
def pmconv(a):
    p = lax.conv_general_dilated_patches(a,(k,k),(s,s),[(1,1),(1,1)],dimension_numbers=("NCHW","OIHW","NCHW"))
    b,ckk,ho,wo = p.shape
    return jnp.dot(p.transpose(0,2,3,1).reshape(-1,ckk), wmat, preferred_element_type=jnp.int32).reshape(b,ho,wo,Co)
bench_chained("patches+matmul           ", pmconv, x0)
pm0 = jnp.asarray(rng.integers(-127,128,(M,K),dtype=np.int8))
bench_chained("pure matmul M1.6M K144 N32", lambda a: jnp.dot(a, wmat, preferred_element_type=jnp.int32), pm0)
