import sys; sys.path.insert(0, "/root/repo")
import numpy as np, time, jax, jax.numpy as jnp
from jax import lax

B,CIN,H,W,COUT = 64,16,320,320,32
S = 2  # stride
HO = WO = 160
K = 9*CIN
P = 8  # pixels packed per MXU row
rng = np.random.default_rng(0)
x0 = jnp.asarray(rng.integers(-127,128,(B,H,W,CIN),dtype=np.int8))
w = rng.integers(-127,128,(K,COUT)).astype(np.int8)
wc = jnp.asarray(w.reshape(CIN,3,3,COUT).transpose(3,0,1,2))  # patches order (c,dy,dx)
# block-diagonal packed weights (P*K, P*COUT)
wbd = np.zeros((P*K, P*COUT), np.int8)
for p in range(P):
    wbd[p*K:(p+1)*K, p*COUT:(p+1)*COUT] = w
wbd = jnp.asarray(wbd)
wj = jnp.asarray(w)

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
    return lax.conv_general_dilated(a, wc.astype(jnp.int8), (S,S), [(1,1),(1,1)],
        dimension_numbers=("NHWC","OIHW"[::1] and "OIHW","NHWC") if False else ("NHWC","HWIO","NHWC"),
        preferred_element_type=jnp.int32)
# fix: build HWIO weights for direct
whwio = jnp.asarray(np.asarray(wc).transpose(2,3,1,0))  # (3,3,CIN,COUT)
def direct2(a):
    acc = lax.conv_general_dilated(a, whwio.astype(jnp.int8), (S,S), [(1,1),(1,1)],
        dimension_numbers=("NHWC","HWIO","NHWC"), preferred_element_type=jnp.int32)
    return jnp.clip(jnp.right_shift(acc, 8), -127, 127).astype(jnp.int8)
chained("direct conv NHWC s8 ", direct2, x0)

def packed(a):
    p = lax.conv_general_dilated_patches(a, (3,3), (S,S), [(1,1),(1,1)],
        dimension_numbers=("NHWC","HWIO","NHWC"))        # (B,HO,WO,K) channel order (c,dy,dx)
    m = B*HO*WO
    pp = p.reshape(m//P, P*K)
    acc = jnp.dot(pp, wbd, preferred_element_type=jnp.int32)  # (m/P, P*COUT)
    acc = acc.reshape(B,HO,WO,COUT)
    return jnp.clip(jnp.right_shift(acc, 8), -127, 127).astype(jnp.int8)
# correctness
ref = direct2(x0)
got = packed(x0)
print("packed match:", bool(jnp.array_equal(got, ref)), flush=True)
chained("patches+blockdiag mm", packed, x0)
def pm_plain(a):
    p = lax.conv_general_dilated_patches(a, (3,3), (S,S), [(1,1),(1,1)],
        dimension_numbers=("NHWC","HWIO","NHWC"))
    acc = jnp.dot(p.reshape(-1, K), wj, preferred_element_type=jnp.int32).reshape(B,HO,WO,COUT)
    return jnp.clip(jnp.right_shift(acc, 8), -127, 127).astype(jnp.int8)
chained("patches+plain mm    ", pm_plain, x0)
def patches_only(a):
    return lax.conv_general_dilated_patches(a, (3,3), (S,S), [(1,1),(1,1)],
        dimension_numbers=("NHWC","HWIO","NHWC"))
chained("patches only        ", patches_only, x0)
