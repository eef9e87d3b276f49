"""Slope-based chained timing for axon TPU probes.

The remote executor has a ~34ms fixed dispatch+fetch latency per
synchronous call (measured: a fori_loop whose body is a 15MB copy takes
~34ms wall whether it runs 10 or 50 iterations). Dividing wall time by
the iteration count therefore inflates every sub-ms measurement by
several ms — the round-1/2 "per-call floor" of the packed kernel was
exactly this artifact. Timing here runs the SAME chained loop at two
iteration counts and reports the slope, which cancels the fixed cost.
"""
import time

import jax
import jax.numpy as jnp

N_LO, N_HI = 10, 60


def slope_time(name, fn, x0, n_lo=N_LO, n_hi=N_HI, reps=2):
    @jax.jit
    def loop(x, n):
        # n is a traced scalar: one compile serves every iteration count.
        # The dependency update touches ONE element per input leaf (s*0
        # is not foldable in f32 — NaN/inf semantics — so fn cannot be
        # hoisted out of the loop); a full-tensor rewrite here charges
        # ~1.9ms/iteration of harness overhead at batch 128.
        def body(i, carry):
            x, acc = carry
            out = fn(x)
            leaf = jax.tree_util.tree_leaves(out)[0]
            s = leaf.reshape(-1)[0].astype(jnp.float32)
            x = jax.tree_util.tree_map(
                lambda t: t.reshape(-1).at[0].set(
                    t.reshape(-1)[0] + (s * 0).astype(t.dtype)
                ).reshape(t.shape), x)
            return x, acc + s
        return jax.lax.fori_loop(0, n, body, (x, jnp.float32(0)))[1]

    float(loop(x0, jnp.int32(2)))           # compile + warm
    ts = {}
    for n in (n_lo, n_hi):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(loop(x0, jnp.int32(n)))
            best = min(best, time.perf_counter() - t0)
        ts[n] = best
    dt = (ts[n_hi] - ts[n_lo]) / (n_hi - n_lo)
    print(f"{name}: {dt*1000:.3f} ms  "
          f"(fixed ~{(ts[n_lo]-dt*n_lo)*1000:.1f} ms)", flush=True)
    return dt
