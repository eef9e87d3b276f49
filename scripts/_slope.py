"""Slope-based chained timing for axon TPU probes.

The remote executor has a ~34ms fixed dispatch+fetch latency per
synchronous call (measured: a fori_loop whose body is a 15MB copy takes
~34ms wall whether it runs 10 or 50 iterations). Dividing wall time by
the iteration count therefore inflates every sub-ms measurement by
several ms — the round-1/2 "per-call floor" of the packed kernel was
exactly this artifact. Timing here runs the SAME chained loop at two
iteration counts and reports the slope, which cancels the fixed cost.

Iterations are serialized through a SCALAR carry only: the probe input
stays a read-only captured buffer, and the data dependency enters fn as
`leaf + isnan(s)` (adds exact 0, fuses into the consumer's first read,
and is not constant-foldable because s is a runtime value). The earlier
harness wrote one element of the input per iteration — an in-place
update XLA cannot alias while fn still reads the buffer, so every
iteration silently COPIED the whole input (~2.3 ms at B=128 f32 640²:
r3_quant2.log R0, a bare f32 +1.0, timed 3.80 ms vs its 1.5 ms
roofline, identical to quantize; R1 with half the write bytes timed the
same). That copy inflated every round-2/3 stage number measured on a
large f32 input.

MEASUREMENT TRAP #5 (round 3, r3_nmsseam2.log): consuming only one
element of one output leaf lets XLA DCE every UNCONSUMED SIBLING inside
the jit — a prefix probe of quant+fwd+decode timed 28.9 ms while the
same prefix under a consumer that reads everything costs 36.9 ms (five
of the six head-conv chains and the class reduction were dead). Every
fn output now passes through lax.optimization_barrier, which keeps all
leaves live (a barrier with a used result keeps all operands) without
the fusion distortion a checksum-sum would add; only one element is
still fetched.
"""
import time

import jax
import jax.numpy as jnp

N_LO, N_HI = 10, 60


def slope_time(name, fn, x0, n_lo=N_LO, n_hi=N_HI, reps=2):
    leaves0, treedef = jax.tree_util.tree_flatten(x0)

    @jax.jit
    def loop(x, n):
        leaves, _ = jax.tree_util.tree_flatten(x)

        def body(i, s):
            l0 = leaves[0]
            lp = l0 + jnp.isnan(s).astype(l0.dtype)   # +0, s-dependent
            out = fn(jax.tree_util.tree_unflatten(
                treedef, [lp] + list(leaves[1:])))
            # barrier: keep EVERY output leaf live (trap #5), then
            # consume a single element
            out = jax.lax.optimization_barrier(out)
            leaf = jax.tree_util.tree_leaves(out)[0]
            return s + leaf.reshape(-1)[0].astype(jnp.float32)

        return jax.lax.fori_loop(0, n, body, jnp.float32(0))

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
