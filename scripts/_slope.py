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
of the six head-conv chains and the class reduction were dead).

MEASUREMENT TRAPS #6/#6b (round 5, r5_dual.log / r5_overlap.log): the
round-3 fix — passing outputs through lax.optimization_barrier and
consuming one element of one leaf — is NOT sufficient: a barrier does
not keep a computation alive when that computation's own barrier
result is unused (a dependent second 4096^3 matmul timed 0.00 ms
behind a barrier; two "independent B=128 pipelines" timed the same as
one). And with the scalar carry threaded into only the first input
leaf, work depending solely on other inputs is loop-invariant and
hoists out of the fori_loop. Liveness therefore comes from the CARRY:
one element of EVERY output leaf is summed into it (and carry_all=True
threads the carry into every input leaf). The barrier remains to block
slicing/strength-reduction into those consumed elements (r3_dots:
consuming c[0,0] of a bare matmul otherwise reduces it to one dot
row).
"""
import time

import jax
import jax.numpy as jnp

N_LO, N_HI = 10, 60


def slope_time(name, fn, x0, n_lo=N_LO, n_hi=N_HI, reps=2,
               carry_all=False):
    """carry_all: thread the scalar carry into EVERY input leaf, not
    just the first. MEASUREMENT TRAP #6 (r5_dual.log): with the carry
    on leaf 0 only, any computation depending solely on the OTHER
    leaves is loop-invariant and XLA hoists it out of the fori_loop —
    a probe of two independent B=128 pipelines timed the same 31.7 ms
    as one pipeline because stream B ran ONCE outside the loop. Any
    probe whose fn consumes independent inputs must pass
    carry_all=True."""
    # MEASUREMENT TRAP #8 (r7_wideedge.log/-2.log): a host-numpy x0 is
    # re-shipped over the axon relay on EVERY loop() call — at B=128
    # 640x640 f32 that is 629 MB per call, a noisy 16-24 s "fixed"
    # cost that swamps the slope (it even went negative) while
    # bench.py in the same session read a clean 31.9 ms. device_put
    # the leaves ONCE before timing; no-op for already-device arrays.
    x0 = jax.tree_util.tree_map(jax.device_put, x0)
    leaves0, treedef = jax.tree_util.tree_flatten(x0)

    @jax.jit
    def loop(x, n):
        leaves, _ = jax.tree_util.tree_flatten(x)

        def body(i, s):
            dep = jnp.isnan(s)
            if carry_all:
                lv = [l + dep.astype(l.dtype) for l in leaves]
            else:
                lv = [leaves[0] + dep.astype(leaves[0].dtype)] \
                    + list(leaves[1:])
            out = fn(jax.tree_util.tree_unflatten(treedef, lv))
            # TRAP #6b (r5_overlap.log): optimization_barrier does NOT
            # keep a computation alive when its own barrier result is
            # unused — a dependent second 4096^3 matmul timed 0.00 ms
            # behind a barrier. The barrier's remaining job is blocking
            # slicing/strength-reduction INTO the consumed leaves
            # (r3_dots: consuming c[0,0] of a bare matmul lets XLA
            # reduce it to one dot row). Liveness itself must come from
            # the carry: consume one element of EVERY output leaf.
            out = jax.lax.optimization_barrier(out)
            tot = s
            for leaf in jax.tree_util.tree_leaves(out):
                tot = tot + leaf.reshape(-1)[0].astype(jnp.float32)
            return tot

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
