"""Round-5 diagnostic: does INDEPENDENT work really run free?

r5_dual.log (carry_all harness): 2x and 4x independent B=128 pipelines
slope-time the SAME ~31.7 ms as one. Either the chip overlaps
independent fusions around stalls (then pure-MXU work must still add),
or the harness under-counts independent work. Discriminate with
matmuls: a 4096^3 bf16 matmul is ~0.68 ms of pure MXU time — two
INDEPENDENT ones cannot run in 0.68 ms on one TensorCore.

Legs:
  single     C = A @ B
  dual-indep C1 = A1 @ B1, C2 = A2 @ B2      (carry_all)
  dual-dep   C1 = A1 @ B1; C2 = (A2+0*C1[0,0]) @ B2
If dual-indep ~= single while dual-dep ~= 2x single, the harness hides
independent work (trap #6b) and r5_dual's numbers are artifact.
"""
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

import numpy as np
import jax
import jax.numpy as jnp

from _slope import slope_time

print("backend:", jax.devices()[0].platform, flush=True)

N = 4096
rng = np.random.default_rng(0)
A1 = jax.device_put(rng.standard_normal((N, N)).astype(jnp.bfloat16))
B1 = jax.device_put(rng.standard_normal((N, N)).astype(jnp.bfloat16))
A2 = jax.device_put(rng.standard_normal((N, N)).astype(jnp.bfloat16))
B2 = jax.device_put(rng.standard_normal((N, N)).astype(jnp.bfloat16))


def mm(x):
    return x[0] @ x[1]


dt1 = slope_time("single mm", mm, (A1, B1), carry_all=True)


def dual_indep(x):
    return x[0] @ x[1], x[2] @ x[3]


dt2 = slope_time("dual indep mm", dual_indep, (A1, B1, A2, B2),
                 carry_all=True)


def dual_dep(x):
    c1 = x[0] @ x[1]
    a2 = x[2] + (c1[0, 0] * jnp.bfloat16(0))
    return c1, a2 @ x[3]


dt3 = slope_time("dual dep mm", dual_dep, (A1, B1, A2, B2),
                 carry_all=True)
print(f"single {dt1*1e3:.3f} | indep {dt2*1e3:.3f} | dep {dt3*1e3:.3f}"
      f" ms", flush=True)
print("done", flush=True)
