"""Round-5: isolate the candidate-sort cost structure (fixed harness).

The serving select is one multi-operand lax.sort at (128,8400)
(sort.24, 2.36 ms on the trace). Measure, slope-timed with every
output leaf consumed:
  a) the co-sort as the pipeline runs it (operand count as shipped),
  b) 2-operand (key, cid) sort,
  c) key-only sort,
  d) lax.top_k k=1000 (historically catastrophic — re-confirm),
  e) approx_max_k k=1000 (APPROXIMATE — ineligible for the bit-exact
     pipeline; measured only to know the hardware's partial-reduce
     floor).
This bounds any remaining select rewrite: if (a)-(c) is small, the
sort itself is the floor and the route stays closed.
"""
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

import numpy as np
import jax
import jax.numpy as jnp

from _slope import slope_time

print("backend:", jax.devices()[0].platform, flush=True)

B, N, K = 128, 8400, 1000
rng = np.random.default_rng(0)
key = jax.device_put(rng.integers(-(1 << 28), 1 << 28, (B, N),
                                  dtype=np.int32))
cid = jax.device_put(rng.integers(0, 80, (B, N), dtype=np.int32)
                     .astype(np.float32))
extra = [jax.device_put(rng.standard_normal((B, N)).astype(np.float32))
         for _ in range(4)]


def co6(x):
    srt = jax.lax.sort(tuple(x), num_keys=1, dimension=1)
    return tuple(t[:, :K] for t in srt)


def co2(x):
    srt = jax.lax.sort((x[0], x[1]), num_keys=1, dimension=1)
    return srt[0][:, :K], srt[1][:, :K]


def k1(x):
    return jax.lax.sort(x, dimension=1)[:, :K]


def topk(x):
    return jax.lax.top_k(x, K)


def amax(x):
    return jax.lax.approx_max_k(x.astype(jnp.float32), K)


slope_time("co-sort 6 ops", co6, (key, cid) + tuple(extra),
           carry_all=True)
slope_time("co-sort 2 ops", co2, (key, cid), carry_all=True)
slope_time("key-only sort", k1, key)
slope_time("lax.top_k     ", topk, key, n_lo=2, n_hi=4)
slope_time("approx_max_k  ", amax, key)
print("done", flush=True)
