"""Round-3 q_NMS stage split (VERDICT #6: worst case < 8 ms from 10.9).

Decomposes the 10.9 ms worst-case q_NMS (B=128, all 8400 anchors pass)
into its pipeline stages, then probes replacements for the biggest one:

  S1 candidate argsort          jnp.argsort(-(128,8400)) + top-1000 gather
  S2 suppress+scan (presorted)  _greedy_nms_mask on sorted candidates
  S3 final compaction           argsort(~keep) + row assembly
  R1 packed-int-key argsort     score<<14 | reverse-idx in one int32 key
                                (scores are 16-bit sigmoid ints, idx<8400
                                -> 29 bits; single sort, same tie order)
  R2 radix-select 1024 + sort   histogram threshold, compact to 1024,
                                then sort only the survivors
"""
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

import numpy as np
import jax
import jax.numpy as jnp

from _slope import slope_time
from alpha_yolo_quant_tpu.postprocess.nms import (
    NmsParams, _greedy_nms_mask, _select_candidates, non_max_suppression,
    q_nms_params,
)

print("backend:", jax.devices()[0].platform, flush=True)
rng = np.random.default_rng(0)

B, N = 128, 8400
# worst case: every anchor passes the confidence threshold
scores = jnp.asarray(rng.integers(9000, 32767, (B, N)).astype(np.float32))
boxes_xywh = jnp.asarray(
    rng.uniform(50 * 412, 500 * 412, (B, 4, N)).astype(np.float32))
cls = jnp.asarray(rng.integers(0, 80, (B, N)).astype(np.float32))
P = q_nms_params(412.1635)


def s1(sc):
    idx = jnp.argsort(-sc, axis=1)[:, :1000]
    return jnp.take_along_axis(sc, idx, 1)


slope_time("S1 argsort(128,8400)+gather", s1, scores)


def s1b(sc):
    key = (sc.astype(jnp.int32) << 14) | (N - 1 - jnp.arange(N,
                                                            dtype=jnp.int32))
    srt = -jnp.sort(-key, axis=1)[:, :1000]
    return srt >> 14, (N - 1) - (srt & ((1 << 14) - 1))


slope_time("R1 packed-key sort+split   ", s1b, scores)


def s2(args):
    bx, sc, cl = args

    def single(bxy, s, c):
        box = bxy                      # (1000, 4) xyxy
        off = c * 7680.0
        keep = _greedy_nms_mask(box + off[:, None], s,
                                jnp.ones(1000, bool), 0.45, 300,
                                412.0, True, presorted=True, block=128)
        return keep

    return jax.vmap(single)(bx, sc, cl)


pre_boxes = jnp.asarray(rng.uniform(
    50 * 412, 500 * 412, (B, 1000, 4)).astype(np.float32))
pre_scores = -jnp.sort(-scores[:, :1000], axis=1)
pre_cls = cls[:, :1000]
slope_time("S2 greedy mask (1000 presorted)", s2,
           (pre_boxes, pre_scores, pre_cls))


def s3(keep_f):
    keep = keep_f > 0.5

    def single(k):
        order = jnp.argsort(~k, stable=True)
        return order

    return jax.vmap(single)(keep)


keepmask = jnp.asarray(rng.uniform(0, 1, (B, 1000)) < 0.3,
                       jnp.float32)
slope_time("S3 compaction argsort(1000)", s3, keepmask)


def full(args):
    bx, sc, cl = args
    return non_max_suppression((bx, sc, cl), P)


slope_time("FULL q_NMS (reduce_cls tuple)", full, (boxes_xywh, scores, cls))


# R2: radix-select threshold via histogram on the 16-bit score domain,
# compact survivors to 1024 slots by cumsum-scatter, then sort 1024.
def r2(sc):
    si = sc.astype(jnp.int32)
    hi = si >> 7                                   # 256 buckets of 128
    oh = jax.nn.one_hot(hi, 256, dtype=jnp.int32)  # (B,N,256)
    counts = oh.sum(1)
    above = jnp.cumsum(counts[:, ::-1], 1)[:, ::-1]  # >= bucket b count
    # smallest bucket whose >=count <= 1024 - approximate threshold bucket
    bsel = jnp.argmax((above <= 1024).astype(jnp.int32), 1)
    thr = (bsel << 7)
    mask = si >= thr[:, None]
    pos = jnp.cumsum(mask.astype(jnp.int32), 1) - 1
    slot = jnp.where(mask & (pos < 1024), pos, 1024)
    key = (si << 14) | (N - 1 - jnp.arange(N, dtype=jnp.int32))
    buf = jnp.full((B, 1025), -1, jnp.int32)
    buf = jax.vmap(lambda b, s, k: b.at[s].set(k))(buf, slot, key)
    srt = -jnp.sort(-buf[:, :1024], axis=1)[:, :1000]
    return srt


slope_time("R2 radix-select+sort1024  ", r2, scores)
print("done", flush=True)
