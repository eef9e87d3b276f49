#!/bin/bash
# Round-5 probe: XLA flag A/B on the official e2e bench (yolov8n int8
# B=128). Flags tried are SCHEDULING/FUSION knobs only — nothing that
# changes numerics (bit-exactness is the product). Each config is a
# fresh process (XLA_FLAGS is read at backend init); bench.py is
# slope-timed internally, so each line is directly comparable to the
# official number.
set -u
cd /root/repo
run() {
  echo "=== XLA_FLAGS: ${1:-<none>}"
  XLA_FLAGS="${1:-}" python -u bench.py 2>&1 | grep -v WARNING
}
run ""
run "--xla_tpu_scoped_vmem_limit_kib=65536"
run "--xla_tpu_scoped_vmem_limit_kib=131072"
run "--xla_tpu_enable_latency_hiding_scheduler=false"
echo "flags sweep done"
