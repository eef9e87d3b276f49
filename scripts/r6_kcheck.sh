#!/bin/sh
# r6: validate the per-K / per-model envelope entries with bench --check
# on real hardware (int8 + co2x64 already validated in r6_benchcheck.log).
cd /root/repo || exit 1
for args in "--k 6" "--k 4" "--model yolov8s"; do
  echo "== bench $args --check =="
  python bench.py $args --check
  echo "rc=$?"
done
