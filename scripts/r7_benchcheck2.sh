#!/bin/sh
# r7: remaining envelope legs (k4, yolov8s) — the first r7_benchcheck
# run wedged on the k4 leg's tunnel dial (43 min blocked, killed).
cd /root/repo || exit 1
for args in "--k 4" "--model yolov8s"; do
  echo "== bench $args --check =="
  python bench.py $args --check
  echo "rc=$?"
done
