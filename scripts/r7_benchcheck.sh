#!/bin/sh
# r7: re-validate every recorded envelope with bench --check on real
# hardware after this round's edits (bench.py mfu field, interpreter
# bf16_offset path — inactive on the random-weight bench model, so all
# numbers must land inside the recorded bands). Runs ONE process at a
# time; host must be otherwise idle (CLAUDE.md timing discipline).
cd /root/repo || exit 1
for args in "" "--batch 64 --coalesce 2" "--k 6" "--k 4" "--model yolov8s"; do
  echo "== bench $args --check =="
  python bench.py $args --check
  echo "rc=$?"
done
