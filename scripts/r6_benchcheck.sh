#!/bin/sh
# r6: validate bench.py end-to-end on TPU after the tuple-input harness
# refactor (--coalesce support): (1) the official default metric must
# land inside its recorded envelope (--check exit 0), (2) the B=64
# coalesced protocol must land inside its new envelope.
cd /root/repo || exit 1
echo "== official default + --check =="
python bench.py --check
echo "rc_default=$?"
echo "== B=64 coalesced protocol + --check =="
python bench.py --batch 64 --coalesce 2 --check
echo "rc_co=$?"
