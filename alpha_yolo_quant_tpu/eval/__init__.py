"""Evaluation: COCO-val mAP harness, detection/annotation record builders,
and run-result logging."""
