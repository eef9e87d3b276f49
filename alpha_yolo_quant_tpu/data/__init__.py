"""Data loading and preprocessing: local COCO-val reader, resize/letterbox,
host-side batching with prefetch."""
