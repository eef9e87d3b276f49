"""Throughput sweep: batch 128 vs 256 (fixed-overhead amortization) and
yolov8s coverage, official bench methodology."""
import sys; sys.path.insert(0, "/root/repo")  # noqa: E702
import bench

for model, batch in [("yolov8n", 256), ("yolov8s", 128)]:
    print(f"=== {model} batch={batch}", flush=True)
    try:
        bench.main(model=model, batch=batch)
    except Exception as e:  # noqa: BLE001
        print(f"FAIL {type(e).__name__}: {str(e)[:800]}", flush=True)
print("done", flush=True)
