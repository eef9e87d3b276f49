"""e2e slope-timed bench: packed vs auto engines at B=128."""
import sys; sys.path.insert(0, "/root/repo")  # noqa: E702
import bench

for engine in ("packed", "auto"):
    print(f"=== engine={engine}", flush=True)
    try:
        bench.main(engine=engine)
    except Exception as e:  # noqa: BLE001
        print(f"{engine} FAIL {type(e).__name__}: {str(e)[:1500]}",
              flush=True)
print("done", flush=True)
