import sys; sys.path.insert(0, "/root/repo")
import bench
bench.main()
