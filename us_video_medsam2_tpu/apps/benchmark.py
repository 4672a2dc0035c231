"""FPS benchmark harness — package-level alias of the repo-root bench.py
(reference efficient_track_anything/benchmark.py). Run: python -m
us_video_medsam2_tpu.apps.benchmark"""

import os
import runpy
import sys

if __name__ == "__main__":
    root = os.path.join(os.path.dirname(__file__), "..", "..")
    sys.path.insert(0, os.path.abspath(root))
    runpy.run_path(os.path.join(root, "bench.py"), run_name="__main__")
