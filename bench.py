"""Benchmark entry (driver contract): prints ONE JSON line
{"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

Implementation lives in etol_tpu/bench_harness.py (also installed as the
``etol-bench`` console script)."""
import os
import sys

# running from a source checkout without an installed package
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from etol_tpu.bench_harness import main

if __name__ == "__main__":
    main()
