"""Fleet-scale batched solving: thousands of UAS guidance problems at
once (BASELINE.json config 5 direction), sharded over all visible devices
(installed: ``etol-fleet``).

    python examples/fleet_batch.py [batch]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etol_tpu.cli import fleet_batch

if __name__ == "__main__":
    raise SystemExit(fleet_batch())
