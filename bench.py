#!/usr/bin/env python
"""Repo benchmark entry point: prints one JSON line.

{"metric": "reads_per_sec_chip", "value": N, "unit": "reads/s",
 "vs_baseline": N}  — vs_baseline is the fraction of the 10M reads/s/host
north star (the reference publishes no numbers; see BASELINE.md).
"""

import sys

from muscato_tpu.bench import runner

if __name__ == "__main__":
    sys.exit(runner.main())
