#!/usr/bin/env python
"""Same-window pure-CPU host-scaling ceiling probe.

Measures how close to linear THIS host scales a trivially parallel,
Spark-free workload (sha256 over private buffers) from N to 4N pinned
cores — the ceiling any job measurement must be read against (BENCH.md
methodology).  Each level runs as ``taskset -c 0-(N-1)`` multiprocessing
workers doing a fixed per-worker unit count, so linear scaling = equal
wall at both levels over 4x the total work.

Usage: python host_ceiling_probe.py [lo hi reps]   (default 2 8 2)
Prints one JSON line per rep + a summary line.
"""

from __future__ import annotations

import hashlib
import json
import multiprocessing as mp
import os
import subprocess
import sys
import time

UNITS_PER_WORKER = 3
UNIT_BYTES = 64 * 1024 * 1024  # sha256 over 64 MiB, 40 passes/unit


def _burn(_i: int) -> int:
    buf = os.urandom(UNIT_BYTES)
    h = hashlib.sha256()
    for _ in range(40):
        h.update(buf)
    return len(h.digest())


def child(n: int) -> None:
    with mp.Pool(n) as pool:
        t0 = time.perf_counter()
        pool.map(_burn, range(n * UNITS_PER_WORKER))
        print(json.dumps({"workers": n, "wall_s": round(time.perf_counter() - t0, 3)}))


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        child(int(sys.argv[2]))
        return
    argv = sys.argv[1:4]
    lo, hi, reps = (int(a) for a in argv + ["2", "8", "2"][len(argv):])
    effs = []
    for r in range(reps):
        walls = {}
        for n in (lo, hi):
            out = subprocess.run(
                ["taskset", "-c", f"0-{n - 1}", sys.executable, __file__,
                 "--child", str(n), "x"],
                capture_output=True, text=True, check=True,
            ).stdout.strip().splitlines()[-1]
            walls[n] = json.loads(out)["wall_s"]
        # equal per-worker work: linear host => wall_lo == wall_hi
        eff = walls[lo] / walls[hi]
        effs.append(round(eff, 3))
        print(json.dumps({"rep": r, "walls": walls, "ceiling_eff": round(eff, 3)}))
    print(json.dumps({"lo": lo, "hi": hi, "ceiling_effs": effs}))


if __name__ == "__main__":
    main()
