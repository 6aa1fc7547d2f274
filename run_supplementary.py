"""Run every supplementary bench in sequence and merge the results
into BENCH_SUPPLEMENTARY.json (each bench still prints its own ONE
JSON line; this runner is bookkeeping for the TPU box, where wall
time is scarce and the tunnel occasionally needs a single long
session to warm every compile cache).

Usage:  nohup python run_supplementary.py [names...] &
        (default: batch video hrtf sofa av1 ffv1)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

ALL = ["batch", "video", "hrtf", "sofa", "av1", "ffv1"]
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "BENCH_SUPPLEMENTARY.json")


def main() -> None:
    names = sys.argv[1:] or ALL
    try:
        results = json.load(open(OUT))
    except Exception:
        results = {}
    for name in names:
        mod = f"bench_{name}"
        print(f"=== {mod} ===", file=sys.stderr, flush=True)
        t0 = time.time()
        proc = subprocess.run(
            [sys.executable, f"{mod}.py"], cwd=os.path.dirname(OUT),
            capture_output=True, text=True, timeout=3600)
        wall = round(time.time() - t0, 1)
        sys.stderr.write(proc.stderr[-2000:])
        line = None
        for ln in reversed(proc.stdout.strip().splitlines()):
            try:
                line = json.loads(ln)
                break
            except Exception:
                continue
        if line is None:
            print(f"{mod}: NO JSON (rc={proc.returncode})",
                  file=sys.stderr)
            continue
        line["wall_s"] = wall
        results[mod] = line
        json.dump(results, open(OUT, "w"), indent=1)
        print(f"{mod}: {line.get('value')} {line.get('unit')} "
              f"({wall}s)", file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
