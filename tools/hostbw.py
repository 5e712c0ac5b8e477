"""Host memory-bandwidth scaling probe — the control experiment behind
the N->4N scaling-efficiency analysis.

Runs two single-process workloads pinned to distinct cores at parallelism
1, 2, 4, 8 and reports per-process wall times:

- cpu: cache-resident numpy compute (sin over a 1.6 MB array). On a
  machine whose cores are independent this scales ~1.0 at any width.
- mem: streaming traffic over a 320 MB array — a STREAM-like probe of
  the memory pipe shared by all cores.

Interpretation: if cpu holds flat while mem degrades with width, the
host's memory bandwidth — not the measured job's structure — caps
multi-core scaling. A real cluster adds nodes (each with its own memory
subsystem), so per-core bandwidth stays constant as executors are added;
a single box shares one pipe across every core, charging high-
parallelism legs a tax that does not exist at cluster scale.

Writes one JSON line to stdout and HOSTBW.json at the repo root.

Usage: python tools/hostbw.py   (takes ~3 min; run on an idle host)
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = r"""
import sys, time
import numpy as np
mode = sys.argv[1]
reps = int(sys.argv[2])
if mode == "mem":
    a = np.random.rand(40_000_000)  # 320 MB streaming traffic
    t0 = time.monotonic()
    s = 0.0
    for _ in range(reps):
        s += float((a * 1.0001).sum())
    print(time.monotonic() - t0)
else:
    a = np.random.rand(200_000)  # 1.6 MB, cache-resident
    t0 = time.monotonic()
    s = 0.0
    for _ in range(reps * 40):
        s += float(np.sin(a).sum())
    print(time.monotonic() - t0)
"""


def run_width(mode: str, width: int, reps: int = 6) -> list[float]:
    procs = []
    for i in range(width):
        procs.append(
            subprocess.Popen(
                ["taskset", "-c", str(i), sys.executable, "-c", _CHILD,
                 mode, str(reps)],
                stdout=subprocess.PIPE, text=True,
            )
        )
    walls = []
    for p in procs:
        out, _ = p.communicate()
        walls.append(float(out.strip().splitlines()[-1]))
    return walls


def main() -> None:
    result: dict = {"widths": [1, 2, 4, 8], "loadavg": os.getloadavg()}
    for mode in ("cpu", "mem"):
        per = {}
        for w in result["widths"]:
            walls = run_width(mode, w)
            per[str(w)] = {
                "walls": [round(x, 2) for x in walls],
                "mean": round(statistics.mean(walls), 2),
            }
        base = per["1"]["mean"]
        for w in result["widths"]:
            per[str(w)]["slowdown_per_core"] = round(per[str(w)]["mean"] / base, 2)
        result[mode] = per
    result["measured_at"] = time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())
    # predicted N->4N ceilings for a purely memory-bound job on this host
    mem = result["mem"]
    result["mem_bound_eff_ceiling"] = {
        "1to4": round(mem["1"]["mean"] / mem["4"]["mean"], 3),
        "2to8": round(mem["2"]["mean"] / mem["8"]["mean"], 3),
    }
    with open(os.path.join(REPO, "HOSTBW.json"), "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
