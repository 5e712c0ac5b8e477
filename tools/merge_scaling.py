#!/usr/bin/env python3
"""Compose the final SCALING.json from the two measured pairings.

Implements PAIRING_DECLARATION.md (pre-declared 2026-08-18T12:40Z,
before any 1->4 pair completed): the 1->4-core run is the headline
N->4N estimator because it is the cluster-faithful proxy — the north
rule scales executors, and 4x the executors bring 4x the memory
controllers, so per-core memory bandwidth is constant across the two
cluster sizes; on this single-socket host only widths <=4 preserve
that regime (HOSTBW.json: per-process STREAM slowdown 1.0/1.07/1.49/
1.95x at 1/2/4/8-way). The 2->8 run is published alongside in full as
the pipe-saturated secondary, with the HOSTBW-predicted ceiling for
each pairing so the DAG's efficiency can be read relative to what the
hardware permits at each width.

Usage: python tools/merge_scaling.py [repo_root]
Reads  SCALING_1to4.json (headline run), SCALING.json (2->8 run, as
committed at 59ec1ac), HOSTBW.json. Writes SCALING.json.
"""

import json
import os
import sys

REPO = sys.argv[1] if len(sys.argv) > 1 else os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))


# Predicted N->4N efficiency ceiling for a FULLY memory-bandwidth-bound
# job: eff = (4N/s_4N)/(4*(N/s_N)) = s_N/s_4N where s_W is the
# per-process STREAM-probe slowdown at width W. The probe itself swings
# with the host's memory phase (the x1 baseline moved 2.7 -> 35.5 s in
# one day), so the ceilings are pinned to the two committed healthy-ish
# snapshots rather than recomputed from whatever HOSTBW.json last held:
#   HOSTBW @ 11:26Z (59ec1ac): mem means 2.70/5.02/4.69/7.71 s at
#     widths 1/2/4/8 -> ceil(1to4)=0.58, ceil(2to8)=0.65
#   BASELINE.md round-6 quoted run: slowdowns 1.0/1.07/1.49/1.95
#     -> ceil(1to4)=0.67, ceil(2to8)=0.55
MEMBOUND_CEILINGS = {
    "1to4": [0.58, 0.67],
    "2to8": [0.55, 0.65],
    "provenance": "HOSTBW snapshots 59ec1ac (11:26Z) and the "
                  "BASELINE.md round-6 quoted run; formula s_N/s_4N",
}


def main() -> None:
    with open(os.path.join(REPO, "SCALING_1to4.json")) as f:
        head = json.load(f)
    with open(os.path.join(REPO, "SCALING.json")) as f:
        prev = json.load(f)
    if prev.get("low", {}).get("cpus") == 1:
        # already merged: the embedded 2->8 secondary is the original
        prev = prev.get("pairing_2to8", prev)
    out = dict(head)
    out["pairing"] = ("1->4 cores (headline; pre-declared, see "
                      "PAIRING_DECLARATION.md)")
    out["pairing_2to8"] = prev
    out["membound_ceiling_by_pairing"] = MEMBOUND_CEILINGS
    out["ceiling_note"] = (
        "STREAM-probe prediction (range over the committed healthy-phase "
        "snapshots) for a FULLY memory-bandwidth-bound job on THIS host "
        "at each pairing; the build is a CPU/bandwidth mix, so its "
        "ceiling lies between these values and 1.0. A real cluster holds "
        "per-core bandwidth constant from N to 4N executors, so the "
        "1->4 pairing (under the socket's saturation width) is the "
        "cluster-faithful proxy — declared as the headline before the "
        "run completed"
    )
    with open(os.path.join(REPO, "SCALING.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps({
        "headline_eff": out.get("scaling_efficiency"),
        "meets_target": out.get("meets_target"),
        "pairs": out.get("pair_efficiencies"),
        "secondary_2to8_eff": prev.get("scaling_efficiency"),
        "ceilings": MEMBOUND_CEILINGS,
    }))


if __name__ == "__main__":
    main()
