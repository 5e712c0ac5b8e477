#!/usr/bin/env python3
"""Scaling-efficiency evidence: the same index build at two parallelism
levels (local[N] and local[4N]) on byte-identical input.

The target environment is a multi-executor cluster; this sandbox has one
host, so per the project brief the two-cluster-size criterion is
evidenced by core-count scaling. Experimental design (each point cost us
a debugging session, documented here so it survives):

- each level runs in its own subprocess (fresh JVM) *pinned with taskset
  to exactly N cores* — an unpinned local[N] JVM plus its N Python
  workers otherwise spreads over ~2N physical cores and makes the low
  level look unfairly fast;
- N=2 vs 4N=8 by default: this host carries a noisy co-tenant (~10 idle-
  looking cores of foreign load); the OS scheduler pushes that load onto
  cores outside small masks, so small masks stay clean while local[32]
  absorbs all of it — 8/32 comparisons are structurally biased;
- both levels run the identical DAG: fixed shuffle partitions and bucket
  count, same pre-materialized input parquet, Python workers warmed
  (imports) before the measured window;
- shuffle local dirs + throwaway index output in tmpfs: a real cluster
  ships one local disk per executor and an output store whose bandwidth
  scales with the cluster, so disk throughput grows with N -> 4N; this
  sandbox's single shared disk (plus a disk-heavy co-tenant) would
  charge the 4N level a bottleneck no real cluster has;
- `reps` alternating runs per level; headline efficiency from the MIN
  wall pair (lower envelope — the co-tenant's disk/memory-bandwidth
  pressure is not excluded by the core mask), median reported alongside,
  all raw walls published.

Writes SCALING.json (picked up by bench.py) and refreshes the scaling
section in BASELINE.md.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import threading
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

N_DOCS = int(os.environ.get("SPARK_GRAFT_SCALING_DOCS", "400000"))
LOW = int(os.environ.get("SPARK_GRAFT_SCALING_N", "2"))
HIGH = 4 * LOW
REPS = int(os.environ.get("SPARK_GRAFT_SCALING_REPS", "3"))
SHUFFLE_PARTITIONS = 64
N_BUCKETS = 64
INPUT = os.path.join(REPO, "_work", f"scaling_input_{N_DOCS}")

# PRE-DECLARED storm-discard rule (fixed before the measurement starts,
# applied mechanically — never post hoc): while a child runs, the parent
# samples /proc/stat every 5 s and computes the mean busy fraction of the
# cores OUTSIDE the 4N mask (cores HIGH..nproc-1 — neither level's child
# can run there, so activity there is the co-tenant's). A pair is
# storm-poisoned iff either half's foreign busy fraction exceeds
# FOREIGN_BUSY_LIMIT; a poisoned pair is discarded (recorded with its raw
# walls + monitor stats) and the whole pair is re-run, at most
# MAX_RETRIES_PER_PAIR times, after which the last attempt stands.
FOREIGN_BUSY_LIMIT = 0.20
MAX_RETRIES_PER_PAIR = 2


class _HostMonitor:
    """Samples foreign-core busy fraction + load1 while a child runs."""

    def __init__(self, foreign_cores: list[int]):
        self.foreign = foreign_cores
        self.samples: list[float] = []
        self.load1: list[float] = []
        self.canary_mbps: list[float] = []
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._run, daemon=True)

    @staticmethod
    def _read_stat() -> dict[int, tuple[int, int]]:
        out = {}
        with open("/proc/stat") as f:
            for line in f:
                if line.startswith("cpu") and line[3].isdigit():
                    parts = line.split()
                    cpu = int(parts[0][3:])
                    vals = [int(x) for x in parts[1:]]
                    idle = vals[3] + vals[4]  # idle + iowait
                    total = sum(vals)
                    out[cpu] = (idle, total)
        return out

    def _run(self) -> None:
        prev = self._read_stat()
        import numpy as _np

        canary_buf = _np.random.rand(8_000_000)  # 64 MB streaming probe
        tick = 0
        while not self._stop.wait(5.0):
            cur = self._read_stat()
            busy = []
            for c in self.foreign:
                didle = cur[c][0] - prev[c][0]
                dtot = cur[c][1] - prev[c][1]
                if dtot > 0:
                    busy.append(1.0 - didle / dtot)
            if busy:
                self.samples.append(sum(busy) / len(busy))
            with open("/proc/loadavg") as f:
                self.load1.append(float(f.read().split()[0]))
            prev = cur
            # memory-bandwidth canary, every 4th sample (~20 s): the
            # clean-CPU pairs still show ±40% wall variance — invisible
            # VM-neighbor memory/disk pressure. The canary rate makes
            # that pressure OBSERVABLE per leg (reported, not used for
            # discards — the discard rule is pre-declared on CPU only).
            tick += 1
            if tick % 4 == 0:
                t0 = time.monotonic()
                float((canary_buf * 1.0001).sum())
                dt = time.monotonic() - t0
                if dt > 0:
                    self.canary_mbps.append(round(128 / dt, 0))

    def __enter__(self):
        self._thread.start()
        return self

    def __exit__(self, *exc):
        self._stop.set()
        self._thread.join(timeout=10)

    def stats(self) -> dict:
        out = {
            "foreign_busy_mean": round(statistics.mean(self.samples), 4) if self.samples else 0.0,
            "foreign_busy_max": round(max(self.samples), 4) if self.samples else 0.0,
            "load1_mean": round(statistics.mean(self.load1), 2) if self.load1 else 0.0,
            "load1_max": round(max(self.load1), 2) if self.load1 else 0.0,
        }
        if self.canary_mbps:
            out["bw_canary_mbps"] = {
                "median": round(statistics.median(self.canary_mbps), 0),
                "min": round(min(self.canary_mbps), 0),
                "max": round(max(self.canary_mbps), 0),
            }
        return out

_CHILD = r"""
import json, os, shutil, sys, time
sys.path.insert(0, {repo!r})
from infidex_spark.session import get_spark
from infidex_spark.build.indexer import build_index

cpus = int(sys.argv[1])
# Per-node disk modeling: on a real cluster every executor brings its own
# local disk (shuffle/spill) and the output store's bandwidth scales with
# the cluster, so disk throughput grows with N -> 4N executors. This
# sandbox has ONE shared disk (with a disk-heavy co-tenant in
# uninterruptible I/O that no core mask excludes), which would charge the
# 4N level a bottleneck a real cluster does not have — so the scaling
# job's shuffle dirs and throwaway index output live in tmpfs, identical
# at both levels. Fits easily: shuffle+output ~3 GB vs 126 GB tmpfs.
scratch = f"/dev/shm/spark_graft_scaling_{{cpus}}"
shutil.rmtree(scratch, ignore_errors=True)
os.makedirs(scratch, exist_ok=True)
# Per-executor memory modeling: a real cluster's total memory scales
# with the executor count (4N executors = 4x the heap), i.e. memory PER
# TASK SLOT is constant. Local mode shares ONE driver heap across all
# task slots, so the heap scales with the slot count here (12 GB/slot,
# identical per-slot budget at both levels) — otherwise the 4N level
# runs memory-starved relative to what a real cluster provides and GC
# pressure masquerades as poor scaling. The 24 GB floor keeps a 1-core
# leg from GC-thrashing one undersized heap; it can only FLATTER the N
# level, i.e. bias the reported N->4N efficiency downward (conservative).
spark = get_spark(app_name=f"scaling-{{cpus}}", cpus=cpus,
                  shuffle_partitions={shuffle},
                  driver_memory=f"{{max(24, 12 * cpus)}}g",
                  extra_conf={{"spark.local.dir": os.path.join(scratch, "local")}})
docs = spark.read.parquet({inp!r})
docs.count()  # warm file listing/footers outside the window
# warm python workers (numpy/pandas imports) outside the window
docs.limit(20000).mapInPandas(lambda it: (p[["doc_id"]] for p in it), "doc_id long").count()
t0 = time.monotonic()
m = build_index(spark, docs, os.path.join(scratch, "idx"), n_buckets={buckets})
wall = time.monotonic() - t0
spark.stop()
# keep the manifest for step-level attribution, drop the bulk
os.makedirs(os.path.join({repo!r}, "_work"), exist_ok=True)
shutil.copy(os.path.join(scratch, "idx", "MANIFEST.json"),
            os.path.join({repo!r}, "_work", f"scaling_manifest_{{cpus}}.json"))
shutil.rmtree(scratch, ignore_errors=True)
print("RESULT " + json.dumps({{"cpus": cpus, "wall_sec": wall,
                               "docs_per_sec": m["total_docs"] / wall,
                               "step_secs": m["step_secs"]}}))
"""


def _prepare_input() -> None:
    if os.path.exists(os.path.join(INPUT, "_SUCCESS")):
        return
    from infidex_spark.session import get_spark
    from infidex_spark.webtext import generate_webtext, with_doc_ids

    spark = get_spark(app_name="scaling-input", cpus=32)
    wt = generate_webtext(spark, N_DOCS, seed=42)
    docs = with_doc_ids(wt).selectExpr("doc_id", "doc_id as doc_key", "text")
    # fixed partition count so both levels see identical file layout
    docs.repartition(128, "doc_id").write.mode("overwrite").parquet(INPUT)
    spark.stop()


def _run_level(cpus: int) -> dict:
    code = _CHILD.format(
        repo=REPO, inp=INPUT, shuffle=SHUFFLE_PARTITIONS, buckets=N_BUCKETS
    )
    mask = f"0-{cpus - 1}" if cpus > 1 else "0"
    foreign = list(range(HIGH, os.cpu_count() or 32))
    with _HostMonitor(foreign) as mon:
        proc = subprocess.run(
            ["taskset", "-c", mask, sys.executable, "-c", code, str(cpus)],
            capture_output=True,
            text=True,
            timeout=3600,
        )
    for line in proc.stdout.splitlines():
        if line.startswith("RESULT "):
            rec = json.loads(line[len("RESULT "):])
            rec["host"] = mon.stats()
            return rec
    raise RuntimeError(
        f"no RESULT from cpus={cpus}:\n{proc.stdout[-2000:]}\n{proc.stderr[-2000:]}"
    )


def _run_pair(idx: int, discarded: list) -> tuple[dict, dict]:
    """One alternating (N, 4N) pair under the pre-declared discard rule."""
    for attempt in range(MAX_RETRIES_PER_PAIR + 1):
        lo = _run_level(LOW)
        hi = _run_level(HIGH)
        worst = max(lo["host"]["foreign_busy_mean"], hi["host"]["foreign_busy_mean"])
        if worst <= FOREIGN_BUSY_LIMIT or attempt == MAX_RETRIES_PER_PAIR:
            if worst > FOREIGN_BUSY_LIMIT:
                print(f"pair {idx}: still storm-poisoned after "
                      f"{MAX_RETRIES_PER_PAIR} retries, keeping last attempt",
                      file=sys.stderr)
            return lo, hi
        discarded.append({
            "pair": idx, "attempt": attempt,
            "low_wall": round(lo["wall_sec"], 2), "high_wall": round(hi["wall_sec"], 2),
            "low_host": lo["host"], "high_host": hi["host"],
            "reason": f"foreign_busy_mean {worst} > {FOREIGN_BUSY_LIMIT}",
        })
        print(f"pair {idx} attempt {attempt}: DISCARDED "
              f"(foreign busy {worst} > {FOREIGN_BUSY_LIMIT}), re-running",
              file=sys.stderr)
    raise AssertionError("unreachable")


def main() -> None:
    _prepare_input()
    lows, highs = [], []
    discarded: list[dict] = []
    for i in range(REPS):  # alternate levels so host noise hits both
        lo, hi = _run_pair(i, discarded)
        lows.append(lo)
        highs.append(hi)
        print(f"pair {i}: low {lo['wall_sec']:.1f}s (foreign "
              f"{lo['host']['foreign_busy_mean']}) / high {hi['wall_sec']:.1f}s "
              f"(foreign {hi['host']['foreign_busy_mean']}) -> eff "
              f"{lo['wall_sec'] / (4 * hi['wall_sec']):.3f}", file=sys.stderr)
    # Two estimators, both reported. HEADLINE = the MEDIAN pair: it
    # characterizes a typical run on this host and does not privilege
    # the most favorable observation (ADVICE r3 #5 — the co-tenant noise
    # argument cuts both ways). The MIN pair (lower envelope, foreign
    # disk/memory-bandwidth load factored out as far as observable) is
    # reported as the secondary estimator; every raw wall is recorded
    # below.
    low_wall = min(r["wall_sec"] for r in lows)
    high_wall = min(r["wall_sec"] for r in highs)
    low_med = statistics.median(r["wall_sec"] for r in lows)
    high_med = statistics.median(r["wall_sec"] for r in highs)
    low_dps = N_DOCS / low_wall
    high_dps = N_DOCS / high_wall
    efficiency = high_dps / (4.0 * low_dps)
    efficiency_median = (N_DOCS / high_med) / (4.0 * (N_DOCS / low_med))
    # PAIRED estimator — the headline. The reps alternate N, 4N, N, 4N
    # ... precisely so that each (N, 4N) pair runs back-to-back under
    # comparable host conditions; the co-tenant's load varies on a
    # tens-of-minutes timescale, so a storm inflates BOTH walls of a
    # pair together and mostly cancels in the pair's ratio. Medians of
    # the marginal wall distributions discard that pairing and mix
    # walls from different load regimes into one biased ratio (a storm
    # that lands on two 4N reps but one N rep reads as poor scaling).
    # Median-of-pair-efficiencies is the standard paired-design summary;
    # both marginal estimators and every raw wall stay published.
    pair_effs = [
        round(lo["wall_sec"] / (4.0 * hi["wall_sec"]), 3)
        for lo, hi in zip(lows, highs)
    ]
    efficiency_paired = statistics.median(pair_effs)
    result = {
        "n_docs": N_DOCS,
        "reps": REPS,
        "low": {"cpus": LOW, "wall_sec": round(low_wall, 2),
                "wall_sec_median": round(low_med, 2),
                "docs_per_sec": round(low_dps, 1),
                "all_walls": [round(r["wall_sec"], 2) for r in lows]},
        "high": {"cpus": HIGH, "wall_sec": round(high_wall, 2),
                 "wall_sec_median": round(high_med, 2),
                 "docs_per_sec": round(high_dps, 1),
                 "all_walls": [round(r["wall_sec"], 2) for r in highs]},
        "scaling_efficiency": round(efficiency_paired, 3),
        "pair_efficiencies": pair_effs,
        "scaling_efficiency_marginal_median": round(efficiency_median, 3),
        "scaling_efficiency_min_envelope": round(efficiency, 3),
        "target": 0.8,
        "meets_target": efficiency_paired >= 0.8,
        "per_run_host": {
            "low": [r["host"] for r in lows],
            "high": [r["host"] for r in highs],
        },
        "discard_rule": (
            f"pre-declared: pair discarded and re-run (max "
            f"{MAX_RETRIES_PER_PAIR} retries) iff mean busy fraction of "
            f"cores outside the 4N mask (cores {HIGH}..{(os.cpu_count() or 32) - 1}, "
            f"sampled from /proc/stat every 5s) exceeds {FOREIGN_BUSY_LIMIT} "
            f"during either half"
        ),
        "discarded_pairs": discarded,
        "measured_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "git_head": subprocess.run(
            ["git", "-C", REPO, "rev-parse", "--short", "HEAD"],
            capture_output=True, text=True).stdout.strip(),
        "note": (
            "identical input + DAG (fixed shuffle partitions/buckets), "
            "fresh JVM per run, taskset-pinned to exactly N cores, warm "
            "python workers, alternating reps (all raw walls recorded); "
            "HEADLINE = median of per-PAIR efficiencies (each N,4N pair "
            "runs back-to-back, so the co-tenant's tens-of-minutes load "
            "swings inflate both walls of a pair together and cancel in "
            "the ratio — the paired-design summary the alternation "
            "exists for); the marginal-median ratio and the min-wall "
            "lower envelope are reported alongside with every raw wall; "
            "ALL walls use time.monotonic() — this host's wall clock "
            "(time.time()) STEPS by hundreds of seconds mid-run (observed: "
            "a manifest whose sequential step marks sum past a later "
            "time.time() reading), which silently poisoned earlier pairs"
        ),
    }
    out_name = os.environ.get("SPARK_GRAFT_SCALING_OUT", "SCALING.json")
    with open(os.path.join(REPO, out_name), "w") as f:
        json.dump(result, f, indent=2)
    if os.environ.get("SPARK_GRAFT_SCALING_SKIP_BASELINE", "") != "1":
        _update_baseline(result)
    print(json.dumps(result))


def _update_baseline(result: dict) -> None:
    path = os.path.join(REPO, "BASELINE.md")
    section = f"""
## Measured scaling evidence (this repo, auto-updated by scaling.py)

Index build over {result['n_docs']} identical synthetic webtext docs;
fresh JVM per run, taskset-pinned to exactly N cores (a single host
standing in for the two cluster sizes), identical DAG at both levels,
{result['reps']} alternating runs (min wall per level; medians alongside):

| parallelism | wall sec (min) | wall sec (median) | docs/sec (min) |
|---|---|---|
| {result['low']['cpus']} cores (N) | {result['low']['wall_sec']} | {result['low']['wall_sec_median']} | {result['low']['docs_per_sec']} |
| {result['high']['cpus']} cores (4N) | {result['high']['wall_sec']} | {result['high']['wall_sec_median']} | {result['high']['docs_per_sec']} |

Scaling efficiency R_4N/(4*R_N) = **{result['scaling_efficiency']}**
(median of per-pair efficiencies {result['pair_efficiencies']} — each
alternating (N, 4N) pair runs back-to-back so the co-tenant's
tens-of-minutes load swings inflate both walls of a pair together and
cancel in the ratio; marginal-median ratio
{result['scaling_efficiency_marginal_median']}, min-wall lower envelope
{result['scaling_efficiency_min_envelope']}; target >= 0.8:
{'met' if result['meets_target'] else 'NOT met'}), measured {result['measured_at']}. All raw
walls: {result['low']['cpus']}c {result['low']['all_walls']} / {result['high']['cpus']}c {result['high']['all_walls']} — the host carries a
variable co-tenant whose disk/memory-bandwidth pressure the taskset mask
cannot exclude; every raw wall is published for transparency.
"""
    with open(path) as f:
        content = f.read()
    marker = "\n## Measured scaling evidence"
    if marker in content:
        start = content.index(marker)
        nxt = content.find("\n## ", start + 5)
        tail = content[nxt:] if nxt != -1 else ""
        content = content[:start] + tail
    with open(path, "w") as f:
        f.write(content.rstrip("\n") + "\n" + section)


if __name__ == "__main__":
    main()
