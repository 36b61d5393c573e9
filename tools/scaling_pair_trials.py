"""Extra interleaved trials of the primary N -> 4N pair (local[2] vs
local[8]) in both candidate topologies, for pooling with a full
bench.py --scaling run (same children, same corpus, fresh JVM per trial).

Usage: python tools/scaling_pair_trials.py [rounds] [out.json]
"""
import json
import os
import subprocess
import sys

import time

ROUNDS = int(sys.argv[1]) if len(sys.argv) > 1 else 3
OUT = (
    sys.argv[2]
    if len(sys.argv) > 2
    else time.strftime("BENCH/pair_trials_%Y%m%d_%H%M%S.json")
)
N = int(os.environ.get("BENCH_N_FILES", "800000"))
PATH = f"/dev/shm/spark-bench-files-{N}.parquet"
BENCH = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "bench.py")


def steal():
    p = open("/proc/stat").readline().split()
    return int(p[8]), sum(int(x) for x in p[1:])


def run(master, cpus, mode):
    env = dict(os.environ, SPARK_DRIVER_MEMORY="24g", BENCH_PAIR_MODE=mode)
    s0, t0 = steal()
    out = subprocess.run(
        [sys.executable, BENCH, "--scaling-one", master, str(cpus), str(N), PATH],
        capture_output=True, text=True, env=env,
    )
    s1, t1 = steal()
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            r = json.loads(line[len("RESULT "):])
            r["cpu_steal_pct"] = round(100 * (s1 - s0) / max(1, t1 - t0), 2)
            r["pair_mode"] = mode
            return r
    raise RuntimeError(out.stderr[-2000:])


MODES = os.environ.get("BENCH_PAIR_TRIAL_MODES", "star,all").split(",")
res = []
if os.path.exists(OUT):
    if os.environ.get("BENCH_PAIR_TRIALS_APPEND"):
        res = json.load(open(OUT))
    else:
        # never silently truncate recorded benchmark evidence
        sys.exit(
            f"{OUT} exists; set BENCH_PAIR_TRIALS_APPEND=1 to pool into "
            "it or pass a different output path"
        )
for i in range(ROUNDS):
    for master, cpus, mode in [
        (m, c, md)
        for md in MODES
        for m, c in (("local[2]", 2), ("local[8]", 8))
    ]:
        r = run(master, cpus, mode)
        res.append(r)
        print(f"round {i} {mode} {master}: {r['files_per_sec']} f/s "
              f"steal {r['cpu_steal_pct']}", flush=True)
        # write-then-rename: a crash mid-dump must not destroy previously
        # recorded trials (the never-truncate-evidence guard above would
        # be moot otherwise)
        with open(OUT + ".tmp", "w") as f:
            json.dump(res, f, indent=1)
        os.replace(OUT + ".tmp", OUT)
print("done")
