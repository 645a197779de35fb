"""Two-parallelism-level scaling benchmark (north-rule evidence).

Runs the full index-build pipeline (synthesize → docIDs → postings →
compressed block segments → sharded parquet write) twice in fresh
subprocesses with IDENTICAL input and config except the master:
local[N] and local[4N] (stand-ins for N and 4N executors — no real cluster
in this sandbox). Reports throughput at both and scaling efficiency
T_4N/(4·T_N); target ≥ 0.8.

Usage: python tools/scaling_bench.py [--turns 400000] [--n 8] [--out BENCH.md]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

CHILD = r"""
import json, os, shutil, sys, time
sys.path.insert(0, {repo!r})
from neural_search_spark.session import get_spark
from neural_search_spark.data import synthesize_transcripts

cpus = int(sys.argv[1]); n_turns = int(sys.argv[2]); shuffle = int(sys.argv[3])
seg_path = sys.argv[4]; trials = int(sys.argv[5]); tokens = int(sys.argv[6])
spark = get_spark("scale-bench", master="local[%d]" % cpus, shuffle_partitions=shuffle)
# warm the JVM and the Python-worker pool so one-time startup cost is
# excluded — real clusters have long-lived executors whose workers stay warm
# across jobs. The warm MUST be the full-size pipeline (not a 1-10% sample):
# the expensive part on this virtualized host is the FIRST concurrent touch
# of each worker's PEAK working set — cold, 32 workers faulting fresh pages
# simultaneously collapse into kernel zone-lock/memcg-accounting contention
# (a 400k-turn run measured 1594 cpu-sec at 32 workers vs 249 at 8, almost
# all stime; a 1%-sized warm did NOT prevent it, a full-sized warm does).
# glibc is also told to retain freed arena pages (no trim, high mmap
# threshold inherited by forked pyspark workers) so the warmed pages stay
# resident instead of being munmapped and refaulted on the measured run.

def tree_cpu_sec():
    # (utime, stime) of this process and every descendant (JVM, pyspark
    # daemons) — wall time is distorted by other tenants on the shared
    # host, CPU seconds are not; the u/s split separates real work +
    # hardware stalls (utime) from kernel contention (stime)
    import glob
    me = os.getpid()
    children = {{}}
    for stat in glob.glob("/proc/[0-9]*/stat"):
        try:
            parts = open(stat).read().rsplit(")", 1)[1].split()
            pid = int(stat.split("/")[2])
            ppid = int(parts[1])
            ut = int(parts[11]) / os.sysconf("SC_CLK_TCK")
            st = int(parts[12]) / os.sysconf("SC_CLK_TCK")
            children.setdefault(ppid, []).append((pid, ut, st))
        except Exception:
            pass
    tu, ts, stack, seen = 0.0, 0.0, [me], set()
    pid_cpu = {{pid: (ut, st) for kids in children.values() for pid, ut, st in kids}}
    while stack:
        pid = stack.pop()
        if pid in seen:
            continue
        seen.add(pid)
        u, s = pid_cpu.get(pid, (0.0, 0.0))
        tu += u
        ts += s
        stack.extend(k for k, _, _ in children.get(pid, []))
    return tu, ts

def run_once():
    # the production staged pipeline (store.build_index): parquet checkpoints
    # between stages + lineage manifests — exactly what a cluster run does
    from neural_search_spark.index.store import build_index
    shutil.rmtree(seg_path, ignore_errors=True)
    tr = synthesize_transcripts(spark, n_convs=n_turns // 10, turns_per_conv=10,
                                tokens_per_turn=tokens, partitions=shuffle)
    u0, s0 = tree_cpu_sec(); t0 = time.time()
    stages = build_index(spark, tr, seg_path, source_fingerprint="bench", resume=False)
    t1 = time.time(); u1, s1 = tree_cpu_sec()
    n_blocks = spark.read.parquet(os.path.join(seg_path, "segments")).count()
    shutil.rmtree(seg_path, ignore_errors=True)
    return {{"wall": t1 - t0, "cpu_sec": round(u1 - u0 + s1 - s0, 1),
            "utime": round(u1 - u0, 1), "stime": round(s1 - s0, 1),
            "blocks": n_blocks,
            "stages": {{s.stage: round(s.wall_sec, 2) for s in stages}}}}

run_once()  # full-size warm pass (see header comment) — not timed
runs = [run_once() for _ in range(trials)]
best = min(runs, key=lambda r: r["wall"])
print(json.dumps({{"cpus": cpus, "wall_sec": round(best["wall"], 2),
                  "turns_per_sec": round(n_turns / best["wall"], 1),
                  "cpu_sec": best["cpu_sec"],
                  "utime": best["utime"], "stime": best["stime"],
                  "effective_cores": round(best["cpu_sec"] / best["wall"], 2),
                  "blocks": best["blocks"], "stages": best["stages"],
                  "all_walls": [round(r["wall"], 2) for r in runs],
                  "all_cpu_secs": [r["cpu_sec"] for r in runs]}}))
"""


def run_level(repo: str, cpus: int, turns: int, shuffle: int, trials: int = 3, tokens: int = 24) -> dict:
    seg_path = os.path.join("/dev/shm/scale_bench", f"scale_{cpus}")
    script = CHILD.format(repo=repo)
    # pin the whole process tree (JVM, GC threads, python daemons) to
    # exactly `cpus` hardware threads: local[N] only bounds TASK slots —
    # unpinned, a "2-core" run was measured using 2.6 effective cores via
    # JVM background threads, corrupting the N-vs-4N comparison
    pin = ["taskset", "-c", f"0-{cpus - 1}"]
    env = dict(os.environ)
    # Userspace mitigations for the sandbox's first-touch fault pathology
    # (see session.py and BENCH.md §1): retain freed pages in every python
    # worker, pre-touch the JVM heap under THP, and keep shuffle/checkpoint
    # files on tmpfs so the measured runs exercise compute + exchange, not
    # the virtualized host's page-backing path. Long-lived cluster
    # executors get all of this for free.
    env.update({
        "MALLOC_TRIM_THRESHOLD_": "-1",
        "MALLOC_MMAP_THRESHOLD_": str(1 << 30),
        # NOTE: -XX:+AlwaysPreTouch was tried here and is actively harmful
        # on this host — pre-faulting 16GB through the slow host-backing
        # path at JVM start took tens of minutes at a 2-core pin. The
        # full-size warm run backs the pages the job actually uses instead.
        "SPARK_GRAFT_DRIVER_MEM": "16g",
        "SPARK_GRAFT_LOCAL_DIR": "/dev/shm/spark-local",
    })
    out = subprocess.run(
        pin + [sys.executable, "-c", script, str(cpus), str(turns), str(shuffle), seg_path, str(trials), str(tokens)],
        capture_output=True, text=True, timeout=3000, env=env,
    )
    if out.returncode != 0:
        print(out.stderr[-4000:], file=sys.stderr)
        raise RuntimeError(f"child failed at local[{cpus}]")
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--turns", type=int, default=400_000)
    ap.add_argument("--n", type=int, default=8, help="small parallelism level N (big = 4N)")
    ap.add_argument("--shuffle", type=int, default=64, help="shuffle partitions (identical at both levels)")
    ap.add_argument("--trials", type=int, default=3, help="timed repetitions per level (min reported)")
    ap.add_argument("--tokens", type=int, default=24, help="tokens per turn (compute density)")
    args = ap.parse_args()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    # fresh JVM per trial, levels interleaved (8,32,8,32,…) so slow drift in
    # the shared sandbox hits both levels equally; min-of-trials per level
    runs: dict[int, list[dict]] = {args.n: [], args.n * 4: []}
    for _ in range(args.trials):
        for cpus in (args.n, args.n * 4):
            r = run_level(repo, cpus, args.turns, args.shuffle, trials=1, tokens=args.tokens)
            runs[cpus].append(r)
            print(f"  trial local[{cpus}]: {r['wall_sec']}s", file=sys.stderr)
    small = min(runs[args.n], key=lambda r: r["wall_sec"])
    big = min(runs[args.n * 4], key=lambda r: r["wall_sec"])
    eff = big["turns_per_sec"] / (4 * small["turns_per_sec"])
    report = {
        "turns": args.turns,
        "tokens_per_turn": args.tokens,
        "shuffle_partitions": args.shuffle,
        f"local[{args.n}]": small,
        f"local[{args.n * 4}]": big,
        f"all_walls_local[{args.n}]": [r["wall_sec"] for r in runs[args.n]],
        f"all_walls_local[{args.n * 4}]": [r["wall_sec"] for r in runs[args.n * 4]],
        "scaling_efficiency": round(eff, 3),
        "target": 0.8,
        "pass": eff >= 0.8,
    }
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
