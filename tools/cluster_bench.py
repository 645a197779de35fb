"""Standalone-cluster scaling bench: spark-submit at N and 4N EXECUTORS.

The north rule asks for `spark-submit --py-files` on a multi-executor
cluster at N and 4N executors. This harness runs exactly that topology on
the single sandbox host: a local standalone master + one 32-core worker,
then the SAME job submitted twice — `spark.cores.max = n_execs ×
executor.cores` yields 1 executor (N) vs 4 executors (4N), each an
independent JVM with its own heap, GC, allocator, and Python worker pool,
shuffling over the real netty block-transfer path (not in-process local
shuffle). What a real cluster adds that one host cannot: 4× independent
DRAM systems (see BENCH.md §1.3) — executor-level scaling here still
shares one memory bus, so the measured efficiency is a LOWER bound on the
4-host outcome.

Usage: python tools/cluster_bench.py [--turns 2000000] [--tokens 24]
       [--exec-cores 8] [--trials 2]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import zipfile

SPARK_HOME = os.environ.get("SPARK_HOME", "/opt/spark")
MASTER_URL = "spark://127.0.0.1:7077"


def sh(cmd: list[str], env: dict | None = None, timeout: int = 120) -> str:
    out = subprocess.run(cmd, capture_output=True, text=True, timeout=timeout, env=env)
    if out.returncode != 0:
        raise RuntimeError(f"{' '.join(cmd)} failed:\n{out.stderr[-3000:]}")
    return out.stdout


def make_pyfiles_zip(repo: str, path: str) -> str:
    pkg = os.path.join(repo, "neural_search_spark")
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _dirs, files in os.walk(pkg):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, repo))
    return path


def submit(repo: str, zip_path: str, cores_max: int, exec_cores: int, args: argparse.Namespace) -> dict:
    env = dict(os.environ)
    env.update(
        {
            "SPARK_HOME": SPARK_HOME,
            "PYSPARK_PYTHON": sys.executable,
            "PYSPARK_DRIVER_PYTHON": sys.executable,
        }
    )
    seg_path = f"/dev/shm/cluster_bench/run_{cores_max}"
    cmd = [
        os.path.join(SPARK_HOME, "bin", "spark-submit"),
        "--master", MASTER_URL,
        "--deploy-mode", "client",
        "--py-files", zip_path,
        "--driver-memory", "8g",
        "--conf", f"spark.executor.cores={exec_cores}",
        "--conf", "spark.executor.memory=12g",
        "--conf", f"spark.cores.max={cores_max}",
        # same first-touch/page-retention mitigations as session.py, but for
        # EXECUTOR processes and their forked python workers
        "--conf", "spark.executorEnv.ARROW_DEFAULT_MEMORY_POOL=system",
        "--conf", "spark.executorEnv.MALLOC_TRIM_THRESHOLD_=-1",
        "--conf", f"spark.executorEnv.MALLOC_MMAP_THRESHOLD_={1 << 30}",
        # -Xms floor = -Xmx: without it each executor heap fault-grows
        # through this host's slow page-backing path during the measured
        # runs (and G1 uncommits idle regions between trials, re-faulting
        # them) — the local-mode legs get the same floor via session.py
        "--conf", "spark.executor.extraJavaOptions=-XX:+UseTransparentHugePages -Xms12g",
        "--conf", "spark.local.dir=/dev/shm/spark-local-cluster",
        # all executors are on one host: delay scheduling buys nothing and
        # costs up to spark.locality.wait (3s default) per under-preferred
        # task wave — measured as the dominant wall-clock term in the
        # multi-executor leg (reduce tasks prefer the executor holding the
        # largest map output and idle-wait on it)
        "--conf", "spark.locality.wait=0",
        # both legs must start fully provisioned or trial 1 runs on a
        # partial cluster
        "--conf", "spark.scheduler.minRegisteredResourcesRatio=1.0",
        "--conf", "spark.scheduler.maxRegisteredResourcesWaitingTime=60s",
        os.path.join(repo, "tools", "cluster_job.py"),
        str(args.turns), str(args.tokens), str(args.shuffle), seg_path, str(args.trials),
    ]
    out = subprocess.run(cmd, capture_output=True, text=True, timeout=3600, env=env)
    if out.returncode != 0:
        print(out.stderr[-5000:], file=sys.stderr)
        raise RuntimeError(f"spark-submit (cores.max={cores_max}) failed")
    for line in reversed(out.stdout.strip().splitlines()):
        line = line.strip()
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError("no JSON line in job output")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--turns", type=int, default=2_000_000)
    ap.add_argument("--tokens", type=int, default=24)
    ap.add_argument("--shuffle", type=int, default=64)
    ap.add_argument("--exec-cores", type=int, default=8)
    ap.add_argument("--trials", type=int, default=2)
    ap.add_argument("--rounds", type=int, default=1, help="interleaved (N, 4N) submit rounds")
    args = ap.parse_args()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    env = dict(os.environ)
    env.update({"SPARK_HOME": SPARK_HOME, "SPARK_NO_DAEMONIZE": ""})
    env.pop("SPARK_NO_DAEMONIZE")
    shutil.rmtree("/dev/shm/cluster_bench", ignore_errors=True)

    # stop-all only stops what the pid files record; a stale daemon whose
    # pid file was clobbered survives it and then start-worker refuses to
    # start ("worker running as process N"). Kill any leftover standalone
    # daemons + pid files unconditionally before (re)starting.
    subprocess.run([os.path.join(SPARK_HOME, "sbin", "stop-all.sh")], capture_output=True, env=env)
    subprocess.run(
        ["pkill", "-f", "org.apache.spark.deploy.(master.Master|worker.Worker)"],
        capture_output=True,
    )
    import glob
    import time as _time

    for pf in glob.glob("/tmp/spark-*.pid"):
        os.unlink(pf)
    _time.sleep(2)
    sh([os.path.join(SPARK_HOME, "sbin", "start-master.sh"), "--host", "127.0.0.1", "--port", "7077"], env=env)
    worker_env = dict(env)
    worker_env.update({"PYSPARK_PYTHON": sys.executable})
    sh(
        [
            os.path.join(SPARK_HOME, "sbin", "start-worker.sh"),
            MASTER_URL, "--cores", "32", "--memory", "96g", "--host", "127.0.0.1",
        ],
        env=worker_env,
    )
    try:
        zip_path = make_pyfiles_zip(repo, "/tmp/neural_search_spark.zip")
        n_small = args.exec_cores
        n_big = args.exec_cores * 4
        runs: dict[int, list[dict]] = {n_small: [], n_big: []}
        for _ in range(args.rounds):
            for cores_max in (n_small, n_big):
                r = submit(repo, zip_path, cores_max, args.exec_cores, args)
                n_execs = cores_max // args.exec_cores
                r["executors"] = n_execs
                runs[cores_max].append(r)
                print(
                    f"  {n_execs} executor(s) x {args.exec_cores} cores: "
                    f"{r['wall_sec']}s ({r['turns_per_sec']} turns/s) walls={r['all_walls']}",
                    file=sys.stderr,
                )
        small = min(runs[n_small], key=lambda r: r["wall_sec"])
        big = min(runs[n_big], key=lambda r: r["wall_sec"])
        eff = big["turns_per_sec"] / (4 * small["turns_per_sec"])
        print(
            json.dumps(
                {
                    "topology": f"standalone cluster, spark-submit --py-files; executors of {args.exec_cores} cores",
                    "turns": args.turns,
                    "tokens_per_turn": args.tokens,
                    "N_executors": 1,
                    "4N_executors": 4,
                    "N": small,
                    "4N": big,
                    "scaling_efficiency": round(eff, 3),
                    "target": 0.8,
                    "note": "single host: all executors share ONE memory system; a real 4-node cluster multiplies DRAM bandwidth 4x (BENCH.md 1.3)",
                }
            )
        )
    finally:
        sh([os.path.join(SPARK_HOME, "sbin", "stop-all.sh")], env=env)


if __name__ == "__main__":
    main()
