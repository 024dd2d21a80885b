"""Multi-executor scaling evidence (north rule: >= 0.8 between N and 4N
EXECUTORS, job driven by spark-submit --py-files).

Unlike scripts/scaling.py (single-JVM local[N] — the sandbox's cheap
proxy), this runs a real Spark STANDALONE cluster on this machine:

  1 master + 8 workers, each worker a separate JVM pinned (taskset) to
  its own DISJOINT 2-core set with --cores 2, SPARK_LOCAL_DIRS on tmpfs

and submits the IDENTICAL index build twice via spark-submit
--py-files pke_spark.zip:

  spark.cores.max=2  -> 1 executor  x 2 cores   (the "N cluster")
  spark.cores.max=8  -> 4 executors x 2 cores   (the "4N cluster")

Why 2-core containers, 1 vs 4 executors: (a) a 1-core executor starves
the JVM/python-worker pipeline (task thread + Arrow serializer + GC +
python worker timeslicing one core; measured 10x+ degradation) — no
real deployment runs that shape; (b) the high config must stay inside
the host's linear region: this VM's MEMORY system stops scaling well
before its 32 cores do (scripts/host_envelope.py: pure-CPU 2->8 cores
scales ~0.96, pure memory-copy only ~0.44; at 16+ busy cores a 4-core-
executor study measured young GCs of seconds and task CPU inflated
3-6x). 2 vs 8 busy cores measures the JOB, not the box's memory bus —
a real N -> 4N cluster adds a memory system with every node.

Each executor is its own JVM with its own GC, netty pool, and python
workers, and shuffle moves over real (local) TCP between executor
processes — the actual execution topology the north rule's criterion is
about, rather than 8 threads sharing one JVM's scheduler and heap.
local[N] threads share a single allocator/GC, which is precisely the
single-JVM knee the round-1 study kept hitting; no real N vs 4N cluster
has that coupling.

Same job controls as scaling.py: identical input (synth corpus,
partitions=64), identical layout (n_parts=32, shuffle partitions fixed
at 64 for both sizes), fresh application per measurement, distributed
stats path (driver_stats_max_bytes=0), ABAB interleaving with per-run
host steal%%, per-config MINIMUM.

Usage: python scripts/cluster_scaling.py [n_docs] [repeat]
Writes benchmarks/scaling_cluster.json (embedded by bench.py).
"""

from __future__ import annotations

import json
import os
import socket
import subprocess
import sys
import time
import zipfile

import pyspark

SPARK_HOME = os.path.dirname(pyspark.__file__)
MASTER_URL = "spark://127.0.0.1:7077"
N_WORKERS = 8
EXEC_CORES = 2
N_LOW = int(os.environ.get("SCALE_N_LOW", "1"))   # executors
N_HIGH = int(os.environ.get("SCALE_N_HIGH", "4"))  # executors
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import shutil, sys, tempfile, time
from pyspark.sql import SparkSession
from pke_spark.index.build import build_index
from pke_spark.corpus import synth_corpus, with_doc_ids

n_execs, n_docs = int(sys.argv[1]), int(sys.argv[2])
spark = (SparkSession.builder.appName(f"cluster_scale_{n_execs}")
         .config("spark.sql.shuffle.partitions", "64")
         .config("spark.sql.adaptive.enabled", "true")
         .config("spark.sql.execution.arrow.pyspark.enabled", "true")
         .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
         .config("spark.sql.session.timeZone", "UTC")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

# wait until every granted executor has registered (registration is
# asynchronous; timing before they arrive would charge JVM spin-up --
# a fixed cluster-provisioning cost, not job throughput -- to the build)
sc = spark.sparkContext
deadline = time.time() + 60
while time.time() < deadline:
    if sc._jsc.sc().getExecutorMemoryStatus().size() - 1 >= n_execs:
        break
    time.sleep(0.5)

corpus = with_doc_ids(synth_corpus(spark, n_docs, partitions=64))
docs = corpus.select("doc_id", corpus.content.alias("text"))
# warm python workers on every executor (pandas-UDF stage)
from pke_spark.tokenizer import tokens_array
from pyspark.sql import functions as F
docs.limit(200).select(F.explode(tokens_array("text"))).count()

ix_dir = tempfile.mkdtemp(prefix=f"cluster_scale_{n_execs}_", dir="/dev/shm")
t0 = time.time()
import os as _os
if _os.environ.get("SCALE_DIRECT") == "1":
    from pke_spark.index.build import build_index_direct
    build_index_direct(docs, ix_dir, n_docs=n_docs, n_salts=8)
else:
    build_index(docs, ix_dir, n_parts=32, n_salts=8, driver_stats_max_bytes=0)
print("ELAPSED", time.time() - t0, flush=True)
shutil.rmtree(ix_dir, ignore_errors=True)
spark.stop()
import os
os._exit(0)  # spark-submit can hang in nonDaemon thread join after stop
"""


def _cpu_times() -> tuple[int, int]:
    with open("/proc/stat") as f:
        v = [int(x) for x in f.readline().split()[1:]]
    return sum(v), v[7]  # total, steal


def _port_open(port: int) -> bool:
    with socket.socket() as s:
        s.settimeout(1)
        return s.connect_ex(("127.0.0.1", port)) == 0


def ensure_cluster() -> None:
    """Start master + N_WORKERS pinned 2-core workers if not running."""
    env = dict(os.environ, SPARK_HOME=SPARK_HOME)
    if not _port_open(7077):
        subprocess.Popen(
            [f"{SPARK_HOME}/bin/spark-class",
             "org.apache.spark.deploy.master.Master",
             "--host", "127.0.0.1", "--port", "7077", "--webui-port", "0"],
            env=env, stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
        for _ in range(60):
            if _port_open(7077):
                break
            time.sleep(1)
    running = int(subprocess.run(
        ["pgrep", "-fc", "deploy.worker.Worker"],
        capture_output=True, text=True).stdout.strip() or 0)
    if running >= N_WORKERS:
        return
    os.makedirs("/dev/shm/spark_scale", exist_ok=True)
    for i in range(N_WORKERS):
        wenv = dict(env, SPARK_LOCAL_DIRS="/dev/shm/spark_scale",
                    SPARK_WORKER_DIR=f"/dev/shm/spark_workers/w{i}")
        # one worker per disjoint 2-core set, pinned: the executor pays
        # for its GC/JIT/python workers out of its own cores, like a
        # real resource-managed cluster container
        subprocess.Popen(
            ["taskset", "-c", f"{2 * i}-{2 * i + 1}",
             f"{SPARK_HOME}/bin/spark-class",
             "org.apache.spark.deploy.worker.Worker",
             "--host", "127.0.0.1", "--port", str(7100 + i),
             "--webui-port", "0", "--cores", str(EXEC_CORES),
             "--memory", "6g", MASTER_URL],
            env=wenv, stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    time.sleep(10)


def make_zip() -> str:
    zpath = "/dev/shm/pke_spark.zip"
    with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as z:
        pkg = os.path.join(REPO, "pke_spark")
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))
    return zpath


def run_build(n_execs: int, n_docs: int, zpath: str) -> tuple[float, float]:
    child = "/dev/shm/cluster_scale_child.py"
    with open(child, "w") as f:
        f.write(CHILD)
    tot0, st0 = _cpu_times()
    out = subprocess.run(
        [f"{SPARK_HOME}/bin/spark-submit",
         "--master", MASTER_URL,
         "--py-files", zpath,
         "--driver-memory", "8g",
         "--conf", f"spark.cores.max={n_execs * EXEC_CORES}",
         "--conf", f"spark.executor.cores={EXEC_CORES}",
         "--conf", "spark.executor.memory=5g",
         "--conf", "spark.executor.extraJavaOptions=-XX:+UseParallelGC",
         "--conf", "spark.ui.enabled=false",
         "--conf", "spark.ui.showConsoleProgress=false",
         child, str(n_execs), str(n_docs)],
        capture_output=True, text=True, timeout=2400,
        env=dict(os.environ, SPARK_HOME=SPARK_HOME))  # SCALE_DIRECT passes through os.environ
    tot1, st1 = _cpu_times()
    steal_pct = 100.0 * (st1 - st0) / max(tot1 - tot0, 1)
    for line in out.stdout.splitlines():
        if "ELAPSED" in line:
            return float(line.split("ELAPSED")[1].split()[0]), steal_pct
    raise RuntimeError(
        f"child failed (n_execs={n_execs}):\n{out.stderr[-3000:]}")


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    repeat = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    ensure_cluster()
    zpath = make_zip()
    lo, hi = [], []
    for _ in range(repeat):
        lo.append(run_build(N_LOW, n_docs, zpath))
        hi.append(run_build(N_HIGH, n_docs, zpath))
    t_lo = min(t for t, _ in lo)
    t_hi = min(t for t, _ in hi)
    eff = (t_lo / t_hi) / (N_HIGH / N_LOW)
    out = {
        "mode": "standalone cluster, 2-core executor JVMs on disjoint pinned core sets, spark-submit --py-files",
        "executor_cores": EXEC_CORES,
        "n_docs": n_docs,
        "executors_low": N_LOW,
        "executors_high": N_HIGH,
        f"exec{N_LOW}_sec": round(t_lo, 2),
        f"exec{N_LOW}_docs_per_sec": round(n_docs / t_lo, 1),
        f"exec{N_HIGH}_sec": round(t_hi, 2),
        f"exec{N_HIGH}_docs_per_sec": round(n_docs / t_hi, 1),
        "speedup": round(t_lo / t_hi, 3),
        "scaling_efficiency": round(eff, 3),
        "runs": [{"executors": N_LOW, "sec": round(t, 2),
                  "steal_pct": round(s, 1)} for t, s in lo]
                + [{"executors": N_HIGH, "sec": round(t, 2),
                    "steal_pct": round(s, 1)} for t, s in hi],
    }
    os.makedirs(os.path.join(REPO, "benchmarks"), exist_ok=True)
    fname = ("scaling_cluster_direct.json"
             if os.environ.get("SCALE_DIRECT") == "1"
             else "scaling_cluster.json")
    with open(os.path.join(REPO, "benchmarks", fname), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
