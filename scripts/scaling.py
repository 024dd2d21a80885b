"""Scaling-efficiency evidence (north rule: >= 0.8 between N and 4N).

Runs the IDENTICAL index build (same input, same code) at local[8] and
local[32], reports docs/sec at both plus efficiency
  eff = (T_8 / T_32) / 4       (ideal linear scaling -> 1.0)
and writes benchmarks/scaling.json (embedded by bench.py) — the sandbox
proxy for an N- vs 4N-executor cluster run.

Usage: python scripts/scaling.py [n_docs]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pke_spark.corpus import synth_corpus, with_doc_ids  # noqa: E402
from pke_spark.index.build import build_index  # noqa: E402
from pke_spark.session import get_spark  # noqa: E402


def run_build(cpus: int, n_docs: int) -> float:
    spark = get_spark(f"scaling_{cpus}", cpus=cpus, shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    corpus = with_doc_ids(synth_corpus(spark, n_docs, partitions=cpus))
    docs = corpus.select("doc_id", corpus.content.alias("text"))
    ix_dir = tempfile.mkdtemp(prefix=f"pke_spark_scale_{cpus}_")
    # warm the JVM/Python workers so we measure the build, not startup
    docs.limit(100).count()
    t0 = time.time()
    build_index(docs, ix_dir, n_parts=8, n_salts=8)
    dt = time.time() - t0
    shutil.rmtree(ix_dir, ignore_errors=True)
    spark.stop()
    return dt


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    t8 = run_build(8, n_docs)
    t32 = run_build(32, n_docs)
    eff = (t8 / t32) / 4.0
    out = {
        "n_docs": n_docs,
        "local8_sec": round(t8, 2),
        "local8_docs_per_sec": round(n_docs / t8, 1),
        "local32_sec": round(t32, 2),
        "local32_docs_per_sec": round(n_docs / t32, 1),
        "speedup_8_to_32": round(t8 / t32, 3),
        "scaling_efficiency": round(eff, 3),
    }
    os.makedirs("/root/repo/benchmarks", exist_ok=True)
    with open("/root/repo/benchmarks/scaling.json", "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
