"""Per-query isolation harness for optimization work (guide §1).

NOT the driver contract — ``bench.py`` stays the frozen measurement
surface. This file exists so optimization evidence can be produced
without touching it:

- times individual ``__spark_entry__.queries()`` entries with the noop
  sink (computes every column of every row, discards the result —
  §1.4), labelled via setJobDescription (§1.5)
- ``--explain DIR [SUFFIX]`` also writes each query's
  ``explain('formatted')`` to ``DIR/<name>_<SUFFIX>.txt`` (the plan
  evidence committed under plans/r06/)
- ``--repeat N`` reports all samples + min

Usage:
  python bench_extra.py [--sf DIR] [--repeat N] [--explain DIR [--suffix S]]
                        name [name ...]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entry  # noqa: E402
from pke_spark.session import get_spark  # noqa: E402


def noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--repeat", type=int, default=1)
    ap.add_argument("--explain", default=None,
                    help="directory for explain('formatted') dumps")
    ap.add_argument("--suffix", default="plan",
                    help="suffix for plan filenames (before/after)")
    ap.add_argument("--gate-index", action="store_true",
                    help="pre-build the shared gate index first (so "
                         "*_indexed entries time queries, not the build)")
    args = ap.parse_args()

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("bench_extra", cpus=cpus, shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()
    if args.gate_index:
        t0 = time.time()
        entry._served_reader(spark, args.sf)
        print(f"gate_index_build {time.time() - t0:.3f}s", flush=True)

    for name in args.names:
        fn = qs[name]
        if args.explain:
            os.makedirs(args.explain, exist_ok=True)
            df = fn(spark, args.sf)
            import contextlib
            import io
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            path = os.path.join(args.explain, f"{name}_{args.suffix}.txt")
            with open(path, "w") as f:
                f.write(buf.getvalue())
            print(f"wrote {path}", flush=True)
        samples = []
        for i in range(args.repeat):
            spark.sparkContext.setJobDescription(f"{name} [{i}]")
            t0 = time.time()
            noop(fn(spark, args.sf))
            samples.append(round(time.time() - t0, 3))
            spark.sparkContext.setJobDescription(None)
        print(f"{name}: min={min(samples)} samples={samples}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
