"""spark-submit entrypoint for BM25 queries against a built index.

Usage:
  spark-submit --py-files /tmp/pke_spark.zip scripts/query_submit.py \
      --index <index dir> --query "camelCaseIdent other terms" [--k 10] \
      [--mode wand|exhaustive]
"""

from __future__ import annotations

import argparse
import json
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--index", required=True)
    ap.add_argument("--query", required=True)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--mode", choices=["wand", "exhaustive"], default="wand")
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    spark = SparkSession.builder.appName("pke_spark_query").getOrCreate()

    from pke_spark.index.build import IndexReader
    from pke_spark.index.wand import bm25_indexed, wand_topk
    from pke_spark.tokenizer import tokenize_text

    terms = tokenize_text(args.query)
    ix = IndexReader(spark, args.index)
    t0 = time.time()
    fn = wand_topk if args.mode == "wand" else bm25_indexed
    rows = fn(ix, terms, args.k).collect()
    print(json.dumps({
        "query": terms, "mode": args.mode,
        "latency_sec": round(time.time() - t0, 4),
        "results": [{"rank": r.rank, "doc_id": r.doc_id, "score": r.score}
                    for r in rows]}))


if __name__ == "__main__":
    main()
