"""spark-submit entrypoint for BM25 queries against a built index.

Usage:
  spark-submit --py-files /tmp/pke_spark.zip scripts/query_submit.py \
      --index <index dir> --query "camelCaseIdent other terms" [--k 10] \
      [--mode wand|exhaustive]
  # or a whole query set (one job for all of them):
  spark-submit ... scripts/query_submit.py --index <dir> \
      --query-file queries.txt [--k 10]   # one query per line
  # or the Lucene-lite query-string language (expansion / phrases /
  # boolean clauses / metadata filters), answered from the index:
  spark-submit ... scripts/query_submit.py --index <dir> \
      --querystring '+spark join -vector lang:en "merge slow" tab*' \
      [--docs <documents.parquet>] [--snippets] [--k 10]
"""

from __future__ import annotations

import argparse
import json
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--index", required=True)
    g = ap.add_mutually_exclusive_group(required=True)
    g.add_argument("--query")
    g.add_argument("--query-file",
                   help="text file, one query per line; the whole set "
                        "runs as ONE batched Spark job")
    g.add_argument("--querystring",
                   help="Lucene-lite query string (+must -not bare "
                        '"a phrase" lang:en tab* spar~1), compiled '
                        "onto the index serving path")
    g.add_argument("--querystring-file",
                   help="text file, one Lucene-lite query string per "
                        "line (or 'id<TAB>query' lines); the whole "
                        "set (full grammar per query) runs as ONE "
                        "batched Spark job")
    g.add_argument("--more-like", type=int, metavar="DOC_ID",
                   help="More-Like-This: rank docs similar to DOC_ID "
                        "(its top tf*idf terms searched as SHOULD)")
    ap.add_argument("--docs", help="documents parquet (required only "
                    "when --querystring has field:value filters)")
    ap.add_argument("--min-should-match", type=int, default=0,
                    help="min SHOULD clauses a candidate must satisfy "
                         "(--querystring mode only)")
    ap.add_argument("--count-only", action="store_true",
                    help="return the total hit count instead of ranked "
                         "results (--querystring mode only)")
    ap.add_argument("--sort-by", metavar="FIELD[:asc|:desc]",
                    help="order matches by a stored field instead of "
                         "BM25 (--querystring mode only)")
    ap.add_argument("--snippets", action="store_true",
                    help="with --query: return best highlight windows "
                         "from the positional sidecar")
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--mode", choices=["wand", "exhaustive"], default="wand")
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    spark = SparkSession.builder.appName("pke_spark_query").getOrCreate()

    from pke_spark.index.build import IndexReader
    from pke_spark.index.wand import bm25_indexed, bm25_topk_batch, wand_topk
    from pke_spark.tokenizer import tokenize_text

    ix = IndexReader(spark, args.index)
    if args.query_file:
        with open(args.query_file) as f:
            qset = {f"q{i}": tokenize_text(line)
                    for i, line in enumerate(f) if line.strip()}
        t0 = time.time()
        rows = bm25_topk_batch(ix, qset, args.k).collect()
        out = {}
        for r in rows:
            out.setdefault(r.query_id, []).append(
                {"rank": r.rank, "doc_id": r.doc_id, "score": r.score})
        print(json.dumps({
            "queries": {qid: " ".join(ts) for qid, ts in qset.items()},
            "mode": "batch",
            "latency_sec": round(time.time() - t0, 4),
            "results": {qid: sorted(v, key=lambda x: x["rank"])
                        for qid, v in sorted(out.items())}}))
        return

    if args.more_like is not None:
        from pke_spark.index.serving import more_like_this_indexed
        t0 = time.time()
        rows = more_like_this_indexed(ix, args.more_like, args.k)
        print(json.dumps({
            "doc_id": args.more_like, "mode": "more_like_this",
            "latency_sec": round(time.time() - t0, 4),
            "results": [{"rank": r, "doc_id": d, "score": s}
                        for r, d, s in rows]}))
        return

    if args.querystring_file:
        from pke_spark.index.serving import querystring_topk_batch
        # one query per line; a line may carry its own id as
        # "id<TAB>query" (the usual eval-set TSV shape)
        import re as _re
        qset = {}
        with open(args.querystring_file) as f:
            for i, line in enumerate(f):
                line = line.strip()
                if not line:
                    continue
                qid, tab, rest = line.partition("\t")
                # accept the TSV form only when the first field looks
                # like an id (no query-grammar metacharacters): a query
                # that legitimately contains a tab must not have its
                # first term silently eaten as an id (ADVICE r5)
                if tab and rest.strip() and _re.fullmatch(
                        r"[A-Za-z0-9_.:-]+", qid.strip()):
                    key = qid.strip()
                    if key in qset:
                        raise SystemExit(
                            f"duplicate query id {key!r} in "
                            f"{args.querystring_file} (line {i + 1})")
                    qset[key] = rest.strip()
                else:
                    qset[f"q{i:05d}"] = line
        t0 = time.time()
        rows = querystring_topk_batch(
            ix, qset, args.k, docs_parquet=args.docs,
            min_should_match=args.min_should_match).collect()
        out: dict = {}
        for r in rows:
            out.setdefault(r.query_id, []).append(
                {"rank": r.rank, "doc_id": r.doc_id, "score": r.score})
        print(json.dumps({
            "queries": qset, "mode": "querystring_batch",
            "latency_sec": round(time.time() - t0, 4),
            "results": {qid: sorted(v, key=lambda x: x["rank"])
                        for qid, v in sorted(out.items())}}))
        return

    if args.querystring:
        from pke_spark.index.serving import (querystring_count_indexed,
                                             querystring_search_indexed,
                                             querystring_sort_indexed)
        t0 = time.time()
        if args.count_only:
            n = querystring_count_indexed(
                ix, args.querystring, docs_parquet=args.docs,
                min_should_match=args.min_should_match)
            print(json.dumps({
                "querystring": args.querystring, "mode": "count",
                "latency_sec": round(time.time() - t0, 4),
                "n_hits": n}))
            return
        if args.sort_by:
            field, _, direc = args.sort_by.partition(":")
            if direc not in ("", "asc", "desc"):
                raise SystemExit(
                    f"--sort-by direction must be asc or desc, "
                    f"got {direc!r}")
            rows = querystring_sort_indexed(
                ix, args.querystring, field, direc == "asc", args.k,
                docs_parquet=args.docs,
                min_should_match=args.min_should_match)
            print(json.dumps({
                "querystring": args.querystring, "mode": "sort",
                "sort_by": args.sort_by,
                "latency_sec": round(time.time() - t0, 4),
                "results": [{"rank": r[0], "doc_id": r[1],
                             field: (r[2] if len(r) > 2 else r[1])}
                            for r in rows]}))
            return
        rows = querystring_search_indexed(
            ix, args.querystring, args.k, docs_parquet=args.docs,
            min_should_match=args.min_should_match)
        print(json.dumps({
            "querystring": args.querystring, "mode": "querystring",
            "latency_sec": round(time.time() - t0, 4),
            "results": [{"rank": r, "doc_id": d, "score": s}
                        for r, d, s in rows]}))
        return

    terms = tokenize_text(args.query)
    if args.snippets:
        from pke_spark.index.serving import snippet_search
        t0 = time.time()
        rows = snippet_search(ix, terms, args.k)
        print(json.dumps({
            "query": terms, "mode": "snippets",
            "latency_sec": round(time.time() - t0, 4),
            "results": [{"rank": r, "doc_id": d, "score": s,
                         "win_start": ws, "win_end": we, "n_terms": nt}
                        for r, d, s, ws, we, nt in rows]}))
        return
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
