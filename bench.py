"""Benchmark harness. Prints ONE JSON line:
{"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Headline numbers:
- index_build_docs_per_sec: full inverted-index build (stage + segments
  + salted encode) over the deterministic synthetic source-code corpus
  (input_hint shape) at ~200k docs/SF.
- bm25_p50_sec: median Block-Max WAND top-10 latency over a fixed
  21-query set against that index.
- per-query wall times for ALL __spark_entry__.queries() entries at
  $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), plus per-model
  docs/s vs the reference's published single-CPU inspec throughputs
  (reference results.md:6-13) under "model_throughput".

If benchmarks/scaling.json exists (written by scripts/scaling.py: the
same build at local[8] vs local[32]), its numbers are embedded.
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entry  # noqa: E402
from pke_spark.corpus import synth_corpus, with_doc_ids  # noqa: E402
from pke_spark.index.build import IndexReader, build_index  # noqa: E402
from pke_spark.index.wand import wand_topk  # noqa: E402
from pke_spark.session import get_spark  # noqa: E402

BENCH_QUERIES = [
    ["build", "index"], ["def"], ["return"], ["import"],
    ["uniq", "tok", "7"], ["uniq", "tok", "777"], ["decode", "varint"],
    ["pack", "probe", "cursor"], ["rank", "shard"], ["flush", "buffer"],
    ["emit", "stream"], ["scan", "block", "delta"], ["lexer"],
    ["parser", "cache"], ["seek", "codec"], ["core", "lib", "42"],
    ["encode", "posting"], ["split", "token"], ["fetch", "writer"],
    ["nosuchterm"], ["def", "build", "index", "token"],
]

# reference single-CPU throughputs on inspec (results.md:6-13) for the
# per-model docs/s comparison the driver grades against
REF_DOCS_PER_SEC = {
    "firstphrases": 624.1, "tfidf_topk": 618.4, "textrank": 397.3,
    "singlerank": 393.7, "positionrank": 379.3, "topicrank": 266.5,
    "multipartiterank": 211.2, "topical_pagerank": 17.7,
}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", ""))
    except ValueError:
        sf = 0.1
    n_synth = max(5000, int(1_000_000 * sf))

    spark = get_spark("bench", cpus=cpus, shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    t_start = time.time()
    results: dict[str, float] = {}

    # ---- headline 1: index build throughput (synthetic corpus) ----
    corpus = with_doc_ids(synth_corpus(spark, n_synth, partitions=cpus))
    docs = corpus.select("doc_id", corpus.content.alias("text"))
    ix_dir = tempfile.mkdtemp(prefix="pke_spark_bench_ix_")
    t0 = time.time()
    build_index(docs, ix_dir, n_parts=8, n_salts=8)
    build_sec = time.time() - t0
    results["index_build"] = round(build_sec, 3)
    docs_per_sec = n_synth / build_sec

    # ---- headline 1b: dense-ordinal build (the production layout) ----
    from pke_spark.index.build import _dir_bytes
    dix_dir = tempfile.mkdtemp(prefix="pke_spark_bench_dix_")
    t0 = time.time()
    build_index(docs, dix_dir, n_parts=8, n_salts=8, dense_doc_ids=True)
    results["index_build_dense"] = round(time.time() - t0, 3)
    dense_extras = {
        "postings_bytes_sparse": _dir_bytes(f"{ix_dir}/postings"),
        "postings_bytes_dense": _dir_bytes(f"{dix_dir}/postings"),
        # the docmap is part of a dense index's query-time cost —
        # report it so the compression claim includes it
        "postings_docmap_bytes": _dir_bytes(f"{dix_dir}/postings_docmap"),
    }
    shutil.rmtree(dix_dir, ignore_errors=True)

    # ---- headline 2: WAND top-10 latency p50 ----
    ix = IndexReader(spark, ix_dir)
    lat = []
    for q in BENCH_QUERIES:
        t0 = time.time()
        wand_topk(ix, q, 10).collect()
        lat.append(time.time() - t0)
    p50 = statistics.median(lat)
    results["bm25_wand_p50"] = round(p50, 4)

    # ---- headline 2b: the whole query set as ONE batched job ----
    from pke_spark.index.wand import bm25_topk_batch
    t0 = time.time()
    bm25_topk_batch(ix, {f"q{i}": q for i, q in enumerate(BENCH_QUERIES)},
                    10).count()
    results["bm25_batch21"] = round(time.time() - t0, 3)

    # ---- headline 2c: positional sidecar + phrase/proximity queries --
    from pke_spark.index.positions import (build_positions, positions_dir,
                                           phrase_topk_indexed,
                                           proximity_topk_indexed)
    t0 = time.time()
    build_positions(docs, ix_dir, n_salts=8)
    results["positions_build"] = round(time.time() - t0, 3)
    pos_extras = {"positions_bytes": _dir_bytes(positions_dir(ix_dir))}
    t0 = time.time()
    phrase_topk_indexed(spark, ix_dir, ["core", "lib"], 10).collect()
    results["phrase_indexed_hot"] = round(time.time() - t0, 3)
    t0 = time.time()
    phrase_topk_indexed(spark, ix_dir, ["marker", "uniq", "tok"],
                        10).collect()
    results["phrase_indexed_3term"] = round(time.time() - t0, 3)
    t0 = time.time()
    proximity_topk_indexed(spark, ix_dir, "def", "return", 8, 10).collect()
    results["proximity_indexed"] = round(time.time() - t0, 3)

    # ---- headline 2d: boolean-filtered BM25 (driver-native path) ----
    from pke_spark.index.wand import boolean_search
    t0 = time.time()
    boolean_search(ix, ["def", "return"], ["core"], ["lexer"], 10)
    results["boolean_indexed"] = round(time.time() - t0, 3)

    # ---- headline 2e: query-language serving against the same index
    # (term-dictionary expansion, query-string compile, snippets) ----
    from pke_spark.index import serving as SV
    t0 = time.time()
    SV.prefix_search(ix, "re", 10)
    results["prefix_serve"] = round(time.time() - t0, 3)
    t0 = time.time()
    SV.fuzzy_search(ix, "retur", 1, 10)
    results["fuzzy_serve"] = round(time.time() - t0, 3)
    t0 = time.time()
    SV.querystring_search_indexed(
        ix, '+def return -lexer "core lib" ind* retur~1', 10)
    results["querystring_serve"] = round(time.time() - t0, 3)
    t0 = time.time()
    SV.snippet_search(ix, ["def", "return", "core"], 10)
    results["snippet_serve"] = round(time.time() - t0, 3)

    # ---- serving QPS: sustained 200-query load (VERDICT r2 item 8) --
    # 200 distinct queries (the 21-query set + uniq-token variants);
    # batch mode amortizes one Spark job over the set, sequential mode
    # measures the long-lived reader + driver fast path per query
    q200 = {f"s{i}": (BENCH_QUERIES[i % len(BENCH_QUERIES)]
                      + [f"uniq", "tok", str(7 * i)])
            for i in range(200)}
    t0 = time.time()
    bm25_topk_batch(ix, q200, 10).count()
    dt = time.time() - t0
    serving = {"batch200_sec": round(dt, 3),
               "batch200_qps": round(200 / dt, 1)}
    t0 = time.time()
    for q in list(q200.values())[:50]:
        wand_topk(ix, q, 10).collect()
    dt = time.time() - t0
    serving["sequential50_sec"] = round(dt, 3)
    serving["sequential_qps"] = round(50 / dt, 1)
    # serving-native path: no DataFrame round-trip per query
    from pke_spark.index.wand import search as ix_search
    t0 = time.time()
    for q in q200.values():
        ix_search(ix, q, 10)
    dt = time.time() - t0
    serving["native200_sec"] = round(dt, 3)
    serving["native_qps"] = round(200 / dt, 1)

    # ---- per-query suite: EVERY queries() entry at sf_dir ----
    # pre-build the cached gate index the *_indexed entries share, as
    # its own metric — so those entries time QUERIES, not the build
    t0 = time.time()
    entry._served_reader(spark, sf_dir)
    results["gate_index_build"] = round(time.time() - t0, 3)
    qs = entry.queries()
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    model_tput = {}
    for name in sorted(qs):
        t0 = time.time()
        try:
            qs[name](spark, sf_dir).count()
        except Exception as exc:  # noqa: BLE001 — one broken query must
            # not zero the whole bench artifact; record and continue
            print(f"bench query {name} FAILED: {exc}", file=sys.stderr)
            results[name] = -1.0
            continue
        dt = time.time() - t0
        results[name] = round(dt, 3)
        if name in REF_DOCS_PER_SEC and dt > 0:
            model_tput[name] = {
                "docs_per_sec": round(n_docs / dt, 1),
                "ref_docs_per_sec_1cpu": REF_DOCS_PER_SEC[name],
                "ratio_vs_ref": round((n_docs / dt)
                                      / REF_DOCS_PER_SEC[name], 2)}

    shutil.rmtree(ix_dir, ignore_errors=True)

    # ---- TPR train vs serve split (VERDICT r2 item 4) ----
    # the per-query suite above times the serving path (committed LDA
    # artifact); time one in-bench training run for the ratio
    from pke_spark.ops import tpr as tpr_mod
    sf_docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    t0 = time.time()
    tpr_mod.train_tpr(sf_docs)
    tpr_train_sec = round(time.time() - t0, 3)

    total = round(time.time() - t_start, 3)

    extras = {
        "index_build_docs_per_sec": round(docs_per_sec, 1),
        "index_build_n_docs": n_synth,
        "bm25_wand_p50_sec": round(p50, 4),
        "bm25_wand_mean_sec": round(sum(lat) / len(lat), 4),
        "cpus": cpus,
        "suite_n_docs": n_docs,
        "tpr_train_sec": tpr_train_sec,
        "tpr_serve_sec": results.get("topical_pagerank"),
        "serving": serving,
        "model_throughput": model_tput,
        **dense_extras,
        **pos_extras,
    }
    bench_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "benchmarks")
    for key, fname in (("scaling", "scaling.json"),
                       ("scaling_direct", "scaling_direct.json"),
                       ("scaling_teed", "scaling_teed.json"),
                       ("scaling_positions", "scaling_positions.json"),
                       ("scaling_cluster", "scaling_cluster.json"),
                       ("scaling_cluster_direct",
                        "scaling_cluster_direct.json"),
                       ("membw_evidence", "membw_evidence.json"),
                       ("phase_timing", "phase_timing.json"),
                       ("capacity_2m", "capacity_2m.json")):
        path = os.path.join(bench_dir, fname)
        if os.path.exists(path):
            with open(path) as f:
                extras[key] = json.load(f)

    spark.stop()
    payload = {
        "metric": "bench_suite_seconds",
        "value": total,
        "unit": "sec",
        "queries": results,
        "sf": sf,
        **extras,
    }
    # Persist the FULL record to a file: the driver captures only a
    # ~2 KB stdout TAIL, so a 12 KB line gets truncated from the front
    # (BENCH_r02/r03 parsed: null). The file copy is the durable record;
    # stdout gets a compact payload that fits the capture window whole.
    #
    # Clobber guard (VERDICT r4 item 8): if bench_latest.json holds a
    # PROTOCOL record (multi-run minima from scripts/bench_protocol.py),
    # a bare one-shot run must not overwrite it — the driver runs
    # bench.py once at end-of-round and twice now that single pass has
    # replaced the committed minima in the tree. The protocol runner
    # sets SPARK_GRAFT_BENCH_CLOBBER=1; everyone else lands in
    # bench_oneshot.json and the stdout line points there.
    os.makedirs(bench_dir, exist_ok=True)
    latest = os.path.join(bench_dir, "bench_latest.json")
    record_name = "bench_latest.json"
    if not os.environ.get("SPARK_GRAFT_BENCH_CLOBBER"):
        try:
            with open(latest) as f:
                if "protocol" in json.load(f):
                    record_name = "bench_oneshot.json"
        except (OSError, ValueError):
            pass
    with open(os.path.join(bench_dir, record_name), "w") as f:
        f.write(json.dumps(payload) + "\n")

    def _scaling_eff(rec) -> float | None:
        try:
            return rec["scaling_efficiency"]
        except (KeyError, TypeError):
            return None

    compact = {
        "metric": "bench_suite_seconds",
        "value": total,
        "unit": "sec",
        "queries": {k: round(v, 2) for k, v in results.items()},
        "sf": sf,
        "cpus": cpus,
        "index_build_docs_per_sec": round(docs_per_sec, 1),
        "bm25_wand_p50_sec": round(p50, 4),
        "bm25_batch200_qps": serving["batch200_qps"],
        "bm25_native_qps": serving["native_qps"],
        "scaling_efficiency": {
            k: _scaling_eff(extras.get(k)) for k in
            ("scaling", "scaling_direct", "scaling_teed",
             "scaling_cluster", "scaling_cluster_direct")
            if k in extras},
        "full_record": f"benchmarks/{record_name}",
    }
    line = json.dumps(compact, separators=(",", ":"))
    # stay inside the driver's ~2 KB stdout tail window: shed headline
    # extras FIRST (they live in bench_latest.json anyway) — the
    # "queries" dict is the driver contract and goes last
    if len(line) > 1900:
        for k in ("scaling_efficiency", "bm25_batch200_qps",
                  "bm25_native_qps", "bm25_wand_p50_sec",
                  "index_build_docs_per_sec"):
            compact.pop(k, None)
        line = json.dumps(compact, separators=(",", ":"))
    if len(line) > 1900:
        compact["queries"] = {k: round(v, 1)
                              for k, v in results.items()}
        line = json.dumps(compact, separators=(",", ":"))
    if len(line) > 1900:
        compact.pop("queries")
        compact["queries_in"] = f"benchmarks/{record_name}"
        line = json.dumps(compact, separators=(",", ":"))
    print(line)


if __name__ == "__main__":
    main()
