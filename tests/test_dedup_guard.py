"""MinHash-LSH hot-band-group guard: buckets over max_group star-link
to the canonical doc instead of emitting O(g^2) pairs; the SQL twin
computes the identical set."""

from __future__ import annotations

import duckdb

from pke_spark.ops import dedup


def _mass_docs(spark, n_dups=10, n_others=5):
    rows = [(i, "identical mass duplicate document body text") for i in
            range(n_dups)]
    rows += [(100 + i, f"unique{i} filler content number{i} words{i}")
             for i in range(n_others)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_star_link_above_cap(spark):
    docs = _mass_docs(spark, n_dups=10)
    got = dedup.minhash_lsh_pairs(docs, max_group=4).collect()
    pairs = {(r.doc_a, r.doc_b) for r in got}
    # 10 identical docs in one band group, cap 4 -> star to doc 0
    star = {(0, i) for i in range(1, 10)}
    assert star <= pairs
    assert all(a == 0 for (a, b) in pairs if b < 100)  # no non-star dup pair
    assert len([p for p in pairs if p[1] < 100]) == 9
    # est_jaccard of identical docs is 1.0
    assert all(abs(r.est_jaccard - 1.0) < 1e-9 for r in got if r.doc_b < 100)


def test_all_pairs_below_cap(spark):
    docs = _mass_docs(spark, n_dups=5)
    got = {(r.doc_a, r.doc_b)
           for r in dedup.minhash_lsh_pairs(docs, max_group=64).collect()}
    want = {(i, j) for i in range(5) for j in range(i + 1, 5)}
    assert want <= got


def test_guard_matches_sql_twin(spark, tmp_path):
    docs = _mass_docs(spark, n_dups=10)
    p = str(tmp_path / "docs.parquet")
    docs.write.parquet(p)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{p}/*.parquet')")
    want = {tuple(r) for r in con.execute(
        dedup.minhash_lsh_pairs_sql(max_group=4)).fetchall()}
    got = {(r.doc_a, r.doc_b, r.est_jaccard)
           for r in dedup.minhash_lsh_pairs(docs, max_group=4).collect()}
    assert got == want


def test_dedup_clusters_equals_union_find(spark, sf_dir):
    """Connected components (min-label propagation) vs an independent
    driver-side union-find over the same LSH pairs."""
    from pke_spark.ops import dedup

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").cache()
    try:
        _check_clusters_vs_union_find(docs)
    finally:
        docs.unpersist()


def _check_clusters_vs_union_find(docs):
    from pke_spark.ops import dedup

    pairs = dedup.minhash_lsh_pairs(docs).select("doc_a", "doc_b").collect()
    parent: dict[int, int] = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for r in pairs:
        union(int(r.doc_a), int(r.doc_b))
    want = {int(r.doc_id): find(int(r.doc_id))
            for r in docs.select("doc_id").collect()}
    got = {int(r.doc_id): int(r.cluster_id)
           for r in dedup.dedup_clusters(docs).collect()}
    assert got == want

def test_star_components_path_graph(spark):
    """Alternating large/small-star contraction on a diameter-100 path
    (min-label would need 100 rounds) + disjoint cliques + singletons."""
    edges = [(i, i + 1) for i in range(100)]            # path 0..100
    edges += [(200 + i, 200 + j) for i in range(5) for j in range(i)]
    edges += [(301, 300), (302, 300)]                   # star
    df = spark.createDataFrame(edges, "src long, dst long")
    sym = df.unionByName(df.selectExpr("dst as src", "src as dst"))
    got = {(r.doc_id, r.cluster_id)
           for r in dedup._star_components(sym).collect()}
    want = {(i, 0) for i in range(101)}
    want |= {(200 + i, 200) for i in range(5)}
    want |= {(300 + i, 300) for i in range(3)}
    assert got == want


def test_dedup_clusters_deep_component_fallback(spark, sf_dir):
    """max_iter too small for convergence -> the star fallback still
    returns the exact transitive closure (vs union-find)."""
    docs = (spark.read.parquet(f"{sf_dir}/documents.parquet")
            .limit(200).cache())
    try:
        pairs = (dedup.minhash_lsh_pairs(docs)
                 .select("doc_a", "doc_b").collect())
        parent: dict[int, int] = {}

        def find(x):
            while parent.setdefault(x, x) != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for r in pairs:
            ra, rb = find(int(r.doc_a)), find(int(r.doc_b))
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        want = {int(r.doc_id): find(int(r.doc_id))
                for r in docs.select("doc_id").collect()}
        got = {int(r.doc_id): int(r.cluster_id)
               for r in dedup.dedup_clusters(docs, max_iter=1).collect()}
        assert got == want
    finally:
        docs.unpersist()
