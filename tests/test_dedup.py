

def test_minhash_signatures_match_spark_md5(spark):
    """The per-doc Python signature pass (hashlib.md5) must equal the
    pure-Spark md5 formula bit-for-bit — the LSH pair set and the
    frozen oracle hashes depend on it."""
    from pyspark.sql import functions as F

    from pke_spark.ops.dedup import _h64, minhash_signatures

    docs = spark.createDataFrame(
        [(1, "Alpha beta gamma alpha"), (2, "unicode_déjà vu café"),
         (3, ""), (4, "x y z x y z")],
        "doc_id long, text string")
    got = {(r.doc_id, r.i): r.sig
           for r in minhash_signatures(docs, 4).collect()}
    from pke_spark.tokenizer import tokens_exploded
    toks = tokens_exploded(docs).select("doc_id", "term").distinct()
    hashes = spark.range(4).select(F.col("id").alias("i"))
    want = {(r.doc_id, r.i): r.sig for r in
            (toks.crossJoin(F.broadcast(hashes))
             .select("doc_id", "i",
                     _h64(F.concat(F.col("i").cast("string"), F.lit(":"),
                                   F.col("term"))).alias("h"))
             .groupBy("doc_id", "i").agg(F.min("h").alias("sig"))
             .collect())}
    assert got == want and len(got) == 12  # doc 3 has no tokens
