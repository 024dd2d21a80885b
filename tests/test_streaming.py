"""Streaming incremental ingest: index(half A) + stream-append(half B)
+ refresh must equal a single-shot batch build over A+B."""

from __future__ import annotations

import pandas as pd
import pytest

from pke_spark import oracle, streaming
from pke_spark.corpus import synth_corpus, with_doc_ids
from pke_spark.index import codec
from pke_spark.index.build import IndexReader, build_index
from pke_spark.index.wand import wand_topk


def _decoded(spark, index_dir):
    rows = IndexReader(spark, index_dir, cache=False).postings().collect()
    got = []
    for r in rows:
        ds, ts, _ = codec.decode_blocks(r.blocks)
        got += [(r.term, int(a), int(b)) for a, b in zip(ds, ts)]
    return pd.DataFrame(sorted(got), columns=["term", "doc_id", "tf"])


@pytest.mark.timeout(300)
def test_stream_append_equals_batch_build(spark, tmp_path):
    c = with_doc_ids(synth_corpus(spark, 120, partitions=4))
    docs = c.select("doc_id", c.content.alias("text")).cache()
    half_a = docs.filter("pmod(doc_id, 2) = 0")
    half_b = docs.filter("pmod(doc_id, 2) != 0")

    ix_dir = str(tmp_path / "ix_stream")
    build_index(half_a, ix_dir, n_parts=4, n_salts=4, hot_threshold=30,
                block_size=32)

    # stage half B as a parquet dir and stream it in
    src = str(tmp_path / "incoming")
    half_b.write.parquet(src)
    stream = spark.readStream.schema("doc_id long, text string").parquet(src)
    q = streaming.incremental_index(
        stream, ix_dir, str(tmp_path / "ckpt"), n_parts=4)
    q.awaitTermination(120)
    streaming.refresh_postings(spark, ix_dir, n_salts=4, hot_threshold=30,
                               block_size=32)

    ref_dir = str(tmp_path / "ix_batch")
    build_index(docs, ref_dir, n_parts=4, n_salts=4, hot_threshold=30,
                block_size=32)
    pd.testing.assert_frame_equal(_decoded(spark, ix_dir),
                                  _decoded(spark, ref_dir))

    # stats refreshed correctly -> identical query results
    pdf = docs.toPandas()
    texts = dict(zip(pdf.doc_id, pdf.text))
    ix = IndexReader(spark, ix_dir)
    for qq in (["build", "index"], ["def"]):
        got = wand_topk(ix, qq, 10, n_buckets=8).toPandas()
        want = oracle.bm25_topk(texts, qq, 10)
        pd.testing.assert_frame_equal(
            got.astype({"rank": "int64"}), want.astype({"rank": "int64"}),
            check_exact=False, atol=1e-9)

    # at-least-once replay: re-appending an already-committed epoch must
    # not change the index (epoch-keyed dynamic partition overwrite)
    streaming.append_batch(half_b, ix_dir, epoch_id=0, n_parts=4)
    streaming.refresh_postings(spark, ix_dir, n_salts=4, hot_threshold=30,
                               block_size=32)
    pd.testing.assert_frame_equal(_decoded(spark, ix_dir),
                                  _decoded(spark, ref_dir))


def test_windowed_stream_equals_batch(spark, tmp_path, sf_dir):
    """Watermarked 1-hour windows over a file stream (availableNow,
    complete mode on a memory sink) == the batch aggregation."""
    from pke_spark.ops import events as ev

    batch = spark.read.parquet(f"{sf_dir}/events.parquet")
    want = {(r.window_start, r.event_type): (r.n_events, r.total_value)
            for r in ev.events_windowed(batch).collect()}

    # split into multiple files so the stream sees several batches
    src = str(tmp_path / "ev_src")
    batch.repartition(4).write.parquet(src)
    # one file per micro-batch (availableNow honors maxFilesPerTrigger)
    # so the aggregation actually accumulates across several batches —
    # a single-batch run would pass even with broken state handling
    stream = (spark.readStream.schema(batch.schema)
              .option("maxFilesPerTrigger", 1).parquet(src))
    agg = streaming.windowed_event_counts(stream)
    q = (agg.writeStream.format("memory").queryName("winagg")
         .outputMode("complete").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {(r.window_start, r.event_type): (r.n_events, r.total_value)
           for r in spark.sql("SELECT * FROM winagg").collect()}
    assert got == want and len(got) > 0


@pytest.mark.timeout(300)
def test_rebuild_resets_stream_state_and_pointer(spark, tmp_path):
    """A fresh build_index over a dir that previously had stream appends
    and a postings refresh (versioned dir + POSTINGS_CURRENT pointer)
    must serve exactly the NEW corpus: no stale stream docs unioned into
    the stats, and readers resolving the new postings, not the
    pre-rebuild versioned dir."""
    import os

    c = with_doc_ids(synth_corpus(spark, 120, partitions=4))
    docs = c.select("doc_id", c.content.alias("text")).cache()
    half_a = docs.filter("pmod(doc_id, 2) = 0")
    half_b = docs.filter("pmod(doc_id, 2) != 0")

    ix_dir = str(tmp_path / "ix_rebuild")
    build_index(half_a, ix_dir, n_parts=4, n_salts=4, hot_threshold=30,
                block_size=32)
    streaming.append_batch(half_b, ix_dir, epoch_id=0, n_parts=4)
    streaming.refresh_postings(spark, ix_dir, n_salts=4, hot_threshold=30,
                               block_size=32)
    assert os.path.exists(f"{ix_dir}/POSTINGS_CURRENT")

    # rebuild over a DIFFERENT corpus (half A only)
    build_index(half_a, ix_dir, n_parts=4, n_salts=4, hot_threshold=30,
                block_size=32)
    assert not os.path.exists(f"{ix_dir}/POSTINGS_CURRENT")
    assert not os.path.exists(f"{ix_dir}/segments_stream")

    ref_dir = str(tmp_path / "ix_ref")
    build_index(half_a, ref_dir, n_parts=4, n_salts=4, hot_threshold=30,
                block_size=32)
    pd.testing.assert_frame_equal(_decoded(spark, ix_dir),
                                  _decoded(spark, ref_dir))


@pytest.mark.timeout(300)
def test_stream_refresh_preserves_dense_encoding(spark, tmp_path):
    """A dense index stays dense across stream append + refresh (the
    refresh auto-detects the docmap), and queries remain oracle-exact
    with RAW doc_ids after the versioned docmap swap."""
    from pke_spark.index.build import IndexReader

    c = with_doc_ids(synth_corpus(spark, 120, partitions=4))
    docs = c.select("doc_id", c.content.alias("text")).cache()
    half_a = docs.filter("pmod(doc_id, 2) = 0")
    half_b = docs.filter("pmod(doc_id, 2) != 0")

    ix_dir = str(tmp_path / "ix_dense_stream")
    build_index(half_a, ix_dir, n_parts=4, n_salts=4, dense_doc_ids=True,
                hot_threshold=30, block_size=32)
    streaming.append_batch(half_b, ix_dir, epoch_id=0, n_parts=4)
    streaming.refresh_postings(spark, ix_dir, n_salts=4, hot_threshold=30,
                               block_size=32)
    ix = IndexReader(spark, ix_dir)
    assert ix.dense
    pdf = docs.toPandas()
    texts = dict(zip(pdf.doc_id, pdf.text))
    for qq in (["build", "index"], ["def"]):
        for fastpath in (False, True):
            got = wand_topk(ix, qq, 10, n_buckets=8,
                            driver_fastpath=fastpath).toPandas()
            want = oracle.bm25_topk(texts, qq, 10)
            pd.testing.assert_frame_equal(
                got.astype({"rank": "int64"}), want.astype({"rank": "int64"}),
                check_exact=False, atol=1e-9)


@pytest.mark.timeout(300)
def test_incremental_fold_equals_batch_build(spark, tmp_path):
    """LSM incremental refresh: fold ONLY new epochs as appended
    fragments; decoded postings + stats must equal a single-shot build,
    and a second fold must skip already-folded epochs (manifest)."""
    c = with_doc_ids(synth_corpus(spark, 150, partitions=4))
    docs = c.select("doc_id", c.content.alias("text")).cache()
    part_a = docs.filter("pmod(doc_id, 3) = 0")
    part_b = docs.filter("pmod(doc_id, 3) = 1")
    part_c = docs.filter("pmod(doc_id, 3) = 2")

    ix_dir = str(tmp_path / "ix_fold")
    build_index(part_a, ix_dir, n_parts=4, n_salts=4, hot_threshold=30,
                block_size=32)

    streaming.append_batch(part_b, ix_dir, epoch_id=0, n_parts=4)
    streaming.refresh_postings(spark, ix_dir, n_salts=4, hot_threshold=30,
                               block_size=32, incremental=True)
    # second epoch + second fold: epoch 0 must be skipped (else its
    # postings would double)
    streaming.append_batch(part_c, ix_dir, epoch_id=1, n_parts=4)
    streaming.refresh_postings(spark, ix_dir, n_salts=4, hot_threshold=30,
                               block_size=32, incremental=True)

    ref_dir = str(tmp_path / "ix_batch_fold")
    build_index(docs, ref_dir, n_parts=4, n_salts=4, hot_threshold=30,
                block_size=32)
    pd.testing.assert_frame_equal(_decoded(spark, ix_dir),
                                  _decoded(spark, ref_dir))

    # stats delta-update must match the from-scratch stats -> identical
    # BM25 scores
    ia, ib = IndexReader(spark, ix_dir), IndexReader(spark, ref_dir)
    assert ia.n_docs == ib.n_docs
    assert abs(ia.avgdl - ib.avgdl) < 1e-9
    pdf = docs.toPandas()
    texts = dict(zip(pdf.doc_id, pdf.text))
    got = wand_topk(ia, ["build", "index"], 10, n_buckets=8).toPandas()
    want = oracle.bm25_topk(texts, ["build", "index"], 10)
    pd.testing.assert_frame_equal(
        got.astype({"rank": "int64"}), want.astype({"rank": "int64"}),
        check_exact=False, atol=1e-9)

    # a third fold with nothing new is a no-op (no crash, same index)
    before = _decoded(spark, ix_dir)
    streaming.refresh_postings(spark, ix_dir, n_salts=4, hot_threshold=30,
                               block_size=32, incremental=True)
    pd.testing.assert_frame_equal(before, _decoded(spark, ix_dir))


@pytest.mark.timeout(300)
def test_full_refresh_then_incremental_fold(spark, tmp_path):
    """Mixed lifecycle: a FULL refresh marks its epochs folded, so a
    later incremental fold must only pick up genuinely new epochs
    (double-count regression)."""
    c = with_doc_ids(synth_corpus(spark, 150, partitions=4))
    docs = c.select("doc_id", c.content.alias("text")).cache()
    part_a = docs.filter("pmod(doc_id, 3) = 0")
    part_b = docs.filter("pmod(doc_id, 3) = 1")
    part_c = docs.filter("pmod(doc_id, 3) = 2")

    ix_dir = str(tmp_path / "ix_mixed")
    build_index(part_a, ix_dir, n_parts=4, n_salts=4, hot_threshold=30,
                block_size=32)
    streaming.append_batch(part_b, ix_dir, epoch_id=0, n_parts=4)
    streaming.refresh_postings(spark, ix_dir, n_salts=4, hot_threshold=30,
                               block_size=32)  # FULL
    streaming.append_batch(part_c, ix_dir, epoch_id=1, n_parts=4)
    streaming.refresh_postings(spark, ix_dir, n_salts=4, hot_threshold=30,
                               block_size=32, incremental=True)

    ref_dir = str(tmp_path / "ix_batch_mixed")
    build_index(docs, ref_dir, n_parts=4, n_salts=4, hot_threshold=30,
                block_size=32)
    pd.testing.assert_frame_equal(_decoded(spark, ix_dir),
                                  _decoded(spark, ref_dir))
    assert IndexReader(spark, ix_dir).n_docs == \
        IndexReader(spark, ref_dir).n_docs


@pytest.mark.timeout(300)
def test_incremental_fold_rejects_reappended_doc_ids(spark, tmp_path):
    """The additive-fragment contract is ENFORCED: re-appending an
    already-indexed doc_id via a new epoch raises instead of silently
    double-scoring it (one (term, doc) in two fragments)."""
    c = with_doc_ids(synth_corpus(spark, 90, partitions=4))
    docs = c.select("doc_id", c.content.alias("text")).cache()
    part_a = docs.filter("pmod(doc_id, 2) = 0")
    part_b = docs.filter("pmod(doc_id, 2) != 0")

    ix_dir = str(tmp_path / "ix_dupe")
    build_index(part_a, ix_dir, n_parts=4, n_salts=4, hot_threshold=30,
                block_size=32)
    streaming.append_batch(part_b, ix_dir, epoch_id=0, n_parts=4)
    streaming.refresh_postings(spark, ix_dir, n_salts=4, hot_threshold=30,
                               block_size=32, incremental=True)

    # epoch 1 re-appends docs already folded from epoch 0
    streaming.append_batch(part_b.limit(5), ix_dir, epoch_id=1, n_parts=4)
    with pytest.raises(ValueError, match="re-appended"):
        streaming.refresh_postings(spark, ix_dir, n_salts=4,
                                   hot_threshold=30, block_size=32,
                                   incremental=True)
    # epoch 2 re-appends docs from the BASE build (segments overlap)
    import shutil
    shutil.rmtree(f"{ix_dir}/segments_stream/epoch=1")
    streaming.append_batch(part_a.limit(5), ix_dir, epoch_id=2, n_parts=4)
    with pytest.raises(ValueError, match="re-appended"):
        streaming.refresh_postings(spark, ix_dir, n_salts=4,
                                   hot_threshold=30, block_size=32,
                                   incremental=True)


def test_folded_epochs_travel_with_postings(spark, tmp_path):
    """Fold bookkeeping commits WITH the pointer swap: the folded set
    is read from the CURRENT postings dir, and a postings dir written
    but never swapped in (simulated crash) leaves the fold set
    unchanged; legacy indexes fall back to manifest rows."""
    from pke_spark.index.build import postings_path

    c = with_doc_ids(synth_corpus(spark, 60, partitions=2))
    docs = c.select("doc_id", c.content.alias("text")).cache()
    part_a = docs.filter("pmod(doc_id, 2) = 0")
    part_b = docs.filter("pmod(doc_id, 2) != 0")

    ix_dir = str(tmp_path / "ix_atomic")
    build_index(part_a, ix_dir, n_parts=2, n_salts=2, hot_threshold=30,
                block_size=32)
    streaming.append_batch(part_b, ix_dir, epoch_id=0, n_parts=2)
    streaming.refresh_postings(spark, ix_dir, n_salts=2, hot_threshold=30,
                               block_size=32, incremental=True)
    assert streaming.read_folded_epochs(spark, ix_dir) == {0}

    # simulated crash AFTER a new dir's fold record is written but
    # BEFORE the swap: the live pointer still resolves the old set
    orphan = f"{ix_dir}/postings_orphan"
    streaming.write_folded_epochs(orphan, {0, 1, 2})
    assert streaming.read_folded_epochs(spark, ix_dir) == {0}

    # legacy fallback: no fold file inside the current postings dir ->
    # manifest refresh_fold rows
    import os
    os.remove(f"{postings_path(ix_dir)}/{streaming.FOLDED_FILE}")
    assert streaming.read_folded_epochs(spark, ix_dir) == {0}


@pytest.mark.timeout(300)
def test_teed_build_equals_batch_and_refreshes(spark, tmp_path):
    """build_index_teed: one fused pass whose teed segments must (a)
    reproduce the batch build's postings + stats exactly and (b) keep
    the full streaming lifecycle working (append + incremental fold,
    then a FULL refresh from the teed segments)."""
    from pke_spark.index.build import build_index_teed

    c = with_doc_ids(synth_corpus(spark, 150, partitions=4))
    docs = c.select("doc_id", c.content.alias("text")).cache()
    part_a = docs.filter("pmod(doc_id, 3) != 2")
    part_c = docs.filter("pmod(doc_id, 3) = 2")

    ix_dir = str(tmp_path / "ix_teed")
    build_index_teed(part_a, ix_dir, n_parts=4, n_salts=4,
                     hot_threshold=30, block_size=32)
    ref_dir = str(tmp_path / "ix_batch_teed")
    # parts_per_job=1 pins the legacy two-pass checkpointed build:
    # build_index's one-shot sparse mode now DELEGATES to the teed pass,
    # so an unpinned reference would compare teed against itself
    build_index(part_a, ref_dir, n_parts=4, n_salts=4, hot_threshold=30,
                block_size=32, parts_per_job=1)
    pd.testing.assert_frame_equal(_decoded(spark, ix_dir),
                                  _decoded(spark, ref_dir))
    ia, ib = IndexReader(spark, ix_dir), IndexReader(spark, ref_dir)
    assert (ia.n_docs, round(ia.avgdl, 9)) == (ib.n_docs,
                                               round(ib.avgdl, 9))

    # streaming lifecycle on top of the teed segments
    streaming.append_batch(part_c, ix_dir, epoch_id=0, n_parts=4)
    streaming.refresh_postings(spark, ix_dir, n_salts=4, hot_threshold=30,
                               block_size=32, incremental=True)
    full_dir = str(tmp_path / "ix_batch_full")
    build_index(docs, full_dir, n_parts=4, n_salts=4, hot_threshold=30,
                block_size=32, parts_per_job=1)
    pd.testing.assert_frame_equal(_decoded(spark, ix_dir),
                                  _decoded(spark, full_dir))
    # FULL refresh re-encodes from teed segments + stream epochs
    streaming.refresh_postings(spark, ix_dir, n_salts=4, hot_threshold=30,
                               block_size=32)
    pd.testing.assert_frame_equal(_decoded(spark, ix_dir),
                                  _decoded(spark, full_dir))
    # identical BM25 end to end
    pdf = docs.toPandas()
    texts = dict(zip(pdf.doc_id, pdf.text))
    got = wand_topk(IndexReader(spark, ix_dir), ["build", "index"], 10,
                    n_buckets=8).toPandas()
    want = oracle.bm25_topk(texts, ["build", "index"], 10)
    pd.testing.assert_frame_equal(
        got.astype({"rank": "int64"}), want.astype({"rank": "int64"}),
        check_exact=False, atol=1e-9)


@pytest.mark.timeout(300)
def test_build_index_oneshot_delegates_to_teed(spark, tmp_path):
    """build_index's one-shot sparse mode (the default entrypoint) now
    runs the fused teed pass: postings + stats must equal the legacy
    two-pass build, the durable segments must exist (streaming-refresh
    contract), and the postings must live at the plain ``postings``
    path (no pointer indirection for a fresh build)."""
    import os

    from pke_spark.index.build import read_manifest

    c = with_doc_ids(synth_corpus(spark, 140, partitions=4))
    docs = c.select("doc_id", c.content.alias("text")).cache()

    d_new = str(tmp_path / "ix_oneshot")
    build_index(docs, d_new, n_parts=4, n_salts=4, hot_threshold=30,
                block_size=32)
    d_ref = str(tmp_path / "ix_legacy")
    build_index(docs, d_ref, n_parts=4, n_salts=4, hot_threshold=30,
                block_size=32, parts_per_job=1)

    pd.testing.assert_frame_equal(_decoded(spark, d_new),
                                  _decoded(spark, d_ref))
    ia = IndexReader(spark, d_new)
    ib = IndexReader(spark, d_ref)
    assert (ia.n_docs, round(ia.avgdl, 9)) == (ib.n_docs,
                                               round(ib.avgdl, 9))
    assert os.path.isdir(f"{d_new}/segments")
    assert os.path.isdir(f"{d_new}/postings")
    assert not os.path.exists(f"{d_new}/POSTINGS_CURRENT")
    phases = {r.phase for r in read_manifest(spark, d_new).collect()}
    assert "postings_teed" in phases
