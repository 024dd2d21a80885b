"""Grammar-based candidate selection (C6 + S3): hand-derived NP
expectations for the effective default-grammar rule (prefix of each
{NOUN,PROPN,ADJ} run ending at its last NOUN/PROPN)."""

from __future__ import annotations

from pke_spark.ops import grammar


def test_grammar_candidates_from_pretagged(spark):
    rows = [
        # one doc, two sentences (S3 shape: [[(word, tag), ...], ...])
        [
            [("The", "DET"), ("Big", "ADJ"), ("Data", "NOUN"),
             ("engine", "NOUN"), ("runs", "VERB"), ("fast", "ADJ"),
             ("queries", "NOUN")],
            [("of", "ADP"), ("red", "ADJ"), ("shiny", "ADJ"),
             ("Spark", "PROPN"), ("jobs", "NOUN"), ("quickly", "ADV"),
             ("green", "ADJ"), ("blue", "ADJ")],
        ],
        # doc with no noun-headed run at all
        [
            [("very", "ADV"), ("red", "ADJ"), ("bright", "ADJ")],
        ],
    ]
    tagged = grammar.from_pretagged(spark, rows)
    got = {(r.doc_id, r.candidate): (r.tf, r.first_offset, r.n_words)
           for r in grammar.grammar_candidates_from_tagged(tagged).collect()}
    # runs: [big data engine] head at 'engine' -> whole prefix;
    # [fast queries]; [red shiny spark jobs] head at 'jobs';
    # trailing [green blue] has no head -> dropped
    assert got == {
        (0, "big data engine"): (1, 2, 3),
        (0, "fast queries"): (1, 6, 2),
        (0, "red shiny spark jobs"): (1, 9, 4),
    }


def test_grammar_run_prefix_trims_trailing_adjectives(spark):
    rows = [[[("nice", "ADJ"), ("cats", "NOUN"), ("happy", "ADJ")]]]
    tagged = grammar.from_pretagged(spark, rows)
    got = [(r.candidate, r.n_words) for r in
           grammar.grammar_candidates_from_tagged(tagged).collect()]
    # greedy match ends at the LAST noun; the trailing ADJ is dropped
    assert got == [("nice cats", 2)]


def test_grammar_candidates_synthetic_nonempty(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(20)
    out = grammar.grammar_candidates(docs).collect()
    assert len(out) > 0
    assert all(r.tf >= 1 and r.n_words >= 1 for r in out)
