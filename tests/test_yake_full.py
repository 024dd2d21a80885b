"""Full-YAKE parity: the engine's yake_doc vs a TRANSCRIPTION-style
mirror of the reference's dict/list loops
(pke/unsupervised/statistical/yake.py:116-464), on fixture documents
with real casing/sentences plus testdata docs; and the Spark operator
vs the driver loop (distribution invariance)."""

from __future__ import annotations

import math
from collections import defaultdict

import numpy as np
import pytest

from pke_spark.ops import yake
from pke_spark.tokenizer import TEXT_STOPWORDS

STOP = set(TEXT_STOPWORDS) | {"in", "on", "and", "or", "to", "was", "were"}

FIXTURES = [
    "The Big Data engine runs fast queries. Big Data engines scale "
    "well on large clusters. HTML is parsed quickly by the engine.",
    "Inverse problems arise in mathematical models. The mathematical "
    "model of ion exchange is an inverse problem. Models of ion "
    "exchange matter.",
    "NASA launched the APOLLO program. The Apollo program used "
    "Saturn rockets. Saturn rockets were very LOUD machines.",
    "spark streaming joins windowed tables. spark streaming scales.",
    "single sentence only here",
]


# ----------------------------------------------------------- reference
# mirror: direct transcription of yake.py's loops (dict/set/list based)

def _pke_yake(sentences, stoplist, n=3, window=2):
    words = defaultdict(set)
    contexts = defaultdict(lambda: ([], []))
    features = defaultdict(dict)

    # _vocabulary_building (yake.py:116-140)
    for i, sentence in enumerate(sentences):
        shift = sum(len(s) for s in sentences[0:i])
        for j, word in enumerate(sentence):
            index = word.lower()
            words[index].add((shift + j, shift, i, word))

    # _contexts_building (yake.py:142-186)
    for i, sentence in enumerate(sentences):
        ws = [w.lower() for w in sentence]
        block = []
        for j, word in enumerate(ws):
            if word not in words:
                block = []
                continue
            contexts[word][0].extend(
                w for w in block[max(0, len(block) - window):len(block)])
            for w in block[max(0, len(block) - window):len(block)]:
                contexts[w][1].append(word)
            block.append(word)

    # _feature_extraction (yake.py:229-305)
    tf_nsw = [len(words[w]) for w in words if w not in stoplist]
    mean_tf = np.mean(tf_nsw)
    std_tf = np.std(tf_nsw)
    max_tf = max(len(words[w]) for w in words)
    for word in words:
        features[word]["isstop"] = word in stoplist or len(word) < 3
        features[word]["TF"] = len(words[word])
        features[word]["TF_A"] = 0
        features[word]["TF_U"] = 0
        for (offset, shift, sent_id, surface_form) in words[word]:
            if surface_form.isupper() and len(word) > 1:
                features[word]["TF_A"] += 1
            elif surface_form[0].isupper() and offset != shift:
                features[word]["TF_U"] += 1
        features[word]["CASING"] = max(features[word]["TF_A"],
                                       features[word]["TF_U"])
        features[word]["CASING"] /= 1.0 + math.log(features[word]["TF"])
        sentence_ids = list(set(t[2] for t in words[word]))
        features[word]["POSITION"] = math.log(
            math.log(3.0 + np.median(sentence_ids)))
        features[word]["FREQUENCY"] = features[word]["TF"] / (mean_tf + std_tf)
        features[word]["WL"] = 0.0
        if len(contexts[word][0]):
            features[word]["WL"] = (len(set(contexts[word][0]))
                                    / len(contexts[word][0]))
        features[word]["WR"] = 0.0
        if len(contexts[word][1]):
            features[word]["WR"] = (len(set(contexts[word][1]))
                                    / len(contexts[word][1]))
        features[word]["RELATEDNESS"] = 1 + (
            (features[word]["WR"] + features[word]["WL"])
            * (features[word]["TF"] / max_tf))
        features[word]["DIFFERENT"] = len(set(sentence_ids)) / len(sentences)
        A, B = features[word]["CASING"], features[word]["POSITION"]
        C = features[word]["FREQUENCY"]
        D = features[word]["RELATEDNESS"]
        E = features[word]["DIFFERENT"]
        features[word]["weight"] = (D * B) / (A + (C / D) + (E / D))

    # ngram_selection + candidate_filtering + YAKE's own edge filter
    candidates = {}
    for sentence in sentences:
        for j in range(len(sentence)):
            for size in range(1, min(n, len(sentence) - j) + 1):
                surf = tuple(sentence[j:j + size])
                key = " ".join(t.lower() for t in surf)
                candidates.setdefault(key, []).append(surf)
    import re
    alnum = re.compile(r"^[A-Za-z0-9\-]+$")
    for k in list(candidates):
        forms = candidates[k]
        ws = [u.lower() for u in forms[0]]
        if (set(ws) & stoplist or len("".join(ws)) < 3
                or min(len(u) for u in ws) < 2 or len(ws) > 5
                or not all(alnum.match(u) for u in ws)
                or forms[0][0].lower() in stoplist
                or forms[0][-1].lower() in stoplist
                or len(forms[0][0]) < 3 or len(forms[0][-1]) < 3):
            del candidates[k]

    # candidate_weighting, surface path (yake.py:330-372)
    weights = {}
    for k, forms in candidates.items():
        lowercase_forms = [" ".join(t).lower() for t in forms]
        for i, candidate in enumerate(lowercase_forms):
            TF = lowercase_forms.count(candidate)
            tokens = [t.lower() for t in forms[i]]
            prod_ = 1.0
            sum_ = 0.0
            for j, token in enumerate(tokens):
                if features[token]["isstop"]:
                    prob_t1 = prob_t2 = 0
                    if j - 1 >= 0:
                        term_left = tokens[j - 1]
                        prob_t1 = (contexts[term_left][1].count(token)
                                   / features[term_left]["TF"])
                    if j + 1 < len(tokens):
                        term_right = tokens[j + 1]
                        prob_t2 = (contexts[token][0].count(term_right)
                                   / features[term_right]["TF"])
                    prob = prob_t1 * prob_t2
                    prod_ *= 1 + (1 - prob)
                    sum_ -= 1 - prob
                else:
                    prod_ *= features[token]["weight"]
                    sum_ += features[token]["weight"]
            if sum_ == -1:
                sum_ = -0.99999999999
            weights[candidate] = prod_ / (TF * (1 + sum_))
    return weights


def _pke_topk(weights, k, threshold=0.8):
    best = sorted(weights, key=lambda c: (weights[c], c))
    sel = []
    for c in best:
        red = False
        for p in sel:
            dist = yake.levenshtein(c, p) / max(len(c), len(p))
            if (1.0 - dist) > threshold:
                red = True
                break
        if red:
            continue
        sel.append(c)
        if len(sel) >= k:
            break
    return [(c, round(weights[c], 6)) for c in sel]


@pytest.mark.parametrize("text", FIXTURES)
def test_yake_doc_matches_reference_mirror(text):
    sents = yake.yake_sentences(text)
    got = yake.yake_doc(sents, STOP, 5)
    want = _pke_topk(_pke_yake(sents, STOP), 5)
    assert [c for c, _ in got] == [c for c, _ in want]
    np.testing.assert_allclose([w for _, w in got], [w for _, w in want],
                               atol=1e-6)


def test_yake_full_spark_equals_driver(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(30)
    got = {(r.doc_id, r.rank): (r.candidate, r.weight)
           for r in yake.yake_full(docs, 5).collect()}
    stopset = set(TEXT_STOPWORDS)
    want = {}
    for r in docs.select("doc_id", "text").collect():
        top = yake.yake_doc(yake.yake_sentences(r.text), stopset, 5)
        for i, (c, w) in enumerate(top):
            want[(r.doc_id, i + 1)] = (c, w)
    assert got == want
    assert len(got) > 0


def test_levenshtein_basics():
    assert yake.levenshtein("kitten", "sitting") == 3
    assert yake.levenshtein("", "abc") == 3
    assert yake.levenshtein("abc", "abc") == 0
    assert yake.levenshtein("spark engine", "spark engines") == 1
