"""BM25 keyword-search scoring vs a pure-Python reference."""

from __future__ import annotations

import math

from rearc_data_engineer_takehome_spark.operators.search import B, K1, bm25_topk


def _py_bm25(corpus: dict[int, str], terms: list[str]) -> dict[int, float]:
    toks = {d: t.lower().split() for d, t in corpus.items()}
    n = len(corpus)
    avgdl = sum(len(t) for t in toks.values()) / n
    df = {
        q: sum(1 for t in toks.values() if q in t)
        for q in terms
    }
    scores = {}
    for d, t in toks.items():
        s = 0.0
        for q in terms:
            tf = t.count(q)
            if not tf:
                continue
            idf = round(math.log((n - df[q] + 0.5) / (df[q] + 0.5) + 1.0), 8)
            s += idf * (tf * (K1 + 1)) / (tf + K1 * (1 - B + B * len(t) / avgdl))
        if s:
            scores[d] = round(s, 4)
    return scores


def test_bm25_matches_python_reference(spark):
    corpus = {
        1: "spark shuffle join join join table",
        2: "merge sort merge agg window",
        3: "spark spark spark spark filter scan",
        4: "completely unrelated words here only",
        5: "join merge spark one of each plus filler tokens to lengthen",
    }
    terms = ["spark", "join", "merge"]
    df = spark.createDataFrame(list(corpus.items()), "doc_id long, text string")
    got = {r.doc_id: (r.bm25, r.n_terms_hit, r.rank) for r in
           bm25_topk(df, terms, k=10).collect()}
    want = _py_bm25(corpus, terms)

    assert set(got) == set(want)  # doc 4 (no hits) absent
    for d, expected in want.items():
        assert abs(got[d][0] - expected) < 1e-9, (d, got[d], expected)
    # ranks follow descending score with doc_id tiebreak
    ordered = sorted(want.items(), key=lambda kv: (-kv[1], kv[0]))
    assert [d for d, _ in ordered] == [
        d for d, v in sorted(got.items(), key=lambda kv: kv[1][2])
    ]
    # n_terms_hit counts distinct matched terms
    assert got[5][1] == 3 and got[3][1] == 1
