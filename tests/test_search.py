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


def test_rrf_fuse_combines_overlapping_and_disjoint_rankers(spark):
    from rearc_data_engineer_takehome_spark.operators.search import rrf_fuse

    lex = spark.createDataFrame(
        [(10, 1), (20, 2), (30, 3)], "doc_id long, rank int"
    )
    vec = spark.createDataFrame(
        [(20, 1), (10, 2), (40, 3)], "doc_id long, rank int"
    )
    got = {r.doc_id: r for r in rrf_fuse([lex, vec], k=60, top=10).collect()}

    def s(*ranks):
        return round(sum(1.0 / (60 + r) for r in ranks), 9)

    assert got[10].rrf_score == s(1, 2) and got[10].n_rankers == 2
    assert got[20].rrf_score == s(2, 1) and got[20].n_rankers == 2
    assert got[30].rrf_score == s(3) and got[30].n_rankers == 1
    assert got[40].rrf_score == s(3) and got[40].n_rankers == 1
    # docs in both rankers outrank single-ranker docs; 10 and 20 tie on
    # score (symmetric ranks) and 30/40 tie — id breaks both ties
    ranked = sorted(got.values(), key=lambda r: (-r.rrf_score, r.doc_id))
    assert [r.doc_id for r in ranked] == [10, 20, 30, 40]
