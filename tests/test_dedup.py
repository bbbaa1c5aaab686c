"""Dedup operator family vs small Python oracles."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from simple_osm_queries_spark.operators import dedup

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "the quick brown fox jumps over the lazy dog"),            # exact dup of 0
    (2, "the quick brown fox jumps over the lazy cat"),            # near dup of 0
    (3, "a completely different document about spark shuffles"),
    (4, "a completely different document about spark shuffles!"),  # near dup of 3
    (5, "short doc"),
    (6, "the quick brown fox jumps over the lazy dog today"),      # near dup of 0
    (7, "unrelated words entirely disjoint vocabulary here now"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(pd.DataFrame(DOCS, columns=["doc_id", "text"])).cache()


def _shingles(text, n=3):
    w = text.lower().split()
    if len(w) <= n:
        return {" ".join(w)}
    return {" ".join(w[i : i + n]) for i in range(len(w) - n + 1)}


def _jaccard(a, b, n=3):
    sa, sb = _shingles(a, n), _shingles(b, n)
    return len(sa & sb) / len(sa | sb)


def test_exact_dedup(docs):
    groups = dedup.exact_dup_groups(docs, "doc_id", "text").collect()
    dup_groups = [g for g in groups if g.n > 1]
    assert len(dup_groups) == 1 and dup_groups[0].keep_id == 0 and dup_groups[0].n == 2
    kept = sorted(r.doc_id for r in dedup.dedup_exact(docs, "doc_id", "text").collect())
    assert kept == [0, 2, 3, 4, 5, 6, 7]


def test_ngram_jaccard_matches_oracle(docs):
    got = {
        (r.id_a, r.id_b): r.jaccard
        for r in dedup.ngram_jaccard_pairs(docs, threshold=0.3).collect()
    }
    texts = dict(DOCS)
    expected = {}
    for a in texts:
        for b in texts:
            if a < b:
                j = _jaccard(texts[a], texts[b])
                if j >= 0.3:
                    expected[(a, b)] = j
    assert set(got) == set(expected)
    for k, v in expected.items():
        assert got[k] == pytest.approx(v)
    assert (0, 1) in got and got[(0, 1)] == 1.0


def test_minhash_near_dups(docs):
    pairs = {
        (r.id_a, r.id_b): r.jaccard_est
        for r in dedup.minhash_near_dups(docs, num_perm=128, bands=32, threshold=0.4).collect()
    }
    assert (0, 1) in pairs and pairs[(0, 1)] == 1.0  # identical docs
    # the known near-dups should surface; estimates within 0.25 of truth
    texts = dict(DOCS)
    for (a, b), est in pairs.items():
        assert est == pytest.approx(_jaccard(texts[a], texts[b]), abs=0.25)
    # disjoint docs must not pair
    assert not any(7 in p for p in pairs)


def test_minhash_signature_deterministic(docs):
    sig = docs.select(dedup.minhash_signature_col(F.col("text")).alias("s"))
    a = [r.s for r in sig.collect()]
    b = [r.s for r in sig.collect()]
    assert a == b
    assert all(len(s) == 64 for s in a)


def test_simhash_near_dups(docs):
    pairs = {(r.id_a, r.id_b): r.hamming for r in dedup.simhash_near_dups(docs, max_hamming=3).collect()}
    assert (0, 1) in pairs and pairs[(0, 1)] == 0
    assert all(h <= 3 for h in pairs.values())
    assert not any(7 in p for p in pairs)


def test_embedding_near_dups(spark):
    rng = np.random.RandomState(7)
    base = rng.randn(8, 64).astype(np.float32)
    base[1] = base[0] + rng.randn(64).astype(np.float32) * 0.01  # near dup of 0
    base[5] = base[4]                                            # exact dup of 4
    rows = [(i, [float(x) for x in base[i]]) for i in range(8)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    pairs = {
        (r.id_a, r.id_b): r.cosine
        for r in dedup.embedding_near_dups(df, threshold=0.95).collect()
    }
    assert (0, 1) in pairs and pairs[(0, 1)] > 0.99
    assert (4, 5) in pairs and pairs[(4, 5)] == pytest.approx(1.0)
    # verify precision: every reported cosine matches numpy (1e-6: Spark's
    # sequential aggregate fold vs numpy's pairwise dot differ in rounding)
    for (a, b), c in pairs.items():
        va, vb = base[a].astype(np.float64), base[b].astype(np.float64)
        expected = float(va @ vb / (np.linalg.norm(va) * np.linalg.norm(vb)))
        assert c == pytest.approx(expected, abs=1e-6)
