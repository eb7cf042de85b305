"""On-engine BPE training (`operators/bpe.py`) vs a pure-Python
reference implementation: identical merge tables and identical final
word segmentations on a corpus with overlapping pairs and ties."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_stream_spark.operators import bpe


def py_bpe(word_freqs: dict[str, int], n_merges: int, min_pair_count: int = 2):
    syms = {w: [ch for ch in w] for w in word_freqs}
    merges = []
    for step in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for w, n in word_freqs.items():
            s = syms[w]
            for a, b in zip(s, s[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + n
        if not counts:
            break
        (left, right), cnt = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        if cnt < min_pair_count:
            break
        merges.append((step, left, right, cnt))
        for w, s in syms.items():
            out: list[str] = []
            for x in s:
                if out and out[-1] == left and x == right:
                    out[-1] = left + right
                else:
                    out.append(x)
            syms[w] = out
    return merges, syms


CORPUS = [
    (0, "the cat sat on the mat"),
    (1, "the aardvark says aaa"),
    (2, "that hat is the best hat"),
    (3, "the the the banana bandana"),
]


def test_training_matches_python_reference(spark):
    docs = spark.createDataFrame(CORPUS, "doc_id long, text string")
    wf = bpe.word_frequencies(docs)
    merges, final = bpe.train_bpe(wf, n_merges=8)

    freqs = {
        r["w"]: r["n"]
        for r in wf.select("w", "n").collect()
    }
    exp_merges, exp_syms = py_bpe(freqs, 8)
    assert merges == exp_merges

    got_syms = {r["w"]: list(r[bpe.SYMS_COL]) for r in final.collect()}
    assert got_syms == exp_syms


def test_overlapping_pairs_merge_leftmost_first(spark):
    docs = spark.createDataFrame([(0, "aaa aaa aaa")], "doc_id long, text string")
    wf = bpe.word_frequencies(docs)
    merges, final = bpe.train_bpe(wf, n_merges=1)
    assert merges == [(0, "a", "a", 6)]  # 2 adjacent pairs × 3 occurrences
    assert list(final.collect()[0][bpe.SYMS_COL]) == ["aa", "a"]


def test_encode_stats_uses_vocab_and_fallback(spark):
    docs = spark.createDataFrame(CORPUS, "doc_id long, text string")
    wf = bpe.word_frequencies(docs)
    _, vocab = bpe.train_bpe(wf, n_merges=8)
    stats = bpe.encode_stats(docs, vocab)
    rows = {r["doc_id"]: r for r in stats.collect()}
    assert set(rows) == {0, 1, 2, 3}
    for r in rows.values():
        # merges only ever shrink token counts, to no less than 1/word
        assert r["n_words"] <= r["n_bpe_tokens"] <= r["n_chars"]
    # unseen words fall back to char count
    new = spark.createDataFrame([(9, "zzzz")], "doc_id long, text string")
    out = bpe.encode_stats(new, vocab).collect()[0]
    assert out["n_bpe_tokens"] == 4
