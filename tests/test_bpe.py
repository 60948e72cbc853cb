"""BPE tokenizer family (round-9): deterministic training, tiktoken-style
greedy application semantics (pinned including the batch-vs-single-merge
divergence case), token-id assignment, the NULL/empty contract, and the
distinct-word-only Python crossing."""

import pytest
from pyspark.sql import functions as F

from snapshot_sender_spark.operators import bpe


# ---------------------------------------------------------------- encode


def test_encode_merges_lowest_rank_first():
    # rank order decides, not left-to-right pair position
    ranks = {("b", "c"): 0, ("a", "b"): 1}
    assert bpe.encode_word("abc", ranks) == ["a", "bc"]
    # after the rank-0 merge nothing matches ("a","b") anymore


def test_encode_leftmost_on_equal_rank():
    # same pair at two sites: leftmost merges first, then the next
    ranks = {("a", "a"): 0}
    assert bpe.encode_word("aaa", ranks) == ["aa", "a"]
    assert bpe.encode_word("aaaa", ranks) == ["aa", "aa"]


def test_encode_single_surgery_semantics_divergence_case():
    """THE contract pin: tiktoken-style one-merge-per-step differs from
    merge-all-occurrences batching. With merges [("ab","a") rank 0,
    ("a","b") rank 1] on "abab": batching both ("a","b") sites first gives
    [ab, ab]; one-at-a-time merges the left site, then the newly-formed
    ("ab","a") outranks the remaining ("a","b") → [aba, b]. The engine and
    the DuckDB oracle both implement the one-surgery form."""
    ranks = {("ab", "a"): 0, ("a", "b"): 1}
    assert bpe.encode_word("abab", ranks) == ["aba", "b"]


def test_encode_no_ranked_pairs_returns_chars():
    assert bpe.encode_word("xyz", {}) == ["x", "y", "z"]
    assert bpe.encode_word("a", {("a", "a"): 0}) == ["a"]
    assert bpe.encode_word("", {}) == []


# ----------------------------------------------------------------- train


def _mini_docs(spark, rows):
    return spark.createDataFrame([(i, t) for i, t in enumerate(rows)],
                                 "doc_id long, text string")


def test_train_frequency_then_pair_tiebreak(spark):
    # "ab" x3, "cd" x3: pair counts tie at 3 — ("a","b") < ("c","d") wins
    docs = _mini_docs(spark, ["ab cd ab", "cd ab cd"])
    m = bpe.train_bpe(spark, docs, num_merges=2)
    assert m.merges[0] == ("a", "b")
    assert m.merges[1] == ("c", "d")
    assert m.base_vocab == ("a", "b", "c", "d")


def test_train_merge_applies_left_to_right_in_corpus(spark):
    # one word "aaa" x5: first merge ("a","a") leaves [aa, a] per word, so
    # the second round counts ("aa","a") — never ("a","aa")
    docs = _mini_docs(spark, ["aaa aaa aaa aaa aaa"])
    m = bpe.train_bpe(spark, docs, num_merges=2)
    assert m.merges == (("a", "a"), ("aa", "a"))


def test_train_deterministic_across_runs(spark):
    docs = _mini_docs(spark, ["the quick brown fox", "the slow brown dog",
                              "the the quick dog"])
    m1 = bpe.train_bpe(spark, docs, num_merges=10)
    m2 = bpe.train_bpe(spark, docs, num_merges=10)
    assert m1.merges == m2.merges and m1.base_vocab == m2.base_vocab


def test_train_max_words_cap_is_deterministic(spark):
    # cap keeps most-frequent words, ties by word ASC: with max_words=1 and
    # freqs {aa:2, bb:2}, "aa" is kept → merges learn only from "aa"
    docs = _mini_docs(spark, ["aa bb aa bb"])
    m = bpe.train_bpe(spark, docs, num_merges=4, max_words=1)
    assert m.merges == (("a", "a"),)
    # base vocab still covers ALL corpus chars (cap limits training only)
    assert m.base_vocab == ("a", "b")


def test_token_ids_earliest_wins_on_duplicate_strings():
    # merges 0 and 2 both produce "abc" → the string keeps id 256+B+0
    # (ids 0..255 are the byte-fallback lane)
    m = bpe.BpeModel(merges=(("ab", "c"), ("b", "c"), ("a", "bc")),
                     base_vocab=("a", "b", "c"))
    ids = m.token_ids
    assert ids["a"] == 256 and ids["c"] == 258  # base chars start at 256
    assert ids["abc"] == 256 + 3  # B=3, rank 0
    assert ids["bc"] == 256 + 4
    assert len(ids) == 5  # 3 base + 2 distinct merge strings


# ----------------------------------------------------------- tokenize df


def test_bpe_tokenize_null_and_empty_contract(spark):
    docs = spark.createDataFrame(
        [(0, "ab ab b"), (1, ""), (2, None), (3, "   "), (4, " 　")],
        "doc_id long, text string",
    )
    m = bpe.train_bpe(spark, docs, num_merges=1)
    assert m.merges == (("a", "b"),)
    got = {r["doc_id"]: r for r in bpe.bpe_tokenize(spark, docs, m).collect()}
    ab_id = m.token_ids["ab"]
    b_id = m.token_ids["b"]
    assert got[0]["token_ids"] == [ab_id, ab_id, b_id]
    assert got[0]["n_tokens"] == 3
    for empty in (1, 3, 4):  # empty / whitespace / unicode-space only
        assert got[empty]["token_ids"] == [] and got[empty]["n_tokens"] == 0
    assert got[2]["token_ids"] is None and got[2]["n_tokens"] is None


def test_bpe_tokenize_unknown_symbols_byte_fallback(spark):
    """Round-10: train-time-unseen symbols encode as UTF-8 byte tokens
    (id == byte value, always < 256) instead of UNK — the GPT-2/tiktoken
    property that every input is encodable, so token budgets and packing
    never miscount on fresh-crawl characters a frozen vocab never saw."""
    train = _mini_docs(spark, ["ab ab"])
    m = bpe.train_bpe(spark, train, num_merges=1)
    new = _mini_docs(spark, ["ab zq", "Ωé"])  # ASCII and multi-byte unseen
    got = {r["doc_id"]: r for r in bpe.bpe_tokenize(spark, new, m).collect()}
    assert got[0]["token_ids"] == [m.token_ids["ab"], ord("z"), ord("q")]
    # Ω = 0xCE 0xA9, é = 0xC3 0xA9 — one token per UTF-8 byte
    assert got[1]["token_ids"] == [0xCE, 0xA9, 0xC3, 0xA9]
    assert got[1]["n_tokens"] == 4


def test_encode_decode_no_unk_on_any_input():
    """Property pin: encode_word_ids never emits a negative/UNK id and
    decode_ids(encode_word_ids(w)) == w for ANY input — including words
    mixing seen chars (vocab-lane ids ≥ 256) with unseen multi-byte chars
    (byte-lane ids < 256)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    m = bpe.BpeModel(merges=(("a", "b"), ("ab", "c")), base_vocab=("a", "b", "c"))

    @settings(max_examples=200, deadline=None)
    @given(st.text(min_size=1, max_size=12).filter(lambda w: not w.isspace()))
    def prop(word):
        ids = m.encode_word_ids(word)
        assert all(i >= 0 for i in ids)
        assert m.decode_ids(ids) == word

    prop()
    # the mixed case explicitly: "ab" merges (vocab id), Ω falls back (bytes)
    ids = m.encode_word_ids("abΩc")
    assert ids == [m.token_ids["ab"], 0xCE, 0xA9, m.token_ids["c"]]
    assert m.decode_ids(ids) == "abΩc"


def test_bpe_tokenize_matches_pure_python_reference(spark, sf_dir):
    """End-to-end distributed parity: the Spark plan (distinct-word encode +
    broadcast join + positional reassembly) reproduces a doc-by-doc driver
    loop exactly, order included."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(50)
    m = bpe.train_bpe(spark, docs, num_merges=25)
    got = {r["doc_id"]: list(r["token_ids"])
           for r in bpe.bpe_tokenize(spark, docs, m).collect()}
    for row in docs.select("doc_id", "text").collect():
        want = []
        for w in row["text"].split():
            want.extend(m.encode_word_ids(w))
        assert got[row["doc_id"]] == want, row["doc_id"]


def test_bpe_tokenize_python_crossing_is_distinct_words_only(spark):
    """The scale contract: the ONLY Python crossing in the tokenize plan is
    the mapInPandas over DISTINCT WORDS — the corpus-side explode, join and
    reassembly stay JVM-side (no BatchEvalPython, exactly one MapInPandas,
    and it sits under the distinct-word aggregate, not the corpus scan)."""
    docs = _mini_docs(spark, ["ab cd ab", "cd ab cd"] * 50)
    m = bpe.train_bpe(spark, docs, num_merges=2)
    plan = bpe.bpe_tokenize(spark, docs, m)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert plan.count("MapInPandas") == 1
    assert "ArrowEvalPython" not in plan


def test_bpe_tokenize_broadcast_routing_both_forms(spark):
    """Round-9 verdict's named scale-killer: the encoded distinct-word table
    was broadcast UNGUARDED — tens of GB at web-corpus vocabulary (1e8–1e9
    distinct words). The join now routes on the distinct-word count: below
    the cap the plan broadcasts (small-dim form), above it the word join is
    a keyed shuffle (no BroadcastExchange feeding the word join). Both forms
    return identical rows."""
    docs = _mini_docs(spark, ["ab cd ab ef gh", "cd ab ij kl"] * 20)
    m = bpe.train_bpe(spark, docs, num_merges=2)

    def plan_of(df):
        return df._jdf.queryExecution().executedPlan().toString()

    small = bpe.bpe_tokenize(spark, docs, m)  # default cap ≫ vocab here
    assert "BroadcastExchange" in plan_of(small)
    big = bpe.bpe_tokenize(spark, docs, m, broadcast_max_words=2)
    assert "BroadcastExchange" not in plan_of(big)
    rows_small = {r["doc_id"]: (list(r["token_ids"] or []), r["n_tokens"])
                  for r in small.collect()}
    rows_big = {r["doc_id"]: (list(r["token_ids"] or []), r["n_tokens"])
                for r in big.collect()}
    assert rows_small == rows_big


def test_bpe_model_save_load_roundtrip(spark, tmp_path):
    """The frozen-vocab artifact: save → load rebuilds the EXACT model —
    merge order, base vocab, token ids, and every encoding bit-identical —
    so token budgets and digests stay comparable across runs/processes
    (the same versioned-artifact stance as the persisted indexes)."""
    docs = _mini_docs(spark, ["the quick brown fox", "the slow brown dog",
                              "aaa the the quick dog"])
    m = bpe.train_bpe(spark, docs, num_merges=12)
    bpe.save_bpe_model(spark, m, str(tmp_path / "model"))
    m2 = bpe.load_bpe_model(spark, str(tmp_path / "model"))
    assert m2.merges == m.merges and m2.base_vocab == m.base_vocab
    assert m2.token_ids == m.token_ids
    for w in ("the", "quick", "aaa", "unseenword", "dog"):
        assert m2.encode_word_ids(w) == m.encode_word_ids(w)
    # tokenizing with the LOADED model reproduces the original exactly
    a = {r["doc_id"]: list(r["token_ids"])
         for r in bpe.bpe_tokenize(spark, docs, m).collect()}
    b = {r["doc_id"]: list(r["token_ids"])
         for r in bpe.bpe_tokenize(spark, docs, m2).collect()}
    assert a == b
    # zero-merge model round-trips too (the rank=-1 sentinel row)
    empty = bpe.BpeModel(merges=(), base_vocab=("a", "b"))
    bpe.save_bpe_model(spark, empty, str(tmp_path / "model0"))
    e2 = bpe.load_bpe_model(spark, str(tmp_path / "model0"))
    assert e2.merges == () and e2.base_vocab == ("a", "b")


def test_bpe_model_load_refuses_torn_save(spark, tmp_path):
    """Marker-last protocol: a save that did not complete (missing or
    size-mismatched _MODEL_OK) must be refused loudly — a torn model pairing
    new merges with an old base vocab would silently shift every token id."""
    import json
    import os

    docs = _mini_docs(spark, ["ab ab cd"])
    m = bpe.train_bpe(spark, docs, num_merges=2)
    path = str(tmp_path / "model")
    bpe.save_bpe_model(spark, m, path)
    marker = os.path.join(path, "_MODEL_OK")
    os.remove(marker)  # simulate a crash before the marker write
    with pytest.raises(ValueError, match="_MODEL_OK"):
        bpe.load_bpe_model(spark, path)
    # size mismatch (marker from a different save) also refused
    with open(marker, "w") as fh:
        json.dump({"n_merges": 99, "n_base": 1}, fh)
    with pytest.raises(ValueError, match="torn or tampered"):
        bpe.load_bpe_model(spark, path)
    # a clean re-save recovers
    bpe.save_bpe_model(spark, m, path)
    assert bpe.load_bpe_model(spark, path).merges == m.merges
