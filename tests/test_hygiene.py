"""Corpus-hygiene operators (pipelines/hygiene.py): n-gram kernel pins,
decontamination, repetition, unigram log-prob, TF-IDF, PII scrubbing."""

import numpy as np
import pandas as pd
import pytest
import ray.data

from datafiller_ray.pipelines.hygiene import (
    decontaminate,
    doc_repetition,
    pii_scrub,
    tfidf_topterms,
    unigram_logprob,
    word_grams,
)


# ---------------------------------------------------------------------------
# word_grams kernel


def test_word_grams_basic():
    texts = pd.Series(["a b c d", "x y"])
    doc_pos, grams = word_grams(texts, 2)
    assert list(grams) == ["a b", "b c", "c d", "x y"]
    assert list(doc_pos) == [0, 0, 0, 1]


def test_word_grams_never_crosses_doc_boundary():
    texts = pd.Series(["a b", "c d", "e f"])
    _, grams = word_grams(texts, 2)
    assert "b c" not in set(grams)
    assert "d e" not in set(grams)


def test_word_grams_short_and_empty_docs():
    texts = pd.Series(["only", "", None, "a b c"])
    doc_pos, grams = word_grams(texts, 3)
    # only the last doc has >= 3 words
    assert list(grams) == ["a b c"]
    assert list(doc_pos) == [3]


def test_word_grams_whitespace_runs_match_regex_split():
    # str.split() and the oracle's regexp_extract_all('\S+') agree on
    # multi-space / tab / newline separators
    texts = pd.Series(["a  b\tc\nd"])
    _, grams = word_grams(texts, 4)
    assert list(grams) == ["a b c d"]


# ---------------------------------------------------------------------------
# operators over a small in-memory corpus


@pytest.fixture(scope="module")
def corpus(ray_session):
    import ray.data

    df = pd.DataFrame(
        {
            "doc_id": np.arange(8, dtype=np.int64),
            "text": [
                "the quick brown fox jumps over the lazy dog",  # 0: benchmark
                "an unrelated document about ray data pipelines",
                "the quick brown fox jumps somewhere else entirely",  # overlap
                "repeat me repeat me repeat me repeat me",
                "plain words with no duplicate grams here",
                "contact me at alice@example.com or +1 555-123-4567 thanks",
                "two mails bob@test.org and carol@test.org in one doc",
                "",
            ],
            "source": ["s0", "s0", "s1", "s1", "s2", "s2", "s3", "s3"],
        }
    )
    df["lang"] = "en"
    df["n_chars"] = df["text"].str.len().astype(np.int64)
    return ray.data.from_pandas(df)


def test_decontaminate_flags_overlap(corpus):
    # holdout_mod=8 -> doc 0 is the benchmark; doc 2 shares the 4-gram
    # "the quick brown fox" (and "quick brown fox jumps")
    out = decontaminate(corpus, n=4, holdout_mod=8).to_pandas()
    out = out.set_index("doc_id")["n_hits"]
    assert 0 not in out.index  # benchmark doc excluded from output
    assert out.loc[2] == 2
    assert (out.drop(2) == 0).all()


def test_doc_repetition_ratio(corpus):
    out = doc_repetition(corpus, n=2).to_pandas().set_index("doc_id")
    # doc 3: bigrams = 7 total; distinct = {"repeat me","me repeat"} = 2
    assert out.loc[3, "n_grams"] == 7
    assert out.loc[3, "n_distinct"] == 2
    assert out.loc[3, "dup_ratio"] == np.round(1 - 2 / 7, 6)
    # doc 4 has no duplicate bigrams
    assert out.loc[4, "dup_ratio"] == 0.0
    # empty doc: zero grams, ratio 0
    assert out.loc[7, "n_grams"] == 0
    assert out.loc[7, "dup_ratio"] == 0.0


def test_unigram_logprob_matches_naive(corpus):
    out = unigram_logprob(corpus).to_pandas().set_index("doc_id")
    # independent naive computation
    docs = corpus.to_pandas().set_index("doc_id")["text"]
    words = [w for t in docs for w in t.split()]
    total = len(words)
    freq = pd.Series(words).value_counts()
    for did, t in docs.items():
        ws = t.split()
        if not ws:
            assert did not in out.index
            continue
        expect = np.round(
            np.mean([-np.log(freq[w] / total) for w in ws]), 6
        )
        assert out.loc[did, "mean_nll"] == expect
        assert out.loc[did, "n_words"] == len(ws)


def test_tfidf_topterms_rank_and_scores(corpus):
    out = tfidf_topterms(corpus, k=3).to_pandas()
    # every source present, ranks are 1..k' (k' <= 3), deterministic order
    for src, g in out.groupby("source"):
        assert list(g["rank"]) == list(range(1, len(g) + 1))
        s = list(zip(-g["score"], g["w"]))
        assert s == sorted(s)
    # a word appearing in every source has idf 0 -> never outranks
    # a source-exclusive word with tf >= 1
    srcs = out["source"].nunique()
    assert srcs == 4
    top = out[out["rank"] == 1].set_index("source")
    assert top.loc["s1", "w"] in {"repeat", "me"}  # tf=4 exclusive to s1


def test_pii_scrub_redacts_and_counts(corpus):
    out = pii_scrub(corpus).to_pandas().set_index("doc_id")
    assert out.loc[5, "n_emails"] == 1
    assert out.loc[5, "n_phones"] == 1
    assert "<EMAIL>" in out.loc[5, "clean_text"]
    assert "<PHONE>" in out.loc[5, "clean_text"]
    assert "alice@example.com" not in out.loc[5, "clean_text"]
    assert "555-123-4567" not in out.loc[5, "clean_text"]
    assert out.loc[6, "n_emails"] == 2
    assert out.loc[6, "clean_text"].count("<EMAIL>") == 2
    # untouched docs pass through byte-identical
    assert out.loc[4, "clean_text"] == "plain words with no duplicate grams here"
    assert out.loc[4, "n_emails"] == 0 and out.loc[4, "n_phones"] == 0


# ---------------------------------------------------------------------------
# substring_dup


def _sd_docs():
    shared = "alpha beta gamma delta epsilon zeta eta theta"  # exactly 8 words
    return pd.DataFrame(
        {
            "doc_id": np.arange(5, dtype=np.int64),
            "text": [
                f"{shared} unique one tail words here",   # shares the 8-gram
                f"prefix words {shared}",                 # shares the 8-gram
                "totally different text with no overlap at all",
                shared,                                   # exactly one window
                "short text",                             # < 8 words: 0 windows
            ],
        }
    )


def test_substring_dup_bruteforce(ray_session):
    from datafiller_ray.pipelines.hygiene import substring_dup

    docs = _sd_docs()
    out = (
        substring_dup(ray.data.from_pandas(docs), n=8)
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    # brute force: every 8-word window of every doc
    wins = {}
    for _, r in docs.iterrows():
        w = r["text"].split()
        wins[r["doc_id"]] = [
            " ".join(w[i : i + 8]) for i in range(len(w) - 7)
        ]
    for d, ws in wins.items():
        others = set().union(
            *[set(v) for k, v in wins.items() if k != d] or [set()]
        )
        n_shared = sum(1 for g in ws if g in others)
        assert out.loc[d, "n_windows"] == len(ws)
        assert out.loc[d, "n_shared"] == n_shared
        if len(ws):
            assert abs(
                out.loc[d, "shared_frac"] - round(n_shared / len(ws), 6)
            ) < 1e-9
        else:
            assert out.loc[d, "shared_frac"] == 0.0
    # the three docs containing the shared 8-gram each count it
    assert out.loc[0, "n_shared"] >= 1
    assert out.loc[1, "n_shared"] >= 1
    assert out.loc[3, "n_shared"] == 1
    assert out.loc[2, "n_shared"] == 0
    assert out.loc[4, "n_windows"] == 0


def test_substring_dup_single_bucket_equivalent(ray_session):
    from datafiller_ray.pipelines.hygiene import substring_dup

    docs = _sd_docs()
    a = substring_dup(ray.data.from_pandas(docs), n=8).to_pandas()
    b = substring_dup(ray.data.from_pandas(docs), n=8, n_buckets=1).to_pandas()
    a = a.sort_values("doc_id").reset_index(drop=True)
    b = b.sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_substring_dup_within_doc_repeat_not_shared(ray_session):
    from datafiller_ray.pipelines.hygiene import substring_dup

    # an 8-gram repeated WITHIN one doc but present in no other doc is not
    # "shared" (nd == 1): repetition is doc_repetition's job
    g = "a b c d e f g h"
    docs = pd.DataFrame(
        {"doc_id": np.array([0, 1], dtype=np.int64),
         "text": [f"{g} {g}", "nothing in common here at all ok"]}
    )
    out = (
        substring_dup(ray.data.from_pandas(docs), n=8)
        .to_pandas()
        .set_index("doc_id")
    )
    assert out.loc[0, "n_shared"] == 0


def test_substring_dup_validation(ray_session):
    from datafiller_ray.config import EngineValueError
    from datafiller_ray.pipelines.hygiene import substring_dup

    docs = ray.data.from_pandas(_sd_docs())
    with pytest.raises(EngineValueError):
        substring_dup(docs, n=1)
    with pytest.raises(EngineValueError):
        substring_dup(docs, n_buckets=0)


def test_substring_dup_null_text(ray_session):
    from datafiller_ray.pipelines.hygiene import substring_dup

    df = pd.DataFrame(
        {
            "doc_id": np.arange(3, dtype=np.int64),
            "text": ["one two three four five six seven eight", None,
                     "one two three four five six seven eight"],
            "source": ["s"] * 3,
            "n_chars": np.zeros(3, np.int64),
        }
    )
    out = (
        substring_dup(ray.data.from_pandas(df), n=8)
        .to_pandas()
        .set_index("doc_id")
    )
    assert out.loc[1, "n_windows"] == 0 and out.loc[1, "shared_frac"] == 0.0
    assert out.loc[0, "n_shared"] == 1 and out.loc[2, "n_shared"] == 1


# ---------------------------------------------------------------------------
# quality_checks (Deequ-style constraint suite)


def test_quality_checks_counts_violations(ray_session):
    from datafiller_ray.pipelines.hygiene import quality_checks

    df = pd.DataFrame(
        {
            "doc_id": np.array([1, 2, 2, 3, 4], dtype=np.int64),
            "text": ["hello", "", "abc", None, "toolongx"],
            "n_chars": pd.array([5, 0, 3, 7, 8], dtype="Int64"),
            "lang": ["en", "en", None, "", "fr"],
            "source": ["s"] * 5,
        }
    )
    out = (
        quality_checks(ray.data.from_pandas(df), max_chars=6)
        .to_pandas()
        .set_index("check_name")
    )
    assert set(out.index) == {
        "text_nonempty", "nchars_consistent", "lang_present",
        "nchars_range", "doc_id_unique",
    }
    assert (out["n_rows"] == 5).all()
    # "" and None texts violate
    assert out.loc["text_nonempty", "n_violations"] == 2
    # row2 n_chars=0 == len("")? yes consistent; row with None text violates
    assert out.loc["nchars_consistent", "n_violations"] == 1
    assert out.loc["lang_present", "n_violations"] == 2
    # n_chars: 0 (<1) and 7,8 (>6) violate -> 3
    assert out.loc["nchars_range", "n_violations"] == 3
    # doc_id 2 appears twice -> 1 excess duplicate
    assert out.loc["doc_id_unique", "n_violations"] == 1
    assert out.loc["doc_id_unique", "passed"] == 0
    assert out.loc["text_nonempty", "passed"] == 0


def test_quality_checks_clean_passes(ray_session):
    from datafiller_ray.pipelines.hygiene import quality_checks

    df = pd.DataFrame(
        {
            "doc_id": np.arange(4, dtype=np.int64),
            "text": ["aa", "bb", "cc", "dd"],
            "n_chars": np.full(4, 2, dtype=np.int64),
            "lang": ["en"] * 4,
            "source": ["s"] * 4,
        }
    )
    out = quality_checks(ray.data.from_pandas(df)).to_pandas()
    assert (out["passed"] == 1).all()
    assert (out["n_violations"] == 0).all()


def test_quality_checks_bad_max_chars():
    from datafiller_ray.config import EngineValueError
    from datafiller_ray.pipelines.hygiene import quality_checks

    with pytest.raises(EngineValueError):
        quality_checks(None, max_chars=0)


def test_gopher_rules_literal_census(ray_session):
    from datafiller_ray.pipelines.hygiene import gopher_rules

    docs = pd.DataFrame(
        {
            "doc_id": np.arange(6, dtype=np.int64),
            "text": [
                # passes everything: 24 words, mean word length 4.375 in
                # [4.3, 4.7], 2 stopwords, all distinct
                "the and "
                + " ".join(f"w{i:03d}" for i in range(11))
                + " "
                + " ".join(f"x{i:04d}" for i in range(11)),
                # too short (wc < 20)
                "the a of to in",
                # repetition: distinct ratio far below 0.4
                " ".join(["the", "a"] * 15),
                # no stopwords
                " ".join(f"w{i:02d}xx" for i in range(25)),
                # mean word length too high
                " ".join("verylongword" for _ in range(25)),
                # empty text: 0 words -> fails words rule
                "",
            ],
            "lang": ["en"] * 6,
            "source": ["s1", "s1", "s1", "s2", "s2", "s2"],
            "n_chars": np.zeros(6, dtype=np.int64),
        }
    )
    out = (
        gopher_rules(ray.data.from_pandas(docs))
        .to_pandas()
        .sort_values("source")
        .reset_index(drop=True)
    )
    s1 = out[out["source"] == "s1"].iloc[0]
    s2 = out[out["source"] == "s2"].iloc[0]
    assert s1["n_docs"] == 3 and s2["n_docs"] == 3
    assert s1["n_fail_words"] == 1      # the short doc
    assert s1["n_fail_rep"] == 1        # the repeated-word doc
    assert s2["n_fail_stop"] >= 2       # no-stopword + longword docs
    assert s2["n_fail_wordlen"] >= 1    # the longword doc
    assert s2["n_fail_words"] == 1      # the empty doc
    assert s1["n_pass"] == 1 and s2["n_pass"] == 0


def test_gopher_rules_validates_params(ray_session):
    from datafiller_ray.config import EngineValueError
    from datafiller_ray.pipelines.hygiene import gopher_rules

    with pytest.raises(EngineValueError):
        gopher_rules(None, min_words=10, max_words=5)
    with pytest.raises(EngineValueError):
        gopher_rules(None, min_stop_hits=-1)
