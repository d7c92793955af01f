"""Text-analysis operator semantics."""

from __future__ import annotations

import pytest

from stockpulse_batch_realtime_etl_spark.operators import text


def doc(i, t, lang="en"):
    return (i, t, lang, "s", len(t))


@pytest.fixture(scope="module")
def docs(make_docs):
    return make_docs(
        [
            doc(1, "the cat sat on the mat"),
            doc(2, "der hund ist nicht der beste"),
            doc(3, "numbers 123 and 456 here"),
            doc(4, "zzz qqq xxx"),  # no keywords in any language
        ]
    )


def test_text_stats_token_counts(docs):
    s = {r.doc_id: r for r in text.text_stats(docs).collect()}
    assert s[1].token_count == 6
    assert s[1].distinct_tokens == 5            # 'the' twice
    assert s[1].char_len == len("the cat sat on the mat")
    assert s[1].stopword_ratio == round(2 / 6, 4)
    assert s[3].digit_ratio == round(6 / len("numbers 123 and 456 here"), 4)
    assert s[4].stopword_ratio == 0.0


def test_quality_score_bounds(docs):
    for r in text.quality_score(docs).collect():
        assert 0.0 <= r.quality <= 1.0
    scores = {r.doc_id: r.quality for r in text.quality_score(docs).collect()}
    assert scores[1] > scores[4]                # stopword-bearing beats gibberish


def test_token_counts_frequency_order(docs):
    out = text.token_counts(docs).collect()
    assert out[0].token in {"the", "der"} and out[0].freq == 2
    freqs = [r.freq for r in out]
    assert freqs == sorted(freqs, reverse=True)


def test_language_id_votes(docs):
    out = {r.doc_id: r for r in text.language_id(docs).collect()}
    assert out[1].pred_lang == "en"
    assert out[2].pred_lang == "de"
    assert out[4].pred_lang == "und" and out[4].lang_hits == 0


def test_language_id_hit_counts(docs):
    out = {r.doc_id: r for r in text.language_id(docs).collect()}
    # doc1 tokens: the, cat, sat, on, the, mat → 'the'×2 are en keywords
    assert out[1].lang_hits == 2
    # doc2: der×2, ist, nicht are de keywords → 4 hits
    assert out[2].lang_hits == 4
