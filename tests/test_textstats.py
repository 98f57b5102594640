"""Text-analysis stages: token stats, quality, language-ID, fingerprint."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from elasticsearch_assets_ray.stages import textstats


def _batch(texts):
    return pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                     "text": pa.array(texts)})


def test_token_stats_pure_python_parity():
    import re

    texts = ["Hello, world! hello", "", "a b a b c", "x" * 100]
    out = textstats.token_stats(_batch(texts))
    for i, t in enumerate(texts):
        toks = [w for w in re.split(r"[^a-z0-9]+", t.lower()) if w]
        assert out["token_count"][i].as_py() == len(toks)
        assert out["uniq_token_count"][i].as_py() == len(set(toks))
        assert out["char_count"][i].as_py() == len(t)


def test_quality_stats_values():
    out = textstats.quality_stats(_batch(["the cat sat!! on the mat"]))
    assert out["n_words"][0].as_py() == 6
    assert out["n_punct"][0].as_py() == 2
    assert abs(out["stopword_ratio"][0].as_py() - 3 / 6) < 1e-12  # the, on, the
    toks = ["the", "cat", "sat", "on", "the", "mat"]
    assert abs(out["mean_word_len"][0].as_py() - sum(map(len, toks)) / 6) < 1e-12


def test_language_id_accuracy_on_sf(sf_dir):
    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "lang", "text"])
    lid = textstats.LanguageID()
    out = lid(t)
    # the synthetic docs are keyword soup — just require the stage to be
    # deterministic and to emit only known labels
    preds = out["pred_lang"].to_pylist()
    assert set(preds) <= {"en", "de", "fr", "es", "zh", "unknown"}
    out2 = lid(t)
    assert preds == out2["pred_lang"].to_pylist()


def test_language_id_on_clear_text():
    lid = textstats.LanguageID()
    out = lid(_batch([
        "the cat is on the mat and it is happy with that",
        "der Hund ist nicht mit der Katze und das ist gut",
        "le chat est dans la maison et les enfants sont pour",
        "el perro es una mascota y los gatos son para la casa",
        "这是一个中文句子我们在这里",
    ]))
    assert out["pred_lang"].to_pylist() == ["en", "de", "fr", "es", "zh"]


def test_fingerprint_order_sensitive_and_stable():
    a = textstats.fingerprint(_batch(["abc def", "def abc", "abc def"]))
    f = a["fingerprint"].to_pylist()
    assert f[0] == f[2] and f[0] != f[1]
    # matches the scalar Horner definition
    def scalar(s):
        acc = 0
        for b in s.encode():
            acc = (acc * textstats._FP_BASE + b) & 0xFFFFFFFFFFFFFFFF
        return np.uint64(acc).astype(np.int64)
    assert f[0] == scalar("abc def")


# ---------------------------------------------------------------------------
# repetition stats (Gopher-style quality rules)
# ---------------------------------------------------------------------------


def test_repetition_stats_brute_force():
    import collections

    import pytest

    from elasticsearch_assets_ray.stages.textstats import repetition_stats

    texts = [
        "spam spam spam eggs",               # heavy word + 2-gram repeats
        "a b a b a b c",                     # dominant "a b"
        "all words here are unique tokens",  # no repetition
        "",                                  # empty
        "one",                               # single token (no 2-grams)
        "x y z x y z x y z",                 # dominant 3-gram
        "Tie tie BREAK break tie break",     # case-folded + ties
    ]
    t = pa.table({"doc_id": pa.array(range(len(texts))), "text": pa.array(texts)})
    out = repetition_stats(t)

    def brute(text):
        toks = [w for w in __import__("re").split(r"[^a-z0-9]+", text.lower()) if w]
        nt, nd = len(toks), len(set(toks))
        chars = sum(len(w) for w in toks)
        dup = 1 - nd / nt if nt else 0.0
        fr = []
        for n in (2, 3):
            if len(toks) < n or chars == 0:
                fr.append(0.0)
                continue
            grams = [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]
            cnt = collections.Counter(grams)
            best = min(cnt, key=lambda g: (-cnt[g], g))
            fr.append(cnt[best] * (len(best) - (n - 1)) / chars)
        return dup, fr[0], fr[1]

    for i, text in enumerate(texts):
        dup, f2, f3 = brute(text)
        assert out["dup_word_frac"][i].as_py() == pytest.approx(dup, abs=1e-12), i
        assert out["top2_char_frac"][i].as_py() == pytest.approx(f2, abs=1e-12), i
        assert out["top3_char_frac"][i].as_py() == pytest.approx(f3, abs=1e-12), i
    # sanity: the spammy docs score much higher than the unique one
    assert out["dup_word_frac"][0].as_py() > 0.4
    assert out["top2_char_frac"][1].as_py() > 0.5
    assert out["dup_word_frac"][2].as_py() == 0.0


def test_repetition_stats_no_cross_doc_ngrams():
    from elasticsearch_assets_ray.stages.textstats import repetition_stats

    # "b a" would be the top 2-gram only if grams leaked across rows
    t = pa.table(
        {"doc_id": pa.array([0, 1, 2]), "text": pa.array(["a b", "a b", "a b"])}
    )
    out = repetition_stats(t)
    assert out["top2_char_frac"].to_pylist() == [1.0, 1.0, 1.0]


def test_unigram_perplexity_manual(ray_session):
    """Perplexity = exp(−mean ln p(token)) under the corpus unigram LM,
    duplicates counted; empty doc scores 0."""
    import math

    import numpy as np
    import pyarrow as pa
    import ray
    import ray.data

    from elasticsearch_assets_ray.stages.textstats import (
        UnigramPerplexity,
        unigram_counts,
    )

    texts = ["a a b", "b c", ""]
    ds = ray.data.from_arrow(
        pa.table({"doc_id": pa.array([0, 1, 2], pa.int64()), "text": pa.array(texts)})
    ).repartition(2)
    model = unigram_counts(ds)
    got = dict(zip(model["term"].to_pylist(), model["cnt"].to_pylist()))
    assert got == {"a": 2, "b": 2, "c": 1}
    stage = UnigramPerplexity(ray.put(model))
    out = stage(pa.table({"doc_id": pa.array([0, 1, 2], pa.int64()), "text": pa.array(texts)}))
    ppl = out["unigram_ppl"].to_pylist()
    p = {t: c / 5.0 for t, c in got.items()}
    want0 = math.exp(-(2 * math.log(p["a"]) + math.log(p["b"])) / 3)
    want1 = math.exp(-(math.log(p["b"]) + math.log(p["c"])) / 2)
    np.testing.assert_allclose(ppl[0], want0, rtol=1e-12)
    np.testing.assert_allclose(ppl[1], want1, rtol=1e-12)
    assert ppl[2] == 0.0
    # rarer tokens -> higher perplexity
    assert ppl[1] > ppl[0]


def test_gopher_filter_rules_and_mask():
    import pyarrow as pa

    from elasticsearch_assets_ray.stages.textstats import gopher_filter

    texts = [
        "the quick brown fox jumps over the lazy dog and it runs far away "
        "with many fine words that keep going on and on for quite a while "
        "until the quota of thirty words is comfortably reached today",  # keep
        "tiny doc",                                  # fails word count (+stopwords)
        "word " * 40,                                # massive duplication
    ]
    out = gopher_filter(
        pa.table({"doc_id": pa.array([0, 1, 2], pa.int64()), "text": pa.array(texts)})
    )
    keep = out["gopher_keep"].to_pylist()
    mask = out["gopher_fail_mask"].to_pylist()
    assert keep[0] == 1 and mask[0] == 0
    assert keep[1] == 0 and mask[1] & 1  # word-count bit
    assert keep[2] == 0 and mask[2] & 8  # dup-word bit
