"""Distributed BPE tokenizer training (stages/bpe_train.py)."""

import numpy as np
import pyarrow as pa
import pytest

from elasticsearch_assets_ray.stages.bpe_train import (
    EOW,
    _init_symbols,
    bpe_encode_counts,
    bpe_encode_word,
    collect_word_freqs,
    learn_bpe,
    pair_counts,
    word_freqs,
)


def _brute_learn(word_counts: dict[str, int], n_merges: int):
    """Reference learner: dict-of-symbol-lists, all-adjacent pair counts
    (overlaps counted), greedy left-to-right merge application."""
    words = {w: list(w) + [EOW] for w in word_counts}
    merges = []
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for w, syms in words.items():
            c = word_counts[w]
            for i in range(len(syms) - 1):
                counts[(syms[i], syms[i + 1])] = counts.get((syms[i], syms[i + 1]), 0) + c
        if not counts:
            break
        # count DESC, then first-appearance order of the SYMBOLS —
        # replicate the engine's symbol-id tie-break by building the
        # same alphabet order (word-ascending, char order within word)
        alpha: dict[str, int] = {}
        for w in sorted(word_counts):
            for ch in w:
                alpha.setdefault(ch, len(alpha))
            alpha.setdefault(EOW, len(alpha))
        # merged symbols get ids in creation order after the alphabet
        for i, (a, b) in enumerate(merges):
            alpha.setdefault(a + b, len(alpha))
        best = min(counts, key=lambda p: (-counts[p], alpha[p[0]], alpha[p[1]]))
        merges.append(best)
        l, r = best
        for w, syms in words.items():
            out = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[w] = out
    return merges


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_learn_bpe_matches_bruteforce(seed):
    rng = np.random.default_rng(seed)
    vocab = ["spark", "sort", "scan", "part", "aaaa", "abab", "banana"]
    wc = {w: int(rng.integers(1, 40)) for w in rng.choice(vocab, 5, replace=False)}
    wf = pa.table(
        {
            "word": pa.array(sorted(wc), pa.string()),
            "count": pa.array([wc[w] for w in sorted(wc)], pa.int64()),
        }
    )
    got, _ = learn_bpe(wf, 8)
    want = _brute_learn(wc, 8)
    assert got == want


def test_learn_bpe_run_parity():
    # "aaaa" ×1: first (a,a) merge must apply at offsets 0 AND 2
    wf = pa.table({"word": pa.array(["aaaa"]), "count": pa.array([1], pa.int64())})
    merges, vocab = learn_bpe(wf, 3)
    assert merges[0] == ("a", "a")
    # after merge 0 the word is [aa, aa, </w>] — i.e. the run merged at
    # offsets 0 AND 2 (greedy parity), so (aa, aa) and (aa, </w>) both
    # count 1 and the symbol-id tie-break picks (aa, </w>) first
    assert merges[1] == ("aa", EOW)
    assert merges[2] == ("aa", "aa" + EOW)


def test_pair_counts_weighted():
    wf_words = ["ab", "b"]
    syms, wid, vocab = _init_symbols(wf_words)
    uk, cnt = pair_counts(syms, wid, np.array([3, 5], dtype=np.int64))
    V = int(syms.max()) + 1
    m = {(vocab[int(k // V)], vocab[int(k % V)]): int(c) for k, c in zip(uk, cnt)}
    assert m[("a", "b")] == 3
    assert m[("b", EOW)] == 8  # 3 from "ab" + 5 from "b"


def test_encode_word_uses_rank_order():
    ranks = {("a", "b"): 0, ("ab", EOW): 1}
    assert bpe_encode_word("ab", ranks) == ["ab" + EOW]
    assert bpe_encode_word("ba", ranks) == ["b", "a", EOW]


def test_end_to_end_counts(ray_session, sf_dir):
    import ray

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet")
    wf = collect_word_freqs(word_freqs(docs))
    assert wf.num_rows > 10
    # dictionary counts equal a direct token count
    from elasticsearch_assets_ray.stages.tokenizer import tokenize_text
    import pyarrow.parquet as pq

    texts = pq.read_table(f"{sf_dir}/documents.parquet", columns=["text"])["text"].to_pylist()
    ref: dict[str, int] = {}
    for t in texts:
        for w in tokenize_text(t):
            ref[w] = ref.get(w, 0) + 1
    got = dict(zip(wf["word"].to_pylist(), wf["count"].to_pylist()))
    assert got == ref
    merges, _ = learn_bpe(wf, 30)
    assert len(merges) == 30
    enc = pa.concat_tables(
        list(
            bpe_encode_counts(
                ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]),
                merges,
            ).iter_batches(batch_format="pyarrow")
        )
    )
    assert enc.num_rows == len(texts)
    ranks = {m: i for i, m in enumerate(merges)}
    # spot-check 5 docs against the reference encoder
    dmap = dict(zip(enc["doc_id"].to_pylist(), enc["bpe_learned_tokens"].to_pylist()))
    docs_t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    for i in range(0, 50, 10):
        did = docs_t["doc_id"][i].as_py()
        txt = docs_t["text"][i].as_py()
        want = sum(len(bpe_encode_word(w, ranks)) for w in tokenize_text(txt))
        assert dmap[did] == want


def test_bpe_pairs_gate_oracle(ray_session, sf_dir):
    import duckdb

    from elasticsearch_assets_ray.pipelines import registry as R

    got = R.QUERIES["bpe_pairs"](sf_dir).to_pandas()
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'")
    want = con.sql(R.ORACLES["bpe_pairs"]).df()
    assert got["value"].tolist() == want["value"].tolist()
    assert got["count"].tolist() == want["count"].tolist()
    np.testing.assert_array_equal(got["metric_r"], want["metric_r"])
