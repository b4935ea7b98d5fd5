"""BPE trainer/encoder tests: the vectorized flat-array implementation
vs an independent naive reference (per-round Counter recompute,
per-word while-loop merges), plus the distributed end-to-end path."""

import numpy as np
import pyarrow as pa
import pytest

from zhtml_ray.functions.bpe import (bpe_encode_types, bpe_train_types,
                                     merges_to_table)


def naive_train(words, freqs, num_merges=60, min_count=2):
    from collections import Counter
    seqs = {i: tuple(w) for i, w in enumerate(words)}
    merges = []
    for _ in range(num_merges):
        pc_ = Counter()
        for i, s in seqs.items():
            f = freqs[i]
            for a, b in zip(s, s[1:]):
                pc_[(a, b)] += f
        if not pc_:
            break
        best = max(pc_.values())
        if best < min_count:
            break
        L, R = min(p for p, c in pc_.items() if c == best)
        merges.append((L, R, int(best)))
        new = L + R
        for i, s in seqs.items():
            out, j = [], 0
            while j < len(s):
                if j + 1 < len(s) and s[j] == L and s[j + 1] == R:
                    out.append(new)
                    j += 2
                else:
                    out.append(s[j])
                    j += 1
            seqs[i] = tuple(out)
    return merges


def naive_encode(word, merges):
    s = list(word)
    for L, R, _cnt in merges:
        out, j = [], 0
        while j < len(s):
            if j + 1 < len(s) and s[j] == L and s[j + 1] == R:
                out.append(L + R)
                j += 2
            else:
                out.append(s[j])
                j += 1
        s = out
    return len(s)


def test_train_encode_differential_sweep():
    rng = np.random.default_rng(0)
    for trial in range(20):
        alpha = list("abcdefgh")[: int(rng.integers(2, 8))]
        words = sorted({"".join(rng.choice(alpha, int(rng.integers(1, 12))))
                        for _ in range(int(rng.integers(5, 120)))})
        freqs = rng.integers(1, 50, len(words)).astype(np.int64)
        m_fast = bpe_train_types(words, freqs, num_merges=40)
        m_ref = naive_train(words, list(freqs), num_merges=40)
        assert m_fast == m_ref, f"trial {trial}"
        enc_fast = bpe_encode_types(words, m_fast)
        enc_ref = np.array([naive_encode(w, m_ref) for w in words])
        assert (enc_fast == enc_ref).all(), f"trial {trial}"


def test_overlapping_run_merges_leftmost_first():
    # 'aaaaa' with merge (a,a): leftmost-nonoverlap -> aa aa a = 3 toks
    merges = bpe_train_types(["aaaaa"], np.array([5]), num_merges=1)
    assert merges[0][:2] == ("a", "a")
    assert bpe_encode_types(["aaaaa"], merges).tolist() == [3]
    # naive agrees
    assert naive_encode("aaaaa", merges) == 3


def test_train_order_invariant():
    rng = np.random.default_rng(5)
    words = sorted({"".join(rng.choice(list("abcdef"),
                                       int(rng.integers(1, 10))))
                    for _ in range(200)})
    freqs = rng.integers(1, 99, len(words)).astype(np.int64)
    m1 = bpe_train_types(words, freqs, 60)
    perm = rng.permutation(len(words))
    m2 = bpe_train_types([words[i] for i in perm], freqs[perm], 60)
    assert m1 == m2


def test_encode_unknown_chars_stay_single():
    merges = bpe_train_types(["ab"], np.array([9]), num_merges=5)
    assert bpe_encode_types(["zzzq", "ab"], merges).tolist() == [4, 1]


@pytest.fixture(scope="module")
def docs_dir(tmp_path_factory):
    import pyarrow.parquet as pq
    rng = np.random.default_rng(7)
    vocab = ["".join(rng.choice(list("abcdefghij"),
                                int(rng.integers(2, 9))))
             for _ in range(80)]
    texts = [" ".join(rng.choice(vocab, int(rng.integers(0, 40))))
             for _ in range(300)]
    d = tmp_path_factory.mktemp("bpedocs")
    pq.write_table(pa.table({
        "doc_id": pa.array(np.arange(300, dtype=np.int64)),
        "text": pa.array(texts, pa.string())}), d / "documents.parquet")
    return str(d), texts


def test_distributed_train_and_encode(ray_session, docs_dir):
    """End-to-end over a Ray Dataset vs the naive serial pipeline."""
    from collections import Counter

    import ray.data as rd

    from zhtml_ray.functions.bpe import bpe_encode, bpe_train

    d, texts = docs_dir
    ds = rd.read_parquet(f"{d}/documents.parquet") \
        .repartition(13)  # hostile layout: many tiny blocks
    got = bpe_train(ds, num_merges=50)

    cnt = Counter()
    for t in texts:
        cnt.update(t.split())
    ordered = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
    want = naive_train([w for w, _ in ordered],
                       [c for _, c in ordered], num_merges=50)
    assert got.equals(merges_to_table(want))

    enc = bpe_encode(rd.read_parquet(f"{d}/documents.parquet")
                     .repartition(7), got).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    want_tok = [sum(naive_encode(w, want) for w in t.split())
                for t in texts]
    assert enc["n_bpe"].tolist() == want_tok
