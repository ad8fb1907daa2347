"""Analytics operator tests: vocab top-k vs in-process counter, k-means
behavior on separable clusters, deterministic sampling split."""
import collections

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def test_vocab_topk_matches_counter(ray_session):
    from web_content_extraction_benchmark_ray.functions.text import tokenize_ws
    from web_content_extraction_benchmark_ray.pipelines.analytics import (
        VOCAB_K,
        vocab_topk,
    )

    texts = pq.read_table(f"{SF}/documents.parquet", columns=["text"])
    counter = collections.Counter(
        t for row in texts.column("text").to_pylist() for t in tokenize_ws(row)
    )
    expected = sorted(counter.items(), key=lambda kv: (-kv[1], kv[0]))[:VOCAB_K]
    got = vocab_topk(SF).to_pandas()
    got_pairs = sorted(
        zip(got["word"], got["n"]), key=lambda kv: (-kv[1], kv[0])
    )
    assert [(w, int(n)) for w, n in got_pairs] == expected


def test_kmeans_separable_clusters(ray_session):
    import ray

    from web_content_extraction_benchmark_ray.pipelines.analytics import (
        _assign_batch,
    )

    # two well-separated directions; centroids = first vector of each
    rng = np.random.default_rng(3)
    a = rng.normal(loc=(5, 0, 0, 0), scale=0.1, size=(20, 4))
    b = rng.normal(loc=(0, 5, 0, 0), scale=0.1, size=(20, 4))
    vecs = np.vstack([a, b])
    cents = np.vstack([a[0], b[0]])
    batch = pa.table(
        {
            "vec_id": pa.array(range(40), pa.int64()),
            "embedding": pa.array(vecs.tolist(), pa.list_(pa.float64())),
        }
    )
    out = _assign_batch(batch, ray.put(cents)).to_pandas()
    assert (out["cluster"][:20] == 0).all()
    assert (out["cluster"][20:] == 1).all()


def test_kmeans_iterate_runs_and_partitions(ray_session):
    from web_content_extraction_benchmark_ray.pipelines.analytics import (
        KMEANS_K,
        kmeans_iterate,
    )

    out = kmeans_iterate(SF, iters=2).to_pandas()
    assert len(out) == 500
    assert out["vec_id"].is_unique
    assert set(out["cluster"]) <= set(range(KMEANS_K))
    assert out["cluster"].nunique() > 1  # actually partitions the space


def test_sample_split_deterministic_and_ratio(ray_session):
    from web_content_extraction_benchmark_ray.pipelines.analytics import (
        sample_split,
    )

    a = sample_split(SF).to_pandas().sort_values("doc_id").reset_index(drop=True)
    b = sample_split(SF).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert a.equals(b)  # rerun-stable (content-hash, no RNG)
    frac = (a["split"] == "train").mean()
    assert 0.65 < frac < 0.85  # ~75%


def test_eval_agg_by_complexity_band(ray_session):
    from web_content_extraction_benchmark_ray.pipelines.analytics import (
        eval_agg_by_complexity,
    )

    out = eval_agg_by_complexity(SF).to_pandas()
    # 2 models x 5 datasets, minus any band-empty combos
    assert 2 <= len(out) <= 10
    assert set(out["model"]) == {"bte", "whole_text"}
    assert ((0.0 <= out["mean_score"]) & (out["mean_score"] <= 1.0)).all()
    # banded doc count is strictly less than the full corpus
    assert out.groupby("model")["n"].sum().max() < 500


def test_bpe_pairs_matches_counter(ray_session):
    """bpe_pairs against a serial Counter mirror over the same corpus:
    adjacent char pairs of each whitespace token, weighted by the token's
    corpus frequency, ranked (count desc, pair asc)."""
    from web_content_extraction_benchmark_ray.functions.text import tokenize_ws
    from web_content_extraction_benchmark_ray.pipelines.analytics import (
        BPE_TOPK,
        bpe_pairs,
    )

    texts = pq.read_table(f"{SF}/documents.parquet", columns=["text"])
    counter = collections.Counter()
    for row in texts.column("text").to_pylist():
        for tok in tokenize_ws(row):
            for i in range(len(tok) - 1):
                counter[tok[i:i + 2]] += 1
    expected = sorted(counter.items(), key=lambda kv: (-kv[1], kv[0]))[:BPE_TOPK]
    got = bpe_pairs(SF).to_pandas()
    got_pairs = sorted(
        zip(got["pair"], got["n"]), key=lambda kv: (-kv[1], kv[0])
    )
    assert [(p, int(n)) for p, n in got_pairs] == expected
    # single-char tokens contribute nothing; every pair has length 2
    assert all(len(p) == 2 for p in got["pair"])


def test_bpe_merges_matches_serial_loop(ray_session):
    """bpe_merges against a serial BPE trainer mirror: three rounds of
    count -> argmax(count desc, pair asc) -> left-to-right replace with
    a private-use placeholder.  Pins that round r's counts really are
    computed over the corpus re-symbolized by rounds 1..r-1."""
    from web_content_extraction_benchmark_ray.functions.text import tokenize_ws
    from web_content_extraction_benchmark_ray.pipelines.analytics import (
        BPE_MERGE_ROUNDS,
        BPE_PLACEHOLDER_BASE,
        bpe_merges,
    )

    texts = pq.read_table(f"{SF}/documents.parquet", columns=["text"])
    wc = collections.Counter(
        t for row in texts.column("text").to_pylist()
        for t in tokenize_ws(row)
    )
    merges = []
    expect = []
    for r in range(BPE_MERGE_ROUNDS):
        counts = collections.Counter()
        for tok, c in wc.items():
            for p, m in merges:
                tok = tok.replace(p, m)
            for i in range(len(tok) - 1):
                counts[tok[i:i + 2]] += c
        pair, n = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        expect.append((r + 1, pair, n))
        merges.append((pair, chr(BPE_PLACEHOLDER_BASE + r)))
    got = [
        (int(r.round), r.pair, int(r.n))
        for r in bpe_merges(SF).to_pandas().itertuples()
    ]
    assert got == expect


def test_bpe_encode_matches_serial_replace(ray_session):
    """bpe_encode against a serial mirror: squeeze, apply the trained
    merges in rank order via str.replace, count non-space symbols, and
    hash the encoded stream.  Also pins the compression invariant
    (n_sym <= n_base, with strict shrinkage wherever a merge fired)."""
    import pyarrow.parquet as pq

    from web_content_extraction_benchmark_ray.functions.hashing import hash60
    from web_content_extraction_benchmark_ray.functions.text import (
        tokenize_ws,
    )
    from web_content_extraction_benchmark_ray.pipelines.analytics import (
        BPE_PLACEHOLDER_BASE,
        _train_merges,
        bpe_encode,
    )

    df = bpe_encode(SF).to_pandas().set_index("doc_id").sort_index()
    assert (df["n_sym"] <= df["n_base"]).all()
    assert (df["n_sym"] < df["n_base"]).any()  # merges fired somewhere

    reps = [
        (pair, chr(BPE_PLACEHOLDER_BASE + r))
        for r, (pair, _n) in enumerate(_train_merges(SF))
    ]
    assert len(reps) == 3
    t = pq.read_table(f"{SF}/documents.parquet",
                      columns=["doc_id", "text"])
    for doc_id, text in list(zip(t.column("doc_id").to_pylist(),
                                 t.column("text").to_pylist()))[:100]:
        s = " ".join(tokenize_ws(text))
        n_base = len(s) - s.count(" ")
        for p, mark in reps:
            s = s.replace(p, mark)
        row = df.loc[doc_id]
        assert row["n_base"] == n_base
        assert row["n_sym"] == len(s) - s.count(" ")
        assert row["enc_hash"] == hash60(s)


def test_vocab_cms_matches_bruteforce_and_bounds(ray_session):
    """The distributed sketch must equal the serial cell computation,
    and the point-estimate property must hold: min over rows >= true
    count for every word."""
    from collections import Counter

    import pyarrow.parquet as pq

    from web_content_extraction_benchmark_ray.functions.hashing import (
        hash60,
    )
    from web_content_extraction_benchmark_ray.functions.text import (
        tokenize_ws,
    )
    from web_content_extraction_benchmark_ray.pipelines.analytics import (
        CMS_D,
        CMS_W,
        vocab_cms,
    )

    sf = "/root/testdata/sf0.001"
    got = {
        (int(r["row_id"]), int(r["col"])): int(r["count"])
        for r in vocab_cms(sf).take_all()
    }
    texts = pq.read_table(
        f"{sf}/documents.parquet", columns=["text"]
    ).column("text").to_pylist()
    wc = Counter(t for x in texts for t in tokenize_ws(x))
    cells: Counter = Counter()
    for w, n in wc.items():
        for j in range(CMS_D):
            cells[(j, hash60(f"cms{j}:{w}") % CMS_W)] += n
    assert got == dict(cells)
    # estimate(w) = min_j cell(j, h_j(w)) is never below the true count
    for w, n in wc.items():
        est = min(
            got[(j, hash60(f"cms{j}:{w}") % CMS_W)] for j in range(CMS_D)
        )
        assert est >= n
