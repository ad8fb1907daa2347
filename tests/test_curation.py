"""Curation operators: decontamination, shard packing (distributed
prefix scan), PII scrubbing (pipelines/curation.py)."""
import numpy as np
import pytest

SF = "/root/testdata/sf0.001"


def test_decontaminate_flags_benchmark_members(ray_session):
    from web_content_extraction_benchmark_ray.pipelines.curation import (
        DECON_EVERY,
        decontaminate,
    )

    df = decontaminate(SF).to_pandas().set_index("doc_id").sort_index()
    bench = df.index[df.index % DECON_EVERY == 0]
    assert len(bench) > 0
    # benchmark members overlap themselves fully -> always contaminated
    assert (df.loc[bench, "contaminated"] == 1).all()
    assert (df.loc[bench, "n_overlap"] == df.loc[bench, "n_shingles"]).all()
    # overlap is bounded by the doc's own shingle count
    assert (df["n_overlap"] <= df["n_shingles"]).all()
    # the flag is exactly the >=50% rule
    expect = (2 * df["n_overlap"] >= df["n_shingles"]).astype(int)
    assert (df["contaminated"] == expect).all()


def test_pack_shards_matches_serial_prefix_scan(ray_session):
    import pyarrow.parquet as pq

    from web_content_extraction_benchmark_ray.functions.text import (
        tokenize_ws,
    )
    from web_content_extraction_benchmark_ray.pipelines.curation import (
        PACK_BUDGET,
        pack_shards,
    )

    df = pack_shards(SF).to_pandas().sort_values("doc_id")
    t = pq.read_table(
        f"{SF}/documents.parquet", columns=["doc_id", "text"]
    ).to_pandas().sort_values("doc_id")
    tok = t["text"].map(lambda s: len(tokenize_ws(s))).to_numpy()
    excl = np.concatenate([[0], np.cumsum(tok)[:-1]])
    assert (df["doc_id"].to_numpy() == t["doc_id"].to_numpy()).all()
    assert (df["n_tokens"].to_numpy() == tok).all()
    assert (df["shard_id"].to_numpy() == excl // PACK_BUDGET).all()
    # shards are contiguous in doc order and monotone
    assert (np.diff(df["shard_id"].to_numpy()) >= 0).all()


@pytest.mark.parametrize("range_size", [16, 64, 1000])
def test_pack_shards_bucket_size_invariant(ray_session, range_size):
    """The scan partitioning constant must not change the answer."""
    from web_content_extraction_benchmark_ray.pipelines.curation import (
        pack_shards,
    )

    base = pack_shards(SF).to_pandas().sort_values("doc_id")
    alt = (
        pack_shards(SF, range_size=range_size)
        .to_pandas()
        .sort_values("doc_id")
    )
    assert (
        base["shard_id"].to_numpy() == alt["shard_id"].to_numpy()
    ).all()


def test_pii_scrub_redacts_augmented_emails(ray_session):
    from web_content_extraction_benchmark_ray.functions.hashing import hash60
    from web_content_extraction_benchmark_ray.pipelines.curation import (
        PII_EVERY,
        _PII_RE,
        _pii_suffix,
        pii_scrub,
    )

    df = pii_scrub(SF).to_pandas().set_index("doc_id").sort_index()
    aug = df.index % PII_EVERY == 0
    assert (df.loc[aug, "n_pii"] == 1).all()
    assert (df.loc[~aug, "n_pii"] == 0).all()
    # spot-check one redaction end-to-end against the pure function
    import pyarrow.parquet as pq

    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    doc_id = next(i for i in t.column("doc_id").to_pylist()
                  if i % PII_EVERY == 0)
    text = t.column("text").to_pylist()[
        t.column("doc_id").to_pylist().index(doc_id)
    ] + _pii_suffix(doc_id)
    red = _PII_RE.sub("<EMAIL>", text)
    assert "@" not in red
    assert df.loc[doc_id, "clean_hash"] == hash60(red)


def test_select_budget_matches_serial_scan(ray_session):
    """The two-level distributed scan must equal a single-process sort +
    cumsum over (quality desc, doc_id asc), and the budget must select a
    nontrivial strict subset at this scale."""
    import pyarrow.parquet as pq

    from web_content_extraction_benchmark_ray.functions.text import (
        tokenize_ws,
    )
    from web_content_extraction_benchmark_ray.functions.textstats import (
        quality_features,
    )
    from web_content_extraction_benchmark_ray.pipelines.curation import (
        SELECT_BUDGET,
        select_budget,
    )

    df = select_budget(SF).to_pandas().sort_values("doc_id")
    t = pq.read_table(
        f"{SF}/documents.parquet", columns=["doc_id", "text"]
    ).to_pandas()
    t["n_tokens"] = t["text"].map(lambda s: len(tokenize_ws(s)))
    t["q_mu"] = t["text"].map(
        lambda s: int(round(quality_features(s)["quality"] * 1e6))
    )
    t = t.sort_values(["q_mu", "doc_id"], ascending=[False, True])
    t["cum"] = t["n_tokens"].cumsum()
    t = t.sort_values("doc_id")
    assert (df["doc_id"].to_numpy() == t["doc_id"].to_numpy()).all()
    assert (df["n_tokens"].to_numpy() == t["n_tokens"].to_numpy()).all()
    assert (df["quality_mu"].to_numpy() == t["q_mu"].to_numpy()).all()
    assert (df["cum_tokens"].to_numpy() == t["cum"].to_numpy()).all()
    assert (
        df["selected"].to_numpy()
        == (t["cum"].to_numpy() <= SELECT_BUDGET).astype(np.int64)
    ).all()
    n_sel = int(df["selected"].sum())
    assert 0 < n_sel < len(df)


def test_select_budget_parameterized_budget(ray_session):
    """budget=0 selects nothing; an over-large budget selects everything."""
    from web_content_extraction_benchmark_ray.pipelines.curation import (
        select_budget,
    )

    none = select_budget(SF, budget=0).to_pandas()
    assert int(none["selected"].sum()) == 0
    allb = select_budget(SF, budget=1 << 40).to_pandas()
    assert int(allb["selected"].sum()) == len(allb)


def test_source_mix_fills_each_source_quota(ray_session):
    """Within each source: selection is the greedy (quality desc,
    doc_id) prefix under budget // n_sources; selected sets match the
    serial recompute and no source exceeds its quota."""
    import pyarrow.parquet as pq

    from web_content_extraction_benchmark_ray.functions.text import tokenize_ws
    from web_content_extraction_benchmark_ray.functions.textstats import (
        quality_features,
    )
    from web_content_extraction_benchmark_ray.pipelines.curation import (
        SELECT_BUDGET,
        source_mix,
    )

    sf = "/root/testdata/sf0.001"
    df = source_mix(sf).to_pandas()
    docs = pq.read_table(
        sf + "/documents.parquet", columns=["doc_id", "source", "text"]
    ).to_pandas()
    quota = SELECT_BUDGET // docs["source"].nunique()
    expect_sel = set()
    for src, g in docs.groupby("source"):
        rows = sorted(
            (
                (
                    -int(round(quality_features(t)["quality"] * 1e6)),
                    int(i),
                    len(tokenize_ws(t)),
                )
                for i, t in zip(g["doc_id"], g["text"])
            )
        )
        cum = 0
        for negq, i, n in rows:
            cum += n
            if cum <= quota:
                expect_sel.add(i)
    got_sel = set(df[df["selected"] == 1]["doc_id"].astype(int))
    assert got_sel == expect_sel and got_sel
    # quota respected per source
    sel = df[df["selected"] == 1]
    assert (sel.groupby("source")["n_tokens"].sum() <= quota).all()
    # every doc is reported, selected or not
    assert len(df) == len(docs)


def test_quality_tiers_matches_serial_ntile(ray_session):
    """The two-level distributed rank must equal a single-process sort:
    rnk == ROW_NUMBER and tier == NTILE(k) over (q desc, doc_id asc)."""
    import pyarrow.parquet as pq

    from web_content_extraction_benchmark_ray.functions.text import (
        tokenize_ws,
    )
    from web_content_extraction_benchmark_ray.functions.textstats import (
        quality_features,
    )
    from web_content_extraction_benchmark_ray.pipelines.curation import (
        TIER_K,
        quality_tiers,
    )

    df = quality_tiers(SF).to_pandas().sort_values("doc_id")
    t = pq.read_table(
        f"{SF}/documents.parquet", columns=["doc_id", "text"]
    ).to_pandas()
    t["n_tokens"] = t["text"].map(lambda s: len(tokenize_ws(s)))
    t["q_mu"] = t["text"].map(
        lambda s: int(round(quality_features(s)["quality"] * 1e6))
    )
    t = t.sort_values(["q_mu", "doc_id"], ascending=[False, True])
    t["rnk"] = np.arange(1, len(t) + 1)
    n, k = len(t), TIER_K
    small, rem = divmod(n, k)
    cutoff = rem * (small + 1)
    r0 = t["rnk"].to_numpy() - 1
    t["tier"] = np.where(
        r0 < cutoff,
        r0 // (small + 1) + 1,
        rem + (r0 - cutoff) // max(small, 1) + 1,
    )
    t = t.sort_values("doc_id")
    assert (df["doc_id"].to_numpy() == t["doc_id"].to_numpy()).all()
    assert (df["n_tokens"].to_numpy() == t["n_tokens"].to_numpy()).all()
    assert (df["quality_mu"].to_numpy() == t["q_mu"].to_numpy()).all()
    assert (df["rnk"].to_numpy() == t["rnk"].to_numpy()).all()
    assert (df["tier"].to_numpy() == t["tier"].to_numpy()).all()
    # the rank is a permutation of 1..n and every tier is populated
    assert sorted(df["rnk"]) == list(range(1, len(df) + 1))
    assert set(df["tier"]) == set(range(1, TIER_K + 1))


def test_quality_tiers_uneven_k(ray_session):
    """With k not dividing n, the first n%k tiles hold one extra row
    (DuckDB NTILE semantics)."""
    from web_content_extraction_benchmark_ray.pipelines.curation import (
        quality_tiers,
    )

    df = quality_tiers(SF, k=3).to_pandas()
    n, k = len(df), 3
    small, rem = divmod(n, k)
    sizes = df.groupby("tier").size().sort_index().tolist()
    assert sizes == [small + 1] * rem + [small] * (k - rem)


def test_shuffle_order_is_exact_seeded_permutation(ray_session):
    """The two-level hash-bucket scan must equal a single-process sort by
    (hash60, doc_id): a bijective 1..n position, stable across runs,
    different under a different seed."""
    import pyarrow.parquet as pq

    from web_content_extraction_benchmark_ray.functions.hashing import (
        hash60,
    )
    from web_content_extraction_benchmark_ray.pipelines.curation import (
        SHUFFLE_SEED,
        SHUFFLE_SEQ_DOCS,
        shuffle_order,
    )

    df = shuffle_order(SF).to_pandas().sort_values("doc_id")
    ids = (
        pq.read_table(f"{SF}/documents.parquet", columns=["doc_id"])
        .to_pandas()["doc_id"].astype(int).tolist()
    )
    expect = sorted(ids, key=lambda i: (hash60(f"{SHUFFLE_SEED}:{i}"), i))
    pos = {i: p + 1 for p, i in enumerate(expect)}
    assert df["shuffle_pos"].tolist() == [pos[i] for i in df["doc_id"]]
    assert sorted(df["shuffle_pos"]) == list(range(1, len(ids) + 1))
    assert (
        df["shard_id"] == (df["shuffle_pos"] - 1) // SHUFFLE_SEQ_DOCS
    ).all()
    # a different seed is a different permutation (new epoch)
    other = shuffle_order(SF, seed="shuf2").to_pandas().sort_values("doc_id")
    assert other["shuffle_pos"].tolist() != df["shuffle_pos"].tolist()
    assert sorted(other["shuffle_pos"]) == list(range(1, len(ids) + 1))


def test_pack_sequences_matches_serial_shuffled_scan(ray_session):
    """Sequence packing in shuffled order must equal a single-process
    (hash, doc_id) sort + exclusive cumsum; sequences fill contiguously."""
    import pyarrow.parquet as pq

    from web_content_extraction_benchmark_ray.functions.hashing import (
        hash60,
    )
    from web_content_extraction_benchmark_ray.functions.text import (
        tokenize_ws,
    )
    from web_content_extraction_benchmark_ray.pipelines.curation import (
        SEQ_LEN,
        SHUFFLE_SEED,
        pack_sequences,
    )

    df = pack_sequences(SF).to_pandas().sort_values("doc_id")
    t = pq.read_table(
        f"{SF}/documents.parquet", columns=["doc_id", "text"]
    ).to_pandas()
    t["n_tokens"] = t["text"].map(lambda s: len(tokenize_ws(s)))
    t["h"] = t["doc_id"].map(lambda i: hash60(f"{SHUFFLE_SEED}:{int(i)}"))
    t = t.sort_values(["h", "doc_id"])
    t["prefix"] = t["n_tokens"].cumsum() - t["n_tokens"]
    t = t.sort_values("doc_id")
    assert (df["doc_id"].to_numpy() == t["doc_id"].to_numpy()).all()
    assert (df["n_tokens"].to_numpy() == t["n_tokens"].to_numpy()).all()
    assert (
        df["seq_id"].to_numpy() == (t["prefix"].to_numpy() // SEQ_LEN)
    ).all()
    assert (
        df["seq_off"].to_numpy() == (t["prefix"].to_numpy() % SEQ_LEN)
    ).all()
    # packing is dense: seq ids are contiguous from 0 and every full
    # sequence carries at least one doc start
    assert df["seq_id"].min() == 0
    assert set(range(int(df["seq_id"].max()))) <= set(df["seq_id"])


def test_curate_corpus_composes_member_operators(ray_session):
    """curate_corpus's mask bits must agree with the standalone member
    operators on the same corpus (gopher_filter for bit 1, dedup_exact
    survivors for bit 2, decontaminate for bit 4 on base docs), and the
    kept docs' shard ids must equal the serial kept-token prefix scan."""
    from web_content_extraction_benchmark_ray.pipelines.curation import (
        PACK_BUDGET,
        curate_corpus,
        decontaminate,
    )
    from web_content_extraction_benchmark_ray.pipelines.dataops import (
        NEAR_DUP_OFFSET,
        dedup_exact,
    )
    from web_content_extraction_benchmark_ray.pipelines.qualityops import (
        gopher_filter,
    )

    df = curate_corpus(SF).to_pandas().set_index("doc_id").sort_index()
    assert (df["keep"] == (df["reason_mask"] == 0).astype(int)).all()
    assert ((df["shard_id"] == -1) == (df["keep"] == 0)).all()

    survivors = set(dedup_exact(SF).to_pandas()["doc_id"])
    assert (
        (df["reason_mask"] & 2 != 0) == ~df.index.isin(sorted(survivors))
    ).all()

    gf = gopher_filter(SF).to_pandas().set_index("doc_id")
    base = df.index[df.index < NEAR_DUP_OFFSET]
    assert (
        (df.loc[base, "reason_mask"] & 1 != 0)
        == (gf.loc[base, "fail_mask"] != 0)
    ).all()

    dc = decontaminate(SF).to_pandas().set_index("doc_id")
    assert (
        (df.loc[base, "reason_mask"] & 4 != 0)
        == (dc.loc[base, "contaminated"] == 1)
    ).all()

    kept = df[df["keep"] == 1].sort_index()
    excl = np.concatenate([[0], np.cumsum(kept["n_tokens"].to_numpy())[:-1]])
    assert (kept["shard_id"].to_numpy() == excl // PACK_BUDGET).all()


def test_curate_corpus_empty_neardup_copy_matches_oracle(
    ray_session, tmp_path
):
    """A one-token doc at doc_id % NEAR_DUP_EVERY == 0 synthesizes an
    EMPTY near-dup copy in the augmented view; the engine counts 0
    tokens for it (tokenize_ws('') == []) and the oracle must agree —
    regression for the regexp_split_to_array('') -> [''] divergence."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    import __ray_entry__ as e
    from web_content_extraction_benchmark_ray.pipelines.curation import (
        curate_corpus,
    )

    docs = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
            "text": pa.array(
                [
                    "solo",
                    "the quick brown fox jumps over the lazy dog today "
                    "and every day it is a fine day for running about",
                    "a different second document with plenty of common "
                    "words so that the gopher stopword rule can pass",
                    "yet another third document the and is to of with "
                    "some more filler words for quality checks here",
                ],
                pa.string(),
            ),
        }
    )
    pq.write_table(docs, str(tmp_path / "documents.parquet"))

    got = (
        curate_corpus(str(tmp_path))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.sql(
        "create view documents as select * from "
        f"'{tmp_path}/documents.parquet'"
    )
    want = (
        con.sql(e.oracle_sql()["curate_corpus"])
        .df()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    cols = sorted(got.columns)
    assert list(want.sort_index(axis=1).columns) == cols
    assert got[cols].astype("int64").equals(want[cols].astype("int64"))
    # the empty near-dup copy of doc 0 exists, counts 0 tokens, dropped
    empty = got.set_index("doc_id").loc[1_000_000]
    assert empty["n_tokens"] == 0 and empty["keep"] == 0


def test_topk_per_source_matches_serial(ray_session):
    """Distributed partial-topk + merge must equal a single-process rank
    over the real table: per source, quality desc / doc_id asc, first k,
    1-based rank."""
    import pyarrow.parquet as pq

    from web_content_extraction_benchmark_ray.functions.textstats import (
        quality_features,
    )
    from web_content_extraction_benchmark_ray.pipelines.curation import (
        TOPK_SRC_K,
        topk_per_source,
    )

    sf = "/root/testdata/sf0.001"
    df = topk_per_source(sf).to_pandas()
    t = pq.read_table(
        f"{sf}/documents.parquet", columns=["doc_id", "text", "source"]
    ).to_pandas()
    rows = []
    for r in t.itertuples():
        qf = quality_features(r.text)
        rows.append((r.source, -int(round(qf["quality"] * 1e6)),
                     int(r.doc_id), qf["n_ws"]))
    rows.sort()
    expect, seen = [], {}
    for src, negq, did, ntok in rows:
        rnk = seen.get(src, 0) + 1
        seen[src] = rnk
        if rnk <= TOPK_SRC_K:
            expect.append((src, rnk, did, -negq, ntok))
    got = sorted(
        (r.source, int(r.rnk), int(r.doc_id), int(r.quality_mu),
         int(r.n_tokens))
        for r in df.itertuples()
    )
    assert got == sorted(expect)
    # the cap binds: every source contributes exactly k rows
    n_src = t["source"].nunique()
    assert len(got) == n_src * TOPK_SRC_K
