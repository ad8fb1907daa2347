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
