"""Bucket-count invariance: the coarse partitioning constants (pair
buckets, user buckets, reassembly buckets) are pure physical-plan knobs —
results must be identical at any bucket count.  Round 2 made them derive
from the session's cores (derived_pair_buckets / derived_user_buckets);
these tests pin the invariance at two very different counts so the
derivation can never change semantics.
"""
from __future__ import annotations

SF = "/root/testdata/sf0.001"


def _sorted_df(ds):
    df = ds.to_pandas()
    cols = sorted(df.columns)
    return (
        df[cols].sort_values(cols).reset_index(drop=True)
    )


def test_sessionize_bucket_invariance(ray_session):
    from web_content_extraction_benchmark_ray.pipelines.events import (
        events_sessionize,
    )

    a = _sorted_df(events_sessionize(SF, user_buckets=7))
    b = _sorted_df(events_sessionize(SF, user_buckets=64))
    assert a.equals(b)


def test_asof_bucket_invariance(ray_session):
    from web_content_extraction_benchmark_ray.pipelines.events import (
        events_asof,
    )

    a = _sorted_df(events_asof(SF, user_buckets=5))
    b = _sorted_df(events_asof(SF, user_buckets=64))
    assert a.equals(b)


def test_minhash_pairs_bucket_invariance(ray_session):
    from web_content_extraction_benchmark_ray.pipelines.dataops import (
        _aug_docs,
    )
    from web_content_extraction_benchmark_ray.stages import dedup as dd

    a = _sorted_df(dd.dedup_minhash_pairs(_aug_docs(SF), pair_buckets=17))
    b = _sorted_df(dd.dedup_minhash_pairs(_aug_docs(SF), pair_buckets=256))
    assert len(a) > 0
    assert a.equals(b)


def test_jaccard_prefix_bucket_invariance(ray_session):
    from web_content_extraction_benchmark_ray.pipelines.dataops import (
        _aug_docs,
    )
    from web_content_extraction_benchmark_ray.stages import dedup as dd

    a = _sorted_df(
        dd.dedup_ngram_jaccard_prefix(_aug_docs(SF), pair_buckets=13)
    )
    b = _sorted_df(
        dd.dedup_ngram_jaccard_prefix(_aug_docs(SF), pair_buckets=256)
    )
    assert len(a) > 0
    assert a.equals(b)


def test_derived_bucket_counts(ray_session):
    from web_content_extraction_benchmark_ray.pipelines.events import (
        derived_user_buckets,
    )
    from web_content_extraction_benchmark_ray.stages.dedup import (
        derived_pair_buckets,
    )

    # scale with cores, never below the small-scale defaults
    assert derived_pair_buckets(4) == 256
    assert derived_pair_buckets(256) == 2048
    assert derived_user_buckets(4) == 64
    assert derived_user_buckets(256) == 1024


def test_band_bucket_entropy_fills_sort_space():
    """The ADVICE-flagged degeneracy: minhash buckets derived from a 4-hex
    md5 prefix span only [0, 65535], so _bucket_sorted's uniform boundaries
    over WIDE_PAIR_SPACE=2^20 put EVERY row in partition 0 (one giant
    block, zero sort parallelism).  Pin that band-row buckets now spread
    across many uniform partitions of the wide space — for minhash, simhash
    AND the RHP embedding bands."""
    import numpy as np
    import pyarrow as pa

    from web_content_extraction_benchmark_ray.stages.dedup import (
        WIDE_PAIR_SPACE,
        minhash_band_rows,
        simhash_band_rows,
        simhash_rows,
    )

    docs = pa.table(
        {
            "doc_id": pa.array(list(range(64)), pa.int64()),
            "text": pa.array(
                [f"alpha beta gamma delta {i} epsilon zeta" for i in range(64)]
            ),
        }
    )
    partitions = 16

    def occupied(buckets):
        b = np.asarray(buckets, dtype=np.int64)
        return len(set(b * partitions // WIDE_PAIR_SPACE))

    mh = minhash_band_rows(docs, num_buckets=WIDE_PAIR_SPACE)
    assert occupied(mh.column("bucket").to_pylist()) > partitions // 2

    sh = simhash_band_rows(simhash_rows(docs), num_buckets=WIDE_PAIR_SPACE)
    assert occupied(sh.column("bucket").to_pylist()) > partitions // 2
