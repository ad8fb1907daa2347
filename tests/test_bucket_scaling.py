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
