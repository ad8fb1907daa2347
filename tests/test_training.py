"""M4: distributed leaf-classifier training (pipelines/training.py)."""
import numpy as np

SF = "/root/testdata/sf0.001"


def test_leaf_examples_match_real_segmentation_structure(ray_session):
    from web_content_extraction_benchmark_ray.pipelines.training import (
        leaf_examples,
    )
    from web_content_extraction_benchmark_ray.sources import pagegen as pg

    df = leaf_examples(SF).to_pandas()
    one = df[df["doc_id"] == df["doc_id"].iloc[0]].sort_values("block_id")
    # head: linked h1 heading + 5 nav links; tail: 3 aside + reply + footer
    assert one.iloc[0]["hq"] == 1_000_000 and one.iloc[0]["label"] == 0
    assert (one.iloc[1:6]["lq"] == 1_000_000).all()
    mains = one[one["label"] == 1]
    # main paragraphs: capped word fraction exactly 1.0, zero links
    assert (mains["wq"] == 1_000_000).all()
    assert (mains["lq"] == 0).all()
    assert len(one) == len(mains) + 11
    assert len(mains) >= 1 and pg.CHUNK_WORDS == 12


def test_leafmodel_train_learns_the_boundary(ray_session):
    from web_content_extraction_benchmark_ray.pipelines.training import (
        SCALE,
        THRESH,
        leafmodel_train,
    )

    t = leafmodel_train(SF).to_pandas().sort_values("d")
    w = t["w"].to_numpy()
    assert (t["accuracy"] == 1.0).all()
    # learned semantics: big word count pulls toward main, links pull away
    assert w[0] > 0 and w[1] < 0
    # a main-like block (full words, no links) scores above threshold,
    # a nav-like block (1 word, pure link) below
    main_x = np.array([SCALE, 0, 0, SCALE])
    nav_x = np.array([31250, SCALE, 0, SCALE])
    assert main_x @ w >= THRESH
    assert nav_x @ w < THRESH
