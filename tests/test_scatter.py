"""Scatter-figure surface (reference complexity.py:236-340): the
per-doc frames agree with their verified kin (cluster_alignment /
complexity_classify / feature_project), and the SVG figures are
deterministic."""
from __future__ import annotations

import hashlib

SF = "/root/testdata/sf0.001"


def test_scatter_clusters_consistent_with_alignment(ray_session):
    from web_content_extraction_benchmark_ray.pipelines.classify import (
        cluster_alignment,
    )
    from web_content_extraction_benchmark_ray.pipelines.project import (
        feature_project,
    )
    from web_content_extraction_benchmark_ray.pipelines.scatter import (
        scatter_clusters,
    )

    df = scatter_clusters(SF).to_pandas().sort_values("doc_id")
    align = cluster_alignment(SF).to_pandas().iloc[0]
    # the aligned per-doc labels agree with the verified agreement rate
    agree = (df["cluster"] == df["label"]).sum()
    assert agree == max(int(align["match"]),
                        int(align["n"]) - int(align["match"]))
    assert len(df) == int(align["n"])
    # the 2-D coords ARE feature_project's hash-verified projection
    fp = feature_project(SF).to_pandas().sort_values("doc_id")
    assert (df["p1"].to_numpy() == fp["p1"].to_numpy()).all()
    assert (df["p2"].to_numpy() == fp["p2"].to_numpy()).all()


def test_scatter_classes_consistent_with_classifier(ray_session):
    from web_content_extraction_benchmark_ray.pipelines.classify import (
        complexity_classify,
    )
    from web_content_extraction_benchmark_ray.pipelines.scatter import (
        scatter_classes,
    )

    df = scatter_classes(SF).to_pandas()
    cm = complexity_classify(SF).to_pandas().set_index("split")
    # per-doc predictions reduce to the verified confusion totals
    tp = int(((df["pred"] == 1) & (df["label"] == 1)).sum())
    fp = int(((df["pred"] == 1) & (df["label"] == 0)).sum())
    assert tp == int(cm["tp"].sum())
    assert fp == int(cm["fp"].sum())
    assert len(df) == int(cm["n"].sum())


def test_complexity_by_dataset_monotone(ray_session):
    from web_content_extraction_benchmark_ray.pipelines.scatter import (
        complexity_by_dataset,
    )

    q = complexity_by_dataset(SF).to_pandas()
    assert set(q["q"]) == {0.05, 0.25, 0.5, 0.75, 0.95}
    for _, g in q.groupby("dataset"):
        v = g.sort_values("q")["value"].to_numpy()
        assert (v[:-1] <= v[1:]).all()
        assert 0.0 <= v[0] and v[-1] <= 1.0


def test_complexity_figures_deterministic(ray_session, tmp_path):
    from web_content_extraction_benchmark_ray.pipelines.scatter import (
        write_complexity_figures,
    )

    w1 = write_complexity_figures(SF, str(tmp_path / "a"), max_points=200)
    w2 = write_complexity_figures(SF, str(tmp_path / "b"), max_points=200)
    for key in ("complexity_clusters_2d.svg", "complexity_classes_2d.svg",
                "complexity_datasets.svg", "complexity_clusters_2d.csv"):
        assert key in w1, key
        h1 = hashlib.md5(open(w1[key], "rb").read()).hexdigest()
        h2 = hashlib.md5(open(w2[key], "rb").read()).hexdigest()
        assert h1 == h2, key
    svg = open(w1["complexity_clusters_2d.svg"]).read()
    assert "k-Means Clustering" in svg and "Complexity Quantiles" in svg
    assert svg.count("<circle") > 100  # points + legend dots
    dsvg = open(w1["complexity_datasets.svg"]).read()
    assert "Page Complexity" in dsvg
