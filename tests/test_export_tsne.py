"""S13 file fan-out sink (sources/export.py) and M3 t-SNE
(pipelines/tsne.py)."""
import os

import numpy as np

SF = "/root/testdata/sf0.001"


def test_export_doc_files_roundtrip(ray_session, tmp_path):
    import ray.data

    from web_content_extraction_benchmark_ray.sources.export import (
        export_doc_files,
    )
    from web_content_extraction_benchmark_ray.sources.storage import (
        read_table,
    )

    ds = read_table(
        f"{SF}/documents.parquet", columns=["doc_id", "text", "lang"]
    ).limit(40)
    out = str(tmp_path / "html")
    manifest = export_doc_files(
        ds, out, subdir_col="lang", suffix=".html"
    ).to_pandas()
    assert len(manifest) == 40
    src = ds.to_pandas().set_index("doc_id")
    for _, row in manifest.iterrows():
        assert os.path.exists(row["path"])
        with open(row["path"], encoding="utf-8") as f:
            body = f.read()
        assert body == src.loc[int(row["doc_id"]), "text"]
        assert row["n_bytes"] == len(body.encode("utf-8"))
        # per-subdir layout like the reference's combined/html/<ds>/
        assert os.path.basename(os.path.dirname(row["path"])) == src.loc[
            int(row["doc_id"]), "lang"
        ]


def test_tsne_deterministic_and_neighborhood_preserving(ray_session):
    from web_content_extraction_benchmark_ray.pipelines.tsne import (
        tsne_project,
    )

    a = tsne_project(SF, max_n=120).to_pandas()
    b = tsne_project(SF, max_n=120).to_pandas()
    assert (a["t1"] == b["t1"]).all() and (a["t2"] == b["t2"]).all()
    assert a["doc_id"].is_unique and len(a) == 120
    y = a[["t1", "t2"]].to_numpy()
    assert np.isfinite(y).all()
    # embedding carries structure: 10-NN overlap between feature space and
    # embedding space must beat the random baseline (~10/119) by a wide
    # margin
    from web_content_extraction_benchmark_ray.pipelines.classify import (
        SCALE,
        clf_examples,
    )
    from web_content_extraction_benchmark_ray.pipelines.project import (
        N_FEATS,
    )

    head = clf_examples(SF).sort("doc_id").limit(120).to_pandas()
    x = np.array(head["xq"].tolist(), dtype=np.float64)[:, :N_FEATS] / SCALE
    dx = np.square(x[:, None] - x[None, :]).sum(-1)
    dy = np.square(y[:, None] - y[None, :]).sum(-1)
    np.fill_diagonal(dx, np.inf)
    np.fill_diagonal(dy, np.inf)
    k = 10
    nx = np.argsort(dx, axis=1)[:, :k]
    ny = np.argsort(dy, axis=1)[:, :k]
    overlap = np.mean(
        [len(set(nx[i]) & set(ny[i])) / k for i in range(len(x))]
    )
    assert overlap > 0.3, overlap
