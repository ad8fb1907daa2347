"""feature_project: integer-exact distributed 2-component PCA
(pipelines/project.py)."""
import numpy as np

SF = "/root/testdata/sf0.001"


def test_power_components_match_float_eigendecomposition(ray_session):
    from web_content_extraction_benchmark_ray.pipelines.classify import (
        clf_examples,
    )
    from web_content_extraction_benchmark_ray.pipelines.project import (
        _power_components,
        _scatter_matrix,
    )

    M = _scatter_matrix(clf_examples(SF))
    # symmetric positive-semidefinite by construction
    Mf = np.array(M, dtype=np.float64)
    assert np.allclose(Mf, Mf.T)
    v1, v2 = _power_components(M)
    a1 = np.array(v1, dtype=np.float64)
    a2 = np.array(v2, dtype=np.float64)
    w, V = np.linalg.eigh(Mf)
    top = V[:, ::-1][:, :2]
    align1 = abs(a1 @ top[:, 0]) / np.linalg.norm(a1)
    align2 = abs(a2 @ top[:, 1]) / np.linalg.norm(a2)
    assert align1 > 0.999
    assert align2 > 0.999
    cos12 = a1 @ a2 / (np.linalg.norm(a1) * np.linalg.norm(a2))
    assert abs(cos12) < 1e-3


def test_feature_project_output(ray_session):
    from web_content_extraction_benchmark_ray.pipelines.project import (
        feature_project,
    )

    df = feature_project(SF).to_pandas()
    assert set(df.columns) == {"doc_id", "p1", "p2"}
    assert df["doc_id"].is_unique
    # both axes carry real variance (non-degenerate projection)
    assert df["p1"].nunique() > 10
    assert df["p2"].nunique() > 10
