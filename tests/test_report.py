"""Report sink (S16 analogue): every rendered value must equal the
hash-verified aggregation outputs verbatim — the report is a view, never
a recomputation."""
from __future__ import annotations

import pandas as pd

SF = "/root/testdata/sf0.001"


def test_report_matches_aggregates(ray_session, tmp_path):
    from web_content_extraction_benchmark_ray.pipelines.evalpipe import (
        agg_scores_by_dataset,
        agg_scores_micro,
    )
    from web_content_extraction_benchmark_ray.pipelines.queries import (
        _scores_ds,
    )
    from web_content_extraction_benchmark_ray.pipelines.report import (
        score_report,
        write_report,
    )

    tables = score_report(SF)
    per_ds = agg_scores_by_dataset(_scores_ds(SF)).to_pandas()
    micro = agg_scores_micro(_scores_ds(SF)).to_pandas()

    m = tables["score_matrix"].set_index("model")
    assert len(m) == micro["model"].nunique()
    for _, r in per_ds.iterrows():
        assert m.loc[r["model"], f"mean_score_{r['dataset']}"] == r["mean_score"]
        assert (
            m.loc[r["model"], f"median_score_{r['dataset']}"]
            == r["median_score"]
        )
    for _, r in micro.iterrows():
        assert m.loc[r["model"], "micro_mean"] == r["mean_score"]
        assert m.loc[r["model"], "micro_median"] == r["median_score"]

    # ranking is micro median desc
    rank = tables["model_ranking"]
    assert list(rank["median_score"]) == sorted(
        rank["median_score"], reverse=True
    )

    written = write_report(SF, str(tmp_path))
    back = pd.read_csv(written["score_matrix"])
    pd.testing.assert_frame_equal(back, tables["score_matrix"])
    md = open(written["report_md"]).read()
    assert "# Extraction score report" in md
    assert "| model |" in md


def test_report_figures_and_styled_tables(ray_session, tmp_path):
    """S16 tail: deterministic SVG figures + LaTeX/HTML styled tables
    (per-column bold maxima), rendered twice -> byte-identical."""
    import hashlib
    import os

    from web_content_extraction_benchmark_ray.pipelines.report import (
        figure_stats,
        score_report,
        write_report,
    )

    w1 = write_report(SF, str(tmp_path / "a"))
    w2 = write_report(SF, str(tmp_path / "b"))
    for key in ("rouge_box.svg", "rouge_bar.svg", "score_matrix.tex",
                "model_ranking.tex", "score_matrix.html",
                "model_ranking.html"):
        assert key in w1, key
        h1 = hashlib.md5(open(w1[key], "rb").read()).hexdigest()
        h2 = hashlib.md5(open(w2[key], "rb").read()).hexdigest()
        assert h1 == h2, key

    # figure order is median desc and the SVG names every model
    stats = figure_stats(score_report(SF))
    meds = [s["median"] for s in stats]
    assert meds == sorted(meds, reverse=True)
    svg = open(w1["rouge_box.svg"]).read()
    for s in stats:
        assert s["model"] in svg
    assert svg.count("<rect") == len(stats) + 1  # one box per model + bg

    # LaTeX bolds exactly one max per numeric column (ties aside)
    tex = open(w1["model_ranking.tex"]).read()
    assert r"\bfseries" in tex and r"\toprule" in tex
    html = open(w1["score_matrix.html"]).read()
    assert 'style="font-weight: bold"' in html
