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
    for key in ("rouge_box.svg", "rouge_bar.svg", "rouge_hist.svg",
                "score_matrix.tex", "model_ranking.tex", "score_matrix.html",
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

    # histogram figure: panels ranked by median desc, every model named,
    # the panel counts equal the hash-verified eval_score_histogram rows
    # and sum to the micro n per model
    from web_content_extraction_benchmark_ray.pipelines.report import (
        histogram_panels,
    )

    tables = score_report(SF)
    panels = histogram_panels(tables)
    p_meds = [p["median"] for p in panels]
    assert p_meds == sorted(p_meds, reverse=True)
    hsvg = open(w1["rouge_hist.svg"]).read()
    micro_n = tables["model_ranking"].set_index("model")["n"]
    for p in panels:
        assert p["model"] in hsvg
        assert sum(p["counts"]) == int(micro_n[p["model"]])
    # the median vline of a bte-like all-1.0 model sits in the last bin
    hist = tables["score_hist"]
    for p in panels:
        if p["median"] == 1.0:
            g = hist[hist["model"] == p["model"]]
            assert set(g["bin"]) == {24}

    # LaTeX bolds exactly one max per numeric column (ties aside)
    tex = open(w1["model_ranking.tex"]).read()
    assert r"\bfseries" in tex and r"\toprule" in tex
    html = open(w1["score_matrix.html"]).read()
    assert 'style="font-weight: bold"' in html


def test_xlsx_sink_roundtrip_and_determinism(tmp_path):
    """The from-scratch OOXML writer: parse the zip back with stdlib
    tools and recover every value and every bold (column-max) flag; two
    writes are byte-identical."""
    import zipfile
    import xml.etree.ElementTree as ET

    from web_content_extraction_benchmark_ray.pipelines.report import (
        _bold_max_mask,
    )
    from web_content_extraction_benchmark_ray.sources.xlsx import (
        col_letter,
        write_xlsx,
    )

    assert [col_letter(i) for i in (0, 25, 26, 51, 701, 702)] == [
        "A", "Z", "AA", "AZ", "ZZ", "AAA"
    ]

    df = pd.DataFrame(
        {
            "model": ["bte", "justext", "whole_text"],
            "mean": [0.91, 0.87, 0.5],
            "n": [10, 10, 10],
        }
    )
    p1, p2 = str(tmp_path / "a.xlsx"), str(tmp_path / "b.xlsx")
    masks = {"scores": _bold_max_mask(df)}
    write_xlsx(p1, {"scores": df}, bold_masks=masks)
    write_xlsx(p2, {"scores": df}, bold_masks=masks)
    assert open(p1, "rb").read() == open(p2, "rb").read()

    ns = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
    with zipfile.ZipFile(p1) as z:
        names = set(z.namelist())
        assert {
            "[Content_Types].xml", "_rels/.rels", "xl/workbook.xml",
            "xl/_rels/workbook.xml.rels", "xl/styles.xml",
            "xl/worksheets/sheet1.xml",
        } <= names
        sheet = ET.fromstring(z.read("xl/worksheets/sheet1.xml"))
        wb = ET.fromstring(z.read("xl/workbook.xml"))
    assert [s.get("name") for s in wb.iter(f"{ns}sheet")] == ["scores"]

    cells = {}
    for c in sheet.iter(f"{ns}c"):
        if c.get("t") == "inlineStr":
            val = c.find(f"{ns}is/{ns}t").text
        else:
            v = c.find(f"{ns}v")
            val = float(v.text) if v is not None else None
        cells[c.get("r")] = (val, c.get("s") == "1")
    # header row is bold; values round-trip; column maxima are bold
    assert cells["A1"] == ("model", True)
    assert cells["B2"] == (0.91, True)   # mean max
    assert cells["B3"] == (0.87, False)
    assert cells["C2"] == (10.0, False)  # 'n' excluded from highlighting
    assert cells["A2"] == ("bte", False)


def test_write_report_emits_xlsx(ray_session, tmp_path):
    from web_content_extraction_benchmark_ray.pipelines.report import (
        write_report,
    )

    written = write_report(SF, str(tmp_path), formats=("xlsx",))
    import zipfile

    assert zipfile.is_zipfile(written["rouge_scores.xlsx"])
