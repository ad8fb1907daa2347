"""Aggregate reporting sinks — the engine's analogue of the reference's
``wceb eval aggregate`` styled score tables and performance plot
(``/root/reference/src/extraction_benchmark/eval.py:201-239, 303-327``,
``plt.py:16-32``: XLSX/LaTeX score matrices + a PDF plot of models ranked
by median score).

This sandbox has no openpyxl/matplotlib — the report surface is CSV (one
file per table, machine-readable), a human-readable markdown file,
styled LaTeX/HTML tables, deterministic SVG figures, and a real .xlsx
workbook written by the from-scratch OOXML sink (sources/xlsx.py), all
rendered driver-side from the ALREADY-AGGREGATED datasets (A1-A5 are
tiny: models × datasets rows).  Every value is taken verbatim from the
same aggregation pipelines the driver hash-verifies (eval_agg_*), so the
report can never drift from the verified numbers (pinned by
tests/test_report.py).

Tables:
- score_matrix:   rows = model; per-dataset mean/median columns + micro
                  mean/median + macro mean (the reference's main table).
- model_ranking:  models sorted by micro median, desc — the performance
                  plot's ordering as a table.
- quantile_bars:  per-model q25/q75 (the reference's error bars).
- banded_matrix:  per-(model, dataset) mean inside the global [q25, q75]
                  complexity band (the complexity-sliced table).
"""
from __future__ import annotations

import os

import pandas as pd


def _agg_tables(sf_dir: str, scorer: str = "rouge",
                scores_path: str | None = None) -> dict[str, pd.DataFrame]:
    """``scores_path``: an existing scores-parquet dir (e.g. the one the
    CLI just wrote, covering the user's --models selection).  Without it
    the cached default-model pipeline is scored (pipelines/queries.py)."""
    from .analytics import eval_agg_by_complexity
    from .evalpipe import (
        agg_quantiles,
        agg_scores_by_dataset,
        agg_scores_macro,
        agg_scores_micro,
        score_histograms,
    )
    from .queries import _scores_ds

    if scores_path is not None:
        import ray.data

        scores = ray.data.read_parquet(scores_path)
        banded_scores = scores
    else:
        scores = _scores_ds(sf_dir)
        banded_scores = None
    per_ds = agg_scores_by_dataset(scores, scorer).to_pandas()
    micro = agg_scores_micro(scores, scorer).to_pandas()
    macro = agg_scores_macro(scores, scorer)
    # five exact quantiles: q25/q75 are the reference's error bars; the
    # p05/median/p95 additions feed the box/bar figure (svgplot.py)
    quant = agg_quantiles(
        scores, scorer, qs=(0.05, 0.25, 0.5, 0.75, 0.95)
    ).to_pandas()
    banded = eval_agg_by_complexity(sf_dir, scores=banded_scores).to_pandas()
    hist = score_histograms(scores, scorer).to_pandas()
    return {
        "per_dataset": per_ds,
        "micro": micro,
        "macro": macro,
        "quantiles": quant,
        "banded": banded,
        "hist": hist,
    }


def score_report(sf_dir: str, scorer: str = "rouge",
                 scores_path: str | None = None) -> dict[str, pd.DataFrame]:
    """Render the report tables (all driver-side pandas on tiny inputs)."""
    t = _agg_tables(sf_dir, scorer, scores_path=scores_path)

    # main matrix: one row per model, (mean|median)_<dataset> columns
    wide = t["per_dataset"].pivot(
        index="model", columns="dataset", values=["mean_score", "median_score"]
    )
    wide.columns = [f"{v}_{d}" for v, d in wide.columns]
    wide = wide.reset_index()
    micro = t["micro"].rename(
        columns={"mean_score": "micro_mean", "median_score": "micro_median"}
    )[["model", "micro_mean", "micro_median"]]
    macro = t["macro"].rename(columns={"macro_mean": "macro_mean"})
    matrix = wide.merge(micro, on="model").merge(macro, on="model")
    matrix = matrix.sort_values("model").reset_index(drop=True)

    ranking = (
        t["micro"]
        .sort_values(["median_score", "model"], ascending=[False, True])[
            ["model", "median_score", "mean_score", "n"]
        ]
        .reset_index(drop=True)
    )
    banded = (
        t["banded"].sort_values(["model", "dataset"]).reset_index(drop=True)
    )
    quant = t["quantiles"].sort_values(["model", "q"]).reset_index(drop=True)
    hist = t["hist"].sort_values(["model", "bin"]).reset_index(drop=True)
    return {
        "score_matrix": matrix,
        "model_ranking": ranking,
        "quantile_bars": quant,
        "banded_matrix": banded,
        "score_hist": hist,
    }


def _md_table(df: pd.DataFrame, float_fmt: str = "{:.6f}") -> str:
    """Minimal GitHub-markdown table renderer (no tabulate dependency)."""

    def cell(v):
        if isinstance(v, float):
            return float_fmt.format(v)
        return str(v)

    cols = list(df.columns)
    lines = [
        "| " + " | ".join(cols) + " |",
        "|" + "|".join(["---"] * len(cols)) + "|",
    ]
    for _, row in df.iterrows():
        lines.append("| " + " | ".join(cell(row[c]) for c in cols) + " |")
    return "\n".join(lines)


def render_markdown(tables: dict[str, pd.DataFrame], sf_dir: str,
                    scorer: str = "rouge") -> str:
    titles = {
        "score_matrix": "Score matrix (per-dataset mean/median + micro/macro)",
        "model_ranking": "Models ranked by micro median (performance plot order)",
        "quantile_bars": "Per-model quartiles (error bars)",
        "banded_matrix": "Mean score inside the global [q25, q75] complexity band",
        "score_hist": "Per-model score histogram (25 equal bins over [0, 1])",
    }
    parts = [f"# Extraction score report\n\nscorer: `{scorer}` · corpus: `{sf_dir}`\n"]
    for name, df in tables.items():
        parts.append(f"## {titles.get(name, name)}\n")
        parts.append(_md_table(df))
        parts.append("")
    return "\n".join(parts)


def figure_stats(tables: dict[str, pd.DataFrame]) -> list[dict]:
    """Per-model quantile records for the performance figures, ranked by
    median desc (the reference's _sort_vectors order, eval.py:196-198)."""
    q = tables["quantile_bars"].pivot(index="model", columns="q",
                                      values="value")
    recs = []
    for model, row in q.iterrows():
        recs.append(
            {
                "model": model,
                "p05": float(row[0.05]),
                "q25": float(row[0.25]),
                "median": float(row[0.5]),
                "q75": float(row[0.75]),
                "p95": float(row[0.95]),
            }
        )
    return sorted(recs, key=lambda r: (-r["median"], r["model"]))


def histogram_panels(tables: dict[str, pd.DataFrame],
                     bins: int = 25) -> list[dict]:
    """Per-model {model, counts[bins], median} records for the histogram
    grid, ranked by median desc (the reference's model order in
    _plot_score_histograms, eval.py:304)."""
    hist = tables["score_hist"]
    medians = {s["model"]: s["median"] for s in figure_stats(tables)}
    panels = []
    for model, g in hist.groupby("model"):
        counts = [0] * bins
        for _, r in g.iterrows():
            counts[int(r["bin"])] = int(r["n"])
        panels.append(
            {
                "model": model,
                "counts": counts,
                "median": float(medians.get(model, 0.0)),
            }
        )
    return sorted(panels, key=lambda p: (-p["median"], p["model"]))


def _latex_escape(s: str) -> str:
    return str(s).replace("_", r"\_")


def _bold_max_mask(df: pd.DataFrame) -> pd.DataFrame:
    """True where a cell holds its numeric column's max — the reference's
    highlight_max / per-dataset bold styling (eval.py:203-208, 231-239)."""
    import numpy as np

    mask = pd.DataFrame(False, index=df.index, columns=df.columns)
    for c in df.columns:
        if pd.api.types.is_numeric_dtype(df[c]) and c not in ("n",):
            col = df[c].to_numpy(dtype=np.float64)
            if len(col):
                mask[c] = col >= np.nanmax(col)
    return mask


def render_latex_table(df: pd.DataFrame, caption: str) -> str:
    """Booktabs-style LaTeX with \\bfseries on each column's max,
    precision 3 — the analogue of the reference's styler.to_latex with
    highlight_max(props='bf:') (eval.py:231-239)."""
    mask = _bold_max_mask(df)

    def cell(v, bold):
        s = f"{v:.3f}" if isinstance(v, float) else _latex_escape(v)
        return rf"\bfseries {s}" if bold else s

    cols = list(df.columns)
    lines = [
        r"\begin{table}",
        rf"\caption{{{_latex_escape(caption)}}}",
        r"\begin{tabular}{l" + "r" * (len(cols) - 1) + "}",
        r"\toprule",
        " & ".join(_latex_escape(c) for c in cols) + r" \\",
        r"\midrule",
    ]
    for i in range(len(df)):
        lines.append(
            " & ".join(
                cell(df.iloc[i][c], bool(mask.iloc[i][c])) for c in cols
            )
            + r" \\"
        )
    lines += [r"\bottomrule", r"\end{tabular}", r"\end{table}", ""]
    return "\n".join(lines)


def render_html_table(df: pd.DataFrame, caption: str) -> str:
    """Styled HTML (font-weight: bold on column maxima, precision 3) —
    the spreadsheet-styling analogue: this sandbox has no openpyxl, and
    a styled HTML table opens in any spreadsheet app with the styling
    intact (the reference's styler.to_excel, eval.py:209-230)."""
    mask = _bold_max_mask(df)

    def cell(v, bold):
        s = f"{v:.3f}" if isinstance(v, float) else str(v)
        style = ' style="font-weight: bold"' if bold else ""
        return f"<td{style}>{s}</td>"

    cols = list(df.columns)
    rows = [
        "<table>",
        f"<caption>{caption}</caption>",
        "<tr>" + "".join(f"<th>{c}</th>" for c in cols) + "</tr>",
    ]
    for i in range(len(df)):
        rows.append(
            "<tr>"
            + "".join(cell(df.iloc[i][c], bool(mask.iloc[i][c])) for c in cols)
            + "</tr>"
        )
    rows.append("</table>")
    return "\n".join(rows)


def write_report(sf_dir: str, out_dir: str, scorer: str = "rouge",
                 formats=("csv", "md", "svg", "tex", "html", "xlsx"),
                 scores_path: str | None = None) -> dict[str, str]:
    """Write the report files; returns {artifact: path}.

    Artifacts beyond CSV/markdown close the reference's S16 surface:
    the ranked-model performance figures as deterministic SVG
    (svgplot.py — the reference's eval.py:179-193 PDF plots) and the
    styled score tables as LaTeX + HTML with per-column bold maxima
    (the reference's styler.to_latex / to_excel, eval.py:201-239)."""
    tables = score_report(sf_dir, scorer, scores_path=scores_path)
    os.makedirs(out_dir, exist_ok=True)
    written: dict[str, str] = {}

    def emit(name: str, content: str) -> None:
        p = os.path.join(out_dir, name)
        with open(p, "w") as f:
            f.write(content)
        written[name] = p

    if "csv" in formats:
        for name, df in tables.items():
            p = os.path.join(out_dir, f"{name}.csv")
            df.to_csv(p, index=False)
            written[name] = p
    if "md" in formats:
        emit("report.md", render_markdown(tables, sf_dir, scorer))
        written["report_md"] = written.pop("report.md")
    if "svg" in formats:
        from .svgplot import (
            performance_bar_svg,
            performance_box_svg,
            score_histograms_svg,
        )

        stats = figure_stats(tables)
        ylabel = "ROUGE-LSum F1" if scorer == "rouge" else "Levenshtein sim."
        emit(
            f"{scorer}_box.svg",
            performance_box_svg(stats, f"Models ranked by median ({scorer})",
                                ylabel),
        )
        emit(
            f"{scorer}_bar.svg",
            performance_bar_svg(stats, f"Models ranked by median ({scorer})",
                                ylabel),
        )
        # the reference's per-model score-distribution panel
        # (eval.py:303-327 _plot_score_histograms)
        emit(
            f"{scorer}_hist.svg",
            score_histograms_svg(
                histogram_panels(tables), f"Score distribution ({scorer})"
            ),
        )
    if "tex" in formats:
        emit(
            "score_matrix.tex",
            render_latex_table(tables["score_matrix"],
                               f"Score matrix ({scorer})"),
        )
        emit(
            "model_ranking.tex",
            render_latex_table(tables["model_ranking"],
                               f"Models ranked by micro median ({scorer})"),
        )
    if "html" in formats:
        emit(
            "score_matrix.html",
            render_html_table(tables["score_matrix"],
                              f"Score matrix ({scorer})"),
        )
        emit(
            "model_ranking.html",
            render_html_table(tables["model_ranking"],
                              f"Models ranked by micro median ({scorer})"),
        )
    if "xlsx" in formats:
        # the reference's styler.to_excel (eval.py:209-230): one workbook,
        # bold on each column's max, written by the from-scratch OOXML
        # sink (sources/xlsx.py — no openpyxl in this environment)
        from ..sources.xlsx import write_xlsx

        p = os.path.join(out_dir, f"{scorer}_scores.xlsx")
        write_xlsx(
            p,
            {
                "score_matrix": tables["score_matrix"],
                "model_ranking": tables["model_ranking"],
            },
            bold_masks={
                "score_matrix": _bold_max_mask(tables["score_matrix"]),
                "model_ranking": _bold_max_mask(tables["model_ranking"]),
            },
        )
        written[f"{scorer}_scores.xlsx"] = p
    return written
