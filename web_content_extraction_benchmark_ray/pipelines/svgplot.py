"""Pure-Python SVG renderer for the performance figures.

The reference draws its ranked-model performance figures with matplotlib
(``/root/reference/src/extraction_benchmark/eval.py:151-193``: per-model
score BOXplots and median BARs with quantile error bars, models on x,
score on y with gridlines at 0/0.25/0.5/0.75/1.0, rotated tick labels;
``plt.py:16-32``: colors).  matplotlib is not in this sandbox — and the
figure the paper needs is simple enough that a deterministic hand-rolled
SVG is the better engineering anyway: byte-identical output for
identical inputs (the determinism test hashes it), no font/dpi
environment sensitivity, and it renders in any browser.

Analogue fidelity notes:
- box: q25..q75 box, median line (the reference's orange), whiskers at
  p05/p95.  matplotlib's default whisker is "last datum inside 1.5 IQR"
  — data-dependent in a way that needs a second distributed pass, so
  this analogue fixes the whisker definition to exact quantiles (same
  quantile_cont interpolation the driver hash-verifies).
- bar: median bar + q25/q75 error bars (the reference's bar variant).
- model order: ranked by median desc — the reference sorts its vectors
  the same way (eval.py:196-198 _sort_vectors).
"""
from __future__ import annotations

MEDIAN_COLOR = "#e68a38"  # reference plt.py MEDIAN_BAR_COLOR
BAR_COLOR = "#6caeda"  # first color of the reference's prop cycle
ERROR_COLOR = "#4d4d4d"  # reference plt.py ERROR_BAR_COLOR
GRID_COLOR = "#d3d3d3"

# fixed geometry (px) — analogous to the reference's 9.5 x 3.3 in figure
W, H = 950, 330
ML, MR, MT, MB = 60, 20, 30, 90  # margins; bottom fits rotated labels
Y_LO, Y_HI = -0.1, 1.1


def _f(v: float) -> str:
    return f"{v:.2f}"


def _y(v: float) -> float:
    """Score -> px (y grows downward)."""
    span = Y_HI - Y_LO
    return MT + (Y_HI - v) / span * (H - MT - MB)


def _xs(n: int) -> list[float]:
    """Center x of each of n model slots."""
    span = W - ML - MR
    return [ML + span * (i + 0.5) / n for i in range(n)]


def _frame(title: str, ylabel: str, labels: list[str]) -> list[str]:
    parts = [
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{W}" height="{H}" '
        f'viewBox="0 0 {W} {H}" font-family="sans-serif" font-size="12">',
        f'<rect width="{W}" height="{H}" fill="white"/>',
        f'<text x="{W / 2:.0f}" y="18" text-anchor="middle" '
        f'font-size="14">{title}</text>',
        f'<text x="14" y="{(MT + H - MB) / 2:.0f}" text-anchor="middle" '
        f'transform="rotate(-90 14 {(MT + H - MB) / 2:.0f})">{ylabel}</text>',
    ]
    for g in (0.0, 0.25, 0.5, 0.75, 1.0):
        y = _y(g)
        parts.append(
            f'<line x1="{ML}" y1="{_f(y)}" x2="{W - MR}" y2="{_f(y)}" '
            f'stroke="{GRID_COLOR}" stroke-width="0.5"/>'
        )
        parts.append(
            f'<text x="{ML - 6}" y="{_f(y + 4)}" '
            f'text-anchor="end">{g:g}</text>'
        )
    for x, lab in zip(_xs(len(labels)), labels):
        yb = H - MB + 14
        parts.append(
            f'<text x="{_f(x)}" y="{yb}" text-anchor="end" '
            f'transform="rotate(-45 {_f(x)} {yb})">{lab}</text>'
        )
    return parts


def performance_box_svg(stats: list[dict], title: str, ylabel: str) -> str:
    """``stats``: [{model, p05, q25, median, q75, p95}, ...] in display
    order (rank by median desc upstream)."""
    labels = [s["model"] for s in stats]
    parts = _frame(title, ylabel, labels)
    n = len(stats)
    half = min(28.0, (W - ML - MR) / max(1, n) * 0.3)
    for x, s in zip(_xs(n), stats):
        lo, q1, med, q3, hi = (
            s["p05"], s["q25"], s["median"], s["q75"], s["p95"],
        )
        # whisker stem + caps
        for a, b in ((hi, q3), (q1, lo)):
            parts.append(
                f'<line x1="{_f(x)}" y1="{_f(_y(a))}" x2="{_f(x)}" '
                f'y2="{_f(_y(b))}" stroke="black" stroke-width="1"/>'
            )
        for v in (lo, hi):
            parts.append(
                f'<line x1="{_f(x - half / 2)}" y1="{_f(_y(v))}" '
                f'x2="{_f(x + half / 2)}" y2="{_f(_y(v))}" '
                f'stroke="black" stroke-width="1"/>'
            )
        parts.append(
            f'<rect x="{_f(x - half)}" y="{_f(_y(q3))}" '
            f'width="{_f(2 * half)}" height="{_f(_y(q1) - _y(q3))}" '
            f'fill="white" stroke="black" stroke-width="1"/>'
        )
        parts.append(
            f'<line x1="{_f(x - half)}" y1="{_f(_y(med))}" '
            f'x2="{_f(x + half)}" y2="{_f(_y(med))}" '
            f'stroke="{MEDIAN_COLOR}" stroke-width="2"/>'
        )
    parts.append("</svg>")
    return "\n".join(parts)


SCATTER_COLORS = (BAR_COLOR, MEDIAN_COLOR)  # class 0 / class 1


def scatter_pair_svg(panels: list[dict], w: int = 480, h: int = 240) -> str:
    """Two-panel 2-D scatter — the analogue of the reference's 1x2
    ``_plot_scatter_axis`` figures (complexity.py:236-253, 269-273,
    295-299): points colored by a binary label, legend lower-right,
    panel title on top, left/bottom spines only, no tick labels.

    ``panels``: [{title, labels: [name0, name1], points: [(x, y, lab)]}]
    (normally 2 entries).  Deterministic byte output."""
    n = len(panels)
    pw = w // max(n, 1)
    ml, mr, mt, mb = 14, 10, 24, 14
    parts = [
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{w}" height="{h}" '
        f'viewBox="0 0 {w} {h}" font-family="sans-serif" font-size="10">',
        f'<rect width="{w}" height="{h}" fill="white"/>',
    ]
    for idx, p in enumerate(panels):
        x0, y0 = idx * pw + ml, mt
        iw, ih = pw - ml - mr, h - mt - mb
        pts = p["points"]
        xs = [q[0] for q in pts] or [0.0]
        ys = [q[1] for q in pts] or [0.0]
        xlo, xhi = min(xs), max(xs)
        ylo, yhi = min(ys), max(ys)
        xspan = (xhi - xlo) or 1.0
        yspan = (yhi - ylo) or 1.0

        def sx(v, x0=x0, iw=iw, xlo=xlo, xspan=xspan):
            return x0 + 4 + (v - xlo) / xspan * (iw - 8)

        def sy(v, y0=y0, ih=ih, ylo=ylo, yspan=yspan):
            return y0 + ih - 4 - (v - ylo) / yspan * (ih - 8)

        parts.append(
            f'<text x="{x0 + iw / 2:.0f}" y="{mt - 8}" '
            f'text-anchor="middle" font-size="11">{p["title"]}</text>'
        )
        # left + bottom spines (reference hides top/right)
        parts.append(
            f'<line x1="{x0}" y1="{y0}" x2="{x0}" y2="{y0 + ih}" '
            f'stroke="black" stroke-width="1"/>'
        )
        parts.append(
            f'<line x1="{x0}" y1="{y0 + ih}" x2="{x0 + iw}" '
            f'y2="{y0 + ih}" stroke="black" stroke-width="1"/>'
        )
        for x, y, lab in pts:
            c = SCATTER_COLORS[int(lab) % len(SCATTER_COLORS)]
            parts.append(
                f'<circle cx="{_f(sx(x))}" cy="{_f(sy(y))}" r="2" '
                f'fill="{c}" fill-opacity="0.75"/>'
            )
        # legend, lower right
        for li, name in enumerate(p["labels"]):
            ly = y0 + ih - 10 - (len(p["labels"]) - 1 - li) * 13
            lx = x0 + iw - 64
            parts.append(
                f'<circle cx="{lx}" cy="{ly - 3}" r="3" '
                f'fill="{SCATTER_COLORS[li % len(SCATTER_COLORS)]}"/>'
            )
            parts.append(
                f'<text x="{lx + 7}" y="{ly}">{name}</text>'
            )
    parts.append("</svg>")
    return "\n".join(parts)


def score_histograms_svg(panels: list[dict], title: str,
                         bins: int = 25) -> str:
    """Small-multiples score-distribution grid — the analogue of the
    reference's ``_plot_score_histograms`` (eval.py:303-327): 4 columns,
    one 25-bin histogram per model with a median vline in the reference's
    orange, model name as the y-label, x ticks at 0/0.5/1, shared y scale
    (matplotlib ``sharey=True``), models ranked by median desc upstream.

    ``panels``: [{model, counts: list[bins], median: float}, ...] in
    display order.  Deterministic byte output for identical inputs."""
    cols = 4
    n = len(panels)
    rows = (n + cols - 1) // cols
    pw, ph = 190, 150  # panel cell size (~2in x 2in at 96dpi, minus pads)
    ml, mb, mt, mr = 26, 26, 10, 8  # in-panel margins
    width = cols * pw
    height = rows * ph + 28  # + suptitle band
    ymax = max(
        (max(p["counts"]) for p in panels if p["counts"]), default=1
    ) or 1
    parts = [
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{width}" '
        f'height="{height}" viewBox="0 0 {width} {height}" '
        f'font-family="sans-serif" font-size="11">',
        f'<rect width="{width}" height="{height}" fill="white"/>',
        f'<text x="{width / 2:.0f}" y="18" text-anchor="middle" '
        f'font-size="14">{title}</text>',
    ]
    for idx, p in enumerate(panels):
        x0 = (idx % cols) * pw + ml
        y0 = (idx // cols) * ph + 28 + mt
        iw, ih = pw - ml - mr, ph - mt - mb
        # axes frame (reference hides top/right spines; sharey hides
        # y tick labels — the model name is the y label)
        parts.append(
            f'<line x1="{x0}" y1="{y0 + ih}" x2="{x0 + iw}" '
            f'y2="{y0 + ih}" stroke="black" stroke-width="1"/>'
        )
        parts.append(
            f'<line x1="{x0}" y1="{y0}" x2="{x0}" y2="{y0 + ih}" '
            f'stroke="black" stroke-width="1"/>'
        )
        yl = y0 + ih / 2
        parts.append(
            f'<text x="{x0 - 14}" y="{_f(yl)}" text-anchor="middle" '
            f'transform="rotate(-90 {x0 - 14} {_f(yl)})">{p["model"]}</text>'
        )
        for tick, lab in ((0.0, "0"), (0.5, "0.5"), (1.0, "1")):
            tx = x0 + tick * iw
            parts.append(
                f'<line x1="{_f(tx)}" y1="{y0 + ih}" x2="{_f(tx)}" '
                f'y2="{y0 + ih + 3}" stroke="black" stroke-width="1"/>'
            )
            parts.append(
                f'<text x="{_f(tx)}" y="{y0 + ih + 14}" '
                f'text-anchor="middle">{lab}</text>'
            )
        bw = iw / bins
        for b, cnt in enumerate(p["counts"]):
            if cnt <= 0:
                continue
            bh = ih * (cnt / ymax)
            parts.append(
                f'<rect x="{_f(x0 + b * bw)}" y="{_f(y0 + ih - bh)}" '
                f'width="{_f(bw)}" height="{_f(bh)}" fill="{BAR_COLOR}"/>'
            )
        mx = x0 + min(max(p["median"], 0.0), 1.0) * iw
        parts.append(
            f'<line x1="{_f(mx)}" y1="{_f(y0)}" x2="{_f(mx)}" '
            f'y2="{_f(y0 + ih)}" stroke="{MEDIAN_COLOR}" stroke-width="1"/>'
        )
    parts.append("</svg>")
    return "\n".join(parts)


def performance_bar_svg(stats: list[dict], title: str, ylabel: str) -> str:
    """Median bars with q25/q75 error bars (same stats records)."""
    labels = [s["model"] for s in stats]
    parts = _frame(title, ylabel, labels)
    n = len(stats)
    half = min(32.0, (W - ML - MR) / max(1, n) * 0.35)
    for x, s in zip(_xs(n), stats):
        med, q1, q3 = s["median"], s["q25"], s["q75"]
        parts.append(
            f'<rect x="{_f(x - half)}" y="{_f(_y(med))}" '
            f'width="{_f(2 * half)}" height="{_f(_y(0.0) - _y(med))}" '
            f'fill="{BAR_COLOR}"/>'
        )
        parts.append(
            f'<line x1="{_f(x)}" y1="{_f(_y(q1))}" x2="{_f(x)}" '
            f'y2="{_f(_y(q3))}" stroke="{ERROR_COLOR}" stroke-width="1"/>'
        )
        for v in (q1, q3):
            parts.append(
                f'<line x1="{_f(x - 4)}" y1="{_f(_y(v))}" '
                f'x2="{_f(x + 4)}" y2="{_f(_y(v))}" '
                f'stroke="{ERROR_COLOR}" stroke-width="1"/>'
            )
    parts.append("</svg>")
    return "\n".join(parts)
