"""Self-contained dataset profiling report (ydata-profiling parity).

The reference's EDA notebook generates ``your_report.html`` with
ydata_profiling (``notebooks/0.eda.ipynb`` cells 13-15): per-column
distributions, quantiles, correlations and missing-value analysis. This
module produces the same analysis as ONE dependency-free HTML file (inline
SVG charts, light+dark via CSS custom properties, native hover tooltips):

- overview: rows, columns, missing cells, duplicate rows, memory, sampling;
- per-variable: dtype, distinct, missing; numerics get mean/std/min/max,
  quantiles (1/5/25/50/75/95/99%), zero/negative counts and a 24-bin
  histogram; categoricals/strings get a top-15 frequency chart and length
  stats; every chart sits next to its numbers table (no color-only reading);
- missing values: per-column missing bar matrix;
- correlations: Pearson + Spearman over numeric columns, diverging-colored
  matrix (blue <-> red around a neutral midpoint);
- sample: the first rows.

Statistics that stream cheaply (row count, per-column missing/distinct) are
EXACT; distribution shapes and correlations come from a documented uniform
sample when the frame exceeds ``sample_rows`` (the report header states the
sample size and seed).
"""
from __future__ import annotations

import html as _html
import io

import numpy as np
import pandas as pd

# Palette (single source for both modes; dark steps are selected, not
# auto-flipped). Single-series charts use the blue categorical slot; the
# correlation matrix uses the diverging blue<->red pair around neutral gray.
_PAL = {
    "light": dict(surface="#fcfcfb", panel="#f4f3f0", text="#0b0b0b",
                  text2="#52514e", grid="#d8d7d2", bar="#2a78d6",
                  pos="#2a78d6", neg="#e34948", mid="#f0efec"),
    "dark": dict(surface="#1a1a19", panel="#232321", text="#ffffff",
                 text2="#c3c2b7", grid="#44433f", bar="#3987e5",
                 pos="#3987e5", neg="#e66767", mid="#383835"),
}

_NUM_QUANTILES = (0.01, 0.05, 0.25, 0.50, 0.75, 0.95, 0.99)


def _esc(x) -> str:
    return _html.escape(str(x))


def _fmt(v) -> str:
    if isinstance(v, float):
        if v != v:  # nan
            return "—"
        if abs(v) >= 1e5 or (0 < abs(v) < 1e-3):
            return f"{v:.4g}"
        return f"{v:,.4g}" if abs(v) >= 1 else f"{v:.4f}"
    if isinstance(v, (int, np.integer)):
        return f"{v:,}"
    return _esc(v)


def _mix(c1: str, c2: str, t: float) -> str:
    a = np.array([int(c1[i : i + 2], 16) for i in (1, 3, 5)], float)
    b = np.array([int(c2[i : i + 2], 16) for i in (1, 3, 5)], float)
    m = np.clip(a + (b - a) * t, 0, 255).astype(int)
    return "#%02x%02x%02x" % tuple(m)


def _svg_bars(counts, labels, width=420, height=120) -> str:
    """Horizontal-axis bar chart: thin bars, 2px gaps, rounded data ends,
    native hover tooltips (<title>), grid-free (counts live in the titles
    and the adjacent table)."""
    n = len(counts)
    if n == 0 or max(counts) == 0:
        return "<svg class='chart' width='420' height='24'></svg>"
    # More bars than the fixed viewBox can hold (2px bars + 2px gaps ->
    # ~105) would silently clip off the right edge; aggregate adjacent
    # bins instead (e.g. a 10-year monthly datetime histogram).
    max_bars = 96
    if n > max_bars:
        k = -(-n // max_bars)
        counts = [sum(counts[i : i + k]) for i in range(0, n, k)]
        labels = [
            f"{labels[i]} … {labels[min(i + k, n) - 1]}"
            for i in range(0, n, k)
        ]
        n = len(counts)
    peak = max(counts)
    gap = 2
    bw = max(2, (width - gap * (n - 1)) // n)
    parts = [
        f"<svg class='chart' role='img' width='{width}' height='{height}' "
        f"viewBox='0 0 {width} {height}'>"
    ]
    for i, (c, lab) in enumerate(zip(counts, labels)):
        h = 0 if peak == 0 else max(1 if c else 0, round((height - 18) * c / peak))
        x = i * (bw + gap)
        y = height - 14 - h
        parts.append(
            f"<rect x='{x}' y='{y}' width='{bw}' height='{h}' rx='2' "
            f"fill='var(--bar)'><title>{_esc(lab)}: {c:,}</title></rect>"
        )
    # Baseline + extent labels in text ink (never the series color).
    parts.append(
        f"<line x1='0' y1='{height - 13.5}' x2='{width}' y2='{height - 13.5}' "
        f"stroke='var(--grid)' stroke-width='1'/>"
    )
    parts.append(
        f"<text x='0' y='{height - 2}' class='tick'>{_esc(labels[0])}</text>"
        f"<text x='{width}' y='{height - 2}' text-anchor='end' class='tick'>"
        f"{_esc(labels[-1])}</text></svg>"
    )
    return "".join(parts)


def _stat_table(pairs) -> str:
    rows = "".join(
        f"<tr><td>{_esc(k)}</td><td class='num'>{_fmt(v)}</td></tr>"
        for k, v in pairs
    )
    return f"<table class='kv'>{rows}</table>"


def _profile_numeric(s: pd.Series) -> dict:
    v = s.dropna().to_numpy()
    d: dict = {"kind": "numeric"}
    if len(v) == 0:
        d["stats"] = [("count", 0)]
        d["hist"] = ([], [])
        return d
    v = v.astype(np.float64)
    qs = np.quantile(v, _NUM_QUANTILES)
    d["stats"] = (
        [("mean", float(v.mean())), ("std", float(v.std())),
         ("min", float(v.min())), ("max", float(v.max()))]
        + [(f"q{int(q * 100)}", float(x)) for q, x in zip(_NUM_QUANTILES, qs)]
        + [("zeros", int((v == 0).sum())), ("negative", int((v < 0).sum()))]
    )
    # 24-bin histogram; long-tailed columns (the event logs' degree-like
    # ids/prices) still show shape because extreme outliers land in the
    # edge bins rather than flattening everything: clip BOTH tails (q1/q99 —
    # one corrupt sentinel low value must not stretch the range either).
    hi = qs[-1] if qs[-1] > qs[0] else v.max()
    lo = qs[0] if qs[-1] > qs[0] else v.min()
    # Degenerate range: constant columns, or columns whose spread is below
    # one float64 ulp at their magnitude (e.g. 19-digit Kaggle category_id
    # values) — a binned histogram is meaningless; one bar carries it.
    if not (np.isfinite(lo) and np.isfinite(hi)) or (hi - lo) <= 0 or (
        (hi - lo) < 32 * np.spacing(max(abs(lo), abs(hi)))
    ):
        d["hist"] = ([int(len(v))], [f"{lo:.6g}"])
        return d
    counts, edges = np.histogram(np.clip(v, lo, hi), bins=24)
    labels = [f"[{edges[i]:.4g}, {edges[i + 1]:.4g})" for i in range(len(counts))]
    d["hist"] = (counts.tolist(), labels)
    return d


def _profile_categorical(s: pd.Series) -> dict:
    vc = s.astype("string").value_counts(dropna=True)
    top = vc.head(15)
    lens = s.astype("string").str.len().dropna()
    other = int(vc.iloc[15:].sum()) if len(vc) > 15 else 0
    counts = top.tolist() + ([other] if other else [])
    labels = [str(x) for x in top.index] + (["(other)"] if other else [])
    return {
        "kind": "categorical",
        "stats": [
            ("top", str(vc.index[0]) if len(vc) else "—"),
            ("top freq", int(vc.iloc[0]) if len(vc) else 0),
            ("mean length", float(lens.mean()) if len(lens) else float("nan")),
            ("max length", int(lens.max()) if len(lens) else 0),
        ],
        "hist": (counts, labels),
    }


def _profile_datetime(s: pd.Series) -> dict:
    v = pd.to_datetime(s, errors="coerce", format="mixed", utc=True).dropna()
    d: dict = {"kind": "datetime"}
    if len(v) == 0:
        d["stats"] = [("count", 0)]
        d["hist"] = ([], [])
        return d
    d["stats"] = [("first", str(v.min())), ("last", str(v.max()))]
    per = v.dt.to_period("M").astype(str)
    vc = per.value_counts().sort_index()
    d["hist"] = (vc.tolist(), [str(x) for x in vc.index])
    return d


def profile_frame(df: pd.DataFrame, sample_rows: int = 1_000_000,
                  seed: int = 0) -> dict:
    """Compute the profile structure (exact overview; sampled shapes)."""
    n_rows, n_cols = df.shape
    exact_missing = {c: int(df[c].isna().sum()) for c in df.columns}
    exact_distinct = {c: int(df[c].nunique(dropna=True)) for c in df.columns}
    sampled = n_rows > sample_rows
    sdf = (
        df.sample(n=sample_rows, random_state=seed) if sampled else df
    )

    variables = {}
    for c in df.columns:
        s = sdf[c]
        name = str(s.dtype)
        if pd.api.types.is_datetime64_any_dtype(s) or (
            s.dtype == object and "time" in c.lower()
        ):
            prof = _profile_datetime(s)
        elif pd.api.types.is_numeric_dtype(s):
            prof = _profile_numeric(s)
        else:
            prof = _profile_categorical(s)
        prof["dtype"] = name
        prof["missing"] = exact_missing[c]
        prof["missing_pct"] = 100.0 * exact_missing[c] / max(n_rows, 1)
        prof["distinct"] = exact_distinct[c]
        variables[c] = prof

    num_cols = [c for c in df.columns if pd.api.types.is_numeric_dtype(df[c])]
    corr = {}
    if len(num_cols) >= 2:
        sub = sdf[num_cols].astype(np.float64)
        corr = {
            "columns": num_cols,
            "pearson": sub.corr(method="pearson").round(4).values.tolist(),
            "spearman": sub.corr(method="spearman").round(4).values.tolist(),
        }

    total_cells = n_rows * max(n_cols, 1)
    buf = io.StringIO()
    df.head(10).to_html(buf, border=0, index=False, max_cols=30)
    return {
        "overview": {
            "rows": n_rows,
            "columns": n_cols,
            "missing_cells": int(sum(exact_missing.values())),
            "missing_pct": 100.0 * sum(exact_missing.values()) / max(total_cells, 1),
            "duplicate_rows": int(sdf.duplicated().sum()),
            "memory_bytes": int(df.memory_usage(deep=False).sum()),
            "sampled": sampled,
            "sample_rows": int(len(sdf)),
            "sample_seed": seed,
        },
        "variables": variables,
        "correlations": corr,
        "sample_html": buf.getvalue(),
    }


def _corr_matrix_html(names, matrix) -> str:
    head = "<tr><th></th>" + "".join(f"<th>{_esc(c)}</th>" for c in names) + "</tr>"
    body = []
    for c, row in zip(names, matrix):
        cells = []
        for v in row:
            if v != v:
                cells.append("<td class='num'>—</td>")
                continue
            pole = "var(--pos)" if v >= 0 else "var(--neg)"
            # Diverging fill strength from the neutral midpoint; ink stays a
            # text token and every cell prints its value (no color-only read).
            pct = int(round(abs(v) * 100))
            cells.append(
                f"<td class='num corr' style='background:color-mix(in srgb, "
                f"{pole} {pct}%, var(--mid))'>{v:+.2f}</td>"
            )
        body.append(f"<tr><th>{_esc(c)}</th>{''.join(cells)}</tr>")
    return f"<table class='corr-m'>{head}{''.join(body)}</table>"


def render_html(profile: dict, title: str = "Dataset profile",
                headline: dict | None = None) -> str:
    """Render the profile structure as one self-contained HTML document."""
    ov = profile["overview"]
    p_l, p_d = _PAL["light"], _PAL["dark"]

    sections = []
    # --- overview ---
    note = (
        f"Distribution shapes and correlations computed on a uniform sample "
        f"of {ov['sample_rows']:,} rows (seed {ov['sample_seed']}); counts, "
        f"missing and distinct are exact."
        if ov["sampled"]
        else "Computed on the full frame (no sampling)."
    )
    sections.append(
        "<section id='overview'><h2>Overview</h2>"
        + _stat_table(
            [("rows", ov["rows"]), ("columns", ov["columns"]),
             ("missing cells", ov["missing_cells"]),
             ("missing %", round(ov["missing_pct"], 4)),
             ("duplicate rows (sample)", ov["duplicate_rows"]),
             ("memory", f"{ov['memory_bytes'] / 1e6:,.1f} MB")]
        )
        + f"<p class='note'>{note}</p></section>"
    )
    if headline:
        sections.append(
            "<section id='headline'><h2>Headline statistics</h2>"
            + _stat_table(sorted(headline.items()))
            + "</section>"
        )

    # --- variables ---
    var_parts = ["<section id='variables'><h2>Variables</h2>"]
    for name, v in profile["variables"].items():
        counts, labels = v["hist"]
        chart = _svg_bars(counts, labels) if counts else ""
        var_parts.append(
            f"<div class='var'><h3>{_esc(name)} "
            f"<span class='kind'>{_esc(v['kind'])} · {_esc(v['dtype'])}</span></h3>"
            f"<div class='row'><div>"
            + _stat_table(
                [("distinct", v["distinct"]), ("missing", v["missing"]),
                 ("missing %", round(v["missing_pct"], 4))] + v["stats"]
            )
            + f"</div><div>{chart}</div></div></div>"
        )
    var_parts.append("</section>")
    sections.append("".join(var_parts))

    # --- missing values ---
    miss = {c: v["missing_pct"] for c, v in profile["variables"].items()}
    mrows = []
    for c, pct in miss.items():
        w = round(pct * 3)
        mrows.append(
            f"<tr><th>{_esc(c)}</th><td><svg class='chart' width='320' "
            f"height='14'><rect x='0' y='2' width='{max(w, 1 if pct else 0)}' "
            f"height='10' rx='2' fill='var(--bar)'>"
            f"<title>{pct:.3f}% missing</title></rect></svg></td>"
            f"<td class='num'>{pct:.3f}%</td></tr>"
        )
    sections.append(
        "<section id='missing'><h2>Missing values</h2>"
        f"<table class='kv'>{''.join(mrows)}</table></section>"
    )

    # --- correlations ---
    corr = profile["correlations"]
    if corr:
        sections.append(
            "<section id='correlations'><h2>Correlations</h2>"
            "<h3>Pearson</h3>"
            + _corr_matrix_html(corr["columns"], corr["pearson"])
            + "<h3>Spearman</h3>"
            + _corr_matrix_html(corr["columns"], corr["spearman"])
            + "</section>"
        )
    else:
        sections.append(
            "<section id='correlations'><h2>Correlations</h2>"
            "<p class='note'>Fewer than two numeric columns.</p></section>"
        )

    # --- sample ---
    sections.append(
        "<section id='sample'><h2>Sample (first 10 rows)</h2>"
        f"<div class='sample'>{profile['sample_html']}</div></section>"
    )

    css = f"""
.viz-root {{ color-scheme: light;
  --surface: {p_l['surface']}; --panel: {p_l['panel']};
  --text: {p_l['text']}; --text2: {p_l['text2']}; --grid: {p_l['grid']};
  --bar: {p_l['bar']}; --pos: {p_l['pos']}; --neg: {p_l['neg']};
  --mid: {p_l['mid']}; }}
@media (prefers-color-scheme: dark) {{
  :root:where(:not([data-theme="light"])) .viz-root {{ color-scheme: dark;
    --surface: {p_d['surface']}; --panel: {p_d['panel']};
    --text: {p_d['text']}; --text2: {p_d['text2']}; --grid: {p_d['grid']};
    --bar: {p_d['bar']}; --pos: {p_d['pos']}; --neg: {p_d['neg']};
    --mid: {p_d['mid']}; }} }}
:root[data-theme="dark"] .viz-root {{ color-scheme: dark;
  --surface: {p_d['surface']}; --panel: {p_d['panel']};
  --text: {p_d['text']}; --text2: {p_d['text2']}; --grid: {p_d['grid']};
  --bar: {p_d['bar']}; --pos: {p_d['pos']}; --neg: {p_d['neg']};
  --mid: {p_d['mid']}; }}
body.viz-root {{ background: var(--surface); color: var(--text);
  font: 14px/1.5 system-ui, sans-serif; margin: 2em auto; max-width: 980px;
  padding: 0 1em; }}
h1, h2, h3 {{ color: var(--text); }}
.kind, .note, .tick {{ color: var(--text2); font-size: 12px;
  font-weight: normal; fill: var(--text2); }}
section {{ margin-bottom: 2.2em; }}
.var {{ background: var(--panel); border-radius: 8px; padding: 10px 14px;
  margin: 10px 0; }}
.row {{ display: flex; gap: 24px; flex-wrap: wrap; align-items: flex-start; }}
table {{ border-collapse: collapse; }}
td, th {{ padding: 2px 10px; text-align: left; border-bottom: 1px solid
  var(--grid); font-weight: normal; }}
th {{ color: var(--text2); }}
.num {{ text-align: right; font-variant-numeric: tabular-nums; }}
.corr-m td.corr {{ color: var(--text); min-width: 52px; }}
.sample {{ overflow-x: auto; }}
.sample table {{ font-size: 12px; }}
.chart rect:hover {{ opacity: 0.85; }}
"""
    body = "".join(sections)
    return (
        "<!doctype html><html><head><meta charset='utf-8'>"
        f"<title>{_esc(title)}</title><style>{css}</style></head>"
        f"<body class='viz-root'><h1>{_esc(title)}</h1>{body}</body></html>"
    )


def profile_report(df: pd.DataFrame, title: str = "Dataset profile",
                   headline: dict | None = None,
                   sample_rows: int = 1_000_000, seed: int = 0) -> str:
    """One-call profile: compute + render. Reference artifact being matched:
    ``your_report.html`` (ydata_profiling, eda notebook cells 13-15)."""
    return render_html(
        profile_frame(df, sample_rows=sample_rows, seed=seed),
        title=title,
        headline=headline,
    )
