"""S8 report-graph layer: the reference's 7 statistics PNGs.

Reference parity (Common/helper.py:83-141 make_graph,
Common/cdr_statistics.py:144-161 daily_cdr_by_call_type,
:317-329 user_data_histogram, :534-583/:586-633/:637-690/:693-727/
:728-769 the five daily line graphs; golden PNGs in
Statistics/output_graphs/). The reference fetches each query into the
Python driver and plots with matplotlib; here the SERIES come from
the already-oracle-checked statistics frames (one collect of a tiny
daily aggregate each) and rendering is pluggable:

- matplotlib when importable (line/bar, labels, descriptor header —
  the reference's exact layout intent);
- otherwise a built-in minimal PNG rasterizer (stdlib zlib/struct +
  numpy polyline/bar drawing, real spec-conformant RGB PNGs) so the
  report layer works in this environment too.

Series content — not pixels — is the tested contract
(tests/test_reports.py asserts series equality against the
reference's golden CSV values from Sample_Inputs).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .operators import statistics

# (name, ylabel, title) for the five single-series daily line graphs —
# filenames match Statistics/output_graphs/*.png
_LINE_GRAPHS = {
    "daily_cdrs": ("Total Records", "Daily CDRs"),
    "daily_unique_users": ("Total Users", "Daily Unique Users"),
    "daily_unique_locations": ("Total Locations", "Daily Unique Locations"),
    "daily_avg_cdr": ("Total Daily Average CDRs", "Daily Average CDRs"),
    "daily_unique_avg_locations": (
        "Total Unique Locations", "Daily Average Unique Locations"
    ),
}


def _norm(cdr: DataFrame) -> DataFrame:
    """Accept either the engine's (lat, lon double) or the reference's
    all-string (latitude, longitude) canonical naming."""
    if "lat" not in cdr.columns and "latitude" in cdr.columns:
        cdr = cdr.withColumn(
            "lat", F.expr("try_cast(latitude AS double)")
        ).withColumn("lon", F.expr("try_cast(longitude AS double)"))
    return cdr


def _xy(rows, xcol, ycol):
    rows = sorted(rows, key=lambda r: str(r[xcol]))
    return [str(r[xcol]) for r in rows], [float(r[ycol]) for r in rows]


def graph_series(cdr: DataFrame) -> dict[str, dict]:
    """All 7 graph series + descriptor stats, one dict per PNG.

    Each entry: {"xs": [...], "series": {label: [ys...]}, "kind":
    "line"|"bar", "ylabel": ..., "title": ..., "des": {...}}.
    """
    cdr = _norm(cdr)
    out: dict[str, dict] = {}

    def _pairs(*specs):
        # (text, text_x, value) -> the reference's des_pair dicts
        # (helper.py:83-141); text_y is 1.27 at every call site.
        return [
            {"text": t, "text_x": x, "text_y": 1.27, "value": v}
            for t, x, v in specs
        ]

    daily = statistics.daily_cdrs(cdr).collect()
    xs, ys = _xy(daily, "day", "total_records")
    out["daily_cdrs"] = {
        "xs": xs,
        "series": {"ALL": ys},
        "xlabel": "Day",  # cdr_statistics.py:575 — the one 'Day' axis
        "des": {
            "MIN": min(ys), "MAX": max(ys),
            "AVG": sum(ys) / len(ys), "Total Records": sum(ys),
        },
        "des_pairs": _pairs(
            ("MIN", 0.090, min(ys)),
            ("MAX", 0.345, max(ys)),
            ("AVG", 0.595, sum(ys) / len(ys)),
            ("Total Records", 0.83, sum(ys)),
        ),
    }

    total_uids = float(
        statistics.total_unique_uids(cdr).collect()[0]["total_unique_uids"]
    )
    uu = statistics.daily_unique_uids(cdr).collect()
    xs, ys = _xy(uu, "day", "total_uids")
    out["daily_unique_users"] = {
        "xs": xs,
        "series": {"ALL": ys},
        "des": {"MIN": min(ys), "MAX": max(ys), "AVG": sum(ys) / len(ys)},
        "des_pairs": _pairs(
            ("MIN", 0.090, min(ys)),
            ("MAX", 0.345, max(ys)),
            ("AVG", 0.595, sum(ys) / len(ys)),
            ("Total Unique IDs", 0.805, total_uids),
        ),
    }

    total_locs = float(
        statistics.total_unique_locations(cdr)
        .collect()[0]["count_unique_locations"]
    )
    ul = statistics.daily_unique_locations(cdr).collect()
    xs, ys = _xy(ul, "day", "unique_locations")
    out["daily_unique_locations"] = {
        "xs": xs,
        "series": {"ALL": ys},
        "des": {"MIN": min(ys), "MAX": max(ys), "AVG": sum(ys) / len(ys)},
        "des_pairs": _pairs(
            ("MIN", 0.090, min(ys)),
            ("MAX", 0.345, max(ys)),
            ("AVG", 0.595, sum(ys) / len(ys)),
            ("Total Unique Locations", 0.805, total_locs),
        ),
    }

    av = statistics.daily_average_cdrs(cdr).collect()
    xs, ys = _xy(av, "day", "avg_cdrs_per_uid")
    out["daily_avg_cdr"] = {
        "xs": xs,
        "series": {"ALL": ys},
        "des": {"MIN": min(ys), "MAX": max(ys), "AVG": sum(ys) / len(ys)},
        "des_pairs": _pairs(
            ("Total Daily Avg CDRs", 0.035, sum(ys) / len(ys)),
        ),
    }

    al = statistics.daily_average_unique_locations(cdr).collect()
    xs, ys = _xy(al, "date", "daily_avg_locations")
    cell_ys = [float(r["daily_avg_cell_ids"]) for r in al]
    out["daily_unique_avg_locations"] = {
        "xs": xs,
        "series": {"ALL": ys},
        "des": {"MIN": min(ys), "MAX": max(ys), "AVG": sum(ys) / len(ys)},
        # cdr_statistics.py:764-767 — cell-id average first; the
        # trailing space in the first text is the reference's own
        "des_pairs": _pairs(
            ("Avg Daily Unique Cell IDs ", 0.00,
             sum(cell_ys) / len(cell_ys)),
            ("Avg Daily Unique Locations", 0.28, sum(ys) / len(ys)),
        ),
    }

    # multi-series: one line per call_type plus the ALL grain
    # (the reference hardcodes {ALL, DATA, VOICE/SMS}; generic here)
    bt = statistics.daily_cdrs_by_call_type(cdr).collect()
    days = sorted({str(r["date"]) for r in bt})
    types = sorted({r["call_type"] for r in bt})
    by_key = {(str(r["date"]), r["call_type"]): float(r["total_records"]) for r in bt}
    out["daily_cdr_by_call_type"] = {
        "xs": days,
        "series": {t: [by_key.get((d, t), 0.0) for d in days] for t in types},
        "des": {},
        # cdr_statistics.py:144-161: this graph keeps the default
        # header band (top=0.95) and carries the 3-entry legend
        "top": 0.95,
        "title": "Daily CDR by call type",
    }

    hist = statistics.user_activity_histogram_adaptive(cdr).collect()
    out["user_data_histogram"] = {
        "xs": [f"{r.bin_center:g}" for r in hist],
        "series": {"users": [float(r.num_users) for r in hist]},
        "kind": "bar",
        "des": {},
        # cdr_statistics.py:324-329: untitled bar chart, left=0.15
        "xlabel": "Active Day Bins",
        "left": 0.15,
        "untitled": True,
    }

    for name, g in out.items():
        ylabel, title = _LINE_GRAPHS.get(
            name,
            (
                "Total Records"
                if name == "daily_cdr_by_call_type"
                else "Count No. Unique Ids",
                name,
            ),
        )
        g.setdefault("kind", "line")
        g.setdefault("ylabel", ylabel)
        g.setdefault("title", title)
        g.setdefault("xlabel", "Date")
    return out


def _plot_series(g: dict) -> list[tuple[str, list[float]]]:
    """Series in the reference's plot order. For the by-call-type
    graph the reference draws exactly three lines — ALL, DATA, and
    VOICE+SMS combined (cdr_statistics.py:136-159) — so when the type
    set maps onto that vocabulary, fold it; otherwise plot the generic
    per-type series sorted by label."""
    s = g["series"]
    if "ALL" in s and set(s) <= {"ALL", "DATA", "VOICE", "SMS"} and len(s) > 1:
        n = len(g["xs"])
        zero = [0.0] * n
        voice, sms = s.get("VOICE", zero), s.get("SMS", zero)
        return [
            ("ALL", s["ALL"]),
            ("DATA", s.get("DATA", zero)),
            ("VOICE and SMS", [v + m for v, m in zip(voice, sms)]),
        ]
    return sorted(s.items())


# ---------------------------------------------------------------------------
# renderers


def write_png(path: str, rgb: np.ndarray) -> None:
    """Write an RGB uint8 (h, w, 3) array as a spec-conformant PNG
    (8-bit truecolor, filter 0) with stdlib zlib/struct only."""
    h, w, _ = rgb.shape
    raw = b"".join(b"\x00" + rgb[y].tobytes() for y in range(h))

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    with open(path, "wb") as f:
        f.write(
            b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw, 6))
            + chunk(b"IEND", b"")
        )


_PALETTE = [(31, 119, 180), (255, 127, 14), (44, 160, 44), (214, 39, 40),
            (148, 103, 189), (140, 86, 75)]


def _render_builtin(g: dict, path: str, w: int = 700, h: int = 500) -> None:
    """Fallback rasterizer: axes + grid + polylines/bars on a white
    canvas. No text (no font tables in stdlib) — labels live in the
    matplotlib renderer; the series geometry is identical."""
    ml, mr, mt, mb = 60, 20, 20, 40  # margins
    img = np.full((h, w, 3), 255, dtype=np.uint8)
    img[mt : h - mb, ml] = 0  # y axis
    img[h - mb, ml : w - mr] = 0  # x axis
    all_ys = [y for ys in g["series"].values() for y in ys]
    lo, hi = min(all_ys + [0.0]), max(all_ys + [1.0])
    span = (hi - lo) or 1.0
    n = max(len(g["xs"]), 1)

    def px(i: int) -> int:
        return ml + 1 + int((w - ml - mr - 2) * (i + 0.5) / n)

    def py(v: float) -> int:
        return h - mb - 1 - int((h - mt - mb - 2) * (v - lo) / span)

    for gy in range(1, 5):  # horizontal gridlines
        yy = mt + (h - mt - mb) * gy // 5
        img[yy, ml + 1 : w - mr] = 230
    for si, (label, ys) in enumerate(_plot_series(g)):
        color = np.array(_PALETTE[si % len(_PALETTE)], dtype=np.uint8)
        if g["kind"] == "bar":
            bw = max((w - ml - mr) // (2 * n), 1)
            for i, v in enumerate(ys):
                img[py(v) : h - mb, px(i) - bw // 2 : px(i) + bw // 2 + 1] = color
        else:
            pts = [(px(i), py(v)) for i, v in enumerate(ys)]
            for (x0, y0), (x1, y1) in zip(pts, pts[1:]):
                steps = max(abs(x1 - x0), abs(y1 - y0), 1) + 1
                xs_l = np.linspace(x0, x1, steps).round().astype(int)
                ys_l = np.linspace(y0, y1, steps).round().astype(int)
                img[ys_l, xs_l] = color
            for x0, y0 in pts:
                img[max(y0 - 1, 0) : y0 + 2, max(x0 - 1, 0) : x0 + 2] = color
    write_png(path, img)


def _render_matplotlib(g: dict, path: str) -> None:
    """Mirror the reference's layouts call-for-call.

    - make_graph class (the five daily line graphs,
      Common/helper.py:83-141): figsize (14, 11), bold 21 pt title,
      subplots_adjust(top=0.75), grid, one unlabeled plot() per the
      default color cycle, 90-degree x ticks, per-call-site xlabel,
      then each des_pair as plt.text at its exact (text_x, 1.27) axes
      coordinate over a disabled TextBox on the 0.87 figure row at
      x = 0.1/0.3/0.5/0.7 in orange/blue/green/red, the value
      right-aligned by the reference's 60 - 2*len(value) space pad
      and label_pad=0.005 on the first box only.
    - daily_cdr_by_call_type (cdr_statistics.py:144-161): top=0.95,
      three lines in ALL / DATA / VOICE-and-SMS order, legend upper
      left with those exact labels.
    - user_data_histogram (cdr_statistics.py:324-329): untitled bar
      chart, align='center', subplots_adjust(left=0.15)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from matplotlib.widgets import TextBox

    fig = plt.figure(figsize=(14, 11))
    ax = fig.add_subplot(111)
    if not g.get("untitled"):
        plt.title(g["title"], fontdict={"fontsize": 21, "fontweight": "bold"})
    plt.subplots_adjust(top=g.get("top", 0.75))
    if "left" in g:
        plt.subplots_adjust(left=g["left"])
    if g["kind"] != "bar":
        plt.grid(True)
    series = _plot_series(g)
    for label, ys in series:
        if g["kind"] == "bar":
            plt.bar(g["xs"], ys, align="center")
        else:
            plt.plot(g["xs"], ys)
    plt.ylabel(g["ylabel"])
    plt.xticks(rotation=90)
    plt.xlabel(g["xlabel"])
    if len(series) > 1:
        plt.legend([label for label, _ in series], loc="upper left")
    colors = ["orange", "blue", "green", "red"]
    box_x = [0.1, 0.3, 0.5, 0.7]
    for i, pair in enumerate(g.get("des_pairs", [])[:4]):
        value = f"{pair['value']:,.2f}"
        plt.text(
            pair["text_x"], pair["text_y"], pair["text"],
            transform=ax.transAxes,
        )
        axbox = plt.axes([box_x[i], 0.87, 0.2, 0.04])
        pad = " " * max(0, 60 - 2 * len(value))
        kw = {"label_pad": 0.005} if i == 0 else {}
        tb = TextBox(axbox, "", initial=pad + value, color=colors[i], **kw)
        tb.disconnect_events()
    plt.savefig(path)
    plt.close(fig)


def write_report_graphs(cdr: DataFrame, out_dir: str) -> list[str]:
    """Render all 7 reference graphs into ``out_dir``; returns the
    written paths (reference filenames)."""
    try:
        import matplotlib  # noqa: F401

        render = _render_matplotlib
    except ImportError:
        render = _render_builtin
    paths = []
    for name, g in graph_series(cdr).items():
        path = f"{out_dir}/{name}.png"
        render(g, path)
        paths.append(path)
    return paths
