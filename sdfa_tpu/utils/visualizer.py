"""Matplotlib-based plotting utilities (S20).

Reference: saber/data/visualizer/easy_plot.py — the full surface: the
``plot_item`` per-cell descriptor with its draw modes (curve, (x, y) pair,
image with colorbar + index labels, RGB image, aligned-transcription strip,
labeled rectangles), the row/column grid allocator with per-cell colorbar
axes (easy_plot.py:357-417), value-range unification ("auto"/"same",
easy_plot.py:219-239), ``color_mapping`` (viridis → uint8 image),
figure→numpy conversion, and ``draw_figure`` save/convert.

Divergence, documented: the reference's aligned-transcription draw fn
(easy_plot.py:420-456) imports ``saber.data.forced_alignment.transcription
.Transcription`` — a module that does not exist anywhere in the reference
checkout, so that path raises ImportError upstream if ever invoked. Here
``Transcription``/``Word`` ship as self-contained lightweight carriers with
the duck-typed surface the draw fn needs (``transcript``, ``words[i].word/
.start/.end``), so the mode actually works.

Everything imports matplotlib lazily and forces the Agg backend — these run
headless (TB plot plugins, eval image tracks, dataset QA plots).
"""

from __future__ import annotations

import math
import os
from dataclasses import dataclass, field
from typing import List, Optional, Sequence, Union

import numpy as np

DEFAULT_CMAP = "viridis"
DEFAULT_FONT_SIZE = 12
_title_height = None


def _plt():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    return plt


# ---------------------------------------------------------------------------
# transcription carriers (duck-typed surface of the reference's missing
# forced_alignment.Transcription — word text + start/end seconds)


@dataclass
class Word:
    word: str
    start: float  # seconds
    end: float = 0.0


@dataclass
class Transcription:
    words: List[Word] = field(default_factory=list)

    @property
    def transcript(self) -> str:
        return " ".join(w.word for w in self.words)


# ---------------------------------------------------------------------------
# plot_item: one grid cell — data + range + draw mode (easy_plot.py:29-189)


def _get_title_height() -> float:
    """Title-line height in figure-size units (easy_plot.py:15-26)."""
    global _title_height
    if _title_height is None:
        plt = _plt()
        f = plt.figure(figsize=(1, 1))
        r = f.canvas.get_renderer()
        t = plt.text(0.0, 0.0, "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
                                "abcdefghijklmnopqrstuvwxyz")
        bb = t.get_tightbbox(renderer=r)
        _title_height = (bb.height * 1.4) / f.bbox.bounds[-1]
        plt.close(f)
    return _title_height


class plot_item(dict):
    """Cell descriptor: coerces data, records x/y extent + value range,
    binds a draw fn (default dispatches on the data shape + kwargs)."""

    def __init__(self, item, title: str = "", vmin=None, vmax=None,
                 draw_fn=None, cmap: str = DEFAULT_CMAP, **kwargs):
        x_length = y_length = 0
        if isinstance(item, (list, tuple)):
            # (x, y) curve pair
            item = [np.asarray(x) for x in item]
            assert len(item) == 2, "[plot_item]: (x, y) needs two arrays"
            for x in item:
                assert x.ndim == 1, "[plot_item]: given (x, y), both 1d."
            x_length = float(item[0].max() - item[0].min())
            y_length = 1
            vmin = float(item[1].min()) if vmin is None else vmin
            vmax = float(item[1].max()) if vmax is None else vmax
        else:
            item = np.asarray(item)
            if item.ndim == 1:
                x_length, y_length = len(item), 1
            elif 2 <= item.ndim <= 3:
                if item.ndim == 3:
                    if item.shape[0] in (1, 3, 4):  # CHW → HWC
                        item = item.transpose(1, 2, 0)
                    assert item.shape[2] in (1, 3, 4), (
                        f"invalid image shape of '{title}': {item.shape}")
                    if item.shape[2] == 1:  # gray → rgb
                        item = np.tile(item, (1, 1, 3))
                x_length, y_length = item.shape[1], item.shape[0]
            else:
                raise NotImplementedError(
                    f"[plot_item]: {item.ndim} dim is not supported")
            vmin = float(item.min()) if vmin is None else vmin
            vmax = float(item.max()) if vmax is None else vmax
        if draw_fn is None:
            draw_fn = plot_item._default_draw
        assert x_length > 0 and y_length > 0
        _check_draw_fn(draw_fn)
        title_lines = 0 if len(title) == 0 else len(title.split("\n"))
        super().__init__(item=item, title=title, title_lines=title_lines,
                         vmin=vmin, vmax=vmax, x_length=x_length,
                         y_length=y_length, draw_fn=draw_fn, cmap=cmap,
                         **kwargs)

    def __getattr__(self, attr):
        if attr in self:
            return self[attr]
        raise AttributeError(attr)

    def __setattr__(self, attr, value):
        # vmin/vmax get reassigned by set_value_range — keep dict + attr
        # views coherent (the reference relies on dict-subclass semantics)
        self[attr] = value

    def draw(self, ax, cax):
        ax.tick_params(labelsize=DEFAULT_FONT_SIZE * 0.8)
        cax.tick_params(labelsize=DEFAULT_FONT_SIZE * 0.8)
        self.draw_fn(self, ax, cax)

    @staticmethod
    def _default_draw(self, ax, cax):
        plt = _plt()
        if isinstance(self.item, (tuple, list)):  # (x, y) pair
            ax.set_title(self.title)
            ax.set_xlim(0, self.x_length)
            ax.set_ylim(self.vmin, self.vmax)
            ax.plot(self.item[0], self.item[1])
            cax.axis("off")
        elif self.item.ndim == 1:
            if (self.get("aligned_transcription") is not None
                    and (self.get("sample_rate") or self.get("sr"))):
                draw_fn_aligned_audio_transcription(self, ax, cax)
            elif self.get("labels") is not None and self.get("rectangle",
                                                             False):
                draw_fn_rectangles(self, ax, cax)
            else:
                ax.set_title(self.title)
                ax.set_xlim(0, self.x_length)
                if self.vmin != self.vmax:
                    ax.set_ylim(self.vmin, self.vmax)
                ax.plot(np.arange(0, self.x_length), self.item)
                cax.axis("off")
        elif self.item.ndim == 2:
            ax.set_title(self.title)
            im = ax.imshow(self.item, vmin=self.vmin, vmax=self.vmax,
                           cmap=self.cmap, aspect="auto")
            plt.colorbar(im, cax=cax)
            ax.invert_yaxis()
            if self.get("index_labels") is not None:
                _draw_index_labels(self, ax, self.get("index_labels"),
                                   ymin=0, ymax=self.item.shape[0])
        elif self.item.ndim == 3:
            ax.set_title(self.title)
            ax.imshow(self.item)
            ax.axis("off")
            cax.axis("off")


def _draw_index_labels(item: plot_item, ax, labels, ymin, ymax):
    """Vertical label ticks over an image (easy_plot.py:153-182): one line
    + staggered text per label change (or per index with each_index)."""
    import matplotlib.lines as mlines

    assert len(labels) == item.x_length, (
        f"data length is {item.x_length}, but {len(labels)} labels.")
    line_color = item.get("line_color", "black")
    text_color = item.get("text_color", "white")
    each_index = item.get("each_index", False)
    yheight = ymax - ymin
    yrange = [ymin, ymax]
    height_percent = 0.10
    ymin = ymin + height_percent * yheight / 10
    ymax = ymax - height_percent * yheight / 5
    y_pos = ymin
    last_word = ""
    todo_text = []
    for i, the_word in enumerate(labels):
        start = int(i)
        if (not each_index) and len(str(the_word)) and the_word == last_word:
            continue
        ax.add_line(mlines.Line2D([start, start], yrange, linewidth=1,
                                  linestyle="-", c=line_color, alpha=0.5))
        todo_text.append((start, y_pos, str(the_word)))
        y_pos += height_percent * yheight
        if y_pos > ymax:
            y_pos = ymin
        last_word = the_word
    for todo in todo_text:
        ax.text(*todo, fontsize=8, color=text_color)


def _check_draw_fn(draw_fn):
    import inspect

    assert callable(draw_fn), "given 'draw_fn' is not callable"
    params = [k for k in inspect.signature(draw_fn).parameters]
    assert params == ["self", "ax", "cax"], (
        f"draw_fn must take (self, ax, cax), got {params}")


def draw_fn_aligned_audio_transcription(self: plot_item, ax, cax):
    """1-D signal + word-aligned transcription strip: one dash-dot marker
    per word onset, staggered '(i) word' text (easy_plot.py:420-456)."""
    import matplotlib.lines as mlines

    assert self.item.ndim == 1, (
        f"given item should be 1dim signal, not {self.item.ndim}")
    sr = self.get("sample_rate", self.get("sr"))
    aligned = self.get("aligned_transcription")
    assert sr and aligned is not None
    # duck typing on purpose — anything with .transcript and .words works
    title = (aligned.transcript if len(self.title) == 0
             else f"{self.title}: {aligned.transcript}")
    ax.set_title(title)
    ax.set_xlim(0, len(self.item))
    ax.set_ylim(self.vmin, self.vmax)
    ax.plot(np.arange(0, len(self.item)), self.item)
    yrange = self.vmax - self.vmin
    height_percent = 0.15
    ymin = self.vmin + height_percent * yrange / 10
    ymax = self.vmax - height_percent * yrange / 5
    y_pos = ymin
    for i, the_word in enumerate(aligned.words):
        word = f"({i}) {the_word.word}"
        start = int(the_word.start * sr)
        ax.add_line(mlines.Line2D([start, start], [self.vmin, self.vmax],
                                  linewidth=1, linestyle="-.", c="g"))
        ax.text(start, y_pos, str(word))
        y_pos += height_percent * yrange
        if y_pos > ymax:
            y_pos = ymin
    cax.axis("off")


def draw_fn_rectangles(self: plot_item, ax, cax):
    """Labeled bar chart with value annotations (easy_plot.py:459-477)."""
    from matplotlib.patches import Rectangle

    labels = self.get("labels")
    assert self.item.ndim == 1 and labels is not None
    assert len(labels) == len(self.item)
    ax.set_title(self.title)
    ax.set_ylim((self.vmin, self.vmax))
    ax.set_xlim((-0.5, len(labels) - 0.5))
    ax.set_xticks(list(range(len(labels))))
    ax.set_xticklabels(labels)
    for i, val in enumerate(self.item):
        ax.add_patch(Rectangle((-0.4 + i, self.vmin), 0.8, val - self.vmin))
        ax.text(-0.3 + i, self.vmin, f"{val:.2f}", fontsize=8)
    cax.axis("off")


# ---------------------------------------------------------------------------
# grid layout (easy_plot.py:192-274 + 357-417)


class _GridLayout:
    """Rows of plot_items (a bare item is a 1-cell row); tracks max extents
    and unifies value ranges across cells."""

    def __init__(self, items: Sequence):
        rows = [list(r) if isinstance(r, (list, tuple)) else [r]
                for r in items]
        for row in rows:
            for it in row:
                assert type(it) is plot_item, (
                    f"given item {type(it)} is not 'plot_item'")
        cols = max(len(r) for r in rows)
        self._grid = [row + [None] * (cols - len(row)) for row in rows]
        self.max_xlen = max(it.x_length for r in self._grid for it in r if it)
        self.max_ylen = max(it.y_length for r in self._grid for it in r if it)

    def set_value_range(self, vmin, vmax, mode: str):
        assert mode in ("auto", "same")
        lo, hi = float("inf"), float("-inf")
        for it in self.items():
            if vmin is not None:
                it.vmin = vmin
            if vmax is not None:
                it.vmax = vmax
            lo, hi = min(lo, it.vmin), max(hi, it.vmax)
        if mode == "same":
            for it in self.items():
                it.vmin, it.vmax = lo, hi

    def items(self):
        return (it for row in self._grid for it in row if it is not None)

    @property
    def rows(self):
        return len(self._grid)

    @property
    def cols(self):
        return len(self._grid[0])

    def __call__(self, r, c):
        return self._grid[r][c]


def _allocate_figure(num_rows, num_cols, title_lines, x_length, y_length,
                     scaling, aspect):
    """Manual axes placement: per cell an image axes + a thin colorbar axes
    to its right, margins/gaps in inches (easy_plot.py:357-417)."""
    plt = _plt()
    img_h = 2.5
    if isinstance(aspect, str):
        assert aspect in ("auto", "wide"), (
            f"[plot]: 'aspect' should be 'auto' or 'wide' not {aspect}")
        img_w = (max(img_h, min(img_h * 4, x_length * img_h / y_length))
                 if aspect == "auto" else img_h * (16.0 / 9.0))
    else:
        img_w = img_h * float(aspect)
    scaling = scaling or 1
    img_h *= scaling
    img_w *= scaling
    mar_h, mar_w = 0.2 * scaling, 0.5 * scaling
    gap_h, gap_w = 0.35 * scaling, 0.8 * scaling
    gap_b = 0.1 * scaling
    bar_w = 0.1 * scaling
    th = _get_title_height()
    th_acc_from_btm = [0.0]
    for i in range(len(title_lines) - 1, 0, -1):
        th_acc_from_btm.append(th_acc_from_btm[-1] + title_lines[i] * th)
    fig_h = (img_h * num_rows + gap_h * num_rows + mar_h * 2
             + th * sum(title_lines))
    fig_w = (img_w * num_cols + gap_w * (num_cols - 1) + mar_w * 2
             + bar_w * num_cols + gap_b * num_cols)
    img_hr, img_wr = img_h / fig_h, img_w / fig_w
    bar_hr, bar_wr = img_h / fig_h, bar_w / fig_w
    bar_sr = (img_w + gap_b) / fig_w
    fig = plt.figure(figsize=(fig_w, fig_h))

    def bttm_ratio(row):
        row = num_rows - row - 1
        h = mar_h + gap_h + (img_h + gap_h) * row + th_acc_from_btm[row]
        return h / fig_h

    def left_ratio(col):
        return (mar_w + (img_w + gap_b + bar_w + gap_w) * col) / fig_w

    axes = [[(plt.axes([left_ratio(c), bttm_ratio(r), img_wr, img_hr]),
              plt.axes([left_ratio(c) + bar_sr, bttm_ratio(r), bar_wr,
                        bar_hr]))
             for c in range(num_cols)] for r in range(num_rows)]
    return fig, axes


# ---------------------------------------------------------------------------
# public functions


def color_mapping(values, vmin=None, vmax=None, cmap: str = DEFAULT_CMAP,
                  flip_rows: bool = False) -> np.ndarray:
    """(H, W) floats → (H, W, 3) uint8 via a matplotlib colormap
    (easy_plot.py:277-289; we drop the alpha channel — every consumer
    here feeds RGB image sinks)."""
    plt = _plt()
    values = np.asarray(values, np.float64)
    assert values.ndim == 2, "color_mapping() only works for 2d arrays"
    vmin = values.min() if vmin is None else vmin
    vmax = values.max() if vmax is None else vmax
    norm = np.clip((values - vmin) / (vmax - vmin + 1e-10), 0, 1)
    rgba = plt.get_cmap(cmap)(norm)
    img = (rgba[..., :3] * 255).astype(np.uint8)
    if flip_rows:
        img = np.flip(img, axis=0)
    return img


def figure_to_numpy(fig) -> np.ndarray:
    fig.canvas.draw()
    buf = np.asarray(fig.canvas.buffer_rgba())
    return buf[..., :3].copy()


def draw_figure(fig, file_path: Optional[str] = None) -> Optional[np.ndarray]:
    """Save to png (dirs auto-created, extension coerced) and/or convert to
    numpy (easy_plot.py:300-317; the interactive show/onclick branch is
    dropped — this framework only renders headless)."""
    plt = _plt()
    if file_path is not None:
        dirname = os.path.dirname(file_path)
        if dirname:
            os.makedirs(dirname, exist_ok=True)
        if os.path.splitext(file_path)[1] != ".png":
            file_path += ".png"
        fig.savefig(file_path, format="png")
    data = figure_to_numpy(fig)
    plt.close(fig)
    return data


def _coerce_item(item) -> plot_item:
    if type(item) is plot_item:
        return item
    if isinstance(item, dict):
        d = dict(item)
        return plot_item(d.pop("data"), **d)
    return plot_item(item)


def plot(*items, file_path=None, val_mode="auto", aspect="wide",
         suptitle="", vmin=None, vmax=None, fig_scaling=1) -> np.ndarray:
    """Grid plot (easy_plot.py:320-354): each positional arg is a row (a
    list/tuple) or a single cell; cells are plot_items (bare arrays and
    {'data': ...} dicts are coerced). Returns the figure as uint8 RGB."""
    plt = _plt()
    rows = [([_coerce_item(c) for c in r] if isinstance(r, (list, tuple))
             and not _is_xy_pair(r) else _coerce_item(r)) for r in items]
    grid = _GridLayout(rows)
    grid.set_value_range(vmin, vmax, mode=val_mode)
    title_lines = [max(grid(r, c).title_lines if grid(r, c) else 0
                       for c in range(grid.cols)) for r in range(grid.rows)]
    fig, axes = _allocate_figure(
        num_rows=grid.rows, num_cols=grid.cols, title_lines=title_lines,
        x_length=grid.max_xlen, y_length=grid.max_ylen, scaling=fig_scaling,
        aspect=aspect)
    for r in range(grid.rows):
        for c in range(grid.cols):
            ax, cax = axes[r][c]
            if grid(r, c) is None:
                ax.axis("off")
                cax.axis("off")
            else:
                grid(r, c).draw(ax, cax)
    plt.suptitle(suptitle)
    return draw_figure(fig, file_path=file_path)


def _is_xy_pair(r) -> bool:
    """A 2-tuple of 1-d arrays is an (x, y) curve, not a row of cells."""
    return (len(r) == 2 and all(
        isinstance(x, np.ndarray) and x.ndim == 1 for x in r))


def plot_grid(items: List, cols: Optional[int] = None,
              **kwargs) -> np.ndarray:
    """Flat list of arrays/dicts → one grid image, auto-square by default
    (the pre-round-4 surface; kept for the TB plugins and tests)."""
    n = len(items)
    cols = cols or int(math.ceil(math.sqrt(n)))
    rows = [[_coerce_item(it) for it in items[i:i + cols]]
            for i in range(0, n, cols)]
    return plot(*rows, **kwargs)
