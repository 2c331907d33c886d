"""PDF/scan layout branch: glyph boxes -> reading-order text.

Deterministic replacement for the reference's Vision OCR engine A
(reference: src/ai/flows/extract-data-from-pdf.ts:114-139,
``DOCUMENT_TEXT_DETECTION`` -> ``fullTextAnnotation.text``), per
BASELINE.json:6: "layout-aware PDF/image page segmentation
(connected-component analysis, baseline clustering, reading-order sort via
XY-cut)".

Input: one page of glyph boxes ``(ch, x0, y0, x1, y1)`` in PDF points,
origin top-left, y growing downward (FIXTURES.md §2 — the generator emits
them in shuffled order, so reading order must be *recovered*).

Frozen layout contract (v1):
  L1. Page geometry is US-Letter (612 x 792 pt).  Glyphs with vertical
      center < HEADER_Y (72) or >= FOOTER_Y (720) are header/footer and are
      dropped before segmentation.
  L2. Recursive XY-cut on glyph bounding boxes: at each node compute the
      largest horizontal gap (projection onto x) and the largest vertical
      gap (projection onto y) strictly inside the region.  Cut along the
      larger gap if it exceeds its threshold (X_GAP_MIN=18pt, Y_GAP_MIN=14pt);
      ties (exact float equality) prefer the horizontal-gap (column) cut.
      Children are ordered left-before-right / top-before-bottom.
  L3. Leaf regions: glyphs are clustered into lines by baseline (y1):
      sort by y1; a new line starts when y1 jumps by more than
      LINE_CLUSTER_EPS (3pt) from the current line's running-mean baseline.
      Lines are ordered by mean baseline; within a line glyphs sort by
      (x0, glyph order of input as final tiebreak — x0 ties cannot occur in
      well-formed glyph streams but the sort is made total anyway).
  L4. Spacing: within a line, a gap ``next.x0 - prev.x1 > SPACE_GAP`` (3pt)
      emits exactly one ASCII space.  Lines join with ``\n``; regions
      (XY-cut leaves, in L2 order) also join with ``\n``.  No trailing
      newline.  Empty page -> "".
"""

from __future__ import annotations

import numpy as np

PAGE_W = 612.0
PAGE_H = 792.0
HEADER_Y = 72.0
FOOTER_Y = 720.0
X_GAP_MIN = 18.0
Y_GAP_MIN = 14.0
LINE_CLUSTER_EPS = 3.0
SPACE_GAP = 3.0


def _largest_gap(lo: np.ndarray, hi: np.ndarray) -> tuple[float, float]:
    """Largest uncovered interval in the 1-D projection of [lo, hi) boxes.

    Returns (gap_size, gap_mid); (0.0, 0.0) when fully covered.
    Deterministic: first-largest wins on ties (sorted scan order).
    """
    order = np.argsort(lo, kind="stable")
    lo, hi = lo[order], hi[order]
    best_gap, best_mid = 0.0, 0.0
    cover_end = hi[0]
    for i in range(1, len(lo)):
        if lo[i] > cover_end:
            gap = float(lo[i] - cover_end)
            if gap > best_gap:
                best_gap, best_mid = gap, float((lo[i] + cover_end) / 2.0)
        cover_end = max(cover_end, hi[i])
    return best_gap, best_mid


def _lines_text(ch: np.ndarray, x0: np.ndarray, x1: np.ndarray, y1: np.ndarray) -> str:
    """Rule L3+L4 on one leaf region."""
    order = np.argsort(y1, kind="stable")
    lines: list[list[int]] = []
    baseline_sum = 0.0
    for idx in order:
        if lines and abs(y1[idx] - baseline_sum / len(lines[-1])) <= LINE_CLUSTER_EPS:
            lines[-1].append(int(idx))
            baseline_sum += float(y1[idx])
        else:
            lines.append([int(idx)])
            baseline_sum = float(y1[idx])
    out_lines: list[str] = []
    for members in lines:
        marr = np.array(members)
        m_order = marr[np.lexsort((marr, x0[marr]))]
        parts: list[str] = []
        prev_x1 = None
        for g in m_order:
            if prev_x1 is not None and x0[g] - prev_x1 > SPACE_GAP:
                parts.append(" ")
            parts.append(ch[g])
            prev_x1 = x1[g]
        out_lines.append("".join(parts))
    return "\n".join(out_lines)


def _xycut(
    ch: np.ndarray,
    x0: np.ndarray,
    y0: np.ndarray,
    x1: np.ndarray,
    y1: np.ndarray,
    idx: np.ndarray,
) -> list[str]:
    """Rule L2, recursive; returns leaf texts in reading order."""
    if len(idx) == 0:
        return []
    xgap, xmid = _largest_gap(x0[idx], x1[idx])
    ygap, ymid = _largest_gap(y0[idx], y1[idx])
    cut_x = xgap >= X_GAP_MIN and xgap >= ygap  # tie -> column cut (L2)
    cut_y = not cut_x and ygap >= Y_GAP_MIN
    if cut_x:
        left = idx[(x0[idx] + x1[idx]) / 2.0 < xmid]
        right = idx[(x0[idx] + x1[idx]) / 2.0 >= xmid]
        if len(left) and len(right):
            return _xycut(ch, x0, y0, x1, y1, left) + _xycut(ch, x0, y0, x1, y1, right)
    if cut_y:
        top = idx[(y0[idx] + y1[idx]) / 2.0 < ymid]
        bottom = idx[(y0[idx] + y1[idx]) / 2.0 >= ymid]
        if len(top) and len(bottom):
            return _xycut(ch, x0, y0, x1, y1, top) + _xycut(ch, x0, y0, x1, y1, bottom)
    return [_lines_text(ch[idx], x0[idx], x1[idx], y1[idx])]


def page_text(
    ch: list[str] | np.ndarray,
    x0: np.ndarray,
    y0: np.ndarray,
    x1: np.ndarray,
    y1: np.ndarray,
) -> str:
    """One page of glyphs (any order) -> reading-order text (rules L1-L4)."""
    ch = np.asarray(ch, dtype=object)
    x0 = np.asarray(x0, dtype=np.float64)
    y0 = np.asarray(y0, dtype=np.float64)
    x1 = np.asarray(x1, dtype=np.float64)
    y1 = np.asarray(y1, dtype=np.float64)
    yc = (y0 + y1) / 2.0
    body = np.nonzero((yc >= HEADER_Y) & (yc < FOOTER_Y))[0]
    if len(body) == 0:
        return ""
    leaves = _xycut(ch, x0, y0, x1, y1, body)
    return "\n".join(t for t in leaves if t)
