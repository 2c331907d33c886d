"""The frozen text-normalization spec (v1).

Byte-identical extracted text per url is the correctness contract
(BASELINE.json:6,14,15).  The reference never needed a spec — a human edited
every record in its UI (reference: src/components/data-editor.tsx:16-42) —
so we freeze one here and BOTH the fixture generator and the extraction
kernels implement it.  Any change to these rules is a format version bump.

Rules (v1):
  N1. Entities are decoded during parse (``&amp;`` -> ``&``; numeric charrefs
      too) before any other rule applies.
  N2. Within a block, every run of Unicode whitespace collapses to a single
      ASCII space (U+0020); leading/trailing whitespace is stripped.
      ``str.split()`` / ``" ".join`` semantics — this is the whole rule.
  N3. A document's text is its main-content block texts joined by exactly
      one ``\n`` (U+000A); no trailing newline; zero blocks -> ``""``.
  N4. The final text is Unicode-normalized to NFC.
  N5. Span offsets are Python ``str`` (code-point) offsets into the final
      NFC text; ``end`` is exclusive.  Block i's span is named ``block_i``.
"""

from __future__ import annotations

import unicodedata

BLOCK_JOINER = "\n"
SPAN_FIELD_PREFIX = "block_"


def collapse_ws(s: str) -> str:
    """Rule N2: collapse internal whitespace runs, strip ends."""
    return " ".join(s.split())


def nfc(s: str) -> str:
    """Rule N4."""
    return unicodedata.normalize("NFC", s)


def join_blocks(blocks: list[str]) -> tuple[str, list[tuple[str, int, int]]]:
    """Rules N3+N5: join block texts, return (text, spans).

    Spans are computed on the NFC-normalized per-block texts so offsets into
    the final document text are exact.
    """
    normed = [nfc(b) for b in blocks]
    spans: list[tuple[str, int, int]] = []
    pos = 0
    for i, b in enumerate(normed):
        begin = pos
        end = begin + len(b)
        spans.append((f"{SPAN_FIELD_PREFIX}{i}", begin, end))
        pos = end + len(BLOCK_JOINER)
    return BLOCK_JOINER.join(normed), spans
