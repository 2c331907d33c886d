"""Stdlib PDF parser: raw PDF bytes -> per-glyph boxes (engine A's byte layer).

Reference behavior parity: the reference's front door accepts PDF *files*
(reference: src/app/page.tsx:444-452, accept filter :118) and engine A feeds
the raw bytes to OCR (reference: src/ai/flows/extract-data-from-pdf.ts:114-139).
This module is the deterministic byte-level replacement: it walks the PDF
object graph and replays the content-stream text operators into the glyph
schema (ocr_spark/schemas.py GLYPHS_SCHEMA) that the layout branch
(functions/layout.py rules L1-L4) consumes — so PDF bytes flow end-to-end:
bytes -> glyphs -> XY-cut reading-order text.

Frozen PDF contract (v1).  The fixture generator
(fixtures/generator.py::gen_pdf_doc) WRITES files against the same rules
through an independent code path (it composes objects / xref / content
streams; this module tokenizes and parses them back) and the goldens derive
from generator PARAMETERS (its mirrored text-matrix arithmetic), never from
parsing — the same two-sided design as the PNG/WAV/MP4 kernels.

  P1. A document must begin with b"%PDF-"; anything else -> ``not_pdf``.
  P2. The last ``startxref`` in the file tail names the byte offset of a
      CLASSIC cross-reference table (``xref`` keyword, subsection headers
      ``start count``, 20-byte-style entries, then ``trailer`` << dict >>)
      OR a PDF-1.5 CROSS-REFERENCE STREAM (an indirect stream object with
      /Type /XRef: binary entries laid out by /W field widths over /Index
      subsections, Flate-decoded, PNG Up-predictor (/Predictor >= 10 with
      per-row filter tags 0/2) supported; type-1 entries are file offsets,
      type-2 entries point into OBJECT STREAMS).  Trailers may chain via
      /Prev (incremental updates): tables are walked newest-first, the
      NEWEST entry per object wins, and the newest trailer's /Root
      governs.  A /Prev loop, failure to locate/parse a table, a missing
      /Root, an unsupported predictor/filter tag, or an entry offset that
      does not start the referenced object -> ``bad_xref``.
  P3. Objects are ``N G obj <value> endobj`` over the standard token
      grammar: dicts, arrays, names, numbers, literal + hex strings,
      indirect refs ``N G R``, booleans, null, comments, streams.
      Objects may live inside OBJECT STREAMS (/Type /ObjStm: ``N`` header
      pairs ``objnum offset`` then the value tokens at /First + offset);
      a header/index mismatch or malformed object -> ``bad_obj``.
  P4. Stream filters: none or /FlateDecode only; any other /Filter ->
      ``unsupported_filter``; Flate data that fails to inflate ->
      ``bad_stream``.  /Length may be an indirect reference.
  P5. Pages: Catalog /Pages tree, /Kids walked depth-first (interior
      /Pages nodes allowed); /MediaBox and /Resources INHERIT from
      ancestors.  A broken tree -> ``bad_page_tree``.  Page y-flip uses
      the MediaBox top edge: ``y_top = media_y1 - y_pdf`` (output glyphs
      are top-down, y growing downward, per FIXTURES.md §2).
  P6. Content streams (page /Contents, a stream or array of streams
      joined with a newline) support exactly the text operators
      BT ET Tf TL Td TD Tm T* ' Tj TJ plus a no-op allow-list of pure
      graphics operators (q Q w J j M d ri i gs re m l c v y h S s f F
      f* B B* b b* n W W* g G rg RG k K cs CS sc scn sh BX EX).  Tm must
      be a pure translation (a=d=1, b=c=0) — scaling/rotation, Tc/Tw/Tz/
      Ts/Tr/cm, inline images and XObjects are outside the v1 contract
      and yield ``bad_content`` (fail loud, never silently mis-place).
  P7. Glyph arithmetic (pinned; the generator mirrors it expression for
      expression so float results are BIT-IDENTICAL):
        - string bytes decode one byte -> one char via WinAnsiEncoding
          (cp1252); an undefined byte -> ``bad_content``
        - width lookup in the standard-14 tables below; a missing entry
          -> ``missing_width``; a show with no font set, a font name
          absent from /Resources/Font, or an unsupported BaseFont ->
          ``missing_font``
        - adv  = w * size / 1000.0
        - space (U+0020) advances x without emitting a glyph
        - any other char emits box
            (x,  y_top - 0.8 * size,  x + adv - 0.5,  y_top)
          then advances:  x = x + adv
        - a TJ number t adjusts  x = x - t * size / 1000.0
  P8. ``glyph_id`` is the running emission index across the document's
      pages in content-stream order, starting at 0.

Errors are PER DOCUMENT and RECORDED, never raised (E6 semantics —
reference: extract-data-from-pdf.ts error channel): taxonomy
``not_pdf | doc_too_large | bad_xref | bad_obj | unsupported_filter |
bad_stream | stream_too_large | bad_page_tree | missing_font |
missing_width | bad_content``.

Resource bounds (the html branch's DOC_TOO_LARGE discipline applied
here): the raw payload is capped (``max_bytes`` -> ``doc_too_large``)
and every FlateDecode inflation is capped (``max_stream_bytes`` ->
``stream_too_large``) — a zlib bomb in a content stream must cost one
error row, never an executor OOM.
"""

from __future__ import annotations

import re
import zlib

# ---------------------------------------------------------------------------
# standard-14 width tables (units: 1/1000 em, public Adobe AFM metrics).
# The generator carries ITS OWN copy (generator._PDF_HELV_WIDTHS); a pytest
# asserts the two copies agree so neither side can drift alone.
# ---------------------------------------------------------------------------
HELVETICA_WIDTHS: dict[str, int] = {
    " ": 278, "!": 278, '"': 355, "#": 556, "$": 556, "%": 889, "&": 667,
    "'": 191, "(": 333, ")": 333, "*": 389, "+": 584, ",": 278, "-": 333,
    ".": 278, "/": 278, "0": 556, "1": 556, "2": 556, "3": 556, "4": 556,
    "5": 556, "6": 556, "7": 556, "8": 556, "9": 556, ":": 278, ";": 278,
    "<": 584, "=": 584, ">": 584, "?": 556, "@": 1015, "A": 667, "B": 667,
    "C": 722, "D": 722, "E": 667, "F": 611, "G": 778, "H": 722, "I": 278,
    "J": 500, "K": 667, "L": 556, "M": 833, "N": 722, "O": 778, "P": 667,
    "Q": 778, "R": 722, "S": 667, "T": 611, "U": 722, "V": 667, "W": 944,
    "X": 667, "Y": 667, "Z": 611, "[": 278, "\\": 278, "]": 278, "^": 469,
    "_": 556, "`": 333, "a": 556, "b": 556, "c": 500, "d": 556, "e": 556,
    "f": 278, "g": 556, "h": 556, "i": 222, "j": 222, "k": 500, "l": 222,
    "m": 833, "n": 556, "o": 556, "p": 556, "q": 556, "r": 333, "s": 500,
    "t": 278, "u": 556, "v": 500, "w": 722, "x": 500, "y": 500, "z": 500,
    "{": 334, "|": 260, "}": 334, "~": 584,
}


class _CourierWidths:
    """Courier is fixed-pitch: every encoded char is 600/1000 em."""

    def get(self, ch: str):  # noqa: D102 - dict-like
        return 600


COURIER_WIDTHS = _CourierWidths()

# BaseFont -> width table.  Everything else -> missing_font.
FONT_WIDTHS = {
    "Courier": COURIER_WIDTHS,
    "Courier-Bold": COURIER_WIDTHS,
    "Courier-Oblique": COURIER_WIDTHS,
    "Courier-BoldOblique": COURIER_WIDTHS,
    "Helvetica": HELVETICA_WIDTHS,
}

_NOOP_OPS = frozenset(
    "q Q w J j M d ri i gs re m l c v y h S s f F f* B B* b b* n W W* "
    "g G rg RG k K cs CS sc scn sh BX EX".split()
)

ERROR_CODES = (
    "not_pdf", "doc_too_large", "bad_xref", "bad_obj", "unsupported_filter",
    "bad_stream", "stream_too_large", "bad_page_tree", "missing_font",
    "missing_width", "bad_content",
)

# resource bounds (E6: violations land in the error channel, never OOM).
# 64 MB covers any sane text PDF; real scans/image PDFs would raise the
# caller-side knobs, not these defaults.
DEFAULT_MAX_PDF_BYTES = 64 << 20
DEFAULT_MAX_STREAM_BYTES = 64 << 20


class PdfError(Exception):
    def __init__(self, code: str, detail: str = ""):
        super().__init__(f"{code}: {detail}" if detail else code)
        self.code = code


# ---------------------------------------------------------------------------
# token grammar (P3) — shared by body objects and content streams
# ---------------------------------------------------------------------------
class Name(str):
    """A PDF /Name, distinct from a decoded string."""


_WS = b"\x00\t\n\x0c\r "
_DELIM = b"()<>[]{}/%"
_NUM_RE = re.compile(rb"[+-]?(\d+\.?\d*|\.\d+)([eE][+-]?\d+)?")


class _Lexer:
    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos

    def _skip_ws(self) -> None:
        d, n = self.data, len(self.data)
        while self.pos < n:
            c = self.data[self.pos]
            if c in _WS:
                self.pos += 1
            elif c == 0x25:  # % comment to end of line
                nl = d.find(b"\n", self.pos)
                self.pos = n if nl < 0 else nl + 1
            else:
                return

    def peek_keyword(self) -> str | None:
        """Next regular-character run without consuming (e.g. 'stream')."""
        save = self.pos
        self._skip_ws()
        start = self.pos
        d, n = self.data, len(self.data)
        while self.pos < n and d[self.pos] not in _WS and d[self.pos] not in _DELIM:
            self.pos += 1
        word = d[start : self.pos].decode("latin-1")
        self.pos = save
        return word or None

    def expect_keyword(self, kw: str) -> None:
        self._skip_ws()
        if not self.data.startswith(kw.encode(), self.pos):
            raise PdfError("bad_obj", f"expected {kw!r} at {self.pos}")
        self.pos += len(kw)

    # -- values -------------------------------------------------------------
    def value(self):
        """One object-grammar value.  Indirect refs come back as
        ('R', num) tuples; names as Name; strings as bytes."""
        self._skip_ws()
        d, n = self.data, len(self.data)
        if self.pos >= n:
            raise PdfError("bad_obj", "unexpected EOF")
        c = d[self.pos]
        if c == 0x2F:  # /Name
            return self._name()
        if c == 0x28:  # (literal string)
            return self._literal_string()
        if c == 0x3C:  # << dict >> or <hex>
            if d.startswith(b"<<", self.pos):
                return self._dict()
            return self._hex_string()
        if c == 0x5B:  # [ array ]
            return self._array()
        if d.startswith(b"true", self.pos):
            self.pos += 4
            return True
        if d.startswith(b"false", self.pos):
            self.pos += 5
            return False
        if d.startswith(b"null", self.pos):
            self.pos += 4
            return None
        m = _NUM_RE.match(d, self.pos)
        if m is not None:
            self.pos = m.end()
            # int when possible so /Length & refs stay exact; ref lookahead:
            # "N G R" with both integers
            txt = m.group().decode("latin-1")
            if "." not in txt and "e" not in txt and "E" not in txt:
                first = int(txt)
                save = self.pos
                self._skip_ws()
                m2 = _NUM_RE.match(d, self.pos)
                if m2 is not None and b"." not in m2.group():
                    self.pos = m2.end()
                    self._skip_ws()
                    if d.startswith(b"R", self.pos) and (
                        self.pos + 1 >= n
                        or d[self.pos + 1] in _WS
                        or d[self.pos + 1] in _DELIM
                    ):
                        self.pos += 1
                        return ("R", first)
                self.pos = save
                return first
            return float(txt)
        raise PdfError("bad_obj", f"unparseable token at {self.pos}")

    def _name(self) -> Name:
        self.pos += 1  # '/'
        d, n = self.data, len(self.data)
        start = self.pos
        while self.pos < n and d[self.pos] not in _WS and d[self.pos] not in _DELIM:
            self.pos += 1
        return Name(d[start : self.pos].decode("latin-1"))

    def _literal_string(self) -> bytes:
        d, n = self.data, len(self.data)
        self.pos += 1  # '('
        out = bytearray()
        depth = 1
        while self.pos < n:
            c = d[self.pos]
            if c == 0x5C:  # backslash escape
                self.pos += 1
                if self.pos >= n:
                    break
                e = d[self.pos]
                if e in b"nrtbf":
                    out.append({0x6E: 10, 0x72: 13, 0x74: 9, 0x62: 8, 0x66: 12}[e])
                    self.pos += 1
                elif e in b"()\\":
                    out.append(e)
                    self.pos += 1
                elif 0x30 <= e <= 0x37:  # 1-3 octal digits
                    oct_s = 0
                    k = 0
                    while k < 3 and self.pos < n and 0x30 <= d[self.pos] <= 0x37:
                        oct_s = oct_s * 8 + (d[self.pos] - 0x30)
                        self.pos += 1
                        k += 1
                    out.append(oct_s & 0xFF)
                elif e in b"\r\n":  # line continuation
                    self.pos += 1
                    if e == 0x0D and self.pos < n and d[self.pos] == 0x0A:
                        self.pos += 1
                else:  # unknown escape: the char stands for itself
                    out.append(e)
                    self.pos += 1
            elif c == 0x28:
                depth += 1
                out.append(c)
                self.pos += 1
            elif c == 0x29:
                depth -= 1
                if depth == 0:
                    self.pos += 1
                    return bytes(out)
                out.append(c)
                self.pos += 1
            else:
                out.append(c)
                self.pos += 1
        raise PdfError("bad_obj", "unterminated literal string")

    def _hex_string(self) -> bytes:
        d, n = self.data, len(self.data)
        self.pos += 1  # '<'
        digits = []
        while self.pos < n:
            c = d[self.pos]
            if c == 0x3E:
                self.pos += 1
                if len(digits) % 2:
                    digits.append(0x30)  # odd count: trailing 0 (spec)
                return bytes.fromhex(bytes(digits).decode("latin-1"))
            if c in _WS:
                self.pos += 1
                continue
            if not (0x30 <= c <= 0x39 or 0x41 <= c <= 0x46 or 0x61 <= c <= 0x66):
                raise PdfError("bad_obj", f"bad hex digit at {self.pos}")
            digits.append(c)
            self.pos += 1
        raise PdfError("bad_obj", "unterminated hex string")

    def _array(self) -> list:
        self.pos += 1  # '['
        out = []
        while True:
            self._skip_ws()
            if self.pos >= len(self.data):
                raise PdfError("bad_obj", "unterminated array")
            if self.data[self.pos] == 0x5D:
                self.pos += 1
                return out
            out.append(self.value())

    def _dict(self) -> dict:
        self.pos += 2  # '<<'
        out: dict = {}
        while True:
            self._skip_ws()
            if self.data.startswith(b">>", self.pos):
                self.pos += 2
                return out
            if self.pos >= len(self.data) or self.data[self.pos] != 0x2F:
                raise PdfError("bad_obj", f"dict key must be a name at {self.pos}")
            key = self._name()
            out[str(key)] = self.value()


def _unpredict(data: bytes, predictor: int, columns: int) -> bytes:
    """Invert the PNG row predictor on xref-stream data (P2): predictors
    >= 10 mean per-row PNG filter tags; tags 0 (None) and 2 (Up) are the
    ones xref streams use in practice — anything else -> bad_xref."""
    if predictor == 1:
        return data
    if predictor < 10:
        raise PdfError("bad_xref", f"unsupported predictor {predictor}")
    stride = columns + 1
    if columns <= 0 or len(data) % stride:
        raise PdfError("bad_xref", "predictor data length mismatch")
    out = bytearray()
    prior = bytes(columns)
    for pos in range(0, len(data), stride):
        tag = data[pos]
        cur = bytearray(data[pos + 1 : pos + stride])
        if tag == 2:  # Up
            for i in range(columns):
                cur[i] = (cur[i] + prior[i]) & 0xFF
        elif tag != 0:
            raise PdfError("bad_xref", f"unsupported PNG filter tag {tag}")
        out += cur
        prior = bytes(cur)
    return bytes(out)


# ---------------------------------------------------------------------------
# document graph (P2, P3, P4, P5)
# ---------------------------------------------------------------------------
class _Document:
    def __init__(self, data: bytes, max_stream_bytes: int = DEFAULT_MAX_STREAM_BYTES):
        self.data = data
        self.max_stream_bytes = max_stream_bytes
        # object locator: int = file offset; ("objstm", stm, idx) = the
        # idx-th object inside object stream ``stm`` (xref-stream type 2)
        self.offsets: dict[int, object] = {}
        self.cache: dict[int, object] = {}
        self._objstm_cache: dict[int, tuple] = {}  # stm -> (pairs, body)
        self.trailer: dict = {}
        self._parse_xref()

    # -- xref ---------------------------------------------------------------
    def _parse_xref(self) -> None:
        tail = self.data[-2048:]
        i = tail.rfind(b"startxref")
        if i < 0:
            raise PdfError("bad_xref", "no startxref")
        lx = _Lexer(tail, i + len(b"startxref"))
        try:
            off = lx.value()
        except PdfError:
            raise PdfError("bad_xref", "unreadable startxref offset")
        # walk the /Prev chain newest-first: the NEWEST entry per object
        # wins (incremental updates append a new table whose entries
        # override the base file's), the newest trailer governs
        seen_tables: set[int] = set()
        while True:
            if not isinstance(off, int) or not (0 <= off < len(self.data)):
                raise PdfError("bad_xref", f"xref offset {off!r} out of range")
            if off in seen_tables:
                raise PdfError("bad_xref", "/Prev chain loop")
            seen_tables.add(off)
            trailer = self._parse_one_xref(off)
            if not self.trailer:
                self.trailer = trailer
            prev = trailer.get("Prev")
            if prev is None:
                break
            off = prev
        if not isinstance(self.trailer, dict) or "Root" not in self.trailer:
            raise PdfError("bad_xref", "trailer missing /Root")

    def _parse_one_xref(self, off: int) -> dict:
        """One cross-reference SECTION at ``off`` — a classic table or a
        PDF-1.5 xref stream; entries are added with setdefault so earlier
        (newer) sections win.  Returns the section's trailer dict."""
        lx = _Lexer(self.data, off)
        try:
            lx.expect_keyword("xref")
        except PdfError:
            return self._parse_xref_stream(off)
        try:
            while True:
                word = lx.peek_keyword()
                if word == "trailer":
                    lx.expect_keyword("trailer")
                    trailer = lx.value()
                    break
                start = lx.value()
                count = lx.value()
                if not isinstance(start, int) or not isinstance(count, int):
                    raise PdfError("bad_xref", "bad subsection header")
                for k in range(count):
                    entry_off = lx.value()
                    _gen = lx.value()
                    lx._skip_ws()
                    kind = self.data[lx.pos : lx.pos + 1]
                    lx.pos += 1
                    if kind == b"n":
                        self.offsets.setdefault(start + k, entry_off)
                    elif kind != b"f":
                        raise PdfError("bad_xref", f"bad entry kind {kind!r}")
        except PdfError as e:
            raise PdfError("bad_xref", str(e))
        if not isinstance(trailer, dict):
            raise PdfError("bad_xref", "trailer is not a dict")
        return trailer

    def _parse_xref_stream(self, off: int) -> dict:
        """A /Type /XRef stream object at ``off`` (PDF 1.5): binary
        entries of sum(/W) bytes over /Index subsections.  The stream's
        own dict is the trailer."""
        lx = _Lexer(self.data, off)
        try:
            num = lx.value()
            gen = lx.value()
            lx.expect_keyword("obj")
            sdict = lx.value()
            if not isinstance(num, int) or not isinstance(gen, int):
                raise PdfError("bad_xref", "xref stream header is not N G obj")
            if not isinstance(sdict, dict) or str(sdict.get("Type", "")) != "XRef":
                raise PdfError("bad_xref", f"no xref table or /XRef stream at {off}")
            if not isinstance(sdict.get("Length"), int):
                # the spec requires a DIRECT /Length here (resolving an
                # indirect one would need the very table being parsed)
                raise PdfError("bad_xref", "xref stream /Length must be direct")
            _, _, body = self._read_stream(lx, sdict)
        except PdfError as e:
            raise PdfError("bad_xref", str(e))
        parms = sdict.get("DecodeParms")
        if isinstance(parms, dict):
            body = _unpredict(
                body,
                int(parms.get("Predictor", 1)),
                int(parms.get("Columns", 1)),
            )
        w = sdict.get("W")
        size = sdict.get("Size")
        if (
            not isinstance(w, list)
            or len(w) != 3
            or not all(isinstance(x, int) and 0 <= x <= 8 for x in w)
            or not isinstance(size, int)
        ):
            raise PdfError("bad_xref", "xref stream missing/bad /W or /Size")
        index = sdict.get("Index", [0, size])
        if not isinstance(index, list) or len(index) % 2:
            raise PdfError("bad_xref", "bad /Index")
        row = sum(w)
        if row == 0:
            raise PdfError("bad_xref", "zero-width xref entries")
        pos = 0

        def field(width: int, default: int) -> int:
            nonlocal pos
            if width == 0:
                return default
            v = int.from_bytes(body[pos : pos + width], "big")
            pos += width
            return v

        for i in range(0, len(index), 2):
            start, count = index[i], index[i + 1]
            if not isinstance(start, int) or not isinstance(count, int):
                raise PdfError("bad_xref", "bad /Index pair")
            for k in range(count):
                if pos + row > len(body):
                    raise PdfError("bad_xref", "xref stream data truncated")
                etype = field(w[0], 1)
                f2 = field(w[1], 0)
                f3 = field(w[2], 0)
                objnum = start + k
                if etype == 1:
                    self.offsets.setdefault(objnum, f2)
                elif etype == 2:
                    self.offsets.setdefault(objnum, ("objstm", f2, f3))
                # type 0 (free) and unknown types: skipped (spec: readers
                # ignore entry types they don't understand)
        return sdict

    # -- objects ------------------------------------------------------------
    def resolve(self, v):
        while isinstance(v, tuple) and len(v) == 2 and v[0] == "R":
            v = self.get(v[1])
        return v

    def get(self, num: int):
        if num in self.cache:
            return self.cache[num]
        if num not in self.offsets:
            raise PdfError("bad_xref", f"object {num} not in xref")
        loc = self.offsets[num]
        if isinstance(loc, tuple):
            val = self._get_from_objstm(loc[1], loc[2], num)
            self.cache[num] = val
            return val
        lx = _Lexer(self.data, loc)
        got = lx.value()
        gen = lx.value()
        if got != num or not isinstance(gen, int):
            raise PdfError("bad_xref", f"xref offset for obj {num} is wrong")
        lx.expect_keyword("obj")
        val = lx.value()
        if lx.peek_keyword() == "stream":
            val = self._read_stream(lx, val)
        self.cache[num] = val
        return val

    def _get_from_objstm(self, stm: int, idx: int, num: int):
        """Object ``num`` at position ``idx`` inside object stream ``stm``
        (/Type /ObjStm: ``N`` header pairs then value tokens at /First +
        offset).  Streams cannot nest inside an ObjStm (spec 7.5.7)."""
        cached = self._objstm_cache.get(stm)
        if cached is None:
            container = self.get(stm)
            if not (
                isinstance(container, tuple)
                and container[0] == "stream"
                and str(container[1].get("Type", "")) == "ObjStm"
            ):
                raise PdfError("bad_obj", f"object {num}: container {stm} is not an ObjStm")
            d, body = container[1], container[2]
            n, first = self.resolve(d.get("N")), self.resolve(d.get("First"))
            if not isinstance(n, int) or not isinstance(first, int):
                raise PdfError("bad_obj", f"ObjStm {stm} missing /N or /First")
            hlx = _Lexer(body)
            pairs = []
            for _ in range(n):
                onum = hlx.value()
                ooff = hlx.value()
                if not isinstance(onum, int) or not isinstance(ooff, int):
                    raise PdfError("bad_obj", f"ObjStm {stm} header is not int pairs")
                pairs.append((onum, ooff))
            cached = (pairs, first, body)
            self._objstm_cache[stm] = cached
        pairs, first, body = cached
        if not (0 <= idx < len(pairs)) or pairs[idx][0] != num:
            raise PdfError("bad_obj", f"ObjStm {stm} index {idx} does not hold obj {num}")
        return _Lexer(body, first + pairs[idx][1]).value()

    def _read_stream(self, lx: _Lexer, sdict) -> tuple:
        """Returns ('stream', dict, decoded_bytes) applying P4 filters."""
        if not isinstance(sdict, dict):
            raise PdfError("bad_obj", "stream without a dict")
        lx.expect_keyword("stream")
        # exactly CRLF or LF after the keyword (spec 7.3.8.1)
        if self.data.startswith(b"\r\n", lx.pos):
            lx.pos += 2
        elif self.data.startswith(b"\n", lx.pos):
            lx.pos += 1
        length = self.resolve(sdict.get("Length"))
        if not isinstance(length, int) or length < 0 or lx.pos + length > len(self.data):
            raise PdfError("bad_obj", "bad /Length")
        raw = self.data[lx.pos : lx.pos + length]
        filt = self.resolve(sdict.get("Filter"))
        if filt is None:
            body = raw
        else:
            filters = filt if isinstance(filt, list) else [filt]
            body = raw
            for f in filters:
                if str(f) != "FlateDecode":
                    raise PdfError("unsupported_filter", str(f))
                try:
                    # BOUNDED inflation: a zlib bomb (10 KB compressing to
                    # gigabytes) must cost one error row, not an executor
                    # OOM — decompress at most max_stream_bytes + 1 and
                    # reject anything that still has input pending
                    d = zlib.decompressobj()
                    body = d.decompress(body, self.max_stream_bytes + 1)
                except zlib.error as e:
                    raise PdfError("bad_stream", str(e))
                if len(body) > self.max_stream_bytes or d.unconsumed_tail:
                    raise PdfError(
                        "stream_too_large",
                        f"inflated past {self.max_stream_bytes} bytes",
                    )
        return ("stream", sdict, body)

    # -- page tree ----------------------------------------------------------
    def pages(self) -> list[tuple[dict, dict]]:
        """Depth-first leaf pages as (page_dict, inherited) where inherited
        carries the resolved /MediaBox and /Resources in effect (P5)."""
        root = self.resolve(self.trailer["Root"])
        if not isinstance(root, dict):
            raise PdfError("bad_page_tree", "Root is not a dict")
        pages_ref = root.get("Pages")
        if pages_ref is None:
            raise PdfError("bad_page_tree", "Catalog missing /Pages")
        out: list[tuple[dict, dict]] = []

        def walk(node, inherited: dict, depth: int) -> None:
            if depth > 64:
                raise PdfError("bad_page_tree", "page tree too deep")
            node = self.resolve(node)
            if not isinstance(node, dict):
                raise PdfError("bad_page_tree", "non-dict page node")
            inh = dict(inherited)
            for k in ("MediaBox", "Resources"):
                if k in node:
                    inh[k] = self.resolve(node[k])
            t = str(node.get("Type", ""))
            if t == "Pages":
                kids = self.resolve(node.get("Kids"))
                if not isinstance(kids, list):
                    raise PdfError("bad_page_tree", "/Pages without /Kids")
                for kid in kids:
                    walk(kid, inh, depth + 1)
            elif t == "Page":
                out.append((node, inh))
            else:
                raise PdfError("bad_page_tree", f"unexpected node type {t!r}")

        walk(pages_ref, {}, 0)
        return out


# ---------------------------------------------------------------------------
# content interpreter (P6, P7)
# ---------------------------------------------------------------------------
def _page_fonts(doc: _Document, inherited: dict) -> dict:
    res = doc.resolve(inherited.get("Resources"))
    if not isinstance(res, dict):
        return {}
    fonts = doc.resolve(res.get("Font"))
    if not isinstance(fonts, dict):
        return {}
    out = {}
    for name, ref in fonts.items():
        fd = doc.resolve(ref)
        if isinstance(fd, dict):
            out[name] = str(fd.get("BaseFont", ""))
    return out


def _page_content(doc: _Document, page: dict) -> bytes:
    contents = doc.resolve(page.get("Contents"))
    if contents is None:
        return b""
    parts = contents if isinstance(contents, list) else [contents]
    chunks = []
    for p in parts:
        p = doc.resolve(p)
        if not (isinstance(p, tuple) and p[0] == "stream"):
            raise PdfError("bad_obj", "/Contents entry is not a stream")
        chunks.append(p[2])
    # multiple streams form one logical stream; a newline keeps tokens apart
    return b"\n".join(chunks)


def _interpret(content: bytes, fonts: dict, media_top: float, emit) -> None:
    """Replay the P6 operator set, emitting glyphs per P7 via ``emit(ch,
    x0, y0, x1, y1)``.  All position arithmetic mirrors the generator's —
    expression-for-expression — so results are bit-identical floats."""
    lx = _Lexer(content)
    stack: list = []
    font_widths = None  # active width table
    size = 0.0
    leading = 0.0
    line_x = line_y = 0.0  # text line matrix translation
    x = y = 0.0  # current pen position
    in_text = False

    def show(sbytes: bytes) -> None:
        nonlocal x
        if font_widths is None:
            raise PdfError("missing_font", "show with no font set")
        try:
            chars = sbytes.decode("cp1252")
        except UnicodeDecodeError as e:
            raise PdfError("bad_content", f"undefined WinAnsi byte: {e}")
        for ch in chars:
            w = font_widths.get(ch)
            if w is None:
                raise PdfError("missing_width", repr(ch))
            adv = w * size / 1000.0
            if ch != " ":
                y_top = media_top - y
                emit(ch, x, y_top - 0.8 * size, x + adv - 0.5, y_top)
            x = x + adv

    n = len(content)
    while True:
        lx._skip_ws()
        if lx.pos >= n:
            break
        c = content[lx.pos]
        # operands share the object grammar; operators are keyword runs
        if c == 0x2F or c == 0x28 or c == 0x3C or c == 0x5B or c == 0x2B or c == 0x2D or c == 0x2E or 0x30 <= c <= 0x39:
            try:
                stack.append(lx.value())
            except PdfError as e:
                raise PdfError("bad_content", str(e))
            continue
        start = lx.pos
        while lx.pos < n and content[lx.pos] not in _WS and content[lx.pos] not in _DELIM:
            lx.pos += 1
        op = content[start : lx.pos].decode("latin-1")
        if not op:
            raise PdfError("bad_content", f"stray delimiter at {start}")
        try:
            if op == "BT":
                line_x = line_y = x = y = 0.0
                in_text = True
            elif op == "ET":
                in_text = False
            elif op == "Tf":
                fname, fsize = stack[-2], stack[-1]
                base = fonts.get(str(fname))
                if base is None:
                    raise PdfError("missing_font", str(fname))
                fw = FONT_WIDTHS.get(base)
                if fw is None:
                    raise PdfError("missing_font", base)
                font_widths = fw
                size = float(fsize)
            elif op == "TL":
                leading = float(stack[-1])
            elif op == "Td" or op == "TD":
                tx, ty = float(stack[-2]), float(stack[-1])
                if op == "TD":
                    leading = -ty
                line_x = line_x + tx
                line_y = line_y + ty
                x, y = line_x, line_y
            elif op == "Tm":
                a, b, cc, d2, e, f = (float(v) for v in stack[-6:])
                if a != 1.0 or b != 0.0 or cc != 0.0 or d2 != 1.0:
                    raise PdfError("bad_content", "Tm with scale/rotation")
                line_x, line_y = e, f
                x, y = line_x, line_y
            elif op == "T*":
                line_y = line_y - leading
                x, y = line_x, line_y
            elif op == "'":
                line_y = line_y - leading
                x, y = line_x, line_y
                show(stack[-1])
            elif op == "Tj":
                show(stack[-1])
            elif op == "TJ":
                arr = stack[-1]
                if not isinstance(arr, list):
                    raise PdfError("bad_content", "TJ operand is not an array")
                for el in arr:
                    if isinstance(el, bytes):
                        show(el)
                    elif isinstance(el, (int, float)):
                        x = x - float(el) * size / 1000.0
                    else:
                        raise PdfError("bad_content", f"TJ element {el!r}")
            elif op in _NOOP_OPS:
                pass
            else:
                raise PdfError("bad_content", f"unsupported operator {op!r}")
        except IndexError:
            raise PdfError("bad_content", f"operator {op!r} missing operands")
        stack.clear()
    if in_text:
        raise PdfError("bad_content", "unbalanced BT/ET")


# ---------------------------------------------------------------------------
# public entry
# ---------------------------------------------------------------------------
def pdf_glyphs(
    payload: bytes | None,
    max_bytes: int = DEFAULT_MAX_PDF_BYTES,
    max_stream_bytes: int = DEFAULT_MAX_STREAM_BYTES,
):
    """Raw PDF bytes -> (glyph_rows, error).

    ``glyph_rows`` is a list of (page, ch, x0, y0, x1, y1) in content-stream
    emission order (page numbers are 1-based leaf order, P5; ``glyph_id`` is
    the caller's row index per P8).  On any contract violation returns
    ``([], code)`` with a taxonomy code — never raises.  ``max_bytes``
    bounds the raw payload (-> ``doc_too_large``); ``max_stream_bytes``
    bounds every FlateDecode inflation (-> ``stream_too_large``)."""
    if payload is None or not payload.startswith(b"%PDF-"):
        return [], "not_pdf"
    if len(payload) > max_bytes:
        return [], "doc_too_large"
    rows: list[tuple] = []
    try:
        doc = _Document(bytes(payload), max_stream_bytes=max_stream_bytes)
        for page_no, (page, inherited) in enumerate(doc.pages(), start=1):
            media = doc.resolve(inherited.get("MediaBox"))
            if not (isinstance(media, list) and len(media) == 4):
                raise PdfError("bad_page_tree", "missing /MediaBox")
            media_top = float(media[3])
            fonts = _page_fonts(doc, inherited)
            content = _page_content(doc, page)

            def emit(ch, x0, y0, x1, y1, _p=page_no):
                rows.append((_p, ch, x0, y0, x1, y1))

            _interpret(content, fonts, media_top, emit)
    except PdfError as e:
        return [], e.code
    except RecursionError:
        return [], "bad_obj"
    except Exception:  # noqa: BLE001 — E6: a malformed file must land in
        # the error channel, never abort the batch.  Typed PdfErrors cover
        # every ANTICIPATED violation; this catches the grammar's long
        # tail (an operator fed a number where a string belongs ->
        # TypeError, a bytes operand to float() -> ValueError, ...).
        # Masked kernel defects still surface: the golden oracles compare
        # full row content, so a wrongly-errored document fails them.
        return [], "bad_obj"
    return rows, None
