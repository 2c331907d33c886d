"""Structured-field recovery: attendance-sheet text -> typed record.

Deterministic replacement for the reference's LLM "structuring" step
(reference: src/ai/flows/extract-data-from-pdf.ts:59-75
``structureOcrTextPrompt`` -> Gemini), producing the exact schema of
reference src/ai/schemas/pdf-data-schema.ts:5-17 with its contractual
default semantics: missing string -> "", missing number -> 0, missing
array -> []; every key always present
(extract-data-from-pdf.ts:48-52,67-71,87-91).

Label-anchored extraction: each scalar field has a list of label variants
(the fixture generator's 5 templates use different labels/formats); the
value is the rest of the line after the label separator.  The student list
is any run of lines matching ``<number><sep> <name>``.  Dates are opaque
strings — never parsed or normalized (pdf-data-schema.ts:8).
"""

from __future__ import annotations

import re

from ocr_spark.functions.html_extract import ERR_EMPTY  # one error vocabulary

DEFAULT_FIELDS: dict = {
    "classe": "",
    "cours": "",
    "date": "",
    "nom_du_professeur": "",
    "nombre_des_présents": 0,
    "salle_n": "",
    "séance": "",
    "présences": [],
}

# label variants, lowercase, accent-insensitive matching is NOT used —
# labels are matched verbatim-lowercase (the generator emits these forms).
_LABELS: dict[str, list[str]] = {
    "classe": ["classe", "class"],
    "cours": ["cours", "matière", "matiere", "module"],
    "date": ["date", "le"],
    "nom_du_professeur": ["nom du professeur", "professeur", "prof", "enseignant"],
    "nombre_des_présents": [
        "nombre des présents",
        "nombre de présents",
        "présents",
        "presents",
        "effectif présent",
    ],
    "salle_n": ["salle n°", "salle no", "salle n", "salle"],
    "séance": ["séance", "seance", "créneau", "creneau"],
}

_SEP = r"\s*[:\-–]\s*"
_STUDENT_RE = re.compile(r"^\s*(\d+)\s*[.)\-]\s+(.+?)\s*$")
_NUM_RE = re.compile(r"\d+")

# Longest label first so "nombre des présents" wins over "présents",
# "salle n°" over "salle".
_FIELD_PATTERNS: list[tuple[str, re.Pattern]] = sorted(
    (
        (field, re.compile(rf"^\s*{re.escape(lbl)}{_SEP}(.*?)\s*$", re.IGNORECASE))
        for field, labels in _LABELS.items()
        for lbl in labels
    ),
    key=lambda p: -len(p[1].pattern),
)


def extract_fields(doc_text: str | None) -> tuple[dict, str | None]:
    """One document: text -> (fields dict per DEFAULT_FIELDS keys, error).

    Never raises; on empty/None input returns the full default payload with
    an error marker (reference E6 semantics).
    """
    fields, _spans, err = extract_fields_with_spans(doc_text)
    return fields, err


def extract_fields_with_spans(
    doc_text: str | None,
) -> tuple[dict, list[tuple[str, int, int]], str | None]:
    """As :func:`extract_fields`, plus exact character spans: for every
    recovered scalar field, the (begin, end) code-point offsets of its
    VALUE in ``doc_text`` (end exclusive).  Omitted/defaulted fields have
    no span.  Offsets follow normalize.py rule N5.
    """
    fields = {
        k: (list(v) if isinstance(v, list) else v) for k, v in DEFAULT_FIELDS.items()
    }
    if not doc_text or not doc_text.strip():
        return fields, [], ERR_EMPTY
    found_scalar: set[str] = set()
    presences: list[dict] = []
    spans: list[tuple[str, int, int]] = []
    line_start = 0
    # keepends=True gives the TRUE boundary width: a fixed `len(line)+1`
    # advance shifted every span after a \r\n (or   etc.) boundary
    for raw in doc_text.splitlines(keepends=True):
        line = raw.splitlines()[0]  # strip the terminator, whatever it is
        m = _STUDENT_RE.match(line)
        if m:
            presences.append({"n": m.group(1), "nom_prénom": m.group(2)})
            line_start += len(raw)
            continue
        for field, pat in _FIELD_PATTERNS:
            if field in found_scalar:
                continue
            fm = pat.match(line)
            if fm:
                value = fm.group(1).strip()
                if field == "nombre_des_présents":
                    nm = _NUM_RE.search(value)
                    # a digit run beyond int64 is garbled OCR, not a count:
                    # leave the field defaulted rather than overflow the
                    # LongType at Arrow conversion (which would abort the
                    # whole batch against the E6 never-raise contract)
                    if nm and int(nm.group(0)) <= 0x7FFFFFFFFFFFFFFF:
                        fields[field] = int(nm.group(0))
                        found_scalar.add(field)
                        begin = line_start + fm.start(1) + nm.start()
                        spans.append((field, begin, begin + len(nm.group(0))))
                else:
                    if value:
                        fields[field] = value
                        found_scalar.add(field)
                        begin = line_start + fm.start(1)
                        spans.append((field, begin, begin + len(value)))
                break
        line_start += len(raw)
    fields["présences"] = presences
    return fields, spans, None
