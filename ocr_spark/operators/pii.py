"""PII detection and redaction over extracted web text.

A standard stage of every published web-corpus pipeline (C4 strips lines by
blocklist; FineWeb/RefinedWeb anonymize emails and IPs before release); the
reference app has no analogue — it ships raw extracted text to an external
service (reference behavior boundary: src/ai/flows/extract-data-from-pdf.ts
sends the whole document out) — so this stage is where a self-hosted rebuild
must add the redaction the reference outsources.

Scale design (the 100 TB lens): the whole stage is three
``regexp_extract_all`` counts + three chained ``regexp_replace`` calls —
pure JVM whole-stage-codegen expressions, evaluated inside the scan stage.
No shuffle, no UDF, no Python worker; throughput is regex-engine-bound and
scales with input bytes exactly like the extraction flagship.

Cross-engine contract: the three patterns restrict themselves to the regex
subset where Java's engine (Spark) and RE2 (DuckDB oracle) agree — character
classes, bounded/unbounded repetition, non-capturing groups, and ``\\b`` word
boundaries; no backreferences, no lookaround (RE2 has neither).  Replacement
is applied in the FIXED order email -> ipv4 -> phone on both sides (the
match counts are computed on the ORIGINAL text, so count columns are
order-independent; the redacted text is order-dependent, hence the frozen
order).

Backtracking bound: none of the three patterns nests an unbounded
quantifier inside another (the (a+)* exponential shape), so the Spark/Java
side is at worst QUADRATIC on adversarial runs (e.g. megabytes of
``a.a.a...`` after an ``@``) — the price of the RE2-compatible subset,
which rules out the possessive quantifiers that would make Java linear;
the DuckDB/RE2 side is always linear by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# The frozen pattern set (see module docstring for the dialect contract).
EMAIL_RE = r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b(?:\d{1,3}\.){3}\d{1,3}\b"
PHONE_RE = r"\+?\d[\d\-() ]{7,}\d"

EMAIL_TOKEN = "<EMAIL>"
IPV4_TOKEN = "<IP>"
PHONE_TOKEN = "<PHONE>"


def redact_expr(col):
    """The redaction as a bare Column (frozen email -> ipv4 -> phone
    order) — composable into jobs that rewrite ``text`` in place."""
    return F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(col, EMAIL_RE, EMAIL_TOKEN), IPV4_RE, IPV4_TOKEN
        ),
        PHONE_RE,
        PHONE_TOKEN,
    )


def redact_pii(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append per-doc PII match counts and a redacted text column.

    Adds ``n_emails`` / ``n_ipv4`` / ``n_phones`` (matches in the original
    text) and ``text_redacted`` (matches replaced by typed tokens, in the
    frozen email -> ipv4 -> phone order).  All other columns pass through.
    NULL text counts as zero matches and stays NULL after redaction
    (``size()`` over a null array would otherwise report -1).
    """
    t = F.col(text_col)

    def n_matches(pattern: str):
        return F.coalesce(
            F.size(F.regexp_extract_all(t, F.lit(pattern), F.lit(0))),
            F.lit(0),
        ).cast("bigint")

    return (
        df.withColumn("n_emails", n_matches(EMAIL_RE))
        .withColumn("n_ipv4", n_matches(IPV4_RE))
        .withColumn("n_phones", n_matches(PHONE_RE))
        .withColumn("text_redacted", redact_expr(t))
    )


def pii_oracle_sql(corpus_rel: str, text_col: str = "text") -> str:
    """The DuckDB mirror of :func:`redact_pii` over ``corpus_rel`` —
    generated from the SAME frozen pattern constants so the two engines
    cannot drift apart pattern-by-pattern."""
    esc = lambda p: p.replace("'", "''")  # noqa: E731
    e, i, p = esc(EMAIL_RE), esc(IPV4_RE), esc(PHONE_RE)
    # coalesce mirrors redact_pii's NULL-text-counts-as-zero: without it a
    # NULL text row yields NULL counts on the oracle side only
    return f"""
        SELECT doc_id,
               CAST(coalesce(len(regexp_extract_all({text_col}, '{e}')), 0) AS BIGINT) AS n_emails,
               CAST(coalesce(len(regexp_extract_all({text_col}, '{i}')), 0) AS BIGINT) AS n_ipv4,
               CAST(coalesce(len(regexp_extract_all({text_col}, '{p}')), 0) AS BIGINT) AS n_phones,
               regexp_replace(
                 regexp_replace(
                   regexp_replace({text_col}, '{e}', '{EMAIL_TOKEN}', 'g'),
                   '{i}', '{IPV4_TOKEN}', 'g'),
                 '{p}', '{PHONE_TOKEN}', 'g') AS text_redacted
        FROM {corpus_rel}
    """
