"""Corpus filtering: the standard training-data cleaning pass, composed.

Chains the quality/langid/dedup operators into one pipeline over a
documents table (the post-extraction stage of a web-scale corpus build):

  1. rule filters (JVM-side, codegen): length bounds, punctuation ratio,
     stopword ratio, mean word length — the C4-style heuristics;
  2. language filter (kernel langid must agree with a target set);
  3. exact dedup (md5, min-id survivor);
  4. optional MinHash near-dup pruning (cluster -> keep min id).

Every dropped row is *accounted for*: ``corpus_filter`` returns (kept_df,
audit_df) where audit has one row per input doc with its fate — a corpus
pipeline that silently drops data is undebuggable at 10^12 rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ocr_spark.operators.dedup import exact_dedup, minhash_dup_pairs, near_dup_clusters
from ocr_spark.operators.textstats_ops import (
    with_gopher_quality,
    with_lang_id,
    with_quality,
)

DEFAULT_RULES = {
    "min_chars": 50,
    "max_chars": 1_000_000,
    "max_punct_ratio": 0.2,
    "min_stopword_ratio": 0.0,
    "max_mean_word_len": 14.0,
    # Gopher-style heuristics (Rae et al. 2021); the defaults match the
    # paper where it states one, otherwise permissive
    "max_symbol_word_ratio": 0.1,
    "max_bullet_line_ratio": 0.9,
    "max_ellipsis_line_ratio": 0.3,
    "max_dup_line_ratio": 0.3,
    "min_gopher_stopwords": 0,
}


def corpus_filter(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    langs: list[str] | None = None,
    rules: dict | None = None,
    near_dedup: bool = False,
    near_threshold: float = 0.8,
    signatures_table=None,
    benchmark: DataFrame | None = None,
    decont_n: int = 13,
    input_token: str | None = None,
    max_bucket: int | None = 1024,
) -> tuple[DataFrame, DataFrame]:
    """Returns (kept, audit).  audit: (id, keep boolean, reason string) —
    reason is the FIRST failing stage, 'kept' otherwise.  Stage order:
    rules -> language -> benchmark decontamination -> exact dedup -> near
    dedup.

    ``signatures_table`` (an ``IceliteTable``, with ``near_dedup=True``)
    materializes the candidates' minhash signatures to storage — the
    signatures are computed over EXACTLY the rule-passing exact-dedup
    survivors (a superset/subset table would let foreign doc ids into the
    clustering and silently drop whole clusters), so the table is owned by
    this pipeline run; a restarted run reuses the committed relation.

    ``benchmark``: an eval-set DataFrame (same id/text columns) — docs
    sharing a word ``decont_n``-gram with it are dropped with reason
    'contaminated' (GPT-3-style test-set decontamination; the benchmark
    gram set broadcasts, see corpus_ops.decontaminate).

    ``input_token``: callers that TRANSFORM the text before passing it in
    (e.g. dedup_job's line-cleanup pre-stages) must describe the transform
    here — it is folded into the signature-table fingerprint, so a rerun
    with different pre-processing refuses the stale signatures instead of
    clustering cleaned text with uncleaned-text hashes (the count-based
    identity cannot see a rewrite that preserves row count)."""
    r = {**DEFAULT_RULES, **(rules or {})}
    q = with_gopher_quality(with_quality(df, text_col), text_col)
    n_chars = F.length(F.col(text_col))
    # the NULL rule comes FIRST: every later comparison over NULL text
    # evaluates to NULL, so without it null-text docs (extraction-error
    # rows) fell through the entire when-chain with rule_fail=NULL and
    # leaked into the cleaned corpus as 'kept'.  The stopword_ratio rule
    # participates only when its threshold is positive (the default 0.0
    # can never fire since the ratio is >= 0, and the driver oracle CTE
    # mirrors the ACTIVE rule set).
    conds: list = [
        (F.col(text_col).isNull(), "null_text"),
        (n_chars < r["min_chars"], "too_short"),
        (n_chars > r["max_chars"], "too_long"),
        (F.col("punct_ratio") > r["max_punct_ratio"], "punct_ratio"),
    ]
    if r["min_stopword_ratio"] > 0:
        conds.append(
            (F.col("stopword_ratio") < r["min_stopword_ratio"], "stopword_ratio")
        )
    conds += [
        (F.col("mean_word_len") > r["max_mean_word_len"], "word_len"),
        (F.col("symbol_word_ratio") > r["max_symbol_word_ratio"], "symbol_ratio"),
        (F.col("bullet_line_ratio") > r["max_bullet_line_ratio"], "bullet_lines"),
        (
            F.col("ellipsis_line_ratio") > r["max_ellipsis_line_ratio"],
            "ellipsis_lines",
        ),
        (F.col("dup_line_ratio") > r["max_dup_line_ratio"], "dup_lines"),
        (
            F.col("n_gopher_stopwords") < r["min_gopher_stopwords"],
            "gopher_stopwords",
        ),
    ]
    rule_fail = None
    for cond, label in conds:
        rule_fail = (
            F.when(cond, F.lit(label))
            if rule_fail is None
            else rule_fail.when(cond, F.lit(label))
        )
    staged = q.withColumn("_rule_fail", rule_fail)
    if langs is not None:
        staged = with_lang_id(staged, text_col).withColumn(
            "_lang_fail", ~F.col("lang_pred").isin(langs)
        )
    else:
        staged = staged.withColumn("_lang_fail", F.lit(False))

    # NOT cached, by measurement: materializing (id, text, verdicts) looked
    # like an obvious win against the multi-scan audit/dedup consumers, but
    # it measured 2x SLOWER at sf0.1 (13.4 s vs 6.8 s) — the cache barrier
    # defeats per-branch column pruning and the rule regexes are cheaper to
    # recompute than the cached rows are to serve
    if benchmark is not None:
        from ocr_spark.operators.corpus_ops import decontaminate

        # only rule/lang survivors are worth the 13-gram explode: the audit
        # coalesce consults _cont_fail strictly after those stages, so the
        # output is identical and the most expensive per-doc expression in
        # the pipeline skips every already-rejected doc
        pre = staged.filter(
            F.col("_rule_fail").isNull() & ~F.col("_lang_fail")
        ).select(id_col, text_col)
        cont = decontaminate(pre, benchmark, id_col, text_col, n=decont_n).select(
            F.col(id_col).alias("_cont_id"), F.col("contaminated").alias("_cont_fail")
        )
        staged = staged.join(
            cont, staged[id_col] == F.col("_cont_id"), "left"
        ).drop("_cont_id").withColumn(
            "_cont_fail", F.coalesce("_cont_fail", F.lit(False))
        )
    else:
        staged = staged.withColumn("_cont_fail", F.lit(False))

    candidates = staged.filter(
        F.col("_rule_fail").isNull() & ~F.col("_lang_fail") & ~F.col("_cont_fail")
    )
    survivors = exact_dedup(candidates, id_col, text_col).select(id_col)
    kept_ids = candidates.join(survivors, id_col, "left_semi")

    if near_dedup:
        sigs = None
        if signatures_table is not None:
            import json as _json

            from ocr_spark.operators.dedup import materialize_minhash_signatures

            # the doc set the signatures cover is a function of (raw
            # input, filter configuration, benchmark CONTENT) — fingerprint
            # all three so a rerun with different rules/langs, a drifted
            # corpus, or a swapped same-cardinality benchmark refuses the
            # stale table.  Identity is CONTENT-based (count + crc32 sum of
            # the text) on the CHEAP relations — one scan-only aggregate
            # over the raw input, one over the small benchmark; a raw COUNT
            # alone would silently reuse stale signatures after an
            # equal-cardinality text drift (e.g. re-extracted docs).  This
            # lets materialize skip its own drift count, which would
            # re-execute this whole filter pipeline on every reuse.
            def digest(frame):
                row = frame.agg(
                    F.count(F.lit(1)).alias("n"),
                    F.sum(F.crc32(F.col(text_col).cast("binary"))).alias("h"),
                ).collect()[0]
                return [int(row["n"]), int(row["h"] or 0)]

            token = _json.dumps(
                {
                    "rules": {k: r[k] for k in sorted(r)},
                    "langs": sorted(langs) if langs else None,
                    "input_digest": digest(df),
                    "benchmark": digest(benchmark) if benchmark is not None else None,
                    "decont_n": decont_n if benchmark is not None else None,
                    "input_token": input_token,
                },
                sort_keys=True,
            )
            sigs = materialize_minhash_signatures(
                kept_ids,
                signatures_table,
                id_col,
                text_col,
                dataset_token=token,
                check_count=False,
            )
        pairs = minhash_dup_pairs(
            kept_ids, id_col, text_col, threshold=near_threshold, signatures=sigs,
            max_bucket=max_bucket,  # viral-bucket bound (dedup.py)
        )
        clusters = near_dup_clusters(
            kept_ids.select(F.col(id_col).alias("doc_id")), pairs
        )
        canonical = clusters.filter(F.col("doc_id") == F.col("cluster_id")).select(
            F.col("doc_id").alias(id_col)
        )
        final_ids = kept_ids.join(canonical, id_col, "left_semi")
    else:
        final_ids = kept_ids

    kept = df.join(final_ids.select(id_col), id_col, "left_semi")
    audit = (
        staged.join(
            final_ids.select(F.col(id_col).alias("_kept_id")),
            staged[id_col] == F.col("_kept_id"),
            "left",
        )
        .select(
            id_col,
            F.col("_kept_id").isNotNull().alias("keep"),
            F.coalesce(
                F.when(F.col("_kept_id").isNotNull(), F.lit("kept")),
                F.col("_rule_fail"),
                F.when(F.col("_lang_fail"), F.lit("lang")),
                F.when(F.col("_cont_fail"), F.lit("contaminated")),
                F.lit("duplicate"),
            ).alias("reason"),
        )
    )
    return kept, audit
