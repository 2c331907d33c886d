"""The resumable extraction pipeline (SURVEY.md §7 M4).

Processing unit = a **bucket group**: a contiguous slice of url-hash
buckets.  Per group: filter pages to the group's buckets -> extraction UDF
-> MERGE into the output table with the group id recorded in the commit
metadata.  A rerun asks the table which groups are committed and skips them
— so a killed run resumes from the last committed snapshot and the final
table is identical to an uninterrupted run (exactly-once visible rows per
url; the per-group MERGE makes replays of a half-processed group
idempotent, reference K3 semantics).

Lineage/counters ride on ``df.observe``: docs in, docs errored, html bytes,
text chars per commit — recorded into the snapshot metadata alongside
per-file row counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

from ocr_spark.operators.extract import extract_pages
from ocr_spark.plans.partitioning import salted_repartition
from ocr_spark.sources.icelite import IceliteTable, bucket_expr


class ExtractionPipeline:
    def __init__(
        self,
        out_table: IceliteTable,
        n_buckets: int = 16,
        group_size: int = 4,
        salt: int = 0,
        key_col: str = "url",
        transform=None,
    ):
        """``salt=0`` (default) keeps the extraction stage shuffle-free:
        parquet/Iceberg scans already split files by
        ``spark.sql.files.maxPartitionBytes``, so task sizes are balanced by
        *bytes*, and spark.speculation covers stragglers.  Set ``salt>0``
        only for pathological host skew — it buys smaller tasks at the cost
        of shuffling the raw html (the one thing a 100 TB run must avoid).

        ``key_col``/``transform`` generalize the pipeline beyond the html
        branch: ``transform`` maps a group's input slice to the rows merged
        into the output (default :func:`extract_pages`) and must emit the
        key column plus ``text``/``error`` for the lineage counters — e.g.
        ``pdf_ops.pdf_doc_records`` with ``key_col='doc_id'`` runs the PDF
        front door resumable (jobs/extract_job.py --format pdf)."""
        # the OUTPUT layout must align with the pipeline's bucket groups,
        # same as the input check in _group_input: merging group [0..3]
        # into a table with a different n_buckets/key would scatter rows
        # into buckets the merge's touched_buckets anti-join never covers —
        # duplicate keys on resume instead of exactly-once
        if out_table.key_col != key_col or out_table.n_buckets != n_buckets:
            raise ValueError(
                f"output table is keyed ({out_table.key_col!r}, "
                f"{out_table.n_buckets} buckets), pipeline expects "
                f"({key_col!r}, {n_buckets}) — merge groups would not align "
                "with the table's buckets"
            )
        self.out = out_table
        self.n_buckets = n_buckets
        self.group_size = group_size
        self.salt = salt
        self.key_col = key_col
        self.transform = transform if transform is not None else extract_pages

    def bucket_groups(self) -> list[list[int]]:
        return [
            list(range(i, min(i + self.group_size, self.n_buckets)))
            for i in range(0, self.n_buckets, self.group_size)
        ]

    def remaining_groups(self) -> list[list[int]]:
        done = {tuple(g) for g in self.out.committed_groups()} if self.out.exists() else set()
        return [g for g in self.bucket_groups() if tuple(g) not in done]

    def _group_input(self, pages, spark, group: list[int]) -> DataFrame:
        """The group's slice of the input.

        - ``IceliteTable`` input: the group's buckets are read by MANIFEST
          file pruning — the file list shrinks before Spark lists anything,
          so a resume scans only the remaining groups' files (physical
          partition pruning; the unit of layout == the unit of resume).
        - plain ``DataFrame`` input (flat parquet, WARC): fall back to a
          computed bucket predicate — correct, but every group re-scans the
          full input and filters rows (VERDICT r2 "What's missing" #3); lay
          the input out as an icelite table to get pruning.
        """
        if isinstance(pages, IceliteTable):
            if pages.n_buckets != self.n_buckets or pages.key_col != self.key_col:
                raise ValueError(
                    f"input table is keyed ({pages.key_col!r}, "
                    f"{pages.n_buckets} buckets), pipeline expects "
                    f"({self.key_col!r}, {self.n_buckets}) — bucket ids "
                    "would not align with key processing groups"
                )
            return pages.read(spark, buckets=group)
        return pages.filter(bucket_expr(self.key_col, self.n_buckets).isin(group))

    def _run_group(self, pages, group: list[int], spark=None) -> dict:
        part = self._group_input(pages, spark, group)
        if self.salt:
            part = salted_repartition(part, self.key_col, self.n_buckets, self.salt)
        obs = Observation(f"extract-group-{group[0]}")
        extracted = self.transform(part).observe(
            obs,
            F.count(F.lit(1)).alias("docs"),
            F.sum(F.when(F.col("error").isNotNull(), 1).otherwise(0)).alias("errors"),
            F.sum(F.length("text")).alias("text_chars"),
        )
        sid = self.out.merge(
            extracted,
            metadata={"bucket_group": group, "counters": {}},
            touched_buckets=group,
        )
        got = {k: (int(v) if v is not None else 0) for k, v in obs.get.items()}
        # the counters only exist once the write ran; amend the manifest
        # (metadata-only — HEAD untouched, safe under concurrency)
        self.out.patch_metadata(sid, {"counters": got})
        return got

    def run(
        self,
        pages,
        fail_after_groups: int | None = None,
        force: bool = False,
        max_concurrent: int = 1,
        spark=None,
    ) -> dict:
        """Process all remaining bucket groups; returns lineage summary.

        ``pages`` is a DataFrame OR an ``IceliteTable`` (pass ``spark`` with
        a table) — table input gets manifest-level file pruning per group
        (see ``_group_input``).
        ``fail_after_groups`` simulates a mid-job crash (for the resume
        property test): raises after that many group commits (serial mode).
        ``force=True`` reprocesses every group (the reference's re-process
        path, C3: the MERGE overwrites prior rows per key, page.tsx:183-187).
        ``max_concurrent>1`` drives several bucket-group jobs at once —
        groups touch disjoint buckets, so their merges commit concurrently
        (icelite validates disjointness); keeps a wide cluster busy through
        each group's commit tail.
        """
        if isinstance(pages, IceliteTable) and spark is None:
            raise ValueError("pass spark= when pages is an IceliteTable")
        # (html byte counters intentionally absent: the input is scanned by
        # two branches post-dispatch, so an input-side observe double-counts;
        # bench.py measures MB/sec explicitly instead)
        stats = {"groups": 0, "docs": 0, "errors": 0, "text_chars": 0}

        def tally(got: dict) -> None:
            stats["groups"] += 1
            stats["docs"] += got["docs"]
            stats["errors"] += got["errors"]
            stats["text_chars"] += got["text_chars"]

        groups = self.bucket_groups() if force else self.remaining_groups()
        if max_concurrent <= 1:
            for i, group in enumerate(groups):
                if fail_after_groups is not None and i >= fail_after_groups:
                    raise RuntimeError(
                        f"simulated crash after {fail_after_groups} groups"
                    )
                tally(self._run_group(pages, group, spark))
            return stats

        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_concurrent) as ex:
            for got in ex.map(lambda g: self._run_group(pages, g, spark), groups):
                tally(got)
        return stats
