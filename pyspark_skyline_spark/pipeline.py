"""End-to-end corpus curation pipeline: the composition proof that the
individual operators chain into the workflow a 100 TB training-data
pipeline actually runs.

``curate_corpus`` wires the canonical stage order:

1. quality filtering (``repetition_stats`` keep flag) — cheapest first,
   pure per-row HOFs, shrinks everything downstream;
2. PII scrubbing (``pii_scrub``) — rewrite before any text is stored;
3. exact + near dedup (``dedup_corpus``: fingerprint phase →
   prefix-filtered Jaccard → connected components);
4. benchmark decontamination (``decontaminate`` vs the eval set) —
   after dedup so each surviving representative is checked once;
5. deterministic train/val/test split (``split_dataset``) — key-hash
   bands, leak-proof under growth.

Every stage is the library operator unchanged — this module adds no
logic, only the wiring and a per-stage row-count audit (each count is
one extra job over an already-lazy frame; pass ``audit=False`` to skip
them in production).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from pyspark_skyline_spark.operators.dedup import dedup_corpus
from pyspark_skyline_spark.operators.filtering import (
    decontaminate,
    pii_scrub,
    repetition_stats,
)
from pyspark_skyline_spark.operators.sample import split_dataset

__all__ = ["curate_corpus"]


def curate_corpus(
    docs: DataFrame,
    eval_df: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    split_fractions: dict[str, float] | None = None,
    audit: bool = True,
) -> tuple[DataFrame, dict[str, int]]:
    """Run the full curation chain over ``docs``; returns ``(curated,
    audit_counts)`` where ``curated`` carries the original columns
    (``text_col`` replaced by its scrubbed form) plus a ``split``
    label; ``audit_counts`` records rows surviving each stage (empty
    when ``audit=False``).
    """
    counts: dict[str, int] = {}

    def note(name: str, df_: DataFrame, materialize: bool = False) -> DataFrame:
        # materialize=True: lazy checkpoint so the stage computes ONCE
        # and later counts/consumers read its blocks. Reserved for the
        # stages feeding EXPENSIVE downstream work — localCheckpoint
        # blocks are non-reliable (lost with their executor), so
        # pinning every stage would trade recomputability for storage
        # on stages that are cheap to re-scan anyway.
        if audit:
            if materialize:
                df_ = df_.localCheckpoint(eager=False)
            counts[name] = df_.count()
        return df_

    note("input", docs)

    kept = repetition_stats(docs, text_col=text_col).where(F.col("keep"))
    kept = note("quality_filtered", kept.select(*docs.columns))

    scrubbed = pii_scrub(kept, text_col=text_col)
    # the scrub output feeds dedup_corpus (multi-pass) — the one stage
    # worth materializing
    scrubbed = note(
        "pii_scrubbed",
        scrubbed.withColumn(text_col, F.col("text_scrubbed")).select(*docs.columns),
        materialize=True,
    )

    deduped = dedup_corpus(scrubbed, id_col, text_col)
    deduped = note("deduped", deduped.select(*docs.columns))

    if eval_df is not None:
        deduped = note(
            "decontaminated",
            decontaminate(deduped, eval_df, id_col, text_col=text_col),
        )

    out = split_dataset(
        deduped.select(*docs.columns),
        [id_col],
        split_fractions or {"train": 0.9, "val": 0.05, "test": 0.05},
    )
    out = note("split", out)
    return out, counts
