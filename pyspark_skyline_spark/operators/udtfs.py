"""User-defined TABLE function surface (Spark 4 Python UDTFs).

The reference's only table-generating operator is the built-in
``explode`` (reference src/jobs/batch_job.py:179-180); this module
demonstrates the engine's USER extension point for one-row-to-many-rows
logic that has no native composition: ``@udtf`` classes, registered for
both the DataFrame (``lateralJoin``) and SQL (``LATERAL``) front doors.

Scale note: a Python UDTF is Arrow-batched but still Python — the slow
path by design (SURVEY §2.3 D16). Everything this module ships as a
DEMO (paragraph splitting) is also available as native expressions
(operators/text.py chunking); the UDTF surface exists for the logic
users bring that genuinely can't be expressed natively. Per-row state
only — a UDTF instance sees one input row at a time, so partition-wide
logic still belongs in applyInPandas.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

__all__ = ["make_paragraph_splitter", "register_paragraph_splitter"]


def make_paragraph_splitter(min_chars: int = 1):
    """Build the paragraph-splitter UDTF class: one document row in,
    one row per ``\\n\\n``-separated paragraph out, with its index and
    length. Blank/short paragraphs (< ``min_chars``) are dropped."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="para_idx int, para_text string, n_chars int")
    class ParagraphSplitter:
        def eval(self, text: str):  # noqa: D401 - Spark UDTF contract
            if text is None:
                return
            idx = 0
            for part in text.split("\n\n"):
                part = part.strip()
                if len(part) >= min_chars:
                    yield idx, part, len(part)
                    idx += 1

    return ParagraphSplitter


def register_paragraph_splitter(
    spark: SparkSession, name: str = "split_paragraphs", min_chars: int = 1
):
    """Register the splitter for SQL: ``SELECT d.doc_id, p.* FROM docs
    d, LATERAL split_paragraphs(d.text) p``. Returns the UDTF object
    (also usable directly: ``split_paragraphs(F.col("text"))``)."""
    fn = make_paragraph_splitter(min_chars)
    spark.udtf.register(name, fn)
    return fn
