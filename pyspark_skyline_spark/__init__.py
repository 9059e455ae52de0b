"""pyspark-skyline-engine: a PySpark-native skyline (Pareto frontier) and
LLM-data-pipeline operator library.

Re-expresses the capabilities of the reference project
miketheologitis/PySpark-Skyline (see SURVEY.md) as an idiomatic Spark
DataFrame library: native Column expressions for partitioning keys,
``applyInPandas`` NumPy kernels for the dominance test, and a
tree-structured final merge in place of the reference's single-task
global reduce (reference: src/jobs/batch_job.py:183-188).
"""

from pyspark_skyline_spark.kernel import find_skyline_mask, skyline_of_array
from pyspark_skyline_spark.parser import parse_skyline_query
from pyspark_skyline_spark.operators.skyline import (
    skyline,
    skyline_antijoin,
    skyline_layers,
    skyline_witness,
    representative_skyline,
    skyline_sql,
    windowed_skyline,
)
from pyspark_skyline_spark.operators.asof import asof_join
from pyspark_skyline_spark.operators.skyband import k_skyband
from pyspark_skyline_spark.operators.sample import (
    hash_sample,
    pack_batches,
    sessionize,
    stratified_hash_sample,
)
from pyspark_skyline_spark.operators.dedup import (
    dedup_corpus,
    dedup_exact,
    minhash_lsh_pairs,
    near_dup_clusters,
    ngram_jaccard_pairs,
    simhash,
    simhash_pairs,
)
from pyspark_skyline_spark.operators.filtering import (
    decontaminate,
    pii_scrub,
    repetition_stats,
)
from pyspark_skyline_spark.operators.profile import column_profile
from pyspark_skyline_spark.operators.rangejoin import range_join
from pyspark_skyline_spark.operators.similarity import (
    cosine_near_dup_pairs,
    cosine_topk,
    cosine_topk_ivf,
    cosine_topk_lsh,
)
from pyspark_skyline_spark.operators.text import (
    chunk_documents,
    fingerprint,
    lang_id,
    quality_flags,
    subword_count,
    text_stats,
    token_count,
    winnow_fingerprints,
)
from pyspark_skyline_spark.operators.topk import top_k_per_group

__all__ = [
    "find_skyline_mask",
    "skyline_of_array",
    "parse_skyline_query",
    "skyline",
    "skyline_antijoin",
    "skyline_sql",
    "skyline_layers",
    "skyline_witness",
    "representative_skyline",
    "k_skyband",
    "windowed_skyline",
    "asof_join",
    "range_join",
    "dedup_corpus",
    "near_dup_clusters",
    "simhash_pairs",
    "hash_sample",
    "stratified_hash_sample",
    "pack_batches",
    "sessionize",
    "chunk_documents",
    "dedup_exact",
    "minhash_lsh_pairs",
    "ngram_jaccard_pairs",
    "simhash",
    "column_profile",
    "repetition_stats",
    "pii_scrub",
    "decontaminate",
    "cosine_near_dup_pairs",
    "cosine_topk",
    "cosine_topk_ivf",
    "cosine_topk_lsh",
    "fingerprint",
    "lang_id",
    "quality_flags",
    "subword_count",
    "text_stats",
    "token_count",
    "winnow_fingerprints",
    "top_k_per_group",
]
