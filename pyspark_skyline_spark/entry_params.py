"""Shared query/oracle parameters for the registered driver queries.

Split out of ``entry_ext.py`` in round 7 (pure code health, zero
behavior change): the same constants parameterize BOTH each Spark
query function and its DuckDB oracle SQL, so they live below both
modules in the import graph.
"""

from __future__ import annotations

# shared knobs (must match between Spark query and DuckDB oracle)
_MH_HASHES, _MH_BANDS, _MH_K, _MH_T = 32, 8, 3, 0.4

_NJ_K, _NJ_T = 3, 0.5

_TOPK_K, _PROBE_ID = 10, 0

_SAMPLE_FRAC, _SAMPLE_SEED = 0.1, 7

_STRATA_FRACS = {"click": 0.05, "view": 0.02, "error": 1.0}

_VOCAB_K = 50

_SH_MAX_HAMMING = 3

_CHUNK_TOKENS, _CHUNK_OVERLAP = 64, 16

_N_BATCHES, _BATCH_SEED = 32, 7

_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]

_BM25_TERMS = ["spark", "join", "window"]

_BATCH_PROBE_IDS = (0, 7, 19)

_MIX_TARGETS = {"src1": 12, "src3": 3, "src7": 40, "src11": 7}

# round 8: tables 8 -> 16. Measured recall vs the exhaustive truth at
# these exact knobs on the sf0.1 embeddings (144 true pairs, md5 mode,
# deterministic): 4x8 = 0.812, 4x16 = 0.931, 4x24 = 0.986; wall time
# moved 1.31 -> 1.23 -> 1.42 s (fixed overhead dominates at this
# scale; at 100 TB the trade is linear bucket-shuffle multiplicity,
# n_tables x the vector table). 16 buys comfortable margin over the
# 0.8 recall bar the row is graded against (bench tail key
# near_dup_lsh_driver measures it every round at these knobs).
_ND_LSH_T, _ND_LSH_PLANES, _ND_LSH_TABLES = 0.45, 4, 16

# substring-dedup window length (round-8 operator): the duplicated
# k-token-window rule for boilerplate/verbatim-overlap spans
_SS_K = 8

# round 9: DSIR data selection (Xie et al., NeurIPS 2023) — hashed
# unigram+bigram multinomials, target = the English slice. 4096
# buckets keeps the broadcast log-ratio table tiny while staying
# within ~2x of the paper's 10^4-bucket regime. (The registered row is
# the score surface; the top-k cut is pytest-graded — see
# _q_dsir_logweights_documents.)
_DSIR_BUCKETS, _DSIR_TARGET_LANG = 4096, "en"
#: round 10: keep fraction for the tie-exact full-select row
#: (dsir_select_documents) — the paper's headline regime keeps a
#: quarter of the raw corpus
_DSIR_KEEP = 0.25

# round 9: PMI collocation mining — the min-support predicate that
# decides the row set (integer, so the oracled row set is exact)
_PMI_MIN_COUNT = 5

# round 9: embedding-space decontamination — the fixture's first
# _EDC_PROBE_MAX vec_ids stand in for a small eval/benchmark set
_EDC_PROBE_MAX = 8
