"""DuckDB oracle SQL for the registered driver queries.

Split out of ``entry_ext.py`` in round 7 (pure code health, zero
behavior change): the SQL-macro constants, the per-family oracle
builders, and the ``_ORACLES`` registry. Every string here is ANSI-ish
SQL DuckDB runs against the same parquet tables the Spark queries
read; the driver compares row counts, schemas, and value hashes.
"""

from __future__ import annotations


from pyspark_skyline_spark.operators import filtering as FL
from pyspark_skyline_spark.operators import sample as SA
from pyspark_skyline_spark.operators import text as T
from pyspark_skyline_spark.oracles import skyline_oracle_sql

from pyspark_skyline_spark.entry_params import (
    _MEDIA_FIXTURE,
    _BATCH_PROBE_IDS,
    _BM25_TERMS,
    _DSIR_BUCKETS,
    _DSIR_KEEP,
    _DSIR_TARGET_LANG,
    _EDC_PROBE_MAX,
    _EVENT_TYPES,
    _MH_BANDS,
    _MH_HASHES,
    _MH_T,
    _ND_LSH_PLANES,
    _ND_LSH_T,
    _ND_LSH_TABLES,
    _NJ_T,
    _PMI_MIN_COUNT,
    _PROBE_ID,
    _SAMPLE_FRAC,
    _SAMPLE_SEED,
    _SS_K,
    _SH_MAX_HAMMING,
    _STRATA_FRACS,
    _TOPK_K,
    _VOCAB_K,
)


_TOKS = r"regexp_split_to_array(lower(trim(text)), '\s+')"


# ordered word 3-shingles (duplicates kept), mirroring
# dedup.ordered_shingles(k=3)
_ORDERED_SHINGLES = f"""
CASE WHEN len({_TOKS}) >= 3
     THEN list_transform(range(0, len({_TOKS}) - 2),
          i -> {_TOKS}[i+1] || ' ' || {_TOKS}[i+2] || ' ' || {_TOKS}[i+3])
     ELSE [array_to_string({_TOKS}, ' ')] END
"""


# distinct word 3-shingles, mirroring dedup.shingles(k=3)
_SHINGLES = f"list_distinct({_ORDERED_SHINGLES.strip()})"


_HASH60 = "('0x' || substr(md5({x}), 1, 15))::BIGINT"


def _seed_mix_sql(num_hashes: int) -> str:
    """DuckDB expression for dedup._seed_mix's md5 mode: the per-seed
    degree-2 polynomial scramble (a_j*(h² mod p) + b_j*h + c_j) mod p,\n    p = 2^61 - 1, with the
    (a_j, b_j, c_j) constants inlined from the SAME derivation the Spark
    side uses (dedup._mix_params) so the two engines cannot drift.
    HUGEINT keeps a_j*(h² mod p) (< 2^122) exact; the result (< 2^61) casts
    back to BIGINT losslessly. Expects lambda variables `h` (the base
    60-bit shingle hash) and `j` (the seed index, 0-based)."""
    from pyspark_skyline_spark.operators.dedup import _MERSENNE61, _mix_params

    params = _mix_params(num_hashes)
    a_list = "[" + ", ".join(str(a) for a, _, _ in params) + "]"
    b_list = "[" + ", ".join(str(b) for _, b, _ in params) + "]"
    c_list = "[" + ", ".join(str(c) for _, _, c in params) + "]"
    return (
        f"((((h::HUGEINT * h::HUGEINT) % {_MERSENNE61}) * ({a_list}[j + 1])"
        f" + h::HUGEINT * ({b_list}[j + 1]) + ({c_list}[j + 1]))"
        f" % {_MERSENNE61})::BIGINT"
    )


def _minhash_oracle() -> str:
    r = _MH_HASHES // _MH_BANDS
    base_hash = _HASH60.format(x="s")
    # per-seed degree-2 polynomial scramble (mirrors dedup._seed_mix md5
    # mode, round 7): (a_j*(h² mod p) + b_j*h + c_j) mod (2^61 - 1) in
    # exact HUGEINT arithmetic, with the same md5-derived constants the
    # Spark side inlines (dedup._mix_params — single source of truth);
    # an XOR mix cannot reorder values differing in their top bits and
    # collapses the estimator, a multiply-mod-prime map is a genuine
    # permutation of Z_p
    seed_mix = _seed_mix_sql(_MH_HASHES)
    return f"""
WITH base AS (
  SELECT doc_id, {_SHINGLES} AS sh FROM documents),
hashes AS (
  SELECT doc_id, sh, list_transform(sh, s -> {base_hash}) AS hs FROM base),
sigs AS (
  SELECT doc_id, sh,
         list_transform(range(0, {_MH_HASHES}),
           j -> list_min(list_transform(hs, h -> {seed_mix}))) AS sig
  FROM hashes),
band_lists AS (
  SELECT doc_id,
         list_transform(range(0, {_MH_BANDS}),
           b -> {{'idx': b,
                  'key': array_to_string(sig[b*{r}+1 : b*{r}+{r}], ',')}}) AS bl
  FROM sigs),
bands AS (
  SELECT doc_id, u.idx AS band_idx, u.key AS band_key
  FROM band_lists, UNNEST(bl) AS t(u)),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a JOIN bands b
    ON a.band_idx = b.band_idx AND a.band_key = b.band_key AND a.doc_id < b.doc_id),
verified AS (
  SELECT id_a, id_b,
         len(list_intersect(sa.sh, sb.sh))::DOUBLE /
         len(list_distinct(sa.sh || sb.sh)) AS jac
  FROM cand
  JOIN base sa ON sa.doc_id = id_a
  JOIN base sb ON sb.doc_id = id_b)
SELECT id_a, id_b, jac FROM verified WHERE jac >= {_MH_T}
"""


def _incr_neardup_oracle() -> str:
    """Exact SQL mirror of ``_q_dedup_incremental_neardup_documents``:
    both sides of the ledger comparison compute the SAME md5-mode
    MinHash signatures (the sig construction is shared verbatim with
    ``_minhash_oracle``), candidates come from any shared band, the
    verify is the signature equality fraction, and survivors are the
    new batch minus the dropped ids. Blank/NULL-text rows never enter
    signature matching and therefore always survive — mirrored by the
    regexp filter on both sides here and the final anti-membership
    select over the UNfiltered new batch."""
    h = _MH_HASHES
    r = h // _MH_BANDS
    base_hash = _HASH60.format(x="s")
    seed_mix = _seed_mix_sql(h)

    def sigs(name: str, pred: str) -> str:
        return f"""{name} AS (
  SELECT doc_id,
         list_transform(range(0, {h}),
           j -> list_min(list_transform(hs, h -> {seed_mix}))) AS sig
  FROM (SELECT doc_id, list_transform({_SHINGLES}, s -> {base_hash}) AS hs
        FROM documents
        WHERE ({pred}) AND text IS NOT NULL AND regexp_matches(text, '\\S')))"""

    def bands(name: str, src: str) -> str:
        return f"""{name} AS (
  SELECT doc_id, u.idx AS band_idx, u.key AS band_key
  FROM (SELECT doc_id,
               list_transform(range(0, {_MH_BANDS}),
                 b -> {{'idx': b,
                        'key': array_to_string(sig[b*{r}+1 : b*{r}+{r}], ',')}}) AS bl
        FROM {src}), UNNEST(bl) AS t(u))"""

    return f"""
WITH {sigs("nsig", "doc_id % 3 = 0")},
{sigs("lsig", "doc_id % 3 <> 0")},
{bands("nbands", "nsig")},
{bands("lbands", "lsig")},
cand AS (
  SELECT DISTINCT n.doc_id AS nid, l.doc_id AS lid
  FROM nbands n JOIN lbands l
    ON n.band_idx = l.band_idx AND n.band_key = l.band_key),
dropped AS (
  SELECT DISTINCT nid FROM cand
  JOIN nsig a ON a.doc_id = nid
  JOIN lsig b ON b.doc_id = lid
  WHERE len(list_filter(range(0, {h}),
            j -> a.sig[j+1] = b.sig[j+1]))::DOUBLE / {h} >= {_MH_T})
SELECT doc_id, source FROM documents
WHERE doc_id % 3 = 0 AND doc_id NOT IN (SELECT nid FROM dropped)
"""


def _skyline_layers_oracle(
    table: str, dims: list[tuple[str, str]], n_layers: int, groups: int = 128
) -> str:
    """Onion-peeling oracle: per layer, the blocked two-phase skyline of
    the remainder (same construction as ``skyline_oracle_sql``), then an
    anti-join removes that layer's coordinate set before the next."""
    cols = ", ".join(c for c, _ in dims)
    le = " AND ".join(
        f"q.{c} {'<=' if s == 'min' else '>='} p.{c}" for c, s in dims
    )
    lt = " OR ".join(f"q.{c} {'<' if s == 'min' else '>'} p.{c}" for c, s in dims)
    ctes = [f"r0 AS (SELECT DISTINCT {cols} FROM {table})"]
    selects = []
    for i in range(1, n_layers + 1):
        prev = f"r{i-1}"
        ctes.append(
            f"""b{i} AS (
  SELECT *, (row_number() OVER (ORDER BY {cols})) % {groups} AS grp FROM {prev})"""
        )
        ctes.append(
            f"""loc{i} AS (
  SELECT {cols} FROM b{i} p WHERE NOT EXISTS (
    SELECT 1 FROM b{i} q WHERE q.grp = p.grp AND {le} AND ({lt})))"""
        )
        ctes.append(
            f"""s{i} AS (
  SELECT {cols} FROM loc{i} p WHERE NOT EXISTS (
    SELECT 1 FROM loc{i} q WHERE {le} AND ({lt})))"""
        )
        if i < n_layers:
            ctes.append(
                f"r{i} AS (SELECT {cols} FROM {prev} ANTI JOIN s{i} USING ({cols}))"
            )
        selects.append(f"SELECT {cols}, {i}::BIGINT AS layer FROM s{i}")
    return "WITH " + ",\n".join(ctes) + "\n" + "\nUNION ALL\n".join(selects)


def _simhash_sig_sql(bits: int = 60) -> str:
    """CTE body computing (doc_id, simhash_lo, simhash_hi) exactly as
    ``dedup.simhash(hash_mode='md5')``: one md5-derived 60-bit hash per
    whitespace token (duplicates kept), per-bit set-counts, majority
    rule 2*S_i > n."""
    half = bits // 2
    hash60 = _HASH60.format(x="t")
    bit_sums = ",\n         ".join(
        f"sum((h >> {i}) & 1) AS b{i}" for i in range(bits)
    )
    lo = " + ".join(f"CASE WHEN 2*b{i} > n THEN {1 << i} ELSE 0 END" for i in range(half))
    hi = " + ".join(
        f"CASE WHEN 2*b{i} > n THEN {1 << (i - half)} ELSE 0 END"
        for i in range(half, bits)
    )
    return f"""
tok AS (
  SELECT doc_id, {hash60} AS h
  FROM documents, unnest({_TOKS}) AS u(t)),
bitsums AS (
  SELECT doc_id, count(*) AS n,
         {bit_sums}
  FROM tok GROUP BY doc_id),
sig AS (
  SELECT doc_id, ({lo})::BIGINT AS simhash_lo, ({hi})::BIGINT AS simhash_hi
  FROM bitsums)"""


def _simhash_oracle() -> str:
    return f"WITH {_simhash_sig_sql()}\nSELECT doc_id, simhash_lo, simhash_hi FROM sig"


def _simhash_pairs_oracle(max_hamming: int = 3, bits: int = 60) -> str:
    # strategy-independent oracle: ALL pairs within the Hamming radius
    # (the engine's banded-LSH join must reproduce it exactly — with
    # bands > max_hamming the pigeonhole guarantee makes LSH complete)
    half = bits // 2
    return f"""
WITH {_simhash_sig_sql(bits)},
fullsig AS (
  SELECT doc_id, simhash_hi * {1 << half} + simhash_lo AS s FROM sig)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       bit_count(xor(a.s, b.s))::BIGINT AS hamming
FROM fullsig a JOIN fullsig b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.s, b.s)) <= {max_hamming}
"""


def _ngram_jaccard_oracle(table: str = "documents") -> str:
    # strategy-independent oracle: ALL doc pairs above the threshold
    # (all-pairs is fine at sf0.01; the engine's prefix-filter join must
    # reproduce it exactly — prefix filtering is complete, not a heuristic)
    sh_hashed = (
        "list_sort(list_distinct(list_transform(" + _SHINGLES.strip() + ",\n"
        "  s -> ('0x' || substr(md5(s), 1, 15))::BIGINT)))"
    )
    return f"""
WITH base AS (
  SELECT doc_id, {sh_hashed} AS sh FROM {table})
SELECT sa.doc_id AS id_a, sb.doc_id AS id_b,
       len(list_intersect(sa.sh, sb.sh))::DOUBLE /
       len(list_distinct(sa.sh || sb.sh)) AS jac
FROM base sa JOIN base sb ON sa.doc_id < sb.doc_id
WHERE len(list_intersect(sa.sh, sb.sh))::DOUBLE /
      len(list_distinct(sa.sh || sb.sh)) >= {_NJ_T}
"""


#: connected-components CTE fragment over a preceding ``pairs(id_a,
#: id_b)`` CTE: symmetrized edges, node list, recursive min-reachable
#: closure. ONE definition shared by the three component-labeling
#: oracles (dedup_corpus, near_dup_clusters, dedup_keep_best) — a fix
#: to the recursion lands everywhere at once (review find: the block
#: had been pasted verbatim three times).
_CC_CTES = """edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION
  SELECT id_b AS src, id_a AS dst FROM pairs),
nodes AS (SELECT DISTINCT src AS node FROM edges),
reach(node, r) AS (
  SELECT node, node FROM nodes
  UNION
  SELECT e.src, r.r FROM edges e JOIN reach r ON e.dst = r.node)"""


def _dedup_corpus_oracle() -> str:
    # phase 1: exact fingerprint groups keep min-id; phase 2: near-dup
    # clusters (all-pairs Jaccard + recursive-CTE min-label) over the
    # exact-phase survivors keep min-id — mirrors dedup.dedup_corpus
    sh_hashed = (
        "list_sort(list_distinct(list_transform(" + _SHINGLES.strip() + ",\n"
        "  s -> ('0x' || substr(md5(s), 1, 15))::BIGINT)))"
    )
    return rf"""
WITH RECURSIVE base_fp AS (
  SELECT doc_id, md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp
  FROM documents),
reps AS (SELECT min(doc_id) AS doc_id FROM base_fp GROUP BY fp),
docs2 AS (SELECT d.* FROM documents d JOIN reps USING (doc_id)),
sets AS (SELECT doc_id, {sh_hashed} AS sh FROM docs2),
pairs AS (
  SELECT sa.doc_id AS id_a, sb.doc_id AS id_b
  FROM sets sa JOIN sets sb ON sa.doc_id < sb.doc_id
  WHERE len(list_intersect(sa.sh, sb.sh))::DOUBLE /
        len(list_distinct(sa.sh || sb.sh)) >= {_NJ_T}),
{_CC_CTES},
labels AS (SELECT node, min(r) AS cluster_id FROM reach GROUP BY node)
SELECT d.doc_id, d.source FROM docs2 d
WHERE d.doc_id NOT IN (SELECT node FROM labels WHERE node <> cluster_id)
"""


def _lang_id_oracle() -> str:
    padded = "(' ' || lower(text) || ' ')"
    score_terms = {}
    for lang, words in T.LANG_MARKERS:
        terms = [
            f"((length({padded}) - length(replace({padded}, ' {w} ', ''))) / {len(w) + 2})"
            for w in words
        ]
        score_terms[lang] = "(" + " + ".join(terms) + ")"
    whens = " ".join(
        f"WHEN __s_{lang} = __best AND __best > 0 THEN '{lang}'"
        for lang, _ in T.LANG_MARKERS
    )
    best = "greatest(" + ", ".join(f"__s_{lang}" for lang, _ in score_terms.items()) + ")"
    return f"""
WITH raw AS (SELECT doc_id,
  {", ".join(f"{expr} AS __s_{lang}" for lang, expr in score_terms.items())}
  FROM documents),
scored AS (SELECT *, {best} AS __best FROM raw)
SELECT doc_id, CASE {whens} ELSE 'und' END AS pred_lang FROM scored
"""


def _quality_oracle() -> str:
    stripped = "text"
    for ch in T._PUNCT:
        lit = "''''" if ch == "'" else f"'{ch}'"
        stripped = f"replace({stripped}, {lit}, '')"
    return f"""
SELECT doc_id,
       CAST(len(regexp_split_to_array(lower(trim(text)), '\\s+')) AS BIGINT) AS n_tokens,
       CAST(length(text) - length({stripped}) AS BIGINT) AS n_punct,
       (len(regexp_split_to_array(lower(trim(text)), '\\s+')) >= 5
        AND (length(text) - length({stripped}))
            <= len(regexp_split_to_array(lower(trim(text)), '\\s+')) * 0.5) AS keep
FROM documents
"""


_FOLD = "list_reduce(list_transform(range(1, 65), i -> {a}[i] * {b}[i]), (x, y) -> x + y)"


def _fold(dim: int) -> str:
    """dim-parameterized dot-product fold (``_FOLD`` is the fixed-64
    convenience form the embeddings-fixture oracles use)."""
    return (
        f"list_reduce(list_transform(range(1, {dim + 1}),"
        " i -> {a}[i] * {b}[i]), (x, y) -> x + y)"
    )


def _batch_topk_oracle() -> str:
    dot_vp = _FOLD.format(a="e.v", b="p.pvec")
    dot_vv = _FOLD.format(a="e.v", b="e.v")
    dot_pp = _FOLD.format(a="p.pvec", b="p.pvec")
    ids = ", ".join(str(i) for i in _BATCH_PROBE_IDS)
    return f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
p AS (SELECT vec_id AS pid, v AS pvec FROM e WHERE vec_id IN ({ids})),
scored AS (
  SELECT p.pid, e.vec_id,
         {dot_vp} / (sqrt({dot_vv}) * sqrt({dot_pp})) AS cos
  FROM e, p WHERE e.vec_id <> p.pid)
SELECT pid, rank, vec_id FROM (
  SELECT pid, vec_id,
         CAST(row_number() OVER (PARTITION BY pid ORDER BY cos DESC, vec_id)
              AS BIGINT) AS rank
  FROM scored)
WHERE rank <= 5
"""


def _cosine_topk_oracle() -> str:
    dot_vp = _FOLD.format(a="v", b="pv")
    dot_vv = _FOLD.format(a="v", b="v")
    dot_pp = _FOLD.format(a="pv", b="pv")
    return f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
p AS (SELECT v AS pv FROM e WHERE vec_id = {_PROBE_ID}),
scored AS (
  SELECT vec_id, {dot_vp} / (sqrt({dot_vv}) * sqrt({dot_pp})) AS cos
  FROM e, p WHERE vec_id <> {_PROBE_ID})
SELECT CAST(row_number() OVER (ORDER BY cos DESC, vec_id) AS BIGINT) AS rank, vec_id
FROM scored ORDER BY cos DESC, vec_id LIMIT {_TOPK_K}
"""


def _embedding_decontam_oracle() -> str:
    """Max cosine vs the probe subset: the same sequential-fold dot
    product every embeddings oracle uses; MAX over a fixed set of
    doubles is fold-order-free, so no rank/row-set boundary exists —
    only per-pair float arithmetic under the 9-decimal rounding. NULL
    vectors are excluded on both sides, and the norm clamp
    greatest(sqrt(.), 1e-12) is the operator's exact expression (an
    all-zero vector scores ~0 instead of NaN)."""
    dot_vp = _FOLD.format(a="v", b="pv")
    dot_vv = _FOLD.format(a="v", b="v")
    dot_pp = _FOLD.format(a="pv", b="pv")
    return f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
           WHERE embedding IS NOT NULL),
p AS (SELECT v AS pv FROM e WHERE vec_id < {_EDC_PROBE_MAX})
SELECT e.vec_id,
       max({dot_vp} / (greatest(sqrt({dot_vv}), 1e-12)
                       * greatest(sqrt({dot_pp}), 1e-12))) AS max_sim
FROM e, p GROUP BY e.vec_id
"""


def _multimodal_meta_oracle() -> str:
    byte = lambda i: f"('0x' || substr(sha256(text), {2 * i + 1}, 2))::INT"  # noqa: E731
    return f"""
SELECT doc_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       md5(text) AS checksum,
       CAST(16 + ({byte(0)} % 240) AS INT) AS width,
       CAST(16 + ({byte(1)} % 240) AS INT) AS height,
       CASE {byte(2)} % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg' ELSE 'webp' END AS format
FROM documents
"""


def _shingles_sql_k(k: int) -> str:
    """Distinct word ``k``-shingle SQL mirroring ``dedup.shingles(k=k)``
    (generalization of the hardcoded k=3 ``_SHINGLES``)."""
    concat = " || ' ' || ".join(f"{_TOKS}[i+{j + 1}]" for j in range(k))
    return f"""list_distinct(CASE WHEN len({_TOKS}) >= {k}
     THEN list_transform(range(0, len({_TOKS}) - {k - 1}), i -> {concat})
     ELSE [array_to_string({_TOKS}, ' ')] END)"""


def _repetition_oracle() -> str:
    # mirrors filtering.repetition_stats default thresholds exactly:
    # int/int divisions as double (bit-identical across engines), keep =
    # conjunction of the same comparisons
    return r"""
WITH base AS (
  SELECT doc_id,
         regexp_split_to_array(lower(trim(coalesce(text, ''))), '\s+') AS toks,
         list_filter(regexp_split_to_array(coalesce(text, ''), '\n'),
                     ln -> trim(ln) <> '') AS lines
  FROM documents),
m AS (
  SELECT doc_id,
         len(toks) AS nw, len(lines) AS nl,
         len(list_distinct(toks)) AS ndw, len(list_distinct(lines)) AS ndl,
         CASE WHEN len(toks) <= 100000 THEN
           list_max(list_transform(list_distinct(toks),
                    w -> len(list_filter(toks, x -> x = w)))) END AS topc,
         list_sum(list_transform(toks, w -> length(w))) AS tchars
  FROM base),
f AS (
  SELECT doc_id, nw,
         CASE WHEN nl > 0 THEN (nl - ndl)::DOUBLE / nl ELSE 0.0 END AS dup_line_frac,
         CASE WHEN nw > 0 THEN (nw - ndw)::DOUBLE / nw ELSE 0.0 END AS dup_word_frac,
         CASE WHEN nw > 0 THEN topc::DOUBLE / nw ELSE 0.0 END AS top_word_frac,
         CASE WHEN nw > 0 THEN tchars::DOUBLE / nw ELSE 0.0 END AS mean_word_len
  FROM m)
SELECT doc_id, CAST(nw AS BIGINT) AS n_words,
       dup_line_frac, dup_word_frac, top_word_frac, mean_word_len,
       (nw >= 5 AND nw <= 100000 AND dup_line_frac <= 0.3
        AND dup_word_frac <= 0.5 AND top_word_frac <= 0.2) AS keep
FROM f
"""


def _pii_oracle() -> str:
    # same enrichment suffix + pattern chain (and replacement order) as
    # _q_pii_scrub / filtering._PII_PATTERNS; counts run on the original
    pats = {k: p for k, p, _ in FL._PII_PATTERNS}
    repl = {k: r for k, _, r in FL._PII_PATTERNS}
    scrubbed = "txt"
    for kind, _, _ in FL._PII_PATTERNS:
        scrubbed = f"regexp_replace({scrubbed}, '{pats[kind]}', '{repl[kind]}', 'g')"
    counts = ",\n       ".join(
        f"CAST(len(regexp_extract_all(txt, '{pats[kind]}')) AS BIGINT) AS n_{kind}"
        for kind, _, _ in FL._PII_PATTERNS
    )
    return f"""
WITH t AS (
  SELECT doc_id,
         coalesce(text, '') || ' reach user' || doc_id || '@example.com via 10.0.0.'
           || (doc_id % 200) || ' or +1 555-123-4567' AS txt
  FROM documents)
SELECT doc_id,
       {counts},
       {scrubbed} AS text_scrubbed
FROM t
"""


def _decontaminate_oracle() -> str:
    sh8 = _shingles_sql_k(8)
    h = _HASH60.format(x="g")
    return f"""
WITH sh AS (
  SELECT doc_id, {sh8} AS s FROM documents),
probe AS (
  SELECT DISTINCT {h} AS h
  FROM sh, unnest(s) AS u(g) WHERE doc_id % 50 = 0),
train AS (SELECT doc_id, s FROM sh WHERE doc_id % 50 <> 0),
grams AS (
  SELECT doc_id, {h} AS h
  FROM train, unnest(s) AS u(g)),
hits AS (
  SELECT doc_id, count(*) AS n FROM grams JOIN probe USING (h) GROUP BY doc_id)
SELECT t.doc_id,
       CAST(coalesce(h.n, 0) AS BIGINT) AS n_contaminated_grams,
       coalesce(h.n, 0) >= 1 AS contaminated
FROM train t LEFT JOIN hits h ON t.doc_id = h.doc_id
"""


def _column_profile_oracle(table: str, cols: list[tuple[str, bool]]) -> str:
    # one SELECT per profiled column (numeric flag controls min/max/mean);
    # count(DISTINCT) matches the engine's distinct_mode="exact"
    selects = []
    for c, numeric in cols:
        if numeric:
            mmm = (
                f"CAST(min({c}) AS DOUBLE) AS min, CAST(max({c}) AS DOUBLE) AS max,\n"
                f"       avg(CAST({c} AS DOUBLE)) AS mean"
            )
        else:
            mmm = (
                "CAST(NULL AS DOUBLE) AS min, CAST(NULL AS DOUBLE) AS max,\n"
                "       CAST(NULL AS DOUBLE) AS mean"
            )
        selects.append(
            f"""SELECT '{c}' AS "column", CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(CASE WHEN {c} IS NULL THEN 1 END) AS BIGINT) AS n_nulls,
       CAST(count(DISTINCT {c}) AS BIGINT) AS approx_distinct,
       {mmm}
FROM {table}"""
        )
    return "\nUNION ALL\n".join(selects)


def _substring_spans_oracle(k: int, min_count: int = 2) -> str:
    # exact mirror of operators/dedup.py::substring_dedup_spans in md5
    # mode: same tokenization (lower/trim/\s+ split), same 1-based
    # k-token windows, same md5-15-hex window keys, same >= min_count
    # duplicated rule, same gaps-and-islands merge (brk when the start
    # exceeds the running max end + 1; first row coalesces to -10 on
    # both sides).
    return rf"""
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS t
  FROM documents),
pos AS (
  SELECT doc_id, t, unnest(range(1, len(t) - {k} + 2)) AS s
  FROM toks WHERE len(t) >= {k}),
win AS (
  SELECT doc_id, s, s + {k - 1} AS e,
         ('0x' || substr(md5(array_to_string(t[s:s+{k - 1}], ' ')), 1, 15))::BIGINT AS h
  FROM pos),
dup AS (SELECT h FROM win GROUP BY h HAVING count(*) >= {min_count}),
spans AS (SELECT w.doc_id, w.s, w.e FROM win w JOIN dup USING (h)),
marked AS (
  SELECT doc_id, s, e,
         CASE WHEN s > coalesce(max(e) OVER (PARTITION BY doc_id ORDER BY s
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -10) + 1
              THEN 1 ELSE 0 END AS brk
  FROM spans),
isl AS (SELECT doc_id, s, e,
               sum(brk) OVER (PARTITION BY doc_id ORDER BY s
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS g
        FROM marked)
SELECT doc_id,
       CAST(min(s) AS BIGINT) AS span_start,
       CAST(max(e) AS BIGINT) AS span_end,
       CAST(max(e) - min(s) + 1 AS BIGINT) AS span_tokens
FROM isl GROUP BY doc_id, g
"""


def _substring_scrub_oracle(k: int, min_count: int = 2) -> str:
    # mirror of operators/dedup.py::substring_scrub (md5 mode):
    # COMPOSES _substring_spans_oracle (one source of truth for the
    # spans pipeline — a one-sided fix can't desync the two oracles),
    # then per-doc token reassembly skipping covered 1-based
    # positions; docs without spans (including sub-k docs) pass
    # through with their normalized token text. NULL text is
    # coalesced to '' on BOTH sides (operator + oracle).
    return rf"""
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(lower(trim(coalesce(text, ''))), '\s+') AS t
  FROM documents),
merged AS (
  SELECT doc_id, span_start AS ss, span_end AS ee
  FROM ({_substring_spans_oracle(k, min_count)})),
tok AS (SELECT doc_id, unnest(t) AS tk, generate_subscripts(t, 1) AS i FROM toks),
kept AS (
  SELECT tok.doc_id, tok.tk, tok.i FROM tok
  WHERE NOT EXISTS (SELECT 1 FROM merged m
                    WHERE m.doc_id = tok.doc_id AND tok.i BETWEEN m.ss AND m.ee)),
agg AS (SELECT doc_id, string_agg(tk, ' ' ORDER BY i) AS txt, count(*) AS nk
        FROM kept GROUP BY doc_id)
SELECT t.doc_id,
       coalesce(a.txt, '') AS text_scrubbed,
       CAST(len(t.t) AS BIGINT) AS n_tokens,
       CAST(len(t.t) - coalesce(a.nk, 0) AS BIGINT) AS n_dropped
FROM toks t LEFT JOIN agg a USING (doc_id)
"""


def _cosine_near_dup_oracle(threshold: float) -> str:
    # all-pairs exact threshold join — valid because the driver entry
    # runs the LSH pipeline in its exhaustive (single-bucket) mode
    dot_ab = _FOLD.format(a="a.v", b="b.v")
    dot_vv = _FOLD.format(a="v", b="v")
    return f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
n AS (SELECT vec_id, v, sqrt({dot_vv}) AS nv FROM e)
SELECT a.vec_id AS id_a, b.vec_id AS id_b
FROM n a JOIN n b ON a.vec_id < b.vec_id
WHERE {dot_ab} / (a.nv * b.nv) >= {threshold}
"""


def _cosine_near_dup_lsh_oracle(
    threshold: float, n_planes: int, n_tables: int, dim: int = 64
) -> str:
    # EXACT oracle for the LSH mode itself (plane_mode="md5"): the
    # plane matrix is the parity of md5(t || '_' || p || '_' || i) and
    # the projection runs on floor(v[i] * 1e6) BIGINTs, so bucket ids
    # are integer-exact in both engines; candidates = co-bucketed in
    # any table, verify = exact cosine (same fold as the exhaustive
    # oracle). Mirrors operators/similarity.py::_md5_planes +
    # _bucket_udf's integer path. ``dim`` must match the embeddings
    # fixture's vector length (the Spark side derives it from the
    # data); both the bucketing AND the verify fold use it, so a
    # non-64 fixture can't silently verify on truncated/NULL-summed
    # vectors.
    dot_ab = _fold(dim).format(a="a.v", b="b.v")
    dot_vv = _fold(dim).format(a="v", b="v")
    return f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
q AS (SELECT vec_id, i, CAST(floor(v[i] * 1000000.0) AS BIGINT) AS qv
      FROM e, range(1, {dim + 1}) r(i)),
c AS (SELECT t, p, i,
             CASE WHEN ('0x' || substr(md5(CAST(t AS VARCHAR) || '_' ||
                        CAST(p AS VARCHAR) || '_' ||
                        CAST(i - 1 AS VARCHAR)), 1, 15))::BIGINT % 2 = 0
                  THEN 1 ELSE -1 END AS cv
      FROM range(0, {n_tables}) rt(t),
           range(0, {n_planes}) rp(p),
           range(1, {dim + 1}) ri(i)),
dots AS (SELECT q.vec_id, c.t, c.p, sum(q.qv * c.cv) AS dp
         FROM q JOIN c USING (i) GROUP BY 1, 2, 3),
buckets AS (SELECT vec_id, t,
                   sum(CASE WHEN dp > 0 THEN (CAST(1 AS BIGINT) << p)
                            ELSE 0 END) AS b
            FROM dots GROUP BY 1, 2),
cand AS (SELECT DISTINCT x.vec_id AS id_a, y.vec_id AS id_b
         FROM buckets x JOIN buckets y
           ON x.t = y.t AND x.b = y.b AND x.vec_id < y.vec_id),
n AS (SELECT vec_id, v, sqrt({dot_vv}) AS nv FROM e)
SELECT id_a, id_b
FROM cand
JOIN n a ON a.vec_id = cand.id_a
JOIN n b ON b.vec_id = cand.id_b
WHERE {dot_ab} / (a.nv * b.nv) >= {threshold}
"""


def _vocab_values_sql() -> str:
    """GREEDY_VOCAB as a SQL VALUES list ``('piece', id), ...`` — the
    ONE vocab definition (operators/text.py) feeds both the Spark
    encoder and the DuckDB oracle, so they cannot drift."""
    return ", ".join(
        "('" + p.replace("'", "''") + "', " + str(i) + ")"
        for i, p in enumerate(T.GREEDY_VOCAB)
    )


_ORACLES: dict[str, str] = {
    "dedup_exact_events": "SELECT DISTINCT user_id, event_type, value FROM events",
    "text_stats_documents": r"""
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars,
       CAST(min(n_chars) AS BIGINT) AS min_chars,
       CAST(max(n_chars) AS BIGINT) AS max_chars,
       CAST(sum(len(regexp_split_to_array(lower(trim(text)), '\s+'))) AS BIGINT)
         AS total_tokens
FROM documents GROUP BY lang
""",
    "subword_count_documents": r"""
SELECT doc_id,
       CAST(coalesce(list_sum(list_transform(
           regexp_extract_all(lower(text), '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+'),
           r -> CAST(ceil(length(r) / 6.0) AS BIGINT))), 0) AS BIGINT) AS n_subwords
FROM documents
""",
    "lang_id_documents": _lang_id_oracle(),
    "fingerprint_documents": r"""
SELECT doc_id, md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp
FROM documents
""",
    "quality_documents": _quality_oracle(),
    "winnow_fingerprints_documents": f"""
WITH base AS (SELECT doc_id, {_ORDERED_SHINGLES.strip()} AS sh FROM documents),
ex AS (SELECT doc_id, unnest(sh) AS s, generate_subscripts(sh, 1) - 1 AS pos0 FROM base),
h AS (SELECT doc_id, pos0, ('0x' || substr(md5(s), 1, 15))::BIGINT AS h FROM ex),
wm AS (SELECT doc_id, pos0,
              min(h) OVER (PARTITION BY doc_id ORDER BY pos0
                           ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp,
              count(*) OVER (PARTITION BY doc_id) AS n
       FROM h)
SELECT DISTINCT doc_id, fp FROM wm WHERE pos0 <= greatest(n - 4, 0)
""",
    "minhash_pairs_documents": _minhash_oracle(),
    "dedup_incremental_neardup_documents": _incr_neardup_oracle(),
    "simhash_documents": _simhash_oracle(),
    "simhash_pairs_documents": _simhash_pairs_oracle(_SH_MAX_HAMMING),
    "chunk_documents": """
WITH toks AS (
  SELECT doc_id, {toks} AS t, len({toks}) AS n FROM documents),
chunks AS (
  SELECT doc_id, i AS chunk_idx, t[i*48+1 : i*48+64] AS c
  FROM toks, unnest(range(0, cast(ceil(n / 48.0) AS BIGINT))) AS u(i))
SELECT doc_id, chunk_idx::BIGINT AS chunk_idx,
       array_to_string(c, ' ') AS chunk_text, len(c)::BIGINT AS n_tokens
FROM chunks
""".replace("{toks}", _TOKS),
    "rolling_stats_events": """
SELECT event_id, user_id,
       count(*) OVER frame::BIGINT AS n_in_frame,
       min(value) OVER frame AS min_value,
       max(value) OVER frame AS max_value,
       lag(value, 1) OVER w AS prev_value
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id),
       frame AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
""",
    # strategy-independent k-skyband oracle: exact dominator-count subquery
    "k_skyband_part": """
SELECT DISTINCT p_retailprice, p_size, cnt::BIGINT AS n_dominators FROM (
  SELECT p.p_retailprice, p.p_size,
         (SELECT count(*) FROM part q
          WHERE q.p_retailprice <= p.p_retailprice AND q.p_size <= p.p_size
            AND (q.p_retailprice < p.p_retailprice OR q.p_size < p.p_size)) AS cnt
  FROM part p)
WHERE cnt < 3
""",
    # gaps-and-islands: lag marks session starts, running sum numbers them
    "funnel_events": """
WITH s1 AS (
  SELECT user_id, min(ts) AS step1_ts FROM events
  WHERE event_type = 'view' GROUP BY user_id),
s2 AS (
  SELECT e.user_id, min(e.ts) AS step2_ts FROM events e
  JOIN s1 USING (user_id)
  WHERE e.event_type = 'click' AND e.ts > s1.step1_ts
  GROUP BY e.user_id),
s3 AS (
  SELECT e.user_id, min(e.ts) AS step3_ts FROM events e
  JOIN s2 USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ts > s2.step2_ts
  GROUP BY e.user_id)
SELECT s1.user_id, step1_ts, step2_ts, step3_ts,
       (1 + CASE WHEN step2_ts IS NOT NULL THEN 1 ELSE 0 END
          + CASE WHEN step3_ts IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS reached
FROM s1 LEFT JOIN s2 USING (user_id) LEFT JOIN s3 USING (user_id)
""",
    "cohort_retention_events": """
WITH ev AS (
  SELECT user_id, CAST(date_trunc('week', ts) AS TIMESTAMP) AS p
  FROM events WHERE ts IS NOT NULL),
first AS (SELECT user_id, min(p) AS cohort FROM ev GROUP BY user_id),
activity AS (SELECT DISTINCT user_id, p FROM ev)
SELECT cohort, (date_diff('day', cohort::DATE, p::DATE) // 7)::BIGINT AS period_k,
       count(DISTINCT a.user_id)::BIGINT AS n_users
FROM activity a JOIN first USING (user_id)
GROUP BY 1, 2
""",
    "sessionize_events": """
WITH flagged AS (
  SELECT event_id, user_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
              THEN 1 ELSE 0 END AS is_start
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts))
SELECT event_id, user_id,
       (sum(is_start) OVER (PARTITION BY user_id ORDER BY ts
                            ROWS UNBOUNDED PRECEDING) - 1)::BIGINT AS session_id
FROM flagged
""",
    "skyline_layers_orders": _skyline_layers_oracle(
        "orders", [("o_totalprice", "max"), ("o_orderdate", "min")], 3
    ),
    "pack_batches_orders": """
WITH h AS (
  SELECT o_orderkey,
         ('0x' || substr(md5(o_orderkey::VARCHAR || '#' || 7), 1, 15))::BIGINT AS hh
  FROM orders)
SELECT o_orderkey, (hh % 32)::BIGINT AS batch_id,
       (row_number() OVER (PARTITION BY hh % 32 ORDER BY hh, o_orderkey) - 1)::BIGINT AS batch_pos
FROM h
""",
    # strategy-independent range-join oracle: plain theta join
    "range_join_error_click_events": """
SELECT e.event_id AS err_id, c.event_id AS click_id
FROM events e, events c
WHERE e.event_type = 'error' AND c.event_type = 'click'
  AND c.ts >= e.ts AND c.ts < e.ts + INTERVAL 10 MINUTE
""",
    "ngram_jaccard_documents": _ngram_jaccard_oracle(),
    # connected components over the near-dup pair graph: the iterative
    # min-label propagation must equal the recursive-CTE min-reachable-id
    "near_dup_clusters_documents": f"""
WITH RECURSIVE pairs AS ({_ngram_jaccard_oracle().strip()}),
{_CC_CTES}
SELECT node, CAST(min(r) AS BIGINT) AS cluster_id FROM reach GROUP BY node
""",
    # round-9 keep-best dedup over the same recursive-CTE components:
    # singletons (docs outside the pair graph) label themselves via
    # the left-join coalesce; winner per cluster by (n_chars DESC,
    # doc_id) with NULLS LAST made explicit (engines disagree on the
    # default NULL order) — all-integer/boolean output
    "dedup_keep_best_documents": f"""
WITH RECURSIVE pairs AS ({_ngram_jaccard_oracle().strip()}),
{_CC_CTES},
clusters AS (SELECT node, min(r) AS cluster_id FROM reach GROUP BY node),
labeled AS (
  SELECT d.doc_id, coalesce(c.cluster_id, d.doc_id) AS cluster_id, d.n_chars
  FROM documents d LEFT JOIN clusters c ON d.doc_id = c.node)
SELECT doc_id, CAST(cluster_id AS BIGINT) AS cluster_id,
       row_number() OVER (PARTITION BY cluster_id
                          ORDER BY n_chars DESC NULLS LAST, doc_id) = 1 AS keep
FROM labeled
""",
    "cosine_topk_embeddings": _cosine_topk_oracle(),
    # exhaustive-mode ANN entries (see the query docstrings): the exact
    # oracles apply because the driver parameters disable pruning
    "cosine_topk_lsh_embeddings": _cosine_topk_oracle(),
    "cosine_topk_ivf_embeddings": _cosine_topk_oracle(),
    "embedding_decontam_embeddings": _embedding_decontam_oracle(),
    # round-9 shingle novelty: document frequency over the SAME
    # distinct-3-shingle macro the jaccard oracles use; novelty is an
    # int/int division — no float caveat. NULL text filtered
    # explicitly (the Spark shingles fallback would mint '' for NULL).
    "novelty_documents": f"""
WITH sh AS (
  SELECT doc_id, unnest({_SHINGLES}) AS s
  FROM documents WHERE text IS NOT NULL),
cnt AS (SELECT s, count(*) AS df FROM sh GROUP BY s)
SELECT sh.doc_id,
       CAST(count(*) AS BIGINT) AS n_shingles,
       CAST(sum(CASE WHEN cnt.df = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_unique,
       sum(CASE WHEN cnt.df = 1 THEN 1 ELSE 0 END) / count(*) AS novelty
FROM sh JOIN cnt USING (s)
GROUP BY sh.doc_id
""",
    # round-9 snapshot diff: the "v2" snapshot derives from documents
    # with the same deterministic arithmetic in both engines; '||'
    # with a NULL text is NULL in DuckDB exactly as Spark's concat;
    # IS NOT DISTINCT FROM == Spark's eqNullSafe. Added rows re-key to
    # -(doc_id+1): negative, so colliding with a real id is impossible
    # at any scale factor.
    "snapshot_diff_documents": """
WITH newsnap AS (
  SELECT doc_id,
         CASE WHEN doc_id % 41 = 0 THEN text || ' v2' ELSE text END AS text,
         lang, source, n_chars
  FROM documents WHERE doc_id % 97 <> 0
  UNION ALL
  SELECT -(doc_id + 1), text, lang, source, n_chars
  FROM documents WHERE doc_id % 113 = 0),
j AS (
  SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
         o.doc_id IS NOT NULL AS in_old,
         n.doc_id IS NOT NULL AS in_new,
         (o.text IS NOT DISTINCT FROM n.text)
         AND (o.lang IS NOT DISTINCT FROM n.lang)
         AND (o.source IS NOT DISTINCT FROM n.source)
         AND (o.n_chars IS NOT DISTINCT FROM n.n_chars) AS same
  FROM documents o FULL OUTER JOIN newsnap n ON o.doc_id = n.doc_id)
SELECT doc_id,
       CASE WHEN NOT in_old THEN 'added'
            WHEN NOT in_new THEN 'removed'
            WHEN same THEN 'unchanged' ELSE 'changed' END AS status
FROM j
""",
    # round-9 categorical MI: contingency counts are integer-exact;
    # the ratio-of-probabilities form matches the operator expression
    # exactly (the integer cross-product form would overflow a long
    # near 10^10 rows on the Spark side)
    "mi_orders": """
WITH base AS (
  SELECT o_orderstatus AS a, o_orderpriority AS b FROM orders
  WHERE o_orderstatus IS NOT NULL AND o_orderpriority IS NOT NULL),
joint AS (SELECT a, b, count(*) AS cab FROM base GROUP BY a, b),
ma AS (SELECT a, sum(cab) AS ca FROM joint GROUP BY a),
mb AS (SELECT b, sum(cab) AS cb FROM joint GROUP BY b),
tot AS (SELECT sum(cab) AS n FROM joint)
SELECT sum((cab / n) * ln((cab / n) / ((ca / n) * (cb / n)))) AS mi_nats,
       CAST(sum(cab) AS BIGINT) AS n_rows,
       CAST(count(DISTINCT a) AS BIGINT) AS n_a,
       CAST(count(DISTINCT b) AS BIGINT) AS n_b
FROM joint JOIN ma USING (a) JOIN mb USING (b) CROSS JOIN tot
""",
    "cosine_near_dup_embeddings": _cosine_near_dup_oracle(_ND_LSH_T),
    "cosine_near_dup_lsh_embeddings": _cosine_near_dup_lsh_oracle(
        _ND_LSH_T, _ND_LSH_PLANES, _ND_LSH_TABLES
    ),
    # substring-dedup rows (round 8): exact oracles via the md5 hash
    # mode — the window keys are bit-reproducible in DuckDB, like the
    # MinHash ledger rows
    "substring_spans_documents": _substring_spans_oracle(_SS_K),
    "substring_scrub_documents": _substring_scrub_oracle(_SS_K),
    # round-8: corpus-fit add-one unigram LM score; exact arithmetic
    # except ln (engines agree to ~1e-12, inside compare rounding)
    "unigram_nll_documents": r"""
WITH tok AS (
  SELECT doc_id, unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS t
  FROM documents),
vocab AS (SELECT t, count(*) AS c FROM tok GROUP BY t),
tot AS (SELECT sum(c) AS n, count(*) AS v FROM vocab)
SELECT tok.doc_id,
       avg(-ln((vocab.c + 1.0) / (tot.n + tot.v))) AS avg_nll,
       CAST(count(*) AS BIGINT) AS n_tokens
FROM tok JOIN vocab USING (t) CROSS JOIN tot
GROUP BY tok.doc_id
""",
    # bigram positions are 1-based list slices i -> (toks[i], toks[i+1]);
    # ctx(w) = occurrences of w WITH a successor = prev-side bigram
    # counts, and V counts the distinct UNIGRAM vocabulary — identical
    # definitions to the Spark operator. NULL text drops everywhere in
    # both engines (NULL token array -> empty range / dropped explode),
    # matching unigram_nll's convention.
    "bigram_nll_documents": r"""
WITH arr AS (
  SELECT doc_id,
         regexp_split_to_array(lower(trim(text)), '\s+') AS toks
  FROM documents),
bg AS (
  SELECT doc_id, toks[i] AS prev, toks[i] || ' ' || toks[i + 1] AS b
  FROM arr, unnest(range(1, len(toks))) AS r(i)),
bgc AS (SELECT b, count(*) AS c FROM bg GROUP BY b),
ctx AS (SELECT prev, count(*) AS cc FROM bg GROUP BY prev),
vocab AS (
  SELECT count(DISTINCT t) AS v FROM (
    SELECT unnest(toks) AS t FROM arr))
SELECT bg.doc_id,
       avg(-ln((bgc.c + 1.0) / (ctx.cc + vocab.v))) AS avg_nll,
       CAST(count(*) AS BIGINT) AS n_bigrams
FROM bg JOIN bgc USING (b) JOIN ctx USING (prev) CROSS JOIN vocab
GROUP BY bg.doc_id
""",
    # ranks tie-break on doc_id so every rank/sum/cut is deterministic;
    # DuckDB regexp_replace needs the 'g' flag to match Spark's
    # replace-all; the cut index ceil(0.6 * n) is the identical IEEE
    # multiply+ceil the operator runs driver-side
    "quality_ensemble_documents": r"""
WITH sig AS (
  SELECT doc_id,
         CAST(len(regexp_split_to_array(lower(trim(text)), '\s+')) AS BIGINT)
           AS n_tokens,
         length(text) / len(regexp_split_to_array(lower(trim(text)), '\s+'))
           AS avg_wlen,
         (length(text) - length(regexp_replace(text, '[0-9]', '', 'g')))
           / length(text) AS digit_frac
  FROM documents WHERE text IS NOT NULL AND length(text) > 0),
r AS (
  SELECT doc_id,
         CAST(row_number() OVER (ORDER BY n_tokens DESC, doc_id) AS BIGINT)
           AS rank_n_tokens,
         CAST(row_number() OVER (ORDER BY avg_wlen DESC, doc_id) AS BIGINT)
           AS rank_avg_wlen,
         CAST(row_number() OVER (ORDER BY digit_frac ASC, doc_id) AS BIGINT)
           AS rank_digit_frac
  FROM sig),
f AS (
  SELECT doc_id, rank_n_tokens, rank_avg_wlen, rank_digit_frac,
         CAST(rank_n_tokens + rank_avg_wlen + rank_digit_frac AS BIGINT)
           AS rank_sum,
         row_number() OVER (
           ORDER BY rank_n_tokens + rank_avg_wlen + rank_digit_frac, doc_id)
           AS fin,
         count(*) OVER () AS n
  FROM r)
SELECT doc_id, rank_n_tokens, rank_avg_wlen, rank_digit_frac, rank_sum,
       fin <= ceil(0.6 * n) AS keep
FROM f
""",
    # round-9 DSIR log-weights: hashed unigram+bigram buckets are
    # bit-reproducible via the md5-mode 60-bit hash (nonnegative, so
    # plain % == Spark's pmod); target multinomial = the English
    # slice, raw = the whole corpus, add-one smoothing over B buckets;
    # the only engine-float step is the ln (~1e-12 agreement). Bigram
    # positions mirror bigram_nll_documents' 1-based slice convention;
    # NULL text drops in both engines. Score surface only — the
    # rank-cut keep boolean is NOT oracled (duplicate-text documents
    # tie in exact math but can fold 1 ulp apart in Spark's partial
    # aggregation, and a tie at the cut index would then tie-break
    # differently than DuckDB; the cut is hand-model pytest-graded).
    "dsir_logweights_documents": rf"""
WITH arr AS (
  SELECT doc_id, lang, regexp_split_to_array(lower(trim(text)), '\s+') AS toks
  FROM documents),
feats AS (
  SELECT doc_id, lang, unnest(toks) AS f FROM arr
  UNION ALL
  SELECT doc_id, lang, toks[i] || ' ' || toks[i + 1] AS f
  FROM arr, unnest(range(1, len(toks))) AS r(i)),
occ AS (
  SELECT doc_id, lang,
         ('0x' || substr(md5(f), 1, 15))::BIGINT % {_DSIR_BUCKETS} AS b
  FROM feats),
qc AS (SELECT b, count(*) AS cq FROM occ GROUP BY b),
pc AS (SELECT b, count(*) AS cp FROM occ
       WHERE lang = '{_DSIR_TARGET_LANG}' GROUP BY b),
tot AS (
  SELECT (SELECT sum(cq) FROM qc) AS nq,
         (SELECT coalesce(sum(cp), 0) FROM pc) AS np),
ratio AS (
  SELECT qc.b,
         ln((coalesce(pc.cp, 0) + 1.0) / (tot.np + {_DSIR_BUCKETS}))
           - ln((qc.cq + 1.0) / (tot.nq + {_DSIR_BUCKETS})) AS lr
  FROM qc LEFT JOIN pc USING (b) CROSS JOIN tot)
SELECT occ.doc_id, sum(ratio.lr) AS logw,
       CAST(count(*) AS BIGINT) AS n_feats
FROM occ JOIN ratio USING (b)
GROUP BY occ.doc_id
""",
    # round-10 FULL DSIR select (tie-exact): per-(doc, bucket) integer
    # counts, ONE IEEE product per bucket (deterministic), exact
    # order-free DECIMAL(38,18) summation — identical documents tie
    # bitwise in both engines and break by id identically, so the
    # rank + ceil(keep_frac*N) cut is oracle-able end-to-end. The only
    # engine-float left is the per-bucket ln (~1e-12); a rank flip
    # would need two DISTINCT-score docs inside that — not a tie
    # class. All output columns integer/boolean.
    "dsir_select_documents": rf"""
WITH arr AS (
  SELECT doc_id, lang, regexp_split_to_array(lower(trim(text)), '\s+') AS toks
  FROM documents),
feats AS (
  SELECT doc_id, lang, unnest(toks) AS f FROM arr
  UNION ALL
  SELECT doc_id, lang, toks[i] || ' ' || toks[i + 1] AS f
  FROM arr, unnest(range(1, len(toks))) AS r(i)),
occ AS (
  SELECT doc_id, lang,
         ('0x' || substr(md5(f), 1, 15))::BIGINT % {_DSIR_BUCKETS} AS b
  FROM feats),
qc AS (SELECT b, count(*) AS cq FROM occ GROUP BY b),
pc AS (SELECT b, count(*) AS cp FROM occ
       WHERE lang = '{_DSIR_TARGET_LANG}' GROUP BY b),
tot AS (
  SELECT (SELECT sum(cq) FROM qc) AS nq,
         (SELECT coalesce(sum(cp), 0) FROM pc) AS np),
ratio AS (
  SELECT qc.b,
         ln((coalesce(pc.cp, 0) + 1.0) / (tot.np + {_DSIR_BUCKETS}))
           - ln((qc.cq + 1.0) / (tot.nq + {_DSIR_BUCKETS})) AS lr
  FROM qc LEFT JOIN pc USING (b) CROSS JOIN tot),
docb AS (SELECT doc_id, b, count(*) AS cnt FROM occ GROUP BY doc_id, b),
sc AS (
  SELECT docb.doc_id,
         sum(CAST(docb.cnt * ratio.lr AS DECIMAL(38,18))) AS lwx,
         CAST(sum(docb.cnt) AS BIGINT) AS n_feats
  FROM docb JOIN ratio USING (b)
  GROUP BY docb.doc_id),
f AS (
  SELECT doc_id, n_feats,
         row_number() OVER (ORDER BY lwx DESC, doc_id) AS rnk,
         count(*) OVER () AS n
  FROM sc)
SELECT doc_id, n_feats, CAST(rnk AS BIGINT) AS rank,
       rnk <= ceil({_DSIR_KEEP} * n) AS keep
FROM f
""",
    # round-9 PMI collocations: the min-support predicate on the
    # integer pair count decides the row set exactly; pmi is a value
    # column only (ln ~1e-12). Bigram positions mirror
    # bigram_nll_documents' 1-based slice convention.
    "pmi_collocations_documents": rf"""
WITH arr AS (
  SELECT regexp_split_to_array(lower(trim(text)), '\s+') AS toks
  FROM documents),
bg AS (
  SELECT toks[i] AS w1, toks[i + 1] AS w2
  FROM arr, unnest(range(1, len(toks))) AS r(i)),
bgc AS (SELECT w1, w2, count(*) AS pair_count FROM bg GROUP BY w1, w2),
uni AS (
  SELECT t, count(*) AS c FROM (SELECT unnest(toks) AS t FROM arr)
  GROUP BY t),
tot AS (
  SELECT (SELECT sum(pair_count) FROM bgc) AS nbg,
         (SELECT sum(c) FROM uni) AS nu)
SELECT b.w1, b.w2, CAST(b.pair_count AS BIGINT) AS pair_count,
       CAST(u1.c AS BIGINT) AS w1_count, CAST(u2.c AS BIGINT) AS w2_count,
       ln((b.pair_count / tot.nbg) / ((u1.c / tot.nu) * (u2.c / tot.nu)))
         AS pmi
FROM bgc b
JOIN uni u1 ON b.w1 = u1.t
JOIN uni u2 ON b.w2 = u2.t
CROSS JOIN tot
WHERE b.pair_count >= {_PMI_MIN_COUNT}
""",
    # round-9 slice divergence: the corpus unigram table is DERIVED
    # from the per-(lang, token) aggregate, exactly as the operator
    # does; the JS term for corpus tokens absent from a slice
    # collapses to ln2 * (1 - covered corpus mass), so the sum runs
    # over the slice support only. ln2 is the identical double literal
    # the operator embeds (math.log(2.0)); counts divide as doubles in
    # both engines.
    "lang_divergence_documents": r"""
WITH occ AS (
  SELECT lang, unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS t
  FROM documents),
st AS (SELECT lang, t, count(*) AS cg FROM occ GROUP BY lang, t),
ct AS (SELECT t, sum(cg) AS c FROM st GROUP BY t),
gn AS (SELECT lang, sum(cg) AS ng, count(*) AS vg FROM st GROUP BY lang),
tot AS (SELECT sum(c) AS n FROM ct),
j AS (
  SELECT st.lang, st.cg, ct.c, gn.ng, gn.vg, tot.n
  FROM st JOIN ct USING (t) JOIN gn USING (lang) CROSS JOIN tot),
agg AS (
  SELECT lang, ng, vg,
         sum((cg / ng) * ln((cg / ng) / (c / n))) AS kl,
         sum((cg / ng) * ln((cg / ng) / ((cg / ng + c / n) / 2.0))
             + (c / n) * ln((c / n) / ((cg / ng + c / n) / 2.0))) AS js_sup,
         sum(c / n) AS qcov
  FROM j GROUP BY lang, ng, vg)
SELECT lang, CAST(ng AS BIGINT) AS n_tokens, CAST(vg AS BIGINT) AS vocab,
       kl AS kl_vs_corpus,
       0.5 * (js_sup + 0.6931471805599453 * (1.0 - qcov)) AS js_vs_corpus
FROM agg
""",
    "global_top_orders": """
SELECT o_orderkey, o_totalprice FROM orders
ORDER BY o_totalprice DESC, o_orderkey LIMIT 25
""",
    "equi_depth_orders": """
SELECT o_orderkey,
       CAST(ntile(8) OVER (ORDER BY o_totalprice, o_orderkey) AS INT) AS tile
FROM orders
""",
    "equi_depth_by_status_orders": """
SELECT o_orderkey, o_orderstatus,
       CAST(ntile(4) OVER (PARTITION BY o_orderstatus
                           ORDER BY o_totalprice, o_orderkey) AS INT) AS tile
FROM orders
""",
    "set_ops_customers": """
SELECT o_custkey FROM orders WHERE month(o_orderdate) <= 6
INTERSECT
SELECT o_custkey FROM orders WHERE month(o_orderdate) > 6
""",
    "topk_orders_per_customer": """
SELECT o_custkey, o_orderkey, CAST(rn AS BIGINT) AS rn FROM (
  SELECT o_custkey, o_orderkey,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders) WHERE rn <= 3
""",
    "agg_lineitem_pricing": """
SELECT l_returnflag, l_linestatus,
       CAST(count(*) AS BIGINT) AS count_order,
       round(sum(l_quantity), 4) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge
FROM lineitem GROUP BY l_returnflag, l_linestatus
""",
    "multimodal_meta_documents": _multimodal_meta_oracle(),
    # real-decode gate row (rotation #12): the oracle is a plain SELECT
    # of the truth columns recorded by scripts/gen_media_fixture.py at
    # generation time — independent of the engine's sniffer by
    # construction. read_parquet on the committed fixture path (the
    # fixture doesn't scale with sf, so it's not an sf_dir view).
    "multimodal_decode_real_documents": f"""
SELECT CAST(id AS BIGINT) AS id,
       CAST(octet_length(blob) AS BIGINT) AS n_bytes,
       CAST(true_width AS INTEGER) AS width,
       CAST(true_height AS INTEGER) AS height,
       true_format AS format
FROM read_parquet('{_MEDIA_FIXTURE}')
""",
    "multimodal_frame_sample": """
WITH b AS (
  SELECT doc_id AS id, text,
         octet_length(encode(text)) % 5 + 1 AS nf
  FROM documents),
idx AS (SELECT id, text, range(0, nf) AS idxs FROM b)
SELECT id, CAST(i AS INT) AS frame_idx, CAST(i * 40 AS BIGINT) AS ts_ms,
       md5(text || ':' || i) AS frame_checksum
FROM idx, UNNEST(idxs) AS t(i)
""",
    "windowed_skyline_events": skyline_oracle_sql(
        "(SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS window_start, "
        "value, event_id FROM events) w",
        [("value", "max"), ("event_id", "min")],
        by=["window_start"],
    ),
    "distinct_users_by_type": """
SELECT event_type,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
       CAST(count(*) AS BIGINT) AS n_events
FROM events GROUP BY event_type
""",
    "stream_window_stats_orders": """
WITH w AS (
  SELECT make_timestamp((epoch_us(o_orderdate::TIMESTAMP) // 2592000000000)
                        * 2592000000000) AS window_start,
         o_totalprice AS v
  FROM orders),
m AS (SELECT max(o_orderdate)::TIMESTAMP - INTERVAL 1 DAY AS wm FROM orders)
SELECT window_start,
       window_start + INTERVAL 30 DAY AS window_end,
       CAST(count(*) AS BIGINT) AS n_rows,
       round(sum(v), 2) AS sum_value,
       round(min(v), 2) AS min_value,
       round(max(v), 2) AS max_value
FROM w, m
GROUP BY window_start, wm
HAVING window_start + INTERVAL 30 DAY <= wm
""",
    "stream_session_stats_events": """
WITH lg AS (
  SELECT user_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                OR ts >= lag(ts) OVER w + INTERVAL 4 HOUR THEN 1 ELSE 0 END AS brk
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
s AS (
  SELECT user_id, ts,
         sum(brk) OVER (PARTITION BY user_id ORDER BY ts
                        ROWS UNBOUNDED PRECEDING) AS sid
  FROM lg),
agg AS (
  SELECT user_id, min(ts) AS session_start,
         max(ts) + INTERVAL 4 HOUR AS session_end,
         CAST(count(*) AS BIGINT) AS n_rows
  FROM s GROUP BY user_id, sid),
m AS (SELECT max(ts) - INTERVAL 1 HOUR AS wm FROM events)
SELECT session_start, session_end, user_id, n_rows FROM agg, m
WHERE session_end <= wm
""",
    # each event expands to its duration/slide = 4 overlapping windows
    # (slide-aligned to the unix epoch, exactly Spark's window() origin);
    # keep windows closed by the final watermark max(ts) - 1h
    "stream_sliding_stats_events": """
WITH w AS (
  SELECT make_timestamp((epoch_us(ts) // 1800000000) * 1800000000) AS b, value
  FROM events),
ex AS (
  SELECT b - (k * INTERVAL 30 MINUTE) AS window_start, value
  FROM w, unnest(range(0, 4)) AS t(k)),
m AS (SELECT max(ts) - INTERVAL 1 HOUR AS wm FROM events)
SELECT window_start,
       window_start + INTERVAL 2 HOUR AS window_end,
       CAST(count(*) AS BIGINT) AS n_rows,
       min(value) AS min_value,
       max(value) AS max_value
FROM ex, m GROUP BY window_start, wm
HAVING window_start + INTERVAL 2 HOUR <= wm
""",
    "stream_skyline_orders": skyline_oracle_sql(
        "orders", [("o_totalprice", "max"), ("o_orderdate", "min")]
    ),
    "skyline_orders_by_status": skyline_oracle_sql(
        "orders", [("o_totalprice", "max"), ("o_orderdate", "min")], by=["o_orderstatus"]
    ),
    "join_skyline_customer_nation": skyline_oracle_sql(
        "(SELECT c.*, n.n_regionkey FROM customer c JOIN nation n "
        "ON c.c_nationkey = n.n_nationkey) j",
        [("c_acctbal", "max"), ("c_custkey", "min")],
        by=["n_regionkey"],
    ),
    # as-of join: the quadratic row_number() formulation is the oracle;
    # the engine's union-scan must reproduce it exactly (ties -> max
    # click ts then max click event_id)
    "asof_error_click_events": """
SELECT e.event_id AS err_id, c.event_id AS click_id,
       epoch_us(e.ts) - epoch_us(c.ts) AS gap_us
FROM events e JOIN events c
  ON c.user_id = e.user_id AND c.ts <= e.ts
WHERE e.event_type = 'error' AND c.event_type = 'click'
QUALIFY row_number() OVER (PARTITION BY e.event_id
                           ORDER BY c.ts DESC, c.event_id DESC) = 1
""",
    "hash_sample_orders": f"""
SELECT o_orderkey, o_custkey, o_totalprice FROM orders
WHERE ('0x' || substr(md5(o_orderkey::VARCHAR || '#{_SAMPLE_SEED}'), 1, 15))::BIGINT
      < {int(_SAMPLE_FRAC * (1 << 60))}
""",
    "stratified_sample_events": f"""
SELECT event_id, event_type, user_id FROM events
WHERE ('0x' || substr(md5(event_id::VARCHAR || '#{_SAMPLE_SEED}'), 1, 15))::BIGINT
      < CASE {' '.join(f"WHEN event_type = '{s}' THEN {int(f * (1 << 60))}" for s, f in sorted(_STRATA_FRACS.items()))} ELSE 0 END
""",
    "vocab_topk_documents": rf"""
SELECT token, CAST(count(*) AS BIGINT) AS n FROM (
  SELECT unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS token
  FROM documents)
WHERE token <> ''
GROUP BY token ORDER BY n DESC, token LIMIT {_VOCAB_K}
""",
    "dedup_corpus_documents": _dedup_corpus_oracle(),
    # shared integer cut points via split_thresholds(): both engines use
    # the SAME float-accumulated band edges on the md5 60-bit hash
    "split_dataset_orders": (lambda bands: f"""
SELECT o_orderkey,
       CASE {' '.join(f"WHEN h < {thr} THEN '{name}'" for name, thr in bands[:-1])}
            ELSE '{bands[-1][0]}' END AS split
FROM (SELECT o_orderkey,
             ('0x' || substr(md5(o_orderkey::VARCHAR || '#{_SAMPLE_SEED}'), 1, 15))::BIGINT AS h
      FROM orders)
""")(SA.split_thresholds({"train": 0.8, "val": 0.1, "test": 0.1})),
    "dedup_incremental_documents": r"""
WITH fp AS (
  SELECT doc_id,
         md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp
  FROM documents),
ledger AS (SELECT DISTINCT fp FROM fp WHERE doc_id % 4 = 0),
fresh AS (
  SELECT f.doc_id, f.fp FROM fp f
  WHERE f.doc_id % 4 <> 0 AND f.fp NOT IN (SELECT fp FROM ledger))
SELECT doc_id, fp FROM fresh
QUALIFY row_number() OVER (PARTITION BY fp ORDER BY doc_id) = 1
""",
    "stream_vocab_documents": rf"""
SELECT token, CAST(count(*) AS BIGINT) AS n FROM (
  SELECT unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS token
  FROM documents)
WHERE token <> ''
GROUP BY token ORDER BY n DESC, token LIMIT {_VOCAB_K}
""",
    "contamination_report_documents": (lambda sh8, h: f"""
WITH sh AS (
  SELECT doc_id, {sh8} AS s FROM documents),
probe AS (
  SELECT DISTINCT doc_id AS eval_id, {h} AS h
  FROM sh, unnest(s) AS u(g) WHERE doc_id % 50 = 0),
grams AS (
  SELECT doc_id, {h} AS h
  FROM sh, unnest(s) AS u(g) WHERE doc_id % 50 <> 0),
pairs AS (
  SELECT DISTINCT probe.eval_id, grams.doc_id
  FROM grams JOIN probe USING (h))
SELECT eval_id, CAST(count(*) AS BIGINT) AS n_leaking_docs
FROM pairs GROUP BY eval_id
""")(_shingles_sql_k(8), _HASH60.format(x="g")),
    "heavy_hitters_events": """
SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS n
FROM events GROUP BY user_id, event_type
ORDER BY n DESC, user_id ASC, event_type ASC LIMIT 20
""",
    "skew_stats_events": """
WITH c AS (SELECT user_id, count(*) AS n FROM events GROUP BY user_id)
SELECT CAST(sum(n) AS BIGINT) AS n_rows,
       CAST(count(*) AS BIGINT) AS n_keys,
       CAST(max(n) AS BIGINT) AS max_key_rows,
       round(avg(n), 6) AS avg_key_rows,
       round(max(n) / avg(n), 6) AS skew_ratio
FROM c
""",
    "stream_join_error_click_events": """
SELECT e.event_id AS err_id, c.event_id AS click_id,
       epoch_us(e.ts) - epoch_us(c.ts) AS gap_us
FROM events e JOIN events c
  ON c.user_id = e.user_id
 AND c.ts <= e.ts
 AND c.ts >= e.ts - INTERVAL 30 MINUTE
WHERE e.event_type = 'error' AND c.event_type = 'click'
""",
    "rollup_orders": """
SELECT o_orderstatus, o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_orders,
       round(sum(o_totalprice), 2) AS sum_price
FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
""",
    "pivot_events": f"""
SELECT user_id,
       {', '.join(f"CAST(count(*) FILTER (event_type = '{t}') AS BIGINT) AS n_{t}" for t in _EVENT_TYPES)}
FROM events GROUP BY user_id
""",
    # Spark's exact `percentile` and DuckDB's quantile_cont share the
    # same interpolated definition; round(6) absorbs ulp noise
    "column_quantiles_orders": """
SELECT 'o_totalprice' AS column, 0.25 AS p,
       round(quantile_cont(o_totalprice, 0.25), 6) AS value FROM orders
UNION ALL
SELECT 'o_totalprice', 0.5, round(quantile_cont(o_totalprice, 0.5), 6) FROM orders
UNION ALL
SELECT 'o_totalprice', 0.75, round(quantile_cont(o_totalprice, 0.75), 6) FROM orders
""",
    # N and avgdl are exact in both engines (integer-valued sums below
    # 2^53), so only ln/division carry float noise — absorbed by round(6)
    "bm25_documents": rf"""
WITH base AS (
  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS toks
  FROM documents),
stats AS (SELECT count(*)::DOUBLE AS n, avg(len(toks))::DOUBLE AS avgdl FROM base),
hits AS (
  SELECT doc_id, len(toks) AS dl, t AS term, count(*)::DOUBLE AS tf
  FROM base, unnest(toks) AS u(t)
  WHERE t IN ({', '.join(repr(t) for t in _BM25_TERMS)})
  GROUP BY doc_id, len(toks), t),
dfreq AS (SELECT term, count(DISTINCT doc_id)::DOUBLE AS df_term FROM hits GROUP BY term)
SELECT doc_id,
       round(sum(
         ln(1 + (stats.n - df_term + 0.5) / (df_term + 0.5))
         * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / stats.avgdl))
       ), 6) AS score
FROM hits JOIN dfreq USING (term), stats
GROUP BY doc_id
ORDER BY score DESC, doc_id ASC LIMIT 10
""",
    # md5 hash/sign mirror hash64_expr(mode='md5'); dense vectors built
    # from an ids x buckets grid so zero buckets (and token-less docs)
    # appear explicitly
    "hash_embed_documents": r"""
WITH tok AS (
  SELECT doc_id, t FROM (
    SELECT doc_id, unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS t
    FROM documents)
  WHERE t <> ''),
h AS (
  SELECT doc_id,
         ('0x' || substr(md5(t), 1, 15))::BIGINT % 16 AS b,
         CASE WHEN ('0x' || substr(md5(t || '#1'), 1, 15))::BIGINT % 2 = 0
              THEN 1.0 ELSE -1.0 END AS s
  FROM tok),
sums AS (SELECT doc_id, b, sum(s) AS v FROM h GROUP BY doc_id, b),
ids AS (SELECT DISTINCT doc_id FROM documents),
grid AS (SELECT ids.doc_id, r.i FROM ids, range(0, 16) AS r(i)),
vals AS (
  SELECT grid.doc_id, grid.i, coalesce(sums.v, 0.0) AS v
  FROM grid LEFT JOIN sums ON sums.doc_id = grid.doc_id AND sums.b = grid.i)
SELECT doc_id, list(v ORDER BY i) AS embedding FROM vals GROUP BY doc_id
""",
    # docs shorter than n tokens contribute nothing (same filter both
    # sides); \s+ separators collapse runs identically in both engines
    "ngram_counts_documents": r"""
WITH d AS (
  SELECT regexp_split_to_array(lower(trim(text)), '\s+') AS toks FROM documents),
g AS (
  SELECT array_to_string(list_slice(toks, i, i + 1), ' ') AS ngram
  FROM d, unnest(range(1, len(toks))) AS t(i)
  WHERE len(toks) >= 2)
SELECT ngram, CAST(count(*) AS BIGINT) AS n FROM g
WHERE ngram <> ''
GROUP BY ngram ORDER BY n DESC, ngram ASC LIMIT 40
""",
    # revenue in exact integer 1e-4-dollar units (cents × discounted
    # percent): floor(x*100 + 0.5) is bit-identical IEEE arithmetic in
    # both engines and the integer sum is fold-order-independent — no
    # rounding step, so no HALF_UP/half-even divergence is possible
    "multi_join_revenue": """
SELECT n_name,
       CAST(sum(CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT)
                * (100 - CAST(floor(l_discount * 100.0 + 0.5) AS BIGINT)))
            AS BIGINT) AS revenue_x10000,
       CAST(count(*) AS BIGINT) AS n_items
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
GROUP BY n_name
""",
    # rank orders by the ROUNDED score in both engines so float ties
    # cannot reorder the cut; (doc, term) is unique so rank is total
    "tfidf_topk_documents": r"""
WITH tf AS (
  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM (
    SELECT doc_id,
           unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS term
    FROM documents)
  WHERE term <> '' GROUP BY doc_id, term),
dfq AS (SELECT term, CAST(count(*) AS BIGINT) AS df_term FROM tf GROUP BY term),
n AS (SELECT CAST(count(DISTINCT doc_id) AS DOUBLE) AS n_docs FROM documents)
SELECT * FROM (
  SELECT tf.doc_id, tf.term, tf.tf,
         round(tf.tf * ln(n.n_docs / dfq.df_term), 6) AS score,
         CAST(row_number() OVER (
              PARTITION BY tf.doc_id
              ORDER BY round(tf.tf * ln(n.n_docs / dfq.df_term), 6) DESC,
                       tf.term ASC) AS BIGINT) AS rank
  FROM tf JOIN dfq USING (term), n)
WHERE rank <= 3
""",
    "repetition_stats_documents": _repetition_oracle(),
    "pii_scrub_documents": _pii_oracle(),
    "decontaminate_documents": _decontaminate_oracle(),
    "column_profile_orders": _column_profile_oracle(
        "orders",
        [
            ("o_orderkey", True),
            ("o_custkey", True),
            ("o_orderstatus", False),
            ("o_orderdate", False),
        ],
    ),
    # the streaming state-store path must reproduce the batch windowed
    # skyline exactly (union-of-emissions reduction; see the query)
    "windowed_stream_skyline_events": skyline_oracle_sql(
        "(SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS window_start, "
        "value, event_id FROM events) w",
        [("value", "max"), ("event_id", "min")],
        by=["window_start"],
    ),
    # prefix == full table under availableNow, so the batch oracle applies
    "two_stage_skyline_orders": skyline_oracle_sql(
        "orders", [("o_totalprice", "max"), ("o_orderdate", "min")]
    ),
    # independent JSON engines: Spark get_json_object vs DuckDB's JSON
    # extension; min/max grade the row-level extraction, the group-by
    # grades the typed cast
    "json_extract_events": """
SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_mod,
       CAST(count(*) AS BIGINT) AS n,
       CAST(min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS min_k,
       CAST(max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k,
       round(sum(value), 6) AS sum_value
FROM events
GROUP BY 1
""",
    # streaming changed-keys-only upsert planner (round 10): batch k =
    # event_id % 3, collapsed latest-wins per user by event_id; the
    # accumulated state any epoch sees IS the key's previous collapsed
    # row, so one lag() over the epoch order replays the whole stream —
    # previous-epoch NULL = added, null-safe equality on the compared
    # columns splits unchanged/changed. Compared doubles carried
    # verbatim from parquet (no arithmetic), equality exact.
    "stream_snapshot_diff_events": """
WITH coll AS (
  SELECT ep, user_id, event_type, value FROM (
    SELECT event_id % 3 AS ep, user_id, event_type, value,
           row_number() OVER (
             PARTITION BY event_id % 3, user_id ORDER BY event_id DESC
           ) AS rn
    FROM events) WHERE rn = 1),
hist AS (
  SELECT ep, user_id, event_type, value,
         lag(event_type) OVER w AS pt,
         lag(value) OVER w AS pv,
         lag(ep) OVER w AS pe
  FROM coll WINDOW w AS (PARTITION BY user_id ORDER BY ep))
SELECT CAST(ep AS BIGINT) AS epoch, user_id,
       CASE WHEN pe IS NULL THEN 'added'
            WHEN pt IS NOT DISTINCT FROM event_type
                 AND pv IS NOT DISTINCT FROM value THEN 'unchanged'
            ELSE 'changed' END AS status
FROM hist
""",
    # round-10 sequence-packing planner: exclusive cumsum over doc_id
    # order (n_chars carried verbatim from parquet), integer floor
    # division, one range explode per document — every value integer
    "pack_sequences_documents": """
WITH t AS (SELECT doc_id, CAST(n_chars AS BIGINT) AS n FROM documents
           WHERE n_chars > 0),
o AS (SELECT doc_id, n,
             -- DuckDB sums BIGINT into HUGEINT; range() needs BIGINT
             CAST(coalesce(sum(n) OVER (ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS off
      FROM t),
s AS (SELECT doc_id, n, off,
             unnest(range(off // 2048, (off + n - 1) // 2048 + 1)) AS seq
      FROM o)
SELECT CAST(seq AS BIGINT) AS seq_id, doc_id,
       CAST(greatest(off, seq * 2048) - off AS BIGINT) AS tok_start,
       CAST(least(off + n, seq * 2048 + 2048) - off AS BIGINT) AS tok_end,
       CAST(greatest(off, seq * 2048) - seq * 2048 AS BIGINT) AS pos_in_seq
FROM s
""",
    # round-10 packing executor: the same cumsum plan joined back to
    # the text, substr per span, ordered string_agg per sequence
    "gather_sequences_documents": """
WITH t AS (SELECT doc_id, CAST(n_chars AS BIGINT) AS n FROM documents
           WHERE n_chars > 0),
o AS (SELECT doc_id, n,
             CAST(coalesce(sum(n) OVER (ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS off
      FROM t),
s AS (SELECT doc_id, n, off,
             unnest(range(off // 2048, (off + n - 1) // 2048 + 1)) AS seq
      FROM o),
spans AS (
  SELECT s.seq, s.doc_id,
         substr(d.text,
                CAST(greatest(s.off, s.seq * 2048) - s.off + 1 AS BIGINT),
                CAST(least(s.off + s.n, s.seq * 2048 + 2048)
                     - greatest(s.off, s.seq * 2048) AS BIGINT)) AS span,
         greatest(s.off, s.seq * 2048) - s.seq * 2048 AS pos
  FROM s JOIN documents d USING (doc_id))
SELECT CAST(seq AS BIGINT) AS seq_id,
       string_agg(span, '' ORDER BY pos) AS seq_text
FROM spans GROUP BY seq
""",
    # round-12 temperature mixture: highest-averages (D'Hondt) with
    # weight sqrt(n) == the top-200 of the n/j^2 grid (ties by source,
    # then j); distinct grid rationals at fixture scale are separated
    # >> a double ulp (min gap ~1/j_max^4 of the value vs ulp ~1e-13),
    # so the DESC double sort reproduces the engine's exact integer
    # comparisons. Then the standard md5(seed=42|doc_id) mixture take.
    # round-13 skewed-domain companion: same highest-averages grid
    # formulation over a derived 5:3:2 domain and total=137, so the
    # oracle grades the bisection's NON-tie path; ties (exact rational
    # equality) still break (source, j) — the shared lex rule
    "temperature_mix_skewed_documents": """
WITH d AS (SELECT doc_id,
                  CASE WHEN doc_id % 10 < 5 THEN 'a'
                       WHEN doc_id % 10 < 8 THEN 'b' ELSE 'c' END
                    AS skew_dom
           FROM documents),
c AS (SELECT skew_dom, CAST(count(*) AS BIGINT) AS n FROM d
      GROUP BY skew_dom),
grid AS (SELECT skew_dom, n, unnest(range(1, 201)) AS j FROM c),
seats AS (
  SELECT skew_dom, j,
         row_number() OVER (
           ORDER BY CAST(n AS DOUBLE) / (j * j) DESC, skew_dom, j
         ) AS rk
  FROM grid),
tgt AS (SELECT skew_dom, CAST(count(*) AS BIGINT) AS target
        FROM seats WHERE rk <= 137 GROUP BY skew_dom),
t AS (SELECT doc_id, skew_dom,
             md5(concat_ws('|', '42', CAST(doc_id AS VARCHAR))) AS __o
      FROM d),
r AS (SELECT doc_id, skew_dom,
             row_number() OVER (PARTITION BY skew_dom ORDER BY __o) - 1
               AS mix_rank
      FROM t)
SELECT doc_id, skew_dom, CAST(mix_rank AS BIGINT) AS mix_rank
FROM r JOIN tgt USING (skew_dom)
WHERE mix_rank < target
""",
    "temperature_mix_documents": """
WITH c AS (SELECT source, CAST(count(*) AS BIGINT) AS n FROM documents
           WHERE source IS NOT NULL GROUP BY source),
grid AS (SELECT source, n, unnest(range(1, 201)) AS j FROM c),
seats AS (
  SELECT source, j,
         row_number() OVER (
           ORDER BY CAST(n AS DOUBLE) / (j * j) DESC, source, j
         ) AS rk
  FROM grid),
tgt AS (SELECT source, CAST(count(*) AS BIGINT) AS target
        FROM seats WHERE rk <= 200 GROUP BY source),
t AS (SELECT doc_id, source,
             md5(concat_ws('|', '42', CAST(doc_id AS VARCHAR))) AS __o
      FROM documents),
r AS (SELECT doc_id, source,
             row_number() OVER (PARTITION BY source ORDER BY __o) - 1
               AS mix_rank
      FROM t)
SELECT doc_id, source, CAST(mix_rank AS BIGINT) AS mix_rank
FROM r JOIN tgt USING (source)
WHERE mix_rank < target
""",
    # round-13 greedy longest-match subword tokenizer: the per-(run,
    # position) longest vocab match is computed RELATIONALLY (LEFT JOIN
    # vocab on prefix equality + arg_max by piece length — unique, two
    # distinct equal-length pieces cannot prefix the same position;
    # unmatched positions advance 1 and emit the unk id -1), then a
    # recursive CTE walks the jump pointers — greedy sequential
    # semantics with no aggregate/window inside the recursion, which
    # engines disallow. Tokenizes DISTINCT runs only (the Zipfian
    # shortcut the Spark side's per-worker memo mirrors).
    "subword_encode_documents": f"""
WITH RECURSIVE vocab(piece, id) AS (VALUES {_vocab_values_sql()}),
runs AS (
  SELECT doc_id, u.run, u.i
  FROM (
    SELECT doc_id,
           regexp_extract_all(lower(text),
             '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]+') AS rs
    FROM documents
  ), LATERAL (
    SELECT unnest(rs) AS run, generate_subscripts(rs, 1) AS i
  ) u
),
druns AS (SELECT DISTINCT run FROM runs),
pos_grid AS (
  SELECT d.run, p.pos
  FROM druns d, LATERAL (SELECT unnest(range(length(d.run))) AS pos) p
),
jump AS (
  SELECT g.run, g.pos,
         coalesce(max(length(v.piece)), 1) AS jlen,
         coalesce(arg_max(v.id, length(v.piece)), -1) AS tok
  FROM pos_grid g LEFT JOIN vocab v
    ON substr(g.run, g.pos + 1, length(v.piece)) = v.piece
  GROUP BY g.run, g.pos
),
walk AS (
  SELECT run, CAST(0 AS BIGINT) AS pos FROM druns
  UNION ALL
  SELECT w.run, w.pos + j.jlen
  FROM walk w JOIN jump j ON j.run = w.run AND j.pos = w.pos
  WHERE w.pos + j.jlen < length(w.run)
),
run_tokens AS (
  SELECT w.run, w.pos, j.tok
  FROM walk w JOIN jump j ON j.run = w.run AND j.pos = w.pos
),
agg AS (
  SELECT r.doc_id,
         CAST(count(*) AS BIGINT) AS n_tokens,
         string_agg(CAST(t.tok AS VARCHAR), '|' ORDER BY r.i, t.pos)
           AS ids_joined
  FROM runs r JOIN run_tokens t ON t.run = r.run
  GROUP BY r.doc_id
)
-- LEFT JOIN back to documents so zero-run docs (empty/whitespace/NULL
-- text) emit (doc_id, 0, '') exactly like the Spark side, instead of
-- silently dropping out of the row set (review find, round 13)
SELECT d.doc_id,
       CAST(coalesce(a.n_tokens, 0) AS BIGINT) AS n_tokens,
       coalesce(a.ids_joined, '') AS ids_joined
FROM documents d LEFT JOIN agg a ON a.doc_id = d.doc_id
""",
    # round-12 position/segment-id emission: same cumsum plan, one
    # range-unnest per span; positions are doc-relative (tok_start ..
    # tok_end-1), segment index = rank of the span within its sequence
    "pack_positions_documents": """
WITH t AS (SELECT doc_id, CAST(n_chars AS BIGINT) AS n FROM documents
           WHERE n_chars > 0),
o AS (SELECT doc_id, n,
             CAST(coalesce(sum(n) OVER (ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS off
      FROM t),
s AS (SELECT doc_id, n, off,
             unnest(range(off // 2048, (off + n - 1) // 2048 + 1)) AS seq
      FROM o),
spans AS (
  SELECT seq,
         greatest(off, seq * 2048) - off AS tstart,
         least(off + n, seq * 2048 + 2048) - off AS tend,
         greatest(off, seq * 2048) - seq * 2048 AS pos
  FROM s),
seg AS (SELECT seq, tstart, tend, pos,
               row_number() OVER (PARTITION BY seq ORDER BY pos) - 1 AS segidx
        FROM spans),
toks AS (SELECT seq, pos, segidx, unnest(range(tstart, tend)) AS p FROM seg)
SELECT CAST(seq AS BIGINT) AS seq_id,
       string_agg(CAST(p AS VARCHAR), ',' ORDER BY pos, p)
         AS position_ids_joined,
       string_agg(CAST(segidx AS VARCHAR), ',' ORDER BY pos, p)
         AS segment_ids_joined
FROM toks GROUP BY seq
""",
    # round-11 token-unit packing round trip: instead of mirroring the
    # slice-per-span executor, the oracle assigns every token its
    # GLOBAL stream position (doc exclusive-cumsum offset + in-doc
    # index) and aggregates tokens per pos//512 window in position
    # order — provably the same sequence content, far simpler SQL.
    # DuckDB zips parallel unnests in one SELECT (token ↔ index).
    "gather_token_sequences_documents": r"""
WITH d AS (SELECT doc_id,
                  regexp_extract_all(lower(text),
                    '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+') AS toks
           FROM documents),
c AS (SELECT doc_id, toks, CAST(len(toks) AS BIGINT) AS n
      FROM d WHERE len(toks) > 0),
o AS (SELECT doc_id, toks, n,
             CAST(coalesce(sum(n) OVER (ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS off
      FROM c),
tok AS (SELECT off + CAST(unnest(range(n)) AS BIGINT) AS p,
               unnest(toks) AS token
        FROM o)
SELECT CAST(p // 512 AS BIGINT) AS seq_id,
       string_agg(token, chr(31) ORDER BY p) AS seq_tokens_joined
FROM tok GROUP BY 1
""",
    # stream-static inner join emits every match of the replay, so the
    # plain batch join is exact
    "stream_enrich_events": """
SELECT e.event_id, e.user_id, c.c_name, round(c.c_acctbal, 2) AS acctbal
FROM events e JOIN customer c ON e.user_id = c.c_custkey
""",
    # update/passthrough split expressed relationally; both engines do
    # the same double multiply + round, so values match bit-for-bit
    "upsert_orders": """
SELECT o_orderkey, 'U' AS o_orderstatus,
       round(o_totalprice + 1000.0, 2) AS totalprice
FROM orders WHERE o_orderkey % 10 = 0
UNION ALL
SELECT o_orderkey, o_orderstatus, round(o_totalprice, 2) AS totalprice
FROM orders WHERE o_orderkey % 10 <> 0
""",
    "cube_orders": """
SELECT o_orderstatus, o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_orders,
       round(sum(o_totalprice), 2) AS sum_price
FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
""",
    "grouping_sets_orders": """
SELECT o_orderstatus, o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_orders,
       round(sum(o_totalprice), 2) AS sum_price
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
""",
    # dense hourly grid via generate-series + left join; empty buckets
    # zero-filled in both engines
    "resample_events": """
WITH k AS (
  SELECT event_type, (floor(epoch_us(ts) / 3600000000))::BIGINT AS hb, value
  FROM events),
a AS (
  SELECT event_type, hb, CAST(count(*) AS BIGINT) AS n,
         round(sum(value), 6) AS sum_value
  FROM k GROUP BY 1, 2),
bounds AS (SELECT event_type, min(hb) AS lo, max(hb) AS hi FROM k GROUP BY 1),
grid AS (SELECT event_type, unnest(range(lo, hi + 1)) AS hb FROM bounds)
SELECT g.event_type,
       coalesce(a.n, 0) AS n,
       coalesce(a.sum_value, 0.0) AS sum_value,
       make_timestamp(g.hb * 3600000000) AS bucket_start
FROM grid g LEFT JOIN a ON a.event_type = g.event_type AND a.hb = g.hb
""",
    # fold impl -> bit-identical doubles; one corpus pass, 3 probes
    "cosine_topk_batch_embeddings": _batch_topk_oracle(),
    # same slice cap, lowercase, and log2 arithmetic; round(6) absorbs
    # summation-order float noise. ACCEPTED BOUNDARY RISK (r3 ADVICE):
    # round() is HALF_UP in Spark vs half-even in DuckDB, so a computed
    # entropy landing EXACTLY on a representable 5e-7 tie would diverge;
    # entropies are sums of p*log2(p) terms, which cannot be exact
    # decimal ties except for degenerate one-symbol inputs (entropy 0,
    # tie-free), so the risk is accepted rather than tolerated away.
    "char_entropy_documents": """
WITH ch AS (
  SELECT doc_id,
         unnest(string_split(substr(lower(text), 1, 500), '')) AS c
  FROM documents),
cnt AS (SELECT doc_id, c, count(*)::DOUBLE AS n FROM ch WHERE c <> ''
        GROUP BY 1, 2),
ent AS (
  SELECT doc_id,
         round(log2(sum(n)) - sum(n * log2(n)) / sum(n), 6) AS entropy
  FROM cnt GROUP BY doc_id)
SELECT d.doc_id, ent.entropy FROM documents d LEFT JOIN ent USING (doc_id)
""",
    # the injected-link construction makes the expected set closed-form
    "extract_domains_documents": """
SELECT doc_id, 'site' || (doc_id % 7) || '.example.com' AS domain
FROM documents WHERE doc_id % 3 = 0
UNION ALL
SELECT doc_id, 'mirror.example.org' AS domain
FROM documents WHERE doc_id % 5 = 0
""",
    # same IEEE edge arithmetic (lo + i*span), max closed into the top
    # bucket, empty buckets zero-filled; edges UNROUNDED — both engines
    # run the identical double op sequence, so the values are
    # bit-identical without any tie-breaking-sensitive round()
    "histogram_orders": """
WITH b AS (SELECT min(o_totalprice) AS lo, max(o_totalprice) AS hi FROM orders),
k AS (
  SELECT least(CAST(floor((o_totalprice - lo) / ((hi - lo) / 8)) AS BIGINT), 7)
           AS bucket
  FROM orders CROSS JOIN b),
c AS (SELECT bucket, CAST(count(*) AS BIGINT) AS n FROM k GROUP BY 1),
grid AS (SELECT unnest(range(0, 8)) AS bucket)
SELECT CAST(grid.bucket AS INT) AS bucket,
       b.lo + grid.bucket * ((b.hi - b.lo) / 8) AS lo,
       CASE WHEN grid.bucket = 7 THEN b.hi
            ELSE b.lo + (grid.bucket + 1) * ((b.hi - b.lo) / 8) END AS hi,
       coalesce(c.n, 0) AS n
FROM grid CROSS JOIN b LEFT JOIN c ON c.bucket = grid.bucket
""",
    "scd2_events": """
SELECT user_id, event_id,
       ts AS valid_from,
       lead(ts) OVER w AS valid_to,
       lead(ts) OVER w IS NULL AS is_current
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts)
""",
    # strategy-independent: plain all-pairs levenshtein threshold join
    "fuzzy_pairs_part": """
SELECT a.p_partkey AS id_a, b.p_partkey AS id_b,
       CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist
FROM part a JOIN part b ON a.p_partkey < b.p_partkey
WHERE a.p_name IS NOT NULL AND b.p_name IS NOT NULL
  AND levenshtein(a.p_name, b.p_name) <= 2
""",
    # witnesses restricted to the frontier (sound: dominance is
    # transitive); min frontier id per dominated row, NULL for members
    "skyline_witness_part": """
WITH t AS (SELECT p_partkey, p_retailprice, p_size FROM part),
sky AS (
  SELECT * FROM t p WHERE NOT EXISTS (
    SELECT 1 FROM t q
    WHERE q.p_retailprice <= p.p_retailprice AND q.p_size <= p.p_size
      AND (q.p_retailprice < p.p_retailprice OR q.p_size < p.p_size)))
SELECT p.p_partkey, p.p_retailprice, p.p_size,
       (SELECT min(s.p_partkey) FROM sky s
        WHERE s.p_retailprice <= p.p_retailprice AND s.p_size <= p.p_size
          AND (s.p_retailprice < p.p_retailprice OR s.p_size < p.p_size))
         AS witness
FROM t p
""",
    # same md5 hash order, bucket arithmetic, and batch-id formula
    "pack_by_length_documents": """
WITH h AS (
  SELECT doc_id, n_chars,
         ('0x' || substr(md5(doc_id::VARCHAR || '#' || '0'), 1, 15))::BIGINT AS hh
  FROM documents),
k AS (
  SELECT doc_id,
         CAST(floor(n_chars / 256.0) AS BIGINT) AS len_bucket,
         hh % 4 AS shard, hh
  FROM h),
r AS (
  SELECT doc_id, len_bucket, shard,
         row_number() OVER (PARTITION BY len_bucket, shard
                            ORDER BY hh, doc_id) - 1 AS rn
  FROM k)
SELECT doc_id, len_bucket,
       CAST((len_bucket * 4 + shard) * 1099511627776 + rn // 8 AS BIGINT) AS batch_id,
       CAST(rn % 8 AS BIGINT) AS batch_pos
FROM r
""",
    # identical IEEE ops both sides: md5 60-bit key hash vs
    # floor(weight * 2^60) threshold
    "weighted_sample_orders": """
SELECT o_orderkey, round(o_totalprice, 2) AS totalprice
FROM orders
WHERE ('0x' || substr(md5(o_orderkey::VARCHAR || '#' || '42'), 1, 15))::BIGINT
      < CAST(floor(least(greatest((o_orderkey % 100) / 100.0, 0.0), 1.0)
                   * 1152921504606846976.0) AS BIGINT)
""",
    # Pearson is scale-invariant -> engine-portable modulo float noise;
    # round(6) absorbs the differing summation orders. ACCEPTED BOUNDARY
    # RISK (r3 ADVICE): Spark HALF_UP vs DuckDB half-even could diverge
    # on an EXACT 5e-7 tie, but corr of real data is an irrational-ish
    # ratio (sqrt in the denominator) — an exact decimal tie needs a
    # contrived integer lattice; accepted, not tolerated away.
    "correlations_lineitem": """
SELECT * FROM (
  SELECT 'l_quantity' AS col_a, 'l_extendedprice' AS col_b,
         round(corr(l_quantity, l_extendedprice), 6) AS corr FROM lineitem
  UNION ALL SELECT 'l_quantity', 'l_discount',
         round(corr(l_quantity, l_discount), 6) FROM lineitem
  UNION ALL SELECT 'l_quantity', 'l_tax',
         round(corr(l_quantity, l_tax), 6) FROM lineitem
  UNION ALL SELECT 'l_extendedprice', 'l_discount',
         round(corr(l_extendedprice, l_discount), 6) FROM lineitem
  UNION ALL SELECT 'l_extendedprice', 'l_tax',
         round(corr(l_extendedprice, l_tax), 6) FROM lineitem
  UNION ALL SELECT 'l_discount', 'l_tax',
         round(corr(l_discount, l_tax), 6) FROM lineitem)
""",
    "global_shuffle_orders": """
WITH t AS (
  SELECT o_orderkey,
         md5(concat_ws('|', '42', CAST(o_orderkey AS VARCHAR))) AS __ord
  FROM orders
)
SELECT o_orderkey, __ord,
       CAST(row_number() OVER (ORDER BY __ord) - 1 AS BIGINT) AS __pos,
       CAST((row_number() OVER (ORDER BY __ord) - 1) % 8 AS INT) AS __shard
FROM t
""",
    "mix_corpus_documents": """
WITH t AS (
  SELECT doc_id, source,
         md5(concat_ws('|', '7', CAST(doc_id AS VARCHAR))) AS __o
  FROM documents
),
r AS (
  SELECT doc_id, source,
         row_number() OVER (PARTITION BY source ORDER BY __o) - 1 AS mix_rank
  FROM t
)
SELECT doc_id, source, CAST(mix_rank AS BIGINT) AS mix_rank
FROM r
WHERE mix_rank < CASE source WHEN 'src1' THEN 12 WHEN 'src3' THEN 3
                             WHEN 'src7' THEN 40 WHEN 'src11' THEN 7
                             ELSE 0 END
""",
    "paragraph_dedup_documents": """
WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
ch AS (
  SELECT doc_id, g.pos AS pos,
         array_to_string(ws[(g.pos * 8 + 1):(g.pos * 8 + 8)], ' ') AS para
  FROM w, LATERAL (
    SELECT unnest(generate_series(0, CAST(ceil(len(ws) / 8.0) AS INT) - 1)) AS pos
  ) g
),
k AS (
  SELECT doc_id, pos, para,
         row_number() OVER (PARTITION BY md5(para) ORDER BY doc_id, pos) AS rn
  FROM ch
)
SELECT doc_id,
       array_to_string(list(para ORDER BY pos), ' ') AS text_dedup,
       CAST(count(*) AS BIGINT) AS n_kept
FROM k WHERE rn = 1 GROUP BY doc_id
""",
}
