"""DuckDB oracle-SQL generators for the driver correctness gate.

These produce ANSI-ish SQL (DuckDB dialect) that reproduces the engine's
results over the pre-registered testdata views (``documents``,
``embeddings``, ``events``).  The BM25 oracles replicate the float32
scoring contract **bit-exactly**: every arithmetic step is wrapped in
``CAST(... AS REAL)``, which DuckDB evaluates as genuine IEEE float32 ops,
and the logarithm is f64-``ln`` rounded once to f32 — the same
correctly-rounded ``logf`` semantics the engine pins (see
``functions/contract.py::idf``).

The corpus convention mirrors the engine's entry usage: one document per
row, ``doc_id = CAST(doc_id AS VARCHAR)``, docids assigned in doc_id
string order, tokens = lowercase split on non-alphanumeric (the testdata
corpus is verified pure ``[a-z0-9 ]``, where this equals the full
Unicode analyzer).
"""

from __future__ import annotations

from ..functions.contract import FIELD_NORMS_TABLE

_FN_VALUES = ",".join(f"({int(v)})" for v in FIELD_NORMS_TABLE)
_FN_ID_VALUES = ",".join(f"({i},{int(v)})" for i, v in enumerate(FIELD_NORMS_TABLE))


def _f32(expr: str) -> str:
    return f"CAST(({expr}) AS REAL)"


def _r(lit: str) -> str:
    return f"CAST({lit} AS REAL)"


#: f32 BM25 term weight from (stats.n, dfs.df):  idf * (1 + k1), boost 1.0
_WEIGHT_SQL = _f32(
    _f32(
        "ln("
        + _f32(
            _r("1.0")
            + " + "
            + _f32(
                _f32(_r("stats.n - dfs.df") + " + " + _r("0.5"))
                + " / "
                + _f32(_r("dfs.df") + " + " + _r("0.5"))
            )
        )
        + ")"
    )
    + " * "
    + _f32(_r("1.0") + " + " + _r("1.2"))
)

#: f32 BM25 norm from (doclens.decoded, stats.avgdl):
#: k1 * ((1 - b) + (b * decoded) / avgdl)
_NORM_SQL = _f32(
    _r("1.2")
    + " * "
    + _f32(
        _f32(_r("1.0") + " - " + _r("0.75"))
        + " + "
        + _f32(
            _f32(_r("0.75") + " * " + _r("doclens.decoded"))
            + " / "
            + _r("stats.avgdl")
        )
    )
)

#: f32 term score from (f.freq, n.norm, w.w)
_TERM_SCORE_SQL = _f32(
    "w.w * " + _f32(_r("f.freq") + " / " + _f32(_r("f.freq") + " + n.norm"))
)


def _base_ctes(extra_terms_filter: str = "") -> str:
    """Shared CTE prelude: docs/tokens/doclens/stats/freqs/dfs/weights/norms."""
    return f"""
WITH docs AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id,
         list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '') AS tokens
  FROM documents
),
fieldnorms(v) AS (VALUES {_FN_VALUES}),
doclens AS (
  SELECT doc_id, len(tokens) AS doclen,
         (SELECT max(v) FROM fieldnorms WHERE v <= len(tokens)) AS decoded
  FROM docs
),
stats AS (SELECT count(*) AS n, CAST(sum(doclen) AS DOUBLE)/count(*) AS avgdl FROM doclens),
freqs AS (
  SELECT doc_id, term, count(*) AS freq
  FROM (SELECT doc_id, unnest(tokens) AS term FROM docs)
  {extra_terms_filter}
  GROUP BY 1, 2
),
dfs AS (SELECT term, count(*) AS df FROM freqs GROUP BY term),
weights AS (SELECT term, {_WEIGHT_SQL} AS w FROM dfs, stats),
norms AS (SELECT doc_id, {_NORM_SQL} AS norm FROM doclens, stats),
term_scores AS (
  SELECT f.doc_id, f.term, {_TERM_SCORE_SQL} AS score
  FROM freqs f JOIN weights w USING (term) JOIN norms n ON n.doc_id = f.doc_id
)"""


def _term_filter(terms: list[str]) -> str:
    vals = ",".join(f"('{t}')" for t in terms)
    return f"WHERE term IN (SELECT t FROM (VALUES {vals}) q(t))"


def _f32_sum(cols: list[str]) -> str:
    acc = cols[0]
    for c in cols[1:]:
        acc = _f32(acc + " + " + c)
    return acc


def bm25_topk_sql(
    should: list[str],
    must: list[str] = (),
    must_not: list[str] = (),
    k: int = 10,
    offset: int = 0,
    hydrate_content: bool = False,
) -> str:
    """Top-k BM25 over the default lenient semantics.

    Matching: all ``must`` terms AND (any ``should`` if no must, else
    should optional) AND no ``must_not``; score = f32 ordered sum of the
    must scores then the should scores (parse order).  ``offset`` pages
    with page-local rank (restarting at 1, the engine's convention);
    ``hydrate_content`` joins the stored text column onto the winners.
    """
    should, must, must_not = list(should), list(must), list(must_not)
    all_terms = list(dict.fromkeys([*must, *should, *must_not]))
    scored = [*must, *should]
    joins, score_cols, idx = [], [], 0
    alias_of = {}
    for t in dict.fromkeys([*scored, *must_not]):
        alias = f"s{idx}"
        alias_of[t] = alias
        joins.append(
            f"LEFT JOIN term_scores {alias} ON {alias}.doc_id = d.doc_id AND {alias}.term = '{t}'"
        )
        idx += 1
    for t in scored:
        score_cols.append(f"COALESCE({alias_of[t]}.score, {_r('0.0')})")
    conds = []
    for t in must:
        conds.append(f"{alias_of[t]}.score IS NOT NULL")
    if should and not must:
        conds.append(
            "(" + " OR ".join(f"{alias_of[t]}.score IS NOT NULL" for t in should) + ")"
        )
    for t in must_not:
        conds.append(f"{alias_of[t]}.score IS NULL")
    where = " AND ".join(conds) if conds else "TRUE"
    base = f"""{_base_ctes(_term_filter(all_terms))}
SELECT d.doc_id, {_f32_sum(score_cols)} AS score,
       CAST(row_number() OVER (ORDER BY {_f32_sum(score_cols)} DESC, d.doc_id ASC) AS INT) - {offset} AS rank
FROM (SELECT doc_id FROM docs) d
{chr(10).join(joins)}
WHERE {where}
ORDER BY score DESC, d.doc_id ASC
LIMIT {k} OFFSET {offset}
"""
    if not hydrate_content:
        return base
    return f"""
SELECT b.doc_id, b.score, CAST(b.rank AS INT) AS rank, dd.text AS content
FROM ({base.rstrip()}) b
JOIN documents dd ON CAST(dd.doc_id AS VARCHAR) = b.doc_id
"""


def bm25_count_sql(should: list[str]) -> str:
    """Exact match count for a Should-of-terms query."""
    vals = ",".join(f"('{t}')" for t in should)
    return f"""{_base_ctes(_term_filter(list(should)))}
SELECT count(DISTINCT doc_id) AS n_matches FROM term_scores
WHERE term IN (SELECT t FROM (VALUES {vals}) q(t))
"""


def _const_filter_topk_sql(term: str, filter_sql: str, k: int) -> str:
    """Shared shape for ``term AND <docs-table leaf>``: the non-text leaf
    is a ConstScorer (1.0f per matching doc, reference index.rs docs-table
    leaves), MUST-combined with the term — score = f32(s_term + 1.0f) in
    parse order, matching the engine's compiled eval tree."""
    zero = _r("0.0")
    one = _r("1.0")
    score = _f32(f"COALESCE(s0.score, {zero}) + {one}")
    return f"""{_base_ctes(_term_filter([term]))}
SELECT d.doc_id, {score} AS score,
       CAST(row_number() OVER (ORDER BY {score} DESC, d.doc_id ASC) AS INT) AS rank
FROM (SELECT doc_id FROM docs) d
LEFT JOIN term_scores s0 ON s0.doc_id = d.doc_id AND s0.term = '{term}'
WHERE s0.score IS NOT NULL AND {filter_sql}
ORDER BY score DESC, d.doc_id ASC
LIMIT {k}
"""


def bm25_range_filter_sql(term: str, lower: str, upper: str, k: int = 10) -> str:
    """``term AND id:[lower TO upper]`` — inclusive KEYWORD range over the
    primary key.  KEYWORD ranges compare as strings on BOTH sides
    (Spark UTF8String binary compare ≡ DuckDB default binary collation
    for ASCII), so the oracle's varchar BETWEEN replicates the engine's
    lexicographic semantics exactly."""
    cond = f"d.doc_id >= '{lower}' AND d.doc_id <= '{upper}'"
    return _const_filter_topk_sql(term, cond, k)


def bm25_set_filter_sql(term: str, values: list[str], k: int = 10) -> str:
    """``term AND id:IN [v1 v2 ...]`` — set leaf over the primary key."""
    vals = ",".join(f"'{v}'" for v in values)
    return _const_filter_topk_sql(term, f"d.doc_id IN ({vals})", k)


def bm25_cass_nested_sql(a: str, b: str, c: str, k: int = 10) -> str:
    """CASS grammar ``a AND b OR c`` — OR binds TIGHTER than AND
    (cass.py; reference CASS parser), so this is ``a AND (b OR c)``:
    matched = m_a AND (m_b OR m_c); score follows the EVAL TREE's nested
    f32 accumulation ``f32(s_a + f32(s_b + s_c))``, which is observably
    different in binary32 rounding from the flat left-fold
    ``f32(f32(s_a + s_b) + s_c)`` the default grammar produces — i.e.
    this oracle pins the GROUPING the CASS precedence implies, not just
    the match set."""
    zero = _r("0.0")
    coal = [f"COALESCE(s{i}.score, {zero})" for i in range(3)]
    inner = _f32(coal[1] + " + " + coal[2])
    score = _f32(coal[0] + " + " + inner)
    joins = "\n".join(
        f"LEFT JOIN term_scores s{i} ON s{i}.doc_id = d.doc_id AND s{i}.term = '{t}'"
        for i, t in enumerate((a, b, c))
    )
    return f"""{_base_ctes(_term_filter([a, b, c]))}
SELECT d.doc_id, {score} AS score,
       CAST(row_number() OVER (ORDER BY {score} DESC, d.doc_id ASC) AS INT) AS rank
FROM (SELECT doc_id FROM docs) d
{joins}
WHERE s0.score IS NOT NULL AND (s1.score IS NOT NULL OR s2.score IS NOT NULL)
ORDER BY score DESC, d.doc_id ASC
LIMIT {k}
"""


def bm25_glob_mix_sql(prefix: str, term: str, k: int = 10) -> str:
    """Should-of [glob(prefix*), term]: the glob leaf scores a constant
    1.0f per match (ConstScorer semantics, reference index.rs glob leaves),
    f32-summed with the term's BM25 score in parse order (glob clause
    first).  Mirrors the engine's dictionary expansion exactly on corpora
    whose matching-term count is under the 16,384 expansion cap."""
    zero = _r("0.0")
    one = _r("1.0")
    g = f"CASE WHEN g.doc_id IS NOT NULL THEN {one} ELSE {zero} END"
    score = _f32(_f32(zero + " + " + g) + " + " + f"COALESCE(s0.score, {zero})")
    return f"""{_base_ctes(_term_filter([term]))}
, glob_hits AS (
  SELECT DISTINCT doc_id
  FROM (SELECT doc_id, unnest(tokens) AS t FROM docs)
  WHERE t LIKE '{prefix}%'
)
SELECT d.doc_id, {score} AS score,
       CAST(row_number() OVER (ORDER BY {score} DESC, d.doc_id ASC) AS INT) AS rank
FROM (SELECT doc_id FROM docs) d
LEFT JOIN glob_hits g ON g.doc_id = d.doc_id
LEFT JOIN term_scores s0 ON s0.doc_id = d.doc_id AND s0.term = '{term}'
WHERE g.doc_id IS NOT NULL OR s0.score IS NOT NULL
ORDER BY score DESC, d.doc_id ASC
LIMIT {k}
"""


def bm25_phrase_sql(terms: list[str], k: int = 10) -> str:
    """Top-k for an adjacent-position phrase (slop 0).

    tf = phrase occurrence count; weight = f32 left-to-right sum of the
    member-term idfs, * (1+k1); norm as usual.
    """
    n = len(terms)
    adjacency = " AND ".join(
        f"tokens[i+{j}] = '{t}'" for j, t in enumerate(terms)
    )
    # f32 left-to-right idf accumulation over phrase terms
    idf_of = (
        lambda alias: _f32(
            "ln("
            + _f32(
                _r("1.0")
                + " + "
                + _f32(
                    _f32(_r(f"stats.n - {alias}.df") + " + " + _r("0.5"))
                    + " / "
                    + _f32(_r(f"{alias}.df") + " + " + _r("0.5"))
                )
            )
            + ")"
        )
    )
    acc = idf_of("d0")
    for i in range(1, n):
        acc = _f32(acc + " + " + idf_of(f"d{i}"))
    weight = _f32(acc + " * " + _f32(_r("1.0") + " + " + _r("1.2")))
    df_joins = "\n".join(
        f"JOIN (SELECT df FROM dfs WHERE term = '{t}') d{i} ON TRUE" for i, t in enumerate(terms)
    )
    score = _f32(
        "pw.w * "
        + _f32(_r("p.occurrences") + " / " + _f32(_r("p.occurrences") + " + n.norm"))
    )
    return f"""{_base_ctes(_term_filter(list(dict.fromkeys(terms))))}
, phrase_freqs AS (
  SELECT doc_id,
         len(list_filter(range(1, len(tokens) - {n - 2}), i -> {adjacency})) AS occurrences
  FROM docs
),
phrase_weight AS (
  SELECT {weight} AS w FROM stats
  {df_joins}
)
SELECT p.doc_id AS doc_id, {score} AS score,
       CAST(row_number() OVER (ORDER BY {score} DESC, p.doc_id ASC) AS INT) AS rank
FROM phrase_freqs p JOIN norms n ON n.doc_id = p.doc_id, phrase_weight pw
WHERE p.occurrences > 0
ORDER BY score DESC, doc_id ASC
LIMIT {k}
"""


# ── index-structure oracles ────────────────────────────────────────────────


def docid_assignment_sql() -> str:
    return """
SELECT CAST(row_number() OVER (ORDER BY CAST(doc_id AS VARCHAR) ASC) - 1 AS BIGINT) AS docid,
       CAST(doc_id AS VARCHAR) AS doc_id
FROM documents
"""


def doclens_fieldnorms_sql() -> str:
    return f"""
WITH docs AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id,
         list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '') AS tokens
  FROM documents
),
fieldnorms(i, v) AS (VALUES {_FN_ID_VALUES})
SELECT doc_id, CAST(len(tokens) AS INT) AS doclen,
       CAST((SELECT max(i) FROM fieldnorms WHERE v <= len(tokens)) AS INT) AS fnid
FROM docs
"""


def term_dictionary_sql(terms: list[str]) -> str:
    vals = ",".join(f"('{t}')" for t in terms)
    return f"""
WITH toks AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id, unnest(
    list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '')
  ) AS term
  FROM documents
)
SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS df, CAST(count(*) AS BIGINT) AS cf
FROM toks WHERE term IN (SELECT t FROM (VALUES {vals}) q(t))
GROUP BY term
"""


def top_terms_sql(k: int = 20) -> str:
    return f"""
WITH toks AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id, unnest(
    list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '')
  ) AS term
  FROM documents
)
SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
FROM toks GROUP BY term
ORDER BY df DESC, term ASC
LIMIT {k}
"""


def field_stats_sql() -> str:
    return """
WITH docs AS (
  SELECT list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '') AS tokens
  FROM documents
)
SELECT 'content' AS field, CAST(count(*) AS BIGINT) AS doc_count,
       CAST(sum(len(tokens)) AS BIGINT) AS total_tokens
FROM docs
"""


# ── training-data op oracles ───────────────────────────────────────────────


def index_metrics_rollup_sql() -> str:
    """Index-wide rollup of ``segment_metrics()``'s data-derived columns.

    Each doc lives in exactly ONE segment, so summing per-segment
    doc/token/posting-entry counts over all live segments must equal the
    corpus-level quantities DuckDB can compute independently from the raw
    text: doc count, tokenized length sum, and distinct (doc, term) pairs.
    (Per-segment ``terms`` and ``posting_blocks`` are NOT segment-
    independent — terms span segments and blocks depend on per-segment df
    — so they are excluded from the oracle-checked projection.)"""
    return f"""{_base_ctes()}
SELECT CAST(count(*) AS BIGINT) AS n_docs,
       CAST((SELECT sum(doclen) FROM doclens) AS BIGINT) AS total_tokens,
       CAST((SELECT count(*) FROM freqs) AS BIGINT) AS posting_entries,
       CAST(0 AS BIGINT) AS tombstoned_docs
FROM docs
"""


def dedup_exact_sql() -> str:
    return """
SELECT CAST(doc_id AS VARCHAR) AS doc_id,
       (row_number() OVER (PARTITION BY text ORDER BY CAST(doc_id AS VARCHAR)) > 1) AS is_duplicate
FROM documents
"""


def token_counts_sql() -> str:
    return """
WITH docs AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id,
         list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '') AS tokens
  FROM documents
)
SELECT doc_id, CAST(len(tokens) AS INT) AS n_tokens,
       CAST(len(list_distinct(tokens)) AS INT) AS n_unique
FROM docs
"""


def langid_stopword_sql(stopwords: tuple[str, ...]) -> str:
    vals = ",".join(f"'{s}'" for s in stopwords)
    return f"""
WITH docs AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id,
         list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '') AS tokens
  FROM documents
)
SELECT doc_id,
  CASE WHEN len(tokens) > 0
       THEN round(CAST(len(list_filter(tokens, x -> x IN ({vals}))) AS DOUBLE)
                  / CAST(len(tokens) AS DOUBLE), 6)
       ELSE 0.0 END AS stop_ratio,
  CASE WHEN len(tokens) > 0
       THEN round(CAST(len(list_filter(tokens, x -> x IN ({vals}))) AS DOUBLE)
                  / CAST(len(tokens) AS DOUBLE), 6) >= 0.05
       ELSE FALSE END AS is_en
FROM docs
"""


def quality_signals_sql() -> str:
    return """
WITH docs AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id, text,
         list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '') AS tokens
  FROM documents
)
SELECT doc_id, CAST(length(text) AS INT) AS n_chars, CAST(len(tokens) AS INT) AS n_tokens,
  CASE WHEN len(tokens) > 0
       THEN round(CAST(list_sum(list_transform(tokens, x -> length(x))) AS DOUBLE)
                  / CAST(len(tokens) AS DOUBLE), 6)
       ELSE 0.0 END AS avg_token_len
FROM docs
"""


def doc_fingerprint_sql() -> str:
    return """
WITH docs AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id,
         list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '') AS tokens
  FROM documents
)
SELECT doc_id, md5(array_to_string(tokens, ' ')) AS fingerprint
FROM docs
"""


def embedding_cosine_topk_sql(query_vec: list[float], k: int = 10) -> str:
    dim = len(query_vec)
    qlits = ",".join(repr(float(v)) for v in query_vec)
    qnorm = sum(float(v) * float(v) for v in query_vec) ** 0.5
    return f"""
WITH scored AS (
  SELECT vec_id,
    list_sum(list_transform(range(1, {dim + 1}),
             i -> CAST(embedding[i] AS DOUBLE) * ([{qlits}])[i])) AS dot,
    sqrt(list_sum(list_transform(range(1, {dim + 1}),
             i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)))) AS dn
  FROM embeddings
)
SELECT CAST(vec_id AS BIGINT) AS vec_id,
       round(CASE WHEN dn > 0 THEN dot / (dn * {qnorm!r}) ELSE 0.0 END, 6) AS cosine
FROM scored
ORDER BY cosine DESC, vec_id ASC
LIMIT {k}
"""


# ── dedup-suite oracles (pinned polynomial hash shared with the engine) ────

_POLY = (
    "list_reduce(list_prepend(CAST(0 AS BIGINT), "
    "list_transform(string_split({s}, ''), c -> CAST(ascii(c) AS BIGINT))), "
    "(h, c) -> (h*31 + c) % 1000000007)"
)


def _poly(expr: str) -> str:
    return _POLY.format(s=expr)


def _shingle_ctes(n: int = 3) -> str:
    return f"""
WITH docs AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id,
         list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '') AS tokens
  FROM documents
),
shingled AS (
  SELECT doc_id,
    list_distinct(CASE WHEN len(tokens) < {n}
      THEN [array_to_string(tokens, ' ')]
      ELSE list_transform(range(1, len(tokens) - {n} + 2),
                          i -> array_to_string(tokens[i:i+{n - 1}], ' '))
      END) AS shingles
  FROM docs
)"""


def minhash_lsh_pairs_sql(
    threshold: float = 0.5, max_band_bucket: int | None = None
) -> str:
    from ..operators.dedup import (
        DEFAULT_MINHASH_BUCKET_CAP,
        HASH_MOD,
        LSH_BANDS,
        LSH_ROWS,
        MINHASH_A,
        MINHASH_B,
    )

    if max_band_bucket is None:
        max_band_bucket = DEFAULT_MINHASH_BUCKET_CAP

    sig_cols = ", ".join(
        f"list_min(list_transform(hashes, h -> (h*{a} + {b}) % {HASH_MOD})) AS s{i}"
        for i, (a, b) in enumerate(zip(MINHASH_A, MINHASH_B))
    )
    band_keys = ", ".join(
        "'"
        + str(i)
        + "_' || "
        + " || '_' || ".join(
            f"CAST(s{i * LSH_ROWS + r} AS VARCHAR)" for r in range(LSH_ROWS)
        )
        for i in range(LSH_BANDS)
    )
    return f"""{_shingle_ctes()},
hashed AS (
  SELECT doc_id, shingles, list_transform(shingles, s -> {_poly('s')}) AS hashes
  FROM shingled WHERE len(shingles) > 0
),
sigs AS (SELECT doc_id, shingles, {sig_cols} FROM hashed),
bands_raw AS (SELECT doc_id, unnest([{band_keys}]) AS band_key FROM sigs),
-- per-band bucket cap: mirrors the engine's skew guard bit-for-bit
bands AS (
  SELECT doc_id, band_key FROM (
    SELECT doc_id, band_key, count(*) OVER (PARTITION BY band_key) AS bc
    FROM bands_raw
  ) WHERE bc <= {max_band_bucket}
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b
  FROM bands a JOIN bands b USING (band_key)
  WHERE a.doc_id < b.doc_id
)
SELECT c.doc_id_a, c.doc_id_b,
       round(CAST(len(list_intersect(sa.shingles, sb.shingles)) AS DOUBLE)
             / CAST(len(list_distinct(list_concat(sa.shingles, sb.shingles))) AS DOUBLE), 6) AS jaccard
FROM cand c
JOIN sigs sa ON sa.doc_id = c.doc_id_a
JOIN sigs sb ON sb.doc_id = c.doc_id_b
WHERE round(CAST(len(list_intersect(sa.shingles, sb.shingles)) AS DOUBLE)
            / CAST(len(list_distinct(list_concat(sa.shingles, sb.shingles))) AS DOUBLE), 6) >= {threshold}
"""


def simhash_sql() -> str:
    from ..operators.dedup import SIMHASH_BITS

    bit_sums = ", ".join(
        f"sum(CASE WHEN (h >> {j}) & 1 = 1 THEN freq ELSE -freq END) AS b{j}"
        for j in range(SIMHASH_BITS)
    )
    fp = " + ".join(
        f"CASE WHEN b{j} > 0 THEN {1 << j} ELSE 0 END" for j in range(SIMHASH_BITS)
    )
    return f"""
WITH toks AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id, unnest(
    list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '')
  ) AS term
  FROM documents
),
freqs AS (SELECT doc_id, term, count(*) AS freq FROM toks GROUP BY 1, 2),
hashed AS (SELECT doc_id, freq, {_poly('term')} AS h FROM freqs),
bits AS (SELECT doc_id, {bit_sums} FROM hashed GROUP BY doc_id)
SELECT doc_id, CAST({fp} AS BIGINT) AS simhash FROM bits
"""


def ngram_jaccard_pairs_sql(threshold: float = 0.5, n: int = 3) -> str:
    return f"""{_shingle_ctes(n)},
sizes AS (SELECT doc_id, len(shingles) AS n_sh FROM shingled WHERE len(shingles) > 0),
inv AS (SELECT doc_id, unnest(shingles) AS shingle FROM shingled WHERE len(shingles) > 0),
inter AS (
  SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b, count(*) AS inter
  FROM inv a JOIN inv b USING (shingle)
  WHERE a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_id_a, doc_id_b,
       round(CAST(inter AS DOUBLE) / CAST(sa.n_sh + sb.n_sh - inter AS DOUBLE), 6) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = doc_id_a
JOIN sizes sb ON sb.doc_id = doc_id_b
WHERE round(CAST(inter AS DOUBLE) / CAST(sa.n_sh + sb.n_sh - inter AS DOUBLE), 6) >= {threshold}
"""


def _plane_dot_sql(vec_expr: str, plane) -> str:
    """Left-fold f64 dot against literal plane weights (order-pinned)."""
    dim = len(plane)
    weights = ",".join(repr(float(w)) for w in plane)
    return (
        f"list_reduce(list_prepend(0.0, list_transform(range(1, {dim + 1}), "
        f"i -> CAST({vec_expr}[i] AS DOUBLE) * ([{weights}])[i])), (a, x) -> a + x)"
    )


def _bucket_sql(vec_expr: str, n_planes: int | None = None) -> str:
    from ..operators.dedup import lsh_planes

    planes = lsh_planes(n_planes) if n_planes else lsh_planes()
    terms = " + ".join(
        f"CASE WHEN {_plane_dot_sql(vec_expr, plane)} > 0 THEN {1 << j} ELSE 0 END"
        for j, plane in enumerate(planes)
    )
    return f"({terms})"


def _self_dot_sql(vec_expr: str, dim: int) -> str:
    return (
        f"list_reduce(list_prepend(0.0, list_transform(range(1, {dim + 1}), "
        f"i -> CAST({vec_expr}[i] AS DOUBLE) * CAST({vec_expr}[i] AS DOUBLE))), (a, x) -> a + x)"
    )


def _band_key_sql(vec_expr: str, planes, n_bands: int, n_rows: int) -> str:
    """Comma-joined per-band key expressions mirroring
    ``dedup.embedding_band_keys`` ("<band>_<row-sign-bitmap>")."""
    keys = []
    for band in range(n_bands):
        code = " + ".join(
            f"CASE WHEN {_plane_dot_sql(vec_expr, planes[band * n_rows + r])} > 0 "
            f"THEN {1 << r} ELSE 0 END"
            for r in range(n_rows)
        )
        keys.append(f"'{band}_' || CAST(({code}) AS VARCHAR)")
    return ", ".join(keys)


def embedding_near_dup_sql(
    threshold: float = 0.9,
    dim: int = 64,
    n_bands: int | None = None,
    n_rows: int | None = None,
    max_band_bucket: int | None = None,
) -> str:
    from ..operators.dedup import (
        DEFAULT_EMBED_BUCKET_CAP,
        EMBED_LSH_BANDS,
        EMBED_LSH_ROWS,
        lsh_planes,
    )

    if n_bands is None:
        n_bands = EMBED_LSH_BANDS
    if n_rows is None:
        n_rows = EMBED_LSH_ROWS
    if max_band_bucket is None:
        max_band_bucket = DEFAULT_EMBED_BUCKET_CAP
    planes = lsh_planes(n_bands * n_rows)
    pair_dot = (
        f"list_reduce(list_prepend(0.0, list_transform(range(1, {dim + 1}), "
        "i -> CAST(na.embedding[i] AS DOUBLE) * CAST(nb.embedding[i] AS DOUBLE))), (x, y) -> x + y)"
    )
    return f"""
WITH based AS (
  SELECT CAST(vec_id AS BIGINT) AS vid, embedding,
         sqrt({_self_dot_sql('embedding', dim)}) AS nrm
  FROM embeddings
),
bands_raw AS (
  SELECT vid, unnest([{_band_key_sql('embedding', planes, n_bands, n_rows)}]) AS band_key
  FROM based
),
bands AS (
  SELECT vid, band_key FROM (
    SELECT vid, band_key, count(*) OVER (PARTITION BY band_key) AS bc
    FROM bands_raw
  ) WHERE bc <= {max_band_bucket}
),
cand AS (
  SELECT DISTINCT a.vid AS vid_a, b.vid AS vid_b
  FROM bands a JOIN bands b USING (band_key)
  WHERE a.vid < b.vid
)
SELECT c.vid_a AS vec_id_a, c.vid_b AS vec_id_b,
       round({pair_dot} / (na.nrm * nb.nrm), 6) AS cosine
FROM cand c
JOIN based na ON na.vid = c.vid_a
JOIN based nb ON nb.vid = c.vid_b
WHERE round({pair_dot} / (na.nrm * nb.nrm), 6) >= {threshold}
"""


def embedding_cosine_lsh_topk_sql(query_vec: list[float], k: int = 10, n_planes: int | None = None) -> str:
    import numpy as np

    from ..operators.dedup import lsh_planes

    planes = lsh_planes(n_planes) if n_planes else lsh_planes()
    q = np.asarray(query_vec, dtype=np.float64)
    qbucket = 0
    for j, plane in enumerate(planes):
        acc = 0.0
        for x, w in zip(q, plane):
            acc += float(x) * float(w)
        if acc > 0:
            qbucket |= 1 << j
    qnorm = float(np.sqrt((q * q).sum()))
    dim = len(query_vec)
    qdot = _plane_dot_sql("embedding", [float(v) for v in q])
    return f"""
SELECT CAST(vec_id AS BIGINT) AS vec_id,
       round(CASE WHEN {_self_dot_sql('embedding', dim)} > 0
             THEN {qdot} / (sqrt({_self_dot_sql('embedding', dim)}) * {qnorm!r})
             ELSE 0.0 END, 6) AS cosine
FROM embeddings
WHERE {_bucket_sql('embedding', n_planes)} = {qbucket}
ORDER BY cosine DESC, vec_id ASC
LIMIT {k}
"""


def events_hourly_rollup_sql() -> str:
    return """
SELECT event_type,
       CAST(floor(CAST(epoch(ts) AS DOUBLE) / 3600) * 3600 AS BIGINT) AS hour_epoch,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM events
GROUP BY 1, 2
"""
