"""DuckDB oracle SQL for the text-analysis operators (§2.5)."""

_TOKS = "list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), t -> t <> '')"

_MARKER_SQL = {
    "en": "['the', 'a', 'value', 'data', 'fast']",
    "de": "['der', 'und', 'nicht', 'das', 'ist']",
    "es": "['el', 'de', 'que', 'la', 'los']",
    "fr": "['le', 'la', 'et', 'les', 'des']",
    "zh": "['de5', 'le5', 'shi4', 'zai4', 'he2']",
}

_SCORE_STRUCTS = ", ".join(
    f"{{'score': CAST(len(list_filter(toks, t -> list_contains({markers}, t))) AS INTEGER), 'code': '{code}'}}"
    for code, markers in sorted(_MARKER_SQL.items())
)

TEXT_ORACLES: dict[str, str] = {
    "text_token_stats": f"""
        SELECT doc_id,
               CAST(len(list_filter(regexp_split_to_array(text, '\\s+'), t -> t <> '')) AS INTEGER)
                   AS n_ws_tokens,
               CAST(len(toks) AS INTEGER) AS n_word_tokens,
               CAST(len(list_distinct(toks)) AS INTEGER) AS n_distinct_tokens,
               ROUND(CAST(list_sum(list_transform(toks, t -> length(t))) AS DOUBLE)
                     / greatest(len(toks), 1), 4) AS avg_token_len
        FROM (SELECT doc_id, text, {_TOKS} AS toks FROM documents)
        ORDER BY doc_id
    """,
    "text_quality_score": f"""
        WITH base AS (
            SELECT doc_id, text, {_TOKS} AS toks FROM documents
        ), m AS (
            SELECT doc_id,
                   length(text) AS n_chars_text,
                   CAST(len(toks) AS INTEGER) AS n_tokens,
                   CAST(len(list_distinct(toks)) AS DOUBLE)
                       / greatest(len(toks), 1) AS distinct_ratio,
                   CAST(len(list_filter(toks, t -> list_contains(
                        ['the','a','of','and','to','in','is','it'], t))) AS DOUBLE)
                       / greatest(len(toks), 1) AS stop_ratio,
                   CAST(length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS DOUBLE)
                       / greatest(length(text), 1) AS punct_density,
                   CASE WHEN length(text) >= 100 AND length(text) <= 20000
                        THEN 1.0 ELSE 0.5 END AS len_score
            FROM base
        )
        SELECT doc_id, n_chars_text, n_tokens,
               ROUND(distinct_ratio, 4) AS distinct_ratio,
               ROUND(stop_ratio, 4) AS stop_ratio,
               ROUND(0.4 * distinct_ratio
                     + 0.3 * least(stop_ratio * 4, 1.0)
                     + 0.2 * len_score
                     + 0.1 * (1 - least(punct_density * 10, 1.0)), 4) AS quality
        FROM m
        ORDER BY doc_id
    """,
    "text_langid": f"""
        SELECT doc_id, lang,
               (list_max([{_SCORE_STRUCTS}])).code AS pred_lang,
               (list_max([{_SCORE_STRUCTS}])).score AS marker_hits
        FROM (SELECT doc_id, lang, {_TOKS} AS toks FROM documents)
        ORDER BY doc_id
    """,
    "text_fingerprint": f"""
        SELECT doc_id,
               md5(list_aggregate({_TOKS}, 'string_agg', ' ')) AS fingerprint,
               substr(md5(list_aggregate({_TOKS}, 'string_agg', ' ')), 1, 8) AS shard_key
        FROM documents
        ORDER BY doc_id
    """,
}


TEXT_ORACLES["text_top_ngrams"] = f"""
    WITH toks AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    grams AS (
        SELECT unnest(list_transform(range(1, greatest(len(toks) - 2, 0) + 1),
                   i -> concat(toks[i], ' ', toks[i+1], ' ', toks[i+2]))) AS ngram
        FROM toks
    )
    SELECT ngram, COUNT(*) AS cnt
    FROM grams
    GROUP BY ngram
    ORDER BY cnt DESC, ngram
    LIMIT 20
"""


TEXT_ORACLES["text_lang_distribution"] = f"""
    SELECT lang,
           (list_max([{_SCORE_STRUCTS}])).code AS pred_lang,
           COUNT(*) AS n_docs
    FROM (SELECT doc_id, lang, {_TOKS} AS toks FROM documents)
    GROUP BY 1, 2
    ORDER BY 1, 2
"""


from distributed_mapreduce_server_spark.operators.text import QUALITY_KEEP_T  # noqa: E402

TEXT_ORACLES["text_quality_keep"] = f"""
    SELECT doc_id, quality FROM (
        {TEXT_ORACLES["text_quality_score"]}
    ) WHERE quality >= {QUALITY_KEEP_T}
    ORDER BY doc_id
"""


from distributed_mapreduce_server_spark.operators.text import SPLIT_PCT_VAL  # noqa: E402

TEXT_ORACLES["text_train_val_split"] = f"""
    SELECT CASE WHEN CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
                     % 100 < {SPLIT_PCT_VAL}
                THEN 'val' ELSE 'train' END AS split,
           COUNT(*) AS n_docs,
           CAST(SUM(len({_TOKS})) AS BIGINT) AS total_tokens
    FROM documents
    GROUP BY 1
    ORDER BY 1
"""


from distributed_mapreduce_server_spark.operators.text import (  # noqa: E402
    CHUNK_SIZE,
    SAMPLE_MOD,
    SAMPLE_SEED,
    TFIDF_TOP_K,
)

TEXT_ORACLES["text_chunking"] = f"""
    WITH toks AS (SELECT doc_id, {_TOKS} AS t FROM documents)
    SELECT doc_id, CAST(i AS INTEGER) AS chunk_id,
           array_to_string(t[(i*{CHUNK_SIZE}+1):(i*{CHUNK_SIZE}+{CHUNK_SIZE})], ' ') AS chunk_text,
           CAST(len(t[(i*{CHUNK_SIZE}+1):(i*{CHUNK_SIZE}+{CHUNK_SIZE})]) AS INTEGER) AS n_tokens
    FROM toks, UNNEST(range(0, CAST(ceil(len(t)/{CHUNK_SIZE}.0) AS BIGINT))) AS u(i)
    ORDER BY doc_id, chunk_id
"""

TEXT_ORACLES["text_tfidf"] = f"""
    WITH tok AS (SELECT doc_id, unnest({_TOKS}) AS term FROM documents),
    tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
    df_t AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM tok GROUP BY 1),
    n AS (SELECT COUNT(*) AS n_docs FROM documents),
    scored AS (
        SELECT tf.doc_id, tf.term, tf.tf, df_t.df,
               ROUND(tf.tf * ln(CAST(n.n_docs AS DOUBLE) / df_t.df), 6) AS tfidf
        FROM tf JOIN df_t USING (term) CROSS JOIN n
    ),
    ranked AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                                     ORDER BY tfidf DESC, term) AS rk
        FROM scored
    )
    SELECT doc_id, term, tf, df, tfidf FROM ranked WHERE rk <= {TFIDF_TOP_K}
    ORDER BY doc_id, tfidf DESC, term
"""

TEXT_ORACLES["text_sample_stratified"] = f"""
    SELECT doc_id, lang, source FROM documents
    WHERE CAST(concat('0x', substr(md5(concat('{SAMPLE_SEED}|', CAST(doc_id AS VARCHAR))), 1, 15))
               AS BIGINT) % {SAMPLE_MOD} = 0
    ORDER BY doc_id
"""

TEXT_ORACLES["text_repetition_ratio"] = f"""
    WITH toks AS (SELECT doc_id, {_TOKS} AS t FROM documents),
    grams AS (
        SELECT doc_id, t,
               list_transform(range(1, greatest(len(t), 1)),
                              i -> concat(t[i], ' ', t[i+1])) AS g2,
               list_transform(range(1, greatest(len(t) - 1, 1)),
                              i -> concat(t[i], ' ', t[i+1], ' ', t[i+2])) AS g3
        FROM toks
    )
    SELECT doc_id,
           CAST(len(t) AS INTEGER) AS n_tokens,
           ROUND((len(t) - len(list_distinct(t)))
                 / CAST(greatest(len(t), 1) AS DOUBLE), 4) AS dup_token_frac,
           ROUND((len(g2) - len(list_distinct(g2)))
                 / CAST(greatest(len(g2), 1) AS DOUBLE), 4) AS dup_bigram_frac,
           ROUND((len(g3) - len(list_distinct(g3)))
                 / CAST(greatest(len(g3), 1) AS DOUBLE), 4) AS dup_trigram_frac,
           ROUND(list_max(list_transform(list_distinct(t),
                          u -> len(list_filter(t, x -> x = u))))
                 / CAST(greatest(len(t), 1) AS DOUBLE), 4) AS top_token_frac
    FROM grams
    ORDER BY doc_id
"""

TEXT_ORACLES["text_source_mix"] = f"""
    WITH per_src AS (
        SELECT source, COUNT(*) AS n_docs,
               CAST(SUM(len({_TOKS})) AS BIGINT) AS n_tokens
        FROM documents GROUP BY source
    ),
    totals AS (
        SELECT SUM(n_tokens) AS tot_tokens,
               SUM(sqrt(CAST(n_tokens AS DOUBLE))) AS tot_sqrt
        FROM per_src
    )
    SELECT source, n_docs, n_tokens,
           ROUND(n_tokens / CAST(tot_tokens AS DOUBLE), 6) AS token_share,
           ROUND(sqrt(CAST(n_tokens AS DOUBLE)) / tot_sqrt, 6) AS sample_weight
    FROM per_src CROSS JOIN totals
    ORDER BY source
"""

def _canon_cte(keep_text: bool) -> str:
    """Shared quality-score -> exact-dedup-canonical CTE chain (base/m/
    kept/canon) for the two corpus-pipeline oracles — one copy of the
    five-term quality formula, so the pipelines can never desync."""
    text_col = "text," if keep_text else ""
    return f"""base AS (SELECT doc_id, lang, text, {_TOKS} AS toks FROM documents),
    m AS (
        SELECT doc_id, lang, {text_col}
               CAST(len(toks) AS INTEGER) AS n_tokens,
               md5(array_to_string(toks, ' ')) AS fp,
               ROUND(0.4 * (CAST(len(list_distinct(toks)) AS DOUBLE)
                            / greatest(len(toks), 1))
                     + 0.3 * least(CAST(len(list_filter(toks, t -> list_contains(
                           ['the','a','of','and','to','in','is','it'], t))) AS DOUBLE)
                           / greatest(len(toks), 1) * 4, 1.0)
                     + 0.2 * (CASE WHEN length(text) >= 100 AND length(text) <= 20000
                              THEN 1.0 ELSE 0.5 END)
                     + 0.1 * (1 - least(CAST(length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS DOUBLE)
                           / greatest(length(text), 1) * 10, 1.0)), 4) AS quality
        FROM base
    ),
    kept AS (SELECT * FROM m WHERE quality >= {QUALITY_KEEP_T}),
    canon AS (
        SELECT k.* FROM kept k
        JOIN (SELECT fp, MIN(doc_id) AS doc_id FROM kept GROUP BY fp) c
          ON k.fp = c.fp AND k.doc_id = c.doc_id
    )"""


_SPLIT_CASE = f"""CASE WHEN CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
                     % 100 < {SPLIT_PCT_VAL}
                THEN 'val' ELSE 'train' END"""


TEXT_ORACLES["text_corpus_pipeline"] = f"""
    WITH {_canon_cte(keep_text=False)}
    SELECT {_SPLIT_CASE} AS split,
           lang,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
    FROM canon
    GROUP BY 1, 2
    ORDER BY 1, 2
"""

TEXT_ORACLES["text_contamination_check"] = f"""
    WITH toks AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    grams AS (
        SELECT doc_id,
               CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
                   % 100 < {SPLIT_PCT_VAL} AS is_val,
               unnest(list_distinct(list_transform(
                   range(1, greatest(len(toks) - 2, 0) + 1),
                   i -> concat(toks[i], ' ', toks[i+1], ' ', toks[i+2])))) AS gram
        FROM toks
    ),
    train_grams AS (SELECT DISTINCT gram FROM grams WHERE NOT is_val),
    val_grams AS (SELECT doc_id, gram FROM grams WHERE is_val)
    SELECT v.doc_id,
           COUNT(*) AS n_grams,
           COUNT(t.gram) AS n_overlap,
           ROUND(COUNT(t.gram) / CAST(COUNT(*) AS DOUBLE), 4) AS contamination_rate
    FROM val_grams v LEFT JOIN train_grams t ON v.gram = t.gram
    GROUP BY v.doc_id
    ORDER BY v.doc_id
"""

TEXT_ORACLES["text_unigram_logprob"] = f"""
    WITH tok AS (SELECT doc_id, unnest({_TOKS}) AS term FROM documents),
    vocab AS (SELECT term, COUNT(*) AS cnt FROM tok GROUP BY 1),
    total AS (SELECT CAST(SUM(cnt) AS BIGINT) AS total FROM vocab)
    SELECT doc_id,
           COUNT(*) AS n_tokens,
           ROUND(AVG(-ln(cnt / CAST(total AS DOUBLE))), 4) AS avg_neg_logprob,
           ROUND(MAX(-ln(cnt / CAST(total AS DOUBLE))), 4) AS max_neg_logprob
    FROM tok JOIN vocab USING (term) CROSS JOIN total
    GROUP BY doc_id
    ORDER BY doc_id
"""

from distributed_mapreduce_server_spark.operators.dedup_oracles import (  # noqa: E402
    minhash_pairs_sql,
)

TEXT_ORACLES["text_corpus_pipeline_neardup"] = f"""
    WITH {_canon_cte(keep_text=True)},
    near_pairs AS (SELECT * FROM {minhash_pairs_sql("canon")} p),
    final AS (
        SELECT * FROM canon
        WHERE doc_id NOT IN (SELECT doc_b FROM near_pairs)
    )
    SELECT {_SPLIT_CASE} AS split,
           lang,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
    FROM final
    GROUP BY 1, 2
    ORDER BY 1, 2
"""

TEXT_ORACLES["text_bigram_logprob"] = f"""
    WITH toks AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    big AS (
        SELECT doc_id, toks[i] AS w1, toks[i+1] AS w2
        FROM toks, UNNEST(range(1, greatest(len(toks), 1))) AS u(i)
    ),
    bc AS (SELECT w1, w2, COUNT(*) AS c12 FROM big GROUP BY 1, 2),
    cc AS (SELECT w1, COUNT(*) AS c1 FROM big GROUP BY 1),
    v AS (SELECT COUNT(DISTINCT t) AS v FROM (SELECT unnest(toks) AS t FROM toks))
    SELECT doc_id,
           COUNT(*) AS n_bigrams,
           ROUND(AVG(-ln((c12 + 1) / CAST(c1 + v AS DOUBLE))), 4) AS avg_neg_logprob,
           ROUND(MAX(-ln((c12 + 1) / CAST(c1 + v AS DOUBLE))), 4) AS max_neg_logprob
    FROM big JOIN bc USING (w1, w2) JOIN cc USING (w1) CROSS JOIN v
    GROUP BY doc_id
    ORDER BY doc_id
"""


def _pii_oracle() -> str:
    """Built by concatenation (not f-string) so the regex braces stay
    literal; patterns imported from the operator module so both
    engines compile the identical source."""
    from distributed_mapreduce_server_spark.operators.text import (
        PII_EMAIL_RE,
        PII_IPV4_RE,
        PII_PHONE_RE,
    )

    inj = (
        "text || ' contact user' || doc_id || '@example.com or 10.0.' "
        "|| (doc_id % 256) || '.' || ((doc_id * 7) % 256) "
        "|| ' tel +1-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')"
    )
    scrub = (
        "regexp_replace(regexp_replace(regexp_replace(inj, '"
        + PII_EMAIL_RE
        + "', '<EMAIL>', 'g'), '"
        + PII_IPV4_RE
        + "', '<IP>', 'g'), '"
        + PII_PHONE_RE
        + "', '<PHONE>', 'g')"
    )
    return (
        "WITH base AS (SELECT doc_id, " + inj + " AS inj FROM documents),\n"
        "s AS (SELECT doc_id, inj, " + scrub + " AS scrubbed FROM base)\n"
        "SELECT doc_id,\n"
        "  CAST(len(regexp_extract_all(inj, '" + PII_EMAIL_RE + "')) AS INTEGER) AS n_emails,\n"
        "  CAST(len(regexp_extract_all(inj, '" + PII_IPV4_RE + "')) AS INTEGER) AS n_ips,\n"
        "  CAST(len(regexp_extract_all(inj, '" + PII_PHONE_RE + "')) AS INTEGER) AS n_phones,\n"
        "  length(scrubbed) AS scrubbed_len,\n"
        "  md5(scrubbed) AS scrubbed_md5\n"
        "FROM s ORDER BY doc_id"
    )


TEXT_ORACLES["text_pii_scrub"] = _pii_oracle()


def _packing_oracle() -> str:
    from distributed_mapreduce_server_spark.operators.text import PACK_BUDGET

    b = str(PACK_BUDGET)
    return f"""
        WITH RECURSIVE toks AS (
            SELECT source, doc_id,
                   CAST(len({_TOKS}) AS BIGINT) AS n_tokens,
                   ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id) AS rn
            FROM documents
        ),
        pk AS (
            SELECT source, doc_id, n_tokens, rn,
                   CAST(0 AS BIGINT) AS pack_id, n_tokens AS pack_used
            FROM toks WHERE rn = 1
            UNION ALL
            SELECT t.source, t.doc_id, t.n_tokens, t.rn,
                   CASE WHEN p.pack_used > 0 AND p.pack_used + t.n_tokens > {b}
                        THEN p.pack_id + 1 ELSE p.pack_id END,
                   CASE WHEN p.pack_used > 0 AND p.pack_used + t.n_tokens > {b}
                        THEN t.n_tokens ELSE p.pack_used + t.n_tokens END
            FROM pk p JOIN toks t ON t.source = p.source AND t.rn = p.rn + 1
        )
        SELECT source, doc_id, n_tokens, pack_id, pack_used
        FROM pk
        ORDER BY source, doc_id
    """


TEXT_ORACLES["text_sequence_packing"] = _packing_oracle()


def _c4_oracle() -> str:
    from distributed_mapreduce_server_spark.operators.text import (
        C4_BAD_PHRASES,
        C4_MIN_TOKENS,
    )

    bad = " OR ".join(f"contains(lower(text), '{p}')" for p in C4_BAD_PHRASES)
    return f"""
        WITH base AS (
            SELECT doc_id, text,
                   list_filter(string_split(text, chr(10)), l -> l <> '') AS ls,
                   {_TOKS} AS toks
            FROM documents
        )
        SELECT doc_id,
               CAST(len(ls) AS INTEGER) AS n_lines,
               ROUND(CAST(len(list_filter(ls,
                        l -> regexp_matches(l, '[.!?"]\\s*$'))) AS DOUBLE)
                     / greatest(len(ls), 1), 4) AS terminal_punct_ratio,
               ({bad}) AS has_bad_phrase,
               contains(text, '{{') AS has_curly,
               CAST(len(toks) AS INTEGER) AS n_tokens,
               (NOT ({bad}) AND NOT contains(text, '{{')
                AND len(toks) >= {C4_MIN_TOKENS}) AS keep
        FROM base
        ORDER BY doc_id
    """


TEXT_ORACLES["text_c4_filters"] = _c4_oracle()


TEXT_ORACLES["text_global_shuffle"] = """
    SELECT ROW_NUMBER() OVER (ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
               AS position,
           doc_id,
           md5(CAST(doc_id AS VARCHAR)) AS shuffle_key
    FROM documents
    ORDER BY position
"""

from distributed_mapreduce_server_spark.operators.text import (  # noqa: E402
    MIXTURE_RATE_GRID,
)

_U60_DOC = "CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)"
TEXT_ORACLES["text_mixture_sample"] = f"""
    WITH per_doc AS (
        SELECT doc_id, source, CAST(len({_TOKS}) AS BIGINT) AS n_tok
        FROM documents
    ),
    per_src AS (SELECT source, SUM(n_tok) AS src_tokens FROM per_doc GROUP BY source),
    budget AS (SELECT CAST(FLOOR(AVG(src_tokens)) AS BIGINT) AS budget FROM per_src),
    rates AS (
        SELECT source,
               LEAST(CAST({MIXTURE_RATE_GRID} AS BIGINT),
                     CAST(FLOOR({MIXTURE_RATE_GRID} * budget
                                / CAST(src_tokens AS DOUBLE)) AS BIGINT))
                   AS keep_grid
        FROM per_src, budget
    )
    SELECT d.source,
           ROUND(r.keep_grid / CAST({MIXTURE_RATE_GRID} AS DOUBLE), 4) AS keep_rate,
           COUNT(*) AS n_docs_kept,
           CAST(SUM(d.n_tok) AS BIGINT) AS tokens_kept
    FROM per_doc d JOIN rates r USING (source)
    WHERE {_U60_DOC} % {MIXTURE_RATE_GRID} < r.keep_grid
    GROUP BY 1, 2
    ORDER BY d.source
"""


# v3 semantic stage reuses dedup_oracles' cosine fragment so the
# pipeline and the standalone dedup_semantic_keep can never diverge.
from distributed_mapreduce_server_spark.operators.dedup import (  # noqa: E402
    COSINE_DEDUP_T as _SEM_T,
)
from distributed_mapreduce_server_spark.operators.dedup_oracles import (  # noqa: E402
    _COS_AB,
    minhash_pairs_sql,
)

TEXT_ORACLES["text_corpus_pipeline_semantic"] = f"""
    WITH {_canon_cte(keep_text=True)},
    near_pairs AS (SELECT * FROM {minhash_pairs_sql("canon")} p),
    survivors AS (
        SELECT * FROM canon
        WHERE doc_id NOT IN (SELECT doc_b FROM near_pairs)
    ),
    sem_pairs AS (
        SELECT a.vec_id AS va, b.vec_id AS vb
        FROM embeddings a
        JOIN survivors sa ON sa.doc_id = a.vec_id
        JOIN embeddings b ON a.vec_id < b.vec_id
        JOIN survivors sb ON sb.doc_id = b.vec_id
        WHERE {_COS_AB} >= {_SEM_T}
    ),
    final AS (
        SELECT * FROM survivors
        WHERE doc_id NOT IN (SELECT vb FROM sem_pairs)
    )
    SELECT {_SPLIT_CASE} AS split,
           lang,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
    FROM final
    GROUP BY 1, 2
    ORDER BY 1, 2
"""


from distributed_mapreduce_server_spark.operators.text import (  # noqa: E402
    PPL_BUCKETS as _PPL_B,
)

TEXT_ORACLES["text_perplexity_filter"] = f"""
    WITH lp AS (
        SELECT doc_id, avg_neg_logprob
        FROM ({TEXT_ORACLES["text_bigram_logprob"]})
    ),
    r AS (
        SELECT doc_id, avg_neg_logprob,
               ROW_NUMBER() OVER (ORDER BY avg_neg_logprob, doc_id) AS rk,
               COUNT(*) OVER () AS n
        FROM lp
    )
    SELECT doc_id, avg_neg_logprob,
           CASE ((rk - 1) * {_PPL_B}) // n
                WHEN 0 THEN 'head'
                WHEN 1 THEN 'middle'
                ELSE 'tail' END AS ppl_bucket
    FROM r
    ORDER BY doc_id
"""

TEXT_ORACLES["text_bpe_pair_counts"] = f"""
    WITH vocab AS (
        SELECT tok, COUNT(*) AS n
        FROM (SELECT unnest({_TOKS}) AS tok FROM documents)
        GROUP BY tok
    )
    SELECT substring(tok, CAST(i AS INTEGER), 1) || ' ' ||
               substring(tok, CAST(i + 1 AS INTEGER), 1) AS pair,
           CAST(SUM(n) AS BIGINT) AS cnt
    FROM (
        SELECT tok, n, unnest(generate_series(1, length(tok) - 1)) AS i
        FROM vocab
        WHERE length(tok) >= 2
    )
    GROUP BY 1
    ORDER BY cnt DESC, pair
    LIMIT 20
"""


def _tokenize_ids_oracle() -> str:
    from distributed_mapreduce_server_spark.operators.text import (
        TOKENIZE_PREFIX,
        VOCAB_SIZE,
    )

    return f"""
        WITH vocab AS (
            SELECT tok,
                   CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, tok)
                        AS INTEGER) AS id
            FROM (
                SELECT tok, COUNT(*) AS cnt
                FROM (SELECT unnest({_TOKS}) AS tok FROM documents)
                GROUP BY tok
                ORDER BY cnt DESC, tok
                LIMIT {VOCAB_SIZE}
            )
        ),
        docs_t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
        tok_rows AS (
            SELECT doc_id,
                   unnest(generate_series(1, len(toks))) AS pos,
                   unnest(toks) AS tok
            FROM docs_t
        ),
        mapped AS (
            SELECT t.doc_id, t.pos, COALESCE(v.id, 0) AS id
            FROM tok_rows t LEFT JOIN vocab v ON t.tok = v.tok
        )
        SELECT doc_id,
               COUNT(*) AS n_tokens,
               CAST(SUM(CASE WHEN id = 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_oov,
               string_agg(CAST(id AS VARCHAR), ',' ORDER BY pos)
                   FILTER (WHERE pos <= {TOKENIZE_PREFIX}) AS first_ids
        FROM mapped
        GROUP BY doc_id
        ORDER BY doc_id
    """


TEXT_ORACLES["text_tokenize_to_ids"] = _tokenize_ids_oracle()


# --- Deterministic sampling & splits + Gopher rules (round 4) -------------

from distributed_mapreduce_server_spark.operators.text import (  # noqa: E402
    GOPHER_MAX_TOP_TOKEN_FRAC,
    GOPHER_MAX_WORD_LEN,
    GOPHER_MAX_WORDS,
    GOPHER_MIN_STOPWORDS,
    GOPHER_MIN_WORD_LEN,
    GOPHER_MIN_WORDS,
    KFOLD_K,
    KFOLD_SEED,
    RESERVOIR_K,
    RESERVOIR_SEED,
    WEIGHTED_K,
    WEIGHTED_SEED,
)


def _u60(expr: str, seed: int) -> str:
    return (
        f"CAST(concat('0x', substr(md5(concat('{seed}|', {expr})), 1, 15)) AS BIGINT)"
    )


TEXT_ORACLES["text_reservoir_sample"] = f"""
    WITH keyed AS (
        SELECT doc_id, lang, source,
               {_u60("CAST(doc_id AS VARCHAR)", RESERVOIR_SEED)} AS sample_key
        FROM documents
        ORDER BY sample_key, doc_id
        LIMIT {RESERVOIR_K}
    )
    SELECT doc_id, lang, source,
           CAST(ROW_NUMBER() OVER (ORDER BY sample_key, doc_id) AS INTEGER) AS sample_rank
    FROM keyed
    ORDER BY sample_rank
"""

TEXT_ORACLES["text_weighted_sample"] = f"""
    WITH keyed AS (
        SELECT doc_id, n_chars,
               ROUND(ln(({_u60("CAST(doc_id AS VARCHAR)", WEIGHTED_SEED)} + 1)
                        / 1152921504606846976.0) / n_chars, 8) AS priority
        FROM documents
        ORDER BY priority DESC, doc_id
        LIMIT {WEIGHTED_K}
    )
    SELECT doc_id, n_chars, priority,
           CAST(ROW_NUMBER() OVER (ORDER BY priority DESC, doc_id) AS INTEGER) AS sample_rank
    FROM keyed
    ORDER BY sample_rank
"""

TEXT_ORACLES["text_kfold_split"] = f"""
    SELECT CAST({_u60("CAST(doc_id AS VARCHAR)", KFOLD_SEED)} % {KFOLD_K} AS INTEGER) AS fold,
           COUNT(*) AS n_docs,
           CAST(SUM(len({_TOKS})) AS BIGINT) AS total_tokens,
           CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs
    FROM documents
    GROUP BY 1
    ORDER BY 1
"""

from distributed_mapreduce_server_spark.operators.text import STOPWORDS  # noqa: E402

_STOPWORDS_SQL = ", ".join(f"'{w}'" for w in STOPWORDS)

TEXT_ORACLES["text_gopher_filters"] = f"""
    WITH base AS (
        SELECT doc_id, {_TOKS} AS toks FROM documents
    ), m AS (
        SELECT doc_id,
               CAST(len(toks) AS INTEGER) AS n_words,
               len(toks) >= {GOPHER_MIN_WORDS} AND len(toks) <= {GOPHER_MAX_WORDS}
                   AS r_word_count,
               CAST(list_sum(list_transform(toks, t -> length(t))) AS DOUBLE)
                   / greatest(len(toks), 1) >= {GOPHER_MIN_WORD_LEN}
               AND CAST(list_sum(list_transform(toks, t -> length(t))) AS DOUBLE)
                   / greatest(len(toks), 1) <= {GOPHER_MAX_WORD_LEN}
                   AS r_word_len,
               len(list_filter(toks, t -> list_contains(
                   [{_STOPWORDS_SQL}], t)))
                   >= {GOPHER_MIN_STOPWORDS} AS r_stopwords,
               CAST(list_max(list_transform(list_distinct(toks),
                    w -> len(list_filter(toks, t -> t = w)))) AS DOUBLE)
                   / greatest(len(toks), 1) <= {GOPHER_MAX_TOP_TOKEN_FRAC}
                   AS r_repetition
        FROM base
    )
    SELECT doc_id, n_words, r_word_count, r_word_len, r_stopwords, r_repetition,
           r_word_count AND r_word_len AND r_stopwords AND r_repetition AS keep
    FROM m
    ORDER BY doc_id
"""


from distributed_mapreduce_server_spark.operators.text import (  # noqa: E402
    COLLOC_MIN_COUNT,
    COLLOC_TOP_K,
)

TEXT_ORACLES["text_collocations"] = f"""
    WITH toks AS (SELECT doc_id, {_TOKS} AS t FROM documents),
    big AS (
        SELECT w, w2, COUNT(*) AS n_ab FROM (
            SELECT doc_id,
                   unnest(list_transform(range(1, len(t)),
                          i -> {{'w': t[i], 'w2': t[i + 1]}}), recursive := true)
            FROM toks
        )
        GROUP BY 1, 2
        HAVING COUNT(*) >= {COLLOC_MIN_COUNT}
    ),
    uni AS (SELECT w, COUNT(*) AS n_w FROM (SELECT unnest(t) AS w FROM toks) GROUP BY 1),
    n AS (SELECT CAST(SUM(len(t)) AS BIGINT) AS n_total FROM toks)
    SELECT big.w AS left_tok, big.w2 AS right_tok, n_ab,
           ROUND(ln((n_ab * n.n_total) / (ua.n_w * ub.n_w)), 4) AS pmi
    FROM big
    JOIN uni ua ON big.w = ua.w
    JOIN uni ub ON big.w2 = ub.w
    CROSS JOIN n
    ORDER BY pmi DESC, left_tok, right_tok
    LIMIT {COLLOC_TOP_K}
"""


TEXT_ORACLES["text_token_entropy"] = f"""
    WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents)
    SELECT doc_id,
           CAST(len(toks) AS INTEGER) AS n_tokens,
           CAST(len(list_distinct(toks)) AS INTEGER) AS n_distinct,
           ROUND(-COALESCE(list_sum(list_transform(
               list_transform(list_distinct(toks),
                   w -> len(list_filter(toks, x -> x = w))
                        / greatest(len(toks), 1)),
               p -> p * ln(p))), 0.0) + 0.0, 4) AS token_entropy
    FROM t
    ORDER BY doc_id
"""


# the corpus datasheet composes each metric's OWNING oracle definition
TEXT_ORACLES["text_corpus_report"] = f"""
    WITH base AS (
        SELECT COUNT(*) AS n_docs,
               CAST(SUM(len({_TOKS})) AS BIGINT) AS total_tokens,
               COUNT(DISTINCT lang) AS n_langs,
               COUNT(DISTINCT source) AS n_sources
        FROM documents
    ),
    groups AS (
        SELECT md5(array_to_string({_TOKS}, ' ')) AS fp, COUNT(*) AS n
        FROM documents GROUP BY 1
    ),
    dup AS (SELECT CAST(SUM(n) - COUNT(*) AS BIGINT) AS n_exact_dupes FROM groups),
    kept AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_quality_keep FROM (
            SELECT doc_id FROM (
                SELECT doc_id,
                       ROUND(0.4 * (CAST(len(list_distinct(toks)) AS DOUBLE)
                                    / greatest(len(toks), 1))
                           + 0.3 * least((CAST(len(list_filter(toks, t -> list_contains(
                                 ['the','a','of','and','to','in','is','it'], t))) AS DOUBLE)
                                 / greatest(len(toks), 1)) * 4, 1.0)
                           + 0.2 * (CASE WHEN length(text) BETWEEN 100 AND 20000
                                         THEN 1.0 ELSE 0.5 END)
                           + 0.1 * (1 - least((CAST(length(regexp_replace(text,
                                 '[^.,;:!?]', '', 'g')) AS DOUBLE)
                                 / greatest(length(text), 1)) * 10, 1.0)), 4) AS quality
                FROM (SELECT doc_id, text, {_TOKS} AS toks FROM documents)
            ) WHERE quality >= {QUALITY_KEEP_T}
        )
    ),
    ent AS (
        SELECT ROUND(AVG(token_entropy), 4) AS avg_token_entropy FROM (
            SELECT ROUND(-COALESCE(list_sum(list_transform(
                       list_transform(list_distinct(toks),
                           w -> len(list_filter(toks, x -> x = w))
                                / greatest(len(toks), 1)),
                       p -> p * ln(p))), 0.0) + 0.0, 4) AS token_entropy
            FROM (SELECT {_TOKS} AS toks FROM documents)
        )
    )
    SELECT n_docs, total_tokens, n_langs, n_sources, n_exact_dupes,
           ROUND(n_exact_dupes / n_docs, 4) AS dup_rate,
           n_quality_keep,
           ROUND(n_quality_keep / n_docs, 4) AS quality_keep_rate,
           avg_token_entropy
    FROM base CROSS JOIN dup CROSS JOIN kept CROSS JOIN ent
"""

from distributed_mapreduce_server_spark.operators.text import (  # noqa: E402
    MODEL_QF_THRESHOLD,
    MODEL_QF_W,
)

# weights interpolated from the SAME dict the operator reads, so an
# edit can never desynchronize model and oracle
TEXT_ORACLES["text_model_quality_filter"] = f"""
    WITH base AS (
        SELECT doc_id, text, {_TOKS} AS toks FROM documents
    ),
    m AS (
        SELECT doc_id,
               CAST(len(toks) AS INTEGER) AS n_tokens,
               CAST(len(list_distinct(toks)) AS DOUBLE)
                   / greatest(len(toks), 1) AS dr,
               CAST(len(list_filter(toks, t -> list_contains(
                    ['the','a','of','and','to','in','is','it'], t))) AS DOUBLE)
                   / greatest(len(toks), 1) AS sr,
               CAST(COALESCE(list_sum(list_transform(toks, t -> length(t))), 0) AS DOUBLE)
                   / greatest(len(toks), 1) AS atl
        FROM base
    ),
    lg AS (
        SELECT *,
               ROUND({MODEL_QF_W["intercept"]}
                     + {MODEL_QF_W["distinct_ratio"]} * dr
                     + {MODEL_QF_W["stop_signal"]} * least(sr * 8, 1.0)
                     + {MODEL_QF_W["log_tokens"]} * ln(1.0 + n_tokens)
                     + {MODEL_QF_W["avg_tok_len"]} * atl, 6) AS logit
        FROM m
    )
    SELECT doc_id, n_tokens,
           ROUND(dr, 4) AS distinct_ratio,
           ROUND(sr, 4) AS stop_ratio,
           ROUND(atl, 4) AS avg_tok_len,
           ROUND(1.0 / (1.0 + exp(-logit)), 6) AS model_score,
           ROUND(1.0 / (1.0 + exp(-logit)), 6) >= {MODEL_QF_THRESHOLD} AS keep
    FROM lg
    ORDER BY doc_id
"""

from distributed_mapreduce_server_spark.operators.text import (  # noqa: E402
    LR_RATE,
    LR_TRAIN_ROUNDS,
)


def _lr_ctes(train_where: str = "") -> str:
    """Unrolled full-batch-GD trainer mirroring text._lr_train: the
    6-dp-rounded feature matrix + heuristic label, then per round a
    (rounded logit -> rounded sigmoid) pass, mean gradient / mean
    loss rounded to 6 dp, and a rounded weight update. Ends with
    lw{{R}} (the trained weights) and per-round lg{{r}} (loss rows).
    Sigmoids are clamped into [1e-6, 1 - 1e-6] before the log-loss in
    BOTH engines (a rounded s can be exactly 0 or 1). ``train_where``
    restricts the GD's design matrix (text_quality_eval trains on
    the train split only); scoring CTEs keep reading the full lrf."""
    clamp = "least(greatest(s, 0.000001), 0.999999)"
    parts = [
        f"""lrm AS (
            SELECT doc_id, toks, text,
                   CAST(len(list_distinct(toks)) AS DOUBLE)
                       / greatest(len(toks), 1) AS dr,
                   CAST(len(list_filter(toks, t -> list_contains(
                        ['the','a','of','and','to','in','is','it'], t))) AS DOUBLE)
                       / greatest(len(toks), 1) AS sr,
                   CAST(length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS DOUBLE)
                       / greatest(length(text), 1) AS pd,
                   CASE WHEN length(text) >= 100 AND length(text) <= 20000
                        THEN 1.0 ELSE 0.5 END AS ls,
                   CAST(COALESCE(list_sum(list_transform(toks, t -> length(t))), 0) AS DOUBLE)
                       / greatest(len(toks), 1) AS atl
            FROM (SELECT doc_id, text, {_TOKS} AS toks FROM documents)
        )""",
        """lrf AS MATERIALIZED (
            SELECT doc_id,
                   ROUND(dr, 6) AS x1,
                   ROUND(least(sr * 8, 1.0), 6) AS x2,
                   ROUND(ln(1.0 + len(toks)), 6) AS x3,
                   ROUND(atl, 6) AS x4,
                   CASE WHEN ROUND(0.4 * dr + 0.3 * least(sr * 4, 1.0)
                             + 0.2 * ls + 0.1 * (1 - least(pd * 10, 1.0)), 4)
                             >= 0.5
                        THEN 1.0 ELSE 0.0 END AS y
            FROM lrm
        )""",
        f"""lrt AS MATERIALIZED (
            SELECT * FROM lrf {train_where}
        )""",
        "lw0 AS (SELECT 0.0 AS w0, 0.0 AS w1, 0.0 AS w2, 0.0 AS w3, 0.0 AS w4)",
    ]
    for r in range(LR_TRAIN_ROUNDS + 1):
        parts.append(
            f"""lp{r} AS MATERIALIZED (
            SELECT f.y, f.x1, f.x2, f.x3, f.x4,
                   ROUND(1.0 / (1.0 + exp(-ROUND(w.w0 + w.w1 * f.x1
                       + w.w2 * f.x2 + w.w3 * f.x3 + w.w4 * f.x4, 6))), 6) AS s
            FROM lrt f, lw{r} w
        )"""
        )
        parts.append(
            f"""lg{r} AS MATERIALIZED (
            SELECT ROUND(SUM(s - y) / COUNT(*), 6) AS g0,
                   ROUND(SUM((s - y) * x1) / COUNT(*), 6) AS g1,
                   ROUND(SUM((s - y) * x2) / COUNT(*), 6) AS g2,
                   ROUND(SUM((s - y) * x3) / COUNT(*), 6) AS g3,
                   ROUND(SUM((s - y) * x4) / COUNT(*), 6) AS g4,
                   ROUND(SUM(-(y * ln({clamp})
                       + (1 - y) * ln(1 - {clamp}))) / COUNT(*), 6) AS loss
            FROM lp{r}
        )"""
        )
        if r < LR_TRAIN_ROUNDS:
            parts.append(
                f"""lw{r + 1} AS (
            SELECT ROUND(w.w0 - {LR_RATE} * g.g0, 6) AS w0,
                   ROUND(w.w1 - {LR_RATE} * g.g1, 6) AS w1,
                   ROUND(w.w2 - {LR_RATE} * g.g2, 6) AS w2,
                   ROUND(w.w3 - {LR_RATE} * g.g3, 6) AS w3,
                   ROUND(w.w4 - {LR_RATE} * g.g4, 6) AS w4
            FROM lw{r} w, lg{r} g
        )"""
            )
    return ",\n    ".join(parts)


_LR_CB = _lr_ctes()

_LR_TRAJ = "\nUNION ALL\n".join(
    f"""SELECT CAST({r} AS INTEGER) AS round,
           (SELECT loss FROM lg{r}) AS loss,
           w0 AS w_intercept, w1 AS w_distinct_ratio, w2 AS w_stop_signal,
           w3 AS w_log_tokens, w4 AS w_avg_tok_len
    FROM lw{r}"""
    for r in range(LR_TRAIN_ROUNDS + 1)
)

TEXT_ORACLES["text_quality_train"] = f"""
    WITH {_LR_CB}
    SELECT * FROM ({_LR_TRAJ})
    ORDER BY round
"""

TEXT_ORACLES["text_quality_trained_filter"] = f"""
    WITH {_LR_CB}
    SELECT f.doc_id,
           ROUND(1.0 / (1.0 + exp(-ROUND(w.w0 + w.w1 * f.x1 + w.w2 * f.x2
               + w.w3 * f.x3 + w.w4 * f.x4, 6))), 6) AS model_score,
           ROUND(1.0 / (1.0 + exp(-ROUND(w.w0 + w.w1 * f.x1 + w.w2 * f.x2
               + w.w3 * f.x3 + w.w4 * f.x4, 6))), 6) >= 0.5 AS keep,
           f.y = 1.0 AS heuristic_label
    FROM lrf f, lw{LR_TRAIN_ROUNDS} w
    ORDER BY f.doc_id
"""

# eval variant: GD sees only the TRAIN split; both splits then score
# under the trained weights (same rule as text_train_val_split).
_LR_SPLIT_PRED = (
    "CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)"
    " % 100"
)
_LR_CB_SPLIT = _lr_ctes(train_where=f"WHERE {_LR_SPLIT_PRED} >= 10")

TEXT_ORACLES["text_quality_eval"] = f"""
    WITH {_LR_CB_SPLIT},
    lsc AS (
        SELECT CASE WHEN {_LR_SPLIT_PRED} < 10 THEN 'val' ELSE 'train' END AS split,
               f.y,
               CASE WHEN ROUND(1.0 / (1.0 + exp(-ROUND(w.w0 + w.w1 * f.x1
                        + w.w2 * f.x2 + w.w3 * f.x3 + w.w4 * f.x4, 6))), 6)
                        >= 0.5
                    THEN 1.0 ELSE 0.0 END AS p
        FROM lrf f, lw{LR_TRAIN_ROUNDS} w
    ),
    cm AS (
        SELECT split,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(p * y) AS BIGINT) AS tp,
               CAST(SUM(p * (1 - y)) AS BIGINT) AS fp,
               CAST(SUM((1 - p) * y) AS BIGINT) AS fn,
               CAST(SUM((1 - p) * (1 - y)) AS BIGINT) AS tn
        FROM lsc GROUP BY 1
    )
    SELECT split, n_docs, tp, fp, fn, tn,
           ROUND((tp + tn) / CAST(n_docs AS DOUBLE), 6) AS accuracy,
           ROUND(tp / CAST(greatest(tp + fp, 1) AS DOUBLE), 6) AS precision,
           ROUND(tp / CAST(greatest(tp + fn, 1) AS DOUBLE), 6) AS recall,
           ROUND(2 * tp / CAST(greatest(2 * tp + fp + fn, 1) AS DOUBLE), 6) AS f1
    FROM cm
    ORDER BY split
"""


from distributed_mapreduce_server_spark.operators.text import HASH_FEAT_DIM  # noqa: E402

_H60 = "CAST(concat('0x', substr(md5(term), 1, 15)) AS BIGINT)"

TEXT_ORACLES["text_hashed_features"] = f"""
    WITH base AS (
        SELECT doc_id, {_TOKS} AS toks FROM documents
    ),
    terms AS (
        SELECT doc_id, unnest(toks) AS term FROM base
        UNION ALL
        SELECT doc_id,
               unnest(list_transform(range(1, len(toks)),
                      i -> toks[i] || ' ' || toks[i + 1])) AS term
        FROM base
    ),
    counts AS (
        SELECT doc_id, {_H60} % {HASH_FEAT_DIM} AS bucket, COUNT(*) AS cnt
        FROM terms
        GROUP BY 1, 2
    ),
    agg AS (
        SELECT doc_id,
               CAST(COUNT(*) AS INTEGER) AS nnz,
               CAST(SUM(cnt) AS BIGINT) AS l1,
               ROUND(SQRT(SUM(CAST(cnt AS DOUBLE) * cnt)), 4) AS l2
        FROM counts GROUP BY doc_id
    ),
    top AS (
        SELECT doc_id, CAST(bucket AS INTEGER) AS top_bucket,
               CAST(cnt AS BIGINT) AS top_count
        FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                        ORDER BY cnt DESC, bucket) AS rn
            FROM counts
        ) WHERE rn = 1
    )
    SELECT a.doc_id, a.nnz, a.l1, a.l2, t.top_bucket, t.top_count
    FROM agg a JOIN top t USING (doc_id)
    ORDER BY a.doc_id
"""

# Zipf fit: identical formula tree to the operator (slope / intercept
# / R² from the six scalar moments over the log-log rank-frequency
# points), so the two engines diverge only by float ulps under the
# 6 dp rounding.
TEXT_ORACLES["text_zipf_fit"] = f"""
    WITH counts AS (
        SELECT tok, COUNT(*) AS cnt
        FROM (SELECT unnest({_TOKS}) AS tok FROM documents)
        GROUP BY 1
    ),
    ranked AS (
        SELECT cnt, ROW_NUMBER() OVER (ORDER BY cnt DESC, tok) AS rank
        FROM counts
    ),
    s AS (
        SELECT COUNT(*) AS n,
               CAST(SUM(cnt) AS BIGINT) AS n_tokens,
               SUM(log10(CAST(rank AS DOUBLE))) AS sx,
               SUM(log10(CAST(cnt AS DOUBLE))) AS sy,
               SUM(log10(CAST(rank AS DOUBLE)) * log10(CAST(rank AS DOUBLE))) AS sxx,
               SUM(log10(CAST(cnt AS DOUBLE)) * log10(CAST(cnt AS DOUBLE))) AS syy,
               SUM(log10(CAST(rank AS DOUBLE)) * log10(CAST(cnt AS DOUBLE))) AS sxy
        FROM ranked
    )
    SELECT n AS n_types, n_tokens,
           ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS zipf_slope,
           ROUND((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n, 6)
               AS zipf_intercept,
           ROUND((n * sxy - sx * sy) * (n * sxy - sx * sy)
                 / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS r2
    FROM s
"""


TEXT_ORACLES["text_source_overlap"] = f"""
    WITH toks AS (SELECT source, {_TOKS} AS toks FROM documents),
    grams AS MATERIALIZED (
        SELECT DISTINCT source,
               unnest(list_transform(range(1, greatest(len(toks) - 2, 0) + 1),
                   i -> concat(toks[i], ' ', toks[i+1], ' ', toks[i+2]))) AS g
        FROM toks
    ),
    sizes AS MATERIALIZED (SELECT source, COUNT(*) AS n_grams FROM grams GROUP BY 1),
    pairs AS (
        SELECT a.source AS sa, b.source AS sb, COUNT(*) AS n_shared
        FROM grams a JOIN grams b ON a.g = b.g AND a.source < b.source
        GROUP BY 1, 2
    )
    SELECT sa AS source_a, sb AS source_b, n_shared,
           ROUND(CAST(n_shared AS DOUBLE)
                 / (na.n_grams + nb.n_grams - n_shared), 6) AS jaccard
    FROM pairs
    JOIN sizes na ON sa = na.source
    JOIN sizes nb ON sb = nb.source
    ORDER BY 1, 2
"""


def _bpe_chain_parts() -> "tuple[list[str], int]":
    """The unrolled-BPE CTE chain (the emb_kmeans unrolled-Lloyd
    recipe applied to greedy merges): BPE_TRAIN_MERGES fixed rounds,
    each a MATERIALIZED pair-count/argmax/rewrite triple. The symbol
    sequence is carried as a WRAPPED string — chr(1)||sym||chr(2) per
    symbol — so the greedy left-to-right merge application is exactly
    SQL ``replace()`` (non-overlapping, left-to-right — the standard
    BPE trick; the sentinels make a pair pattern unmatchable across
    symbol boundaries). Assumes corpus tokens never contain
    chr(1)/chr(2) — true for the lower([a-z0-9]) token stream _TOKS
    produces. Tie-break matches the Spark loop: (cnt DESC,
    a || ' ' || b). A COALESCE(chr(3)) guard keeps exhausted rounds
    (no pairs left) as identity rewrites, mirroring the Spark loop's
    break. Shared by the text_bpe_train and text_bpe_fertility
    oracles."""
    from distributed_mapreduce_server_spark.operators.text import BPE_TRAIN_MERGES

    parts = [
        f"""v0 AS MATERIALIZED (
            SELECT tok, COUNT(*) AS n
            FROM (SELECT unnest({_TOKS}) AS tok FROM documents)
            GROUP BY tok
        )""",
        """s0 AS MATERIALIZED (
            SELECT tok, n,
                   string_agg(chr(1) || substring(tok, CAST(i AS INTEGER), 1)
                              || chr(2), '' ORDER BY i) AS s
            FROM (SELECT tok, n, unnest(generate_series(1, length(tok))) AS i
                  FROM v0)
            GROUP BY tok, n
        )""",
    ]
    for r in range(1, BPE_TRAIN_MERGES + 1):
        parts.append(
            f"""p{r} AS MATERIALIZED (
            SELECT syms[CAST(i AS INTEGER)] AS a,
                   syms[CAST(i + 1 AS INTEGER)] AS b,
                   CAST(SUM(n) AS BIGINT) AS cnt
            FROM (
                SELECT n, syms, unnest(generate_series(1, len(syms) - 1)) AS i
                FROM (SELECT n, str_split(substring(s, 2, length(s) - 2),
                                          chr(2) || chr(1)) AS syms
                      FROM s{r - 1})
            )
            GROUP BY 1, 2
        )"""
        )
        parts.append(
            f"""m{r} AS MATERIALIZED (
            SELECT a, b, cnt FROM p{r} ORDER BY cnt DESC, a || ' ' || b LIMIT 1
        )"""
        )
        parts.append(
            f"""s{r} AS MATERIALIZED (
            SELECT tok, n,
                   replace(s,
                       COALESCE((SELECT chr(1) || a || chr(2) || chr(1) || b
                                 || chr(2) FROM m{r}), chr(3)),
                       COALESCE((SELECT chr(1) || a || b || chr(2) FROM m{r}),
                                chr(3))) AS s
            FROM s{r - 1}
        )"""
        )
    return parts, BPE_TRAIN_MERGES


def _bpe_train_sql() -> str:
    parts, n_merges = _bpe_chain_parts()
    joined = ",\n    ".join(parts)
    unions = "\n    UNION ALL ".join(
        f"""SELECT CAST({r} AS INTEGER) AS merge_rank, a AS "left", b AS "right",
               a || b AS merged, cnt AS weighted_count FROM m{r}"""
        for r in range(1, n_merges + 1)
    )
    return f"""
    WITH {joined}
    SELECT * FROM ({unions})
    ORDER BY merge_rank
"""


TEXT_ORACLES["text_bpe_train"] = _bpe_train_sql()


def _bpe_fertility_sql() -> str:
    """Fertility oracle: symbols-per-word under the trained merge
    table — the final symbol strings s{n} from the shared chain,
    weighted by per-(source, token) occurrence counts. n_syms =
    number of chr(1) sentinels in the wrapped string."""
    parts, n_merges = _bpe_chain_parts()
    joined = ",\n    ".join(parts)
    return f"""
    WITH {joined},
    syms AS (
        SELECT tok,
               length(s) - length(replace(s, chr(1), '')) AS n_syms
        FROM s{n_merges}
    ),
    st AS (
        SELECT source, tok, COUNT(*) AS n
        FROM (SELECT source, unnest({_TOKS}) AS tok FROM documents)
        GROUP BY 1, 2
    )
    SELECT st.source,
           CAST(SUM(st.n) AS BIGINT) AS n_words,
           CAST(SUM(st.n * syms.n_syms) AS BIGINT) AS total_symbols,
           ROUND(SUM(st.n * syms.n_syms) / CAST(SUM(st.n) AS DOUBLE), 6)
               AS fertility
    FROM st JOIN syms USING (tok)
    GROUP BY st.source
    ORDER BY st.source
"""


TEXT_ORACLES["text_bpe_fertility"] = _bpe_fertility_sql()


TEXT_ORACLES["text_source_kl_divergence"] = f"""
    WITH tok AS (SELECT source, unnest({_TOKS}) AS tok FROM documents),
    per_src AS MATERIALIZED (
        SELECT source, tok, COUNT(*) AS n_st FROM tok GROUP BY 1, 2
    ),
    corpus AS MATERIALIZED (SELECT tok, SUM(n_st) AS n_t FROM per_src GROUP BY 1),
    src_tot AS (SELECT source, SUM(n_st) AS n_s FROM per_src GROUP BY 1),
    tot AS (SELECT SUM(n_t) AS n_c FROM corpus)
    SELECT p.source,
           CAST(MAX(s.n_s) AS BIGINT) AS n_tokens,
           ROUND(SUM((p.n_st / CAST(s.n_s AS DOUBLE))
                     * ln((p.n_st * t.n_c) / CAST(s.n_s * c.n_t AS DOUBLE))),
                 6) AS kl_divergence
    FROM per_src p
    JOIN corpus c USING (tok)
    JOIN src_tot s USING (source), tot t
    GROUP BY p.source
    ORDER BY p.source
"""


TEXT_ORACLES["text_ngram_novelty"] = f"""
    WITH toks AS (SELECT doc_id, {_TOKS} AS t FROM documents),
    grams AS MATERIALIZED (
        SELECT DISTINCT doc_id,
               unnest(list_transform(range(1, greatest(len(t) - 2, 0) + 1),
                   i -> concat(t[i], ' ', t[i+1], ' ', t[i+2]))) AS g
        FROM toks
    ),
    first_occ AS (SELECT g, MIN(doc_id) AS first_doc FROM grams GROUP BY g),
    per_doc AS (
        SELECT gr.doc_id, COUNT(*) AS n_grams,
               SUM(CASE WHEN f.first_doc = gr.doc_id THEN 1 ELSE 0 END)
                   AS n_novel
        FROM grams gr JOIN first_occ f USING (g)
        GROUP BY 1
    )
    SELECT d.doc_id,
           CAST(COALESCE(p.n_grams, 0) AS BIGINT) AS n_grams,
           CAST(COALESCE(p.n_novel, 0) AS BIGINT) AS n_novel,
           ROUND(COALESCE(p.n_novel, 0)
                 / CAST(greatest(COALESCE(p.n_grams, 0), 1) AS DOUBLE), 4)
               AS novelty
    FROM documents d LEFT JOIN per_doc p USING (doc_id)
    ORDER BY d.doc_id
"""


def _unigram_ctes() -> str:
    """Shared CTE chain for the unigram-LM tokenizer oracles
    (text.py round-9 banner): word freqs -> substring-position seed
    counts -> fixed vocab with piece ids -> ONE recursive enumeration
    of every segmentation (piece structure is round-independent) ->
    UNI_EM_ROUNDS unrolled Viterbi-EM rounds, each a re-costing of
    the enumerated paths + the (cost, padded-id path) argmin the
    Spark DP reproduces, ending with cost{R} (the shipped costs) and
    best{R} (the final-cost segmentation the fertility eval uses).
    All integer arithmetic except the ln() cost map, which lands on
    the 1-micro-nat grid in both engines."""
    from distributed_mapreduce_server_spark.operators.text import (
        UNI_EM_ROUNDS,
        UNI_PIECE_MAX_LEN,
        UNI_SEED_VOCAB,
    )

    # TRACTABILITY BOUND (ADVICE r9): the recursive CTE `s` below
    # enumerates EVERY segmentation of every word — ~1.93^len paths
    # when all single chars are in vocab. It is tractable only
    # because corpus tokens are short (≤8 chars today); the guard
    # makes a longer-token corpus fail LOUDLY (DuckDB error()) instead
    # of silently hanging the parity sweep.
    parts = [
        f"""w AS MATERIALIZED (
            SELECT CASE WHEN length(tok) > 20 THEN error(
                       'unigram oracle: token > 20 chars — the ' ||
                       'all-segmentations recursive CTE grows ' ||
                       '~1.93^len; cap token length or rewrite')
                   ELSE tok END AS tok,
                   COUNT(*) AS n
            FROM (SELECT unnest({_TOKS}) AS tok FROM documents)
            GROUP BY 1
        )""",
        f"""sub AS MATERIALIZED (
            SELECT piece, l, SUM(n) AS cnt FROM (
                SELECT substr(tok, CAST(i AS INTEGER), l) AS piece, l, n FROM (
                    SELECT tok, n, l,
                           unnest(generate_series(1, length(tok) - l + 1)) AS i
                    FROM w, (SELECT unnest(range(1, {UNI_PIECE_MAX_LEN + 1})) AS l) ls
                    WHERE length(tok) >= l
                )
            ) GROUP BY 1, 2
        )""",
        f"""vraw AS (
            SELECT piece, cnt FROM sub WHERE l = 1
            UNION ALL
            SELECT piece, cnt FROM (
                SELECT piece, cnt,
                       ROW_NUMBER() OVER (ORDER BY cnt DESC, piece) AS rk
                FROM sub WHERE l >= 2
            ) WHERE rk <= {UNI_SEED_VOCAB}
        )""",
        """v AS MATERIALIZED (
            SELECT piece, cnt AS c_seed,
                   ROW_NUMBER() OVER (ORDER BY piece) AS pid
            FROM vraw
        )""",
        """s AS (
            SELECT tok, n, 0 AS pos, CAST('' AS VARCHAR) AS path,
                   CAST([] AS BIGINT[]) AS pids
            FROM w
            UNION ALL
            SELECT s.tok, s.n, s.pos + length(v.piece),
                   s.path || '|' || lpad(CAST(v.pid AS VARCHAR), 3, '0'),
                   list_append(s.pids, v.pid)
            FROM s JOIN v
              ON s.pos + length(v.piece) <= length(s.tok)
             AND substr(s.tok, s.pos + 1, length(v.piece)) = v.piece
        )""",
        """segs AS MATERIALIZED (
            SELECT tok, n, path, pids FROM s WHERE pos = length(tok)
        )""",
        "c0 AS MATERIALIZED (SELECT pid, piece, c_seed AS c FROM v)",
    ]
    for r in range(UNI_EM_ROUNDS + 1):
        parts.append(
            f"""cost{r} AS MATERIALIZED (
            SELECT pid, piece,
                   CAST(-round(ln((c + 1.0) / (t.total + t.nv)) * 1000000)
                        AS BIGINT) AS cost
            FROM c{r}, (SELECT SUM(c) AS total, COUNT(*) AS nv FROM c{r}) t
        )"""
        )
        parts.append(
            f"""pc{r} AS MATERIALIZED (
            SELECT u.tok, u.path, SUM(k.cost) AS cost_total
            FROM (SELECT tok, path, unnest(pids) AS pid FROM segs) u
            JOIN cost{r} k USING (pid)
            GROUP BY 1, 2
        )"""
        )
        parts.append(
            f"""best{r} AS MATERIALIZED (
            SELECT g.tok, g.n, g.pids FROM segs g
            JOIN (SELECT tok, path FROM (
                    SELECT tok, path,
                           ROW_NUMBER() OVER (PARTITION BY tok
                               ORDER BY cost_total, path) AS rk
                    FROM pc{r}) WHERE rk = 1) b
              ON g.tok = b.tok AND g.path = b.path
        )"""
        )
        if r < UNI_EM_ROUNDS:
            parts.append(
                f"""c{r + 1} AS MATERIALIZED (
            SELECT v.pid, v.piece, COALESCE(x.c, 0) AS c
            FROM v LEFT JOIN (
                SELECT pid, SUM(n) AS c
                FROM (SELECT n, unnest(pids) AS pid FROM best{r})
                GROUP BY 1) x USING (pid)
        )"""
            )
    return ",\n    ".join(parts)


def _unigram_train_sql() -> str:
    from distributed_mapreduce_server_spark.operators.text import UNI_EM_ROUNDS

    return f"""
    WITH RECURSIVE {_unigram_ctes()}
    SELECT v.piece,
           CAST(length(v.piece) AS INTEGER) AS piece_len,
           CAST(v.c_seed AS BIGINT) AS seed_count,
           CAST(cf.c AS BIGINT) AS em_count,
           kf.cost AS cost_micro
    FROM v
    JOIN c{UNI_EM_ROUNDS} cf USING (pid)
    JOIN cost{UNI_EM_ROUNDS} kf USING (pid)
    ORDER BY v.piece
"""


def _unigram_fertility_sql() -> str:
    from distributed_mapreduce_server_spark.operators.text import UNI_EM_ROUNDS

    return f"""
    WITH RECURSIVE {_unigram_ctes()},
    st AS (
        SELECT source, tok, COUNT(*) AS n
        FROM (SELECT source, unnest({_TOKS}) AS tok FROM documents)
        GROUP BY 1, 2
    ),
    sizes AS (SELECT tok, len(pids) AS n_pieces FROM best{UNI_EM_ROUNDS})
    SELECT source,
           CAST(SUM(st.n) AS BIGINT) AS n_words,
           CAST(SUM(st.n * sizes.n_pieces) AS BIGINT) AS total_pieces,
           ROUND(CAST(SUM(st.n * sizes.n_pieces) AS DOUBLE)
                 / SUM(st.n), 6) AS fertility
    FROM st JOIN sizes USING (tok)
    GROUP BY 1
    ORDER BY 1
"""


TEXT_ORACLES["text_unigram_train"] = _unigram_train_sql()
TEXT_ORACLES["text_unigram_fertility"] = _unigram_fertility_sql()


def _unigram_tokenize_sql() -> str:
    from distributed_mapreduce_server_spark.operators.text import (
        TOKENIZE_PREFIX,
        UNI_EM_ROUNDS,
    )

    return f"""
    WITH RECURSIVE {_unigram_ctes()},
    wp AS (SELECT tok, pids, len(pids) AS np FROM best{UNI_EM_ROUNDS}),
    dtok AS (
        SELECT doc_id, pos, toks[pos] AS tok FROM (
            SELECT doc_id, toks,
                   unnest(generate_series(1, len(toks))) AS pos
            FROM (SELECT doc_id, {_TOKS} AS toks FROM documents)
        )
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_words,
           CAST(SUM(wp.np) AS BIGINT) AS n_pieces,
           array_to_string(
               list_slice(flatten(list(wp.pids ORDER BY pos)),
                          1, {TOKENIZE_PREFIX}), ',') AS first_piece_ids
    FROM dtok JOIN wp USING (tok)
    GROUP BY doc_id
    ORDER BY doc_id
"""


TEXT_ORACLES["text_unigram_tokenize"] = _unigram_tokenize_sql()
