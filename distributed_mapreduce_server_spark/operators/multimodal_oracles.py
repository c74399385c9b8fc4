"""DuckDB oracle SQL for the multimodal operators (§2.6).

The decode core is a stub, but a *deterministic* one: byte statistics
over the utf-8 payload (multimodal.py _decode_fake). The corpus text
is ASCII, so byte k of the payload == ascii(text[k]) and the whole
stub is SQL-expressible — which upgrades all four multimodal operators
from the weaker rows-only check to full value parity (incl.
mm_audio_features' lagged zero-crossing chain).
"""

# media_type assignment + payload stats shared by all three oracles.
# s256 = sum of the first 256 payload bytes (drives fake width/height),
# stot = sum of all bytes (drives the byte-mean feature).
_MEDIA_STATS = """
    WITH media AS (
        SELECT doc_id, text,
               (['image', 'audio', 'video'])[(doc_id % 3 + 1)] AS media_type,
               length(text) AS n
        FROM documents
    ),
    stats AS (
        SELECT doc_id, text, media_type, n,
               CAST(list_sum(list_transform(range(1, least(n, 256) + 1),
                                            i -> ascii(text[i]))) AS BIGINT) AS s256,
               CAST(list_sum(list_transform(range(1, n + 1),
                                            i -> ascii(text[i]))) AS BIGINT) AS stot
        FROM media
    )
"""

MULTIMODAL_ORACLES: dict[str, str] = {
    "mm_decode_meta": f"""
        {_MEDIA_STATS}
        SELECT media_type,
               COUNT(*) AS n_items,
               CAST(SUM(n) AS BIGINT) AS total_bytes,
               ROUND(AVG(64 + (s256 % 448)), 2) AS avg_width,
               ROUND(AVG(64 + ((s256 >> 3) % 448)), 2) AS avg_height,
               ROUND(AVG(stot / CAST(n AS DOUBLE)), 4) AS avg_byte_mean
        FROM stats
        GROUP BY media_type
        ORDER BY media_type
    """,
    "mm_resize_stats": f"""
        {_MEDIA_STATS}
        SELECT media_type,
               COUNT(*) AS n_items,
               ROUND(AVG(ROUND(LEAST(224.0 / w, 224.0 / h), 6)), 4) AS avg_scale,
               MIN(w) AS min_width,
               MAX(h) AS max_height
        FROM (SELECT media_type,
                     64 + (s256 % 448) AS w,
                     64 + ((s256 >> 3) % 448) AS h
              FROM stats)
        GROUP BY media_type
        ORDER BY media_type
    """,
    "mm_frame_sample": f"""
        {_MEDIA_STATS}
        SELECT doc_id,
               CAST(i AS INTEGER) AS frame_idx,
               ROUND(greatest(n / 1000.0, 0.001) * i / 4, 3) AS frame_ts,
               printf('%08x',
                      COALESCE(CAST(list_sum(list_transform(
                          range((n * i) // 4 + 1, (n * (i + 1)) // 4 + 1),
                          j -> ascii(text[j]))) AS BIGINT), 0) & 4294967295)
                   AS frame_checksum
        FROM stats, UNNEST(range(0, 4)) AS u(i)
        WHERE media_type = 'video'
        ORDER BY doc_id, frame_idx
    """,
}

# Audio: bytes-as-PCM stub (multimodal.py _audio_fake) reproduced in
# SQL — mean/RMS/zero-crossings/strided-mean "MFCC", audio docs only
# (doc_id % 3 == 1 maps to media_type 'audio').
MULTIMODAL_ORACLES["mm_audio_features"] = """
    WITH base AS (
        SELECT doc_id, text, length(text) AS n,
               CAST(list_sum(list_transform(range(1, length(text) + 1),
                                            i -> ascii(text[i]))) AS BIGINT) AS stot
        FROM documents
        WHERE doc_id % 3 = 1
    ),
    m AS (SELECT doc_id, text, n, stot / CAST(n AS DOUBLE) AS mean FROM base),
    feat AS (
        SELECT doc_id,
               16000 AS sample_rate,
               ROUND(n / 16000.0, 6) AS duration_s,
               ROUND(sqrt(list_sum(list_transform(range(1, n + 1),
                          i -> (ascii(text[i]) - mean) * (ascii(text[i]) - mean))) / n),
                     4) AS rms,
               CAST(list_sum(list_transform(range(2, n + 1),
                    i -> CASE WHEN (ascii(text[i]) - mean)
                                   * (ascii(text[i-1]) - mean) < 0
                              THEN 1 ELSE 0 END)) AS INTEGER) AS zc,
               ROUND(list_sum(list_transform(range(1, n + 1, 8),
                              i -> CAST(ascii(text[i]) AS DOUBLE)))
                     / len(range(1, n + 1, 8)) - mean, 4) AS mfcc0
        FROM m
    )
    SELECT sample_rate,
           COUNT(*) AS n_clips,
           ROUND(SUM(duration_s), 3) AS total_duration_s,
           ROUND(AVG(rms), 4) AS avg_rms,
           ROUND(AVG(zc), 2) AS avg_zero_crossings,
           ROUND(AVG(mfcc0), 4) AS avg_mfcc0
    FROM feat
    GROUP BY sample_rate
    ORDER BY sample_rate
"""

# payload == utf-8 bytes of text, so digests/lengths reproduce from
# the string; media_type is doc_id % 3 over (image, audio, video).
_MEDIA_TYPE = "['image', 'audio', 'video'][CAST(doc_id % 3 AS INTEGER) + 1]"

MULTIMODAL_ORACLES["mm_payload_dedup"] = f"""
    SELECT media_type, digest,
           COUNT(*) AS n_copies,
           MIN(doc_id) AS keep_doc_id,
           MIN(n_bytes) AS n_bytes
    FROM (
        SELECT {_MEDIA_TYPE} AS media_type,
               md5(text) AS digest,
               doc_id,
               octet_length(encode(text)) AS n_bytes
        FROM documents
    )
    GROUP BY media_type, digest
    ORDER BY media_type, keep_doc_id
"""

MULTIMODAL_ORACLES["mm_modality_mix"] = f"""
    WITH per_type AS (
        SELECT {_MEDIA_TYPE} AS media_type,
               COUNT(*) AS n_items,
               CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes
        FROM documents
        GROUP BY 1
    ),
    tot AS (SELECT SUM(total_bytes) AS corpus_bytes FROM per_type)
    SELECT media_type, n_items, total_bytes,
           ROUND(CAST(total_bytes AS DOUBLE) / corpus_bytes, 6) AS byte_share
    FROM per_type, tot
    ORDER BY media_type
"""


def _shard_oracle() -> str:
    from distributed_mapreduce_server_spark.operators.multimodal import (
        SHARD_BYTE_BUDGET,
    )

    b = str(SHARD_BYTE_BUDGET)
    return f"""
        WITH RECURSIVE items AS (
            SELECT {_MEDIA_TYPE} AS media_type, doc_id,
                   CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
                   ROW_NUMBER() OVER (PARTITION BY {_MEDIA_TYPE}
                                      ORDER BY doc_id) AS rn
            FROM documents
        ),
        pk AS (
            SELECT media_type, doc_id, n_bytes, rn,
                   CAST(0 AS BIGINT) AS shard_id, n_bytes AS shard_used
            FROM items WHERE rn = 1
            UNION ALL
            SELECT t.media_type, t.doc_id, t.n_bytes, t.rn,
                   CASE WHEN p.shard_used > 0
                             AND p.shard_used + t.n_bytes > {b}
                        THEN p.shard_id + 1 ELSE p.shard_id END,
                   CASE WHEN p.shard_used > 0
                             AND p.shard_used + t.n_bytes > {b}
                        THEN t.n_bytes ELSE p.shard_used + t.n_bytes END
            FROM pk p JOIN items t
              ON t.media_type = p.media_type AND t.rn = p.rn + 1
        )
        SELECT media_type, doc_id, n_bytes, shard_id, shard_used
        FROM pk
        ORDER BY media_type, doc_id
    """


MULTIMODAL_ORACLES["mm_shard_manifest"] = _shard_oracle()


from distributed_mapreduce_server_spark.operators.multimodal import (  # noqa: E402
    MM_MAX_ASPECT,
    MM_MAX_BYTES,
    MM_MIN_ASPECT,
    MM_MIN_BYTES,
    MM_MIN_DIM,
)

MULTIMODAL_ORACLES["mm_quality_gate"] = f"""
    {_MEDIA_STATS}
    SELECT doc_id, media_type, r_min_dims, r_byte_band, r_aspect,
           r_min_dims AND r_byte_band AND r_aspect AS keep
    FROM (
        SELECT doc_id, media_type,
               w >= {MM_MIN_DIM} AND h >= {MM_MIN_DIM} AS r_min_dims,
               n >= {MM_MIN_BYTES} AND n <= {MM_MAX_BYTES} AS r_byte_band,
               w / h >= {MM_MIN_ASPECT} AND w / h <= {MM_MAX_ASPECT} AS r_aspect
        FROM (SELECT doc_id, media_type, n,
                     64 + (s256 % 448) AS w,
                     64 + ((s256 >> 3) % 448) AS h
              FROM stats)
    )
    ORDER BY doc_id
"""

from distributed_mapreduce_server_spark.operators.multimodal import (  # noqa: E402
    PHASH_CHUNKS,
    PHASH_MAX_HAMMING,
)

# near-dup oracle is the ALL-PAIRS enumeration (no banding): the
# operator's banded candidates are provably complete for
# Hamming <= PHASH_MAX_HAMMING (pigeonhole over 4 bands), so the two
# must return the identical pair set.
MULTIMODAL_ORACLES["mm_phash_neardup"] = f"""
    WITH media AS (
        SELECT doc_id, text,
               (['image', 'audio', 'video'])[(doc_id % 3 + 1)] AS media_type,
               length(text) AS L
        FROM documents
        WHERE length(text) >= {PHASH_CHUNKS}
    ),
    p1 AS (
        SELECT doc_id, media_type, L, text, unnest(range(1, L + 1)) AS p
        FROM media
    ),
    pts AS (
        SELECT doc_id, media_type, L,
               ({PHASH_CHUNKS} * p - 1) // L AS k,
               ascii(text[p]) AS code
        FROM p1
    ),
    chunked AS (
        SELECT doc_id, media_type, L, k,
               SUM(code) AS csum, COUNT(*) AS cn
        FROM pts GROUP BY 1, 2, 3, 4
    ),
    tot AS (SELECT doc_id, SUM(csum) AS stot FROM chunked GROUP BY 1),
    sig AS (
        SELECT c.doc_id, c.media_type,
               CAST(SUM(CASE WHEN c.csum / c.cn > t.stot / c.L
                             THEN 1::BIGINT << c.k ELSE 0 END) AS BIGINT) AS s
        FROM chunked c JOIN tot t ON c.doc_id = t.doc_id
        GROUP BY 1, 2
    )
    SELECT a.media_type, a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(bit_count(xor(a.s, b.s)) AS INT) AS hamming
    FROM sig a JOIN sig b
      ON a.media_type = b.media_type AND a.doc_id < b.doc_id
    WHERE bit_count(xor(a.s, b.s)) <= {PHASH_MAX_HAMMING}
    ORDER BY 1, 2, 3
"""


def _scene_segments_sql() -> str:
    from distributed_mapreduce_server_spark.operators.multimodal import (
        N_FRAMES,
        SCENE_JUMP_T,
    )

    return f"""
    WITH media AS (
        SELECT doc_id, text, length(text) AS n
        FROM documents WHERE doc_id % 3 = 2
    ),
    fm AS (
        SELECT doc_id, i,
               ROUND(list_sum(list_transform(
                         range((n * i) // {N_FRAMES} + 1,
                               (n * (i + 1)) // {N_FRAMES} + 1),
                         j -> ascii(text[j])))
                     / CAST(greatest((n * (i + 1)) // {N_FRAMES}
                                     - (n * i) // {N_FRAMES}, 1) AS DOUBLE),
                     4) AS m
        FROM media, UNNEST(range(0, {N_FRAMES})) AS u(i)
    ),
    jumps AS (
        SELECT doc_id, i,
               ROUND(abs(m - lag(m) OVER (PARTITION BY doc_id ORDER BY i)),
                     4) AS j
        FROM fm
    )
    SELECT doc_id,
           CAST({N_FRAMES} AS INTEGER) AS n_frames,
           CAST(1 + COUNT(*) FILTER (j > {SCENE_JUMP_T}) AS INTEGER)
               AS n_scenes,
           COALESCE(string_agg(CAST(i AS VARCHAR), ',' ORDER BY i)
                        FILTER (j > {SCENE_JUMP_T}), '') AS boundaries,
           MAX(j) AS max_jump
    FROM jumps
    GROUP BY doc_id
    ORDER BY doc_id
"""


MULTIMODAL_ORACLES["mm_scene_segments"] = _scene_segments_sql()


def _payload_entropy_sql() -> str:
    from distributed_mapreduce_server_spark.operators.multimodal import (
        ENTROPY_LOW_T,
    )

    return f"""
    WITH media AS (
        SELECT doc_id, text,
               (['image', 'audio', 'video'])[(doc_id % 3 + 1)] AS media_type
        FROM documents
    ),
    bytes_rows AS (
        SELECT doc_id, media_type,
               unnest(list_transform(range(1, length(text) + 1),
                                     i -> ascii(text[i]))) AS b
        FROM media
    ),
    hist AS (
        SELECT doc_id, media_type, b, COUNT(*) AS n
        FROM bytes_rows GROUP BY 1, 2, 3
    ),
    tot AS (
        SELECT doc_id, media_type, SUM(n) AS tot
        FROM hist GROUP BY 1, 2
    ),
    ent AS (
        SELECT h.doc_id, h.media_type,
               ROUND(-SUM((h.n / CAST(t.tot AS DOUBLE))
                          * log2(h.n / CAST(t.tot AS DOUBLE))), 4) AS entropy
        FROM hist h JOIN tot t ON h.doc_id = t.doc_id
        GROUP BY 1, 2
    )
    SELECT media_type,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           ROUND(AVG(entropy), 4) AS avg_entropy,
           ROUND(MIN(entropy), 4) AS min_entropy,
           ROUND(MAX(entropy), 4) AS max_entropy,
           CAST(SUM(CASE WHEN entropy < {ENTROPY_LOW_T} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_low_entropy
    FROM ent
    GROUP BY media_type
    ORDER BY media_type
"""


MULTIMODAL_ORACLES["mm_payload_entropy"] = _payload_entropy_sql()
