"""DuckDB oracle SQL for the multimodal operators (§2.6).

The decode core is a stub, but a *deterministic* one: byte statistics
over the utf-8 payload (multimodal.py _decode_fake). The corpus text
is ASCII, so byte k of the payload == ascii(text[k]) and the whole
stub is SQL-expressible — which upgrades these from the weaker
rows-only check to full value parity. mm_audio_features stays
rows-only (its zero-crossing chain needs the lagged byte sequence;
expressible but disproportionate).
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
