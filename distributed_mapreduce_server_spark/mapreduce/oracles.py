"""DuckDB oracle SQL for the MapReduce-parity queries (§2.1)."""

_TOKENS = "list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), t -> t <> '')"

MAPREDUCE_ORACLES: dict[str, str] = {
    "mr_wordcount": f"""
        SELECT word, COUNT(*) AS cnt
        FROM (SELECT unnest({_TOKENS}) AS word FROM documents)
        GROUP BY word
        ORDER BY cnt DESC, word
    """,
    "mr_grep": """
        SELECT doc_id, CAST(i - 1 AS INTEGER) AS line_no, ls[i] AS line
        FROM (SELECT doc_id, string_split(text, chr(10)) AS ls FROM documents) t,
             UNNEST(range(1, len(ls) + 1)) AS u(i)
        WHERE contains(ls[i], 'spark')
        ORDER BY doc_id, line_no
    """,
    "mr_grep_count": """
        SELECT doc_id,
               CAST(len(regexp_extract_all(text, 'spark')) AS INTEGER) AS n_matches
        FROM documents
        WHERE len(regexp_extract_all(text, 'spark')) > 0
        ORDER BY doc_id
    """,
    "mr_distributed_sort": """
        SELECT l_orderkey, l_linenumber, l_extendedprice, l_quantity
        FROM lineitem
        ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
        LIMIT 1000
    """,
    "mr_inverted_index": f"""
        SELECT word,
               COUNT(DISTINCT doc_id) AS doc_freq,
               string_agg(DISTINCT doc_id, ',' ORDER BY doc_id) AS postings
        FROM (SELECT doc_id, unnest({_TOKENS}) AS word FROM documents)
        GROUP BY word
        ORDER BY word
    """,
    "mr_distinct": """
        SELECT DISTINCT lang, word
        FROM (SELECT lang, unnest(list_filter(regexp_split_to_array(lower(text),
                 '[^a-z0-9]+'), t -> t <> '')) AS word FROM documents)
        ORDER BY lang, word
    """,
    "mr_secondary_sort": """
        SELECT user_id,
               COUNT(*) AS n_events,
               FIRST(event_id ORDER BY ts, event_id) AS first_event_id,
               FIRST(event_type ORDER BY ts, event_id) AS first_type,
               LAST(event_id ORDER BY ts, event_id) AS last_event_id,
               LAST(event_type ORDER BY ts, event_id) AS last_type
        FROM events
        GROUP BY user_id
        ORDER BY user_id
    """,
}

# the executable-pipe path computes the identical wordcount as the
# DataFrame path, so it carries the same oracle object — one source
# of truth, edits can't desynchronize the two
MAPREDUCE_ORACLES["mr_exec_wordcount"] = MAPREDUCE_ORACLES["mr_wordcount"]

# the exec input dir is documents.text written as line files, so the
# grep executables' output is exactly the matching text lines. The
# pattern interpolates from jobs.EXEC_GREP_PATTERN — one source of
# truth, so editing the constant can't silently desync the oracle.
from distributed_mapreduce_server_spark.mapreduce.jobs import (  # noqa: E402
    EXEC_GREP_PATTERN as _EXEC_GREP_PATTERN,
)

MAPREDUCE_ORACLES["mr_exec_grep"] = f"""
    SELECT ls[i] AS line
    FROM (SELECT string_split(text, chr(10)) AS ls FROM documents) t,
         UNNEST(range(1, len(ls) + 1)) AS u(i)
    WHERE ls[i] <> '' AND contains(lower(ls[i]), '{_EXEC_GREP_PATTERN}')
    ORDER BY line
"""


MAPREDUCE_ORACLES["mr_exec_join"] = """
    SELECT concat_ws('|', o_custkey, o_orderkey, c_mktsegment) AS line
    FROM orders JOIN customer ON o_custkey = c_custkey
    ORDER BY line
"""

# declarative twin carries the identical oracle
MAPREDUCE_ORACLES["mr_join"] = MAPREDUCE_ORACLES["mr_exec_join"]
