"""Deterministic surrogate keys (reference op C2).

The reference generates a nondeterministic 10-char CUID per dimension row
(`cf_transform/main.py:29`, `cf_create_artists_dimension/main.py:25,86`),
which makes outputs untestable against goldens and forces a Python UDF
barrier. We replace it with a *deterministic* content hash of the natural
key: ``substr(sha2(concat_ws('|', cols), 256), 1, 10)``.

Why this is the right call at 100 TB: the key is a pure JVM-side expression
(whole-stage codegen, no Python), needs no coordination between executors
(unlike ``monotonically_increasing_id`` + join-back schemes), and is stable
across reruns, so an overwrite load is byte-identical and FK joins can be
tested. Collision odds at 10 hex chars (40 bits) are negligible for
dimension cardinalities; widen ``length`` if a dimension ever approaches
~2^20 rows.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

KEY_LENGTH = 10


def surrogate_key(*cols: Column | str, length: int = KEY_LENGTH) -> Column:
    """sha2-based surrogate key over the natural-key columns."""
    normalized = [F.col(c) if isinstance(c, str) else c for c in cols]
    return F.substring(F.sha2(F.concat_ws("|", *normalized), 256), 1, length)
