"""Term hashing — reference: hash.h (hash64Lower_utf8 → 48-bit termId
in the posdb key, Posdb.h; SURVEY.md §2.8 X2-X3).

We use Spark's built-in xxhash64 (JVM-side, codegen) masked to 48 bits.
Field-restricted terms (`lang:en`, `repo:x` — Query.cpp getFieldCode)
hash the `field:term` composite, mirroring the reference's prefix
composition (hash.h hash64h).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

TERM_ID_MASK = (1 << 48) - 1


def term_id_col(term: Column, field: str | None = None) -> Column:
    if field:
        term = F.concat(F.lit(field + ":"), term)
    # & mask keeps ids non-negative and matches the reference's 48-bit
    # key budget; collisions at 2^48 are ~0 for any real vocabulary.
    # Driver-side query planning never re-hashes: it resolves term →
    # term_id through the persisted term_dict (index/wand.py
    # query_term_rows), so there is exactly one hash implementation.
    return F.xxhash64(term).bitwiseAND(F.lit(TERM_ID_MASK))
