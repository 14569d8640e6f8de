"""Engine configuration.

The reference hard-codes its layout decisions in compile-time constants
(Posdb.h key packing, RdbBase merge thresholds — SURVEY.md §1); ours are
one dataclass so tests, bench and the 100 TB deployment differ only in
numbers, not code paths.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field


@dataclass(frozen=True)
class EngineConfig:
    # --- BM25 (pinned in FIXTURES.md §3; rank-identity oracle params) ---
    k1: float = 1.2
    b: float = 0.75

    # --- index layout ---
    # Number of term-hash buckets the segment store is partitioned by.
    # Query-side term lookup partition-prunes to the query's buckets
    # (replaces the reference's RdbMap ranged seek, RdbMap.cpp). At
    # 100 TB you want O(4096); tests use small counts so every code path
    # still sees >1 bucket.
    n_buckets: int = 64
    # Doc-range salts: postings are additionally split into contiguous
    # doc_id ranges so one Zipf head term (50% of docs, SURVEY §5.6)
    # cannot pin a single shuffle partition. Per-(term,salt) runs stay
    # doc_id-sorted, so concatenating salts in order reconstructs the
    # globally sorted posting list (unlike hash-salting).
    n_salts: int = 8
    # Max postings per encoded block; block-max score metadata is kept
    # per block (the WAND skip unit — Posdb.cpp getMaxPossibleScore is
    # the reference precedent, SURVEY §4).
    block_size: int = 128
    # Persist per-posting occurrence positions (pos_blob) in the
    # segment store — the positional index (the reference's posdb key
    # IS positional: one key per occurrence, Posdb.h, SURVEY §1.3).
    # Required for index-backed phrase/proximity; costs ~1-2 bytes per
    # occurrence in the shuffle and on disk. Top-k scoring never reads
    # the column (parquet column pruning skips it).
    store_positions: bool = True

    # --- tokenizer ---
    lowercase: bool = True
    # Code-aware splitting (camelCase / snake_case / digit boundaries);
    # the driver `documents` fixture is plain space-separated tokens, so
    # simple mode must stay bit-identical to split-on-whitespace.
    code_aware: bool = False
    stopwords: frozenset = field(default_factory=frozenset)

    # --- term ids ---
    # 48-bit term ids, like the reference posdb key's termId field
    # (Posdb.h key layout, SURVEY §1.3). xxhash64 masked to 48 bits.
    term_id_bits: int = 48

    # --- query ---
    top_k: int = 10

    @property
    def term_id_mask(self) -> int:
        return (1 << self.term_id_bits) - 1


def default_sf_dir() -> str:
    return os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def default_cpus() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
