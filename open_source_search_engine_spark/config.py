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


def simhash_bits_for(n_docs: int, max_hamming: int = 3, avg_bucket: int = 16) -> int:
    """Corpus-aware simhash signature width (VERDICT r02 item 9).

    Banded hamming search splits a ``bits``-wide signature into
    ``max_hamming + 1`` bands (pigeonhole: any pair within the radius
    collides exactly on ≥1 band). Each band has ``2^(bits/(h+1))``
    buckets and the within-bucket verify step is quadratic in bucket
    size, so for E[bucket] ≤ ``avg_bucket`` you need

        2^(bits / (h+1)) ≥ n_docs / avg_bucket
        bits ≥ (h+1) · log2(n_docs / avg_bucket)

    e.g. h=3: 1e6 docs → 64 bits (the default), 1e9 → 104 → round up
    to 128, 1e12 → 144 → 192. Returned value is rounded up to a
    multiple of 64 so signatures stay packed longs."""
    import math

    need = (max_hamming + 1) * max(1.0, math.log2(max(2, n_docs) / avg_bucket))
    return max(64, 64 * math.ceil(need / 64))


def lsh_band_bits_for(n_docs: int, avg_bucket: int = 16) -> int:
    """Corpus-aware hyperplane-LSH band width for embedding_near_dup:
    each band is an independent ``band_bits``-bit bucket key, so
    E[bucket] = n_docs / 2^band_bits; keeping it ≤ ``avg_bucket``
    needs band_bits ≥ log2(n_docs / avg_bucket). 500 fixture vecs →
    16 (the default floor), 1e9 → 26, 1e12 → 36 (still < the packed
    63-bit key). Recall per band drops as bands widen — compensate
    with n_bands (candidate recall ≈ 1-(1-p^band_bits)^n_bands)."""
    import math

    return max(16, math.ceil(math.log2(max(2, n_docs) / avg_bucket)))


def default_sf_dir() -> str:
    return os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def default_cpus() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
