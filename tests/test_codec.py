"""Codec round-trips (SURVEY.md §5.1). Property-based where hypothesis
is available; deterministic seeds otherwise."""

from __future__ import annotations

import numpy as np
import pytest

from open_source_search_engine_spark.functions.codec import (
    delta_decode,
    delta_encode,
    f64_decode,
    f64_encode,
    varint_decode,
    varint_encode,
)

try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    HAVE_HYP = True
except ImportError:  # pragma: no cover
    HAVE_HYP = False


def test_varint_roundtrip_edges():
    vals = np.array(
        [0, 1, 127, 128, 129, 2**14 - 1, 2**14, 2**21, 2**32, 2**48, 2**63, 2**64 - 1],
        dtype=np.uint64,
    )
    assert np.array_equal(varint_decode(varint_encode(vals)), vals)


def test_varint_empty():
    assert varint_encode(np.empty(0, dtype=np.uint64)) == b""
    assert varint_decode(b"").size == 0


def test_delta_roundtrip():
    rng = np.random.default_rng(7)
    for n in (1, 2, 100, 10_000):
        v = np.unique(rng.integers(0, 2**40, size=n).astype(np.uint64))
        assert np.array_equal(delta_decode(delta_encode(v)), v)


def test_delta_compresses_dense_runs():
    v = np.arange(10_000, dtype=np.uint64) + 5_000_000
    enc = delta_encode(v)
    # gaps of 1 → 1 byte each (+ a few for the absolute head)
    assert len(enc) < 10_010


def test_f64_roundtrip():
    v = np.random.default_rng(3).normal(size=257)
    assert np.array_equal(f64_decode(f64_encode(v)), v)


if HAVE_HYP:

    @settings(max_examples=200, deadline=None)
    @given(
        st.lists(st.integers(min_value=0, max_value=2**63 - 1), max_size=300)
    )
    def test_varint_property(xs):
        v = np.array(xs, dtype=np.uint64)
        assert np.array_equal(varint_decode(varint_encode(v)), v)

    @settings(max_examples=100, deadline=None)
    @given(
        st.sets(st.integers(min_value=0, max_value=2**40), min_size=1, max_size=300)
    )
    def test_delta_property(xs):
        v = np.array(sorted(xs), dtype=np.uint64)
        assert np.array_equal(delta_decode(delta_encode(v)), v)
else:  # pragma: no cover

    def test_hypothesis_present():
        pytest.skip("hypothesis not installed")


def test_encode_kernel_matches_encode_group():
    """The whole-partition mapInPandas kernel must produce the same
    block rows (byte-identical blobs) as per-(bucket,salt)-group
    encoding — the invariant that lets the builder swap
    groupBy().applyInPandas for a partition-level kernel."""
    import pandas as pd

    from open_source_search_engine_spark.index.segments import (
        encode_group,
        make_encode_kernel,
        salt_width,
    )

    rng = np.random.default_rng(7)
    n_buckets, n_salts, bs, max_doc_id = 4, 3, 8, 999
    n = 5000
    term_ids = rng.integers(0, 40, n).astype(np.int64)
    doc_ids = rng.integers(0, max_doc_id + 1, n).astype(np.int64)
    pdf = (
        pd.DataFrame(
            {
                "term_id": term_ids,
                "doc_id": doc_ids,
                "tf": rng.integers(1, 9, n).astype(np.int64),
                "doc_len": rng.integers(1, 300, n).astype(np.int64),
            }
        )
        .drop_duplicates(["term_id", "doc_id"])
        .reset_index(drop=True)
    )
    width = salt_width(max_doc_id, n_salts)
    pdf["bucket"] = pdf["term_id"] % n_buckets
    pdf["salt"] = np.minimum(pdf["doc_id"] // width, n_salts - 1)

    kernel = make_encode_kernel(bs, n_buckets, max_doc_id, n_salts)
    # feed the kernel the whole frame split into arbitrary Arrow
    # batches (the kernel is mapInArrow now)
    import pyarrow as pa

    out_kernel = pd.concat(
        [
            rb.to_pandas()
            for rb in kernel(
                iter(
                    [
                        pa.RecordBatch.from_pandas(
                            pdf.iloc[:1234].drop(columns=["bucket", "salt"]),
                            preserve_index=False,
                        ),
                        pa.RecordBatch.from_pandas(
                            pdf.iloc[1234:].drop(columns=["bucket", "salt"]),
                            preserve_index=False,
                        ),
                    ]
                )
            )
        ]
    )
    out_groups = pd.concat(
        [encode_group(g, bs) for _, g in pdf.groupby(["bucket", "salt"])]
    )
    key = ["bucket", "salt", "term_id", "block_id"]
    a = out_kernel.sort_values(key).reset_index(drop=True)
    b = out_groups.sort_values(key).reset_index(drop=True)
    assert len(a) == len(b)
    for col in ["bucket", "salt", "term_id", "block_id", "doc_id_min",
                "doc_id_max", "n_docs"]:
        assert np.array_equal(
            a[col].to_numpy(np.int64), b[col].to_numpy(np.int64)
        ), col
    assert np.array_equal(
        a["block_max_tf"].to_numpy(np.int64), b["block_max_tf"].to_numpy(np.int64)
    )
    assert np.array_equal(
        a["block_min_dl"].to_numpy(np.int64), b["block_min_dl"].to_numpy(np.int64)
    )
    for col in ["docs_blob", "tfs_blob", "dls_blob"]:
        assert all(
            bytes(x) == bytes(y) for x, y in zip(a[col], b[col])
        ), col


def test_positions_roundtrip_and_self_contained_slices():
    """positions_encode/decode roundtrip + the per-posting slice
    contract the segment/compaction paths rely on: every posting's
    byte slice decodes standalone, and byte offsets are recoverable
    from the continuation-bit scan alone (positions_byte_offsets)."""
    from open_source_search_engine_spark.functions.codec import (
        positions_byte_offsets,
        positions_decode,
        positions_encode,
    )

    rng = np.random.default_rng(1)
    for _ in range(50):
        n = int(rng.integers(1, 40))
        tfs = rng.integers(1, 9, n).astype(np.int64)
        flat = np.concatenate(
            [np.sort(rng.choice(100_000, tf, replace=False)) for tf in tfs]
        ).astype(np.int64)
        buf, offs = positions_encode(flat, tfs)
        assert np.array_equal(positions_decode(buf, tfs), flat)
        assert np.array_equal(positions_byte_offsets(buf, tfs), offs)
        cum = np.concatenate(([0], np.cumsum(tfs)))
        for i in (0, n // 2, n - 1):
            sub = buf[offs[i]:offs[i + 1]]
            assert np.array_equal(
                positions_decode(sub, tfs[i:i + 1]), flat[cum[i]:cum[i + 1]]
            )
    empty_b, empty_o = positions_encode(
        np.empty(0, np.int64), np.empty(0, np.int64)
    )
    assert empty_b == b"" and list(empty_o) == [0]
