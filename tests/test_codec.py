import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from infidex_spark.build.codec import (
    BLOCK_SIZE,
    decode_postings,
    decode_varints,
    encode_postings,
    encode_varints,
)


def test_varint_roundtrip_simple():
    vals = np.array([0, 1, 127, 128, 300, 16383, 16384, 2**32, 2**63], dtype=np.uint64)
    buf = encode_varints(vals)
    got = decode_varints(buf, len(vals))
    assert got.tolist() == vals.tolist()


def test_varint_empty():
    assert encode_varints(np.array([], dtype=np.uint64)) == b""
    assert decode_varints(b"", 0).size == 0


def test_varint_known_encoding():
    # 300 = 0b100101100 -> 0xAC 0x02
    assert encode_varints(np.array([300], dtype=np.uint64)) == b"\xac\x02"
    assert encode_varints(np.array([1], dtype=np.uint64)) == b"\x01"
    assert encode_varints(np.array([127], dtype=np.uint64)) == b"\x7f"
    assert encode_varints(np.array([128], dtype=np.uint64)) == b"\x80\x01"


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**63 - 1), max_size=500))
def test_varint_roundtrip_property(vals):
    arr = np.array(vals, dtype=np.uint64)
    assert decode_varints(encode_varints(arr), len(arr)).tolist() == vals


def test_postings_roundtrip():
    rng = np.random.default_rng(7)
    doc_ids = np.unique(rng.integers(0, 10_000_000, size=1000)).astype(np.int64)
    weights = rng.integers(1, 256, size=doc_ids.size).astype(np.uint8)
    enc = encode_postings(doc_ids, weights)
    d, w = decode_postings(enc["payload"], enc["weights"], doc_ids.size)
    assert (d == doc_ids).all()
    assert (w == weights).all()


def test_block_metadata():
    n = BLOCK_SIZE * 2 + 10
    doc_ids = np.arange(1, n + 1, dtype=np.int64) * 3
    weights = np.ones(n, dtype=np.uint8)
    weights[BLOCK_SIZE] = 200  # max of block 1
    weights[-1] = 50  # max of block 2
    enc = encode_postings(doc_ids, weights)
    assert enc["block_counts"].tolist() == [BLOCK_SIZE, BLOCK_SIZE, 10]
    assert enc["block_max_w"].tolist() == [1, 200, 50]
    assert enc["block_last_doc"].tolist() == [
        doc_ids[BLOCK_SIZE - 1],
        doc_ids[2 * BLOCK_SIZE - 1],
        doc_ids[-1],
    ]


def test_postings_rejects_unsorted():
    with pytest.raises(ValueError):
        encode_postings(np.array([3, 2]), np.array([1, 1], dtype=np.uint8))
    with pytest.raises(ValueError):
        encode_postings(np.array([2, 2]), np.array([1, 1], dtype=np.uint8))


def test_postings_empty_and_single():
    enc = encode_postings(np.array([], dtype=np.int64), np.array([], dtype=np.uint8))
    d, w = decode_postings(enc["payload"], enc["weights"], 0)
    assert d.size == 0 and w.size == 0
    enc = encode_postings(np.array([42], dtype=np.int64), np.array([7], dtype=np.uint8))
    d, w = decode_postings(enc["payload"], enc["weights"], 1)
    assert d.tolist() == [42] and w.tolist() == [7]
    assert enc["block_last_doc"].tolist() == [42]


def test_batch_encoder_matches_single():
    from infidex_spark.build.codec import encode_postings_batch

    rng = np.random.default_rng(11)
    packed_lists = []
    singles = []
    for n in [0, 1, 5, BLOCK_SIZE, BLOCK_SIZE + 1, 1000]:
        ids = np.sort(rng.choice(np.arange(1, 100000), size=n, replace=False)).astype(np.int64)
        tfs = rng.integers(1, 255, size=n).astype(np.uint8)
        packed_lists.append((ids << 8) | tfs)
        singles.append(encode_postings(ids, tfs))
    batch = encode_postings_batch(packed_lists)
    for i, single in enumerate(singles):
        assert batch["payload"][i] == single["payload"], i
        assert batch["weights"][i] == single["weights"], i
        assert batch["block_last_doc"][i] == single["block_last_doc"].tolist(), i
        assert batch["block_max_w"][i] == single["block_max_w"].tolist(), i


@given(
    st.lists(st.integers(min_value=0, max_value=1 << 40), min_size=1, max_size=600),
    st.data(),
)
def test_decode_posting_blocks_matches_full_decode(raw_ids, data):
    """Any block range decodes to exactly the corresponding slice of the
    full decode (lazy block decode correctness, property-based)."""
    import numpy as np

    from infidex_spark.build.codec import (
        BLOCK_SIZE,
        decode_posting_blocks,
        decode_postings,
        encode_postings,
    )

    doc_ids = np.unique(np.asarray(raw_ids, dtype=np.int64))
    weights = (doc_ids % 251 + 1).astype(np.uint8)
    enc = encode_postings(doc_ids, weights)
    n = int(doc_ids.size)
    full_ids, full_w = decode_postings(enc["payload"], enc["weights"], n)
    np.testing.assert_array_equal(full_ids, doc_ids)
    nblocks = len(enc["block_offsets"])
    b0 = data.draw(st.integers(min_value=0, max_value=nblocks))
    b1 = data.draw(st.integers(min_value=b0, max_value=nblocks))
    ids, w = decode_posting_blocks(
        enc["payload"], enc["weights"], n,
        np.asarray(enc["block_offsets"]), np.asarray(enc["block_last_doc"]),
        b0, b1,
    )
    s, e = b0 * BLOCK_SIZE, min(b1 * BLOCK_SIZE, n)
    np.testing.assert_array_equal(ids, full_ids[s:e])
    np.testing.assert_array_equal(w, full_w[s:e])
