"""Perceptual image hashing (m6/m6b): the aHash kernel's mean/bit/pack
math against a from-scratch Python re-derivation, and the banded
Hamming blocking's COMPLETE-recall law (Manku et al., WWW 2007):
max_hamming < n_bands means any pair within the threshold shares at
least one exact 16-bit band by pigeonhole — so recall is provable, not
sampled."""

from __future__ import annotations

import hashlib

import numpy as np
from pyspark.sql import functions as F

from pokemon_showdown_airflow_etl_spark.operators.multimodal import (
    _fake_image_decode,
    ahash_near_dups,
    image_ahash,
)


def _expected_ahash(payload: bytes) -> tuple[int, int, int, int]:
    """Independent re-derivation: (width, height, lo, hi)."""
    w, h, _ = _fake_image_decode(payload)
    cmd5 = hashlib.md5(payload).hexdigest()
    pix = np.frombuffer(
        b"".join(hashlib.md5(f"{cmd5}:{k}".encode()).digest() for k in range(4)),
        dtype=np.uint8,
    ).astype(int)
    bits = [1 if p * 64 > pix.sum() else 0 for p in pix]
    lo = sum(b << i for i, b in enumerate(bits[:32]))
    hi = sum(b << i for i, b in enumerate(bits[32:]))
    return w, h, lo, hi


def test_image_ahash_matches_reference_math(spark):
    payloads = [f"image payload {i}".encode() for i in range(7)]
    df = spark.createDataFrame(
        [(str(i), p) for i, p in enumerate(payloads)],
        "asset_id string, payload binary",
    )
    got = {r["asset_id"]: r for r in image_ahash(df).collect()}
    assert len(got) == 7
    for i, p in enumerate(payloads):
        w, h, lo, hi = _expected_ahash(p)
        r = got[str(i)]
        assert (r["width"], r["height"]) == (w, h)
        assert (r["ahash_lo"], r["ahash_hi"]) == (lo, hi)
        # both words are positive 32-bit values: no sign-bit packing
        assert 0 <= r["ahash_lo"] < 2**32 and 0 <= r["ahash_hi"] < 2**32


def test_image_ahash_null_payload_is_dropped(spark):
    df = spark.createDataFrame(
        [("a", b"img"), ("b", None)], "asset_id string, payload binary"
    )
    assert [r["asset_id"] for r in image_ahash(df).collect()] == ["a"]


def _hash_df(spark, rows):
    return spark.createDataFrame(
        rows, "asset_id string, ahash_lo long, ahash_hi long"
    )


def _flip(lo: int, hi: int, positions: list[int]) -> tuple[int, int]:
    for p in positions:
        if p < 32:
            lo ^= 1 << p
        else:
            hi ^= 1 << (p - 32)
    return lo, hi


def test_banded_blocking_has_complete_recall_within_threshold(spark):
    """Every <=3-bit perturbation of a base hash must be found, for
    flip sets chosen to straddle band boundaries (including all three
    flips inside ONE band and one flip in each of three bands)."""
    base_lo, base_hi = 0x9E3779B1, 0x7F4A7C15
    flip_sets = [
        [],  # exact duplicate
        [0],
        [31],
        [63],
        [3, 40],  # two bands
        [1, 2, 3],  # all in band 0
        [15, 16, 17],  # straddles the lo bands
        [0, 20, 40],  # three different bands
        [10, 33, 60],
    ]
    rows = [("base", base_lo, base_hi)]
    for i, fs in enumerate(flip_sets):
        lo, hi = _flip(base_lo, base_hi, fs)
        rows.append((f"var{i:02d}", lo, hi))
    got = ahash_near_dups(_hash_df(spark, rows), max_hamming=3)
    pairs = {(r["asset_a"], r["asset_b"]): r["hamming"] for r in got.collect()}
    for i, fs in enumerate(flip_sets):
        assert ("base", f"var{i:02d}") in pairs, f"missed flips {fs}"
        assert pairs[("base", f"var{i:02d}")] == len(fs)


def test_banded_blocking_filters_band_collisions_beyond_threshold(spark):
    """A pair agreeing on one band but differing by >3 bits elsewhere
    is a CANDIDATE (band collision) that verification must reject."""
    base_lo, base_hi = 0x12345678, 0x0BADF00D
    lo, hi = _flip(base_lo, base_hi, [20, 40, 50, 60])  # band 0 intact
    got = ahash_near_dups(
        _hash_df(spark, [("a", base_lo, base_hi), ("b", lo, hi)]),
        max_hamming=3,
    )
    assert got.count() == 0


def test_banded_blocking_emits_each_pair_once(spark):
    """An exact duplicate collides in all four bands; the pair must
    come back once, not four times."""
    rows = [("a", 7, 9), ("b", 7, 9)]
    got = ahash_near_dups(_hash_df(spark, rows)).collect()
    assert [(r["asset_a"], r["asset_b"], r["hamming"]) for r in got] == [
        ("a", "b", 0)
    ]


def test_banded_blocking_rejects_unprovable_threshold():
    import pytest

    with pytest.raises(AssertionError, match="pigeonhole"):
        ahash_near_dups(None, max_hamming=4, n_bands=4)


def test_scene_segments_edges(spark):
    """First frame never cuts; scene ids start at 0 and increment at
    each cut; a single-frame asset is one scene."""
    from pokemon_showdown_airflow_etl_spark.operators.multimodal import (
        scene_segments,
    )

    frames = spark.createDataFrame(
        [
            ("a", 0, 10),
            ("a", 1000, 200),  # jump 190 > 128 -> cut
            ("a", 2000, 210),  # jump 10 -> same scene
            ("a", 3000, 40),   # jump 170 -> cut
            ("b", 0, 255),     # single frame, no cut
        ],
        "asset_id string, frame_ms long, luma int",
    )
    got = {
        (r["asset_id"], r["frame_ms"]): (r["is_cut"], r["scene_id"])
        for r in scene_segments(frames, threshold=128).collect()
    }
    assert got[("a", 0)] == (False, 0)
    assert got[("a", 1000)] == (True, 1)
    assert got[("a", 2000)] == (False, 1)
    assert got[("a", 3000)] == (True, 2)
    assert got[("b", 0)] == (False, 0)


def test_ahash_admission_statuses_and_precedence(spark):
    """dup_of_corpus wins over dup_in_batch (d9's precedence); the
    min-id batch keeper stays accepted; first_corpus_dup is the
    smallest matching corpus id."""
    from pokemon_showdown_airflow_etl_spark.operators.multimodal import (
        ahash_admission,
    )

    corpus = _hash_df(spark, [("c1", 100, 200), ("c2", 100, 200), ("c9", 7, 7)])
    batch = _hash_df(
        spark,
        [
            ("n1", 100, 200),   # near c1 AND c2 -> dup_of_corpus (first=c1)
            ("n2", 100, 201),   # hamming 1 from n1 AND corpus -> corpus wins
            ("n3", 555, 777),   # unique -> accepted (keeper)
            ("n4", 555, 777),   # exact copy of n3 -> dup_in_batch
            ("n5", 999, 111),   # unique -> accepted
        ],
    )
    got = {
        r["asset"]: (r["n_corpus_dups"], r["first_corpus_dup"], r["status"])
        for r in ahash_admission(batch, corpus, max_hamming=3).collect()
    }
    assert got["n1"] == (2, "c1", "dup_of_corpus")
    assert got["n2"] == (2, "c1", "dup_of_corpus")
    assert got["n3"] == (0, None, "accepted")
    assert got["n4"] == (0, None, "dup_in_batch")
    assert got["n5"] == (0, None, "accepted")
