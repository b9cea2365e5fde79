"""Audio framing kernels (operators/multimodal.py): the m5 stub-energy
fan-out's rate contract and the m5b REAL windowed-energy kernel, both
pinned against independent pure-Python models (the oracle-parity sweep
checks them cross-engine; these tests isolate the kernel math)."""

from __future__ import annotations

import hashlib

from pokemon_showdown_airflow_etl_spark.operators.multimodal import (
    PCM_MULT,
    _fake_audio_decode,
    audio_frame_energy,
    audio_pcm_frame_energy,
)


def _assets(spark, payloads):
    return spark.createDataFrame(
        [(f"a{i}", p) for i, p in enumerate(payloads)],
        "asset_id string, payload binary",
    )


def _model_frames(payload, frame, hop):
    """Independent model: header decode + framing arithmetic."""
    rate, n = _fake_audio_decode(payload)
    n_frames = max(0, (n - frame) // hop) + (1 if n >= frame else 0)
    return rate, n, n_frames


def test_audio_frame_energy_emits_decoder_rate(spark):
    """The r9 advisory: start_ms divides by the DECODER-reported rate,
    so the rate must be an output column — a deploy decoder returning
    44100 becomes visible downstream instead of silently diverging
    from a fixed-16 kHz assumption."""
    payloads = [b"alpha", b"beta-longer-payload"]
    rows = audio_frame_energy(_assets(spark, payloads)).collect()
    assert rows, "stub always yields >= 1000 samples -> >= 1 frame"
    assert "sample_rate" in rows[0].asDict()
    for r in rows:
        assert r["sample_rate"] == 16000  # the stub's constant
        assert r["start_ms"] == r["frame_idx"] * 200 * 1000 // r["sample_rate"]


def test_audio_pcm_energy_matches_python_model(spark):
    """m5b's energies must be ACTUAL windowed sums of squares over the
    synthesized stream — checked against a from-scratch Python loop
    (no numpy, no cumsum trick) per frame."""
    payloads = [b"pcm-one", b"pcm-two", b"x" * 100]
    frame, hop = 400, 200
    got = {
        (r["asset_id"], r["frame_idx"]): r
        for r in audio_pcm_frame_energy(
            _assets(spark, payloads), frame_samples=frame, hop_samples=hop
        ).collect()
    }
    n_expected = 0
    for i, p in enumerate(payloads):
        rate, n, n_frames = _model_frames(p, frame, hop)
        seed = int(hashlib.md5(p).hexdigest()[:8], 16)
        smp = [
            ((seed + (j + 1) * PCM_MULT) % 2**31) % 65536 - 32768
            for j in range(n)
        ]
        for k in range(n_frames):
            n_expected += 1
            r = got[(f"a{i}", k)]
            assert r["energy"] == sum(
                s * s for s in smp[k * hop : k * hop + frame]
            )
            assert r["n_samples"] == n and r["n_frames"] == n_frames
            assert r["sample_rate"] == rate
            assert r["start_ms"] == k * hop * 1000 // rate
    assert len(got) == n_expected


def test_audio_pcm_energy_skips_assets_too_short_for_one_frame(spark):
    """An asset whose stream is shorter than one window yields zero
    rows (no partial-frame energy), and the kernel survives a batch
    mixing framed and frameless assets."""
    payloads = [bytes([b]) for b in range(12)]
    frame = 60000  # the stub yields 1000..66535 samples
    short = [
        f"a{i}"
        for i, p in enumerate(payloads)
        if _fake_audio_decode(p)[1] < frame
    ]
    assert short, "need at least one too-short asset for the test to bite"
    rows = audio_pcm_frame_energy(
        _assets(spark, payloads), frame_samples=frame, hop_samples=frame
    ).collect()
    seen = {r["asset_id"] for r in rows}
    assert seen.isdisjoint(short)
    assert seen == {
        f"a{i}"
        for i, p in enumerate(payloads)
        if _fake_audio_decode(p)[1] >= frame
    }


def test_audio_energy_kernels_drop_null_payloads(spark):
    """A null payload (e.g. a null text encoded upstream) has no frames
    and must be filtered BEFORE the Arrow kernel — bytes(None) raised a
    TypeError inside both kernels (ADVICE r10)."""
    df = spark.createDataFrame(
        [("a0", b"\x01\x02"), ("a1", None), ("a2", b"\x03")],
        "asset_id string, payload binary",
    )
    for fn in (audio_frame_energy, audio_pcm_frame_energy):
        rows = fn(df, frame_samples=400, hop_samples=200).collect()
        assert rows, "non-null assets must still frame"
        assert {r["asset_id"] for r in rows} == {"a0", "a2"}


def test_audio_fingerprint_shape_and_short_asset_exclusion(spark):
    """m10: fixed 64-bit fingerprints in two positive 32-bit words;
    assets under n_bits+1 frames emit no row; deterministic."""
    from pokemon_showdown_airflow_etl_spark.operators.multimodal import (
        audio_fingerprint,
    )

    # text -> md5 digits 5..8 set n_samples = 1000 + 0..65535; frames
    # = (n-400)//200+1 — every asset here is comfortably long
    rows = [(str(i), f"audio content number {i}".encode()) for i in range(12)]
    df = spark.createDataFrame(rows, "asset_id string, payload binary")
    got = {r["asset_id"]: r for r in audio_fingerprint(df).collect()}
    for r in got.values():
        assert 0 <= r["fp_lo"] < (1 << 32) and 0 <= r["fp_hi"] < (1 << 32)
        assert r["n_frames"] >= 65
    # distinct payloads -> distinct fingerprints (iid digest energies)
    assert len({(r["fp_lo"], r["fp_hi"]) for r in got.values()}) == len(got)
    again = {
        r["asset_id"]: (r["fp_lo"], r["fp_hi"])
        for r in audio_fingerprint(df).collect()
    }
    assert again == {k: (r["fp_lo"], r["fp_hi"]) for k, r in got.items()}


def test_audio_near_dups_find_planted_reencode(spark):
    """m10b: a same-payload copy pairs at hamming 0 through the band
    join; unrelated assets do not pair."""
    from pokemon_showdown_airflow_etl_spark.operators.multimodal import (
        audio_fingerprint,
        audio_near_dups,
    )

    rows = [(str(i), f"track {i} bytes".encode()) for i in range(10)]
    rows.append(("900", rows[4][1]))  # re-encode twin of asset 4
    df = spark.createDataFrame(rows, "asset_id string, payload binary")
    fps = audio_fingerprint(df).select("asset_id", "fp_lo", "fp_hi")
    pairs = {
        (r["asset_a"], r["asset_b"]): r["hamming"]
        for r in audio_near_dups(fps).collect()
    }
    assert pairs == {("4", "900"): 0}
