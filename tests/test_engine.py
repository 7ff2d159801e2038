"""Serving engine end-to-end on a tiny config: synthesize + chunked decode
consistency (random weights; decode is deterministic given the latent)."""

import numpy as np
import pytest
import yaml


@pytest.fixture(scope="module")
def engine(tmp_path_factory):
    d = tmp_path_factory.mktemp("engine")
    cfg = {
        "train": {"segment_size": 2048},
        "data": {
            "sampling_rate": 22050, "filter_length": 1024, "hop_length": 256,
            "win_length": 1024, "n_mel_channels": 80, "mel_fmin": 0.0,
            "mel_fmax": None, "add_blank": True, "speakers": ["A", "B"],
            "midi_start": -5, "midi_end": 75, "midis": 80,
            "ying_window": 2048, "ying_hop": 256, "tau_max": 2048,
            "octave_range": 24,
        },
        "model": {
            "inter_channels": 96, "hidden_channels": 48, "filter_channels": 64,
            "n_heads": 2, "n_layers": 1, "kernel_size": 3, "p_dropout": 0.0,
            "resblock": "1", "resblock_kernel_sizes": [3],
            "resblock_dilation_sizes": [[1, 3]],
            "upsample_rates": [8, 8, 2, 2], "upsample_initial_channel": 32,
            "upsample_kernel_sizes": [16, 16, 4, 4], "gin_channels": 16,
            "yin_channels": 80, "yin_start": 15, "yin_scope": 50,
            "yin_shift_range": 15,
        },
    }
    p = d / "config.yaml"
    p.write_text(yaml.safe_dump(cfg))
    from vits_tpu.serve.engine import TTSEngine

    return TTSEngine(str(p), checkpoint_path=None, max_frames=96)


def test_engine_synthesize(engine):
    phones, (sr, audio) = engine.synthesize("[P]ni3#hao3[P]", 0, seed=1)
    assert sr == 22050
    assert audio.ndim == 1 and len(audio) > 0
    assert np.isfinite(audio).all()
    assert phones == "ni↓↑ xɑʊ↓↑"


def test_engine_chunked_matches_full(engine):
    text = "[P]ni3#hao3 ni3#hao3[P]"
    _, (sr, full) = engine.synthesize(text, 1, seed=2)
    _, (sr2, chunked) = engine.synthesize_chunked(
        text, 1, seed=2, chunk_frames=16, overlap_frames=16
    )
    n = min(len(full), len(chunked))
    assert n > 0
    err = np.abs(full[:n] - chunked[:n])
    rms = np.sqrt((full[:n] ** 2).mean()) + 1e-9
    assert err.max() < 0.05 * rms + 1e-3, (err.max(), rms)


def test_engine_empty_text_raises(engine):
    with pytest.raises(ValueError):
        engine.synthesize("untagged text only", 0)


def test_split_segments_phrase_boundaries(engine):
    from vits_tpu.text.symbols import symbols as S

    comma, space, a = S.index(","), S.index(" "), S.index("a")
    seq = [a] * 10 + [comma] + [a] * 10 + [space] + [a] * 10
    lang = [0] * len(seq)
    segs = engine._split_segments(np.asarray(seq), np.asarray(lang), 16)
    # first cut right after the comma (index 10), not mid-phrase
    assert len(segs[0][0]) == 11 and int(segs[0][0][-1]) == comma
    assert sum(len(s) for s, _ in segs) == len(seq)
    assert all(len(s) <= 16 for s, _ in segs)
    # no boundary at all -> hard split, nothing dropped
    segs2 = engine._split_segments(
        np.asarray([a] * 40), np.asarray([0] * 40), 16
    )
    assert [len(s) for s, _ in segs2] == [16, 16, 8]


def test_engine_long_input_not_truncated(engine):
    """A ~1000-symbol input synthesizes completely via phrase splitting
    (round-1 engine silently truncated at the 384 bucket)."""
    text = "[P]" + " ".join(["ni3#hao3%"] * 55) + "[P]"
    seq, lang, _ = engine.get_phoneme(text)
    assert len(seq) > 900  # after add_blank intersperse
    phones, (sr, audio) = engine.synthesize(text, 0, seed=3)
    # every segment contributes: output must exceed one full frame budget
    assert len(audio) > engine.max_frames * engine.hop
    assert np.isfinite(audio).all()


def test_chunked_decoder_no_retrace(engine):
    """synthesize_chunked shares one compiled decoder across calls."""
    text = "[P]ni3#hao3[P]"
    engine.synthesize_chunked(text, 0, seed=1, chunk_frames=16,
                              overlap_frames=16)
    size_before = engine._decode_fn._cache_size()
    engine.synthesize_chunked(text, 1, seed=4, chunk_frames=16,
                              overlap_frames=16)
    assert engine._decode_fn._cache_size() == size_before


def test_scope_shift_slider_no_retrace(engine):
    """scope_shift is a traced argument: sweeping the -15..15 slider reuses
    the compiled program (VERDICT round-2 item #8 — was a static argname,
    up to ~120 distinct compiles across the UI space)."""
    engine.synthesize("[P]ni3#hao3[P]", 0, seed=1, scope_shift=0)
    size_before = engine._synth_fn._cache_size()
    outs = []
    for shift in (-15, -7, 3, 15):
        _, (_, audio) = engine.synthesize(
            "[P]ni3#hao3[P]", 0, seed=1, scope_shift=shift
        )
        outs.append(audio)
    assert engine._synth_fn._cache_size() == size_before
    # the shift actually reaches the crop: different shifts, different audio
    assert any(
        len(a) != len(outs[0]) or not np.array_equal(a, outs[0])
        for a in outs[1:]
    )


def test_synthesize_batch_matches_composition_independent(engine):
    """Per-row PRNG keys: a request's audio must not depend on what it was
    batched with (the dynamic-batching determinism contract)."""
    reqs = [
        {"text": "[P]ni3#hao3[P]", "speaker_id": 0, "seed": 7},
        {"text": "[P]shi4 jie4[P]", "speaker_id": 1, "seed": 9},
        {"text": "[P]ni3#hao3%shi4[P]", "speaker_id": 1, "seed": 11},
    ]
    solo = engine.synthesize_batch([reqs[0]])[0]
    together = engine.synthesize_batch(reqs)
    assert len(together) == 3
    for a in together:
        assert a.ndim == 1 and len(a) > 0 and np.isfinite(a).all()
    np.testing.assert_allclose(solo, together[0], atol=1e-4)
    # distinct seeds/texts -> distinct audio
    assert len(together[1]) != len(together[2]) or not np.array_equal(
        together[1], together[2]
    )


def test_dynamic_batcher_end_to_end(engine):
    from vits_tpu.serve.batcher import DynamicBatcher

    b = DynamicBatcher(engine, max_batch=4, max_wait_ms=30.0)
    try:
        futs = [
            b.submit("[P]ni3#hao3[P]", speaker_id=i % 2, seed=i)
            for i in range(5)
        ]
        outs = [f.result(timeout=300) for f in futs]
        for sr, audio in outs:
            assert sr == engine.sampling_rate
            assert len(audio) > 0 and np.isfinite(audio).all()
        # same (text, speaker, seed) submitted again reproduces exactly
        fut2 = b.submit("[P]ni3#hao3[P]", speaker_id=0, seed=0)
        sr2, audio2 = fut2.result(timeout=300)
        np.testing.assert_allclose(outs[0][1], audio2, atol=1e-4)
    finally:
        b.close()
    import pytest as _pytest

    with _pytest.raises(RuntimeError):
        b.submit("[P]ni3[P]")


def test_batch_bad_request_isolated(engine):
    """An invalid request fails alone; its batchmates still synthesize."""
    from vits_tpu.serve.batcher import DynamicBatcher

    reqs = [
        {"text": "[P]ni3#hao3[P]", "seed": 1},
        {"text": "no language tags here", "seed": 2},
        {"text": "[P]shi4 jie4[P]", "seed": 3},
    ]
    outs = engine.synthesize_batch(reqs)
    assert isinstance(outs[1], ValueError)
    assert len(outs[0]) > 0 and len(outs[2]) > 0

    b = DynamicBatcher(engine, max_batch=4, max_wait_ms=30.0)
    try:
        futs = [b.submit(r["text"], seed=r["seed"]) for r in reqs]
        sr, good = futs[0].result(timeout=300)
        assert len(good) > 0
        import pytest as _pytest

        with _pytest.raises(ValueError):
            futs[1].result(timeout=300)
        sr2, good2 = futs[2].result(timeout=300)
        assert len(good2) > 0
    finally:
        b.close()


def test_streaming_matches_chunked(engine):
    """synthesize_streaming yields incrementally; concatenation is
    bit-identical to synthesize_chunked."""
    text = "[P]ni3#hao3 ni3#hao3[P]"
    _, (sr, full) = engine.synthesize_chunked(
        text, 1, seed=5, chunk_frames=16, overlap_frames=16
    )
    phones, stream = engine.synthesize_streaming(
        text, 1, seed=5, chunk_frames=16, overlap_frames=16
    )
    chunks = list(stream)
    assert len(chunks) >= 2  # actually incremental
    np.testing.assert_array_equal(np.concatenate(chunks), full)
