"""End-to-end smoke tests for the synthesizer (tiny config) and Avocodo."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vits_tpu.models.synthesizer import SynthesizerTrn
from vits_tpu.models.avocodo import AvocodoDiscriminator, probe_discriminator
from vits_tpu.models.duration import StochasticDurationPredictor
from vits_tpu.models.hifigan import HiFiGANGenerator


TINY = dict(
    num_chars=30,
    spec_channels=513,
    segment_size=2048,  # 8 frames
    midi_start=-5,
    midi_end=75,
    octave_range=24,
    inter_channels=96,
    hidden_channels=96,
    filter_channels=128,
    n_heads=2,
    n_layers=1,
    kernel_size=3,
    p_dropout=0.0,
    resblock="1",
    resblock_kernel_sizes=[3],
    resblock_dilation_sizes=[[1, 3]],
    upsample_rates=[8, 8, 2, 2],
    upsample_initial_channel=64,
    upsample_kernel_sizes=[16, 16, 4, 4],
    yin_channels=80,
    yin_start=15,
    yin_scope=50,
    yin_shift_range=15,
    n_speakers=3,
    gin_channels=16,
    # compile-size knobs (flagship depths are parity-tested per-module in
    # test_torch_parity; these tests exercise graph wiring)
    posterior_layers=2,
    flow_n_flows=2,
    flow_wn_layers=1,
    dur_n_flows=1,
    yin_dec_layers=2,
)


def _batch(b=2, tx=11, ty=24):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(1, 30, (b, tx)))
    t = jnp.asarray(rng.integers(0, 6, (b, tx)))
    x_lengths = jnp.asarray([tx, tx - 3])
    spec = jnp.asarray(np.abs(rng.standard_normal((b, ty, 513))), jnp.float32)
    ying = jnp.asarray(rng.uniform(0, 1, (b, ty, 80)), jnp.float32)
    y_lengths = jnp.asarray([ty, ty - 5])
    sid = jnp.asarray([0, 2])
    return x, t, x_lengths, spec, y_lengths, ying, sid


@pytest.fixture(scope="module")
def model_and_params():
    model = SynthesizerTrn(**TINY)
    x, t, xl, spec, yl, ying, sid = _batch()
    params = model.init(
        jax.random.PRNGKey(0), x, t, xl, spec, yl, ying, sid,
        rng=jax.random.PRNGKey(1),
    )
    return model, params


def test_train_forward_shapes(model_and_params):
    model, params = model_and_params
    x, t, xl, spec, yl, ying, sid = _batch()
    out = model.apply(params, x, t, xl, spec, yl, ying, sid,
                      rng=jax.random.PRNGKey(2))
    b, ty = 2, 24
    seg_frames = TINY["segment_size"] // 256
    assert len(out["wav_hier"]) == 3
    # hierarchical scales: seg*256/4, /2, /1 samples
    assert out["wav_hier"][0].shape == (2 * b, seg_frames * 64, 1)
    assert out["wav_hier"][1].shape == (2 * b, seg_frames * 128, 1)
    assert out["wav_hier"][2].shape == (2 * b, seg_frames * 256, 1)
    assert out["l_length"].shape == (b,)
    assert out["attn"].shape == (b, ty, 11)
    assert out["z_p"].shape == (b, ty, 96)
    assert out["m_p"].shape == (b, ty, 96)
    assert out["yin_hat_crop"].shape == (2 * b, seg_frames, 50)
    assert out["yin_gt_crop"].shape == (b, ty, 50)
    assert out["yin_dec_crop"].shape == (b, ty, 50)
    assert out["yin_hat_shifted"].shape == (b, seg_frames, 50)
    for k, v in out.items():
        if isinstance(v, jnp.ndarray):
            assert np.isfinite(np.asarray(v)).all(), k
    # durations from MAS sum to spec lengths
    w = np.asarray(out["attn"]).sum(axis=1)
    np.testing.assert_allclose(w.sum(axis=1), [24, 19])


def test_infer_shapes(model_and_params):
    model, params = model_and_params
    x, t, xl, *_ , sid = _batch()
    wav, y_mask, y_lengths = model.apply(
        params, x, t, xl, sid=sid, rng=jax.random.PRNGKey(3),
        max_frames=64, method=SynthesizerTrn.infer,
    )
    assert wav.shape == (2, 64 * 256, 1)
    assert np.isfinite(np.asarray(wav)).all()
    assert (np.asarray(y_lengths) >= 1).all()


def test_voice_conversion(model_and_params):
    model, params = model_and_params
    _, _, _, spec, yl, ying, sid = _batch()
    o_hat, y_mask, _ = model.apply(
        params, spec, ying, yl, sid, jnp.asarray([1, 0]),
        rng=jax.random.PRNGKey(4), method=SynthesizerTrn.voice_conversion,
    )
    assert o_hat.shape == (2, 24 * 256, 1)
    assert np.isfinite(np.asarray(o_hat)).all()


def test_hifigan_hier_lengths():
    m = HiFiGANGenerator(
        initial_channel=66, resblock_type="1",
        resblock_kernel_sizes=(3,), resblock_dilation_sizes=((1, 3),),
        upsample_rates=(8, 8, 2, 2), upsample_initial_channel=32,
        upsample_kernel_sizes=(16, 16, 4, 4), gin_channels=0,
    )
    x = jnp.ones((1, 8, 66))
    params = m.init(jax.random.PRNGKey(0), x, method=HiFiGANGenerator.hier_forward)
    outs = m.apply(params, x, method=HiFiGANGenerator.hier_forward)
    assert [o.shape[1] for o in outs] == [8 * 64, 8 * 128, 8 * 256]
    final = m.apply(params, x)
    np.testing.assert_allclose(np.asarray(final), np.asarray(outs[-1]), rtol=1e-5)


def test_avocodo_discriminator_shapes():
    m = probe_discriminator()
    rng = np.random.default_rng(0)
    b, t = 2, 8192
    y = jnp.asarray(rng.standard_normal((2 * b, t, 1)) * 0.1, jnp.float32)
    ys_hat = [
        jnp.asarray(rng.standard_normal((2 * b, t // 4, 1)) * 0.1, jnp.float32),
        jnp.asarray(rng.standard_normal((2 * b, t // 2, 1)) * 0.1, jnp.float32),
        jnp.asarray(rng.standard_normal((2 * b, t, 1)) * 0.1, jnp.float32),
    ]
    params = m.init(jax.random.PRNGKey(0), y, ys_hat)
    y_d_rs, y_d_gs, fmap_rs, fmap_gs = m.apply(params, y, ys_hat)
    assert len(y_d_rs) == len(y_d_gs) == 7  # 3 CoMBD + 4 SBD
    for r, g in zip(y_d_rs, y_d_gs):
        assert r.shape == g.shape
        assert np.isfinite(np.asarray(r)).all() and np.isfinite(np.asarray(g)).all()
    assert len(fmap_rs) == len(fmap_gs) == 7
    for fr, fg in zip(fmap_rs, fmap_gs):
        for a, b_ in zip(fr, fg):
            assert a.shape == b_.shape


def test_sdp_train_and_reverse():
    m = StochasticDurationPredictor(
        in_channels=16, filter_channels=24, kernel_size=3, p_dropout=0.0,
        n_flows=2, gin_channels=8,
    )
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 7, 16)), jnp.float32)
    mask = jnp.ones((2, 7, 1))
    w = jnp.asarray(rng.integers(1, 5, (2, 7, 1)), jnp.float32)
    g = jnp.asarray(rng.standard_normal((2, 1, 8)), jnp.float32)
    params = m.init(jax.random.PRNGKey(0), x, mask, w, g, rng=jax.random.PRNGKey(1))
    nll = m.apply(params, x, mask, w, g, rng=jax.random.PRNGKey(2))
    assert nll.shape == (2,)
    assert np.isfinite(np.asarray(nll)).all()
    logw = m.apply(params, x, mask, g=g, rng=jax.random.PRNGKey(3),
                   noise_scale=0.8, method=StochasticDurationPredictor.reverse)
    assert logw.shape == (2, 7, 1)
    assert np.isfinite(np.asarray(logw)).all()
