"""Numerical parity vs the torch reference (/root/reference), run as an
external oracle: random-init torch modules, convert weights with
vits_tpu.utils.convert_torch, compare forward outputs on identical inputs.

These tests are the checkpoint-migration guarantee: if they pass, a trained
reference checkpoint converts losslessly.
"""

import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference repo not mounted"
)

if os.path.isdir(REF):
    sys.path.insert(0, REF)
    import torch

    torch.manual_seed(0)

from vits_tpu.utils import convert_torch as C


def _to_torch(x):
    import torch

    return torch.from_numpy(np.asarray(x))


def test_wavenet_parity():
    import WaveNet as refWN
    from vits_tpu.models.modules import WaveNet

    tm = refWN.WaveNet(8, 5, 1, 3, gin_channels=4)
    tm.eval()
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 12, 8)).astype(np.float32)
    mask = np.ones((2, 12, 1), np.float32)
    g = rng.standard_normal((2, 1, 4)).astype(np.float32)
    with torch.no_grad():
        ref = tm(
            _to_torch(x.transpose(0, 2, 1)),
            _to_torch(mask.transpose(0, 2, 1)),
            g=_to_torch(g.transpose(0, 2, 1)),
        ).numpy()

    sd = {f"m.{k}": v for k, v in tm.state_dict().items()}
    params = {"params": C._wavenet(sd, "m", 3, True)}
    m = WaveNet(hidden_channels=8, kernel_size=5, dilation_rate=1, n_layers=3,
                gin_channels=4)
    out = m.apply(params, jnp.asarray(x), jnp.asarray(mask), jnp.asarray(g))
    np.testing.assert_allclose(
        np.asarray(out), ref.transpose(0, 2, 1), rtol=1e-4, atol=1e-5
    )


def test_text_encoder_parity():
    import TextEncoder as refTE
    from vits_tpu.models.text_encoder import TextEncoder

    tm = refTE.TextEncoder(30, 12, 16, 32, 2, 2, 3, 0.0)
    tm.eval()
    rng = np.random.default_rng(1)
    x = rng.integers(1, 30, (2, 9))
    t = rng.integers(0, 6, (2, 9))
    lengths = np.array([9, 7])
    with torch.no_grad():
        h_ref, m_ref, logs_ref, mask_ref = tm(
            _to_torch(x).long(), _to_torch(t).long(), _to_torch(lengths).long()
        )

    sd = {f"m.{k}": v for k, v in tm.state_dict().items()}
    params = {"params": C._text_encoder(sd, "m", 2)}
    m = TextEncoder(n_vocab=30, out_channels=12, hidden_channels=16,
                    filter_channels=32, n_heads=2, n_layers=2, kernel_size=3,
                    p_dropout=0.0)
    h, mp, logsp, mask = m.apply(
        params, jnp.asarray(x), jnp.asarray(t), jnp.asarray(lengths)
    )
    np.testing.assert_allclose(
        np.asarray(h), h_ref.numpy().transpose(0, 2, 1), rtol=1e-3, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(mp), m_ref.numpy().transpose(0, 2, 1), rtol=1e-3, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(logsp), logs_ref.numpy().transpose(0, 2, 1), rtol=1e-3,
        atol=1e-4,
    )


def test_coupling_block_parity():
    import ResidualCouplingBlock as refRCB
    from vits_tpu.models.flows import ResidualCouplingBlock

    tm = refRCB.ResidualCouplingBlock(8, 16, 5, 1, 2, n_flows=2, gin_channels=4)
    tm.eval()
    # perturb the zero-init post convs so the flow is non-trivial
    with torch.no_grad():
        for f in tm.flows[::2]:
            f.post.weight.add_(torch.randn_like(f.post.weight) * 0.1)
            f.post.bias.add_(torch.randn_like(f.post.bias) * 0.1)
    rng = np.random.default_rng(2)
    x = rng.standard_normal((2, 10, 8)).astype(np.float32)
    mask = np.ones((2, 10, 1), np.float32)
    g = rng.standard_normal((2, 1, 4)).astype(np.float32)
    with torch.no_grad():
        z_ref = tm(
            _to_torch(x.transpose(0, 2, 1)), _to_torch(mask.transpose(0, 2, 1)),
            g=_to_torch(g.transpose(0, 2, 1)),
        ).numpy()
        x_rec_ref = tm(
            _to_torch(z_ref), _to_torch(mask.transpose(0, 2, 1)),
            g=_to_torch(g.transpose(0, 2, 1)), reverse=True,
        ).numpy()

    sd = {f"m.{k}": v for k, v in tm.state_dict().items()}
    params = {"params": C._coupling_block(sd, "m", 2, 2, True)}
    m = ResidualCouplingBlock(channels=8, hidden_channels=16, kernel_size=5,
                              dilation_rate=1, n_layers=2, n_flows=2,
                              gin_channels=4)
    z = m.apply(params, jnp.asarray(x), jnp.asarray(mask), g=jnp.asarray(g))
    np.testing.assert_allclose(
        np.asarray(z), z_ref.transpose(0, 2, 1), rtol=1e-4, atol=1e-5
    )
    x_rec = m.apply(params, z, jnp.asarray(mask), g=jnp.asarray(g), reverse=True)
    np.testing.assert_allclose(
        np.asarray(x_rec), x_rec_ref.transpose(0, 2, 1), rtol=1e-4, atol=1e-5
    )


def test_hifigan_parity():
    import HiFiGANGenerator as refHG
    from vits_tpu.models.hifigan import HiFiGANGenerator

    tm = refHG.HiFiGANGenerator(
        6, "1", [3], [[1, 3, 5]], [8, 8, 2, 2], 16, [16, 16, 4, 4], gin_channels=4
    )
    tm.eval()
    rng = np.random.default_rng(3)
    x = rng.standard_normal((1, 8, 6)).astype(np.float32)
    g = rng.standard_normal((1, 1, 4)).astype(np.float32)
    with torch.no_grad():
        outs_ref = tm.hier_forward(
            _to_torch(x.transpose(0, 2, 1)), g=_to_torch(g.transpose(0, 2, 1))
        )
        outs_ref = [o.numpy() for o in outs_ref]

    sd = {f"m.{k}": v for k, v in tm.state_dict().items()}
    params = {"params": C._hifigan(sd, "m", 4, 1, 3)}
    m = HiFiGANGenerator(
        initial_channel=6, resblock_type="1", resblock_kernel_sizes=(3,),
        resblock_dilation_sizes=((1, 3, 5),), upsample_rates=(8, 8, 2, 2),
        upsample_initial_channel=16, upsample_kernel_sizes=(16, 16, 4, 4),
        gin_channels=4,
    )
    outs = m.apply(params, jnp.asarray(x), jnp.asarray(g),
                   method=HiFiGANGenerator.hier_forward)
    for o, o_ref in zip(outs, outs_ref):
        np.testing.assert_allclose(
            np.asarray(o), o_ref.transpose(0, 2, 1), rtol=1e-3, atol=1e-4
        )


def test_conv_flow_parity():
    import StochasticDurationPredictor as refSDP
    from vits_tpu.models.flows import ConvFlow

    tm = refSDP.ConvFlow(2, 16, 3, n_layers=2)
    tm.eval()
    with torch.no_grad():
        tm.proj.weight.add_(torch.randn_like(tm.proj.weight) * 0.1)
        tm.proj.bias.add_(torch.randn_like(tm.proj.bias) * 0.1)
    rng = np.random.default_rng(4)
    x = rng.standard_normal((2, 7, 2)).astype(np.float32)
    mask = np.ones((2, 7, 1), np.float32)
    with torch.no_grad():
        y_ref, logdet_ref = tm(
            _to_torch(x.transpose(0, 2, 1)), _to_torch(mask.transpose(0, 2, 1))
        )
        y_ref = y_ref.numpy()
        logdet_ref = logdet_ref.numpy()

    sd = {f"m.{k}": v for k, v in tm.state_dict().items()}
    params = {"params": C._conv_flow(sd, "m", 2)}
    m = ConvFlow(in_channels=2, filter_channels=16, kernel_size=3, n_layers=2)
    y, logdet = m.apply(params, jnp.asarray(x), jnp.asarray(mask))
    np.testing.assert_allclose(
        np.asarray(y), y_ref.transpose(0, 2, 1), rtol=1e-3, atol=1e-4
    )
    np.testing.assert_allclose(np.asarray(logdet), logdet_ref, rtol=1e-3, atol=1e-4)


def test_avocodo_parity():
    import Avocodo as refAV
    from vits_tpu.models.avocodo import AvocodoDiscriminator

    tm = refAV.AvocodoDiscriminator()
    tm.eval()
    rng = np.random.default_rng(5)
    t = 8192
    y = (rng.standard_normal((2, t, 1)) * 0.1).astype(np.float32)
    ys_hat = [
        (rng.standard_normal((2, t // 4, 1)) * 0.1).astype(np.float32),
        (rng.standard_normal((2, t // 2, 1)) * 0.1).astype(np.float32),
        (rng.standard_normal((2, t, 1)) * 0.1).astype(np.float32),
    ]
    with torch.no_grad():
        r_ref, g_ref, fr_ref, fg_ref = tm(
            _to_torch(y.transpose(0, 2, 1)),
            [_to_torch(o.transpose(0, 2, 1)) for o in ys_hat],
        )

    params = {"params": C.convert_discriminator(tm.state_dict())["params"]}
    m = AvocodoDiscriminator()
    r, g_out, fr, fg = m.apply(
        params, jnp.asarray(y), [jnp.asarray(o) for o in ys_hat]
    )
    assert len(r) == len(r_ref) == 7
    for a, b in zip(r, r_ref):
        np.testing.assert_allclose(
            np.asarray(a), b.numpy().transpose(0, 2, 1), rtol=2e-3, atol=2e-4
        )
    for a, b in zip(g_out, g_ref):
        np.testing.assert_allclose(
            np.asarray(a), b.numpy().transpose(0, 2, 1), rtol=2e-3, atol=2e-4
        )


def test_full_synthesizer_conversion_loads():
    """convert_synthesizer maps every reference parameter into our tree with
    matching shapes (the migration contract)."""
    import types

    # the reference's Cython extension isn't built; its maximum_path is not
    # needed to construct the module / read its state_dict
    fake = types.ModuleType("monotonic_align")
    fake.maximum_path = lambda *a, **k: None
    sys.modules.setdefault("monotonic_align", fake)
    import SynthesizerTrn as refST
    from vits_tpu.models.synthesizer import SynthesizerTrn

    kwargs = dict(
        num_chars=30, spec_channels=513, segment_size=2048,
        midi_start=-5, midi_end=75, octave_range=24,
        inter_channels=96, hidden_channels=64, filter_channels=96,
        n_heads=2, n_layers=2, kernel_size=3, p_dropout=0.0,
        resblock="1", resblock_kernel_sizes=[3],
        resblock_dilation_sizes=[[1, 3, 5]],
        upsample_rates=[8, 8, 2, 2], upsample_initial_channel=32,
        upsample_kernel_sizes=[16, 16, 4, 4],
        yin_channels=80, yin_start=15, yin_scope=50, yin_shift_range=15,
        n_speakers=3, gin_channels=16,
    )
    tm = refST.SynthesizerTrn(**kwargs)
    converted = C.convert_synthesizer(
        tm.state_dict(), n_layers_text=2, n_kernels=1, resblock_convs=3,
    )

    m = SynthesizerTrn(**kwargs)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(1, 30, (1, 8)))
    t = jnp.asarray(rng.integers(0, 6, (1, 8)))
    init = m.init(
        jax.random.PRNGKey(0), x, t, jnp.asarray([8]), sid=jnp.asarray([0]),
        rng=jax.random.PRNGKey(1), max_frames=8,
        method=SynthesizerTrn.infer,
    )
    # every init leaf must exist in the converted tree with identical shape
    init_flat = dict(jax.tree_util.tree_flatten_with_path(init)[0])
    conv_flat = dict(jax.tree_util.tree_flatten_with_path(converted)[0])
    # infer-path init does not touch posterior/yin-decoder modules; restrict
    # to the intersection contract: converted covers at least all init leaves
    missing = [
        jax.tree_util.keystr(p) for p in init_flat
        if p not in conv_flat or np.shape(conv_flat[p]) != np.shape(init_flat[p])
    ]
    assert missing == [], missing[:10]

    # and the converted params drive inference to a finite waveform
    wav, _, _ = m.apply(
        converted, x, t, jnp.asarray([8]), sid=jnp.asarray([0]),
        rng=jax.random.PRNGKey(2), max_frames=8, method=SynthesizerTrn.infer,
    )
    assert np.isfinite(np.asarray(wav)).all()


def test_full_inference_parity_zero_noise():
    """The BASELINE north-star parity check: with noise scales at 0 the whole
    inference path (text-enc -> SDP reverse -> length-regulate -> reverse
    flow -> scope crop -> HiFi-GAN decode) is deterministic — identical
    converted weights must produce matching waveforms (mel-L1 < 1e-3)."""
    import types

    fake = types.ModuleType("monotonic_align")
    fake.maximum_path = lambda *a, **k: None
    sys.modules.setdefault("monotonic_align", fake)
    import SynthesizerTrn as refST
    from vits_tpu.models.synthesizer import SynthesizerTrn
    from vits_tpu.ops.stft import mel_spectrogram

    kwargs = dict(
        num_chars=30, spec_channels=513, segment_size=2048,
        midi_start=-5, midi_end=75, octave_range=24,
        inter_channels=96, hidden_channels=64, filter_channels=96,
        n_heads=2, n_layers=2, kernel_size=3, p_dropout=0.0,
        resblock="1", resblock_kernel_sizes=[3],
        resblock_dilation_sizes=[[1, 3, 5]],
        upsample_rates=[8, 8, 2, 2], upsample_initial_channel=32,
        upsample_kernel_sizes=[16, 16, 4, 4],
        # inter - yin must exceed yin for the reference's torch.split to
        # yield exactly two chunks (it relies on the remainder chunk)
        yin_channels=40, yin_start=8, yin_scope=25, yin_shift_range=7,
        n_speakers=3, gin_channels=16,
    )
    tm = refST.SynthesizerTrn(**kwargs)
    tm.eval()
    rng = np.random.default_rng(7)
    x = rng.integers(1, 30, (1, 10))
    t = rng.integers(0, 6, (1, 10))
    with torch.no_grad():
        dec_in_ref, attn_ref, y_mask_ref, _ = tm.infer_pre_decoder(
            _to_torch(x).long(), _to_torch(t).long(),
            _to_torch(np.array([10])).long(), sid=_to_torch(np.array([1])).long(),
            noise_scale=0.0, noise_scale_w=0.0,
        )
        wav_ref = tm.infer_decode_chunk(
            dec_in_ref, sid=_to_torch(np.array([1])).long()
        ).numpy()  # [1, 1, T]

    converted = C.convert_synthesizer(
        tm.state_dict(), n_layers_text=2, n_kernels=1, resblock_convs=3
    )
    m = SynthesizerTrn(**kwargs)
    t_y_ref = wav_ref.shape[-1] // 256
    wav, y_mask, y_len = m.apply(
        converted, jnp.asarray(x), jnp.asarray(t), jnp.asarray([10]),
        sid=jnp.asarray([1]), rng=jax.random.PRNGKey(0),
        noise_scale=0.0, noise_scale_w=0.0, max_frames=max(t_y_ref, 8),
        method=SynthesizerTrn.infer,
    )
    assert int(np.asarray(y_len)[0]) == t_y_ref, (
        int(np.asarray(y_len)[0]), t_y_ref,
    )
    n = t_y_ref * 256
    ours = np.asarray(wav)[0, :n, 0]
    ref = wav_ref[0, 0, :n]
    np.testing.assert_allclose(ours, ref, rtol=1e-2, atol=1e-4)

    # the BASELINE.md criterion: mel-L1 < 1e-3 on identical weights
    mel_ours = np.asarray(
        mel_spectrogram(jnp.asarray(ours[None]), 1024, 80, 22050, 256, 1024, 0.0, None)
    )
    mel_ref = np.asarray(
        mel_spectrogram(jnp.asarray(ref[None]), 1024, 80, 22050, 256, 1024, 0.0, None)
    )
    mel_l1 = np.abs(mel_ours - mel_ref).mean()
    assert mel_l1 < 1e-3, mel_l1


def test_checkpoint_file_migration_end_to_end(tmp_path):
    """The full user migration path: a reference-format Eval .pth file ->
    convert_checkpoint_file CLI -> TTSEngine serves it. Architecture
    hyperparameters are auto-detected from the state-dict keys."""
    import types
    import yaml

    fake = types.ModuleType("monotonic_align")
    fake.maximum_path = lambda *a, **k: None
    sys.modules.setdefault("monotonic_align", fake)
    import SynthesizerTrn as refST
    from vits_tpu.utils.convert_torch import (
        _detect_arch,
        convert_checkpoint_file,
    )

    kwargs = dict(
        num_chars=71, spec_channels=513, segment_size=2048,
        midi_start=-5, midi_end=75, octave_range=24,
        inter_channels=96, hidden_channels=64, filter_channels=96,
        n_heads=2, n_layers=2, kernel_size=3, p_dropout=0.0,
        resblock="1", resblock_kernel_sizes=[3],
        resblock_dilation_sizes=[[1, 3, 5]],
        upsample_rates=[8, 8, 2, 2], upsample_initial_channel=32,
        upsample_kernel_sizes=[16, 16, 4, 4],
        yin_channels=80, yin_start=15, yin_scope=50, yin_shift_range=15,
        n_speakers=3, gin_channels=16,
    )
    tm = refST.SynthesizerTrn(**kwargs)
    arch = _detect_arch(tm.state_dict())
    assert arch == dict(
        n_layers_text=2, n_ups=4, n_kernels=1, resblock_convs=3
    ), arch
    pth = tmp_path / "Model_Eval_4242.pth"
    torch.save({"model_g": tm.state_dict()}, str(pth))

    out = convert_checkpoint_file(str(pth), str(tmp_path / "converted"))
    assert out.endswith("eval_4242")

    cfg = {
        "train": {"segment_size": 2048},
        "data": {
            "sampling_rate": 22050, "filter_length": 1024, "hop_length": 256,
            "win_length": 1024, "n_mel_channels": 80, "mel_fmin": 0.0,
            "mel_fmax": None, "add_blank": True, "speakers": ["A", "B", "C"],
            "midi_start": -5, "midi_end": 75, "midis": 80,
            "ying_window": 2048, "ying_hop": 256, "tau_max": 2048,
            "octave_range": 24,
        },
        "model": {
            "inter_channels": 96, "hidden_channels": 64,
            "filter_channels": 96, "n_heads": 2, "n_layers": 2,
            "kernel_size": 3, "p_dropout": 0.0, "resblock": "1",
            "resblock_kernel_sizes": [3],
            "resblock_dilation_sizes": [[1, 3, 5]],
            "upsample_rates": [8, 8, 2, 2], "upsample_initial_channel": 32,
            "upsample_kernel_sizes": [16, 16, 4, 4], "gin_channels": 16,
            "yin_channels": 80, "yin_start": 15, "yin_scope": 50,
            "yin_shift_range": 15,
        },
    }
    cfg_path = tmp_path / "cfg.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))

    from vits_tpu.serve.engine import TTSEngine

    eng = TTSEngine(str(cfg_path), checkpoint_path=out, max_frames=96)
    phones, (sr, audio) = eng.synthesize("[P]ni3#hao3[P]", 1, seed=3)
    assert sr == 22050 and len(audio) > 0
    assert np.isfinite(audio).all()
