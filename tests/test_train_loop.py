"""Integration: full training loop on a synthetic dataset — checkpointing,
resume, eval, TB logging. Uses a shrunken config to keep CPU compile time
manageable."""

import os

import numpy as np
import pytest
import scipy.io.wavfile
import yaml

import jax

from vits_tpu.config import get_hparams
from vits_tpu.training.train import run


TINY_CONFIG = {
    "train": {
        "log_interval": 1,
        "eval_interval": 2,
        "save_interval": 2,
        "seed": 1234,
        "epochs": 1,
        "learning_rate": 2.0e-4,
        "betas": [0.8, 0.99],
        "eps": 1.0e-9,
        "batch_size": 2,
        "bf16_run": False,
        "lr_decay": 0.999875,
        "segment_size": 2048,
        "c_mel": 45,
        "c_kl": 1.0,
        "c_yin": 45.0,
        "keep_ckpts": 2,
    },
    "data": {
        "data_path": "",
        "training_files": "",
        "validation_files": "",
        "sampling_rate": 22050,
        "filter_length": 1024,
        "hop_length": 256,
        "win_length": 1024,
        "n_mel_channels": 80,
        "mel_fmin": 0.0,
        "mel_fmax": None,
        "add_blank": True,
        "speakers": ["S0", "S1"],
        "midi_start": -5,
        "midi_end": 75,
        "midis": 80,
        "ying_window": 2048,
        "ying_hop": 256,
        "tau_max": 2048,
        "octave_range": 24,
        "bucket_boundaries": [16, 64],
        "max_text_len": 20,
        "min_text_len": 1,
    },
    "model": {
        "inter_channels": 96,
        "hidden_channels": 48,
        "filter_channels": 64,
        "n_heads": 2,
        "n_layers": 1,
        "kernel_size": 3,
        "p_dropout": 0.1,
        "resblock": "1",
        "resblock_kernel_sizes": [3],
        "resblock_dilation_sizes": [[1, 3]],
        "upsample_rates": [8, 8, 2, 2],
        "upsample_initial_channel": 32,
        "upsample_kernel_sizes": [16, 16, 4, 4],
        "gin_channels": 16,
        "yin_channels": 80,
        "yin_start": 15,
        "yin_scope": 50,
        "yin_shift_range": 15,
        "posterior_layers": 2,
        "flow_n_flows": 1,
        "flow_wn_layers": 1,
        "dur_n_flows": 1,
        "yin_dec_layers": 2,
        "discriminator_size": "probe",
    },
}


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    d = tmp_path_factory.mktemp("trainrun")
    rng = np.random.default_rng(0)
    lines = []
    for i in range(4):
        n = 48 * 256  # 48 frames, bucket (16, 64]
        wav = (rng.standard_normal(n) * 2000).astype(np.int16)
        path = d / f"utt{i}.wav"
        scipy.io.wavfile.write(path, 22050, wav)
        text = "ni→xɑʊ↓↑"
        lang = " ".join(["0"] * len(text))
        lines.append(f"{path}|S{i % 2}|{text}|{lang}")
    (d / "train.csv").write_text("\n".join(lines))
    (d / "val.csv").write_text("\n".join(lines[:2]))

    cfg = dict(TINY_CONFIG)
    cfg["data"] = dict(cfg["data"])
    cfg["data"]["data_path"] = str(d)
    cfg["data"]["training_files"] = str(d / "train.csv")
    cfg["data"]["validation_files"] = str(d / "val.csv")
    cfg_path = d / "config.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))
    return d, str(cfg_path)


def test_train_loop_end_to_end(workdir):
    d, cfg_path = workdir
    model_dir = str(d / "run")
    hps = get_hparams(cfg_path, model_dir)
    run(hps)

    # checkpoints written (2 steps/epoch, save_interval=2 -> step 2)
    names = os.listdir(model_dir)
    assert any(n.startswith("train_") for n in names), names
    assert any(n.startswith("eval_") for n in names), names
    # TB event file + log + config snapshot + githash
    assert any("tfevents" in n for n in names)
    assert "config.yaml" in names
    assert "train.log" in names

    # resume: epochs=2 continues from saved state without error
    hps2 = get_hparams(cfg_path, model_dir)
    hps2.train.epochs = 2
    run(hps2)
    steps = sorted(
        int(n.split("_")[1]) for n in os.listdir(model_dir) if n.startswith("train_")
    )
    assert steps[-1] >= 4
