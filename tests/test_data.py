"""Data pipeline tests: wav IO, feature caching, bucketing, static collate."""

import os

import numpy as np
import pytest
import scipy.io.wavfile

from vits_tpu.data.dataset import (
    DatasetConfig,
    TextAudioSpeakerDataset,
    DistributedBucketSampler,
    collate_static,
    DataIterator,
    load_wav,
    _spectrogram_numpy,
)


@pytest.fixture(scope="module")
def dataset_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("data")
    rng = np.random.default_rng(0)
    lines = []
    for i, n_frames in enumerate([40, 60, 80, 120]):
        n = n_frames * 256
        wav = (rng.standard_normal(n) * 3000).astype(np.int16)
        path = d / f"utt{i}.wav"
        scipy.io.wavfile.write(path, 22050, wav)
        # pre-cleaned text: IPA + space-joined lang ids
        text = "ni→xɑʊ↓↑"
        lang = " ".join(["0"] * len(text))
        lines.append(f"{path}|SPK{i % 2}|{text}|{lang}")
    filelist = d / "train.clr.csv"
    filelist.write_text("\n".join(lines))
    return d, str(filelist)


def test_load_wav_int16(dataset_dir):
    d, _ = dataset_dir
    audio, sr = load_wav(str(d / "utt0.wav"))
    assert sr == 22050
    assert audio.dtype == np.float32
    assert np.abs(audio).max() <= 1.0


def test_dataset_items_and_cache(dataset_dir):
    d, filelist = dataset_dir
    cfg = DatasetConfig(data_path=str(d), speakers=("SPK0", "SPK1"))
    ds = TextAudioSpeakerDataset(filelist, cfg)
    assert len(ds) == 4
    item = ds[0]
    assert item["spec"].shape[1] == 513
    assert item["ying"].shape[1] == 80
    # spec/ying frame counts match (same hop, aligned padding)
    assert abs(item["spec"].shape[0] - item["ying"].shape[0]) <= 1
    assert item["text"].shape == item["lang"].shape
    # blank-interleaved: odd length 2n+1
    assert item["text"].shape[0] % 2 == 1
    # caches got written next to wavs
    assert any(f.endswith(".spec.npy") for f in os.listdir(d))
    assert any(f.endswith(".ying.npy") for f in os.listdir(d))
    # second load uses cache and matches
    item2 = ds[0]
    np.testing.assert_array_equal(item["spec"], item2["spec"])


def test_spectrogram_numpy_matches_jax(dataset_dir):
    d, _ = dataset_dir
    audio, _ = load_wav(str(d / "utt0.wav"))
    import jax.numpy as jnp
    from vits_tpu.ops.stft import spectrogram

    ref = np.asarray(spectrogram(jnp.asarray(audio[None]), 1024, 256, 1024))[0]
    ours = _spectrogram_numpy(audio, 1024, 256, 1024)
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-4)


def test_bucket_sampler_contract():
    lengths = [10, 50, 80, 120, 130, 300, 310, 320, 500]
    sampler = DistributedBucketSampler(
        lengths, batch_size=2, boundaries=[32, 150, 400, 600],
        num_replicas=1, rank=0, shuffle=True,
    )
    batches = list(sampler)
    seen = set()
    for bucket_idx, batch in batches:
        assert len(batch) == 2
        bound = sampler.bucket_bound(bucket_idx)
        for idx in batch:
            assert lengths[idx] <= bound
            seen.add(idx)
    # short outlier (10 < 32) is dropped per reference semantics
    assert 0 not in seen
    # deterministic per epoch
    sampler.set_epoch(0)
    b1 = list(sampler)
    sampler.set_epoch(0)
    b2 = list(sampler)
    assert b1 == b2
    sampler.set_epoch(1)
    assert list(sampler) != b1


def test_bucket_sampler_rank_partition():
    lengths = [50] * 16
    parts = []
    for rank in range(2):
        s = DistributedBucketSampler(
            lengths, batch_size=2, boundaries=[32, 150],
            num_replicas=2, rank=rank, shuffle=False,
        )
        for _, batch in s:
            parts.extend(batch)
    assert sorted(parts) == list(range(16))  # disjoint cover


def test_collate_static_shapes(dataset_dir):
    d, filelist = dataset_dir
    cfg = DatasetConfig(data_path=str(d), speakers=("SPK0", "SPK1"))
    ds = TextAudioSpeakerDataset(filelist, cfg)
    items = [ds[i] for i in range(3)]
    batch = collate_static(items, frame_bound=150, hop_length=256, text_bound=64)
    assert batch["spec"].shape == (3, 150, 513)
    assert batch["ying"].shape == (3, 150, 80)
    assert batch["wav"].shape == (3, 150 * 256, 1)
    assert batch["x"].shape == (3, 64)
    # sorted by spec length desc
    assert (np.diff(batch["spec_lengths"]) <= 0).all()


def test_data_iterator(dataset_dir):
    d, filelist = dataset_dir
    cfg = DatasetConfig(data_path=str(d), speakers=("SPK0", "SPK1"))
    ds = TextAudioSpeakerDataset(filelist, cfg)
    sampler = DistributedBucketSampler(
        ds.lengths, batch_size=2, boundaries=[32, 150, 400],
        num_replicas=1, rank=0, shuffle=True,
    )
    it = DataIterator(ds, sampler, text_bound=64, num_workers=2)
    batches = list(it)
    assert len(batches) == len(sampler)
    for b in batches:
        assert b["x"].shape[0] == 2
        assert np.isfinite(b["spec"]).all()
