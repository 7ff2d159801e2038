"""Serving engine: text -> phonemes -> waveform, with pitch/duration control.

Behavioral reference: /root/reference/app.py:32-87 (PITS demo inference:
get_phoneme -> infer_pre_decoder(noise 0.667/0.8) -> infer_decode_chunk,
scope-shift slider -15..15, duration multiplier 0.5-2).

TPU-first: synthesis is a single jitted program per (text-bucket,
frame-budget) pair; text is padded to a small set of bucket lengths so
arbitrary inputs hit a warm compile cache. Scope shift and seed are traced
arguments — sweeping them never recompiles. Batched serving
(`synthesize_batch`, used by serve.batcher.DynamicBatcher) vmaps the
single-request program with PER-ROW PRNG keys, so each request's audio is
bit-independent of what it happened to be batched with.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from vits_tpu.config import load_hparams, synthesizer_kwargs
from vits_tpu.models.synthesizer import SynthesizerTrn
from vits_tpu.ops.commons import intersperse_with_language_id
from vits_tpu.text import cleaned_text_to_sequence
from vits_tpu.text.cleaners import clean_text
from vits_tpu.text.symbols import symbols


class TTSEngine:
    """Loads a config + eval checkpoint and synthesizes speech.

    Arbitrary-length input: text pads up to TEXT_BUCKETS (one warm compile
    per bucket); text longer than the largest bucket is split at phrase
    boundaries and the pieces are synthesized and concatenated — nothing is
    silently truncated. The frame budget escalates through FRAME_BUCKETS
    when the duration predictor wants more than the current budget.
    """

    TEXT_BUCKETS = (64, 128, 256, 384)
    FRAME_BUCKETS = (256, 512, 1000, 2000)

    def __init__(
        self,
        config_path: str,
        checkpoint_path: str | None = None,
        max_frames: int = 1000,
        bf16: bool = False,
    ):
        """bf16=True runs the HBM/FLOP-heavy submodules (decoder, WaveNet
        stacks, posterior encoders) in bfloat16 at inference; params stay
        f32 so any checkpoint loads unchanged. Throughput option for
        serving — output differs from f32 at bf16 rounding level."""
        from vits_tpu.utils.compilation_cache import enable_persistent_cache

        enable_persistent_cache()
        self.hps = load_hparams(config_path)
        self.model = SynthesizerTrn(
            **synthesizer_kwargs(self.hps, len(symbols)), bf16=bf16
        )
        self.max_frames = max_frames
        self.sampling_rate = self.hps.data.sampling_rate
        self.hop = self.hps.data.hop_length

        x0 = jnp.zeros((1, 16), jnp.int32)
        model = self.model
        init_fn = jax.jit(
            lambda key, x, xl, sid, r: model.init(
                key, x, x, xl, sid=sid, rng=r, max_frames=16,
                method=SynthesizerTrn.infer,
            )
        )
        params = init_fn(
            jax.random.PRNGKey(0), x0, jnp.asarray([16]), jnp.asarray([0]),
            jax.random.PRNGKey(1),
        )
        if checkpoint_path is not None:
            from vits_tpu.training.checkpoint import load_eval_params

            # raw restore: the saved tree covers the full generator (incl.
            # posterior encoders / yin decoder used by VC + eval paths)
            params = {"params": load_eval_params(checkpoint_path)}
        # commit to device ONCE: the raw orbax restore is host numpy, and
        # numpy args are re-uploaded on EVERY jitted call (~140 MB of
        # weights per request — measured 1.7 s/request over the TPU
        # tunnel before this line, ~60 ms after)
        self.params = jax.device_put(params)

        model = self.model

        # scope_shift is TRACED (dynamic-slice crop): the -15..15 UI
        # slider reuses one compiled program per (text, frame) bucket
        # instead of forcing up to ~120 distinct compiles
        @functools.partial(jax.jit, static_argnames=("max_frames",))
        def _synth(params, x, t, x_lengths, sid, seed, duration, scope_shift,
                   max_frames):
            # key built IN-GRAPH: a host-side PRNGKey is its own tiny device
            # program (~tens of ms per dispatch on a tunneled TPU)
            key = jax.random.PRNGKey(seed)
            return model.apply(
                params, x, t, x_lengths, sid=sid, rng=key,
                noise_scale=0.667, noise_scale_w=0.8, length_scale=duration,
                max_frames=max_frames, scope_shift=scope_shift,
                method=SynthesizerTrn.infer,
            )

        self._synth_fn = _synth

        @functools.partial(jax.jit, static_argnames=("max_frames",))
        def _pre_decoder(params, x, t, x_lengths, sid, seed, duration,
                         scope_shift, max_frames):
            key = jax.random.PRNGKey(seed)
            return model.apply(
                params, x, t, x_lengths, sid=sid, rng=key,
                noise_scale=0.667, noise_scale_w=0.8,
                length_scale=duration, max_frames=max_frames,
                scope_shift=scope_shift,
                method=SynthesizerTrn.infer_pre_decoder,
            )

        self._pre_decoder_fn = _pre_decoder
        # one decoder program shared by every synthesize_chunked call
        self._decode_fn = jax.jit(
            lambda p, z, sid: model.apply(
                p, z, sid=sid, method=SynthesizerTrn.infer_decode_chunk
            )
        )

        # batched synthesis: vmap of the single-request program with a
        # PER-ROW key (PRNGKey(seed_i) folded in-graph) — request i's audio
        # is identical whether it runs alone or inside any batch, which is
        # the determinism contract dynamic batching needs
        @functools.partial(jax.jit, static_argnames=("max_frames",))
        def _synth_batch(params, x, t, x_lengths, sid, seeds, durations,
                         scope_shifts, max_frames):
            def one(x_r, t_r, xl_r, sid_r, seed_r, dur_r, shift_r):
                key = jax.random.PRNGKey(seed_r)
                wav, y_mask, y_len = model.apply(
                    params, x_r[None], t_r[None], xl_r[None],
                    sid=sid_r[None], rng=key,
                    noise_scale=0.667, noise_scale_w=0.8,
                    length_scale=dur_r, max_frames=max_frames,
                    scope_shift=shift_r, method=SynthesizerTrn.infer,
                )
                return wav[0], y_len[0]

            return jax.vmap(one)(
                x, t, x_lengths, sid, seeds, durations, scope_shifts
            )

        self._synth_batch_fn = _synth_batch

    def get_phoneme(self, text: str):
        """Tagged text -> (ids, lang ids, IPA string) (reference app.py:48-58)."""
        cleaned_text, lang = clean_text(text)
        seq = cleaned_text_to_sequence(cleaned_text)
        if not seq:
            raise ValueError(
                "empty phoneme sequence — input must contain language-tagged "
                "blocks like [EN]...[EN], [ZH]...[ZH], [JA]...[JA], [P]...[P]"
            )
        if self.hps.data.add_blank:
            seq, lang = intersperse_with_language_id(seq, lang, 0)
        return np.asarray(seq, np.int32), np.asarray(lang, np.int32), cleaned_text

    def _bucket(self, n: int) -> int:
        for b in self.TEXT_BUCKETS:
            if n <= b:
                return b
        return self.TEXT_BUCKETS[-1]

    def _frame_buckets(self) -> list[int]:
        buckets = sorted({b for b in self.FRAME_BUCKETS if b < self.max_frames})
        return buckets + [self.max_frames]

    def _split_segments(self, seq, lang, limit: int):
        """Split an over-long phoneme sequence at phrase boundaries (after
        punctuation, else at spaces, else hard) so every piece fits a text
        bucket — replaces the silent truncation the round-1 engine had."""
        from vits_tpu.text.symbols import symbols as _symbols

        punct = {
            _symbols.index(c) for c in ",.!?…~-" if c in _symbols
        }
        space = _symbols.index(" ")
        segments = []
        start = 0
        n = len(seq)
        while n - start > limit:
            window = range(start + limit - 1, start, -1)
            cut = next((i for i in window if int(seq[i]) in punct), None)
            if cut is None:
                cut = next((i for i in window if int(seq[i]) == space), None)
            cut = (cut + 1) if cut is not None else start + limit
            segments.append((seq[start:cut], lang[start:cut]))
            start = cut
        segments.append((seq[start:], lang[start:]))
        return [(s, la) for s, la in segments if len(s) > 0]

    def _synth_segment(self, seq, lang, speaker_id, seed, scope_shift,
                       duration):
        """One bucketed jitted synthesis; frame budget escalates through
        FRAME_BUCKETS when the predicted length hits the current budget."""
        n = len(seq)
        tx = self._bucket(n)
        x = np.zeros((1, tx), np.int32)
        t = np.zeros((1, tx), np.int32)
        x[0, :n] = seq
        t[0, :n] = lang
        args = (
            self.params, jnp.asarray(x), jnp.asarray(t), jnp.asarray([n]),
            jnp.asarray([speaker_id]), jnp.uint32(seed),
            jnp.float32(duration),
        )
        want = int(n * 6 * max(duration, 0.25))
        buckets = self._frame_buckets()
        frames = next((b for b in buckets if b >= want), buckets[-1])
        while True:
            wav, y_mask, y_len = self._synth_fn(
                *args, scope_shift=jnp.int32(scope_shift), max_frames=frames
            )
            y_len = int(np.asarray(y_len)[0])
            if y_len < frames or frames == buckets[-1]:
                break
            frames = next(b for b in buckets if b > frames)
        return np.asarray(wav)[0, : y_len * self.hop, 0]

    def synthesize(
        self,
        text: str,
        speaker_id: int = 0,
        seed: int = 0,
        scope_shift: int = 0,
        duration: float = 1.0,
    ):
        """Returns (ipa_string, (sampling_rate, waveform np.ndarray)).

        Never truncates: long inputs are split at phrase boundaries and the
        pieces concatenated (reference app.py synthesizes single phrases)."""
        seq, lang, phones = self.get_phoneme(text)
        pieces = [
            self._synth_segment(s, la, speaker_id, seed + i, scope_shift,
                                duration)
            for i, (s, la) in enumerate(
                self._split_segments(seq, lang, self.TEXT_BUCKETS[-1])
            )
        ]
        audio = (
            np.concatenate(pieces) if pieces else np.zeros(0, np.float32)
        )
        return phones, (self.sampling_rate, audio)

    BATCH_BUCKETS = (1, 2, 4, 8)

    def synthesize_batch(self, requests: list[dict]):
        """Batched synthesis for dynamic-batching servers.

        requests: list of dicts with keys text, and optionally speaker_id,
        seed, scope_shift, duration. Returns a list in request order whose
        entries are np.float32 waveforms, or the per-request Exception for
        entries that failed (a bad request never poisons its batchmates). Requests are grouped by (text-bucket,
        frame-bucket), padded up to BATCH_BUCKETS, and run through the
        vmapped program; per-row PRNG keys make each result independent of
        batch composition. Requests whose phoneme sequence exceeds the
        largest text bucket fall back to the phrase-splitting single path.
        """
        results: list[np.ndarray | Exception | None] = [None] * len(requests)
        groups: dict[tuple[int, int], list] = {}
        for i, req in enumerate(requests):
            try:
                seq, lang, _ = self.get_phoneme(req["text"])
            except Exception as e:
                # a bad request (e.g. untagged text) must not poison its
                # batchmates: it yields its exception in the result slot
                results[i] = e
                continue
            if len(seq) > self.TEXT_BUCKETS[-1]:
                _, (_, audio) = self.synthesize(
                    req["text"], req.get("speaker_id", 0), req.get("seed", 0),
                    req.get("scope_shift", 0), req.get("duration", 1.0),
                )
                results[i] = audio
                continue
            dur = float(req.get("duration", 1.0))
            tx = self._bucket(len(seq))
            want = int(len(seq) * 6 * max(dur, 0.25))
            buckets = self._frame_buckets()
            frames = next((b for b in buckets if b >= want), buckets[-1])
            groups.setdefault((tx, frames), []).append((i, seq, lang, req))

        for (tx, frames), items in groups.items():
            n = len(items)
            nb = next(b for b in self.BATCH_BUCKETS if b >= n) if (
                n <= self.BATCH_BUCKETS[-1]
            ) else n  # oversize flush: compile for the exact size
            x = np.zeros((nb, tx), np.int32)
            t = np.zeros((nb, tx), np.int32)
            xl = np.ones(nb, np.int32)
            sid = np.zeros(nb, np.int32)
            seeds = np.zeros(nb, np.uint32)
            durs = np.ones(nb, np.float32)
            shifts = np.zeros(nb, np.int32)
            for row, (i, seq, lang, req) in enumerate(items):
                m = len(seq)
                x[row, :m] = seq
                t[row, :m] = lang
                xl[row] = m
                sid[row] = int(req.get("speaker_id", 0))
                seeds[row] = int(req.get("seed", 0)) & 0xFFFFFFFF
                durs[row] = float(req.get("duration", 1.0))
                shifts[row] = int(req.get("scope_shift", 0))
            wavs, y_lens = self._synth_batch_fn(
                self.params, jnp.asarray(x), jnp.asarray(t), jnp.asarray(xl),
                jnp.asarray(sid), jnp.asarray(seeds), jnp.asarray(durs),
                jnp.asarray(shifts), max_frames=frames,
            )
            wavs = np.asarray(wavs)
            y_lens = np.asarray(y_lens)
            for row, (i, seq, lang, req) in enumerate(items):
                n_smp = int(y_lens[row]) * self.hop
                audio = wavs[row, :n_smp, 0]
                if int(y_lens[row]) >= frames and frames < self._frame_buckets()[-1]:
                    # frame budget saturated: redo this one via the
                    # escalating single-request path
                    _, (_, audio) = self.synthesize(
                        req["text"], req.get("speaker_id", 0),
                        req.get("seed", 0), req.get("scope_shift", 0),
                        req.get("duration", 1.0),
                    )
                results[i] = audio
        return results

    def synthesize_chunked(
        self,
        text: str,
        speaker_id: int = 0,
        seed: int = 0,
        scope_shift: int = 0,
        duration: float = 1.0,
        chunk_frames: int = 128,
        overlap_frames: int = 16,
    ):
        """Long-form synthesis with bounded decoder memory.

        Runs the staged path once (text-enc -> durations -> length-regulate ->
        reverse flow, reference SynthesizerTrn.py:325-373), then decodes the
        latent in fixed-size chunks with overlap margins that cover the
        HiFi-GAN receptive field, trimming the margins after decode
        (`infer_decode_chunk`, reference :438-443). Chunks share one compiled
        program, so memory stays O(chunk) regardless of text length.
        """
        phones, chunks = self._chunk_stream(
            text, speaker_id, seed, scope_shift, duration,
            chunk_frames, overlap_frames,
        )
        audio_pieces = list(chunks)
        audio = (
            np.concatenate(audio_pieces)
            if audio_pieces
            else np.zeros(0, np.float32)
        )
        return phones, (self.sampling_rate, audio)

    def synthesize_streaming(
        self,
        text: str,
        speaker_id: int = 0,
        seed: int = 0,
        scope_shift: int = 0,
        duration: float = 1.0,
        chunk_frames: int = 128,
        overlap_frames: int = 16,
    ):
        """Streaming synthesis: returns (ipa_string, chunk_iterator).

        The iterator yields np.float32 audio chunks (chunk_frames*hop
        samples each, except the last) as they come off the device; the
        first chunk arrives after one text-encode + one chunk decode
        instead of the full utterance — the time-to-first-audio win the
        staged reference API (`infer_pre_lr`/`infer_lr`/..., reference
        SynthesizerTrn.py:375-443) exists for. Concatenating all chunks is
        bit-identical to synthesize_chunked."""
        return self._chunk_stream(
            text, speaker_id, seed, scope_shift, duration,
            chunk_frames, overlap_frames,
        )

    def _chunk_stream(
        self, text, speaker_id, seed, scope_shift, duration,
        chunk_frames, overlap_frames,
    ):
        seq_all, lang_all, phones = self.get_phoneme(text)
        segments = self._split_segments(
            seq_all, lang_all, self.TEXT_BUCKETS[-1]
        )
        return phones, self._chunk_iter(
            segments, speaker_id, seed, scope_shift, duration,
            chunk_frames, overlap_frames,
        )

    def _chunk_iter(
        self, segments, speaker_id, seed, scope_shift, duration,
        chunk_frames, overlap_frames,
    ):
        sid_arr = jnp.asarray([speaker_id])
        for seg_i, (seq, lang) in enumerate(segments):
            n = len(seq)
            tx = self._bucket(n)
            x = np.zeros((1, tx), np.int32)
            t = np.zeros((1, tx), np.int32)
            x[0, :n] = seq
            t[0, :n] = lang
            args = (
                self.params, jnp.asarray(x), jnp.asarray(t),
                jnp.asarray([n]), sid_arr, jnp.uint32(seed + seg_i),
                jnp.float32(duration),
            )
            buckets = self._frame_buckets()
            want = int(n * 6 * max(duration, 0.25))
            frames = next((b for b in buckets if b >= want), buckets[-1])
            while True:
                dec_inputs, y_mask, y_lengths, _ = self._pre_decoder_fn(
                    *args, scope_shift=jnp.int32(scope_shift), max_frames=frames
                )
                total = int(np.asarray(y_lengths)[0])
                if total < frames or frames == buckets[-1]:
                    break
                frames = next(b for b in buckets if b > frames)
            dec_inputs = np.asarray(dec_inputs)[0]  # [T, C]

            # dispatch ahead (async), fetch behind — decodes pipeline on
            # device while earlier chunks stream to the caller
            pending = []
            pos = 0
            while pos < total:
                lo = max(0, pos - overlap_frames)
                hi = min(total, pos + chunk_frames + overlap_frames)
                window = np.zeros(
                    (1, chunk_frames + 2 * overlap_frames,
                     dec_inputs.shape[-1]),
                    np.float32,
                )
                window[0, : hi - lo] = dec_inputs[lo:hi]
                start = (pos - lo) * self.hop
                end = start + min(chunk_frames, total - pos) * self.hop
                pending.append((
                    self._decode_fn(self.params, jnp.asarray(window), sid_arr),
                    start, end,
                ))
                pos += chunk_frames
            for wav_chunk, start, end in pending:
                yield np.asarray(wav_chunk)[0, start:end, 0]

    # audio-length buckets for the jitted VC program (samples; multiples of
    # hop so the yingram pad arithmetic stays static) — ~1.5 s to ~24 s
    VC_BUCKETS = (32768, 65536, 131072, 262144, 524288)

    def _vc_jit(self):
        """One jitted program covering STFT + yingram + flow VC end-to-end
        (the round-1 path ran all of it eagerly: hundreds of per-op
        dispatches per call). Shape-specializes per VC_BUCKET."""
        if getattr(self, "_vc_fn", None) is not None:
            return self._vc_fn
        from vits_tpu.ops.stft import spectrogram
        from vits_tpu.ops.yin import Yingram

        hps = self.hps
        model = self.model
        hop = hps.data.hop_length
        yingram = Yingram(
            hps.data.sampling_rate, hop, 2048,
            hps.data.tau_max, hps.data.midi_start, hps.data.midi_end,
            hps.data.octave_range,
        )
        left = hps.data.filter_length - hop

        @jax.jit
        def _vc(params, wav_b, frames_valid, sid_src, sid_tgt, seed):
            spec = spectrogram(
                wav_b, hps.data.filter_length, hop, hps.data.win_length
            )
            # wav_b length is a bucket multiple of hop -> right pad static
            ying = yingram(jnp.pad(wav_b, ((0, 0), (left, left + hop))))
            frames = min(spec.shape[1], ying.shape[1])
            o_hat, _, _ = model.apply(
                params, spec[:, :frames], ying[:, :frames],
                jnp.minimum(frames_valid, frames), sid_src, sid_tgt,
                rng=jax.random.PRNGKey(seed),
                method=SynthesizerTrn.voice_conversion,
            )
            return o_hat

        self._vc_fn = _vc
        return _vc

    # samples of overlap between successive VC windows (hop-aligned);
    # seams are linearly cross-faded
    VC_OVERLAP = 8192

    def voice_conversion(self, wav: np.ndarray, sid_src: int, sid_tgt: int, seed: int = 0):
        """Waveform -> target-speaker waveform via the shared flow.

        Input pads up to VC_BUCKETS (one warm compile per bucket); the
        padded tail is masked out via the true frame count and trimmed.
        Audio longer than the largest bucket is converted in overlapping
        bucket-sized windows and cross-faded at the seams — nothing is
        silently truncated."""
        n = len(wav)
        limit = self.VC_BUCKETS[-1]
        if n <= limit:
            return self._vc_window(wav, sid_src, sid_tgt, seed)
        step = limit - self.VC_OVERLAP
        out = np.zeros(n, np.float32)
        weight = np.zeros(n, np.float32)
        ramp = np.linspace(0.0, 1.0, self.VC_OVERLAP, dtype=np.float32)
        for start in range(0, n, step):
            piece = wav[start : start + limit]
            conv = self._vc_window(piece, sid_src, sid_tgt, seed)
            m = len(conv)
            w = np.ones(m, np.float32)
            if start > 0:
                w[: self.VC_OVERLAP] = ramp[:m]
            if start + limit < n:
                w[-self.VC_OVERLAP :] = ramp[::-1][-m:]
            out[start : start + m] += conv * w
            weight[start : start + m] += w
            if start + limit >= n:
                break
        return out / np.maximum(weight, 1e-8)

    def _vc_window(self, wav: np.ndarray, sid_src: int, sid_tgt: int, seed: int):
        hop = self.hps.data.hop_length
        n = len(wav)
        bucket = next(
            (b for b in self.VC_BUCKETS if b >= n), self.VC_BUCKETS[-1]
        )
        wav_p = np.zeros((1, bucket), np.float32)
        m = min(n, bucket)
        wav_p[0, :m] = wav[:m]
        true_frames = m // hop
        o_hat = self._vc_jit()(
            self.params, jnp.asarray(wav_p), jnp.asarray([true_frames]),
            jnp.asarray([sid_src]), jnp.asarray([sid_tgt]), jnp.uint32(seed),
        )
        return np.asarray(o_hat)[0, : true_frames * hop, 0]


def main():
    import argparse

    import scipy.io.wavfile

    parser = argparse.ArgumentParser(description="vits_tpu synthesis CLI")
    parser.add_argument("-c", "--config", required=True)
    parser.add_argument("-p", "--checkpoint", default=None,
                        help="eval checkpoint dir (eval_{step})")
    parser.add_argument("-t", "--text", required=True,
                        help="tagged text, e.g. '[EN]hello[EN]'")
    parser.add_argument("-o", "--output", default="out.wav")
    parser.add_argument("-s", "--speaker", type=int, default=0)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--scope-shift", type=int, default=0)
    parser.add_argument("--duration", type=float, default=1.0)
    parser.add_argument("--bf16", action="store_true",
                        help="bfloat16 compute in the heavy submodules")
    args = parser.parse_args()

    engine = TTSEngine(args.config, args.checkpoint, bf16=args.bf16)
    phones, (sr, audio) = engine.synthesize(
        args.text, args.speaker, args.seed, args.scope_shift, args.duration
    )
    scipy.io.wavfile.write(args.output, sr, audio)
    print(f"phonemes: {phones}")
    print(f"wrote {args.output} ({len(audio) / sr:.2f}s @ {sr} Hz)")


if __name__ == "__main__":
    main()
