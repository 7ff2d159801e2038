from vits_tpu.ops.commons import (
    sequence_mask,
    generate_path,
    slice_segments,
    rand_slice_segments_for_cat,
    intersperse_with_language_id,
)
from vits_tpu.ops.stft import spectrogram, spec_to_mel, mel_spectrogram, mel_filterbank
from vits_tpu.ops.yin import Yingram
from vits_tpu.ops.mas import maximum_path
