"""Fast serving-layer tests (no model build): phoneme prep + text bucketing."""

import numpy as np

from vits_tpu.serve.engine import TTSEngine
from vits_tpu.text import cleaned_text_to_sequence
from vits_tpu.text.cleaners import clean_text
from vits_tpu.ops.commons import intersperse_with_language_id


def test_bucket_selection():
    buckets = TTSEngine.TEXT_BUCKETS
    assert buckets == (64, 128, 256, 384)
    # mimic _bucket without constructing the engine
    def bucket(n):
        for b in buckets:
            if n <= b:
                return b
        return buckets[-1]

    assert bucket(1) == 64
    assert bucket(64) == 64
    assert bucket(65) == 128
    assert bucket(400) == 384  # overlong text is truncated to the last bucket


def test_phoneme_prep_matches_training_path():
    """Serving text prep must equal the dataset's text prep
    (blank-interleave contract)."""
    text = "[P]ni3#hao3[P]"
    cleaned, lang = clean_text(text)
    seq = cleaned_text_to_sequence(cleaned)
    seq_i, lang_i = intersperse_with_language_id(seq, lang, 0)
    assert len(seq_i) == 2 * len(seq) + 1
    assert seq_i[::2] == [0] * (len(seq) + 1)
    assert all(la in (0, 1, 3) for la in lang_i)
