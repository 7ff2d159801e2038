"""Japanese g2p: text -> romaji with pitch-accent arrows -> IPA.

Behavioral reference: /root/reference/text/japanese.py. With pyopenjtalk
installed the full-context-label pipeline runs (accent arrows from A-fields,
accent-phrase spaces); without it, a pure-python kana reader covers
hiragana/katakana input (no pitch accent — openjtalk's dictionary is needed
for that and for kanji).
"""

from __future__ import annotations

import re

_japanese_characters = re.compile(
    r"[A-Za-z\d々぀-ヿ一-鿿１-９Ａ-Ｚ"
    r"ａ-ｚｦ-ﾝ]"
)
_japanese_marks = re.compile(
    r"[^A-Za-z\d々぀-ヿ一-鿿１-９Ａ-Ｚ"
    r"ａ-ｚｦ-ﾝ]"
)

_SYMBOLS_TO_JAPANESE = [(re.compile("％"), "パーセント")]

_ROMAJI_TO_IPA = [
    (re.compile(p), r)
    for p, r in [
        ("u", "ɯ"), ("ʧ", "tʃ"), ("j", "dʑ"), ("y", "j"),
        ("ni", "n^i"), ("nj", "n^"), ("hi", "çi"), ("hj", "ç"),
        ("f", "ɸ"), ("I", "i*"), ("U", "ɯ*"), ("r", "ɾ"),
    ]
]

_REAL_SOKUON = [
    (re.compile(p), r)
    for p, r in [
        (r"Q([↑↓]*[kg])", r"k#\1"),
        (r"Q([↑↓]*[tdjʧ])", r"t#\1"),
        (r"Q([↑↓]*[sʃ])", r"s\1"),
        (r"Q([↑↓]*[pb])", r"p#\1"),
    ]
]

_REAL_HATSUON = [
    (re.compile(p), r)
    for p, r in [
        (r"N([↑↓]*[pbm])", r"m\1"),
        (r"N([↑↓]*[ʧʥj])", r"n^\1"),
        (r"N([↑↓]*[tdn])", r"n\1"),
        (r"N([↑↓]*[kg])", r"ŋ\1"),
    ]
]

# -- pure-python kana reader (fallback; openjtalk phoneme alphabet) ---------

_KANA_BASE = {
    "あ": "a", "い": "i", "う": "u", "え": "e", "お": "o",
    "か": "ka", "き": "ki", "く": "ku", "け": "ke", "こ": "ko",
    "さ": "sa", "し": "ʃi", "す": "su", "せ": "se", "そ": "so",
    "た": "ta", "ち": "ʧi", "つ": "tsu", "て": "te", "と": "to",
    "な": "na", "に": "ni", "ぬ": "nu", "ね": "ne", "の": "no",
    "は": "ha", "ひ": "hi", "ふ": "fu", "へ": "he", "ほ": "ho",
    "ま": "ma", "み": "mi", "む": "mu", "め": "me", "も": "mo",
    "や": "ya", "ゆ": "yu", "よ": "yo",
    "ら": "ra", "り": "ri", "る": "ru", "れ": "re", "ろ": "ro",
    "わ": "wa", "ゐ": "i", "ゑ": "e", "を": "o", "ん": "N",
    "が": "ga", "ぎ": "gi", "ぐ": "gu", "げ": "ge", "ご": "go",
    "ざ": "za", "じ": "ji", "ず": "zu", "ぜ": "ze", "ぞ": "zo",
    "だ": "da", "ぢ": "ji", "づ": "zu", "で": "de", "ど": "do",
    "ば": "ba", "び": "bi", "ぶ": "bu", "べ": "be", "ぼ": "bo",
    "ぱ": "pa", "ぴ": "pi", "ぷ": "pu", "ぺ": "pe", "ぽ": "po",
    "ぁ": "a", "ぃ": "i", "ぅ": "u", "ぇ": "e", "ぉ": "o",
    "ー": "",  # long vowel handled below
}
_KANA_YOON = {
    "きゃ": "kya", "きゅ": "kyu", "きょ": "kyo",
    "しゃ": "ʃa", "しゅ": "ʃu", "しょ": "ʃo",
    "ちゃ": "ʧa", "ちゅ": "ʧu", "ちょ": "ʧo",
    "にゃ": "nya", "にゅ": "nyu", "にょ": "nyo",
    "ひゃ": "hya", "ひゅ": "hyu", "ひょ": "hyo",
    "みゃ": "mya", "みゅ": "myu", "みょ": "myo",
    "りゃ": "rya", "りゅ": "ryu", "りょ": "ryo",
    "ぎゃ": "gya", "ぎゅ": "gyu", "ぎょ": "gyo",
    "じゃ": "ja", "じゅ": "ju", "じょ": "jo",
    "びゃ": "bya", "びゅ": "byu", "びょ": "byo",
    "ぴゃ": "pya", "ぴゅ": "pyu", "ぴょ": "pyo",
}


def _katakana_to_hiragana(text: str) -> str:
    out = []
    for ch in text:
        code = ord(ch)
        if 0x30A1 <= code <= 0x30F6:
            out.append(chr(code - 0x60))
        else:
            out.append(ch)
    return "".join(out)


# lexicalized readings the kana-literal fallback would get wrong
_KANA_EXCEPTIONS = {
    "こんにちは": "こんにちわ",
    "こんばんは": "こんばんわ",
}


def _kana_to_romaji(text: str) -> str:
    """Kana -> openjtalk-style romaji (Q for sokuon, N for hatsuon)."""
    text = _katakana_to_hiragana(text)
    for k, v in _KANA_EXCEPTIONS.items():
        text = text.replace(k, v)
    out = ""
    i = 0
    while i < len(text):
        two = text[i : i + 2]
        ch = text[i]
        if two in _KANA_YOON:
            out += _KANA_YOON[two]
            i += 2
            continue
        if ch == "っ":
            out += "Q"
        elif ch == "う" and out.endswith("o"):
            out += "o"  # orthographic long vowel (ou -> oo)
        elif ch == "い" and out.endswith("e"):
            out += "e"  # orthographic long vowel (ei -> ee)
        elif ch == "ー":
            # long vowel: repeat previous vowel
            if out and out[-1] in "aiueo":
                out += out[-1]
        elif ch in _KANA_BASE:
            out += _KANA_BASE[ch]
        else:
            out += ch
        i += 1
    return out


def symbols_to_japanese(text: str) -> str:
    for regex, replacement in _SYMBOLS_TO_JAPANESE:
        text = regex.sub(replacement, text)
    return text


def _openjtalk_available() -> bool:
    try:
        import pyopenjtalk  # noqa: F401

        return True
    except ImportError:
        return False


def japanese_to_romaji_with_accent(text: str) -> str:
    """Full-context-label path with pitch-accent arrows
    (reference japanese.py:58-108); kana fallback without accents."""
    text = symbols_to_japanese(text)
    sentences = re.split(_japanese_marks, text)
    marks = re.findall(_japanese_marks, text)

    use_ojt = _openjtalk_available()
    out = ""
    for i, sentence in enumerate(sentences):
        if re.match(_japanese_characters, sentence):
            if out != "":
                out += " "
            if use_ojt:
                out += _romaji_accent_openjtalk(sentence)
            else:
                out += _kana_to_romaji(sentence)
        if i < len(marks):
            out += marks[i].replace(" ", "")
    return out


def _romaji_accent_openjtalk(sentence: str) -> str:  # pragma: no cover
    """Pitch accent from full-context labels (reference japanese.py:75-103)."""
    import pyopenjtalk

    text = ""
    labels = pyopenjtalk.extract_fullcontext(sentence)
    for n, label in enumerate(labels):
        phoneme = re.search(r"\-([^\+]*)\+", label).group(1)
        if phoneme in ("sil", "pau"):
            continue
        text += phoneme.replace("ch", "ʧ").replace("sh", "ʃ").replace("cl", "Q")
        a1 = int(re.search(r"/A:(\-?[0-9]+)\+", label).group(1))
        a2 = int(re.search(r"\+(\d+)\+", label).group(1))
        a3 = int(re.search(r"\+(\d+)/", label).group(1))
        if re.search(r"\-([^\+]*)\+", labels[n + 1]).group(1) in ("sil", "pau"):
            a2_next = -1
        else:
            a2_next = int(re.search(r"\+(\d+)\+", labels[n + 1]).group(1))
        if a3 == 1 and a2_next == 1:
            text += " "
        elif a1 == 0 and a2_next == a2 + 1:
            text += "↓"
        elif a2 == 1 and a2_next == 2:
            text += "↑"
    return text


def get_real_sokuon(text: str) -> str:
    for regex, replacement in _REAL_SOKUON:
        text = regex.sub(replacement, text)
    return text


def get_real_hatsuon(text: str) -> str:
    for regex, replacement in _REAL_HATSUON:
        text = regex.sub(replacement, text)
    return text


def japanese_to_ipa(text: str) -> str:
    """Main entry (reference japanese.py:123-131)."""
    text = japanese_to_romaji_with_accent(text).replace("...", "…")
    text = get_real_sokuon(text)
    text = get_real_hatsuon(text)
    for regex, replacement in _ROMAJI_TO_IPA:
        text = regex.sub(replacement, text)
    return text
