"""Japanese g2p: text -> romaji with pitch-accent arrows -> IPA.

Behavioral reference: /root/reference/text/japanese.py. With pyopenjtalk
installed the full-context-label pipeline runs (accent arrows from A-fields,
accent-phrase spaces); without it, a pure-python kana reader covers
hiragana/katakana input WITH Tokyo-accent arrows: an accent lexicon for
common vocabulary plus the heiban default (initial rise, no fall) — the
same ↑/↓ placement rules the full-context A-fields produce
(reference japanese.py:91-103):
  * accent 0 (heiban):    rise after mora 1          ko↑Nnichiwa
  * accent 1 (atamadaka): fall after mora 1          ha↓i
  * accent k>=2:          rise after 1, fall after k a↑riga↓too
  * a fall on the final mora is inaudible phrase-finally (openjtalk only
    emits it before a following mora), so odaka words get no arrow
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

# Tokyo pitch-accent lexicon for the kana fallback: kana -> accent nucleus
# mora (0 = heiban). Standard-Japanese accent facts (NHK accent conventions)
# for common vocabulary; everything else defaults to heiban, which is the
# majority pattern and reproduces openjtalk's initial rise.
_ACCENT_LEXICON = {
    "こんにちわ": 0, "こんばんわ": 0, "おはよう": 0,
    "ありがとう": 2, "すみません": 4, "さようなら": 4,
    "はい": 1, "いいえ": 3,
    "わたし": 0, "あなた": 2, "みんな": 3,
    "にほん": 2, "にほんご": 0, "とうきょう": 0,
    "せんせい": 3, "がっこう": 0, "ともだち": 0, "かぞく": 1,
    "てんき": 1, "あめ": 1, "ゆき": 2, "かぜ": 0, "そら": 1,
    "うみ": 1, "やま": 2, "かわ": 2, "はな": 2, "き": 1,
    "ねこ": 1, "いぬ": 2, "とり": 0, "さかな": 0,
    "みず": 0, "おちゃ": 0, "ごはん": 1, "にく": 2, "たまご": 2,
    "ほん": 1, "くるま": 0, "でんわ": 0, "えいが": 1, "おんがく": 1,
    "いま": 1, "きょう": 1, "あした": 3, "きのう": 2, "まいにち": 1,
    "たべる": 2, "のむ": 1, "みる": 1, "きく": 0, "はなす": 2,
    "よむ": 1, "かく": 1, "くる": 1, "いく": 0, "かえる": 1,
    "おいしい": 3, "たのしい": 3, "うれしい": 3, "かわいい": 3,
    "おおきい": 3, "ちいさい": 3, "あたらしい": 4, "きれい": 1,
    "げんき": 1, "だいじょうぶ": 3, "おねがいします": 5,
}


def _kana_moras(kana: str) -> list[str]:
    """Hiragana -> mora units (yoon digraphs merge; っ/ん/ー each count)."""
    moras: list[str] = []
    i = 0
    while i < len(kana):
        if kana[i : i + 2] in _KANA_YOON:
            moras.append(kana[i : i + 2])
            i += 2
        else:
            moras.append(kana[i])
            i += 1
    return moras


def _mora_to_romaji(mora: str, out_so_far: str) -> str:
    """One mora -> romaji, context-sensitive for long vowels (accent arrows
    are transparent to the vowel context)."""
    ctx = out_so_far.replace("↑", "").replace("↓", "")
    if mora in _KANA_YOON:
        return _KANA_YOON[mora]
    if mora == "っ":
        return "Q"
    if mora == "う" and ctx.endswith("o"):
        return "o"  # orthographic long vowel (ou -> oo)
    if mora == "い" and ctx.endswith("e"):
        return "e"  # orthographic long vowel (ei -> ee)
    if mora == "ー":
        return ctx[-1] if ctx and ctx[-1] in "aiueo" else ""
    return _KANA_BASE.get(mora, mora)


def _kana_to_romaji(text: str, accent: bool = False) -> str:
    """Kana -> openjtalk-style romaji (Q sokuon, N hatsuon); with
    accent=True, insert the ↑/↓ arrows per the module docstring."""
    text = _katakana_to_hiragana(text)
    for k, v in _KANA_EXCEPTIONS.items():
        text = text.replace(k, v)
    moras = _kana_moras(text)
    nucleus = _ACCENT_LEXICON.get(text, 0) if accent else None
    out = ""
    for idx, mora in enumerate(moras, start=1):
        out += _mora_to_romaji(mora, out)
        if not accent or idx >= len(moras):
            continue  # phrase-final: no following mora, no audible arrow
        if nucleus == idx:
            out += "↓"
        elif idx == 1:
            out += "↑"
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


# non-Japanese marks -> ASCII, the role unidecode plays in the reference
# (japanese.py:106: `unidecode(marks[i])`)
_MARKS_TRANSLIT = str.maketrans({
    "、": ",", "。": ".", "！": "!", "？": "?", "，": ",", "．": ".",
    "・": ",", "：": ",", "；": ",", "〜": "~", "～": "~", "…": "…",
    "「": "", "」": "", "『": "", "』": "", "（": "", "）": "",
    "“": "", "”": "", "‘": "", "’": "", "　": "",
})


def _translit_marks(marks: str) -> str:
    out = marks.translate(_MARKS_TRANSLIT).replace(" ", "")
    return "".join(ch for ch in out if ord(ch) < 0x2E80 or ch == "…")


def japanese_to_romaji_with_accent(text: str) -> str:
    """Full-context-label path with pitch-accent arrows
    (reference japanese.py:58-108); the kana fallback realizes accents from
    the lexicon + heiban default."""
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
                out += _kana_to_romaji(sentence, accent=True)
        if i < len(marks):
            out += _translit_marks(marks[i])
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
