"""Chinese non-standard-word (NSW) text normalization.

Behavioral reference: /root/reference/text/frontend/zh_normalization/ (the
PaddleSpeech normalizer): sentence split, full-width -> half-width, then
regex verbalizers applied in a fixed order — dates, time (+ranges),
temperature, fractions, percentages, phone numbers, ranges, negative
numbers, decimals, quantifiers, plain numbers. Implemented from the standard
Mandarin reading rules with the dependency-free an2cn from
vits_tpu.text.numbers.
"""

from __future__ import annotations

import re

from vits_tpu.text.numbers import an2cn, _ZH_DIGITS

# -- full-width -> half-width tables (reference constants.py) ---------------

F2H = {chr(0xFF01 + i): chr(0x21 + i) for i in range(94)}  # ！-～ -> !-~
F2H[chr(0x3000)] = " "  # ideographic space
_F2H_TABLE = str.maketrans(F2H)


def full_to_half(text: str) -> str:
    return text.translate(_F2H_TABLE)


# -- digit readings ---------------------------------------------------------


def _digits_verbatim(s: str, phone: bool = False) -> str:
    """Digit-by-digit reading; phone style reads 1 as 幺."""
    table = "零幺二三四五六七八九" if phone else _ZH_DIGITS
    return "".join(table[int(c)] if c.isdigit() else c for c in s)


def _num(s: str) -> str:
    return an2cn(s)


def _num_two(s: str) -> str:
    """Quantifier context: leading 二 -> 两 (2个 -> 两个)."""
    out = _num(s)
    if out.startswith("二") and len(s.split(".")[0]) == 1:
        out = "两" + out[1:]
    return out


# -- verbalizers (reference chronology.py / num.py / quantifier.py /
#    phonecode.py semantics) -----------------------------------------------

RE_DATE = re.compile(
    r"(\d{4})年((\d{1,2})月)?((\d{1,2})([日号]))?|(\d{1,2})月(\d{1,2})[日号]"
)


def _replace_date(m: re.Match) -> str:
    out = ""
    if m.group(1):
        out += _digits_verbatim(m.group(1)) + "年"
        if m.group(3):
            out += _num(m.group(3)) + "月"
        if m.group(5):
            out += _num(m.group(5)) + m.group(6)
    else:
        out += _num(m.group(7)) + "月" + _num(m.group(8)) + "日"
    return out


RE_DATE2 = re.compile(r"(\d{4})[-/.](\d{1,2})[-/.](\d{1,2})")


def _replace_date2(m: re.Match) -> str:
    return (
        _digits_verbatim(m.group(1)) + "年"
        + _num(m.group(2)) + "月"
        + _num(m.group(3)) + "日"
    )


RE_TIME = re.compile(r"(\d{1,2}):(\d{2})(:(\d{2}))?")
RE_TIME_RANGE = re.compile(
    r"(\d{1,2}):(\d{2})(:(\d{2}))?[~-](\d{1,2}):(\d{2})(:(\d{2}))?"
)


def _one_time(h: str, mnt: str, sec: str | None) -> str:
    out = _num_two(h) + "点"
    if int(mnt) != 0:
        if int(mnt) < 10:
            out += "零"
        out += _num(str(int(mnt))) + "分"
    else:
        out += "整" if sec is None else ""
    if sec is not None and int(sec) != 0:
        out += _num(str(int(sec))) + "秒"
    return out


def _replace_time(m: re.Match) -> str:
    g = m.groups()
    if len(g) > 4 and g[4] is not None:  # range
        return (
            _one_time(g[0], g[1], g[3]) + "至" + _one_time(g[4], g[5], g[7])
        )
    return _one_time(g[0], g[1], g[3])


RE_TEMPERATURE = re.compile(r"(-?)(\d+(\.\d+)?)(°C|℃|度|摄氏度)")


def _replace_temperature(m: re.Match) -> str:
    sign = "零下" if m.group(1) else ""
    unit = "摄氏度" if m.group(4) in ("°C", "℃", "摄氏度") else "度"
    return sign + _num(m.group(2)) + unit


RE_FRAC = re.compile(r"(-?)(\d+)/(\d+)")


def _replace_frac(m: re.Match) -> str:
    sign = "负" if m.group(1) else ""
    return sign + _num(m.group(3)) + "分之" + _num(m.group(2))


RE_PERCENTAGE = re.compile(r"(-?)(\d+(\.\d+)?)%")


def _replace_percentage(m: re.Match) -> str:
    sign = "负" if m.group(1) else ""
    return sign + "百分之" + _num(m.group(2))


RE_MOBILE_PHONE = re.compile(r"(?<!\d)((\+?86 ?)?1([38]\d|5[0-35-9]|7[678]|9[89])\d{8})(?!\d)")
RE_TELEPHONE = re.compile(r"(?<!\d)((0(10|2[1-3]|[3-9]\d{2}))?[- ]?[1-9]\d{6,7})(?!\d)")


def _replace_phone(m: re.Match) -> str:
    return _digits_verbatim(re.sub(r"[+\- ]", "", m.group(0)), phone=True)


RE_RANGE = re.compile(r"(\d+(\.\d+)?)[-~](\d+(\.\d+)?)")


def _replace_range(m: re.Match) -> str:
    return _num(m.group(1)) + "至" + _num(m.group(3))


RE_INTEGER = re.compile(r"(-)(\d+)")


def _replace_negative(m: re.Match) -> str:
    return "负" + _num(m.group(2))


RE_DECIMAL = re.compile(r"(-?)(\d+\.\d+)")


def _replace_decimal(m: re.Match) -> str:
    return ("负" if m.group(1) else "") + _num(m.group(2))


# number + measure word: 2个 -> 两个 (reference quantifier.py)
_QUANTIFIERS = "个只条张颗棵粒位件座所台万亿年月日号点分秒"
RE_POSITIVE_QUANTIFIER = re.compile(rf"(\d+)([多余几])?(?=[{_QUANTIFIERS}])")


def _replace_quantifier(m: re.Match) -> str:
    return _num_two(m.group(1)) + (m.group(2) or "")


RE_NUMBER = re.compile(r"\d+")

# Deviation from reference text_normlization.py:54: an ASCII '.' followed by
# a digit is a decimal point (5.5度), not a sentence boundary — the reference
# splits mid-number there.
SENTENCE_SPLITOR = re.compile(r"([：、，；。？！,;?!…][”’]?|\.(?!\d)[”’]?)")


class TextNormalizer:
    """Sentence split + ordered NSW verbalization
    (reference text_normlization.py:50-110)."""

    def split(self, text: str) -> list[str]:
        text = text.replace(" ", "")
        text = re.sub(r"[《》【】<=>{}()（）&@“”^_|\\]", "", text)
        text = SENTENCE_SPLITOR.sub(r"\1\n", text).strip()
        return [s.strip() for s in re.split(r"\n+", text) if s.strip()]

    def normalize_sentence(self, sentence: str) -> str:
        sentence = full_to_half(sentence)
        sentence = RE_DATE.sub(_replace_date, sentence)
        sentence = RE_DATE2.sub(_replace_date2, sentence)
        sentence = RE_TIME_RANGE.sub(_replace_time, sentence)
        sentence = RE_TIME.sub(_replace_time, sentence)
        sentence = RE_TEMPERATURE.sub(_replace_temperature, sentence)
        sentence = RE_FRAC.sub(_replace_frac, sentence)
        sentence = RE_PERCENTAGE.sub(_replace_percentage, sentence)
        sentence = RE_MOBILE_PHONE.sub(_replace_phone, sentence)
        sentence = RE_TELEPHONE.sub(_replace_phone, sentence)
        sentence = RE_RANGE.sub(_replace_range, sentence)
        sentence = RE_INTEGER.sub(_replace_negative, sentence)
        sentence = RE_DECIMAL.sub(_replace_decimal, sentence)
        sentence = RE_POSITIVE_QUANTIFIER.sub(_replace_quantifier, sentence)
        sentence = RE_NUMBER.sub(lambda m: _num(m.group(0)), sentence)
        sentence = sentence.replace("/", "每").replace("~", "至")
        return sentence

    def normalize(self, text: str) -> str:
        return "".join(self.normalize_sentence(s) for s in self.split(text))
