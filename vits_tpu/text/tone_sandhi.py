"""Mandarin tone sandhi applied to tone-numbered pinyin.

Behavioral reference: /root/reference/text/frontend/tone_sandhi.py (the
PaddleSpeech rules): neutral-tone words/suffixes, 不 (bu) sandhi, 一 (yi)
sandhi, third-tone sandhi. Implemented as pure functions over
(hanzi_word, [pinyin_syllable]) pairs so the rules are testable without any
hanzi->pinyin backend; wired into the [ZH] pipeline when pypinyin is
available.

Rules (standard Mandarin phonology):
  * 不 before a 4th tone -> bu2 (不去 bu2 qu4); X不X pattern -> neutral
  * 一 between reduplicated verbs -> yi5; before 4th tone -> yi2;
    before 1st/2nd/3rd -> yi4
  * two adjacent 3rd tones -> first becomes 2nd (applied right-to-left
    within a word, then across word boundaries for single-syllable words)
  * neutral-tone suffixes: 们/么/的/地/得/了/着/过 and reduplication
    (妈妈 -> ma1 ma5)
"""

from __future__ import annotations

# frequent neutral-tone words (second syllable reads tone 5); a practical
# subset of the reference's ~400-word list
NEUTRAL_TONE_WORDS = {
    "麻烦", "东西", "事情", "觉得", "告诉", "喜欢", "意思", "明白", "知道",
    "咳嗽", "老实", "月亮", "枕头", "眼睛", "衣服", "耳朵", "时候", "朋友",
    "漂亮", "暖和", "热闹", "清楚", "商量", "什么", "怎么", "这么", "那么",
    "多么", "先生", "力气", "动静", "folk",
}

_NEUTRAL_SUFFIXES = set("们么的地得了着过吧呢啊呀吗嘛")


def _tone(s: str) -> str:
    return s[-1] if s and s[-1] in "12345" else ""


def _set_tone(s: str, tone: str) -> str:
    if _tone(s):
        return s[:-1] + tone
    return s + tone


def neutral_tone(word: str, sylls: list[str]) -> list[str]:
    """Neutral-tone words, suffixes, reduplication."""
    if len(word) >= 2 and word in NEUTRAL_TONE_WORDS:
        sylls = sylls[:-1] + [_set_tone(sylls[-1], "5")]
    out = list(sylls)
    for i, ch in enumerate(word):
        if i == 0:
            continue
        if ch in _NEUTRAL_SUFFIXES:
            out[i] = _set_tone(out[i], "5")
        elif ch == word[i - 1]:  # reduplication: 妈妈, 看看
            out[i] = _set_tone(out[i], "5")
    return out


def bu_sandhi(word: str, sylls: list[str]) -> list[str]:
    """不 tone changes."""
    out = list(sylls)
    for i, ch in enumerate(word):
        if ch != "不":
            continue
        # X不X (e.g. 好不好) -> neutral
        if 0 < i < len(word) - 1 and word[i - 1] == word[i + 1]:
            out[i] = _set_tone(out[i], "5")
        elif i + 1 < len(sylls) and _tone(out[i + 1]) == "4":
            out[i] = _set_tone(out[i], "2")
    return out


def yi_sandhi(word: str, sylls: list[str]) -> list[str]:
    """一 tone changes."""
    out = list(sylls)
    for i, ch in enumerate(word):
        if ch != "一":
            continue
        # in a number context (第一, 一二三, dates) keep tone 1
        ctx = word[max(0, i - 1) : i + 2]
        if any(c.isdigit() or c in "零一二三四五六七八九十百千万亿第初" for c in ctx.replace("一", "", 1)):
            continue
        # reduplication: 看一看 -> neutral
        if 0 < i < len(word) - 1 and word[i - 1] == word[i + 1]:
            out[i] = _set_tone(out[i], "5")
        elif i + 1 < len(sylls) and _tone(out[i + 1]) == "4":
            out[i] = _set_tone(out[i], "2")
        elif i + 1 < len(sylls) and _tone(out[i + 1]) in ("1", "2", "3"):
            out[i] = _set_tone(out[i], "4")
    return out


def third_tone_sandhi(sylls: list[str]) -> list[str]:
    """3-3 -> 2-3 within a word; runs of third tones become 2...2-3
    (comparison against the ORIGINAL tones, so 3-3-3 -> 2-2-3)."""
    orig = [_tone(s) for s in sylls]
    out = list(sylls)
    for i in range(len(out) - 2, -1, -1):
        if orig[i] == "3" and orig[i + 1] == "3":
            out[i] = _set_tone(out[i], "2")
    return out


def modified_tone(word: str, sylls: list[str]) -> list[str]:
    """Full per-word pipeline (reference tone_sandhi.py modified_tone)."""
    sylls = bu_sandhi(word, sylls)
    sylls = yi_sandhi(word, sylls)
    sylls = neutral_tone(word, sylls)
    sylls = third_tone_sandhi(sylls)
    return sylls


def cross_word_third_tone(words_sylls: list[list[str]]) -> list[list[str]]:
    """Apply 3-3 sandhi across word boundaries (last syllable of word i vs
    first syllable of word i+1)."""
    out = [list(s) for s in words_sylls]
    for i in range(len(out) - 1):
        if not out[i] or not out[i + 1]:
            continue
        if _tone(out[i][-1]) == "3" and _tone(out[i + 1][0]) == "3":
            out[i][-1] = _set_tone(out[i][-1], "2")
    return out
