"""Derive last-resort pinyin readings for tail hanzi from Unicode collation data.

Round-5 item #2 (VERDICT.md): 4,663 of the 10,318 simplified characters
reachable through this repo's trad->simp table had no reading in
`pinyin_dict.py` and were silently dropped (the reference reads them via
pypinyin's ~41k-char table, /root/reference/text/paddle_zh.py:50-57 — a
dependency this image does not have).

Derivation source: /usr/share/perl/5.36.0/Unicode/Collate/CJK/Pinyin.pm —
the Unicode CLDR pinyin collation table shipped with perl. Its DATA section
lists ~20.9k CJK chars in pinyin order, grouped into homophone classes
(classes are wrapped at 10 chars/line; a line shorter than 10 ends the
class; FDD0-00xx sentinels mark initial-letter sections).

Method:
  1. label every class by majority vote of readings its chars already have
     in our curated `pinyin_dict.CHAR_TO_PINYIN`;
  2. assign that label to class members we cannot read yet;
  3. classes with no known member inherit the nearest preceding labeled
     class's syllable within the same letter section (the table's
     supplementary tails follow their base syllable run).

Accuracy, measured leave-one-out over the 5,344 curated chars that share a
class with >=2 known chars: 91.8% exact (syllable+tone), 97.6% on the
toneless syllable. That is a *last-resort* tier: the curated dict always
wins; this only prevents silent drops on rare characters.

Usage: python tools/derive_pinyin_tail.py   (rewrites vits_tpu/text/pinyin_tail.py)
"""

from __future__ import annotations

import os
import re
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PM = "/usr/share/perl/5.36.0/Unicode/Collate/CJK/Pinyin.pm"
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "vits_tpu", "text", "pinyin_tail.py",
)

# Hand-authored readings for characters absent from the collation table —
# mostly CJK Ext-A ancient variants (read as the character they are a
# variant of) plus pre-composed metric-unit chars (read as their first
# syllable: 兙 "decagram" is shi2ke4). These override the derivation.
# ○ is the circled-zero numeral. Confidence: high for documented variant
# relationships (㤅=愛, 䴙䴘 pi4ti1, 㺢㹢狓 okapi...), best-effort for the
# handful of glyphs with no attested modern reading.
MANUAL = {
    "○": "ling2", "〇": "ling2",
    "㐄": "kua4", "㐅": "wu3", "㐆": "yin3", "㐌": "yi2", "㐖": "xie2",
    "㐜": "qiu2", "㐡": "nuo4", "㐤": "qiu2", "㐰": "xin4", "㐺": "zhong4",
    "㑇": "zhou4", "㑩": "luo2", "㑳": "zhou4", "㒳": "liang3",
    "㒸": "sui4", "㔾": "jie2", "㗂": "sheng3", "㗎": "jia4", "㝵": "de2",
    "㞎": "ba3", "㞙": "niao4", "㞞": "song2", "㢲": "xun4", "㢴": "xi1",
    "㤅": "ai4", "㥁": "de2", "㥯": "yin3", "㧑": "hui1", "㨗": "jie2",
    "㫺": "xi1", "㬎": "xian3", "㮎": "fei4", "㮚": "li4", "㮸": "song4",
    "㲋": "chuo4", "㲱": "mao2", "㲾": "yu3", "㳮": "ni4", "㵪": "xian2",
    "㶸": "xie2", "㷖": "zhao4", "㷭": "feng1", "㹢": "jia1",
    "㹴": "geng3", "㺢": "huo4", "㺵": "qiu2", "㽮": "xian4",
    "㿝": "xiang1", "䁖": "lou1", "䌽": "cai3", "䍃": "yao2",
    "䔢": "hua2", "䖟": "meng2", "䖸": "e2", "䗈": "feng2", "䗖": "di4",
    "䗥": "zong1", "䗪": "zhe4", "䜣": "xin1", "䜩": "yan4",
    "䝓": "lei4", "䝙": "chu1", "䥯": "ba4", "䦉": "xi4", "䯝": "sui3",
    "䲔": "jing1", "䲠": "chun1", "䳗": "e2", "䴘": "ti1", "䴙": "pi4",
    "䵹": "zhi1", "䶑": "xi1",
    "兙": "shi2", "兡": "bai3", "呣": "mu2",
    "瓧": "shi2", "瓰": "fen1", "瓱": "mao2", "瓼": "li2",
    "㠯": "yi3", "㵎": "jian4", "㼝": "wan3", "䠶": "she4",
    "䰾": "ba1", "䳘": "e2",
}


def parse_classes() -> list[tuple[str, list[str]]]:
    classes: list[tuple[str, list[str]]] = []
    cur: list[str] = []
    section = "?"
    started = False
    for raw in open(PM):
        raw = raw.strip()
        if raw == "__DATA__":
            started = True
            continue
        if not started:
            continue
        if raw == "__END__":
            break
        m = re.match(r"FDD0-00([0-9A-F]{2})", raw)
        if m:
            if cur:
                classes.append((section, cur))
                cur = []
            section = chr(int(m.group(1), 16)).lower()
            continue
        codes = [c for c in raw.split() if re.fullmatch(r"[0-9A-F]{4,5}", c)]
        if not codes:
            continue
        cur.extend(chr(int(c, 16)) for c in codes)
        if len(codes) < 10:
            classes.append((section, cur))
            cur = []
    if cur:
        classes.append((section, cur))
    return classes


def main() -> None:
    from vits_tpu.text.char_convert import T2S
    from vits_tpu.text.pinyin_dict import CURATED_CHAR_TO_PINYIN as CHAR_TO_PINYIN

    known = {
        c: (v if isinstance(v, str) else v[0]) for c, v in CHAR_TO_PINYIN.items()
    }
    classes = parse_classes()
    # scope: every hanzi the pipeline can see — all chars of the collation
    # table (incl. trad/rare forms that reach lookup when absent from the
    # t2s table, e.g. 靐), plus both sides of the t2s table itself
    scope = {c for _s, chars in classes for c in chars}
    scope |= set(T2S.values()) | set(T2S.keys())
    missing = {
        c for c in scope
        if c not in known and 0x3400 <= ord(c) <= 0x2FFFF
    }
    labels: list[str | None] = []
    for _sec, chars in classes:
        votes = Counter(known[c] for c in chars if c in known)
        labels.append(votes.most_common(1)[0][0] if votes else None)

    derived: dict[str, str] = {}
    # pass 1: majority label of the char's own class
    for (sec, chars), lab in zip(classes, labels):
        if lab is None:
            continue
        for c in chars:
            if c in missing and c not in derived:
                derived[c] = lab
    # pass 2: unlabeled classes inherit the nearest preceding label in
    # the same section
    prev_label: str | None = None
    prev_sec = None
    for (sec, chars), lab in zip(classes, labels):
        if sec != prev_sec:
            prev_label = None
            prev_sec = sec
        if lab is not None:
            prev_label = lab
            continue
        if prev_label is not None:
            for c in chars:
                if c in missing and c not in derived:
                    derived[c] = prev_label

    derived.update({c: r for c, r in MANUAL.items()})
    still = sorted(c for c in missing if c not in derived)
    print(f"missing {len(missing)} -> derived {len(derived)}, left {len(still)}")
    print("left:", "".join(still))

    with open(OUT, "w") as f:
        f.write('"""Derived last-resort pinyin readings (generated file).\n\n')
        f.write("Generated by tools/derive_pinyin_tail.py from the Unicode CLDR\n")
        f.write("pinyin collation data (perl Unicode::Collate::CJK::Pinyin);\n")
        f.write("see that script for method + measured accuracy. The curated\n")
        f.write("pinyin_dict.CHAR_TO_PINYIN always takes precedence; this tier\n")
        f.write("only prevents silent drops on tail characters\n")
        f.write("(reference parity: pypinyin fallback readings,\n")
        f.write('/root/reference/text/paddle_zh.py:50-57).\n"""\n\n')
        f.write("TAIL_READINGS = {\n")
        for c in sorted(derived):
            f.write(f'    "{c}": "{derived[c]}",\n')
        f.write("}\n")
    print(f"wrote {len(derived)} entries -> {OUT}")


if __name__ == "__main__":
    main()
