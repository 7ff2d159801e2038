"""Tone sandhi rule tests (reference tone_sandhi.py semantics, POS-aware)."""

from vits_tpu.text.tone_sandhi import (
    bu_sandhi,
    cross_word_third_tone,
    modified_tone,
    neutral_tone,
    pre_merge_for_modify,
    split_word,
    third_tone_sandhi,
    yi_sandhi,
)


def test_bu_before_tone4():
    assert bu_sandhi("不去", ["bu4", "qu4"]) == ["bu2", "qu4"]
    assert bu_sandhi("不来", ["bu4", "lai2"]) == ["bu4", "lai2"]


def test_bu_infix_neutral():
    # X不Y (3 chars, middle 不) -> neutral (reference _bu_sandhi first branch)
    assert bu_sandhi("看不懂", ["kan4", "bu4", "dong3"]) == ["kan4", "bu5", "dong3"]
    assert bu_sandhi("好不好", ["hao3", "bu4", "hao3"]) == ["hao3", "bu5", "hao3"]


def test_yi_sandhi():
    assert yi_sandhi("一样", ["yi1", "yang4"]) == ["yi2", "yang4"]
    assert yi_sandhi("一天", ["yi1", "tian1"]) == ["yi4", "tian1"]
    assert yi_sandhi("看一看", ["kan4", "yi1", "kan4"]) == ["kan4", "yi5", "kan4"]
    assert yi_sandhi("第一", ["di4", "yi1"]) == ["di4", "yi1"]
    # numeric sequence: unchanged
    assert yi_sandhi("一零零", ["yi1", "ling2", "ling2"]) == ["yi1", "ling2", "ling2"]


def test_neutral_tone():
    assert neutral_tone("妈妈", ["ma1", "ma1"], "n") == ["ma1", "ma5"]
    assert neutral_tone("我们", ["wo3", "men2"], "r") == ["wo3", "men5"]
    assert neutral_tone("什么", ["shen2", "me2"], "r") == ["shen2", "me5"]
    # conventional neutral-tone vocabulary (full reference list)
    assert neutral_tone("豆腐", ["dou4", "fu3"], "n") == ["dou4", "fu5"]
    assert neutral_tone("玻璃", ["bo1", "li2"], "n") == ["bo1", "li5"]
    assert neutral_tone("盘缠", ["pan2", "chan2"], "n") == ["pan2", "chan5"]
    # must-NOT list blocks the 子 suffix rule
    assert neutral_tone("电子", ["dian4", "zi3"], "n") == ["dian4", "zi3"]
    # locative suffix with right POS
    assert neutral_tone("家里", ["jia1", "li3"], "s") == ["jia1", "li5"]
    # measure word 个 after numeral
    assert neutral_tone("三个", ["san1", "ge4"], "m") == ["san1", "ge5"]


def test_third_tone_word_structures():
    # 2 syllables all-3
    assert third_tone_sandhi("你好", ["ni3", "hao3"]) == ["ni2", "hao3"]
    # disyllabic+monosyllabic all-3: 2-2-3 (蒙古/包 shape)
    out = third_tone_sandhi("老虎好", ["lao3", "hu3", "hao3"])
    assert out[-1] == "hao3" and out[0][-1] == "2"
    # 4-char idiom: pairwise
    assert third_tone_sandhi(
        "彼此理解", ["bi3", "ci3", "li3", "jie3"]
    ) == ["bi2", "ci3", "li2", "jie3"]


def test_modified_tone_pipeline():
    assert modified_tone("你好", "l", ["ni3", "hao3"]) == ["ni2", "hao3"]


def test_pre_merge_bu_yi():
    seg = [("听", "v"), ("一", "m"), ("听", "v")]
    assert pre_merge_for_modify(seg)[0][0] == "听一听"
    seg2 = [("不", "d"), ("去", "v")]
    assert pre_merge_for_modify(seg2)[0][0] == "不去"
    # trailing 儿 merges into the previous word
    seg3 = [("花", "n"), ("儿", "n")]
    assert pre_merge_for_modify(seg3)[0][0] == "花儿"


def test_split_word_two_parts():
    parts = split_word("纸老虎")
    assert "".join(parts) == "纸老虎" and len(parts) == 2


def test_cross_word():
    out = cross_word_third_tone([["wo3"], ["hen3", "hao3"]])
    assert out == [["wo2"], ["hen3", "hao3"]]


def test_reference_differential_fixture():
    """177 (word, pos) sandhi decisions from a 59-sentence stress corpus
    byte-match the reference ToneSandhi (reference
    text/frontend/tone_sandhi.py, executed in-situ offline with pypinyin
    stubbed by this repo's own word-level pinyin — only tone digits feed
    the sandhi logic)."""
    import json
    import os

    from vits_tpu.text.tone_sandhi import modified_tone
    from vits_tpu.text.zh_frontend import word_to_pinyin

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "fixtures", "tone_sandhi_differential.json")
    for row in json.load(open(path)):
        sylls = [s for s in word_to_pinyin(row["word"]) if s]
        out = modified_tone(row["word"], row["pos"], sylls)
        tones = [s[-1] if s[-1].isdigit() else "5" for s in out]
        assert tones == row["tones"], (row, tones)
