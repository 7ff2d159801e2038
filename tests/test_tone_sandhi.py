"""Tone sandhi rule tests (reference tone_sandhi.py semantics)."""

from vits_tpu.text.tone_sandhi import (
    bu_sandhi,
    yi_sandhi,
    neutral_tone,
    third_tone_sandhi,
    modified_tone,
    cross_word_third_tone,
)


def test_bu_before_tone4():
    assert bu_sandhi("不去", ["bu4", "qu4"]) == ["bu2", "qu4"]
    assert bu_sandhi("不来", ["bu4", "lai2"]) == ["bu4", "lai2"]


def test_bu_reduplication():
    assert bu_sandhi("好不好", ["hao3", "bu4", "hao3"]) == ["hao3", "bu5", "hao3"]


def test_yi_sandhi():
    # before tone 4 -> yi2
    assert yi_sandhi("一样", ["yi1", "yang4"]) == ["yi2", "yang4"]
    # before tone 1/2/3 -> yi4
    assert yi_sandhi("一天", ["yi1", "tian1"]) == ["yi4", "tian1"]
    # reduplication -> neutral
    assert yi_sandhi("看一看", ["kan4", "yi1", "kan4"]) == ["kan4", "yi5", "kan4"]
    # ordinal/number context unchanged
    assert yi_sandhi("第一", ["di4", "yi1"]) == ["di4", "yi1"]


def test_neutral_tone():
    assert neutral_tone("妈妈", ["ma1", "ma1"]) == ["ma1", "ma5"]
    assert neutral_tone("我们", ["wo3", "men2"]) == ["wo3", "men5"]
    assert neutral_tone("什么", ["shen2", "me2"]) == ["shen2", "me5"]


def test_third_tone_sandhi():
    assert third_tone_sandhi(["ni3", "hao3"]) == ["ni2", "hao3"]
    # chain: 3-3-3 -> right-to-left gives 2-2-3
    assert third_tone_sandhi(["wo3", "hen3", "hao3"]) == ["wo2", "hen2", "hao3"]


def test_modified_tone_pipeline():
    assert modified_tone("你好", ["ni3", "hao3"]) == ["ni2", "hao3"]


def test_cross_word():
    # cross-word pass only touches the boundary pair; the in-word pair is
    # handled by third_tone_sandhi beforehand
    out = cross_word_third_tone([["wo3"], ["hen3", "hao3"]])
    assert out == [["wo2"], ["hen3", "hao3"]]
