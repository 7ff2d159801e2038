"""Chinese NSW normalization tests (reference zh_normalization semantics)."""

from vits_tpu.text.zh_normalization import TextNormalizer, full_to_half

tn = TextNormalizer()


def test_dates():
    assert tn.normalize_sentence("2024年3月5日") == "二零二四年三月五日"
    assert tn.normalize_sentence("1月15号") == "一月十五日"
    assert tn.normalize_sentence("2023-07-01") == "二零二三年七月一日"


def test_time():
    assert tn.normalize_sentence("8:30") == "八点三十分"
    assert tn.normalize_sentence("12:05") == "十二点零五分"
    assert tn.normalize_sentence("9:00") == "九点整"
    assert "至" in tn.normalize_sentence("9:00-10:30")


def test_temperature_percent_frac():
    assert tn.normalize_sentence("-3°C") == "零下三摄氏度"
    assert tn.normalize_sentence("50%") == "百分之五十"
    assert tn.normalize_sentence("-20%") == "负百分之二十"
    assert tn.normalize_sentence("3/4") == "四分之三"


def test_phone():
    out = tn.normalize_sentence("13812345678")
    assert out == "幺三八幺二三四五六七八"


def test_numbers_and_quantifiers():
    assert tn.normalize_sentence("我有2个苹果") == "我有两个苹果"
    assert tn.normalize_sentence("共123人") == "共一百二十三人"
    assert tn.normalize_sentence("3.14") == "三点一四"
    assert tn.normalize_sentence("-5") == "负五"
    assert tn.normalize_sentence("5-10") == "五至十"


def test_full_to_half():
    assert full_to_half("ＡＢＣ１２３") == "ABC123"


def test_sentence_split():
    parts = tn.split("你好，世界。再见！")
    assert parts == ["你好，", "世界。", "再见！"]


def test_normalize_pipeline():
    out = tn.normalize("今天2024年3月5日，气温-3°C。")
    assert "二零二四年三月五日" in out
    assert "零下三摄氏度" in out
