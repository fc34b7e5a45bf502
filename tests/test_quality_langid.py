"""Text-quality scalar functions + language-ID heuristic."""

import pytest
from pyspark.sql import functions as F

from hamerkop_spark.functions import langid as L
from hamerkop_spark.functions import quality as Q


def one(spark, col_fn, value):
    return spark.createDataFrame([(value,)], "s string").select(
        col_fn(F.col("s")).alias("v")
    ).collect()[0]["v"]


def test_punct_ratio(spark):
    assert one(spark, Q.punct_ratio, "ab..") == pytest.approx(0.5)
    assert one(spark, Q.punct_ratio, "") == 0.0


def test_stopword_ratio(spark):
    assert one(spark, Q.stopword_ratio, "the dog and cat") == pytest.approx(0.5)


def test_mean_token_length(spark):
    assert one(spark, Q.mean_token_length, "ab abcd") == pytest.approx(3.0)


def test_bpe_token_count(spark):
    # 'hello,  world42' -> hello , world 42
    assert one(spark, Q.bpe_token_count, "hello,  world42") == 4


def test_fingerprint_normalization(spark):
    a = one(spark, Q.fingerprint, "Hello,   World!")
    b = one(spark, Q.fingerprint, "hello world")
    assert a == b
    import hashlib
    assert a == hashlib.md5(b"hello world").hexdigest()


def test_quality_score_ordering(spark):
    good = ("the committee discussed the annual report and the members "
            "agreed that the proposal was sound and the works continue") * 3
    bad = "$$$ 12345 !!! ### 99999 @@@"
    assert one(spark, Q.quality_score, good) > one(spark, Q.quality_score, bad)


@pytest.mark.parametrize("text,expected", [
    ("the cat and the dog is on the mat", "eng"),
    ("le chat et la souris et les oiseaux", "fra"),
    ("el gato y los perros y una casa", "spa"),
    ("der Hund und die Katze ist hier und der Mann", "deu"),
    ("Привет мир это тест на русском языке", "rus"),
    ("مرحبا بالعالم هذا اختبار", "ara"),
    ("你好世界这是一个测试", "zho"),
    ("ሰላም ለዓለም ይህ ሙከራ ነው", "amh"),
    # T17 widened coverage: scripts
    ("これはテストですこんにちは", "jpn"),
    ("東京タワーへようこそです", "jpn"),  # kanji + kana -> jpn, not cmn
    ("안녕하세요 세계 이것은 테스트입니다", "kor"),
    ("Γειά σου κόσμε αυτό είναι δοκιμή", "ell"),
    ("שלום עולם זה מבחן", "heb"),
    ("नमस्ते दुनिया यह एक परीक्षण है", "hin"),
    ("হ্যালো বিশ্ব এটি একটি পরীক্ষা", "ben"),
    ("வணக்கம் உலகம் இது ஒரு சோதனை", "tam"),
    ("హలో ప్రపంచం ఇది ఒక పరీక్ష", "tel"),
    ("สวัสดีชาวโลกนี่คือการทดสอบ", "tha"),
    ("გამარჯობა მსოფლიო ეს ტესტია", "kat"),
    ("Բարեւ աշխարհ սա փորձարկում է", "hye"),
    # script refinements (incl. ALL-CAPS: marker match must be
    # case-insensitive)
    ("Привіт світ це тест українською мовою і їжак", "ukr"),
    ("ВІТАЄМО У КИЄВІ ЇЖАК", "ukr"),
    ("سلام دنیا این یک آزمایش است و گچ پژ", "fas"),
    ("یہ ایک ٹیسٹ ہے اور ڈاک ہے", "urd"),
    # T17 widened coverage: Latin stopword languages
    ("o gato não é uma casa e os cães do mar", "por"),
    ("il gatto che corre è di casa e che bello", "ita"),
    ("het huis is een kat van de man en niet groot", "nld"),
    ("to się nie uda bo jest w domu się", "pol"),
    ("bu bir test ve bu ev için bir şey", "tur"),
    ("đây là của tôi và nó là không tốt", "vie"),
    ("ini yang terbaik dan ada di sini yang lain", "ind"),
    ("hii ni nzuri ya watu na kwa sababu ya hayo", "swa"),
    ("to je test a že se to na stole se povedlo", "ces"),
    ("aceasta este și un test să fie în regulă este", "ron"),
    ("ez és egy teszt nem az ami és egy ház", "hun"),
    ("det är ett test och att det är bra och fint", "swe"),
    ("det er en test og det er godt og fint til os", "dan"),
    ("tämä on testi ja se on hyvä ei että niin ja", "fin"),
])
def test_detect_lang(spark, text, expected):
    assert one(spark, L.detect_lang, text) == expected


def test_normalize_lang_code(spark):
    assert one(spark, L.normalize_lang_code, "en") == "eng"
    assert one(spark, L.normalize_lang_code, "zh-CN") == "zho"
    assert one(spark, L.normalize_lang_code, "eng") == "eng"
    assert one(spark, L.normalize_lang_code, "xx") == "xx"


def test_iso_map_matches_reference():
    """T16 differential: the full ISO 639-1 -> 639-3 table equals the
    reference's standard table (lang.py:10-195) on every entry, plus the
    zh-cn/zh-tw fold (lang.py:435-436)."""
    import re

    src = open("/root/reference/hamerkop/lang.py").read()
    m = re.search(r"ISO_MAPPING = \{(.*?)\}", src, re.S)
    ref = dict(re.findall(r"'([a-z-]+)':\s*'([a-z]+)'", m.group(1)))
    ours = dict(L.ISO1_TO_ISO3)
    assert ours.pop("zh-cn") == ref["zh"]
    assert ours.pop("zh-tw") == ref["zh"]
    assert ours == ref
