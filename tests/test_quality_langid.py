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
    ("你好世界这是一个测试", "cmn"),
    ("ሰላም ለዓለም ይህ ሙከራ ነው", "amh"),
])
def test_detect_lang(spark, text, expected):
    assert one(spark, L.detect_lang, text) == expected


def test_normalize_lang_code(spark):
    assert one(spark, L.normalize_lang_code, "en") == "eng"
    assert one(spark, L.normalize_lang_code, "zh-CN") == "cmn"
    assert one(spark, L.normalize_lang_code, "eng") == "eng"
    assert one(spark, L.normalize_lang_code, "xx") == "xx"
