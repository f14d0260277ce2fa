"""processor_desensitize_native — replay the reference C++ unittest
goldens (core/unittest/processor/ProcessorDesensitizeNativeUnittest.cpp).

Dialect vs the Go plugin: the regex is ``(begin)content`` with the md5
taken over the content span (ProcessorDesensitizeNative.cpp:110,
202-249), ReplacingAll defaults TRUE (ProcessorDesensitizeNative.h:48;
the unittest helper GetCastSensWordConfig passes false explicitly),
first-only mode is RE2::Replace (one occurrence), and the md5 hex is
UPPERCASE (CalcMD5). All cases use begin=``pwd=`` content=``[^,]+``.
"""

import pytest

from ilogtail_spark.operators.registry import OPERATORS


def _run(spark, value, **cfg):
    cfg.setdefault("SourceKey", "cast1")
    cfg.setdefault("ContentPatternBeforeReplacedString", "pwd=")
    cfg.setdefault("ReplacedContentPattern", "[^,]+")
    df = spark.createDataFrame([(value,)], "cast1 string")
    fn = OPERATORS["processor_desensitize_native"](**cfg)
    return fn(df).first()["cast1"]


M_SAF = "91F6CFCF46787E8A02082B58F7117AFA"  # md5("saf543#$@") upper
M_123 = "F190CE9AC8445D249747CAB7BE43F7D5"  # md5("12341")
M_123F = "2369B00C6DB80BF0794658225730FF0B"  # md5("12341f")

CONST_CASES = [
    # TestCastSensWordConst cases 1-5 (Unittest.cpp:298-537)
    ("asf@@@324 FS2$%pwd,pwd=saf543#$@,,", False,
     "asf@@@324 FS2$%pwd,pwd=********,,"),
    ("\r\n\r\nasf@@\n\n@324 FS2$%pwd,pwd=saf543#$@,,", False,
     "\r\n\r\nasf@@\n\n@324 FS2$%pwd,pwd=********,,"),
    ("asf@@@324 FS2$%pwd,pwd=saf543#$@,,pwd=12341,df", False,
     "asf@@@324 FS2$%pwd,pwd=********,,pwd=12341,df"),
    ("asf@@@324 FS2$%pwd,pwd=saf543#$@,,pwd=12341,df", True,
     "asf@@@324 FS2$%pwd,pwd=********,,pwd=********,df"),
    ("asf@@@324 FS2$%pwd,pwd=sdfpsw=543#$@,,pwd=12341,df", True,
     "asf@@@324 FS2$%pwd,pwd=********,,pwd=********,df"),
]

MD5_CASES = [
    # TestCastSensWordMD5 cases 1-9 (Unittest.cpp:538-985)
    ("asf@@@324 FS2$%pwd,pwd=saf543#$@,,", False,
     f"asf@@@324 FS2$%pwd,pwd={M_SAF},,"),
    ("pwd=saf543#$@,,pwd=12341,df", False,
     f"pwd={M_SAF},,pwd=12341,df"),
    ("pwdsaf543#$@,,pwd=12341", False,
     f"pwdsaf543#$@,,pwd={M_123}"),
    ("pwd=12341", False, f"pwd={M_123}"),
    ("asf@@@324 FS2$%pwd,pwd=saf543#$@,,pwd=12341,df", True,
     f"asf@@@324 FS2$%pwd,pwd={M_SAF},,pwd={M_123},df"),
    ("pwd=saf543#$@,,pwd=12341f", True,
     f"pwd={M_SAF},,pwd={M_123F}"),
    ("pwd=saf543#$@,,pwd=12341f,asfasf", True,
     f"pwd={M_SAF},,pwd={M_123F},asfasf"),
    ("asf@@@324 FS2$%pwd,pwd=saf543#$@,,", True,
     f"asf@@@324 FS2$%pwd,pwd={M_SAF},,"),
    ("asf@@@324 FS2$%pwd,\npwd=saf543#$@,,", True,
     f"asf@@@324 FS2$%pwd,\npwd={M_SAF},,"),
]


@pytest.mark.parametrize("value,rall,expect", CONST_CASES)
def test_const_goldens(spark, value, rall, expect):
    assert _run(spark, value, Method="const", ReplacingString="********",
                ReplacingAll=rall) == expect


@pytest.mark.parametrize("value,rall,expect", MD5_CASES)
def test_md5_goldens(spark, value, rall, expect):
    assert _run(spark, value, Method="md5", ReplacingAll=rall) == expect


def test_no_match_and_null_untouched(spark):
    """TestCastSensWordFail: no regex match (or key absent — modeled
    as a NULL cell) leaves the value untouched."""
    s = "asf@@@324 FS2$%psw,xyz=saf543#$@,,"
    assert _run(spark, s, Method="const", ReplacingString="********",
                ReplacingAll=False) == s
    assert _run(spark, s, Method="md5", ReplacingAll=False) == s
    assert _run(spark, None, Method="md5", ReplacingAll=True) is None


def test_replacing_all_defaults_true(spark):
    """ProcessorDesensitizeNative.h:48 — absent ReplacingAll means ALL."""
    out = _run(spark, "pwd=a,pwd=b,", Method="const",
               ReplacingString="*")
    assert out == "pwd=*,pwd=*,"
