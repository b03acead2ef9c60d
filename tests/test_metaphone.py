"""Double Metaphone (Philips 2000) — known vectors + Spark level wiring.

reference: splink/files/spark_jars/scala-udf-similarity-*.jar
(DoubleMetaphone / DoubleMetaphoneAlt), surfaced via
splink/comparison_level_library.py::distance_function_level.
"""

from __future__ import annotations

import pytest

from splink_spark.functions.metaphone import double_metaphone as dm

# published-algorithm vectors (Philips 2000 examples + the standard
# test pairs circulated with public-domain ports)
VECTORS = {
    "smith": ("SM0", "XMT"),
    "schmidt": ("XMT", "SMT"),
    "snider": ("SNTR", "XNTR"),
    "schneider": ("XNTR", "SNTR"),
    "jose": ("HS", "HS"),
    "xavier": ("SF", "SFR"),
    "katherine": ("K0RN", "KTRN"),
    "catherine": ("K0RN", "KTRN"),
    "knight": ("NT", "NT"),
    "night": ("NT", "NT"),
    "wright": ("RT", "RT"),
    "thomas": ("TMS", "TMS"),
    "michael": ("MKL", "MXL"),
    "filipowicz": ("FLPT", "FLPF"),
    "school": ("SKL", "SKL"),
    "edge": ("AJ", "AJ"),
    "edgar": ("ATKR", "ATKR"),
    "caesar": ("SSR", "SSR"),
    "chianti": ("KNT", "KNT"),
    "zhao": ("J", "J"),
    "wasserman": ("ASRM", "FSRM"),
    "arnow": ("ARN", "ARNF"),
}


@pytest.mark.parametrize("word,expected", sorted(VECTORS.items()))
def test_known_vectors(word, expected):
    assert dm(word) == expected


def test_homophones_share_a_code():
    for a, b in [
        ("smith", "smyth"),
        ("knight", "night"),
        ("catherine", "katherine"),
        ("philip", "filip"),
    ]:
        pa, sa = dm(a)
        pb, sb = dm(b)
        assert {pa, sa} & {pb, sb}, (a, b, (pa, sa), (pb, sb))


def test_edge_inputs():
    assert dm(None) == ("", "")
    assert dm("") == ("", "")
    assert dm("123!@#") == ("", "")
    assert dm("a") == ("A", "A")


def test_phonetic_level_on_spark(spark):
    from splink_spark.functions.comparators import phonetic_match_level
    from splink_spark.functions.udfs import register_udfs

    register_udfs(spark)
    df = spark.createDataFrame(
        [
            ("smith", "smyth", True),
            ("catherine", "katherine", True),
            ("smith", "jones", False),
        ],
        "name_l string, name_r string, want boolean",
    )
    lv = phonetic_match_level("name")
    got = df.selectExpr(f"({lv.condition}) AS hit", "want").collect()
    for r in got:
        assert r["hit"] == r["want"]


def test_soundex_variant_is_native():
    from splink_spark.functions.comparators import phonetic_match_level

    lv = phonetic_match_level("name", method="soundex")
    assert "soundex" in lv.condition


def test_metaphone_output_alphabet_and_length_properties():
    """Property: codes are <=4 chars drawn from the published output
    alphabet, for arbitrary printable input."""
    import random
    import string

    alphabet = set("APKSTJFXLMNR0H")
    rng = random.Random(99)
    for _ in range(2000):
        n = rng.randint(0, 12)
        s = "".join(
            rng.choice(string.ascii_letters + " -'àéîßœ123")
            for _ in range(n)
        )
        p, a = dm(s)
        assert len(p) <= 4 and len(a) <= 4, (s, p, a)
        assert set(p) <= alphabet and set(a) <= alphabet, (s, p, a)


def test_metaphone_deterministic_and_case_insensitive():
    import random
    import string

    rng = random.Random(5)
    for _ in range(500):
        s = "".join(
            rng.choice(string.ascii_lowercase) for _ in range(rng.randint(1, 10))
        )
        assert dm(s) == dm(s.upper()) == dm(s.title())
