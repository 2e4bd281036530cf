"""Unit tests for the scalar expression library — edge cases from the
reference's defaulting semantics (SURVEY.md §5 item 2)."""

from __future__ import annotations

from pyspark.sql import functions as F

from realestatedeals_spark.functions import scalars as S


def one(spark, expr, **cols):
    row = spark.createDataFrame([cols]).select(expr.alias("v")).first()
    return row["v"]


def test_ppsqft_zero_guard(spark):
    # ure_scraping.py:197 — sqft=0 yields 0.0, not a divide error
    assert one(spark, S.ppsqft(F.col("p"), F.col("s")), p=100, s=0) == 0.0
    assert one(spark, S.ppsqft(F.col("p"), F.col("s")), p=100, s=50) == 2.0


def test_parse_price_branches(spark):
    assert one(spark, S.parse_price(F.col("x")), x="$1,234,567") == 1234567
    assert one(spark, S.parse_price(F.col("x")), x="garbage") == 0  # ure_scraping.py:77-80
    assert one(spark, S.parse_price(F.col("x")), x="$900.25") == 0  # non-integer → default


def test_name_split(spark):
    assert one(spark, S.split_name_first(F.col("x")), x="Jane Q Public") == "Jane"
    assert one(spark, S.split_name_last(F.col("x")), x="Jane Q Public") == "Q Public"
    # single-token name → empty last name (ure_scraping.py:122-125 join of [])
    assert one(spark, S.split_name_last(F.col("x")), x="Cher") == ""


def test_normalize_phone_four_branches(spark):
    f = lambda x: one(spark, S.normalize_phone(F.col("x")), x=x)
    assert f("8015551234") == "+18015551234"  # 10-digit
    assert f("18015551234") == "+18015551234"  # 11 starting with 1
    assert f("(801) 555-1234") == "+18015551234"  # formatted → digits → 10
    assert f("++44 20 7946 0958") == "++44 20 7946 0958"  # passthrough
    assert one(spark, S.normalize_phone(F.lit(None).cast("string"))) == ""  # NaN → ''


def test_address_parse(spark):
    parts = S.parse_address(F.col("x"))
    df = spark.createDataFrame([{"x": "123 Main St,  Salt Lake City, UT 84101"}])
    row = df.select(*(v.alias(k) for k, v in parts.items())).first()
    assert row["address"] == "123 Main St"
    assert row["city"] == "Salt Lake City"
    assert row["state"] == "UT"
    assert row["zip"] == "84101"


def test_city_tags_and_concat(spark):
    tagged = one(spark, S.city_tags(F.col("x")), x="Provo, Orem")
    assert tagged == "Provo Utah Market, Orem Utah Market"  # data_processing.py:27
    assert one(spark, S.tags_concat(F.col("x")), x="Provo") == "Provo, realtor"


def test_numeric_tail_and_strip(spark):
    assert one(spark, S.numeric_tail(F.col("x")), x="on ure 42") == 42
    assert one(spark, S.numeric_tail(F.col("x")), x="no digits") is None
    assert one(spark, S.strip_label(F.col("x"), "Type"), x="Type  Condo") == "Condo"


def test_price_change_pct(spark):
    assert one(spark, S.price_change_pct(F.col("n"), F.col("o")), n=110, o=100) == 10.0
    assert one(spark, S.price_change_pct(F.col("n"), F.col("o")), n=110, o=0) is None


def test_canonicalize_url_unit_cases(spark):
    """Generic URL canonicalizer edge cases beyond the registry fixture:
    https default port, non-default port preserved, root path, no query,
    utm-only query dropped entirely, param sort stability."""
    from realestatedeals_spark.functions.web import canonicalize_url

    cases = [
        ("HTTPS://Host.Example:443/", "https://host.example/"),
        ("https://host.example:8443/x", "https://host.example:8443/x"),
        ("http://a.b", "http://a.b/"),
        ("http://a.b/p/?utm_source=x&utm_medium=y", "http://a.b/p"),
        ("http://a.b/p?z=1&y=2&x=3#frag", "http://a.b/p?x=3&y=2&z=1"),
        ("http://A.B:80/p/q/", "http://a.b/p/q"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "url string")
    got = [r["c"] for r in df.select(canonicalize_url(F.col("url")).alias("c")).collect()]
    assert got == [want for _, want in cases]


def test_extract_main_text_adversarial_cases(spark):
    """Boilerplate stripper edge cases: </main> hidden inside a script is
    not a real boundary (scripts strip first), nested inline tags vanish,
    entities decode, and whitespace collapses."""
    from realestatedeals_spark.functions.web import extract_main_text

    cases = [
        (
            "<html><script>if(a<b){x='</main>'}</script>"
            "<main><p>real <b>bold</b> text</p></main></html>",
            "real bold text",
        ),
        (
            "<main><p>first</p>   <p>second &amp; third</p></main>",
            "first\nsecond & third",
        ),
        ("<main><p>a&lt;b &gt;c &quot;q&quot; &#39;s&#39;</p></main>", "a<b >c \"q\" 's'"),
        ("<body>no main region</body>", ""),
    ]
    df = spark.createDataFrame([(h,) for h, _ in cases], "html string")
    got = [r["t"] for r in df.select(extract_main_text(F.col("html")).alias("t")).collect()]
    assert got == [want for _, want in cases]


def test_html_extract_recovery_is_total(spark):
    from realestatedeals_spark.plans.llm_clean import x4_html_extract

    rows = x4_html_extract(spark, "/root/testdata/sf0.001").collect()
    assert rows and all(r["exact_recovery"] for r in rows)
