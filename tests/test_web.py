"""URL pipeline + line-filter edge semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from vega_spark.functions import web as W


def test_url_parts_and_normalize(spark):
    rows = [
        (1, "https://www.Example.COM/a/b/?q=1#frag"),
        (2, "http://sub.example.com/a/b"),
        (3, "https://example.com"),          # bare host: empty path
        (4, "not a url"),                    # no match: empty parts
    ]
    df = spark.createDataFrame(rows, "id long, url string")
    got = {r.id: (r.host, r.dom, r.path, r.norm) for r in df.select(
        "id", W.url_host("url").alias("host"),
        W.url_registered_domain("url").alias("dom"),
        W.url_path("url").alias("path"),
        W.url_normalize("url").alias("norm")).collect()}
    assert got[1] == ("www.example.com", "example.com", "/a/b/",
                      "example.com/a/b")
    assert got[2] == ("sub.example.com", "example.com", "/a/b",
                      "sub.example.com/a/b")
    assert got[3] == ("example.com", "example.com", "", "example.com")
    assert got[4] == ("", "", "", "")


def test_blocklist_and_keep_best(spark):
    rows = [
        (1, "https://spam.bad.com/x", 10),
        (2, "https://ok.com/x", 5),
        (3, "http://www.ok.com/x/", 9),      # same canonical page as 2
        (4, "https://ok.com/y", 1),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string, quality int")
    kept = W.filter_blocked_domains(df, ["bad.com"])
    assert {r.doc_id for r in kept.collect()} == {2, 3, 4}
    best = W.url_dedup_keep_best(kept, "url", "quality", "doc_id")
    assert {r.doc_id for r in best.collect()} == {3, 4}  # 3 beats 2


def test_line_filter_rules_and_empty_doc(spark):
    rows = [
        (1, "this line is long enough to keep\nshort\n123456789012345678\n"
            "another decently long line here"),
        (2, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in
           W.line_filter(df, "text", min_chars=15, min_words=3,
                         max_digit_ratio=0.5).collect()}
    # doc 1: 4 lines; 'short' fails min_chars, the digit run fails
    # both word count and digit ratio
    assert out[1].n_lines == 4 and out[1].n_kept == 2
    assert out[1].clean_text == ("this line is long enough to keep\n"
                                 "another decently long line here")
    assert out[1].kept_ratio == 0.5
    # empty doc: split('') -> [''], nothing kept, ratio 0, no div-by-0
    assert out[2].n_kept == 0 and out[2].clean_text == ""
    assert out[2].kept_ratio == 0.0


def test_line_dedup_corpus_global_rule(spark):
    # 'footer' appears in 3 docs (> max_doc_freq=2) -> dropped from
    # ALL of them, even where it repeats within one doc; 'shared'
    # appears in exactly 2 docs -> kept; line order preserved; a doc
    # losing every line survives with empty text and ratio 0.
    rows = [
        (1, "alpha\nfooter\nbravo"),
        (2, "footer\nshared\nfooter"),
        (3, "charlie\nfooter\nshared"),
        (4, "footer"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in W.line_dedup_corpus(
        df, "text", "doc_id", max_doc_freq=2).collect()}
    assert out[1].clean_text == "alpha\nbravo"
    assert (out[1].n_lines, out[1].n_kept) == (3, 2)
    assert out[2].clean_text == "shared"
    assert (out[2].n_lines, out[2].n_kept) == (3, 1)
    assert out[3].clean_text == "charlie\nshared"
    assert out[4].clean_text == "" and out[4].n_kept == 0
    assert out[4].kept_ratio == 0.0
    # within-doc repetition alone (2 distinct docs) is NOT boilerplate
    assert "shared" in out[2].clean_text and "shared" in out[3].clean_text


def test_strip_html_drops_script_style_keeps_blocks(spark):
    from pyspark.sql import functions as F
    from vega_spark.functions.web import extract_main_text
    html = ('<html><head><script>var x = "<p>evil</p>";</script>'
            '<style>.a{}</style></head><body><p>Hello &amp; welcome</p>'
            '<div>Second   block</div><br>Tail</body></html>')
    df = spark.createDataFrame([(1, html)], "id int, html string")
    r = extract_main_text(df, "html").first()
    assert r.main_text == "Hello & welcome\nSecond block\nTail"
    assert r.html_chars == len(html)
    assert r.text_chars == len(r.main_text)
    assert 0 < r.text_density < 1


def test_strip_html_entities_and_collapse(spark):
    from vega_spark.functions.web import strip_html
    from pyspark.sql import functions as F
    df = spark.createDataFrame(
        [("a &lt;b&gt; &quot;c&quot;&nbsp;d   e",)], "h string")
    got = df.select(strip_html("h").alias("t")).first().t
    assert got == 'a <b> "c" d e'
