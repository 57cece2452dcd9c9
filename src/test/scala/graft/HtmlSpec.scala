package graft

import graft.plans.HtmlTextImpl.{extract, Stats}

/** The HTML visible-text extractor's hazard ladder — each case is a
  * real-world crawl shape that breaks naive regex strippers.
  */
class HtmlSpec extends SparkSuiteBase {

  test("basic extraction: tags stripped, text normalized, counts exact") {
    val s = extract("<html><body><h1>Hello</h1>\n  <p>world  now</p></body></html>")
    assert(s == Stats("Hello world now", 0, 0, 8))
  }

  test("script/style content is raw: embedded < and '<p>' literals do not derail parsing") {
    val s = extract(
      "<p>a</p><script>if (1 < 2) { console.log(\"<p>not text</p>\"); }</script><p>b</p>")
    assert(s.text == "a b")
    assert(s.scripts == 1)
    // p, /p, script, /script, p, /p
    assert(s.tags == 6)
    val st = extract("<style>h1 { content: \"<fake>\"; }</style><b>kept</b>")
    assert(st.text == "kept" && st.scripts == 0 && st.tags == 4)
  }

  test("a close-tag prefix inside raw content does not close it") {
    val s = extract("<script>var endScriptTag = '</scripttish>'; </script><i>t</i>")
    assert(s.text == "t")
    assert(s.tags == 4)
  }

  test("quoted attribute values may contain '>'") {
    val s = extract("""<p data-x="a>b" title='c>d'>kept</p>""")
    assert(s == Stats("kept", 0, 0, 2))
  }

  test("comments and doctype are skipped and not counted as tags") {
    val s = extract("<!DOCTYPE html><!-- <p>ghost</p> --><p>real</p>")
    assert(s == Stats("real", 0, 0, 2))
  }

  test("entities decode; malformed ones pass through literally") {
    val s = extract("<p>&lt;tag&gt; &amp; &quot;q&quot; &apos;a&apos; &#65;&#66; x&nbsp;y</p>")
    assert(s.text == "<tag> & \"q\" 'a' AB x y")
    assert(extract("<p>&notathing; &#; &#xyz; & bare</p>").text == "&notathing; &#; &#xyz; & bare")
  }

  test("surrogate-range numeric entities pass through literally (never a lone surrogate)") {
    // U+D800–U+DFFF are not scalar values: decoding one would embed a lone
    // surrogate whose UTF-8 bytes (and md5) are replacement-dependent —
    // they take the malformed-entity policy instead
    val t = extract("<p>&#55296; &#57343; mid &#55999;</p>").text
    assert(t == "&#55296; &#57343; mid &#55999;")
    assert(!t.exists(c => Character.isSurrogate(c)))
    // the boundary neighbors still decode (U+D7FF, U+E000)
    assert(extract("<p>&#55295;&#57344;</p>").text == "퟿")
    // astral code points (legitimately ENCODED as surrogate pairs) still decode
    assert(extract("<p>&#128512;</p>").text == new String(Character.toChars(128512)))
  }

  test("anchors count opening tags only; extra anchors add text") {
    val s = extract("""<a href="/1">one</a> mid <a href="/2">two</a>""")
    assert(s.text == "one mid two")
    assert(s.links == 2 && s.tags == 4)
  }

  test("truncated input degrades without throwing") {
    assert(extract("<p>abc<").text == "abc")
    assert(extract("<p>abc<scr").text == "abc")
    assert(extract("<script>never closed").text == "")
    assert(extract("<!-- never closed").text == "")
    assert(extract("").text == "")
  }

  test("expression surface: graft_html_stats resolves in SQL over the registered session") {
    graft.plans.GraftExtensions.ensureRegistered(spark)
    import spark.implicits._
    val df = Seq((1L, "<h1>Hi</h1><a href='x'>l</a>")).toDF("id", "html")
    df.createOrReplaceTempView("html_t")
    val r = spark.sql(
      "SELECT graft_html_stats(html).text AS t, graft_html_stats(html).n_links AS l FROM html_t")
      .collect()(0)
    assert(r.getString(0) == "Hi l" && r.getLong(1) == 1L)
  }
}
