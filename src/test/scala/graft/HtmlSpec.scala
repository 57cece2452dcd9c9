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

  // ---- outlink extraction ([[HtmlLinks]] / extractLinks) ----

  import graft.plans.HtmlTextImpl.extractLinks

  test("links: document order, quoted single/double and unquoted values") {
    val hs = extractLinks(
      """<a href="/one">1</a><a href='/two'>2</a><a href=/three x=y>3</a>""")
    assert(hs.toSeq == Seq("/one", "/two", "/three"))
  }

  test("links: attribute name matches case-insensitively; non-href anchors skipped") {
    val hs = extractLinks(
      """<a HREF="/up">u</a><a name="x">no</a><a title="t" Href='/mix'>m</a>""")
    assert(hs.toSeq == Seq("/up", "/mix"))
  }

  test("links: script/style content and comments are not markup") {
    val hs = extractLinks(
      "<script>var s = \"<a href='/decoy'>d</a>\";</script>" +
        "<!-- <a href=\"/ghost\">g</a> --><style>a { content: '<a href=/css>'; }</style>" +
        "<a href=\"/real\">r</a>")
    assert(hs.toSeq == Seq("/real"))
  }

  test("links: only <a> contributes — link/img/area resource refs are not frontier edges") {
    val hs = extractLinks(
      """<link href="/style.css"><img src="/i.png"><area href="/map"><a href="/yes">y</a>""")
    assert(hs.toSeq == Seq("/yes"))
  }

  test("links: entity decode in attribute values; quoted '>' does not end the tag") {
    val hs = extractLinks(
      """<a data-x="a>b" href="/p?a=1&amp;b=2&#65;">e</a><a href="/q?r=1&unknown;">u</a>""")
    assert(hs.toSeq == Seq("/p?a=1&b=2A", "/q?r=1&unknown;"))
  }

  test("links: closing </a> never contributes; truncated input degrades") {
    assert(extractLinks("""</a><a href="/k">k</a>""").toSeq == Seq("/k"))
    assert(extractLinks("""<a href="/t">t""").toSeq == Seq("/t"))
    assert(extractLinks("""<a href="/unterminated""").toSeq == Seq("/unterminated"))
    // `href=` with nothing after it: empty value, same as `<a href=>`
    assert(extractLinks("<a href=").toSeq == Seq(""))
    assert(extractLinks("").toSeq == Seq.empty)
  }

  test("links: first href wins within a tag; empty href is kept as empty string") {
    assert(extractLinks("""<a href="/a" href="/b">x</a>""").toSeq == Seq("/a"))
    assert(extractLinks("""<a href="">x</a>""").toSeq == Seq(""))
  }

  test("expression surface: graft_html_links resolves in SQL over the registered session") {
    graft.plans.GraftExtensions.ensureRegistered(spark)
    import spark.implicits._
    val df = Seq((1L, "<a href='/x'>x</a><script>'<a href=/d>'</script><a href=\"/y\">y</a>"))
      .toDF("id", "html")
    df.createOrReplaceTempView("html_links_t")
    val r = spark.sql("SELECT graft_html_links(html) AS hs FROM html_links_t")
      .collect()(0).getSeq[String](0)
    assert(r == Seq("/x", "/y"))
  }
}
