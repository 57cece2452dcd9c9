package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** `graft_html_stats(html)` — REAL HTML visible-text extraction in ONE
  * pass per row: a hand-rolled state machine, no HTML library, returning
  * `STRUCT<text, n_links, n_scripts, n_tags>`. This is the canonical
  * crawl→corpus extraction step a training-data pipeline runs before any
  * text analysis, and the usual hazards are handled the way a real parser
  * must:
  *
  *  - `<script>`/`<style>` CONTENT is skipped raw until the matching close
  *    tag — an embedded `1 < 2` or a `"<p>"` string literal inside script
  *    must not derail tag parsing;
  *  - quoted attribute values may contain `>` (`data-x="a>b"`) — the tag
  *    scanner tracks quote state;
  *  - comments (`<!-- -->`) and markup declarations (`<!DOCTYPE>`) are
  *    skipped, not counted as tags;
  *  - character entities decode (`&amp; &lt; &gt; &quot; &apos; &nbsp;`
  *    and decimal `&#NN;`); malformed ones pass through literally;
  *  - the extracted text is whitespace-NORMALIZED (tag boundaries become
  *    separators, runs collapse to one space, trimmed) so the output is
  *    deterministic regardless of markup layout.
  *
  * Scale: evaluates inside the scan projection (CodegenFallback — the
  * char loop stays one interpreted call inside the surrounding
  * whole-stage-codegen'd stage), so extracting a 100 TB crawl is a narrow
  * pass with no shuffle; only the extracted text/stats continue.
  * `n_links` (anchor count) and `n_scripts` are the cheap page-quality
  * signals (link farms, script-heavy chrome) curation gates filter on.
  */
case class HtmlStats(child: Expression) extends UnaryExpression with CodegenFallback {

  override def prettyName: String = "graft_html_stats"

  override def dataType: DataType = StructType(Seq(
    StructField("text", StringType, nullable = false),
    StructField("n_links", LongType, nullable = false),
    StructField("n_scripts", LongType, nullable = false),
    StructField("n_tags", LongType, nullable = false)))

  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects STRING, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any = {
    val s = HtmlTextImpl.extract(input.asInstanceOf[UTF8String].toString)
    InternalRow(UTF8String.fromString(s.text), s.links, s.scripts, s.tags)
  }

  override protected def withNewChildInternal(newChild: Expression): HtmlStats =
    copy(child = newChild)
}

/** `graft_html_links(html)` — outlink (anchor `href`) extraction in ONE
  * pass per row, the crawl-frontier/link-graph side of what
  * [[HtmlStats]] does for visible text: returns `ARRAY<STRING>` of the
  * `href` attribute values of opening `<a>` tags, in document order,
  * entity-decoded the way a browser decodes attribute values
  * (`&amp;` → `&` inside a query string). The same real-parser hazards
  * are load-bearing:
  *
  *  - an `<a href=...>` inside `<script>`/`<style>` content or an HTML
  *    comment is NOT a link — raw-content and comment spans are skipped
  *    with the identical scan rules as the text extractor;
  *  - attribute values may be double-quoted, single-quoted, or unquoted
  *    (`href=/p/1`), and a quoted value may contain `>`;
  *  - the attribute NAME matches case-insensitively (`HREF="..."`), and
  *    a bare `<a name="x">` anchor with no href contributes nothing;
  *  - only `<a>` opening tags contribute — `<link href>`/`<img src>`
  *    are resource references, not frontier edges.
  *
  * Scale: evaluates inside the scan projection (CodegenFallback within
  * the surrounding whole-stage-codegen'd stage) — link extraction over
  * a 100 TB crawl is a narrow pass where the page bytes already are;
  * only the (page, href) pairs continue to resolution/canonicalization.
  */
case class HtmlLinks(child: Expression) extends UnaryExpression with CodegenFallback {

  override def prettyName: String = "graft_html_links"

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects STRING, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any = {
    val hrefs = HtmlTextImpl.extractLinks(input.asInstanceOf[UTF8String].toString)
    val out = new Array[Any](hrefs.length)
    var i = 0
    while (i < hrefs.length) { out(i) = UTF8String.fromString(hrefs(i)); i += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): HtmlLinks =
    copy(child = newChild)
}

private[graft] object HtmlTextImpl {

  case class Stats(text: String, links: Long, scripts: Long, tags: Long)

  def extract(html: String): Stats = {
    val out = new java.lang.StringBuilder(html.length)
    var links = 0L
    var scripts = 0L
    var tags = 0L
    var i = 0
    val n = html.length
    def matches(off: Int, pat: String): Boolean =
      html.regionMatches(true, off, pat, 0, pat.length)
    while (i < n) {
      val c = html.charAt(i)
      if (c == '<') {
        if (matches(i, "<!--")) {
          val e = html.indexOf("-->", i + 4)
          i = if (e < 0) n else e + 3
          out.append(' ')
        } else if (matches(i, "<!")) {
          val e = html.indexOf('>', i)
          i = if (e < 0) n else e + 1
          out.append(' ')
        } else {
          var j = i + 1
          val closing = j < n && html.charAt(j) == '/'
          if (closing) j += 1
          val nameStart = j
          while (j < n && html.charAt(j).isLetterOrDigit) j += 1
          val name = html.substring(nameStart, j).toLowerCase
          // scan to the tag's real end: a '>' inside a quoted attribute
          // value does not terminate the tag
          var quote: Char = 0
          var k = j
          var end = -1
          while (k < n && end < 0) {
            val ch = html.charAt(k)
            if (quote != 0) { if (ch == quote) quote = 0 }
            else if (ch == '"' || ch == '\'') quote = ch
            else if (ch == '>') end = k
            k += 1
          }
          val tagEnd = if (end < 0) n else end + 1
          if (name.nonEmpty) tags += 1
          if (!closing && name == "a") links += 1
          if (!closing && (name == "script" || name == "style")) {
            if (name == "script") scripts += 1
            // raw-content element: everything until the matching close tag
            // is NOT markup — skip it verbatim
            val closeTag = "</" + name
            var m = tagEnd
            var found = -1
            while (m < n && found < 0) {
              // the close tag must END here too: "</scriptt>" is not a
              // close tag for <script> (per the HTML parsing spec, the
              // name must be followed by '>', '/', or whitespace)
              if (html.charAt(m) == '<' && matches(m, closeTag) && {
                val after = m + closeTag.length
                after >= n || html.charAt(after) == '>' ||
                  html.charAt(after) == '/' ||
                  Character.isWhitespace(html.charAt(after))
              }) found = m
              m += 1
            }
            if (found < 0) i = n
            else {
              val e2 = html.indexOf('>', found)
              i = if (e2 < 0) n else e2 + 1
              tags += 1 // the close tag itself
            }
          } else i = tagEnd
          out.append(' ')
        }
      } else if (c == '&') {
        val semi = html.indexOf(';', i + 1)
        val decoded: String =
          if (semi < 0 || semi - i > 10) null
          else html.substring(i + 1, semi) match {
            case "amp" => "&"
            case "lt" => "<"
            case "gt" => ">"
            case "quot" => "\""
            case "apos" => "'"
            case "nbsp" => " "
            case e if e.length > 1 && e.charAt(0) == '#' &&
                e.substring(1).forall(_.isDigit) =>
              val cp = try e.substring(1).toInt catch { case _: Exception => -1 }
              // surrogate code points (U+D800-U+DFFF) are not scalar
              // values: Character.toChars would embed a lone surrogate,
              // making the extracted string's UTF-8 bytes (and md5)
              // replacement-dependent — pass the entity through literally,
              // the same policy as any other malformed entity
              if (cp >= 0 && Character.isValidCodePoint(cp) && cp != 0 &&
                  !(cp >= 0xD800 && cp <= 0xDFFF))
                new String(Character.toChars(cp))
              else null
            case _ => null
          }
        if (decoded != null) { out.append(decoded); i = semi + 1 }
        else { out.append(c); i += 1 }
      } else {
        out.append(c)
        i += 1
      }
    }
    // whitespace-normalize: runs (incl. tag-boundary separators and
    // markup newlines) collapse to single spaces, trimmed
    val raw = out.toString
    val norm = new java.lang.StringBuilder(raw.length)
    var sawSpace = false
    var p = 0
    while (p < raw.length) {
      val ch = raw.charAt(p)
      if (Character.isWhitespace(ch)) sawSpace = true
      else {
        if (sawSpace && norm.length > 0) norm.append(' ')
        norm.append(ch)
        sawSpace = false
      }
      p += 1
    }
    Stats(norm.toString, links, scripts, tags)
  }

  /** Entity decode for ATTRIBUTE values — same entity set and same
    * malformed-pass-through / surrogate-rejection policy as the text
    * path above (an `href="/p?a=1&amp;b=2"` must yield `a=1&b=2`).
    */
  private def decodeEntities(raw: String): String = {
    if (raw.indexOf('&') < 0) return raw
    val out = new java.lang.StringBuilder(raw.length)
    var i = 0
    val n = raw.length
    while (i < n) {
      val c = raw.charAt(i)
      if (c == '&') {
        val semi = raw.indexOf(';', i + 1)
        val decoded: String =
          if (semi < 0 || semi - i > 10) null
          else raw.substring(i + 1, semi) match {
            case "amp" => "&"
            case "lt" => "<"
            case "gt" => ">"
            case "quot" => "\""
            case "apos" => "'"
            case "nbsp" => " "
            case e if e.length > 1 && e.charAt(0) == '#' &&
                e.substring(1).forall(_.isDigit) =>
              val cp = try e.substring(1).toInt catch { case _: Exception => -1 }
              if (cp >= 0 && Character.isValidCodePoint(cp) && cp != 0 &&
                  !(cp >= 0xD800 && cp <= 0xDFFF))
                new String(Character.toChars(cp))
              else null
            case _ => null
          }
        if (decoded != null) { out.append(decoded); i = semi + 1 }
        else { out.append(c); i += 1 }
      } else { out.append(c); i += 1 }
    }
    out.toString
  }

  /** One-pass anchor-href extraction — the [[HtmlLinks]] engine. The tag
    * walk (comment/declaration skip, quote-aware tag-end scan, raw
    * `<script>`/`<style>` content skip) is deliberately rule-identical
    * to [[extract]]'s so the two passes agree on what is markup; this
    * pass additionally tokenizes the attribute list of each opening
    * `<a>` tag (quoted/unquoted values, case-insensitive names) and
    * collects the entity-decoded `href`, preserving document order.
    */
  def extractLinks(html: String): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    val n = html.length
    def matches(off: Int, pat: String): Boolean =
      html.regionMatches(true, off, pat, 0, pat.length)
    while (i < n) {
      if (html.charAt(i) == '<') {
        if (matches(i, "<!--")) {
          val e = html.indexOf("-->", i + 4)
          i = if (e < 0) n else e + 3
        } else if (matches(i, "<!")) {
          val e = html.indexOf('>', i)
          i = if (e < 0) n else e + 1
        } else {
          var j = i + 1
          val closing = j < n && html.charAt(j) == '/'
          if (closing) j += 1
          val nameStart = j
          while (j < n && html.charAt(j).isLetterOrDigit) j += 1
          val name = html.substring(nameStart, j).toLowerCase
          var quote: Char = 0
          var k = j
          var end = -1
          while (k < n && end < 0) {
            val ch = html.charAt(k)
            if (quote != 0) { if (ch == quote) quote = 0 }
            else if (ch == '"' || ch == '\'') quote = ch
            else if (ch == '>') end = k
            k += 1
          }
          val tagEnd = if (end < 0) n else end + 1
          val attrEnd = if (end < 0) n else end
          if (!closing && name == "a") {
            // attribute walk over [j, attrEnd): name [= value]
            var p = j
            var href: String = null
            while (p < attrEnd && href == null) {
              while (p < attrEnd && (Character.isWhitespace(html.charAt(p)) ||
                html.charAt(p) == '/')) p += 1
              val aStart = p
              while (p < attrEnd && html.charAt(p) != '=' &&
                !Character.isWhitespace(html.charAt(p)) &&
                html.charAt(p) != '/') p += 1
              val aName = html.substring(aStart, p).toLowerCase
              while (p < attrEnd && Character.isWhitespace(html.charAt(p))) p += 1
              var value: String = null
              if (p < attrEnd && html.charAt(p) == '=') {
                p += 1
                while (p < attrEnd && Character.isWhitespace(html.charAt(p))) p += 1
                if (p < attrEnd && (html.charAt(p) == '"' || html.charAt(p) == '\'')) {
                  val q = html.charAt(p)
                  val vStart = p + 1
                  var vEnd = vStart
                  while (vEnd < attrEnd && html.charAt(vEnd) != q) vEnd += 1
                  value = html.substring(vStart, vEnd)
                  p = math.min(vEnd + 1, attrEnd)
                } else {
                  val vStart = p
                  while (p < attrEnd && !Character.isWhitespace(html.charAt(p))) p += 1
                  value = html.substring(vStart, p)
                }
              }
              if (aName == "href" && value != null) href = decodeEntities(value)
              if (aStart == p) p += 1 // safety: always advance
            }
            if (href != null) out += href
          }
          if (!closing && (name == "script" || name == "style")) {
            val closeTag = "</" + name
            var m = tagEnd
            var found = -1
            while (m < n && found < 0) {
              if (html.charAt(m) == '<' && matches(m, closeTag) && {
                val after = m + closeTag.length
                after >= n || html.charAt(after) == '>' ||
                  html.charAt(after) == '/' ||
                  Character.isWhitespace(html.charAt(after))
              }) found = m
              m += 1
            }
            if (found < 0) i = n
            else {
              val e2 = html.indexOf('>', found)
              i = if (e2 < 0) n else e2 + 1
            }
          } else i = tagEnd
        }
      } else i += 1
    }
    out.toArray
  }
}
