package graft

import graft.plans.Utf8Impl.{stats, Stats}

/** The UTF-8 validator's boundary-condition ladder — every case is a
  * shape `new String(bytes, UTF_8)` would silently repair.
  */
class Utf8Spec extends SparkSuiteBase {

  private def b(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray

  test("ASCII, 2/3/4-byte sequences at their valid boundaries") {
    assert(stats("plain ascii".getBytes("UTF-8")) == Stats(11, 0, 0, 0))
    assert(stats(b(0xc2, 0x80)) == Stats(1, 0, 1, 0)) // U+0080, smallest 2-byte
    assert(stats(b(0xdf, 0xbf)) == Stats(1, 0, 1, 0)) // U+07FF, largest 2-byte
    assert(stats(b(0xe0, 0xa0, 0x80)) == Stats(1, 0, 1, 0)) // U+0800
    assert(stats(b(0xed, 0x9f, 0xbf)) == Stats(1, 0, 1, 0)) // U+D7FF, below surrogates
    assert(stats(b(0xee, 0x80, 0x80)) == Stats(1, 0, 1, 0)) // U+E000, above surrogates
    assert(stats(b(0xf0, 0x90, 0x80, 0x80)) == Stats(1, 0, 1, 0)) // U+10000
    assert(stats(b(0xf4, 0x8f, 0xbf, 0xbf)) == Stats(1, 0, 1, 0)) // U+10FFFF, the max
    // and against the JDK on real text
    val real = "héllo wörld € 𝄞".getBytes("UTF-8")
    val s = stats(real)
    assert(s.invalidBytes == 0 && s.validChars == "héllo wörld € 𝄞".codePointCount(0, 15))
  }

  test("overlong encodings are invalid, not decoded") {
    assert(stats(b(0xc0, 0x80)) == Stats(0, 2, 0, 0)) // overlong NUL
    assert(stats(b(0xc1, 0xbf)) == Stats(0, 2, 0, 0))
    assert(stats(b(0xe0, 0x9f, 0xbf)) == Stats(0, 3, 0, 0)) // overlong 3-byte
    assert(stats(b(0xf0, 0x8f, 0xbf, 0xbf)) == Stats(0, 4, 0, 0)) // overlong 4-byte
  }

  test("UTF-16 surrogates and post-U+10FFFF are invalid") {
    assert(stats(b(0xed, 0xa0, 0x80)).invalidBytes == 3) // U+D800
    assert(stats(b(0xed, 0xbf, 0xbf)).invalidBytes == 3) // U+DFFF
    assert(stats(b(0xf4, 0x90, 0x80, 0x80)).invalidBytes == 4) // U+110000
    assert(stats(b(0xf5, 0x80, 0x80, 0x80)).invalidBytes == 4)
    assert(stats(b(0xff)).invalidBytes == 1)
  }

  test("truncated sequences and lone continuations: one invalid byte each, resync after") {
    assert(stats(b(0xc2)) == Stats(0, 1, 0, 0))
    assert(stats(b(0xe2, 0x82)) == Stats(0, 2, 0, 0)) // lead + orphan continuation
    assert(stats(b(0x80, 0x80, 0x80)) == Stats(0, 3, 0, 0))
    // invalid byte mid-text resynchronizes: surrounding chars still count
    assert(stats("ab".getBytes ++ b(0x80) ++ "cd".getBytes) == Stats(4, 1, 0, 0))
  }

  test("control counting: C0 minus whitespace, plus DEL") {
    assert(stats("a\tb\nc\rd".getBytes) == Stats(7, 0, 0, 0))
    assert(stats(b(0x07, 0x1b, 0x7f)) == Stats(3, 0, 0, 3)) // BEL, ESC, DEL
  }

  test("expression surface: graft_utf8_stats resolves in SQL") {
    graft.plans.GraftExtensions.ensureRegistered(spark)
    val r = spark.sql(
      "SELECT s.* FROM (SELECT graft_utf8_stats(unhex('41C2A2C080')) AS s)")
      .collect()(0)
    // 'A' + ¢ + overlong C0 80
    assert(r.getLong(0) == 2 && r.getLong(1) == 2 && r.getLong(2) == 1 &&
      r.getLong(3) == 0 && !r.getBoolean(4))
  }
}
