package graft

import graft.core.Tokenizer
import org.scalatest.funsuite.AnyFunSuite

/** Tokenizer fixtures per FIXTURES.md §6: the reference separator set
  * (SimpleTextParser.cpp:12-13), underscore-as-word-char, multibyte
  * pass-through, locale-free lowercasing.
  */
class TokenizerSpec extends AnyFunSuite {

  test("separator set splits exactly like the reference map") {
    // every separator char splits; underscore does not
    assert(Tokenizer.tokenize("a!b\"c#d$e%f&g'h(i)j*k+l,m-n.o/p@q[r\\s]t^u{v|w}x~y:z") ===
      Vector("a","b","c","d","e","f","g","h","i","j","k","l","m","n","o","p","q","r","s","t","u","v","w","x","y","z"))
    assert(Tokenizer.tokenize("foo_bar baz") === Vector("foo_bar", "baz"))
    assert(Tokenizer.tokenize("a;b<c=d>e?f") === Vector("a","b","c","d","e","f"))
  }

  test("digits are word chars; empty runs are skipped") {
    assert(Tokenizer.tokenize("  x2  ...  y3  ") === Vector("x2", "y3"))
    assert(Tokenizer.tokenize("...") === Vector())
    assert(Tokenizer.tokenize("") === Vector())
    assert(Tokenizer.tokenize(null) === Vector())
  }

  test("lowercasing is ASCII-only and locale-free") {
    assert(Tokenizer.tokenize("HeLLo WORLD") === Vector("hello", "world"))
    // Turkish dotless-i trap: 'I' must map to 'i' regardless of locale
    assert(Tokenizer.toLowerAscii("III") === "iii")
    // non-ASCII passes through unchanged (no default-locale lowercase)
    assert(Tokenizer.tokenize("Müller") === Vector("mÜller".replace('Ü', 'ü')))
  }

  test("positions are 0-based dense over emitted tokens") {
    assert(Tokenizer.tokenizeWithPositions("a, b,, c") ===
      Vector(("a", 0), ("b", 1), ("c", 2)))
  }

  test("German transliteration option (NOT the reference map: ä->ae)") {
    assert(Tokenizer.normalizeDiacritics("müller straße") === "mueller strasse")
  }

  test("normalize: reference CONVERSION_TO_NORM samples") {
    // StringConverter.h documented sample
    assert(Tokenizer.normalize("René Descartes") === "rene descartes")
    // umlauts/ß/ø behavior straight from utility/utf8.map
    assert(Tokenizer.normalize("MÜLLER müller") === "müller müller") // Ü->ü (kept)
    assert(Tokenizer.normalize("straße") === "straße") // ß->ß
    assert(Tokenizer.normalize("Ørsted") === "orsted") // Ø->o (folded!)
    assert(Tokenizer.normalize("Łódź") === "lodz") // stroke + acute folded
    assert(Tokenizer.normalize("Ñoño") === "nono")
    assert(Tokenizer.normalize("İstanbul") === "istanbul") // dotted capital I
    assert(Tokenizer.normalize("čžš") === "czs")
    // controls are identity; codepoints > 2047 pass through
    assert(Tokenizer.normalize("a\tb") === "a\tb")
    assert(Tokenizer.normalize("北京 東京") === "北京 東京")
  }

  test("normalize matches the reference utf8.map on ALL 2,048 codepoints") {
    val mapFile = new java.io.File("/root/reference/src/utility/utf8.map")
    assume(mapFile.exists(), "reference map not present in this environment")
    val src = scala.io.Source.fromFile(mapFile, "UTF-8")
    try {
      var checked = 0
      src.getLines().foreach { ln =>
        if (ln.nonEmpty && !ln.startsWith("#")) {
          val f = ln.split("\t", -1)
          if (f.length == 11) {
            val cp = f(0).trim.toInt
            val normCp = f(5).trim.toInt
            val expected = new String(Character.toChars(normCp))
            val got = Tokenizer.normalize(new String(Character.toChars(cp)))
            assert(got === expected, s"cp=$cp: got ${got.map(_.toInt)} want $normCp")
            checked += 1
          }
        }
      }
      assert(checked === 2048)
    } finally src.close()
  }

  test("control chars are NOT separators (reference parity)") {
    // the reference map marks only the listed bytes; \t and \n are word chars
    assert(Tokenizer.tokenize("a\tb") === Vector("a\tb"))
  }
}
