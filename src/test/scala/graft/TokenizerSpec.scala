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

  test("diacritic folding matches the utf8.map convention") {
    assert(Tokenizer.normalizeDiacritics("müller straße") === "mueller strasse")
  }

  test("control chars are NOT separators (reference parity)") {
    // the reference map marks only the listed bytes; \t and \n are word chars
    assert(Tokenizer.tokenize("a\tb") === Vector("a\tb"))
  }
}
