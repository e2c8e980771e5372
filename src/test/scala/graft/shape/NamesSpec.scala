package graft.shape

import org.scalatest.funsuite.AnyFunSuite

/** Identifier sanitization corpus (T2/T3) — the semantics of
  * table_helper.go:414-448 over the reference's naming edge cases
  * (naming_test.go:10 exercises long/unicode/special identifiers). */
class NamesSpec extends AnyFunSuite {

  test("plain identifiers pass through unquoted") {
    assert(Names.sanitize("user_id") == ("user_id", false))
    assert(Names.sanitize("A1_b2") == ("A1_b2", false))
  }

  test("allowed specials survive but force quoting") {
    assert(Names.sanitize("column. with, evil chars")._1 == "column_ with_ evil chars")
    assert(Names.sanitize("$part key!") == ("$part key_", true))
    assert(Names.sanitize("with space")._2 == true)
    assert(Names.sanitize("kebab-case")._2 == true)
  }

  test("unsupported characters collapse to underscore") {
    assert(Names.sanitize("a/b\\c")._1 == "a_b_c")
    assert(Names.sanitize("price(usd)")._1 == "price_usd_")
  }

  test("unicode letters are kept (they are \\p{L})") {
    assert(Names.sanitize("café")._1 == "café")
    assert(Names.sanitize("用户")._1 == "用户")
  }

  test("emoji and symbols sanitize away") {
    assert(Names.sanitize("a😀b")._1 == "a_b")
  }

  test("empty identifier becomes _unnamed") {
    assert(Names.sanitize("") == ("_unnamed", false))
  }

  test("identifier that sanitizes to nothing falls back to hashed name") {
    val (n, q) = Names.sanitize("!!!")
    assert(n.startsWith("column_") && n.length > 10 && !q)
    // deterministic
    assert(Names.sanitize("!!!")._1 == n)
  }

  test("truncation to the dialect max length") {
    val long = "x" * 200
    assert(Names.sanitize(long, maxLength = 63)._1.length == 63)
    assert(Names.sanitize(long, maxLength = 128)._1.length == 128)
  }

  test("case normalization modes") {
    assert(Names.normalizeCase("MiXeD", Names.LowerCase) == "mixed")
    assert(Names.normalizeCase("MiXeD", Names.UpperCase) == "MIXED")
    assert(Names.normalizeCase("MiXeD", Names.KeepCase) == "MiXeD")
    assert(Names.column("Weird Né!", Names.LowerCase) == "weird né_")
  }
}
