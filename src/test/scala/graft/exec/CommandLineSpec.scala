package graft.exec

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

class CommandLineSpec extends AnyFunSuite {

  private def check(p: Prop): Unit =
    assert(SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p).passed)

  test("plain words split on spaces") {
    assert(CommandLine.translate("iconv -f iso8859-1 -t utf-8") ==
      Seq("iconv", "-f", "iso8859-1", "-t", "utf-8"))
  }

  test("double quotes group") {
    assert(CommandLine.translate("""grep "hello world" -c""") ==
      Seq("grep", "hello world", "-c"))
  }

  test("single quotes group and preserve double quotes") {
    assert(CommandLine.translate("""sh -c 'echo "a b"'""") ==
      Seq("sh", "-c", """echo "a b""""))
  }

  test("empty quoted string is a token") {
    assert(CommandLine.translate("""cmd "" x""") == Seq("cmd", "", "x"))
  }

  test("adjacent quoted segments concatenate into one token") {
    assert(CommandLine.translate("""a"b c"d""") == Seq("ab cd"))
  }

  test("multiple spaces collapse") {
    assert(CommandLine.translate("a   b") == Seq("a", "b"))
  }

  test("empty and null input") {
    assert(CommandLine.translate("") == Seq.empty)
    assert(CommandLine.translate(null) == Seq.empty)
  }

  test("unbalanced quotes throw") {
    intercept[IllegalArgumentException](CommandLine.translate("""grep "oops"""))
    intercept[IllegalArgumentException](CommandLine.translate("grep 'oops"))
  }

  test("property: unquoted word lists round-trip") {
    val word = Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString)
    check(Prop.forAll(Gen.nonEmptyListOf(word)) { words =>
      CommandLine.translate(words.mkString(" ")) == words
    })
  }

  test("property: double-quoting every word round-trips") {
    val word = Gen.nonEmptyListOf(Gen.oneOf(Gen.alphaNumChar, Gen.const(' '))).map(_.mkString)
    check(Prop.forAll(Gen.nonEmptyListOf(word)) { words =>
      val line = words.map(w => "\"" + w + "\"").mkString(" ")
      CommandLine.translate(line) == words
    })
  }
}
