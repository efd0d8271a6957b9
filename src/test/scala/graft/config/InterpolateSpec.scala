package graft.config

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Properties}

class InterpolateSpec extends AnyFunSuite {

  test("substitutes {vars} in text") {
    assert(Interpolate("s3://{bucket}/{year}/x", Map("bucket" -> "b", "year" -> "2026"))
      == "s3://b/2026/x")
  }

  test("unknown variable is a hard named error (reference Q6 fixed)") {
    val e = intercept[ConfigError](Interpolate("{nope}", Map("a" -> "1")))
    assert(e.getMessage.contains("nope") && e.getMessage.contains("a"))
  }

  test("{{ }} escape literal braces (SQL with format_string survives)") {
    assert(Interpolate("fmt('{{}}', {x})", Map("x" -> "1")) == "fmt('{}', 1)")
    assert(Interpolate("{{not_a_var}}", Map.empty) == "{not_a_var}")
  }

  test("replacement values containing $ or braces are inserted verbatim") {
    assert(Interpolate("{v}", Map("v" -> "a$b\\c")) == "a$b\\c")
    assert(Interpolate("{v}", Map("v" -> "{w}")) == "{w}")
  }
}

/** ScalaCheck property suite (sbt runs Properties natively). */
object InterpolateProps extends Properties("Interpolate") {
  private val ident = Gen.identifier.map(_.take(10)).suchThat(_.nonEmpty)
  private val plain = Gen.alphaNumStr.map(_.take(20))

  property("var set round-trips through its own template") =
    Prop.forAllNoShrink(Gen.mapOf(Gen.zip(ident, plain)).map(_.take(5))) { vars =>
      val keys = vars.keys.toSeq
      val tpl = keys.map(k => s"{$k}").mkString("|")
      Interpolate(tpl, vars) == keys.map(vars).mkString("|")
    }

  property("text without braces is unchanged") =
    Prop.forAll(plain)(s => Interpolate(s, Map("a" -> "b")) == s)
}
