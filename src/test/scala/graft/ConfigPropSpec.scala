package graft

import java.time.{LocalDate, LocalDateTime, ZoneOffset}
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.config.{Profiles, Toml}
import graft.core.TimeParse

/** Property-based invariants for the config-layer parsers: timestamp
  * parsing inverts formatting for every accepted shape, env_var
  * resolution substitutes exactly the referenced variables, and the TOML
  * subset round-trips representative scalar/array/table values. */
class ConfigPropSpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(r.passed, r.status.toString)
  }

  private val genEpochSec = Gen.choose(0L, 4102444800L) // 1970..2100
  private val fmtDateTime = java.time.format.DateTimeFormatter
    .ofPattern("yyyy-MM-dd'T'HH:mm:ss")

  test("parseTimestamp inverts datetime formatting and passes digits through") {
    check(Prop.forAll(genEpochSec) { sec =>
      val dt = LocalDateTime.ofEpochSecond(sec, 0, ZoneOffset.UTC)
      TimeParse.parseTimestamp(dt.format(fmtDateTime)) == sec * 1000L &&
        TimeParse.parseTimestamp(dt.format(fmtDateTime).replace('T', ' ')) == sec * 1000L &&
        TimeParse.parseTimestamp((sec * 1000L).toString) == sec * 1000L
    })
    check(Prop.forAll(Gen.choose(0L, 47481L)) { days =>
      val d = LocalDate.ofEpochDay(days)
      TimeParse.parseTimestamp(d.toString) == days * 86400000L
    })
  }

  private val genVarName = Gen.nonEmptyListOf(Gen.alphaUpperChar).map(_.mkString)
  private val genValue = Gen.listOf(Gen.alphaNumChar).map(_.mkString)

  test("env_var resolution substitutes present vars, defaults absent ones") {
    check(Prop.forAll(genVarName, genValue, genValue) { (name, value, dflt) =>
      val env = Map(name -> value)
      Profiles.resolveEnvVars(s"pre-{{ env_var('$name') }}-post", env) == s"pre-$value-post" &&
        Profiles.resolveEnvVars(s"{{ env_var('${name}_MISSING', '$dflt') }}", env) == dflt &&
        Profiles.resolveEnvVars(s"{{ env_var('${name}_MISSING') }}", env) == "" &&
        Profiles.resolveEnvVars("no templates here", env) == "no templates here"
    })
  }

  private val genKey = Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString)
  private val genStr = Gen.listOf(Gen.frequency(
    8 -> Gen.alphaNumChar, 1 -> Gen.const(' '), 1 -> Gen.const('#'))).map(_.mkString)

  test("TOML subset round-trips strings, longs, arrays, and inline tables") {
    check(Prop.forAll(genKey, genStr, Gen.long, Gen.listOf(Gen.long)) { (k, s, n, xs) =>
      val doc =
        s"""[sec]
           |$k = "${s}"
           |num = $n
           |arr = [${xs.mkString(", ")}]
           |tbl = { inner = "${s}" }
           |""".stripMargin
      val t = Toml.parse(doc)
      Toml.str(Toml.at(t, "sec", k)).contains(s) &&
        Toml.num(Toml.at(t, "sec", "num")).contains(n) &&
        Toml.at(t, "sec", "arr").contains(Toml.Arr(xs.map(Toml.Num(_)))) &&
        Toml.str(Toml.at(t, "sec", "tbl", "inner")).contains(s)
    })
  }
}
