package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen

import graft.functions.CidFunctions._
import graft.operators.{PriorityDedup, RangeJoin}

/** Property-based checks from SURVEY.md §5's test plan: F1 idempotence,
  * F2 prefix-of-F1, W1 survivor invariants, U1+W1 row-count bounds,
  * J3 containment.
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  /** Drive a generator N times (scalatestplus isn't on the offline
    * classpath, so sampling is explicit). */
  private def forAllSamples[A](gen: Gen[A], n: Int = 15)(body: A => Unit): Unit = {
    val seed0 = org.scalacheck.rng.Seed(42L)
    Iterator.iterate(seed0)(_.next).take(n).foreach { seed =>
      gen.apply(Gen.Parameters.default, seed).foreach(body)
    }
  }

  private val codeGen: Gen[String] = for {
    letter <- Gen.alphaUpperChar
    digits <- Gen.choose(0, 99)
    dot <- Gen.oneOf("", f".$digits%02d".take(2))
    pad <- Gen.oneOf("", " ", "  ")
    lower <- Gen.oneOf(true, false)
  } yield {
    val s = f"$letter$digits%02d$dot"
    pad + (if (lower) s.toLowerCase else s) + pad
  }

  test("F1 normalizeCode is idempotent; F2 output is a prefix of F1 output") {
    forAllSamples(Gen.listOfN(30, codeGen)) { codes =>
      if (codes.nonEmpty) {
        val rows = codes.toDF("c").select(
          normalizeCode($"c").as("n1"),
          normalizeCode(normalizeCode($"c")).as("n2"),
          extractRootCategory($"c").as("root"))
          .collect()
        rows.foreach { r =>
          assert(r.getString(0) == r.getString(1)) // idempotent
          assert(r.getString(0).startsWith(r.getString(2))) // root is prefix
          assert(!r.getString(2).contains("."))
        }
      }
    }
  }

  test("W1: output keys distinct, survivor has max priority per key") {
    val rowGen = for {
      key <- Gen.choose(0, 8)
      fonte <- Gen.oneOf("Estruturada", "DATASUS")
      id <- Gen.choose(0, 1000)
    } yield (s"K$key", fonte, id)
    forAllSamples(Gen.listOfN(60, rowGen)) { rows =>
      if (rows.nonEmpty) {
        val df = rows.toDF("code", "fonte", "id")
        val out = PriorityDedup(df, Seq("code"),
            Seq($"fonte".desc, $"id".asc))
          .as[(String, String, Int)].collect()
        // keys distinct
        assert(out.map(_._1).distinct.length == out.length)
        // exactly the distinct input keys survive (U1+W1 count bound)
        assert(out.map(_._1).toSet == rows.map(_._1).toSet)
        // survivor carries the max fonte for its key
        val maxFonte = rows.groupBy(_._1).map { case (k, rs) =>
          k -> rs.map(_._2).max }
        out.foreach { case (k, f, _) => assert(f == maxFonte(k)) }
      }
    }
  }

  test("J3: every matched row is inside its matched range; " +
       "unmatched rows are outside every range") {
    val ranges = Seq(("A00", "A09", 0L), ("A20", "B50", 1L), ("C00", "C10", 2L))
      .toDF("lo", "hi", "ord")
    forAllSamples(Gen.listOfN(40, codeGen), n = 8) { codes =>
      if (codes.nonEmpty) {
        val items = codes.map(_.trim.toUpperCase).toDF("code")
        val out = RangeJoin.firstMatch(items, ranges, $"code", $"lo", $"hi",
            leftKey = Seq("code"), rangeOrder = $"ord")
          .select($"code", $"lo", $"hi")
          .collect()
        out.foreach { r =>
          val (code, lo, hi) = (r.getString(0), r.getString(1), r.getString(2))
          if (lo != null)
            assert(lo <= code && code <= hi)
          else {
            val inAny = Seq(("A00", "A09"), ("A20", "B50"), ("C00", "C10"))
              .exists { case (l, h) => l <= code && code <= h }
            assert(!inAny)
          }
        }
      }
    }
  }
}
