package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.RangeJoin

/** Banded range join: exact equivalence with the naive theta join, a plan
  * free of nested loops, and the bounded-duplication cost model. */
class RangeJoinSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  private def ev: DataFrame =
    graft.queries.Tables.events(spark, "/root/testdata/sf0.001")

  test("bandJoin ≡ naive range join on events (no equi key)") {
    val errs = ev.filter($"event_type" === "error")
      .select($"event_id".as("error_id"), $"ts_us".as("e_ts"))
    val purch = ev.filter($"event_type" === "purchase")
      .select($"event_id".as("purchase_id"), $"ts_us".as("p_ts"))
    val band = 30L * 60 * 1000000
    val fast = RangeJoin.bandJoin(errs, "e_ts", purch, "p_ts", 1L, band + 1)
      .select("error_id", "purchase_id")
    val naive = errs.join(purch,
        $"p_ts" - $"e_ts" >= 1L && $"p_ts" - $"e_ts" < band + 1)
      .select("error_id", "purchase_id")
    assert(fast.count() > 0, "the sf0.001 corpus must produce matches")
    assert(fast.exceptAll(naive).isEmpty && naive.exceptAll(fast).isEmpty,
      "banded result must equal the naive theta join exactly (incl. multiplicity)")
  }

  test("banded plan is a hash/merge join — never a nested loop") {
    val l = spark.range(100).select($"id".as("lid"), ($"id" * 1000L).as("lt"))
    val r = spark.range(100).select($"id".as("rid"), ($"id" * 999L).as("rt"))
    val j = RangeJoin.bandJoin(l, "lt", r, "rt", 0L, 5000L)
    val plan = j.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoop") && !plan.contains("Cartesian"), plan)
    // the same predicate WITHOUT binning nested-loops — the point of the op
    val naive = l.join(r, $"rt" - $"lt" >= 0L && $"rt" - $"lt" < 5000L)
    assert(naive.queryExecution.executedPlan.toString.contains("BroadcastNestedLoop"))
  }

  test("narrower bins multiply copies but never change the result") {
    val l = spark.range(50).select($"id".as("lid"), ($"id" * 777L % 10000L).as("lt"))
    val r = spark.range(80).select($"id".as("rid"), ($"id" * 333L % 10000L).as("rt"))
    val wide = RangeJoin.bandJoin(l, "lt", r, "rt", -100L, 901L)
      .select("lid", "rid").collect().map(x => (x.getLong(0), x.getLong(1))).sorted
    val narrow = RangeJoin.bandJoin(l, "lt", r, "rt", -100L, 901L, binWidth = 100L)
      .select("lid", "rid").collect().map(x => (x.getLong(0), x.getLong(1))).sorted
    assert(wide.nonEmpty && wide.toSeq == narrow.toSeq)
  }

  test("optional equi keys tighten the buckets (per-user band ≡ q61 shape)") {
    val signup = ev.filter($"event_type" === "signup")
      .select($"user_id", $"event_id".as("signup_id"), $"ts_us".as("s_ts"))
    val purchase = ev.filter($"event_type" === "purchase")
      .select($"user_id", $"event_id".as("purchase_id"), $"ts_us".as("p_ts"))
    val band = 30L * 60 * 1000000
    val fast = RangeJoin.bandJoin(signup, "s_ts", purchase, "p_ts", 1L, band + 1,
      keys = Seq("user_id")).select("signup_id", "purchase_id")
    val naive = signup.join(purchase, Seq("user_id"))
      .filter($"p_ts" > $"s_ts" && $"p_ts" <= $"s_ts" + band)
      .select("signup_id", "purchase_id")
    assert(fast.exceptAll(naive).isEmpty && naive.exceptAll(fast).isEmpty)
  }

  test("intervalJoin ≡ naive overlap join, one row per qualifying pair") {
    val l = (0L until 60L).map(i => (i, i * 37L % 1000L)).map { case (i, s) => (i, s, s + i % 50L) }
      .toDF("lid", "ls", "le")
    val r = (0L until 70L).map(i => (i, i * 53L % 1000L)).map { case (i, s) => (i, s, s + i % 30L) }
      .toDF("rid", "rs", "re")
    val fast = RangeJoin.intervalJoin(l, "ls", "le", r, "rs", "re", binWidth = 40L)
      .select("lid", "rid").collect().map(x => (x.getLong(0), x.getLong(1))).sorted
    val naive = l.join(r, $"ls" <= $"re" && $"rs" <= $"le")
      .select("lid", "rid").collect().map(x => (x.getLong(0), x.getLong(1))).sorted
    assert(fast.nonEmpty && fast.toSeq == naive.toSeq,
      "overlap pairs must match exactly with no duplicates")
  }
}
