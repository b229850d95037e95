package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.AsOfJoin

/** As-of join semantics: backward match at-or-before, per-key isolation,
  * no-match drop, tolerance bound, and the brute-force equivalence that
  * pins the window formulation against a naive range-join + argmax.
  */
class AsOfJoinSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  private def l = Seq(
    ("a", 10L, "p1"), ("a", 20L, "p2"), ("a", 5L, "p0"),
    ("b", 50L, "p3"), ("c", 7L, "p4")
  ).toDF("k", "t", "pid")

  private def r = Seq(
    ("a", 10L, "q10"), ("a", 15L, "q15"), ("a", 2L, "q2"),
    ("b", 60L, "q60")
  ).toDF("k", "t", "qid")

  test("backward as-of: latest right row at-or-before each left time") {
    val out = AsOfJoin.asof(l, r, "k", "t", "t")
      .select($"pid", $"matched.qid".as("qid"), $"matched.t".as("rt"))
      .collect().map(x => (x.getString(0), x.getString(1), x.getLong(2))).toSet
    // p1@10 matches q10@10 (ties include right row AT the left timestamp);
    // p2@20 → q15; p0@5 → q2; p3@50 has no prior b row; c has no right rows.
    assert(out == Set(("p1", "q10", 10L), ("p2", "q15", 15L), ("p0", "q2", 2L)))
  }

  test("tolerance bounds the look-back window") {
    val out = AsOfJoin.asof(l, r, "k", "t", "t", tolerance = Some(3L))
      .select($"pid", $"matched.qid".as("qid"))
      .collect().map(x => (x.getString(0), x.getString(1))).toSet
    // p2@20 → q15 is 5 ticks back > 3 ⇒ dropped; p0@5 → q2 is exactly 3 ⇒ kept
    assert(out == Set(("p1", "q10"), ("p0", "q2")))
  }

  test("NULL right time/key never matches (SQL join semantics, no phantom matches)") {
    val rWithNulls = Seq(
      ("a", Option.empty[Long], "qnull"), ("a", Some(15L), "q15"),
      (null.asInstanceOf[String], Some(1L), "qnullkey")
    ).toDF("k", "t", "qid")
    val out = AsOfJoin.asof(l, rWithNulls, "k", "t", "t")
      .select($"pid", $"matched.qid".as("qid"))
      .collect().map(x => (x.getString(0), x.getString(1))).toSet
    // p0@5 has no prior non-null right row ⇒ dropped, NOT matched to the
    // null-time row; p1@10 and p2@20 match q15 is only ≤ for p2
    assert(out == Set(("p2", "q15")), s"got $out")
  }

  test("reserved column names are rejected up front") {
    val bad = l.withColumnRenamed("pid", "matched")
    intercept[IllegalArgumentException] { AsOfJoin.asof(bad, r, "k", "t", "t") }
  }

  test("asof plans exactly one shuffle (the key window), no join exchange") {
    val plan = AsOfJoin.asof(l, r, "k", "t", "t")
      .queryExecution.executedPlan.toString
    val exchanges = plan.linesIterator.count(_.contains("Exchange"))
    assert(exchanges == 1, s"union-tag as-of must cost one key shuffle, got $exchanges:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("BroadcastNestedLoop"),
      "as-of must not plan as a join")
  }

  test("as-of ≡ range-join + per-left-row argmax (brute force) on events") {
    // the production reader handles both ts vintages (ns-as-long vs µs
    // NTZ) — go through it instead of assuming a raw-read type
    val ev = graft.queries.Tables.events(spark, "/root/testdata/sf0.001")
      .select("user_id", "event_id", "event_type", "ts_us")
    import org.apache.spark.sql.functions._
    val purchase = ev.filter($"event_type" === "purchase")
      .select($"user_id", $"event_id".as("purchase_id"), $"ts_us")
    val click = ev.filter($"event_type" === "click")
      .groupBy("user_id", "ts_us").agg(max($"event_id").as("click_id"))
    val fast = AsOfJoin.asof(purchase, click, "user_id", "ts_us", "ts_us")
      .select($"purchase_id", $"matched.click_id".as("click_id"))
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    val brute = purchase.join(click.withColumnRenamed("ts_us", "c_ts"), Seq("user_id"))
      .filter($"c_ts" <= $"ts_us")
      .groupBy("purchase_id")
      .agg(max(struct($"c_ts", $"click_id")).getField("click_id").as("click_id"))
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(fast == brute, "window as-of diverges from brute-force range join")
  }
}
