package graft

import org.apache.spark.sql.functions._

import graft.ops.Joins

class JoinsSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin is row-identical to the plain equi-join (incl. skewed keys)") {
    val rnd = new scala.util.Random(5)
    // heavy skew: 80% of left rows share one key
    val left = (1 to 500).map(i =>
      (if (rnd.nextDouble() < 0.8) 1L else rnd.nextInt(50).toLong, i)).toDF("k", "lv")
    val right = (0L to 50L).map(k => (k, s"r$k")).toDF("k", "rv")
    val plain = left.join(right, Seq("k")).orderBy("k", "lv").collect().toSeq
    val salted = Joins.saltedJoin(left, right, Seq("k"), saltFactor = 8)
      .select("k", "lv", "rv").orderBy("k", "lv").collect().toSeq
    assert(salted == plain)
  }

  test("saltedJoin left join keeps unmatched rows exactly once") {
    val left = Seq((1L, "a"), (99L, "nomatch")).toDF("k", "lv")
    val right = Seq((1L, "r1")).toDF("k", "rv")
    val out = Joins.saltedJoin(left, right, Seq("k"), 4, "left")
      .orderBy("k").collect().toSeq
    assert(out.length == 2 && out.map(_.getString(1)).toSeq == Seq("a", "nomatch"))
  }

  test("bucketedRangeJoin equals the theta join for bounded spans") {
    val left = (0 until 50).map(i =>
      ("u", ts(f"2022-01-01 10:${i % 60}%02d:00"), i)).toDF("u", "lts", "li")
    val right = (0 until 50).map(i =>
      ("u", ts(f"2022-01-01 10:${i % 60}%02d:30"), i)).toDF("u", "rts", "ri")
    val span = 300L
    val cond = col("rts") >= col("lts") && col("rts") <= col("lts") + expr("INTERVAL 5 MINUTES")
    val theta = left.join(right, cond)
      .select("li", "ri").orderBy("li", "ri").collect().toSeq
    // direction-free: probe side first in either order
    val b1 = Joins.bucketedRangeJoin(right, left, "rts", "lts", span, cond)
      .select("li", "ri").orderBy("li", "ri").collect().toSeq
    val b2 = Joins.bucketedRangeJoin(left, right, "lts", "rts", span, cond)
      .select("li", "ri").orderBy("li", "ri").collect().toSeq
    assert(b1 == theta && b2 == theta,
      s"b1=${b1.size} b2=${b2.size} theta=${theta.size}")
  }

  test("bucketed join + same-key aggregation plans with zero exchanges") {
    val facts = (1 to 400).map(i => (i.toLong % 37, i, i * 1.5)).toDF("k", "seq", "amt")
    val dims = (0L until 37L).map(k => (k, s"name$k")).toDF("k", "nm")
    graft.ops.Bucketing.saveBucketed(facts, "bspec_facts", Seq("k"), 4)
    graft.ops.Bucketing.saveBucketed(dims, "bspec_dims", Seq("k"), 4)
    val joined = graft.ops.Bucketing
      .bucketedJoin(spark, "bspec_dims", "bspec_facts", Seq("k"), Seq("k"))
      .groupBy(spark.table("bspec_dims")("k"), col("nm"))
      .agg(count(lit(1)).as("n"), sum(col("amt")).as("total"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"expected exchange-free plan, got:\n$plan")
    // and the result is the plain join's
    val expected = dims.join(facts, Seq("k")).groupBy(col("k"), col("nm"))
      .agg(count(lit(1)).as("n"), sum(col("amt")).as("total"))
      .orderBy("k").collect().toSeq
    assert(joined.orderBy("k").collect().toSeq == expected)
  }

  test("saltedJoin rejects right/full join types (would duplicate null rows)") {
    val df = Seq((1L, "a")).toDF("k", "v")
    intercept[IllegalArgumentException] {
      Joins.saltedJoin(df, df, Seq("k"), 4, "right")
    }
    intercept[IllegalArgumentException] {
      Joins.saltedJoin(df, df, Seq("k"), 4, "full_outer")
    }
  }
}
