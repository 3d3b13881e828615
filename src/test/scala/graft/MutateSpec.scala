package graft

import org.apache.spark.sql.functions._

import graft.operators.Mutate

class MutateSpec extends SparkSpec {
  import spark.implicits._

  private def target = Seq(
    (1L, "a", 10.0),
    (2L, "b", 20.0),
    (3L, "c", 30.0)).toDF("k", "status", "amt")

  test("mergeInto: update, conditional delete, insert, tombstone skip") {
    val src = Seq(
      (2L, "B", 25.0), // matched update
      (3L, "c", 30.0), // matched delete (condition below)
      (4L, "d", 40.0), // insert
      (5L, "e", 50.0)  // unmatched tombstone: NOT inserted
    ).toDF("k", "status", "amt")
    val merged = Mutate.mergeInto(target, src, Seq("k"),
      deleteWhen = Some(col("k").isin(3L, 5L)))
      .orderBy("k").as[(Long, String, Double)].collect().toSeq
    assert(merged == Seq((1L, "a", 10.0), (2L, "B", 25.0), (4L, "d", 40.0)))
  }

  test("mergeInto without deleteWhen is a plain upsert") {
    val src = Seq((1L, "A", 11.0), (9L, "z", 90.0)).toDF("k", "status", "amt")
    val out = Mutate.mergeInto(target, src, Seq("k"))
      .orderBy("k").as[(Long, String, Double)].collect().toSeq
    assert(out == Seq((1L, "A", 11.0), (2L, "b", 20.0), (3L, "c", 30.0), (9L, "z", 90.0)))
  }

  test("mergeInto fails loudly when the source lacks target columns") {
    val bad = Seq((1L, "x")).toDF("k", "status")
    val e = intercept[IllegalArgumentException] {
      Mutate.mergeInto(target, bad, Seq("k"))
    }
    assert(e.getMessage.contains("amt"))
  }

  test("applyChangeLog: highest seq wins; D drops; I/U upsert; untouched rows carry") {
    val base = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    val log = Seq(
      (2L, "b1", "U", 1), // overridden by seq 2
      (2L, "b2", "U", 2),
      (3L, "x", "D", 1),  // key 3 dropped
      (4L, "d", "I", 1),  // new key
      (5L, "e", "I", 1),  // inserted then deleted
      (5L, "e", "D", 2)).toDF("k", "v", "op", "seq")
    val out = Mutate.applyChangeLog(base, log, Seq("k"))
      .orderBy("k").as[(Long, String)].collect().toSeq
    assert(out == Seq((1L, "a"), (2L, "b2"), (4L, "d")))
  }

  test("applyChangeLog: U on an absent key inserts (upsert semantics)") {
    val base = Seq((1L, "a")).toDF("k", "v")
    val log = Seq((7L, "g", "U", 1)).toDF("k", "v", "op", "seq")
    val out = Mutate.applyChangeLog(base, log, Seq("k"))
      .orderBy("k").as[(Long, String)].collect().toSeq
    assert(out == Seq((1L, "a"), (7L, "g")))
  }

  private def hist = Seq(
    // closed history row must carry through untouched
    (1L, "old", 0L, Some(5L), false),
    (1L, "s1", 5L, None, true),
    (2L, "s2", 0L, None, true),
    (3L, "s3", 0L, None, true)
  ).toDF("k", "seg", "valid_from", "valid_to", "is_current")

  test("scd2Apply: changed row closes + reopens; no-op update unchanged; insert opens") {
    val updates = Seq(
      (1L, "s1new"), // changed -> close (to=9) + new open version
      (2L, "s2"),    // no-op: values equal -> untouched
      (9L, "s9")     // brand-new key -> first open version
    ).toDF("k", "seg")
    val out = Mutate.scd2Apply(hist, updates, "k", Seq("seg"), ts = lit(9L))
      .orderBy("k", "valid_from", "is_current")
      .as[(Long, String, Long, Option[Long], Boolean)].collect().toSeq
    assert(out == Seq(
      (1L, "old", 0L, Some(5L), false),
      (1L, "s1", 5L, Some(9L), false),
      (1L, "s1new", 9L, None, true),
      (2L, "s2", 0L, None, true),
      (3L, "s3", 0L, None, true),
      (9L, "s9", 9L, None, true)))
  }

  test("scd2Apply: null-safe attribute compare") {
    val h = Seq((1L, Option.empty[String], 0L, Option.empty[Long], true))
      .toDF("k", "seg", "valid_from", "valid_to", "is_current")
    // null -> null is NO change; null -> value IS a change
    val same = Mutate.scd2Apply(h,
      Seq((1L, Option.empty[String])).toDF("k", "seg"), "k", Seq("seg"), ts = lit(2L))
      .as[(Long, Option[String], Long, Option[Long], Boolean)].collect().toSeq
    assert(same == Seq((1L, None, 0L, None, true)))
    val changed = Mutate.scd2Apply(h,
      Seq((1L, Option("x"))).toDF("k", "seg"), "k", Seq("seg"), ts = lit(2L))
      .orderBy("valid_from")
      .as[(Long, Option[String], Long, Option[Long], Boolean)].collect().toSeq
    assert(changed == Seq(
      (1L, None, 0L, Some(2L), false),
      (1L, Some("x"), 2L, None, true)))
  }

  test("scd2Apply fails loudly when updates lack a tracked attribute") {
    val e = intercept[IllegalArgumentException] {
      Mutate.scd2Apply(hist, Seq((1L, 1L)).toDF("k", "other"), "k", Seq("seg"), ts = lit(1L))
    }
    assert(e.getMessage.contains("seg"))
  }

  test("plans: mergeInto and scd2Apply are single-join, no cartesian") {
    val src = Seq((1L, "A", 11.0)).toDF("k", "status", "amt")
    val mp = Mutate.mergeInto(target, src, Seq("k")).queryExecution.executedPlan.toString
    assert(!mp.contains("Cartesian"), mp)
    assert(mp.split("Join", -1).length - 1 <= 2, mp) // one join node (name may appear in detail line)
    val up = Seq((1L, "z")).toDF("k", "seg")
    val sp = Mutate.scd2Apply(hist, up, "k", Seq("seg"), ts = lit(9L))
      .queryExecution.executedPlan.toString
    assert(!sp.contains("Cartesian"), sp)
  }
}
