package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MutationsSpec extends SparkSpec {
  import spark.implicits._

  private def target = Seq(
    (1L, "one", 10), (2L, "two", 20), (3L, "three", 30)
  ).toDF("k", "name", "v")

  test("upsert: batch rows win on matched keys, unmatched target passes through") {
    val batch = Seq((2L, "TWO", 200), (4L, "four", 40)).toDF("k", "name", "v")
    val got = Mutations.upsert(target, batch, Seq("k")).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getInt(2)))).toMap
    assert(got == Map(
      1L -> (("one", 10)),      // untouched
      2L -> (("TWO", 200)),     // updated
      3L -> (("three", 30)),    // untouched
      4L -> (("four", 40))))    // inserted
  }

  test("null is a key VALUE: upsert replaces the null-key row, applyCdc delete removes it") {
    // A plain equi-anti-join never matches NULL = NULL, so the old
    // shape DUPLICATED a null-key row on every upsert and a null-key
    // CDC delete silently no-opped.
    val t = Seq((Some(1L), "one", 10), (Option.empty[Long], "nil", 99))
      .toDF("k", "name", "v")
    val batch = Seq((Option.empty[Long], "NIL", 990)).toDF("k", "name", "v")
    val up = Mutations.upsert(t, batch, Seq("k")).collect()
      .map(r => Option(r.get(0)) -> ((r.getString(1), r.getInt(2)))).toMap
    assert(up == Map(Some(1L) -> (("one", 10)), None -> (("NIL", 990))))
    val del = Seq((Option.empty[Long], "x", 0, "delete")).toDF("k", "name", "v", "op")
    val after = Mutations.applyCdc(t, del, Seq("k")).collect()
      .map(r => Option(r.get(0))).toSet
    assert(after == Set(Some(1L)))
  }

  test("upsert: empty batch is identity; full-cover batch replaces everything") {
    val empty = Seq.empty[(Long, String, Int)].toDF("k", "name", "v")
    assert(Mutations.upsert(target, empty, Seq("k")).collect().toSet ==
      target.collect().toSet)
    val all = Seq((1L, "a", 0), (2L, "b", 0), (3L, "c", 0)).toDF("k", "name", "v")
    assert(Mutations.upsert(target, all, Seq("k")).collect().toSet ==
      all.collect().toSet)
  }

  test("latestByKey collapses multi-version batches; composed with upsert the last version wins") {
    val changes = Seq(
      (1L, "v1", 100), (1L, "v2", 200), (1L, "v3", 300),
      (4L, "first", 10)
    ).toDF("k", "name", "seq")
    val latest = Mutations.latestByKey(changes, Seq("k"), Seq("seq"))
    assert(latest.collect().map(r => r.getLong(0) -> r.getString(1)).toMap ==
      Map(1L -> "v3", 4L -> "first"))
    val merged = Mutations.upsert(target, latest.drop("seq")
        .withColumn("v", lit(0)), Seq("k"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(merged(1L) == "v3" && merged(4L) == "first" && merged(2L) == "two")
  }

  test("applyCdc: deletes remove the key, other ops upsert, NULL op upserts (not deletes)") {
    val changes = Seq(
      (1L, "one-v2", 11, "update"),
      (3L, "", 0, "delete"),
      (5L, "five", 50, "insert")
    ).toDF("k", "name", "v", "op")
    val got = Mutations.applyCdc(target, changes, Seq("k")).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getInt(2)))).toMap
    assert(got == Map(
      1L -> (("one-v2", 11)),   // updated
      2L -> (("two", 20)),      // untouched
      5L -> (("five", 50))))    // inserted; 3 deleted
    // a malformed record with op = NULL must upsert, never silently delete
    val withNull = Seq((2L, "two-v2", 21, null.asInstanceOf[String]))
      .toDF("k", "name", "v", "op")
    val after = Mutations.applyCdc(target, withNull, Seq("k")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(after(2L) == "two-v2" && after.size == 3)
  }

  // --- batch DERIVED FROM the target (self-lineage): the key-join
  // sides used to resolve to the same attributes and lean on Spark's
  // ambiguous-self-join repair (logged "Constructing trivially true
  // equals predicate"); the aliased condition makes the plan
  // unambiguous by construction. Failing the repair is exactly what
  // spark.sql.analyzer.failAmbiguousSelfJoin guards, so these run with
  // the guard ON (its default) and would throw if the repair were
  // still in play on an actually-ambiguous plan. -----------------------

  test("upsert with a batch derived from its target: null-key and duplicate-key rows") {
    val t = Seq((Some(1L), "one", 10), (Some(2L), "two", 20),
        (Option.empty[Long], "nil", 99))
      .toDF("k", "name", "v")
    // Derive the batch FROM t: bump v on key 2 and the null key, and
    // emit the null-key row TWICE (duplicate keys: upsert keeps both).
    val bumped = t.where(col("k").isNull || col("k") === 2L)
      .withColumn("v", col("v") + 1)
    val batch = bumped.unionByName(bumped.where(col("k").isNull))
    val got = Mutations.upsert(t, batch, Seq("k")).collect()
      .map(r => (Option(r.get(0)), r.getString(1), r.getInt(2)))
    assert(got.toSet == Set(
      (Some(1L), "one", 10),     // untouched
      (Some(2L), "two", 21),     // updated via self-derived batch
      (None, "nil", 100)))       // null key REPLACED, not duplicated
    assert(got.count(_._1.isEmpty) == 2)  // both duplicate rows kept
  }

  test("applyCdc with changes derived from its target deletes and updates correctly") {
    val t = Seq((1L, "one", 10), (2L, "two", 20), (3L, "three", 30))
      .toDF("k", "name", "v")
    val changes = t.where(col("k") === 1L).withColumn("op", lit("delete"))
      .unionByName(t.where(col("k") === 3L)
        .withColumn("v", col("v") * 2).withColumn("op", lit("update")))
    val got = Mutations.applyCdc(t, changes, Seq("k")).collect()
      .map(r => r.getLong(0) -> r.getInt(2)).toMap
    assert(got == Map(2L -> 20, 3L -> 60))
  }
}
