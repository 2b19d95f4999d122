package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for all suites (one JVM, one session). */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSpec.session

  /** Run `body` with session confs overridden, restoring (set or
    * unset) afterwards — the ONE copy of the save/set/restore idiom
    * regime-sensitive suites share (a drifted second copy is how a
    * restore-semantics fix silently misses a suite). Safe with the
    * shared session because sbt runs forked suites sequentially
    * (testForkedParallel is off). */
  def withSessionConfs[A](overrides: Map[String, String])(body: => A): A = {
    val saved = overrides.keys.map(k => k -> spark.conf.getOption(k)).toMap
    overrides.foreach { case (k, v) => spark.conf.set(k, v) }
    try body finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }
}

object SparkSpec {
  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
