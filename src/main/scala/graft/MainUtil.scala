package graft

import org.apache.spark.sql.SparkSession

/** Shared helpers for the runnable mains (Verify, Bench, the example
  * harnesses) — one definition each for the two bits every main was
  * starting to re-implement locally: JSON string escaping for the
  * one-line driver contracts, and the `SPARK_GRAFT_CONF="k=v;k=v"`
  * adversarial-config hook. */
private[graft] object MainUtil {

  /** JSON string escape: backslash, quote, and ALL control chars
    * (< 0x20) — a tab or CR in builder-authored SQL or an exception
    * message would otherwise make the driver's json.load fail and
    * silently zero a round's report. */
  def jstr(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  /** Recursive LOCAL-filesystem delete (scratch/result slots under
    * java.io.tmpdir or a local outDir — the mains' disk contract;
    * remote URIs need Hadoop FileSystem.delete and are not what these
    * paths are). One definition so a future hardening (e.g. symlink
    * handling) lands once. */
  def deleteRecursively(f: java.io.File): Unit = {
    val kids = f.listFiles()
    if (kids != null) kids.foreach(deleteRecursively)
    f.delete()
    ()
  }

  /** Apply `SPARK_GRAFT_CONF="k=v;k=v"` to a session builder (the
    * Verify adversarial-config protocol). Malformed entries — a stray
    * shell token, a valueless key — are skipped, never fatal: the hook
    * exists to vary configs, not to add a parse failure mode. */
  def applyConfEnv(builder: SparkSession.Builder): SparkSession.Builder = {
    sys.env.get("SPARK_GRAFT_CONF").foreach(_.split(';').foreach { kv =>
      kv.split("=", 2) match {
        case Array(k, v) if k.trim.nonEmpty => builder.config(k.trim, v.trim)
        case _ => ()
      }
    })
    builder
  }
}
