package graft.plans

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.embed.HashEmbedder
import graft.functions.VectorFunctions
import graft.index.IvfIndex

class IvfTopKPruneRuleSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 8
  private val emb = HashEmbedder(dim)

  // 4 well-separated "centroids": one-hot-ish unit vectors.
  private val model = IvfIndex.Model(IndexedSeq(
    IndexedSeq(1.0, 0, 0, 0, 0, 0, 0, 0),
    IndexedSeq(0, 1.0, 0, 0, 0, 0, 0, 0),
    IndexedSeq(0, 0, 1.0, 0, 0, 0, 0, 0),
    IndexedSeq(0, 0, 0, 1.0, 0, 0, 0, 0)))

  private lazy val storePath: String = {
    val dir = Files.createTempDirectory("graft-ivf-rule").toString + "/store"
    val docs = (0 until 64).map(i => (i.toLong, s"document number $i")).toDF("id", "text")
    emb.embed(docs, "text", "vec")
      .withColumn("cluster", model.assignCol(col("vec")))
      .write.partitionBy("cluster").parquet(dir)
    dir
  }

  private def topkPlan(qv: Seq[Double]): DataFrame =
    spark.read.parquet(storePath)
      .withColumn("score", VectorFunctions.cosineSimilarity(col("vec"), typedlit(qv)))
      .orderBy(desc("score"), asc("id"))
      .limit(5)

  private def clusterFilters(df: DataFrame): Seq[String] =
    df.queryExecution.optimizedPlan.collect {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter
          if f.condition.references.exists(_.name == "cluster") => f.condition.sql
    }

  private def withRule[T](body: => T): T = {
    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = prev :+ IvfTopKPruneRule(spark)
    try body finally spark.experimental.extraOptimizations = prev
  }

  test("inert without registration or conf; fires only when doubly opted in") {
    val qv = emb.embedQuery("document number 7").toSeq
    withRule {
      assert(clusterFilters(topkPlan(qv)).isEmpty) // nothing registered
      IvfTopKPruneRule.register(storePath, model, nprobe = 2)
      try {
        assert(clusterFilters(topkPlan(qv)).isEmpty) // conf still off
        spark.conf.set(IvfTopKPruneRule.ConfKey, "true")
        try {
          val fs = clusterFilters(topkPlan(qv))
          assert(fs.nonEmpty && fs.head.contains("IN"))
        } finally spark.conf.unset(IvfTopKPruneRule.ConfKey)
      } finally IvfTopKPruneRule.unregister(storePath)
    }
  }

  test("pruned top-k returns exactly the manually probe-filtered result") {
    val qv = emb.embedQuery("some query text").toSeq
    val probes = model.nearestCentroids(qv, 2)
    val manual = spark.read.parquet(storePath)
      .where(col("cluster").isin(probes: _*))
      .withColumn("score", VectorFunctions.cosineSimilarity(col("vec"), typedlit(qv)))
      .orderBy(desc("score"), asc("id")).limit(5)
      .select("id", "score").collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq

    withRule {
      IvfTopKPruneRule.register(storePath, model, nprobe = 2)
      spark.conf.set(IvfTopKPruneRule.ConfKey, "true")
      try {
        val auto = topkPlan(qv)
          .select("id", "score").collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
        assert(auto == manual)
        assert(clusterFilters(topkPlan(qv)).nonEmpty)
      } finally {
        spark.conf.unset(IvfTopKPruneRule.ConfKey)
        IvfTopKPruneRule.unregister(storePath)
      }
    }
  }

  test("score alias in a deeper non-collapsed Project still fires the rewrite") {
    withRule {
      IvfTopKPruneRule.register(storePath, model, nprobe = 2)
      spark.conf.set(IvfTopKPruneRule.ConfKey, "true")
      try {
        val qv = emb.embedQuery("deep project query").toSeq
        // Re-projecting the (non-cheap) score multiple times makes
        // CollapseProject decline to merge, so the alias lives in the
        // SECOND Project under the sort — a first-Project-only match
        // would silently skip the rewrite.
        val deep = spark.read.parquet(storePath)
          .withColumn("score",
            VectorFunctions.cosineSimilarity(col("vec"), typedlit(qv)))
          .select(col("id"), col("score"),
            (col("score") * 2).as("s2"), (col("score") + 1).as("s3"))
          .orderBy(desc("score"), asc("id")).limit(5)
        val projects = deep.queryExecution.optimizedPlan.collect {
          case p: org.apache.spark.sql.catalyst.plans.logical.Project => p
        }
        assert(projects.size >= 2, "precondition: projections must not collapse")
        assert(clusterFilters(deep).nonEmpty)
      } finally {
        spark.conf.unset(IvfTopKPruneRule.ConfKey)
        IvfTopKPruneRule.unregister(storePath)
      }
    }
  }

  test("ranking over ANOTHER table's vectors never prunes the joined registered store") {
    withRule {
      IvfTopKPruneRule.register(storePath, model, nprobe = 2)
      spark.conf.set(IvfTopKPruneRule.ConfKey, "true")
      try {
        val qv = emb.embedQuery("q").toSeq
        val other = emb.embed(
          (100L until 140L).map(i => (i, s"other doc $i")).toDF("oid", "otext"),
          "otext", "ovec")
        // top-k ranked on OTHER's vectors; the registered store is just
        // joined in — pruning it would silently drop join rows.
        val joined = spark.read.parquet(storePath)
          .join(other, col("id") === col("oid") % 64)
          .withColumn("score", VectorFunctions.cosineSimilarity(col("ovec"), typedlit(qv)))
          .orderBy(desc("score"), asc("id")).limit(5)
        assert(clusterFilters(joined).isEmpty,
          "rule pruned a store whose vectors the ranking never scores")
        // and the rule still fires when the STORE's own vec is ranked in
        // the same join shape
        val rankedOnStore = spark.read.parquet(storePath)
          .join(other, col("id") === col("oid") % 64)
          .withColumn("score", VectorFunctions.cosineSimilarity(col("vec"), typedlit(qv)))
          .orderBy(desc("score"), asc("id")).limit(5)
        assert(clusterFilters(rankedOnStore).nonEmpty)
      } finally {
        spark.conf.unset(IvfTopKPruneRule.ConfKey)
        IvfTopKPruneRule.unregister(storePath)
      }
    }
  }

  test("direction-mismatched sorts and non-literal queries are never rewritten") {
    withRule {
      IvfTopKPruneRule.register(storePath, model, nprobe = 2)
      spark.conf.set(IvfTopKPruneRule.ConfKey, "true")
      try {
        val qv = emb.embedQuery("q").toSeq
        // ascending COSINE = farthest-first: pruning to near clusters
        // would be wrong — must stay untouched.
        val asc_ = spark.read.parquet(storePath)
          .withColumn("score", VectorFunctions.cosineSimilarity(col("vec"), typedlit(qv)))
          .orderBy(asc("score")).limit(5)
        assert(clusterFilters(asc_).isEmpty)
        // descending L2 = farthest-first likewise.
        val descL2 = spark.read.parquet(storePath)
          .withColumn("dist", VectorFunctions.l2Distance(col("vec"), typedlit(qv)))
          .orderBy(desc("dist")).limit(5)
        assert(clusterFilters(descL2).isEmpty)
        // vec-vs-vec scoring (no literal query) must not be touched.
        val selfScore = spark.read.parquet(storePath)
          .withColumn("score", VectorFunctions.cosineSimilarity(col("vec"), col("vec")))
          .orderBy(desc("score")).limit(5)
        assert(clusterFilters(selfScore).isEmpty)
      } finally {
        spark.conf.unset(IvfTopKPruneRule.ConfKey)
        IvfTopKPruneRule.unregister(storePath)
      }
    }
  }

  test("batch (multi-query bounded-top-k aggregate) shape prunes per query via a probes column") {
    withRule {
      IvfTopKPruneRule.register(storePath, model, nprobe = 2)
      spark.conf.set(IvfTopKPruneRule.ConfKey, "true")
      try {
        val queries = Seq(
          (1000L, emb.embedQuery("document number 3").toSeq),
          (1001L, emb.embedQuery("some other thing").toSeq),
          (1002L, emb.embedQuery("a third query").toSeq))
        val qdf = queries.toDF("qid", "qv")
        val docs = spark.read.parquet(storePath)
        val batch = graft.index.VectorIndex.topKBatch(docs, "vec", qdf,
          "qid", "qv", k = 3, "cosine", scoreCol = "score", tieBreak = Seq("id"))
        // the rewritten plan computes each query's probe set once and
        // filters the joined pairs on it
        def probeFiltered(df: org.apache.spark.sql.DataFrame): Boolean =
          df.queryExecution.optimizedPlan.exists {
            case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
              f.condition.references.exists(_.name == "__graft_probes")
            case _ => false
          }
        assert(probeFiltered(batch), "batch shape must carry the probes filter")
        val auto = batch.select("qid", "rank", "id").collect()
          .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq.sorted
        // manual expectation: each query ranked over ITS OWN 2 probes
        val manual = queries.flatMap { case (qid, qv) =>
          val probes = model.nearestCentroids(qv, 2)
          graft.index.VectorIndex.topK(
              docs.where(col("cluster").isin(probes: _*)),
              "vec", qv, 3, "cosine", scoreCol = "score", tieBreak = Seq("id"))
            .select("id").collect().zipWithIndex
            .map { case (r, i) => (qid, i + 1, r.getLong(0)) }
        }.sorted
        assert(auto == manual)
        // same batch over an UN-registered copy of the data: untouched
        IvfTopKPruneRule.unregister(storePath)
        val untouched = graft.index.VectorIndex.topKBatch(docs, "vec", qdf,
          "qid", "qv", k = 3, "cosine", scoreCol = "score", tieBreak = Seq("id"))
        assert(!probeFiltered(untouched))
      } finally {
        spark.conf.unset(IvfTopKPruneRule.ConfKey)
        IvfTopKPruneRule.unregister(storePath)
      }
    }
  }

  test("an unregistered parquet scan ahead of the store in plan order does not disable pruning") {
    withRule {
      IvfTopKPruneRule.register(storePath, model, nprobe = 2)
      spark.conf.set(IvfTopKPruneRule.ConfKey, "true")
      try {
        // The metadata table is the FIRST LogicalRelation in pre-order
        // (left side of the join): a collectFirst over scans matched it,
        // lookup() returned None, and the rewrite silently bailed for
        // the registered store right next to it.
        val metaDir = Files.createTempDirectory("graft-ivf-meta").toString + "/meta"
        (0 until 64).map(i => (i.toLong, s"m$i")).toDF("id", "tag")
          .write.parquet(metaDir)
        val qv = emb.embedQuery("document number 7").toSeq
        val joined = spark.read.parquet(metaDir)
          .join(spark.read.parquet(storePath), "id")
          .withColumn("score",
            VectorFunctions.cosineSimilarity(col("vec"), typedlit(qv)))
          .orderBy(desc("score"), asc("id"))
          .limit(5)
        assert(clusterFilters(joined).nonEmpty,
          "the registered store scan must still be pruned")
      } finally {
        spark.conf.unset(IvfTopKPruneRule.ConfKey)
        IvfTopKPruneRule.unregister(storePath)
      }
    }
  }

  test("ip (desc) and l2 (asc) rankings prune like cosine") {
    withRule {
      IvfTopKPruneRule.register(storePath, model, nprobe = 2)
      spark.conf.set(IvfTopKPruneRule.ConfKey, "true")
      try {
        val qv = emb.embedQuery("another query").toSeq
        val ip = spark.read.parquet(storePath)
          .withColumn("score", VectorFunctions.dotProduct(col("vec"), typedlit(qv)))
          .orderBy(desc("score"), asc("id")).limit(5)
        assert(clusterFilters(ip).nonEmpty)
        val l2 = spark.read.parquet(storePath)
          .withColumn("dist", VectorFunctions.l2Distance(col("vec"), typedlit(qv)))
          .orderBy(asc("dist"), asc("id")).limit(5)
        assert(clusterFilters(l2).nonEmpty)
        // pruned l2 result == manual probe-filtered l2 result
        val probes = model.nearestCentroids(qv, 2)
        val manual = spark.read.parquet(storePath)
          .where(col("cluster").isin(probes: _*))
          .withColumn("dist", VectorFunctions.l2Distance(col("vec"), typedlit(qv)))
          .orderBy(asc("dist"), asc("id")).limit(5)
          .select("id").collect().map(_.getLong(0)).toSeq
        val auto = l2.select("id").collect().map(_.getLong(0)).toSeq
        assert(auto == manual)
      } finally {
        spark.conf.unset(IvfTopKPruneRule.ConfKey)
        IvfTopKPruneRule.unregister(storePath)
      }
    }
  }

  private def probeFiltered(df: DataFrame): Boolean =
    df.queryExecution.optimizedPlan.exists {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
        f.condition.references.exists(_.name == "__graft_probes")
      case _ => false
    }

  test("window-shape batch prunes ONLY under an upper-bounding rank filter") {
    withRule {
      IvfTopKPruneRule.register(storePath, model, nprobe = 2)
      spark.conf.set(IvfTopKPruneRule.ConfKey, "true")
      try {
        val qdf = Seq(
          (1L, emb.embedQuery("document number 3").toSeq),
          (2L, emb.embedQuery("some other thing").toSeq)).toDF("qid", "qv")
        val docs = spark.read.parquet(storePath)
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("qid").orderBy(desc("score"), asc("id"))
        val ranked = docs.crossJoin(broadcast(qdf))
          .withColumn("score",
            VectorFunctions.cosineSimilarity(col("vec"), col("qv")))
          .withColumn("rank", row_number().over(w))
        // bounded per-query ranking: the sanctioned top-k recall trade
        assert(probeFiltered(ranked.where(col("rank") <= 3)),
          "rank<=k window shape must prune")
        // UNBOUNDED ranking (the caller asked for the FULL per-query
        // ordering): pruning would silently DELETE ~(1 - nprobe/nlist)
        // of the output rows — must stay untouched
        assert(!probeFiltered(ranked),
          "a full ranking with no rank bound must never be pruned")
        // a lower-bound (rank > 3 — 'everything but the top') is not a
        // top-k either
        assert(!probeFiltered(ranked.where(col("rank") > 3)),
          "a lower-bounded rank filter must never be pruned")
        // a bound hidden under Or/Not does NOT bound the output: the
        // disjunction keeps rows the prune would delete
        assert(!probeFiltered(ranked.where(col("rank") <= 3 || col("id") === 0L)),
          "rank<=k OR ... must never be pruned")
        assert(!probeFiltered(ranked.where(!(col("rank") <= 3))),
          "NOT(rank<=k) must never be pruned")
        // ... while a CONJUNCT alongside other predicates still prunes
        assert(probeFiltered(ranked.where(col("rank") <= 3 && col("id") >= 0L)),
          "rank<=k AND ... is a genuine top-k bound")
      } finally {
        spark.conf.unset(IvfTopKPruneRule.ConfKey)
        IvfTopKPruneRule.unregister(storePath)
      }
    }
  }

  test("outer joins are never pruned: null-extended query rows must survive") {
    withRule {
      IvfTopKPruneRule.register(storePath, model, nprobe = 2)
      spark.conf.set(IvfTopKPruneRule.ConfKey, "true")
      try {
        val qdf = Seq(
          (1L, emb.embedQuery("document number 3").toSeq),
          (2L, emb.embedQuery("some other thing").toSeq)).toDF("qid", "qv")
        val docs = spark.read.parquet(storePath)
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("qid").orderBy(desc("score"), asc("id"))
        // LEFT OUTER: a query with no surviving match emits one
        // null-extended row; a probes filter ABOVE the join would
        // delete that query from the output entirely.
        val ranked = qdf.join(docs, col("qid") =!= col("id"), "left_outer")
          .withColumn("score",
            VectorFunctions.cosineSimilarity(col("vec"), col("qv")))
          .withColumn("rank", row_number().over(w))
          .where(col("rank") <= 3)
        assert(!probeFiltered(ranked),
          "an outer join must never carry the probes filter")
      } finally {
        spark.conf.unset(IvfTopKPruneRule.ConfKey)
        IvfTopKPruneRule.unregister(storePath)
      }
    }
  }

  test("URI spellings of the registered path still key the rewrite (file://)") {
    withRule {
      // Pre-fix normalize() only stripped a literal 'file:' prefix, so
      // file:///x registered as ///x while the scan rendered /x — the
      // lookup never matched and the opt-in silently never fired.
      IvfTopKPruneRule.register(s"file://$storePath", model, nprobe = 2)
      spark.conf.set(IvfTopKPruneRule.ConfKey, "true")
      try {
        val qv = emb.embedQuery("document number 7").toSeq
        assert(clusterFilters(topkPlan(qv)).nonEmpty,
          "file:// registration must match the plain-path scan")
      } finally {
        spark.conf.unset(IvfTopKPruneRule.ConfKey)
        IvfTopKPruneRule.unregister(s"file://$storePath")
      }
    }
  }
}
