package graft

import org.apache.spark.sql.functions._

import graft.llm.TextOps

/** Dev tool: time labeled subexpressions of a hot query (noop-write the
  * plan, print seconds). Usage: runMain graft.Profile <sfDir>. */
object Profile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Sessions.local("graft-profile")
    import spark.implicits._

    def time(label: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      df.write.mode("overwrite").format("noop").save()
      println(f"[profile] $label%-40s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }

    if (args.length > 1 && (args(1) == "ml" || args(1) == "mlparts")) {
      // GBT-fit experiments over one shared harness:
      //  ml      — cacheNodeIds on/off
      //  mlparts — fit-input partition count (is the floor of 2 right
      //            for tiny materialized volumes?)
      val wide0 = graft.queries.Churn.wideTable(spark, dir)
        .withColumn("label", col("label").cast("double"))
      val Array(train0, _) = wide0.randomSplit(Array(0.8, 0.2), seed = 123L)
      def timeGbtFit(label: String, train: org.apache.spark.sql.DataFrame,
                     cacheNodes: Boolean): Unit = {
        train.cache(); train.count()
        val gbt = graft.ml.ChurnML.gbt(maxIter = 20).setCacheNodeIds(cacheNodes)
        val pipe = new org.apache.spark.ml.Pipeline()
          .setStages(graft.ml.ChurnML.featureStages() :+ gbt)
        val t0 = System.nanoTime()
        pipe.fit(train)
        println(f"[profile] gbt(iter=20) $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
        train.unpersist()
      }
      if (args(1) == "ml")
        for (cn <- Seq(false, true, true))
          timeGbtFit(s"cacheNodeIds=$cn", train0.coalesce(2), cacheNodes = cn)
      else
        for (parts <- Seq(2, 1, 2, 1))
          timeGbtFit(s"fitParts=$parts", train0.repartition(parts), cacheNodes = true)
      spark.stop(); return
    }

    if (args.length > 1 && args(1) == "lsh") {
      // LSH sizing probe (VERDICT r3 #9): pinned r=4 vs autoBitsPerBand(n)
      // — candidate volume, bucket skew, and surviving pair count, the
      // empirical side of the "r must grow with n" design claim.
      import graft.llm.{Dedup, Similarity}
      val n = Tables.load(spark, dir, "embeddings").count()
      val autoBits = Similarity.autoBitsPerBand(n)
      println(s"[lsh-probe] corpus n=$n autoBitsPerBand=$autoBits " +
        s"(pinned declared-query config r=${Similarity.LshBitsPerBand})")
      for ((label, bits) <- Seq("pinned" -> Similarity.LshBitsPerBand,
                                "auto"   -> autoBits)) {
        val posts = Similarity.bandBuckets(spark, dir, Similarity.LshBands, bits)
          .groupBy($"band", $"bucket").count()
        val s = posts.agg(
          count(lit(1)).as("buckets"),
          max($"count").as("max_bucket"),
          sum($"count" * ($"count" - 1) / 2).as("gen_pairs")).head
        val survivors = Dedup.embeddingNearDupLsh(spark, dir,
          bands = Similarity.LshBands, bitsPerBand = bits).count()
        println(s"[lsh-probe] $label r=$bits: buckets=${s.get(0)} " +
          s"maxBucket=${s.get(1)} generatedPairs=${s.get(2)} " +
          s"survivingPairs(cos≥0.30)=$survivors")
      }
      spark.stop(); return
    }

    val docs = Tables.load(spark, dir, "documents")

    for (round <- 1 to 2) {
      println(s"[profile] --- round $round ---")
      time("toks explode + count") {
        docs.select($"doc_id", explode(TextOps.toks($"text")).as("t"))
          .groupBy($"doc_id").count()
      }
      time("shingles explode + count") {
        docs.select($"doc_id", explode(TextOps.shingles(TextOps.toks($"text"))).as("s"))
          .groupBy($"doc_id").count()
      }
      time("full minhashSigTable") {
        TextOps.minhashSigTable(docs)
      }
    }
    spark.stop()
  }
}
