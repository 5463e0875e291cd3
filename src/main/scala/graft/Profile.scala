package graft

import org.apache.spark.sql.{Column, DataFrame}
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

    if (args.length > 1 && args(1) == "mlsplit") {
      // Phase split of the ml_* fit wall (r14, VERDICT r13 #2): where do
      // the ~55 s quiet-host seconds actually go per family — wide-table
      // read/split/cache, pipeline front-end (indexer+OHE+assembler fit),
      // model fit proper, the M7 save+reload round-trip, or scoring?
      import org.apache.spark.ml.{Pipeline, PipelineModel}
      def timed[A](body: => A): (A, Double) = {
        val t0 = System.nanoTime(); val a = body
        (a, (System.nanoTime() - t0) / 1e9)
      }
      for (family <- Seq("gbt", "gbt_xgb", "rf", "lr", "fm")) {
        spark.catalog.clearCache()
        val (wide, tWide) = timed {
          val w = graft.ml.ChurnML.wideFrame(spark, dir)
            .withColumn("label", col("label").cast("double"))
          w.cache(); w.count(); w
        }
        val (trainN, tSplit) = timed {
          val Array(tr, _) = wide.randomSplit(Array(0.8, 0.2), seed = 123L)
          tr.cache(); (tr, tr.count())
        }
        val train = trainN._1
        val fitParts = 2
        val fitInput = train.coalesce(fitParts)
        val iters = Map("gbt" -> 25, "gbt_xgb" -> 20, "lr" -> 30, "fm" -> 10)
        val (front, tFront) = timed {
          val stages = if (family == "gbt_xgb")
            graft.ml.ChurnML.xgbFeatureStages()
          else graft.ml.ChurnML.featureStages()
          new Pipeline().setStages(stages).fit(fitInput)
        }
        val (model, tFit) = timed {
          graft.ml.ChurnML.pipeline(family,
            gbtIter = iters.getOrElse(family, 0),
            lrIter = iters.getOrElse(family, 0),
            fmIter = iters.getOrElse(family, 0)).fit(fitInput)
        }
        val (reloaded, tSave) = timed {
          val d = graft.util.Scratch.dir(s"prof-$family-model")
          model.write.overwrite().save(d)
          PipelineModel.load(d)
        }
        val Array(_, test) = wide.randomSplit(Array(0.8, 0.2), seed = 123L)
        val (_, tScore) = timed {
          val pred = reloaded.transform(test)
            .withColumn("prob1",
              graft.eval.Metrics.positiveProb(col("probability")))
          pred.cache()
          val a = graft.eval.Metrics.auc(pred)
          val r = graft.eval.Metrics.classificationReport(pred)
          pred.unpersist(); (a, r)
        }
        println(f"[profile] mlsplit $family%-8s wide=$tWide%5.2f " +
          f"split=$tSplit%5.2f frontFit=$tFront%5.2f fullFit=$tFit%5.2f " +
          f"(model=${tFit - tFront}%5.2f) saveReload=$tSave%5.2f " +
          f"score=$tScore%5.2f")
        train.unpersist(); wide.unpersist()
      }
      spark.stop(); return
    }

    if (args.length > 1 && args(1) == "streams") {
      // Setup-vs-processing split for every declared st_* query (VERDICT
      // r10 #5: st_dedup/st_range_join drifted in the driver run with no
      // code change; SURVEY attributes it to state-store setup — measure
      // instead of guessing). Per entry: wall = end-to-end declared-query
      // time (incl. sink read-back); trigger/addBatch/stateMs from the
      // StreamingQueryProgress durationMs map summed over micro-batches;
      // setup = wall − triggerExecution (stream/source/sink init, commit
      // log, scratch symlinks — everything outside batch execution).
      import org.apache.spark.sql.streaming.StreamingQueryListener
      import scala.jdk.CollectionConverters._
      val acc = new java.util.concurrent.ConcurrentLinkedQueue[Map[String, Long]]()
      val stAcc = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long)]()
      val listener = new StreamingQueryListener {
        override def onQueryStarted(
          e: StreamingQueryListener.QueryStartedEvent): Unit = ()
        override def onQueryProgress(
          e: StreamingQueryListener.QueryProgressEvent): Unit = {
          acc.add(e.progress.durationMs.asScala.toMap.map {
            case (k, v) => k -> v.toLong })
          // per-batch state-store occupancy: is state watermark-bounded
          // (rows total plateaus / drops at finalization) or a leak?
          e.progress.stateOperators.foreach(s =>
            stAcc.add((s.numRowsTotal, s.numRowsUpdated)))
        }
        override def onQueryTerminated(
          e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      }
      spark.streams.addListener(listener)
      // UNTIMED WARMUP (r13 — the r12 table was ORDER-BIASED: the
      // RocksDB loop ran first and its first entries absorbed the
      // native-lib load + streaming codegen cold start, then the HDFS
      // comparison ran warm and looked 2-6× faster; warm-vs-warm the
      // two providers measure EQUAL at this scale): one small stateful
      // + one stateless drain before anything is timed.
      for (w <- Seq("st_tumbling", "st_enrich"))
        SparkEntry.queries(w)(spark, dir)
          .write.mode("overwrite").format("noop").save()
      println("query                wall_s  trigger_s  addBatch_s  setup_s  batches  state_rows")
      for (pass <- 1 to 2;
           (name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)
           if name.startsWith("st_")) {
        acc.clear(); stAcc.clear()
        val t0 = System.nanoTime()
        fn(spark, dir).write.mode("overwrite").format("noop").save()
        val wall = (System.nanoTime() - t0) / 1e9
        Thread.sleep(500) // progress events post async on the listener bus
        val batches = acc.asScala.toSeq
        def tot(k: String) = batches.map(_.getOrElse(k, 0L)).sum / 1e3
        val stRows = stAcc.asScala.toSeq.map(_._1).mkString("/")
        println(f"[p$pass] $name%-20s $wall%6.2f  ${tot("triggerExecution")}%9.2f  " +
          f"${tot("addBatch")}%10.2f  ${wall - tot("triggerExecution")}%7.2f  " +
          f"${batches.size}%7d  $stRows")
      }
      // Provider experiment (VERDICT r10 #5, re-pinned per ADVICE r11
      // #4): Sessions.local now defaults to RocksDB session-wide, so the
      // instrumented loop above ALREADY measures RocksDB (the shipped
      // config). The comparison session is therefore explicitly pinned
      // to the old HDFS-backed provider — without the pin both loops ran
      // RocksDB and the A/B that justified the adoption was no longer
      // reproducible.
      val hdfs = spark.newSession()
      hdfs.conf.set("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider")
      val stNames = SparkEntry.queries.keys.filter(_.startsWith("st_")).toSeq.sorted
      for (pass <- 1 to 2; name <- stNames) {
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(hdfs, dir)
          .write.mode("overwrite").format("noop").save()
        println(f"[hdfs-provider] pass$pass $name%-20s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      }
      spark.streams.removeListener(listener)
      spark.stop(); return
    }

    if (args.length > 1 && args(1) == "bm25") {
      // BM25 scale probe: the inverted-index claim under test is that
      // scoring cost is driven by the QUERY-RESTRICTED postings (docs
      // containing a query term × query terms), not the full token
      // stream — so a factor× corpus (shard-salted, same df distribution
      // per copy as the cc probe) should grow both linearly, with the
      // restricted postings staying a small constant fraction.
      import graft.llm.Retrieval
      val factor = if (args.length > 2) args(2).toInt else 10
      val base = Tables.load(spark, dir, "documents")
      // Copy offset from the DATA, not a constant: a fixed 1e6 stride
      // silently collides doc_ids (and corrupts df counts) on any base
      // corpus with doc_id ≥ 1e6 (ADVICE r7).
      val docStride = base.agg(max($"doc_id")).head().getLong(0) + 1L
      // Copies keep the ORIGINAL text: query-term postings (and df)
      // scale exactly ×factor — homogeneous growth, the realistic regime
      // for retrieval over a grown corpus.
      val big = (0 until factor).map { i =>
        if (i == 0) base
        else base.select(($"doc_id" + lit(i * docStride)).as("doc_id"),
          $"text", $"lang", $"source", $"n_chars")
      }.reduce(_ unionAll _)
      val bigDir = "target/bm25probe"
      big.write.mode("overwrite").parquet(s"$bigDir/documents.parquet")
      def timed[A](body: => A): (A, Double) = {
        val t0 = System.nanoTime()
        val a = body
        (a, (System.nanoTime() - t0) / 1e9)
      }
      for ((label, d) <- Seq(("1x", dir), (s"${factor}x", bigDir))) {
        val docs = Tables.load(spark, d, "documents")
        val toks = docs.select($"doc_id",
          explode(TextOps.toks($"text")).as("term"))
          .filter(length($"term") > 0)
        val nTok = toks.count()
        val nPost = toks.filter($"term".isin(Retrieval.QueryTerms: _*)).count()
        // min-of-2 (bench methodology): first pass absorbs JIT warmup
        val runs = (1 to 2).map(_ =>
          timed(Retrieval.bm25TopK(docs, Retrieval.QueryTerms, 10).collect()))
        val (top, t) = runs.minBy(_._2)
        println(f"[bm25-probe] $label tokens=$nTok queryPostings=$nPost " +
          f"(${100.0 * nPost / nTok}%.2f%%) top1=${top.head.getLong(0)} " +
          f"time=$t%.2f s")
      }
      spark.stop(); return
    }

    if (args.length > 1 && args(1) == "lsh") {
      // LSH sizing probe (VERDICT r3 #9): pinned r=4 vs autoBitsPerBand(n)
      // — candidate volume, bucket skew, and surviving pair count, the
      // empirical side of the "r must grow with n" design claim. As of
      // r8 the DECLARED queries use the adaptive r (the 10× gate
      // measured pinned r=4 at ×96); "pinned" here keeps quantifying
      // what the fixed config would have cost.
      // Optional factor arg (`Profile <sf> lsh 10`) additionally builds a
      // factor× corpus: copy k's vectors are CYCLICALLY SHIFTED by k·7
      // components — within a copy every pairwise cosine is EXACTLY the
      // 1× value (same permutation on both sides of every dot product),
      // across copies dots decorrelate (~N(0, 1/64)), so near-dup
      // structure replicates ×factor while per-bucket fanout behaves
      // like a real corpus of n·factor vectors. The claim under test:
      // pinned r keeps 2^r buckets, so pairs grow ~(factor)² — auto r
      // grows with log n and holds per-bucket fanout (and thus pair
      // volume per vector) constant.
      import graft.llm.{Dedup, Similarity}
      val factor = if (args.length > 2) args(2).toInt else 1
      val dims = 64
      val dirs = ("1x", dir) +: (if (factor <= 1) Seq() else {
        val d = "target/lshprobe-docs"
        val base = Tables.load(spark, dir, "embeddings")
        // Copy offset from the data, not a constant (same ADVICE-r7
        // collision hazard as the bm25 probe): a fixed stride silently
        // collides vec_ids on any base table with vec_id ≥ stride.
        val vecStride = base.agg(max($"vec_id")).head().getLong(0) + 1L
        (0 until factor).map { i =>
          if (i == 0) base
          else {
            val s = (i * 7) % dims
            base.select(($"vec_id" + lit(i * vecStride)).as("vec_id"),
              concat(slice($"embedding", s + 1, dims - s),
                     slice($"embedding", 1, s)).as("embedding"),
              $"label")
          }
        }.reduce(_ unionAll _)
          .write.mode("overwrite").parquet(s"$d/embeddings.parquet")
        Seq((s"${factor}x", d))
      })
      for ((lbl, d) <- dirs) {
        val n = Tables.load(spark, d, "embeddings").count()
        val autoBits = Similarity.autoBitsPerBand(n)
        println(s"[lsh-probe] $lbl corpus n=$n autoBitsPerBand=$autoBits " +
          s"(declared queries use this, capped at ${Similarity.MaxLshBits}; " +
          s"'pinned' below = the pre-r8 fixed r=${Similarity.LshBitsPerBand})")
        for ((label, bits) <- Seq("pinned" -> Similarity.LshBitsPerBand,
                                  "auto"   -> autoBits)) {
          val posts = Similarity.bandBuckets(spark, d, Similarity.LshBands, bits)
            .groupBy($"band", $"bucket").count()
          val s = posts.agg(
            count(lit(1)).as("buckets"),
            max($"count").as("max_bucket"),
            sum($"count" * ($"count" - 1) / 2).as("gen_pairs")).head()
          val t0 = System.nanoTime()
          val survivors = Dedup.embeddingNearDupLsh(spark, d,
            bands = Similarity.LshBands, bitsPerBand = bits).count()
          val t = (System.nanoTime() - t0) / 1e9
          println(f"[lsh-probe] $lbl $label r=$bits: buckets=${s.get(0)} " +
            f"maxBucket=${s.get(1)} generatedPairs=${s.get(2)} " +
            f"survivingPairs(cos≥0.30)=$survivors time=$t%.2f s")
        }
      }
      spark.stop(); return
    }

    if (args.length > 1 && args(1) == "temporal") {
      // Temporal-join scale probe: the adversarial regime for per-key
      // temporal joins is DENSITY growth — same keys, factor× history
      // per key (more events per user over the same span). A bare range
      // predicate plans as equi-join-on-key + filter, so its candidate
      // volume is Σᵤ p_u·v_u — quadratic in per-key density — while the
      // binned spelling's candidates are capped at ±1 lag window per
      // left row (linear in density for fixed lag), and the union+window
      // as-of never forms pairs at all (sort-dominated, ~linear).
      // Build: factor copies of events, SAME user_ids, event_id remapped,
      // ts shifted by i·1327 ms (breaks exact-ts ties, keeps the span).
      import graft.llm.TemporalJoins
      val factor = if (args.length > 2) args(2).toInt else 10
      val lagSec = 12L * 3600
      val base = Tables.load(spark, dir, "events")
      // Copy offset from the data, not a constant (ADVICE-r7 collision
      // hazard): a fixed stride collides event_ids on a large base table.
      val evStride = base.agg(max($"event_id")).head().getLong(0) + 1L
      val dirs = ("1x", dir) +: (if (factor <= 1) Seq() else {
        val d = "target/temporalprobe"
        (0 until factor).map { i =>
          if (i == 0) base
          else base.select(($"event_id" + lit(i * evStride)).as("event_id"),
            ($"ts" + expr(s"INTERVAL ${i * 1327} milliseconds")).as("ts"),
            $"user_id", $"event_type", $"value", $"props")
        }.reduce(_ unionAll _)
          .write.mode("overwrite").parquet(s"$d/events.parquet")
        Seq((s"${factor}x-dense", d))
      })
      def timed[A](body: => A): (A, Double) = {
        val t0 = System.nanoTime()
        val a = body
        (a, (System.nanoTime() - t0) / 1e9)
      }
      for ((lbl, d) <- dirs) {
        val ev = Tables.load(spark, d, "events")
        val p = ev.filter($"event_type" === "purchase")
          .select($"event_id".as("p_id"), $"user_id", $"ts")
        val v = ev.filter($"event_type" === "view")
          .select($"event_id", $"user_id", $"ts", $"value")
        // candidate volume each spelling materializes before its filter
        val perUser = p.groupBy($"user_id").agg(count(lit(1)).as("np"))
          .join(v.groupBy($"user_id").agg(count(lit(1)).as("nv")), Seq("user_id"))
        val naiveCand = perUser.agg(sum($"np" * $"nv")).head().getLong(0)
        val lagUs = lagSec * 1000000L
        val binnedCand = p.withColumn("b", floor(unix_micros($"ts") / lagUs))
          .groupBy($"user_id", $"b").agg(count(lit(1)).as("np"))
          .join(v.withColumn("b0", floor(unix_micros($"ts") / lagUs))
              .withColumn("b", explode(array($"b0", $"b0" + 1)))
              .groupBy($"user_id", $"b").agg(count(lit(1)).as("nv")),
            Seq("user_id", "b"))
          .agg(sum($"np" * $"nv")).head().getLong(0)
        println(s"[temporal-probe] $lbl candidates: naiveRange=$naiveCand " +
          s"binnedRange=$binnedCand (x${naiveCand / math.max(binnedCand, 1)} reduction)")

        val (nBin, tBin) = timed(TemporalJoins.boundedRangeJoin(
          p, v, Seq("user_id"), "ts", "ts", lagSec).count())
        val (nNaive, tNaive) = timed(p.as("p").join(v.as("v"),
            $"p.user_id" === $"v.user_id" &&
              $"v.ts" >= $"p.ts" - expr(s"INTERVAL $lagSec seconds") &&
              $"v.ts" < $"p.ts").count())
        println(f"[temporal-probe] $lbl rangeJoin: binned=$tBin%.2f s " +
          f"naive=$tNaive%.2f s (pairs=$nBin%d, equal=${nBin == nNaive})")

        val (nAsof, tAsof) = timed(TemporalJoins.asofJoin(p, v,
          Seq("user_id"), "ts", "ts", rightPayload = Seq("event_id")).count())
        val (nAsofN, tAsofN) = timed {
          import org.apache.spark.sql.expressions.Window
          p.join(v.select($"event_id".as("v_id"), $"user_id", $"ts".as("v_ts")),
              Seq("user_id"), "left")
            .filter($"v_ts".isNull || $"v_ts" < $"ts")
            .withColumn("rk", row_number().over(
              Window.partitionBy($"p_id").orderBy($"v_ts".desc_nulls_last)))
            .filter($"rk" === 1).count()
        }
        println(f"[temporal-probe] $lbl asof: unionWindow=$tAsof%.2f s " +
          f"naivePairMax=$tAsofN%.2f s (rows=$nAsof%d/$nAsofN%d)")
      }
      spark.stop(); return
    }

    if (args.length > 1 && args(1) == "contamination") {
      // d_contamination scale probe (VERDICT r7 Next #8): the design
      // claim is that the EVAL side broadcasts (eval sets are fixed-size
      // benchmarks) and the corpus side never shuffles for the join —
      // so a factor× corpus should cost ~factor× scan, with candidate
      // volume bounded by eval postings × matching corpus postings.
      // Probe regime: eval postings FIXED (copy-0 docs only, the
      // benchmark doesn't grow with the corpus), corpus ×factor via the
      // shard salt (cc-probe regime — cross-copy shingles disjoint).
      import graft.llm.TextOps
      val factor = if (args.length > 2) args(2).toInt else 10
      val base = Tables.load(spark, dir, "documents")
      val docStride = base.agg(max($"doc_id")).head().getLong(0) + 1L
      val dirs = ("1x", dir) +: (if (factor <= 1) Seq() else {
        val d = "target/contamprobe"
        (0 until factor).map { i =>
          if (i == 0) base
          else base.select(($"doc_id" + lit(i * docStride)).as("doc_id"),
            regexp_replace($"text", "(\\S+)", s"$$1z$i").as("text"),
            $"lang", $"source", $"n_chars")
        }.reduce(_ unionAll _)
          .write.mode("overwrite").parquet(s"$d/documents.parquet")
        Seq((s"${factor}x", d))
      })
      def timed[A](body: => A): (A, Double) = {
        val t0 = System.nanoTime()
        val a = body
        (a, (System.nanoTime() - t0) / 1e9)
      }
      for ((lbl, d) <- dirs) {
        def posts(df: org.apache.spark.sql.DataFrame) = df
          .select($"doc_id", explode(TextOps.shingles(TextOps.toks($"text"))).as("s0"))
          .select($"doc_id", TextOps.hash48($"s0").as("tok"))
          .distinct()
        val all = posts(Tables.load(spark, d, "documents"))
        // FIXED eval set: copy-0 ids only — the benchmark stays the same
        // size while the corpus grows
        val evalPosts = all
          .filter($"doc_id" % 50 === 0 && $"doc_id" < docStride)
          .select($"doc_id".as("eval_id"), $"tok")
        val nEval = evalPosts.count()
        val nCorpus = all.count()
        val ((pairs, t)) = timed(
          all.filter(!($"doc_id" % 50 === 0 && $"doc_id" < docStride))
            .join(broadcast(evalPosts), "tok")
            .groupBy($"doc_id", $"eval_id")
            .agg(count(lit(1)).as("n_shared"))
            .filter($"n_shared" >= 2).count())
        // broadcast feasibility: an eval posting row is ~16 B of data
        // (two longs) — report the measured row count against the 10 MB
        // default autoBroadcastJoinThreshold and the implied doc bound
        val postsPerDoc = nEval.toDouble / math.max(1L,
          evalPosts.select($"eval_id").distinct().count())
        val maxEvalDocs = (10L << 20) / 16 / math.max(1.0, postsPerDoc)
        println(f"[contam-probe] $lbl corpusPostings=$nCorpus " +
          f"evalPostings=$nEval (~${nEval * 16 / 1024}%d KiB broadcast) " +
          f"contaminatedPairs=$pairs time=$t%.2f s " +
          f"(~${postsPerDoc}%.0f postings/evalDoc -> 10 MiB threshold " +
          f"fits ~${maxEvalDocs}%.0f eval docs; beyond that flip to a " +
          f"shuffle join on tok)")
      }
      spark.stop(); return
    }

    if (args.length > 1 && args(1) == "fuzzy") {
      // j7 blocking scale probe (VERDICT r7 #1): brand-only blocking has
      // within-block C(n,2) candidates — quadratic in the catalog. The
      // r8 composite key (brand × token-pos × SymSpell del-1 variant)
      // should track the name VOCABULARY instead. The salted ×factor
      // catalog models real catalog growth (a 10× catalog carries ~10×
      // distinct product words): copy k suffixes every name token with
      // "~kkk" — the k digit TRIPLED, so any two copies' suffixes are
      // ≥ 3 substitutions apart and cross-copy pairs can never land
      // within ed 2 (a single-digit suffix measured cross-copy matches:
      // "~1" vs "~2" is ONE edit). Copies are thus vocabulary-disjoint,
      // within-copy edit distances are preserved, and TRUE matches grow
      // ×factor (linear).
      // Claims under test: brand-only candidates grow ~factor²; SymSpell
      // candidates (and runtime) grow ~factor.
      val factor = if (args.length > 2) args(2).toInt else 10
      val base = Tables.load(spark, dir, "part")
        .select($"p_partkey", $"p_name", $"p_brand")
      val keyStride = base.agg(max($"p_partkey")).head().getLong(0) + 1L
      val dirs = ("1x", dir) +: (if (factor <= 1) Seq() else {
        val d = "target/fuzzyprobe"
        (0 until factor).map { i =>
          if (i == 0) base
          else base.select(($"p_partkey" + lit(i * keyStride)).as("p_partkey"),
            regexp_replace($"p_name", "(\\S+)", s"$$1~$i$i$i").as("p_name"),
            $"p_brand")
        }.reduce(_ unionAll _)
          .write.mode("overwrite").parquet(s"$d/part.parquet")
        Seq((s"${factor}x", d))
      })
      def timed[A](body: => A): (A, Double) = {
        val t0 = System.nanoTime()
        val a = body
        (a, (System.nanoTime() - t0) / 1e9)
      }
      for ((lbl, d) <- dirs) {
        val p = Tables.load(spark, d, "part")
          .select($"p_partkey", $"p_name", $"p_brand")
        // candidate volume: brand-only (r7 spelling) vs composite (r8)
        val brandCand = p.groupBy($"p_brand", length($"p_name").as("l"))
          .agg(count(lit(1)).as("n"))
          .withColumn("l2", explode(sequence($"l", $"l" + 2)))
          .as("a").join(p.groupBy($"p_brand", length($"p_name").as("l"))
            .agg(count(lit(1)).as("n")).as("b"),
            $"a.p_brand" === $"b.p_brand" && $"a.l2" === $"b.l")
          .agg(sum(when($"a.l" === $"b.l", ($"a.n" * ($"a.n" - 1)).cast("long") / 2)
            .otherwise($"a.n" * $"b.n")).cast("long")).head().getLong(0)
        val symCand = graft.queries.Relational.j7Candidates(spark, d).count()
        println(s"[fuzzy-probe] $lbl catalog=${p.count()} " +
          s"brandOnlyCandidates=$brandCand symspellCandidates=$symCand")
        // end-to-end: r7 brand-only spelling vs the declared r8 query
        val (nOld, tOld) = timed(p.as("a").join(p.as("b"),
            $"a.p_brand" === $"b.p_brand" && $"a.p_partkey" < $"b.p_partkey" &&
              abs(length($"a.p_name") - length($"b.p_name")) <= 2)
          .withColumn("dist", levenshtein($"a.p_name", $"b.p_name", 2))
          .filter($"dist".between(0, 2)).count())
        val (nNew, tNew) = timed(
          graft.queries.Relational.queries("j7_fuzzy_block")(spark, d).count())
        println(f"[fuzzy-probe] $lbl brandOnly=$tOld%.2f s symspell=$tNew%.2f s " +
          f"(matches=$nNew%d, equal=${nOld == nNew})")
      }
      spark.stop(); return
    }

    if (args.length > 1 && args(1) == "fuzzyrecall") {
      // Recall audit (VERDICT r7 #1 "done" criterion): what does each
      // blocking stage give up vs UNBLOCKED ground truth (all ed≤2 pairs
      // across the whole catalog, any brand)? Run at sf0.01 — the
      // unblocked pass is inherently O(n²) (that's the point).
      val p = Tables.load(spark, dir, "part")
        .select($"p_partkey", $"p_name", $"p_brand")
      val truth = p.as("a").crossJoin(p.as("b"))
        .filter($"a.p_partkey" < $"b.p_partkey" &&
          abs(length($"a.p_name") - length($"b.p_name")) <= 2 &&
          levenshtein($"a.p_name", $"b.p_name", 2).between(0, 2))
        .select($"a.p_partkey".as("key_a"), $"b.p_partkey".as("key_b"),
          ($"a.p_brand" === $"b.p_brand").as("same_brand"))
      truth.cache()
      val nTruth = truth.count()
      val nSameBrand = truth.filter($"same_brand").count()
      val nBlocked =
        graft.queries.Relational.queries("j7_fuzzy_block")(spark, dir).count()
      println(f"[fuzzy-recall] unblockedTruth=$nTruth withinBrand=$nSameBrand " +
        f"brandBlockRecall=${nSameBrand.toDouble / nTruth}%.4f " +
        f"symspellOutput=$nBlocked " +
        f"symspellRecallVsBrand=${nBlocked.toDouble / nSameBrand}%.4f")
      spark.stop(); return
    }

    if (args.length > 1 && args(1) == "explain") {
      // `Profile <sfDir> explain <query>`: the declared query's
      // formatted physical plan against that sf — the dev loop for
      // "is this the plan I'd want at this scale".
      if (args.length < 3) {
        System.err.println("usage: Profile <sfDir> explain <queryName>")
        spark.stop(); return
      }
      println(SparkEntry.queries(args(2))(spark, dir)
        .queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
      spark.stop(); return
    }

    if (args.length > 1 && args(1) == "simhash") {
      // SimHash banding probe (r8): single-block 4 × 12-bit bands vs
      // multi-index C(5,2) block-pair bands (18-20-bit keys). Both have
      // GUARANTEED recall at hamming ≤ 3 (same output); what differs is
      // the random-collision floor — n²/2^bits per band — which the 10×
      // gate measured going quadratic for the 12-bit scheme. Regime:
      // shard growth (per-copy token salt → cross-copy sketches
      // decorrelate; true near-dup structure replicates ×factor).
      import graft.llm.{Dedup, TextOps}
      val factor = if (args.length > 2) args(2).toInt else 10
      val base = Tables.load(spark, dir, "documents")
      val dStride = base.agg(max($"doc_id")).head().getLong(0) + 1L
      val dirs = ("1x", dir) +: (if (factor <= 1) Seq() else {
        val d = "target/simhashprobe"
        (0 until factor).map { i =>
          if (i == 0) base
          else base.select(($"doc_id" + lit(i * dStride)).as("doc_id"),
            regexp_replace($"text", "(\\S+)", s"$$1z$i").as("text"),
            $"lang", $"source", $"n_chars")
        }.reduce(_ unionAll _)
          .write.mode("overwrite").parquet(s"$d/documents.parquet")
        Seq((s"${factor}x", d))
      })
      def timed[A](body: => A): (A, Double) = {
        val t0 = System.nanoTime(); val a = body
        (a, (System.nanoTime() - t0) / 1e9)
      }
      for ((lbl, d) <- dirs) {
        val sim = TextOps.simhashTable(Tables.load(spark, d, "documents"))
          .localCheckpoint()
        // band layouts: (name, Seq(key expr per band))
        val oldBands = (0 until 4).map { b =>
          shiftright($"simhash", b * 12).bitwiseAND(lit((1L << 12) - 1))
        }
        val widths = Seq(10, 10, 10, 9, 9)
        val offsets = widths.scanLeft(0)(_ + _).init
        def blk(b: Int) = shiftright($"simhash", offsets(b))
          .bitwiseAND(lit((1L << widths(b)) - 1))
        val newBands = for { a <- 0 until 5; b <- (a + 1) until 5 }
          yield shiftleft(blk(a), widths(b)) + blk(b)
        for ((name, bandsArr) <- Seq("single-block-4x12" -> oldBands,
                                     "block-pair-C(5,2)" -> newBands)) {
          val st = sim.select($"doc_id", posexplode(array(bandsArr: _*)))
            .groupBy($"pos", $"col").agg(count(lit(1)).as("sz"))
            .filter($"sz" >= 2)
            .agg(sum($"sz" * ($"sz" - 1) / 2).as("gen_pairs"),
              max($"sz").as("max_bucket")).head()
          println(s"[simhash-probe] $lbl $name: genPairs=${st.get(0)} " +
            s"maxBucket=${st.get(1)}")
        }
        val (nOut, t) = timed(Dedup.simhashDedup(spark, d).count())
        println(f"[simhash-probe] $lbl simhashDedup(block-pair): " +
          f"outputPairs=$nOut time=$t%.2f s")
      }
      spark.stop(); return
    }

    if (args.length > 1 && args(1) == "cc") {
      // Dedup-family scale probe (VERDICT r4 #6): does the posting-list +
      // pointer-jumping design hold at 10× the bench corpus? Build a
      // REALISTIC 10× documents table — 10 copies with remapped doc_ids,
      // each copy's token stream salted with a copy marker so shingles
      // are DISJOINT across copies (a naive 10× clone makes every doc an
      // exact dup of its 9 clones: pair volume grows 100×, which is a
      // duplication artifact, not scale). Salted copies keep per-shingle
      // df flat, so candidate pairs should grow ~linearly and CC rounds
      // ~O(log n) — the two claims this probe checks empirically.
      // Two growth regimes, two salted 10× corpora:
      //  - "shard": every token gets a per-copy suffix → copies are
      //    shingle-disjoint sub-corpora with the SAME df distribution as
      //    1× (models heterogeneous growth: new shards, new domains).
      //    Everything should grow ~linearly here.
      //  - "homog": a per-copy marker token interleaved into the stream →
      //    the (marker, token, marker) shingles have df = per-copy
      //    token-df, i.e. COMMON shingles whose df grows with the corpus
      //    (models homogeneous growth: same distribution, more of it).
      //    This is the adversarial regime for an inverted-index join —
      //    df under the cap grows ⇒ pairs per list grow quadratically —
      //    and the df cap (maxShingleDf) is the explicit control knob.
      import graft.llm.Dedup
      val factor = if (args.length > 2) args(2).toInt else 10
      val base = Tables.load(spark, dir, "documents")
      // Copy offset from the data, not a constant (ADVICE-r7 collision
      // hazard): a fixed stride collides doc_ids on a large base corpus.
      val ccStride = base.agg(max($"doc_id")).head().getLong(0) + 1L
      def scaled(salt: Int => Column): DataFrame =
        (0 until factor).map { i =>
          if (i == 0) base
          else base.select(($"doc_id" + lit(i * ccStride)).as("doc_id"),
            salt(i).as("text"), $"lang", $"source", $"n_chars")
        }.reduce(_ unionAll _)
      val corpora = Seq(
        "shard" -> scaled(i => regexp_replace($"text", "(\\S+)", s"$$1z$i")),
        "homog" -> scaled(i => regexp_replace($"text", " ", s" z$i ")))
      val dirs = ("1x", dir) +: corpora.map { case (label, df) =>
        val d = s"target/ccprobe-$label"
        df.write.mode("overwrite").parquet(s"$d/documents.parquet")
        (s"${factor}x-$label", d)
      }
      def postingStats(d: String, cap: Long): String = {
        val sh = Tables.load(spark, d, "documents")
          .select($"doc_id", graft.llm.TextOps.shingles(TextOps.toks($"text")).as("sh"))
        val st = sh.select($"doc_id", explode($"sh").as("tok0"))
          .select($"doc_id", graft.llm.TextOps.hash48($"tok0").as("tok"))
          .groupBy($"tok").agg(count(lit(1)).as("d"))
          .filter($"d".between(2, cap))
          .agg(count(lit(1)).as("lists"), max($"d").as("max_df"),
            sum($"d" * ($"d" - 1) / 2).as("gen_pairs")).head()
        s"postingLists=${st.get(0)} maxDf=${st.get(1)} genPairs=${st.get(2)}"
      }
      def timed[A](body: => A): (A, Double) = {
        val t0 = System.nanoTime()
        val a = body
        (a, (System.nanoTime() - t0) / 1e9)
      }
      // incremental candidate volume under the same cap: per list,
      // |old|·|new| + C(|new|,2) with batch = doc_id % 10 = 0
      def incStats(d: String, cap: Long): String = {
        val sh = Tables.load(spark, d, "documents")
          .select($"doc_id", graft.llm.TextOps.shingles(TextOps.toks($"text")).as("sh"))
        val st = sh.select($"doc_id", explode($"sh").as("tok0"))
          .select($"doc_id", graft.llm.TextOps.hash48($"tok0").as("tok"))
          .groupBy($"tok")
          .agg(count(lit(1)).as("d"),
            sum(($"doc_id" % 10 === 0).cast("long")).as("nn"))
          .filter($"d".between(2, cap) && $"nn" >= 1)
          .agg(sum(($"d" - $"nn") * $"nn" + $"nn" * ($"nn" - 1) / 2)
            .as("gen_pairs")).head()
        s"incGenPairs=${st.get(0)}"
      }
      for ((label, d) <- dirs) {
        for (cap <- Seq(1000L, 100L)) {
          val (n, t) = timed(Dedup.ngramJaccard(spark, d, maxShingleDf = cap).count())
          println(f"[cc-probe] $label ngram(df<=$cap): ${postingStats(d, cap)} " +
            f"survivingPairs=$n time=$t%.2f s")
        }
        val (nInc, tInc) = timed(
          Dedup.ngramJaccardIncremental(spark, d, _ % 10 === 0).count())
        println(f"[cc-probe] $label incremental(batch=10%%): ${incStats(d, 100L)} " +
          f"survivingPairs=$nInc time=$tInc%.2f s")
        if (!label.endsWith("homog")) {
          // minhash is probed on the clean regimes only: the homog
          // corpus' artificial marker shingles occupy half of every
          // signature's slots, which overweights common shingles far
          // beyond any real Zipf tail and tells nothing transferable.
          val (nMh, tMh) = timed(Dedup.minhashDedup(spark, d).count())
          println(f"[cc-probe] $label minhash: survivingPairs=$nMh time=$tMh%.2f s")
        }
        val (_, tCc) = timed(Dedup.nearDupClusters(spark, d)
          .write.mode("overwrite").format("noop").save())
        println(f"[cc-probe] $label clusters(total incl. pair-gen): time=$tCc%.2f s")
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
