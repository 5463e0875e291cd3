package graft.llm

import java.nio.file.{Files, Paths, StandardCopyOption}

import scala.jdk.CollectionConverters._

import org.apache.spark.ml.clustering.{KMeans, KMeansModel}
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Persisted ANN index artifacts (VERDICT r10 #2/#3).
  *
  * Until r10 the IVF / PQ / IVF-PQ tiers re-fit their KMeans codebooks
  * inside every query invocation — fit-dominated cost on every call,
  * where a production 100 TB engine trains ONCE and serves many. This
  * store materializes the three artifact kinds as parquet tables:
  *
  *   ivf   : cents(list_id, cent DOUBLE[])            — coarse centroids
  *           codes(vec_id, list_id)                   — inverted lists
  *   pq    : books(sub, code, cent DOUBLE[])          — m×ncodes codebooks
  *           codes(vec_id, c0..c{m-1})                — 4 B/vector codes
  *   ivfpq : cents + books (residual) + codes(vec_id, list_id, c0..c{m-1})
  *
  * Layout contract:
  *  - one directory per (kind, component, corpus signature):
  *    `<tmpdir>/graft-index/<Version>/<kind>/<component>/sig=<sig>` —
  *    the sig= spelling is DELIBERATE hive partitioning: a DuckDB oracle
  *    reads the glob with hive_partitioning=1 and filters on the same
  *    [[sig]] signature it computes from the embeddings table,
  *    so the static oracle string finds the right corpus's artifact
  *    without knowing the sfDir. That is what converts the PQ/IVF tiers
  *    from "no oracle — KMeans is engine-internal" to hash-checked: the
  *    codebooks become a pinned parquet input BOTH engines read, and the
  *    ADC scan + shortlist + exact re-rank is plain arithmetic either
  *    side can replay bit-exactly (doubles round-trip parquet exactly).
  *  - [[Version]] pins the hyperparameters; any format/param change bumps
  *    it rather than silently reusing a stale artifact.
  *  - writes are write-to-temp + atomic rename, so a concurrent second
  *    JVM can never observe a half-written index; the loser of the
  *    rename race discards its copy (both trained the same artifact).
  *  - ensure*() trains only when the artifact is absent; build/train*()
  *    never reads the store — `sim_topk_ivfpq` stays the honest
  *    build-cost benchmark while `sim_topk_ivfpq_cached` (and the pq/ivf
  *    tiers) measure the serve path.
  *
  * At 100 TB the codes tables live wherever the corpus lives (they are
  * the compressed corpus); only the codebooks/centroids — kilobytes —
  * are driver metadata. Scoring reads nprobe lists' codes, never vectors.
  */
object AnnIndex {

  // Hyperparameters — pinned into Version so artifacts can't go stale
  // silently. Mirrors Similarity's declared-query configuration.
  val NList = 16
  val M = 8
  val NCodes = 16
  val Dim = 64
  val SubDim: Int = Dim / M

  val Version = s"v1-nlist$NList-m$M-nc$NCodes"

  def base: String =
    Paths.get(sys.props("java.io.tmpdir"), "graft-index", Version).toString

  /** Corpus signature: row count + Σvec_id + Σ⌊1e6·embedding[0]⌋ —
    * cheap on both engines (a two-column scan), distinct across every
    * sf tier, and recomputed per invocation so a regenerated corpus
    * gets a fresh artifact. The third term is VALUE-sensitive (ADVICE
    * r11 #2): a corpus regenerated with the same vec_ids but different
    * vectors must not silently serve a stale index. The micro-quantized
    * integer sum is bit-exact on both engines (float→double widening is
    * exact, the double multiply+floor are identical IEEE ops, the sum
    * is exact integer arithmetic). */
  def sig(spark: SparkSession, dir: String): String = {
    // ARTIFACT-BACKED memo (r14, VERDICT r13 #5 — replaces the r13
    // in-process TrieMap, which made serve entries after the first
    // cheaper inside one bench JVM than in a cold process): each
    // persisted component dir records the corpus files' metadata
    // fingerprint in a `_FP` sidecar (written by recordFp after the
    // artifact exists; `_`-prefixed, so invisible to both parquet
    // readers and the oracle's `sig=*/*.parquet` glob). A matching
    // sidecar line proves some persisted tier was trained from THIS
    // exact file set — the sig can be read off the dir name instead of
    // re-paid as a corpus scan. No process state: a cold JVM gets the
    // same answer at the same (filesystem-metadata) cost, and a
    // regenerated corpus (new sizes/mtimes — the driver regenerates
    // testdata between rounds) misses and rescans.
    val fp = fsFingerprint(dir)
    storedSig(fp).getOrElse {
      val r = Tables.load(spark, dir, "embeddings")
        .agg(count(lit(1)).as("n"), sum(col("vec_id")).as("sv"),
          sum(floor(col("embedding").getItem(0).cast("double") * 1000000)
            .cast("long")).as("ev")).head()
      s"${r.getLong(0)}_${r.getLong(1)}_${r.getLong(2)}"
    }
  }

  /** Scan the store for a component dir whose `_FP` sidecar contains
    * this fingerprint; its `sig=` dir name is the memoized sig. A few
    * directory reads — never a data scan. */
  private def storedSig(fp: String): Option[String] = {
    val b = Paths.get(base)
    if (!Files.isDirectory(b)) return None
    val kinds = Files.list(b)
    try kinds.iterator().asScala.filter(Files.isDirectory(_)).flatMap { kind =>
      val comps = Files.list(kind)
      try comps.iterator().asScala.filter(Files.isDirectory(_)).flatMap { comp =>
        val sigs = Files.list(comp)
        try sigs.iterator().asScala.flatMap { sd =>
          val n = sd.getFileName.toString
          val fpFile = sd.resolve("_FP")
          if (n.startsWith("sig=") && Files.exists(fpFile) &&
              Files.readAllLines(fpFile).asScala.contains(fp))
            Some(n.stripPrefix("sig="))
          else None
        }.toList
        finally sigs.close()
      }.toList
      finally comps.close()
    }.toList.headOption
    finally kinds.close()
  }

  /** Record the corpus fingerprint into every existing `sig=<s>`
    * component dir (idempotent append). Called by the ensure* paths
    * AFTER their artifacts exist, so the sidecar always describes a
    * complete tier. Multiple fingerprints per sidecar are fine — a
    * corpus rewritten byte-identically (same sig, new mtimes) appends
    * a second line mapping to the same sig. */
  private def recordFp(s: String, dir: String): Unit = {
    val fp = fsFingerprint(dir)
    val b = Paths.get(base)
    if (!Files.isDirectory(b)) return
    val kinds = Files.list(b)
    try kinds.iterator().asScala.filter(Files.isDirectory(_)).foreach { kind =>
      val comps = Files.list(kind)
      try comps.iterator().asScala.filter(Files.isDirectory(_)).foreach { comp =>
        val sd = comp.resolve(s"sig=$s")
        if (ready(sd.toString)) {
          val fpFile = sd.resolve("_FP")
          val known = if (Files.exists(fpFile))
            Files.readAllLines(fpFile).asScala.toSet else Set.empty[String]
          if (!known.contains(fp))
            Files.writeString(fpFile, fp + "\n",
              java.nio.file.StandardOpenOption.CREATE,
              java.nio.file.StandardOpenOption.APPEND)
        }
      }
      finally comps.close()
    }
    finally kinds.close()
  }

  /** One line of filesystem metadata identifying the corpus: the dir
    * path (so two corpora with coincidentally identical listings can
    * never share a sidecar line) plus every data file's
    * (name, size, mtime). */
  private def fsFingerprint(dir: String): String =
    s"${Paths.get(dir).toAbsolutePath.normalize}::${fsListing(dir)}"

  private def fsListing(dir: String): String = {
    val p = Paths.get(dir, "embeddings.parquet")
    if (Files.isDirectory(p)) {
      val st = Files.list(p)
      try st.iterator().asScala.toSeq.sortBy(_.toString)
        .map(f => s"${f.getFileName}:${Files.size(f)}:" +
          s"${Files.getLastModifiedTime(f).toMillis}")
        .mkString("|")
      finally st.close()
    } else if (Files.exists(p))
      s"${Files.size(p)}:${Files.getLastModifiedTime(p).toMillis}"
    else "absent"
  }

  /** The DuckDB spelling of [[sig]] as a one-row CTE body. */
  val sigSql: String =
    "SELECT CAST(count(*) AS VARCHAR) || '_' || CAST(sum(vec_id) AS VARCHAR)" +
      " || '_' || CAST(sum(CAST(floor(CAST(embedding[1] AS DOUBLE) * 1000000)" +
      " AS BIGINT)) AS VARCHAR) AS s FROM embeddings"

  def componentPath(kind: String, component: String, s: String): String =
    s"$base/$kind/$component/sig=$s"

  /** Oracle-side glob for a component (all sigs; the oracle filters). */
  def componentGlob(kind: String, component: String): String =
    s"$base/$kind/$component/sig=*/*.parquet"

  private[llm] def ready(p: String): Boolean =
    Files.exists(Paths.get(p, "_SUCCESS"))

  /** Write-to-temp + atomic rename; the rename loser (target appeared
    * concurrently) discards its identical copy. The temp name must NOT
    * match the oracle's `sig=*` glob — a writer that died mid-write
    * would otherwise leave a half-written parquet file readable by the
    * glob; `_tmp-…` is skipped by both the glob and parquet dir rules.
    * A move failure is only swallowed when the target actually exists
    * complete (the lost-race case); otherwise it rethrows (ADVICE r11
    * #5) — the old broad catch discarded the freshly trained copy on
    * ANY move failure and loaders then read a missing/half artifact. */
  private[llm] def writeAtomic(df: DataFrame, target: String): Unit = {
    val t = Paths.get(target)
    val tmp = t.resolveSibling(
      s"_tmp-${t.getFileName}-${ProcessHandle.current().pid()}")
    df.write.mode("overwrite").parquet(tmp.toString)
    try Files.move(tmp, t, StandardCopyOption.ATOMIC_MOVE)
    catch {
      case e: java.nio.file.FileSystemException =>
        graft.util.Scratch.deleteRecursively(tmp)
        if (!ready(target)) throw e
    }
  }

  /** Store hygiene, run before any train (ADVICE r11 #3/#5):
    *  - prune sibling `sig=*` artifacts of the SAME TIER (identical
    *    row-count component, different value/id components) — those are
    *    regenerated-corpus leftovers, exactly one per driver round, and
    *    they both grow the store unboundedly and shift the oracle's
    *    componentGlob file list (DuckDB cardinality estimates move with
    *    it — an oracle green in one environment could flip to a
    *    join-order bomb in the driver's). OTHER tiers' artifacts are
    *    kept deliberately: the driver's round interleaves sf tiers
    *    (verify sf0.01 → bench sf0.1 → scale gates sf1/sf10), and
    *    pruning across tiers would force a retrain inside the first
    *    TIMED bench entry after every verify. The store is therefore
    *    bounded at one dir per tier, stable round-over-round.
    *  - sweep `_tmp-*` leftovers from writers that died between the
    *    parquet write and the rename. Only dead writers' temps are
    *    swept (pid suffix no longer alive) — a live concurrent
    *    trainer's in-flight temp is left alone. */
  private[llm] def sweep(component: String, keepSig: String): Unit = {
    val parent = Paths.get(component).getParent
    if (parent != null && Files.isDirectory(parent)) {
      val keep = s"sig=$keepSig"
      val tier = s"sig=${keepSig.takeWhile(_ != '_')}_"
      Files.list(parent).forEach { p =>
        val n = p.getFileName.toString
        val staleSig = n.startsWith(tier) && n != keep
        val deadTmp = n.startsWith("_tmp-") && {
          val pid = n.substring(n.lastIndexOf('-') + 1)
          pid.nonEmpty && pid.forall(_.isDigit) &&
            !ProcessHandle.of(pid.toLong).map[Boolean](_.isAlive).orElse(false)
        }
        if (staleSig || deadTmp) graft.util.Scratch.deleteRecursively(p)
      }
    }
  }

  // ---- training (shared with the inline-build query) ---------------

  private def emb(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "embeddings")
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("v"))

  private def coarseFit(e: DataFrame, seed: Long): KMeansModel =
    new KMeans().setK(NList).setSeed(seed)
      .setFeaturesCol("fv").setPredictionCol("list_id")
      .fit(e.withColumn("fv", array_to_vector(col("v"))))

  /** m independent per-subspace KMeans fits over `resCol` slices of the
    * hash-sampled training set, submitted from concurrent threads (the
    * fits are independent little jobs; serializing them pays m× the
    * fixed job latency). Codebooks are trained on a deterministic
    * ~20% hash sample — k·m centroids need thousands of points, not the
    * corpus; at 100 TB the sample rate shrinks with corpus size, the
    * fit cost doesn't grow. */
  private def fitBooks(trainSet: DataFrame, resCol: String,
                       seed0: Long): IndexedSeq[KMeansModel] = {
    def sliceCol(s: Int): Column =
      array_to_vector(slice(col(resCol), s * SubDim + 1, SubDim))
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global
    Await.result(Future.sequence((0 until M).map { s =>
      Future {
        new KMeans().setK(NCodes).setSeed(seed0 + s).setMaxIter(10)
          .setFeaturesCol("fv").setPredictionCol(s"c$s")
          .fit(trainSet.select(sliceCol(s).as("fv")))
      }
    }), Duration.Inf)
  }

  private def assignCodes(base: DataFrame, resCol: String,
                          books: Seq[KMeansModel]): DataFrame = {
    def sliceCol(s: Int): Column =
      array_to_vector(slice(col(resCol), s * SubDim + 1, SubDim))
    var coded = base
    books.zipWithIndex.foreach { case (b, s) =>
      coded = b.transform(coded.withColumn("fv", sliceCol(s))).drop("fv")
    }
    coded
  }

  private def centsDf(spark: SparkSession, m: KMeansModel): DataFrame = {
    import spark.implicits._
    m.clusterCenters.toSeq.zipWithIndex
      .map { case (c, i) => (i, c.toArray.toSeq) }
      .toDF("list_id", "cent")
  }

  private def booksDf(spark: SparkSession,
                      books: Seq[KMeansModel]): DataFrame = {
    import spark.implicits._
    books.zipWithIndex.flatMap { case (b, s) =>
      b.clusterCenters.zipWithIndex.map { case (c, j) =>
        (s, j, c.toArray.toSeq)
      }
    }.toDF("sub", "code", "cent")
  }

  /** PQ (raw-vector) train: m per-subspace codebooks + per-vector codes.
    * Exactly the r10 `sim_topk_pq` training path. */
  def trainPq(spark: SparkSession,
              dir: String): (IndexedSeq[KMeansModel], DataFrame) = {
    val e = emb(spark, dir)
    val trainSet = e.filter(
      TextOps.hash48(concat(lit("pq:"), col("vec_id").cast("string"))) % 5 === 0)
      .localCheckpoint(false)
    val books = fitBooks(trainSet, "v", seed0 = 42L)
    val codes = assignCodes(e, "v", books)
      .select(col("vec_id") +: (0 until M).map(s => col(s"c$s")): _*)
    (books, codes)
  }

  /** IVF train: coarse quantizer + inverted-list assignment. */
  def trainIvf(spark: SparkSession,
               dir: String): (KMeansModel, DataFrame) = {
    val e = emb(spark, dir)
    val model = coarseFit(e, seed = 42L)
    val codes = model
      .transform(e.withColumn("fv", array_to_vector(col("v"))))
      .select(col("vec_id"), col("list_id"))
    (model, codes)
  }

  /** IVF-PQ train (the Jégou IVFADC layout): coarse lists + residual
    * codebooks + (list, code) table. Exactly the r10 `sim_topk_ivfpq`
    * training path; see Similarity.topkIvfPq's scaladoc for the layout
    * rationale. */
  def trainIvfPq(spark: SparkSession, dir: String)
      : (KMeansModel, IndexedSeq[KMeansModel], DataFrame) = {
    import spark.implicits._
    val e = emb(spark, dir)
    val coarse = coarseFit(e, seed = 42L)
    val centDf = coarse.clusterCenters.toSeq.zipWithIndex
      .map { case (c, i) => (i, c.toArray.toSeq) }.toDF("list_id", "cent")
    // ONE coarse-assigned + residual lineage feeds both the codebook
    // training sample and the full encode (the house pinned-base rule)
    val assigned = coarse
      .transform(e.withColumn("fv", array_to_vector(col("v"))))
      .select(col("vec_id"), col("v"), col("list_id"))
      .join(broadcast(centDf), "list_id")
      .withColumn("res", zip_with(col("v"), col("cent"), (x, y) => x - y))
      .select(col("vec_id"), col("list_id"), col("v"), col("res"))
      .localCheckpoint(false)
    val trainSet = assigned.filter(
      TextOps.hash48(concat(lit("ivfpq:"), col("vec_id").cast("string"))) % 5 === 0)
    val books = fitBooks(trainSet, "res", seed0 = 142L)
    val codes = assignCodes(assigned, "res", books)
      .select(col("vec_id") +: col("list_id") +:
        (0 until M).map(s => col(s"c$s")): _*)
    (coarse, books, codes)
  }

  // ---- loaders ------------------------------------------------------

  private def loadCents(spark: SparkSession,
                        p: String): Array[Array[Double]] =
    spark.read.parquet(p).select("list_id", "cent").collect()
      .sortBy(_.getInt(0)).map(_.getSeq[Double](1).toArray)

  private def loadBooks(spark: SparkSession,
                        p: String): Array[Array[Array[Double]]] =
    spark.read.parquet(p).select("sub", "code", "cent").collect()
      .groupBy(_.getInt(0)).toArray.sortBy(_._1)
      .map(_._2.sortBy(_.getInt(1)).map(_.getSeq[Double](2).toArray))

  // ---- ensure (train-if-absent, then load from the store) -----------
  //
  // Scoring ALWAYS reads the loaded parquet artifact — never the
  // in-memory models — so the engine and the DuckDB oracle consume
  // byte-identical codebooks even right after a fresh train.

  /** Ensure the PQ artifact exists for this corpus; returns the
    * (books, codes) parquet paths for callers that want the artifact
    * TABLES rather than driver arrays (the incremental-encode op). */
  def ensurePqPaths(spark: SparkSession, dir: String): (String, String) = {
    val s = sig(spark, dir)
    val bp = componentPath("pq", "books", s)
    val cp = componentPath("pq", "codes", s)
    if (!ready(bp) || !ready(cp)) {
      sweep(bp, s); sweep(cp, s)
      val (books, codes) = trainPq(spark, dir)
      writeAtomic(booksDf(spark, books), bp)
      writeAtomic(codes.coalesce(8), cp)
    }
    recordFp(s, dir)
    (bp, cp)
  }

  def ensurePq(spark: SparkSession, dir: String)
      : (Array[Array[Array[Double]]], DataFrame) = {
    val (bp, cp) = ensurePqPaths(spark, dir)
    (loadBooks(spark, bp), spark.read.parquet(cp))
  }

  /** Ensure the IVF artifact exists; returns the (cents, codes) paths. */
  def ensureIvfPaths(spark: SparkSession, dir: String): (String, String) = {
    val s = sig(spark, dir)
    val kp = componentPath("ivf", "cents", s)
    val cp = componentPath("ivf", "codes", s)
    if (!ready(kp) || !ready(cp)) {
      sweep(kp, s); sweep(cp, s)
      val (model, codes) = trainIvf(spark, dir)
      writeAtomic(centsDf(spark, model), kp)
      writeAtomic(codes.coalesce(8), cp)
    }
    recordFp(s, dir)
    (kp, cp)
  }

  def ensureIvf(spark: SparkSession, dir: String)
      : (Array[Array[Double]], DataFrame) = {
    val (kp, cp) = ensureIvfPaths(spark, dir)
    (loadCents(spark, kp), spark.read.parquet(cp))
  }

  def ensureIvfPq(spark: SparkSession, dir: String)
      : (Array[Array[Double]], Array[Array[Array[Double]]], DataFrame) = {
    val s = sig(spark, dir)
    val kp = componentPath("ivfpq", "cents", s)
    val bp = componentPath("ivfpq", "books", s)
    val cp = componentPath("ivfpq", "codes", s)
    if (!ready(kp) || !ready(bp) || !ready(cp)) {
      sweep(kp, s); sweep(bp, s); sweep(cp, s)
      val (coarse, books, codes) = trainIvfPq(spark, dir)
      writeAtomic(centsDf(spark, coarse), kp)
      writeAtomic(booksDf(spark, books), bp)
      writeAtomic(codes.coalesce(8), cp)
    }
    recordFp(s, dir)
    (loadCents(spark, kp), loadBooks(spark, bp), spark.read.parquet(cp))
  }

  // ---- SemDeDup cluster artifact (kind "sem") -----------------------

  /** Target cluster size for the SemDeDup partition ([[Dedup.semDedup]]).
    * k scales WITH the corpus (k ≈ n / target) — the published SemDeDup
    * configuration and the reason the method is linear at 100 TB:
    * within-cluster pair work is n·target/2 whatever the corpus size.
    * A fixed k (the IVF NList) would make clusters corpus-sized and the
    * pair stage quadratic — the same fixed-parameter failure mode the
    * adaptive LSH bits (Similarity.gateBits) exist to prevent. */
  val SemTarget = 512

  def semK(n: Long): Int =
    math.max(4, ((n + SemTarget - 1) / SemTarget).toInt)

  /** Ensure the SemDeDup centroid artifact exists for this corpus: one
    * corpus-adaptive KMeans fit, trained on the deterministic 20% hash
    * sample (the codebook convention — centroids need thousands of
    * points, not the corpus, so fit cost is flat in corpus size at a
    * fixed target cluster count... here k grows with n, so the sample
    * keeps fit input at n/5 while k = n/512: ~102 training points per
    * centroid at any sf). ONLY the centroids persist — cluster
    * assignment is an exact in-plan argmin on BOTH engines (the
    * sim_index_update rule: no dependence on MLlib transform
    * internals), so the cents parquet is the complete replayable
    * contract and the tier needs no codes component. */
  def ensureSemPath(spark: SparkSession, dir: String): String = {
    val s = sig(spark, dir)
    val cp = componentPath("sem", "cents", s)
    if (!ready(cp)) {
      sweep(cp, s)
      val e = emb(spark, dir)
      val k = semK(s.takeWhile(_ != '_').toLong)
      val train = e.filter(
        TextOps.hash48(concat(lit("sem:"), col("vec_id").cast("string"))) % 5 === 0)
      val model = new KMeans().setK(k).setSeed(7L).setMaxIter(20)
        .setFeaturesCol("fv").setPredictionCol("list_id")
        .fit(train.withColumn("fv", array_to_vector(col("v"))))
      writeAtomic(centsDf(spark, model), cp)
    }
    recordFp(s, dir)
    cp
  }
}
