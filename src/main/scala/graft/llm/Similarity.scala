package graft.llm

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.{array_to_vector, vector_to_array}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.llm.TextOps.hash48

/** Similarity search over the `embeddings` table (unit-norm float[64]).
  *
  * Three tiers, in increasing scale-readiness:
  *  1. Brute-force top-k: exact, quadratic in corpus size — the
  *     verification baseline. Restricted to a fixed probe set of queries
  *     so its cost is #queries × corpus, not corpus².
  *  2. Random-hyperplane LSH (sign bits → bucket): candidates share a
  *     bucket; sub-linear probe cost. Hyperplane components are
  *     md5-derived, so the WHOLE path (bucketing + ranking) is
  *     oracle-checkable — single-probe, recall documented.
  *  3. IVF (inverted-file) via KMeans coarse quantizer: probe the
  *     nprobe nearest centroid lists. The industry-standard ANN layout;
  *     centroids are model output → no SQL oracle (rows-only check).
  *
  * At 100 TB: tier 1 exists only as the per-candidate kernel; tiers 2/3
  * shuffle once on bucket/centroid id (bounded fanout per key) and the
  * centroid table broadcasts.
  */
object Similarity {

  type Q = (SparkSession, String) => DataFrame

  val TopK = 5
  val NumQueryVecs = 10 // probe set: vec_id < 10
  val LshBits = 8

  /** Embeddings as double arrays (exact cross-engine arithmetic). */
  private def emb(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.load(spark, dir, "embeddings")
      .select($"vec_id", transform($"embedding", x => x.cast("double")).as("v"))
  }

  /** Exact left-fold dot product (unit vectors → cosine). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  /** Deterministic pseudo-random hyperplane component for (plane j,
    * dim d): centered 48-bit md5 integer. Same expression exists in
    * DuckDB, so LSH bucketing is bit-identical across engines. */
  private def hpComponent(j: Int, d: Column): Column =
    (hash48(concat(lit(s"hp${j}_"), d.cast("string"))) - lit(1L << 47)).cast("double")

  /** LSH bucket id: sign bit of v·hp_j for j < LshBits. */
  def lshBucket(v: Column): Column = {
    val bits: Seq[Column] = (0 until LshBits).map { j =>
      val proj = aggregate(
        sequence(lit(0), lit(63)),
        lit(0.0),
        (acc, d) => acc + element_at(v, d + 1) * hpComponent(j, d))
      when(proj > 0, lit(1L << j)).otherwise(0L)
    }
    bits.reduce(_ + _)
  }

  /** Tier 1: exact top-k cosine for the probe queries against the whole
    * corpus. */
  def topkBrute(spark: SparkSession, dir: String, k: Int = TopK): DataFrame = {
    import spark.implicits._
    val e = emb(spark, dir)
    val q = e.filter($"vec_id" < NumQueryVecs)
      .select($"vec_id".as("query_id"), $"v".as("qv"))
    // broadcast the tiny probe set; one pass over the corpus, no corpus²
    val scored = broadcast(q).crossJoin(e)
      .filter($"vec_id" =!= $"query_id")
      .withColumn("cosine", dot($"qv", $"v"))
    val w = Window.partitionBy($"query_id").orderBy($"cosine".desc, $"vec_id".asc)
    scored.withColumn("rank", row_number().over(w))
      .filter($"rank" <= k)
      .select($"query_id", $"vec_id".as("neighbor_id"), $"cosine",
        $"rank".cast("long").as("rank"))
  }

  /** Tier 2: single-probe LSH — rank only within the query's bucket. */
  def topkLsh(spark: SparkSession, dir: String, k: Int = TopK): DataFrame = {
    import spark.implicits._
    val e = emb(spark, dir).withColumn("bucket", lshBucket($"v"))
    val q = e.filter($"vec_id" < NumQueryVecs)
      .select($"vec_id".as("query_id"), $"v".as("qv"), $"bucket")
    val scored = broadcast(q).join(e, Seq("bucket"))
      .filter($"vec_id" =!= $"query_id")
      .withColumn("cosine", dot($"qv", $"v"))
    val w = Window.partitionBy($"query_id").orderBy($"cosine".desc, $"vec_id".asc)
    scored.withColumn("rank", row_number().over(w))
      .filter($"rank" <= k)
      .select($"query_id", $"vec_id".as("neighbor_id"), $"bucket", $"cosine",
        $"rank".cast("long").as("rank"))
  }

  /** Tier 3: IVF — KMeans(16) coarse quantizer, assign every vector to
    * its centroid list, probe the 2 nearest lists per query. Centroids
    * are learned → no SQL oracle. */
  def topkIvf(spark: SparkSession, dir: String, k: Int = TopK,
              nlist: Int = 16, nprobe: Int = 2): DataFrame = {
    import spark.implicits._
    val e = emb(spark, dir).withColumn("fv", array_to_vector($"v"))
    val km = new KMeans().setK(nlist).setSeed(42L)
      .setFeaturesCol("fv").setPredictionCol("list_id")
    val model = km.fit(e)
    val assigned = model.transform(e).select($"vec_id", $"v", $"list_id")

    // Centroid table is tiny → collect to build the probe map, broadcast
    // via literal join (the standard IVF layout: probe sets are driver
    // metadata, vector lists stay distributed).
    val cents = model.clusterCenters.zipWithIndex
    val probes: Seq[(Long, Int)] = // (query centroid list) per query vec
      assigned.filter($"vec_id" < NumQueryVecs)
        .select($"vec_id", $"v").collect().flatMap { r =>
          val qid = r.getLong(0)
          val qv = r.getSeq[Double](1).toArray
          cents.map { case (c, i) =>
            val d = c.toArray.zip(qv).map { case (x, y) => (x - y) * (x - y) }.sum
            (qid, i, d)
          }.sortBy(_._3).take(nprobe).map(t => (qid, t._2))
        }.toSeq
    val probeDf = probes.toDF("query_id", "list_id")
    val q = emb(spark, dir).filter($"vec_id" < NumQueryVecs)
      .select($"vec_id".as("query_id"), $"v".as("qv"))
    val scored = broadcast(probeDf.join(q, "query_id"))
      .join(assigned, Seq("list_id"))
      .filter($"vec_id" =!= $"query_id")
      .withColumn("cosine", dot($"qv", $"v"))
    val w = Window.partitionBy($"query_id").orderBy($"cosine".desc, $"vec_id".asc)
    scored.withColumn("rank", row_number().over(w))
      .filter($"rank" <= k)
      .select($"query_id", $"vec_id".as("neighbor_id"), $"cosine",
        $"rank".cast("long").as("rank"))
  }

  val queries: Map[String, Q] = Map(
    "sim_topk_brute" -> ((s, d) => topkBrute(s, d)),
    "sim_topk_lsh"   -> ((s, d) => topkLsh(s, d)),
    "sim_topk_ivf"   -> ((s, d) => topkIvf(s, d)))

  // ---- DuckDB oracles ----------------------------------------------

  private val dotSql =
    """list_reduce(list_prepend(0.0::DOUBLE,
      |    list_transform(list_zip(q.qv, e.v), p -> p[1] * p[2])),
      |    (acc, x) -> acc + x)""".stripMargin

  private def hp48Sql(j: Int, dExpr: String): String =
    s"(CAST(('0x' || substr(md5('hp${j}_' || CAST($dExpr AS VARCHAR)), 1, 12)) AS BIGINT) - ${1L << 47})::DOUBLE"

  def bucketSql(vExpr: String): String = {
    val bits = (0 until LshBits).map { j =>
      s"""CASE WHEN list_reduce(list_prepend(0.0::DOUBLE,
         |  list_transform(generate_series(1, 64), d -> $vExpr[d] * ${hp48Sql(j, "d - 1")})),
         |  (acc, x) -> acc + x) > 0 THEN ${1L << j} ELSE 0 END""".stripMargin
    }
    bits.mkString("(", " + ", ")")
  }

  val oracles: Map[String, String] = Map(
    "sim_topk_brute" ->
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < $NumQueryVecs),
         |scored AS (
         |  SELECT q.query_id, e.vec_id AS neighbor_id, $dotSql AS cosine
         |  FROM q, e WHERE e.vec_id <> q.query_id),
         |r AS (SELECT *, row_number() OVER (PARTITION BY query_id
         |        ORDER BY cosine DESC, neighbor_id) AS rank FROM scored)
         |SELECT query_id, neighbor_id, cosine, rank FROM r WHERE rank <= $TopK""".stripMargin,

    "sim_topk_lsh" ->
      s"""WITH e0 AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |e AS (SELECT vec_id, v, ${bucketSql("v")} AS bucket FROM e0),
         |q AS (SELECT vec_id AS query_id, v AS qv, bucket FROM e WHERE vec_id < $NumQueryVecs),
         |scored AS (
         |  SELECT q.query_id, e.vec_id AS neighbor_id, q.bucket, $dotSql AS cosine
         |  FROM q JOIN e USING (bucket) WHERE e.vec_id <> q.query_id),
         |r AS (SELECT *, row_number() OVER (PARTITION BY query_id
         |        ORDER BY cosine DESC, neighbor_id) AS rank FROM scored)
         |SELECT query_id, neighbor_id, bucket, cosine, rank FROM r WHERE rank <= $TopK""".stripMargin)
}
