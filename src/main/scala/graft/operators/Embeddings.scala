package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.Tables

/** Similarity search over the `embeddings` table
  * (vec_id, embedding: array<float>, label).
  *
  * Two tiers, per the standard ANN playbook:
  *  - [[knnBrute]] — exact brute-force cosine top-k: broadcast the
  *    (small) query set, stream the corpus once, windowed top-k. The
  *    correctness baseline; linear in corpus size, no shuffle of the
  *    corpus itself (only the k·|queries| survivors).
  *  - [[annLsh]] — `BucketedRandomProjectionLSH` over L2-normalized
  *    vectors (on unit vectors, euclidean distance is monotone in
  *    cosine: d² = 2 − 2·cos), candidates from bucket joins only.
  *    The 100-TB path: probes touch buckets, not the corpus.
  *
  * Vector math is `zip_with`/`aggregate` over the float arrays, cast
  * to double before multiply-accumulate — codegen'd, no UDFs, and
  * bit-identical to the DuckDB oracle's sequential fold.
  */
object Embeddings {

  /** Sequential-fold dot product of two float array columns, in
    * double. */
  def dotCol(a: String, b: String): Column =
    expr(s"aggregate(zip_with($a, $b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), " +
      "CAST(0 AS DOUBLE), (acc, v) -> acc + v)")

  def normCol(a: String): Column =
    sqrt(expr(s"aggregate($a, CAST(0 AS DOUBLE), (acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))"))

  /** Exact top-k cosine neighbors for each query vector. Queries are
    * broadcast (tiny); the corpus is scanned once, each partition
    * scoring all queries; the window top-k shuffles only on q_id. */
  def knnBrute(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val scored = corpus
      .join(broadcast(queries), col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        round(dotCol("q_emb", "embedding") / (normCol("q_emb") * normCol("embedding")), 6)
          .as("sim"))
    val w = Window.partitionBy("q_id").orderBy(col("sim").desc, col("vec_id").asc)
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select("q_id", "vec_id", "sim", "rnk")
      .orderBy("q_id", "rnk")
  }

  /** Registered query: exact top-10 cosine neighbors for the first 10
    * vectors, DuckDB-oracle-checked (double fold is deterministic in
    * both engines; sims rounded to 6 before ranking so tie-breaks
    * agree). */
  def embedKnn(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.load(spark, dir, "embeddings").select("vec_id", "embedding")
    val queries = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    knnBrute(emb, queries, k = 10)
  }

  /** Approximate top-k via random-projection LSH on L2-normalized
    * vectors. Reusable over any (vec_id, embedding) frame. */
  def annLsh(corpus: DataFrame, queryIds: Column, k: Int,
             distThreshold: Double = 1.35): DataFrame = {
    import org.apache.spark.ml.feature.BucketedRandomProjectionLSH
    import org.apache.spark.ml.functions.array_to_vector
    val unit = corpus.select(col("vec_id"),
      array_to_vector(expr(
        "transform(embedding, x -> CAST(x AS DOUBLE) / " +
          "sqrt(aggregate(embedding, CAST(0 AS DOUBLE), (a, v) -> a + CAST(v AS DOUBLE) * CAST(v AS DOUBLE))))"))
        .as("features"))
    val lsh = new BucketedRandomProjectionLSH()
      .setInputCol("features").setOutputCol("hashes")
      // bucketLength ~ the top-k neighbor distance (≈1.2 on unit
      // vectors here) keeps per-table collision probability ≥ ~0.5 at
      // that range; 6 tables OR'd pushes candidate recall ≥ 0.9.
      .setBucketLength(1.0).setNumHashTables(6).setSeed(42)
    val model = lsh.fit(unit)
    val queries = unit.filter(queryIds).select(
      col("vec_id").as("q_id"), col("features"))
    val cands = model.approxSimilarityJoin(
        unit, queries, distThreshold, "dist")
      .select(col("datasetB.q_id").as("q_id"), col("datasetA.vec_id").as("vec_id"),
        col("dist"))
      .filter(col("q_id") =!= col("vec_id"))
    val w = Window.partitionBy("q_id").orderBy(col("dist").asc, col("vec_id").asc)
    cands.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("q_id"), col("vec_id"), round(col("dist"), 6).as("dist"), col("rnk"))
      .orderBy("q_id", "rnk")
  }

  /** Registered query: LSH-approximate top-10 for the first 10 vectors
    * (rows-only check; recall@10 vs [[knnBrute]] asserted in the
    * spec). */
  def embedAnnLsh(spark: SparkSession, dir: String): DataFrame =
    annLsh(Tables.load(spark, dir, "embeddings"), col("vec_id") < 10, k = 10)

  /** 64-bit sign-random-projection signature (SimHash for vectors):
    * bit p = sign(⟨embedding, r_p⟩) for 64 fixed ±1 random vectors.
    * Hamming distance estimates the angle, so near-cosine vectors
    * share 16-bit bands with high probability. Single aggregate pass —
    * the embedding is referenced once (array-accumulator pattern, see
    * Documents.simhashCol for why that matters). Supports dims ≤ 64. */
  private def signatureCol: Column = expr(
    """aggregate(
      |  zip_with(embedding, sequence(0, size(embedding) - 1),
      |           (e, j) -> struct(CAST(e AS DOUBLE) AS e, j AS j)),
      |  array_repeat(CAST(0 AS DOUBLE), 64),
      |  (acc, x) -> zip_with(acc, sequence(0, 63), (s, p) -> s + x.e * signs[p][x.j]),
      |  acc -> aggregate(sequence(0, 63), CAST(0 AS BIGINT),
      |         (b, p) -> b + CASE WHEN acc[p] > 0 THEN shiftleft(CAST(1 AS BIGINT), p)
      |                        ELSE CAST(0 AS BIGINT) END))""".stripMargin)

  /** Embedding-cosine near-dup pairs: sign-LSH band candidates + EXACT
    * cosine verify at `simThreshold`. 4×16-bit band join — a pair is a
    * candidate iff some band matches, so candidate volume is governed
    * by the angle (≈100% at cos ≥ 0.99, ~15% of random far pairs),
    * never all-pairs; the exact filter then makes precision 1.0.
    * Spark's BucketedRandomProjectionLSH is the wrong tool for a tight
    * cosine band: single-projection OR-amplified hashes on unit
    * vectors degenerate to ~2 buckets per table (all-pairs in
    * disguise — measured 233 s cold at 5k vectors vs ~3 s for this). */
  def embedCosinePairs(corpus: DataFrame, simThreshold: Double): DataFrame = {
    val rng = new scala.util.Random(42)
    val signs: Seq[Seq[Double]] =
      Seq.fill(64)(Seq.fill(64)(if (rng.nextBoolean()) 1.0 else -1.0))
    val sigs = corpus
      .withColumn("signs", typedlit(signs))
      .select(col("vec_id"), signatureCol.as("sig"))
      .repartition(col("vec_id")) // materialize sig before the band join
    val banded = sigs.select(col("vec_id"), explode(expr(
      """transform(sequence(0, 3),
        |          b -> struct(b AS band, shiftright(sig, b * 16) & 65535 AS v))""".stripMargin)).as("bv"))
    val cands = banded.as("a")
      .join(banded.as("b"),
        col("a.bv") === col("b.bv") && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("d1"), col("b.vec_id").as("d2"))
      .distinct()
    val e1 = corpus.select(col("vec_id").as("d1"), col("embedding").as("emb1"))
    val e2 = corpus.select(col("vec_id").as("d2"), col("embedding").as("emb2"))
    cands.join(e1, "d1").join(e2, "d2")
      .select(col("d1"), col("d2"),
        round(dotCol("emb1", "emb2") / (normCol("emb1") * normCol("emb2")), 6)
          .as("cos_sim"))
      .filter(col("cos_sim") >= simThreshold)
      .orderBy("d1", "d2")
  }

  /** Registered query (rows-only): cosine ≥ 0.95 near-dup pairs over
    * the embeddings table — 0 rows on this corpus (max pairwise cosine
    * ≈ 0.51), which is itself the correct answer; the planted-dup
    * recall bar is in EmbeddingsSpec. */
  def dedupEmbedCosine(spark: SparkSession, dir: String): DataFrame =
    embedCosinePairs(Tables.load(spark, dir, "embeddings"), simThreshold = 0.95)

  /** IVF (inverted-file) ANN — the centroid-partitioned scale path:
    * 1. coarse quantizer: per-cluster centroids (here from a grouped
    *    aggregation; a production index k-means-refines them);
    * 2. assignment: each corpus vector goes to its nearest centroid's
    *    posting list (one narrow shuffle keyed by centroid);
    * 3. probe: a query scores only the vectors in its `nProbe`
    *    nearest centroids' lists — cost scales with corpus/k·nProbe,
    *    not corpus.
    * Deterministic end-to-end (no sampling), so recall vs brute force
    * is a stable spec assertion. Complements [[annLsh]]: IVF wins when
    * the corpus clusters; LSH when it doesn't. */
  def annIvf(corpus: DataFrame, queryIds: Column, k: Int,
             nProbe: Int = 3): DataFrame = {
    // 1. centroids from the label structure (stand-in for k-means):
    //    (cid, centroid: array<double>)
    val centroids = corpus
      .select(col("label").as("cid"), posexplode(col("embedding")).as(Seq("pos", "x")))
      .groupBy("cid", "pos").agg(avg(col("x").cast("double")).as("v"))
      .groupBy("cid").agg(
        expr("transform(array_sort(collect_list(struct(pos, v))), s -> s.v)").as("centroid"))
    // 2. assignment: nearest centroid per vector (broadcast centroids,
    //    k is small by construction)
    val withCent = corpus.crossJoin(broadcast(centroids))
      .select(col("vec_id"), col("embedding"), col("cid"),
        (dotCol("embedding", "centroid") / (normCol("embedding") * normCol("centroid")))
          .as("csim"))
    val assignW = Window.partitionBy("vec_id").orderBy(col("csim").desc, col("cid").asc)
    val posting = withCent.withColumn("r", row_number().over(assignW))
      .filter(col("r") === 1).select(col("cid"), col("vec_id"), col("embedding"))
    // 3. probe: each query scores only its nProbe nearest centroids' lists
    val queries = withCent.filter(queryIds)
      .withColumn("r", row_number().over(assignW))
      .filter(col("r") <= nProbe)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"), col("cid"))
    val scored = queries.join(posting, "cid")
      .filter(col("q_id") =!= col("vec_id"))
      .select(col("q_id"), col("vec_id"),
        round(dotCol("q_emb", "embedding") / (normCol("q_emb") * normCol("embedding")), 6)
          .as("sim"))
      .groupBy("q_id", "vec_id").agg(max("sim").as("sim")) // dedup multi-probe hits
    val w = Window.partitionBy("q_id").orderBy(col("sim").desc, col("vec_id").asc)
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select("q_id", "vec_id", "sim", "rnk")
      .orderBy("q_id", "rnk")
  }

  /** Registered query (rows-only): IVF top-10 for the first 10 vectors
    * with 3-of-10 centroid probes. NOTE: this corpus's labels barely
    * align with cosine neighborhoods (11% of true top-10 share the
    * query's label), so recall here is structurally capped — the spec
    * asserts the ≥0.9 bar on genuinely clustered vectors, and
    * [[annLsh]] is the production pick for unclustered corpora. */
  def embedAnnIvf(spark: SparkSession, dir: String): DataFrame =
    annIvf(Tables.load(spark, dir, "embeddings"), col("vec_id") < 10, k = 10)

  /** Per-label centroid, emitted as (label, pos, v) rows — a grouped
    * vector aggregation (the "cluster summary" shape IVF indexes are
    * built from). posexplode keeps the aggregation a plain
    * (label, pos)-keyed hash agg with map-side partials — no
    * collect_list of whole vectors on the hot path. */
  def embedCentroid(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "embeddings")
      .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "x")))
      .groupBy("label", "pos")
      .agg(round(avg(col("x").cast("double")), 6).as("v"))
      .orderBy("label", "pos")
}
