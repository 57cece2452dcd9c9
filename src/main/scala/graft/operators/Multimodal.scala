package graft.operators

import graft.{QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video payloads are opaque
  * `BINARY` columns with a typed metadata struct travelling beside them.
  *
  * The decode step is STUBBED (no image/audio libraries in this container —
  * see [[FakeDecoder]]): the decode produces a deterministic fake feature
  * vector from the payload bytes. Everything around it is real Spark
  * plumbing: schema, per-partition batched iteration, feature schema, and
  * the partitioning story.
  *
  * Scale design: payload bytes never shuffle — `decodeFeatures` is a
  * mapPartitions (narrow) stage, so a 100 TB binary lake is decoded where it
  * is read; only the small feature vectors flow on to joins/aggregations.
  * Batch shape: partitions are processed via a buffered iterator in batches
  * of [[FakeDecoder.batchSize]] rows, the same shape a real GPU/codec decode
  * would want (amortized model/codec setup per batch, bounded memory).
  */
object Multimodal extends QueryModule {

  val mediaSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("payload", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("format", StringType),
      StructField("n_bytes", LongType),
      StructField("sample_rate", IntegerType))))))

  /** Attach a fake binary payload + typed metadata to each document —
    * stands in for reading an image/audio column from a real lake.
    */
  def attachFakeMedia(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      col("text").cast("binary").as("payload"),
      struct(
        lit("fake/raw").as("format"),
        length(col("text").cast("binary")).cast("bigint").as("n_bytes"),
        lit(16000).as("sample_rate")).as("meta"))

  object FakeDecoder {
    val batchSize = 64
    val featureDim = 8

    /** STUB — a real implementation would decode the image/audio here.
      * Deterministic fake: k-th feature = mean of payload bytes at positions
      * ≡ k (mod featureDim), normalized to [0, 1].
      */
    def decodeBatch(payloads: Seq[Array[Byte]]): Seq[Array[Double]] =
      payloads.map { bytes =>
        val sums = new Array[Double](featureDim)
        val counts = new Array[Long](featureDim)
        var i = 0
        while (i < bytes.length) {
          val k = i % featureDim
          sums(k) += (bytes(i) & 0xff) / 255.0
          counts(k) += 1
          i += 1
        }
        Array.tabulate(featureDim)(k => if (counts(k) == 0) 0.0 else sums(k) / counts(k))
      }
  }

  val featureSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("features", ArrayType(DoubleType)),
    StructField("n_bytes", LongType)))

  /** Per-partition batched decode: the Spark-side contract a real
    * image/audio featurizer plugs into (mapPartitions, batches of
    * [[FakeDecoder.batchSize]], bounded memory, no shuffle).
    */
  def decodeFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val rdd = media.select(col("doc_id"), col("payload")).rdd.mapPartitions { it =>
      it.grouped(FakeDecoder.batchSize).flatMap { batch =>
        val feats = FakeDecoder.decodeBatch(batch.map(_.getAs[Array[Byte]]("payload")))
        batch.zip(feats).map { case (row, f) =>
          val payload = row.getAs[Array[Byte]]("payload")
          Row(row.getLong(0), f.toSeq, payload.length.toLong)
        }
      }
    }
    spark.createDataFrame(rdd, featureSchema)
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // binary-column metadata surface (oracle-checkable slice of the plumbing)
    "mm_binary_meta" -> ((s, d) => {
      attachFakeMedia(Tables.documents(s, d).orderBy(col("doc_id")))
        .select(
          col("doc_id"),
          col("meta.format").as("format"),
          col("meta.n_bytes").as("n_bytes"),
          ascii(substring(col("payload").cast("string"), 1, 1)).cast("bigint").as("first_code"))
    }))

  override def oracleSql: Map[String, String] = Map(
    "mm_binary_meta" ->
      """SELECT doc_id, 'fake/raw' AS format,
        |  octet_length(CAST(text AS BLOB)) AS n_bytes,
        |  CAST(ascii(substr(text, 1, 1)) AS BIGINT) AS first_code
        |FROM documents ORDER BY doc_id""".stripMargin)
}
