package graft.operators

import graft.{QueryModule, Tables}
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
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
  * would want (amortized model/codec setup per batch, bounded memory) — the
  * Scala `mapPartitions` analog of PySpark's `mapInPandas` batched-UDF
  * contract, which is where a Python decoder (PIL/torchcodec) would plug in.
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

  /** PNG-framed payloads: a REAL png byte layout — 8-byte signature, then
    * an IHDR chunk (length, type, 13-byte data, CRC32 over type+data —
    * computed with Spark's `crc32`, so the chunk checksums like any PNG
    * tool expects) — followed by the document text bytes standing in for
    * the compressed image stream. Width/height are derived from
    * (doc_id, n_chars) so the DuckDB oracle can predict them INDEPENDENTLY
    * while the Spark side only learns them by parsing the bytes.
    */
  def attachPngMedia(docs: DataFrame): DataFrame = {
    def be4(c: Column): Column = unhex(lpad(hex(c.cast("bigint")), 8, "0"))
    val width = col("doc_id") % 1024 + 1
    val height = col("n_chars") % 768 + 1
    val typePlusData = concat(
      lit("IHDR".getBytes("US-ASCII")),
      be4(width), be4(height),
      // bit depth 8, color type 6 (RGBA), compression 0, filter 0, interlace 0
      lit(Array[Byte](8, 6, 0, 0, 0)))
    val payload = concat(
      lit(MediaHeader.PngSignature),
      be4(lit(13)), typePlusData, be4(crc32(typePlusData)),
      col("text").cast("binary"))
    docs.select(col("doc_id"), payload.as("payload"))
  }

  /** Byte-level media-header sniffing — the genuinely-decodable slice of
    * the multimodal pipeline (full image decode still needs the stubbed
    * codec seam; header fields don't). A real parser: verifies the PNG
    * signature, chunk length/type, AND the IHDR CRC32 before trusting the
    * fields; anything that fails a check degrades explicitly instead of
    * returning garbage dimensions.
    */
  object MediaHeader {
    val PngSignature: Array[Byte] =
      Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte)

    /** format ∈ {png, png-corrupt, raw}; fields None unless a valid IHDR
      * (signature + length + type + CRC all check out) was parsed.
      */
    case class Parsed(format: String, width: Option[Int], height: Option[Int],
                      bitDepth: Option[Int], colorType: Option[Int])

    def sniff(bytes: Array[Byte]): Parsed = {
      def be4(off: Int): Long =
        ((bytes(off) & 0xffL) << 24) | ((bytes(off + 1) & 0xffL) << 16) |
          ((bytes(off + 2) & 0xffL) << 8) | (bytes(off + 3) & 0xffL)
      val sigOk = bytes.length >= 8 &&
        java.util.Arrays.equals(bytes.take(8), PngSignature)
      if (!sigOk) Parsed("raw", None, None, None, None)
      // a real PNG signature on a payload too short to hold IHDR is a
      // TRUNCATED png, not raw text — degrade explicitly, don't reclassify
      else if (bytes.length < 33) Parsed("png-corrupt", None, None, None, None)
      else {
        val chunkLen = be4(8)
        val chunkType = new String(bytes, 12, 4, "US-ASCII")
        val crc = new java.util.zip.CRC32()
        crc.update(bytes, 12, 17) // type + 13 data bytes
        if (chunkLen != 13L || chunkType != "IHDR" || crc.getValue != be4(29))
          Parsed("png-corrupt", None, None, None, None)
        else
          Parsed("png", Some(be4(16).toInt), Some(be4(20).toInt),
            Some(bytes(24) & 0xff), Some(bytes(25) & 0xff))
      }
    }
  }

  val headerSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("bit_depth", IntegerType),
    StructField("color_type", IntegerType),
    StructField("n_bytes", LongType)))

  /** WAV-framed payloads — the audio twin of [[attachPngMedia]]: a REAL
    * RIFF/WAVE byte layout (RIFF frame with its size field, 16-byte PCM
    * `fmt ` chunk with byteRate/blockAlign computed, `data` chunk — all
    * little-endian, exactly as a .wav sits on disk) with the document text
    * bytes standing in for the PCM samples. Channels and sample rate
    * derive from (doc_id, n_chars) so the DuckDB oracle predicts them
    * INDEPENDENTLY while the Spark side only learns them by parsing the
    * bytes.
    */
  def attachWavMedia(docs: DataFrame): DataFrame = {
    def byteAt(c: Column, i: Int): Column =
      lpad(hex(shiftright(c.cast("bigint"), 8 * i).bitwiseAND(lit(255L))), 2, "0")
    def le4(c: Column): Column =
      unhex(concat(byteAt(c, 0), byteAt(c, 1), byteAt(c, 2), byteAt(c, 3)))
    def le2(c: Column): Column = unhex(concat(byteAt(c, 0), byteAt(c, 1)))
    val dataLen = length(col("text").cast("binary")).cast("bigint")
    val channels = col("doc_id") % 2 + 1
    val rate = lit(8000) + (col("n_chars") % 3) * 4000
    val blockAlign = channels * 2 // 16-bit PCM
    val byteRate = rate * blockAlign
    val payload = concat(
      lit("RIFF".getBytes("US-ASCII")), le4(dataLen + 36),
      lit("WAVE".getBytes("US-ASCII")),
      lit("fmt ".getBytes("US-ASCII")), le4(lit(16)), le2(lit(1)),
      le2(channels), le4(rate), le4(byteRate), le2(blockAlign), le2(lit(16)),
      lit("data".getBytes("US-ASCII")), le4(dataLen),
      col("text").cast("binary"))
    docs.select(col("doc_id"), payload.as("payload"))
  }

  /** RIFF/WAVE header parser — the audio twin of [[MediaHeader]]. Verifies
    * the RIFF frame (riff size = file size − 8), the 16-byte PCM `fmt `
    * chunk INCLUDING the byteRate/blockAlign arithmetic consistency (the
    * WAV layout's equivalent of PNG's CRC self-check), and the data-chunk
    * length, before trusting any field; a failed check degrades to
    * `wav-corrupt` with fields withheld, non-RIFF bytes to `raw`.
    */
  object WavHeader {
    case class Parsed(format: String, channels: Option[Int],
                      sampleRate: Option[Int], bitsPerSample: Option[Int],
                      dataLen: Option[Long])

    def sniff(bytes: Array[Byte]): Parsed = {
      def ascii(off: Int): String = new String(bytes, off, 4, "US-ASCII")
      def le2(off: Int): Int =
        (bytes(off) & 0xff) | ((bytes(off + 1) & 0xff) << 8)
      def le4(off: Int): Long =
        (bytes(off) & 0xffL) | ((bytes(off + 1) & 0xffL) << 8) |
          ((bytes(off + 2) & 0xffL) << 16) | ((bytes(off + 3) & 0xffL) << 24)
      val isRiff = bytes.length >= 12 &&
        ascii(0) == "RIFF" && ascii(8) == "WAVE"
      if (!isRiff) Parsed("raw", None, None, None, None)
      // RIFF/WAVE frame on a payload too short for the canonical header:
      // truncated wav, not raw bytes (same contract as PngHeader above)
      else if (bytes.length < 44) Parsed("wav-corrupt", None, None, None, None)
      else {
        val channels = le2(22)
        val rate = le4(24)
        val bits = le2(34)
        val ok = le4(4) == bytes.length - 8L &&
          ascii(12) == "fmt " && le4(16) == 16L && le2(20) == 1 &&
          le2(32) == channels * bits / 8 &&
          le4(28) == rate * channels * bits / 8 &&
          ascii(36) == "data" && le4(40) == bytes.length - 44L
        if (!ok) Parsed("wav-corrupt", None, None, None, None)
        else Parsed("wav", Some(channels), Some(rate.toInt), Some(bits),
          Some(bytes.length - 44L))
      }
    }
  }

  val wavHeaderSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("format", StringType),
    StructField("channels", IntegerType),
    StructField("sample_rate", IntegerType),
    StructField("bits_per_sample", IntegerType),
    StructField("data_len", LongType),
    StructField("n_bytes", LongType)))

  private def wavRow(id: Long, bytes: Array[Byte]): Row = {
    val h = WavHeader.sniff(bytes)
    Row(id, h.format, h.channels.map(Int.box).orNull,
      h.sampleRate.map(Int.box).orNull, h.bitsPerSample.map(Int.box).orNull,
      h.dataLen.map(Long.box).orNull, bytes.length.toLong)
  }

  /** WAV header sniffing over the same Arrow batch seam as
    * [[parseHeadersArrow]].
    */
  def parseWavHeadersArrow(media: DataFrame): DataFrame =
    arrowHeaderParse(media, wavHeaderSchema)(wavRow)

  /** Row-path twin of [[parseWavHeadersArrow]] (parity spec pins equality). */
  def parseWavHeaders(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val rdd = media.select(col("doc_id"), col("payload")).rdd.map { row =>
      wavRow(row.getLong(0), row.getAs[Array[Byte]]("payload"))
    }
    spark.createDataFrame(rdd, wavHeaderSchema)
  }

  /** Header sniffing over the SAME Arrow-columnar batch seam as
    * [[decodeFeaturesArrow]]: payload bytes are marshalled into a
    * `VarBinaryVector` per batch and parsed there — the shape a native
    * (JNI/GPU) header reader consumes — still a narrow stage; the payload
    * bytes never shuffle, only the tiny parsed fields continue.
    */
  def parseHeadersArrow(media: DataFrame): DataFrame =
    arrowHeaderParse(media, headerSchema)(pngRow)

  /** Row-path twin of [[parseHeadersArrow]] (parity spec pins equality). */
  def parseHeaders(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val rdd = media.select(col("doc_id"), col("payload")).rdd.map { row =>
      pngRow(row.getLong(0), row.getAs[Array[Byte]]("payload"))
    }
    spark.createDataFrame(rdd, headerSchema)
  }

  private def pngRow(id: Long, bytes: Array[Byte]): Row = {
    val h = MediaHeader.sniff(bytes)
    Row(id, h.format, h.width.map(Int.box).orNull, h.height.map(Int.box).orNull,
      h.bitDepth.map(Int.box).orNull, h.colorType.map(Int.box).orNull, bytes.length.toLong)
  }

  /** Shared Arrow marshalling for header parsers: rows become one
    * (doc_id BigInt, payload VarBinary) `VectorSchemaRoot` per batch of
    * [[FakeDecoder.batchSize]], the per-row `parse` reads straight off the
    * vectors — the shape a native (JNI/GPU) header reader consumes. Still
    * a narrow stage; payload bytes never shuffle, only parsed fields
    * continue.
    */
  private def arrowHeaderParse(
      media: DataFrame, schema: StructType)(
      parse: (Long, Array[Byte]) => Row): DataFrame = {
    import org.apache.arrow.memory.RootAllocator
    import org.apache.arrow.vector.{BigIntVector, VarBinaryVector, VectorSchemaRoot}
    val spark = media.sparkSession
    val rdd = media.select(col("doc_id"), col("payload")).rdd.mapPartitions { it =>
      it.grouped(FakeDecoder.batchSize).flatMap { batch =>
        val alloc = new RootAllocator(Long.MaxValue)
        var docId: BigIntVector = null
        var payload: VarBinaryVector = null
        var root: VectorSchemaRoot = null
        try {
          docId = new BigIntVector("doc_id", alloc)
          payload = new VarBinaryVector("payload", alloc)
          docId.allocateNew(batch.size)
          payload.allocateNew()
          batch.zipWithIndex.foreach { case (row, i) =>
            docId.setSafe(i, row.getLong(0))
            payload.setSafe(i, row.getAs[Array[Byte]]("payload"))
          }
          docId.setValueCount(batch.size)
          payload.setValueCount(batch.size)
          root = VectorSchemaRoot.of(docId, payload)
          root.setRowCount(batch.size)
          (0 until root.getRowCount).map { i =>
            parse(docId.get(i), payload.get(i))
          }
        } finally {
          if (root != null) root.close()
          else { if (docId != null) docId.close(); if (payload != null) payload.close() }
          alloc.close()
        }
      }
    }
    spark.createDataFrame(rdd, schema)
  }

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

  /** The Arrow-columnar decode seam: a decoder consumes one Arrow
    * `VectorSchemaRoot` per batch — columns `doc_id` (BigInt) and `payload`
    * (VarBinary), `root.getRowCount` rows — and returns one feature array
    * per row. Arrow buffers are the interchange format GPU decode stacks
    * (DALI, torchcodec via JNI, CUDA IPC) and Python workers consume
    * zero-copy, so this interface IS the production plug point; the fake
    * below is the only stubbed part.
    */
  trait ArrowBatchDecoder extends Serializable {
    def decode(root: org.apache.arrow.vector.VectorSchemaRoot): Seq[Array[Double]]
  }

  /** STUB decoder over the Arrow contract: reads each payload from the
    * VarBinary vector and applies the same deterministic fake featurization
    * as [[FakeDecoder]] — so the Arrow path is parity-checkable against the
    * row path (OperatorSmokeSpec).
    */
  object FakeArrowDecoder extends ArrowBatchDecoder {
    override def decode(root: org.apache.arrow.vector.VectorSchemaRoot): Seq[Array[Double]] = {
      val payload = root.getVector("payload")
        .asInstanceOf[org.apache.arrow.vector.VarBinaryVector]
      FakeDecoder.decodeBatch((0 until root.getRowCount).map(payload.get))
    }
  }

  /** [[decodeFeatures]] over the Arrow-columnar batch contract: rows are
    * marshalled into Arrow `VectorSchemaRoot` batches of
    * [[FakeDecoder.batchSize]] inside `mapPartitions` (still narrow — the
    * payload bytes never shuffle), the decoder consumes the columnar batch,
    * and the feature vectors come back as rows. Output is identical to the
    * row-based path (OperatorSmokeSpec pins it); the difference is the seam:
    * a real featurizer gets contiguous Arrow buffers instead of per-row JVM
    * objects.
    */
  def decodeFeaturesArrow(
      media: DataFrame,
      decoder: ArrowBatchDecoder = FakeArrowDecoder): DataFrame = {
    import org.apache.arrow.memory.RootAllocator
    import org.apache.arrow.vector.{BigIntVector, VarBinaryVector, VectorSchemaRoot}
    val spark = media.sparkSession
    val rdd = media.select(col("doc_id"), col("payload")).rdd.mapPartitions { it =>
      it.grouped(FakeDecoder.batchSize).flatMap { batch =>
        val alloc = new RootAllocator(Long.MaxValue)
        // vectors are closed via `root` on the happy path; if anything
        // throws BEFORE the root exists they must be closed directly, or
        // alloc.close() throws "memory leaked" and masks the real error
        var docId: BigIntVector = null
        var payload: VarBinaryVector = null
        var root: VectorSchemaRoot = null
        try {
          docId = new BigIntVector("doc_id", alloc)
          payload = new VarBinaryVector("payload", alloc)
          docId.allocateNew(batch.size)
          payload.allocateNew()
          batch.zipWithIndex.foreach { case (row, i) =>
            docId.setSafe(i, row.getLong(0))
            payload.setSafe(i, row.getAs[Array[Byte]]("payload"))
          }
          docId.setValueCount(batch.size)
          payload.setValueCount(batch.size)
          root = VectorSchemaRoot.of(docId, payload)
          root.setRowCount(batch.size)
          val feats = decoder.decode(root)
          batch.indices.map { i =>
            Row(docId.get(i), feats(i).toSeq, payload.get(i).length.toLong)
          }
        } finally {
          if (root != null) root.close()
          else { if (docId != null) docId.close(); if (payload != null) payload.close() }
          alloc.close()
        }
      }
    }
    spark.createDataFrame(rdd, featureSchema)
  }

  val frameSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("frame_idx", IntegerType),
    StructField("frame_bytes", BinaryType),
    StructField("n_frames", IntegerType)))

  /** Frame sampling for video-shaped payloads: each payload yields up to
    * `maxFrames` evenly spaced "frames" (STUB slicing — a real codec would
    * seek/decode here; the Spark plumbing is the contract). Emitted as
    * exploded rows (doc_id, frame_idx, frame_bytes) — the layout downstream
    * per-frame featurizers want. Narrow stage: payloads are sliced where
    * they are read, only the (smaller) frames continue; at 100 TB the
    * full-video bytes never shuffle.
    */
  def frameSample(media: DataFrame, maxFrames: Int = 4): DataFrame = {
    val spark = media.sparkSession
    val rdd = media.select(col("doc_id"), col("payload")).rdd.mapPartitions { it =>
      it.flatMap { row =>
        val payload = row.getAs[Array[Byte]]("payload")
        val n = math.min(maxFrames, math.max(1, payload.length / 8))
        val frameLen = math.max(1, payload.length / n)
        (0 until n).map { i =>
          val from = i * frameLen
          val until = math.min(payload.length, from + frameLen)
          Row(row.getLong(0), i, java.util.Arrays.copyOfRange(payload, from, until), n)
        }
      }
    }
    spark.createDataFrame(rdd, frameSchema)
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // frame-sample plumbing, oracle-checkable slice: per-frame byte extents
    "mm_frame_sample" -> ((s, d) => {
      val media = attachFakeMedia(Tables.documents(s, d).orderBy(col("doc_id")))
      frameSample(media, maxFrames = 4)
        .select(col("doc_id"), col("frame_idx").cast("bigint").as("frame_idx"),
          length(col("frame_bytes")).cast("bigint").as("frame_len"),
          col("n_frames").cast("bigint").as("n_frames"))
        .orderBy(col("doc_id"), col("frame_idx"))
    }),
    // binary-column metadata surface: REAL byte-level header decode. The
    // payload is a PNG-framed binary ([[attachPngMedia]]); the values below
    // exist on the Spark side ONLY via [[MediaHeader.sniff]] reading the
    // signature + IHDR (incl. CRC32 verification) inside the Arrow batch
    // seam, while the oracle predicts the same fields independently from
    // (doc_id, n_chars). Narrow stage end to end: payload bytes never
    // shuffle, only the parsed fields reach the final sort.
    "mm_binary_meta" -> ((s, d) => {
      val media = attachPngMedia(Tables.documents(s, d))
      parseHeadersArrow(media)
        .select(col("doc_id"), col("format"),
          col("width").cast("bigint").as("width"),
          col("height").cast("bigint").as("height"),
          col("bit_depth").cast("bigint").as("bit_depth"),
          col("color_type").cast("bigint").as("color_type"),
          col("n_bytes"))
        .orderBy(col("doc_id"))
    }),

    // ---- the audio twin: payload is a RIFF/WAVE binary
    // ([[attachWavMedia]]); channels/sample-rate/bits/data-length exist on
    // the Spark side ONLY via [[WavHeader.sniff]] parsing the RIFF frame +
    // fmt chunk (incl. the byteRate/blockAlign consistency check) inside
    // the Arrow batch seam, while the oracle predicts the same fields
    // independently from (doc_id, n_chars). ----
    "mm_wav_meta" -> ((s, d) => {
      val media = attachWavMedia(Tables.documents(s, d))
      parseWavHeadersArrow(media)
        .select(col("doc_id"), col("format"),
          col("channels").cast("bigint").as("channels"),
          col("sample_rate").cast("bigint").as("sample_rate"),
          col("bits_per_sample").cast("bigint").as("bits_per_sample"),
          col("data_len"), col("n_bytes"))
        .orderBy(col("doc_id"))
    }))

  override def oracleSql: Map[String, String] = Map(
    "mm_frame_sample" ->
      """WITH m AS (
        |  SELECT doc_id, octet_length(CAST(text AS BLOB)) AS len FROM documents
        |), p AS (
        |  SELECT doc_id, len, least(4, greatest(1, len // 8)) AS n FROM m
        |), f AS (
        |  SELECT doc_id, len, n, greatest(1, len // n) AS fl FROM p
        |)
        |SELECT doc_id, i AS frame_idx,
        |  least(len, (i + 1) * fl) - i * fl AS frame_len,
        |  n AS n_frames
        |FROM f, UNNEST(range(0, n)) AS t(i)
        |ORDER BY doc_id, frame_idx""".stripMargin,
    // independent derivation of the header fields the Spark side PARSES
    // out of the PNG bytes: 8 (sig) + 4 (len) + 4 (type) + 13 (IHDR data)
    // + 4 (crc) = 33 header bytes before the text payload
    "mm_binary_meta" ->
      """SELECT doc_id, 'png' AS format,
        |  CAST(doc_id % 1024 + 1 AS BIGINT) AS width,
        |  CAST(n_chars % 768 + 1 AS BIGINT) AS height,
        |  CAST(8 AS BIGINT) AS bit_depth,
        |  CAST(6 AS BIGINT) AS color_type,
        |  CAST(33 + octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes
        |FROM documents ORDER BY doc_id""".stripMargin,
    // independent derivation of the fields the Spark side PARSES out of
    // the RIFF/WAVE bytes: 44-byte canonical header before the samples
    "mm_wav_meta" ->
      """SELECT doc_id, 'wav' AS format,
        |  CAST(doc_id % 2 + 1 AS BIGINT) AS channels,
        |  CAST(8000 + (n_chars % 3) * 4000 AS BIGINT) AS sample_rate,
        |  CAST(16 AS BIGINT) AS bits_per_sample,
        |  CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS data_len,
        |  CAST(44 + octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes
        |FROM documents ORDER BY doc_id""".stripMargin)
}
