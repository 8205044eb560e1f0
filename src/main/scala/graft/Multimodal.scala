package graft

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column support: image/audio/video payloads as opaque `binary`
  * columns with typed metadata, plus decode / feature-extract / frame-sample
  * operators.
  *
  * The Spark-side plumbing is real — schema, typed `Dataset` API,
  * partition-parallel `mapPartitions` execution (the Scala analogue of a
  * PySpark `mapInPandas`/`mapInArrow` batch UDF: one iterator per
  * partition, records streamed, nothing collected to the driver) — while
  * the codec itself is a clearly-marked deterministic STUB (this container
  * ships no image/audio libraries). The stub derives pseudo-metadata from
  * the md5 of the payload bytes, which keeps the whole path verifiable
  * against a SQL oracle.
  *
  * Scale notes: decode is embarrassingly parallel (no shuffle); at 100 TB
  * you'd `repartition` to the cluster's core count before the decode to
  * balance skewed media sizes, and the decoded-metadata projection is tiny
  * compared to the payload, so column pruning after this operator drops
  * the binary bytes from downstream exchanges.
  */
object Multimodal {

  /** A media row: payload bytes + container-level metadata. */
  final case class MediaRecord(doc_id: Long, format: String, media: Array[Byte])

  /** Decoded (stub) per-media features. */
  final case class DecodedMedia(
      doc_id: Long, format: String, width: Int, height: Int,
      n_frames: Int, n_bytes: Long, sig: String)

  /** Synthesize a media table from `documents`: payload = UTF-8 bytes of
    * `text` as an opaque blob, format assigned round-robin. (Stands in for
    * a real binary column; everything downstream treats it as opaque.) */
  def mediaTable(spark: SparkSession, dir: String): DataFrame =
    Queries.T(spark, dir, "documents")
      .select(
        col("doc_id"),
        when(col("doc_id") % 3 === 0, "image")
          .when(col("doc_id") % 3 === 1, "audio")
          .otherwise("video").as("format"),
        col("text").cast("binary").as("media"))

  private def md5Hex(b: Array[Byte]): String =
    MessageDigest.getInstance("MD5").digest(b).map("%02x".format(_)).mkString

  private def hexLong(h: String): Long = java.lang.Long.parseLong(h, 16)

  /** STUB decode — stands in for an image/audio/video codec call.
    * Deterministic pseudo-decode: dimensions and frame count derive from
    * the payload md5, so the operator's distributed plumbing (partition
    * iterators, typed encoders, batch shape) is fully exercised and
    * oracle-checkable. A real deployment swaps ONLY the body of `decodeOne`
    * for the codec (e.g. javax.imageio / ffmpeg bindings).
    */
  def decodeStub(records: Dataset[MediaRecord]): Dataset[DecodedMedia] = {
    import records.sparkSession.implicits._
    records.mapPartitions { it =>
      // per-partition setup would open the codec once here
      it.map(decodeOne)
    }
  }

  private def decodeOne(r: MediaRecord): DecodedMedia = {
    // Deterministic stand-in for the codec call (image/audio libs are not
    // in this container): dimensions/frames derive from the payload md5 so
    // results are stable and oracle-checkable. A production deploy swaps
    // ONLY this function for a real decoder; the Spark-side plumbing
    // (schema, partitioning, batch shape) is the tested surface.
    val h = md5Hex(r.media)
    DecodedMedia(
      doc_id = r.doc_id,
      format = r.format,
      width = (32 + hexLong(h.substring(0, 8)) % 224).toInt,
      height = (32 + hexLong(h.substring(8, 16)) % 224).toInt,
      n_frames = if (r.format == "video") (1 + hexLong(h.substring(16, 24)) % 16).toInt else 1,
      n_bytes = r.media.length.toLong,
      sig = h.substring(0, 12))
  }

  /** Frame sampling (every `step`-th frame of each video) — the typed
    * flatMap shape a real frame extractor uses; emits (doc_id, frame_idx).
    */
  def sampleFrames(decoded: Dataset[DecodedMedia], step: Int): DataFrame = {
    import decoded.sparkSession.implicits._
    decoded.filter(_.format == "video")
      .flatMap(d => Range(0, d.n_frames, step).map(i => (d.doc_id, i.toLong)))
      .toDF("doc_id", "frame_idx")
  }

  // --- contract queries -----------------------------------------------------

  import Queries.{Entry, e}

  /** Oracle mirrors the stub's md5 arithmetic over `text` (the payload is
    * exactly the UTF-8 bytes of `text`, and the corpus is ASCII, so
    * md5(text) == md5(payload) and octet_length == length). */
  private val decodeQ = e("q54_multimodal_decode",
    """SELECT doc_id,
      |  CASE WHEN doc_id % 3 = 0 THEN 'image' WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS format,
      |  CAST(32 + ('0x' || substr(md5(text), 1, 8))::BIGINT % 224 AS INT) AS width,
      |  CAST(32 + ('0x' || substr(md5(text), 9, 8))::BIGINT % 224 AS INT) AS height,
      |  CAST(CASE WHEN doc_id % 3 = 2 THEN 1 + ('0x' || substr(md5(text), 17, 8))::BIGINT % 16 ELSE 1 END AS INT) AS n_frames,
      |  CAST(octet_length(text::BLOB) AS BIGINT) AS n_bytes,
      |  substr(md5(text), 1, 12) AS sig
      |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
    import s.implicits._
    decodeStub(mediaTable(s, dir).as[MediaRecord]).toDF().orderBy("doc_id")
  }

  private val framesQ = e("q55_multimodal_frames",
    """SELECT doc_id, unnest(range(0, n_frames, 2)) AS frame_idx FROM (
      |  SELECT doc_id,
      |    1 + ('0x' || substr(md5(text), 17, 8))::BIGINT % 16 AS n_frames
      |  FROM documents WHERE doc_id % 3 = 2) v
      |ORDER BY doc_id, frame_idx""".stripMargin) { (s, dir) =>
    import s.implicits._
    sampleFrames(decodeStub(mediaTable(s, dir).as[MediaRecord]), step = 2)
      .orderBy("doc_id", "frame_idx")
  }

  val all: Seq[Entry] = Seq(decodeQ, framesQ)
}
