package graft.multimodal

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Hashes.fnv64

/** Multimodal column plumbing (SURVEY.md §2.F): media as opaque
  * `binary` payloads with typed metadata, processed by batched
  * per-partition codecs.
  *
  * Decode status: WAV/BMP headers parse from real bytes
  * ([[WavCodec]]/[[BmpCodec]]), MP4 container metadata walks real
  * ISO-BMFF boxes ([[Mp4Codec]] — ftyp/mvhd/tkhd), and images decode
  * fully through JDK `javax.imageio` ([[ImageCodec]] — PNG/BMP/JPEG/
  * GIF need no external libraries). [[FakeCodec]] remains the
  * deterministic stand-in only for FRAME/SAMPLE decode of codecs
  * with no in-JDK decoder (H.264 pixels, compressed audio):
  * content-hash-seeded pseudo-features behind the same trait, so the
  * schema, the partition-preserving batched `mapPartitions` shape
  * (the Scala analogue of Arrow-batched `mapInPandas`), the
  * format-sniffing, and the downstream joins are real and tested
  * either way.
  */
final case class MediaMeta(
    kind: String,       // image | audio | video | bin
    width: Int,         // image/video pixels, 0 otherwise
    height: Int,
    sampleRateHz: Int,  // audio, 0 otherwise
    durationMs: Long)   // audio/video, 0 otherwise

final case class MediaRecord(
    media_id: Long,
    source: String,
    payload: Array[Byte],
    meta: MediaMeta)

final case class MediaFeatures(
    media_id: Long,
    kind: String,
    dim: Int,
    features: Array[Float])

trait MediaCodec extends Serializable {
  /** Identify the container format from magic bytes. */
  def sniff(payload: Array[Byte]): String
  /** Decode + feature-extract one payload. Real implementations batch
    * internally (the pipeline hands them whole partitions). */
  def decode(payload: Array[Byte], meta: MediaMeta): Array[Float]
}

/** Deterministic stand-in codec: sniffs real magic bytes, "features"
  * are seeded by the FNV hash of the payload — stable across runs,
  * executors, and partitionings. */
object FakeCodec extends MediaCodec {
  val Dim = 8

  override def sniff(payload: Array[Byte]): String = {
    def at(i: Int): Int = if (i < payload.length) payload(i) & 0xff else -1
    if (at(0) == 0xff && at(1) == 0xd8) "image" // JPEG
    else if (at(0) == 0x89 && at(1) == 'P' && at(2) == 'N' && at(3) == 'G') "image"
    else if (at(0) == 'R' && at(1) == 'I' && at(2) == 'F' && at(3) == 'F') "audio" // WAV
    else if (at(4) == 'f' && at(5) == 't' && at(6) == 'y' && at(7) == 'p') "video" // MP4
    else "bin"
  }

  override def decode(payload: Array[Byte], meta: MediaMeta): Array[Float] = {
    val h = fnv64(new String(payload, java.nio.charset.StandardCharsets.ISO_8859_1))
    val rng = new scala.util.Random(h)
    Array.fill(Dim)(rng.nextFloat())
  }
}

object MediaPipeline {

  /** Stand-in corpus: documents' text bytes as payloads (the real
    * pipeline would read binary files or a payload column). */
  /** Deterministic magic-byte fixtures, keyed on doc_id residue — the
    * same injected-on-both-engines discipline as text_pii_scan's PII
    * fixtures: the synthetic corpus is all text, so without these the
    * sniff lands on 'bin' for every record and the kind dimension of
    * every downstream assertion is vacuous. The DuckDB oracle
    * prepends the identical prefixes (as chr() literals), so the
    * fnv-seeded features match byte for byte. */
  def magicPrefix(id: Long): Array[Byte] = (id % 7L) match {
    case 0L => Array(0xff, 0xd8, 0xff).map(_.toByte) // JPEG SOI
    case 1L => Array[Byte](0x89.toByte, 'P', 'N', 'G')
    case 2L => "RIFF".getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    case 3L => "mp4_ftyp".getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    case _  => Array.empty[Byte]
  }

  def fromDocuments(spark: SparkSession, sfDir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    graft.Tables.documents(spark, sfDir)
      .select($"doc_id", $"source", $"text".cast("binary").as("payload"))
      .as[(Long, String, Array[Byte])]
      .map { case (id, src, body) =>
        val payload = magicPrefix(id) ++ body
        MediaRecord(id, src,
          payload, MediaMeta(FakeCodec.sniff(payload), 0, 0, 0, 0L))
      }
  }

  /** Batched featurization: partition-preserving (no shuffle), codec
    * sees `batchSize` records at a time — the seam where a real
    * vectorized decoder (or GPU batch) plugs in. */
  def featurize(
      ds: Dataset[MediaRecord],
      codec: MediaCodec,
      batchSize: Int = 64): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.map { r =>
          val f = codec.decode(r.payload, r.meta)
          MediaFeatures(r.media_id, r.meta.kind, f.length, f)
        }
      }
    }
  }
}
