package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Contracts behind `src_avro_roundtrip`'s format claims: the
  * containers the gate reads really are MULTI-BLOCK (sync-marker
  * framed — avro's splittability unit), the per-file codec is
  * negotiated from each file's own header, and the null union
  * branch survives the round trip. */
class AvroSpec extends AnyFunSuite {
  import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
  import org.apache.avro.file.{CodecFactory, DataFileStream, DataFileWriter}

  private val schema = new org.apache.avro.Schema.Parser().parse(
    """{"type":"record","name":"T","fields":[
      |{"name":"k","type":"long"},
      |{"name":"s","type":["null","string"]}]}""".stripMargin)

  private def container(n: Int, codec: CodecFactory): Array[Byte] = {
    val bo = new java.io.ByteArrayOutputStream()
    val w = new DataFileWriter(new GenericDatumWriter[GenericRecord](schema))
    w.setSyncInterval(256) // force many blocks
    w.setCodec(codec)
    w.create(schema, bo)
    (0 until n).foreach { i =>
      val r = new GenericData.Record(schema)
      r.put("k", i.toLong)
      r.put("s", if (i % 9 == 4) null else s"v$i" * 8)
      w.append(r)
    }
    w.close()
    bo.toByteArray
  }

  private def readAll(bytes: Array[Byte]): Seq[(Long, Option[String])] = {
    val rd = new DataFileStream(new java.io.ByteArrayInputStream(bytes),
      new GenericDatumReader[GenericRecord]())
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Option[String])]
    while (rd.hasNext) {
      val r = rd.next()
      out += ((r.get("k").asInstanceOf[Long],
        Option(r.get("s")).map(_.toString)))
    }
    rd.close()
    out.toSeq
  }

  test("containers are multi-block: the sync marker repeats per block") {
    val bytes = container(500, CodecFactory.nullCodec())
    // every block ENDS with the file's 16-byte sync marker, so the
    // final 16 bytes are the marker itself — count its occurrences
    val sync = bytes.takeRight(16)
    var hits = 0
    var i = 0
    while (i <= bytes.length - 16) {
      if (java.util.Arrays.equals(
          java.util.Arrays.copyOfRange(bytes, i, i + 16), sync)) hits += 1
      i += 1
    }
    assert(hits >= 5,
      s"500 rows at syncInterval=256 must frame many blocks, saw $hits markers")
  }

  test("per-file codec negotiation: deflate and null read identically") {
    val plain = container(200, CodecFactory.nullCodec())
    val packed = container(200, CodecFactory.deflateCodec(6))
    assert(packed.length < plain.length, "deflate must actually compress")
    assert(readAll(packed) == readAll(plain))
  }

  test("the null union branch survives the round trip exactly") {
    val rows = readAll(container(100, CodecFactory.deflateCodec(6)))
    assert(rows.size == 100)
    assert(rows.count(_._2.isEmpty) == rows.indices.count(_ % 9 == 4))
    assert(rows.forall { case (k, s) => s.forall(_ == s"v$k" * 8) })
  }
}
