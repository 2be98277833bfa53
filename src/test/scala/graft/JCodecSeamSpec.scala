package graft

import graft.multimodal.{JCodecSeam, Multimodal}

/** Pins the compiled H.264 deployment seam (r15 ask 6): with JCodec
  * absent from this zero-egress classpath the seam must report
  * unavailable, decode nothing, and fall back to the deterministic
  * stub through the SAME decodeMeta path every shipped codec uses —
  * so the documented deployment snippet is code the build compiles
  * and exercises, not prose that can rot.
  */
class JCodecSeamSpec extends SparkSpec {

  test("seam reports JCodec absent on this classpath") {
    assert(!JCodecSeam.available,
      "JCodec unexpectedly present — extend this spec to pin the live-decode path")
  }

  test("decode returns None (never throws) on arbitrary payloads") {
    assert(JCodecSeam.decode(Array.emptyByteArray).isEmpty)
    assert(JCodecSeam.decode("not a video".getBytes("UTF-8")).isEmpty)
    assert(JCodecSeam.decode(Array.fill(4096)(0x7f.toByte)).isEmpty)
  }

  test("codec plugs into decodeMeta with stub fallback (quarantine, not crash)") {
    val docs = Tables.documents(spark, sfDir).limit(30)
    val media = Multimodal.asMediaTable(docs)
    val viaSeam = Multimodal.decodeMeta(media, JCodecSeam.codec).collect()
    val viaStub = Multimodal.decodeMeta(media).collect()
    assert(viaSeam.nonEmpty)
    // with the jar absent the seam degrades EXACTLY to the stub
    assert(viaSeam.sortBy(_.doc_id).toSeq == viaStub.sortBy(_.doc_id).toSeq)
  }
}
