package graft.multimodal

import java.nio.ByteBuffer
import scala.util.control.NonFatal

/** The H.264/VP9 deployment seam from the §5 decision record,
  * COMPILED (r15 ask 6: the documented ~30-line snippet previously
  * lived only in SURVEY prose, where it could rot).
  *
  * This build environment is zero-egress and resolves no new
  * dependencies, so JCodec (pure-JVM, BSD) cannot be on the test
  * classpath — the seam therefore binds REFLECTIVELY: when
  * `org.jcodec.api.FrameGrab` is loadable it grabs the first frame
  * and the track metadata; otherwise (or on any decode failure) it
  * returns None and [[codec]] falls back to the deterministic stub —
  * the same quarantine-not-crash discipline as the shipped
  * imageIo/audioSys/videoAvi codecs. A deployment drops the JCodec
  * jar on the classpath and this exact code path lights up; nothing
  * else in the pipeline (schema, mapPartitions batch shape,
  * shot-boundary math) changes.
  *
  * JCodecSeamSpec pins the absent-jar behavior: `available` is false
  * here, decode returns None on arbitrary bytes, and the codec
  * plugged into [[Multimodal.decodeMeta]] still decodes a mixed
  * table via the stub fallback.
  */
object JCodecSeam {

  /** True iff JCodec is on the classpath. */
  lazy val available: Boolean =
    try { Class.forName("org.jcodec.api.FrameGrab"); true }
    // Throwable-but-VM-fatal: a PARTIAL or ABI-broken jar surfaces as
    // NoClassDefFoundError / ExceptionInInitializerError /
    // UnsatisfiedLinkError, none of which ClassNotFoundException (or
    // NonFatal) covers — the quarantine-not-crash contract applies to
    // a bad jar as much as to a bad payload (r16 ADVICE)
    catch { case _: Exception | _: LinkageError => false }

  /** (width, height, totalFrames) of an H.264/MP4 payload via JCodec,
    * or None when the jar is absent or the payload undecodable.
    */
  def decode(bytes: Array[Byte]): Option[(Long, Long, Long)] =
    if (!available) None
    else try {
      // val chan = ByteBufferSeekableByteChannel.readFromByteBuffer(buf)
      val chanCls = Class.forName("org.jcodec.common.io.ByteBufferSeekableByteChannel")
      val chan = chanCls
        .getMethod("readFromByteBuffer", classOf[ByteBuffer])
        .invoke(null, ByteBuffer.wrap(bytes))
      // val grab = FrameGrab.createFrameGrab(chan)
      val grabCls = Class.forName("org.jcodec.api.FrameGrab")
      val grab = grabCls
        .getMethod("createFrameGrab", Class.forName("org.jcodec.common.io.SeekableByteChannel"))
        .invoke(null, chan)
      // val meta = grab.getVideoTrack.getMeta  (frame count)
      val track = grabCls.getMethod("getVideoTrack").invoke(grab)
      val meta = track.getClass.getMethod("getMeta").invoke(track)
      val nFrames = meta.getClass.getMethod("getTotalFrames")
        .invoke(meta).asInstanceOf[java.lang.Integer].longValue()
      // val pic = grab.getNativeFrame  (dimensions off frame 0)
      val pic = grabCls.getMethod("getNativeFrame").invoke(grab)
      val w = pic.getClass.getMethod("getWidth").invoke(pic)
        .asInstanceOf[java.lang.Integer].longValue()
      val h = pic.getClass.getMethod("getHeight").invoke(pic)
        .asInstanceOf[java.lang.Integer].longValue()
      Some((w, h, math.max(nFrames, 1L)))
    } catch {
      // LinkageError escapes NonFatal, but a partial jar can throw it
      // from any lazily-loaded class on the reflective path above —
      // quarantine (None -> deterministic stub), don't crash the task
      case NonFatal(_) | (_: LinkageError) => None
    }

  /** The pluggable-codec seam value for [[Multimodal.decodeMeta]]:
    * JCodec when present, the deterministic stub otherwise — a mixed
    * or codec-less table still decodes, never crashes.
    */
  def codec(r: Multimodal.MediaRecord): Multimodal.MediaMeta =
    decode(r.media) match {
      case Some((w, h, n)) =>
        Multimodal.MediaMeta(r.doc_id, r.kind, r.media.length.toLong, w, h, n)
      case None => Multimodal.decodeOne(r)
    }
}
