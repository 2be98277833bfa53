package graft.streaming

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

/** Schema-versioned keyed-state envelope for flatMapGroupsWithState
  * (r15 ask 4).
  *
  * Spark pins the state ENCODER SCHEMA into a streaming checkpoint:
  * adding a field to a state case class makes a restarted query fail
  * its state-schema compatibility check (pinned in StreamingSpec
  * "plain state schema change breaks a checkpoint restart"), and the
  * r14/r15 policy was a documented-but-silent "resume with a NEW
  * checkpoint directory". The envelope fixes the checkpointed schema
  * FOREVER at (ver INT, payload BINARY); evolution moves into the
  * codec — a new field bumps `version`, `read` accepts every older
  * version and fills defaults. Restarting across a field addition
  * then decodes old state in place: no new checkpoint, no state loss.
  *
  * Applied to every operator whose state has actually evolved (the
  * r14/r15 additions: Scd2, Cusum, Ewma, Locf, Bollinger,
  * Page–Hinkley, Kalman) — a ONE-TIME checkpoint migration each,
  * after which field evolution is free. States stable since birth
  * (SessionState, SeenState, BucketState, BloomState, …) keep their
  * plain encoding until their first change, at which point they adopt
  * the envelope the same way; the codecs below keep `version = 2`
  * with v1 = the pre-addition field set, so a codec written for the
  * old shape is the worked example of the migration path.
  */
final case class VersionedState(ver: Int, payload: Array[Byte])

trait StateCodec[S] extends Serializable {
  /** Current write version (monotone; bump on every field change). */
  def version: Int

  /** Encode at the CURRENT version. */
  def write(s: S, out: DataOutputStream): Unit

  /** Decode any version ≤ [[version]], filling defaults for fields
    * the old version lacked. Old versions must be byte-prefixes of
    * newer ones (append-only field order) so this stays a linear
    * read.
    */
  def read(ver: Int, in: DataInputStream): S

  final def encode(s: S): VersionedState = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    write(s, out)
    out.flush()
    VersionedState(version, bos.toByteArray)
  }

  final def decode(v: VersionedState): S = {
    require(v.ver <= version,
      s"state written by a NEWER codec (v${v.ver} > v$version) — " +
        "upgrade the job before restarting from this checkpoint")
    read(v.ver, new DataInputStream(new ByteArrayInputStream(v.payload)))
  }
}

/** Codecs for the evolved state classes. v1 is in every case the
  * pre-addition field set (what a checkpoint written before the
  * late-data-policy fields would have carried), so the `ver >= 2`
  * branches are exactly the migration the old policy forbade.
  */
object StateCodecs {
  import StreamOps._

  object Scd2Codec extends StateCodec[Scd2State] {
    val version = 2 // v2: + frontier (r14)
    def write(s: Scd2State, out: DataOutputStream): Unit = {
      out.writeLong(s.eventId); out.writeUTF(s.eventType)
      out.writeLong(s.since); out.writeLong(s.frontier)
    }
    def read(ver: Int, in: DataInputStream): Scd2State = {
      val id = in.readLong(); val et = in.readUTF(); val since = in.readLong()
      val frontier = if (ver >= 2) in.readLong() else Long.MinValue
      Scd2State(id, et, since, frontier)
    }
  }

  object CusumCodec extends StateCodec[CusumState] {
    val version = 2 // v2: + lastDay (r14)
    def write(s: CusumState, out: DataOutputStream): Unit = {
      out.writeDouble(s.cusum); out.writeDouble(s.maxAbs)
      out.writeLong(s.argDay); out.writeLong(s.lastDay)
    }
    def read(ver: Int, in: DataInputStream): CusumState = {
      val c = in.readDouble(); val m = in.readDouble(); val a = in.readLong()
      val last = if (ver >= 2) in.readLong() else Long.MinValue
      CusumState(c, m, a, last)
    }
  }

  object EwmaCodec extends StateCodec[EwmaRing] {
    val version = 2 // v2: + frontier (r15)
    def write(s: EwmaRing, out: DataOutputStream): Unit = {
      out.writeInt(s.vals.length)
      s.vals.foreach(out.writeDouble)
      s.mask.foreach(out.writeBoolean)
      out.writeLong(s.frontier)
    }
    def read(ver: Int, in: DataInputStream): EwmaRing = {
      val n = in.readInt()
      val vals = Array.fill(n)(in.readDouble())
      val mask = Array.fill(n)(in.readBoolean())
      val frontier = if (ver >= 2) in.readLong() else Long.MinValue
      EwmaRing(vals, mask, frontier)
    }
  }

  object LocfCodec extends StateCodec[LocfState] {
    val version = 2 // v2: + frontier (r15)
    def write(s: LocfState, out: DataOutputStream): Unit = {
      out.writeDouble(s.last); out.writeBoolean(s.hasLast)
      out.writeLong(s.frontier)
    }
    def read(ver: Int, in: DataInputStream): LocfState = {
      val last = in.readDouble(); val has = in.readBoolean()
      val frontier = if (ver >= 2) in.readLong() else Long.MinValue
      LocfState(last, has, frontier)
    }
  }

  object BollCodec extends StateCodec[BollState] {
    val version = 2 // v2: + lastDay (r15)
    def write(s: BollState, out: DataOutputStream): Unit = {
      out.writeInt(s.ring.size)
      s.ring.foreach(out.writeLong)
      out.writeLong(s.lastDay)
    }
    def read(ver: Int, in: DataInputStream): BollState = {
      val n = in.readInt()
      val ring = Seq.fill(n)(in.readLong())
      val lastDay = if (ver >= 2) in.readLong() else Long.MinValue
      BollState(ring, lastDay)
    }
  }

  object PhCodec extends StateCodec[PhState] {
    val version = 2 // v2: + lastDay (r15)
    def write(s: PhState, out: DataOutputStream): Unit = {
      out.writeLong(s.cum); out.writeLong(s.mn); out.writeLong(s.lastDay)
    }
    def read(ver: Int, in: DataInputStream): PhState = {
      val cum = in.readLong(); val mn = in.readLong()
      val lastDay = if (ver >= 2) in.readLong() else Long.MinValue
      PhState(cum, mn, lastDay)
    }
  }

  object KalmanCodec extends StateCodec[KalmanState] {
    val version = 2 // v2: + lastT (r15)
    def write(s: KalmanState, out: DataOutputStream): Unit = {
      out.writeDouble(s.level); out.writeDouble(s.p)
      out.writeBoolean(s.started); out.writeLong(s.lastT)
    }
    def read(ver: Int, in: DataInputStream): KalmanState = {
      val level = in.readDouble(); val p = in.readDouble()
      val started = in.readBoolean()
      val lastT = if (ver >= 2) in.readLong() else Long.MinValue
      KalmanState(level, p, started, lastT)
    }
  }
}
