package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.store.VectorStore
import graft.store.VectorStore.pointsSql
import graft.QDsl._

/** Multimodal (image/audio/video) column analytics — SparkEntry query family (regrouped from the round-named
  * inventory files in round 15; same query names, same bodies —
  * SparkEntry assembles the full map and the driver contract). */
private[graft] object QMultimodal {

  val mmQ: Seq[(String, Q)] = Seq(
    // perceptual-hash (aHash) image near-dup: 64 deterministic
    // md5-stub "pixels" per image (decode stubbed, the mm_binary_meta
    // convention — the Spark plumbing of grid → mean-threshold bits →
    // pairwise Hamming is real), nearest neighbor per image by
    // Hamming distance over the bounded doc_id<120 image subset.
    // At corpus scale the pair join becomes dedup_simhash's banded
    // equi-join on hash bands; the exact quadratic form here is the
    // oracle-able ground truth for that path.
    "mm_image_ahash" -> Q(
      (s, d) => {
        import graft.functions.VectorFunctions.md5Long
        val px = Tables.documents(s, d)
          .filter(col("doc_id") % 3 === 0 && col("doc_id") < 120 &&
                  col("text").isNotNull)
          .select(col("doc_id"), col("text"),
                  explode(sequence(lit(0L), lit(63L))).as("k"))
          .select(col("doc_id"), col("k"),
            (md5Long(concat(col("text"), lit(":px"), col("k").cast("string")))
              % 256).as("px"))
          .localCheckpoint(eager = false) // mean join + pair join
        val mu = px.groupBy("doc_id").agg(avg(col("px").cast("double")).as("mu"))
        val bits = px.join(mu, "doc_id")
          .select(col("doc_id"), col("k"),
                  (col("px") > col("mu")).cast("long").as("bit"))
          .localCheckpoint(eager = false) // both sides of the pair join
        val ham = bits.select(col("doc_id").as("da"), col("k"), col("bit").as("ba"))
          .join(bits.select(col("doc_id").as("db"), col("k"), col("bit").as("bb")),
                Seq("k"))
          .filter(col("da") =!= col("db"))
          .groupBy("da", "db")
          .agg(sum(abs(col("ba") - col("bb"))).as("hamming"))
        val wnn = Window.partitionBy("da").orderBy(col("hamming"), col("db"))
        ham.withColumn("rk", row_number().over(wnn)).filter(col("rk") === 1)
          .select(col("da").as("doc_id"), col("db").as("nn_doc"),
                  col("hamming").as("nn_hamming"))
          .orderBy("doc_id")
      },
      Some("""WITH imgs AS (SELECT doc_id, text FROM documents
             |              WHERE doc_id % 3 = 0 AND doc_id < 120 AND text IS NOT NULL),
             |px AS (SELECT doc_id, CAST(k AS BIGINT) AS k,
             |              ('0x' || substr(md5(text || ':px' || CAST(k AS VARCHAR)), 1, 15))::BIGINT
             |                % 256 AS px
             |       FROM imgs, LATERAL (SELECT unnest(generate_series(0, 63)) AS k)),
             |mu AS (SELECT doc_id, avg(CAST(px AS DOUBLE)) AS mu FROM px GROUP BY 1),
             |bits AS (SELECT doc_id, k, CAST(px > mu AS BIGINT) AS bit
             |         FROM px JOIN mu USING (doc_id)),
             |ham AS (SELECT a.doc_id AS da, b.doc_id AS db,
             |               CAST(sum(abs(a.bit - b.bit)) AS BIGINT) AS hamming
             |        FROM bits a JOIN bits b ON a.k = b.k AND a.doc_id <> b.doc_id
             |        GROUP BY 1, 2),
             |rk AS (SELECT *, row_number() OVER (PARTITION BY da
             |                   ORDER BY hamming, db) AS rk
             |       FROM ham)
             |SELECT da AS doc_id, db AS nn_doc, hamming AS nn_hamming
             |FROM rk WHERE rk = 1 ORDER BY doc_id""".stripMargin)),

    // voice-activity segments over the audio window fan-out
    // (mm_audio_windows' grid): per-window energy is the decode stub
    // (deterministic md5 — the real part is the segmentation
    // plumbing), speech windows merged into maximal runs by
    // gaps-and-islands (win_idx − row_number), segment extents
    // clipped to n_samples. Per-audio fan-out ≤ 25 windows; the
    // merge window is per-doc, never corpus-wide.
    "mm_audio_vad" -> Q(
      (s, d) => {
        import graft.functions.VectorFunctions.md5Long
        val wins = Tables.documents(s, d)
          .filter(col("doc_id") % 3 === 1) // kind = audio
          .select(col("doc_id"), md5Long(col("text")).as("hm"))
          .selectExpr("doc_id",
            "element_at(array(8000L, 16000L, 44100L), CAST(hm % 3 AS INT) + 1) AS sr",
            "hm % 2000000 + 1 AS n_samples")
          .selectExpr("doc_id", "n_samples", "sr * 10 AS win",
            "(n_samples + sr * 10 - 1) DIV (sr * 10) AS n_win")
          .select(col("doc_id"), col("n_samples"), col("win"),
            explode(sequence(lit(0L), col("n_win") - 1)).as("win_idx"))
          .withColumn("energy",
            md5Long(concat(col("doc_id").cast("string"), lit(":vad:"),
              col("win_idx").cast("string"))) % 100)
          .filter(col("energy") >= 40)
        val wseg = Window.partitionBy("doc_id").orderBy("win_idx")
        wins.withColumn("seg", col("win_idx") - row_number().over(wseg))
          .groupBy("doc_id", "seg")
          .agg(min("win_idx").as("start_win"), max("win_idx").as("end_win"),
               count(lit(1)).as("n_windows"),
               (min("win_idx") * max("win")).as("start_sample"),
               least((max("win_idx") + 1) * max("win"), max("n_samples"))
                 .as("end_sample"))
          .select(col("doc_id"), col("start_win"), col("end_win"),
                  col("n_windows"), col("start_sample"), col("end_sample"))
          .orderBy("doc_id", "start_win")
      },
      Some("""WITH wins AS (
             |  SELECT doc_id, n_samples, win,
             |         CAST(unnest(generate_series(0, n_win - 1)) AS BIGINT) AS win_idx
             |  FROM (
             |    SELECT doc_id, n_samples, sr * 10 AS win,
             |           (n_samples + sr * 10 - 1) // (sr * 10) AS n_win
             |    FROM (
             |      SELECT doc_id, CAST(([8000, 16000, 44100])[CAST(hm % 3 AS INTEGER) + 1] AS BIGINT) AS sr,
             |             hm % 2000000 + 1 AS n_samples
             |      FROM (SELECT doc_id, ('0x' || substr(md5(text), 1, 15))::BIGINT AS hm
             |            FROM documents WHERE doc_id % 3 = 1)))),
             |sp AS (SELECT doc_id, n_samples, win, win_idx
             |       FROM (SELECT *,
             |               ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':vad:' ||
             |                 CAST(win_idx AS VARCHAR)), 1, 15))::BIGINT % 100 AS energy
             |             FROM wins)
             |       WHERE energy >= 40),
             |seg AS (SELECT *, win_idx - row_number() OVER (PARTITION BY doc_id
             |                    ORDER BY win_idx) AS seg
             |        FROM sp)
             |SELECT doc_id, min(win_idx) AS start_win, max(win_idx) AS end_win,
             |       CAST(count(*) AS BIGINT) AS n_windows,
             |       min(win_idx) * max(win) AS start_sample,
             |       least((max(win_idx) + 1) * max(win), max(n_samples)) AS end_sample
             |FROM seg GROUP BY doc_id, seg
             |ORDER BY doc_id, start_win""".stripMargin)),

    // video keyframe selection: one keyframe per detected shot (frame
    // 0 + every mm_shot_bounds cut) — the frame set a vision encoder
    // would actually ingest, with the compression it buys. Same
    // decode-stub feature stream; per-video fan-out bounded at 240
    // frames; the keyframe pick is the same per-video lag window.
    "mm_video_keyframes" -> Q(
      (s, d) => {
        import graft.functions.VectorFunctions.md5Long
        val frames = Tables.documents(s, d)
          .filter(col("doc_id") % 3 === 2) // kind = video
          .select(col("doc_id"),
            (md5Long(col("text")) % 240 + 1).as("n_frames"))
          .select(col("doc_id"), col("n_frames"),
            explode(sequence(lit(0L), col("n_frames") - 1)).as("f"))
          .withColumn("feat",
            md5Long(concat(col("doc_id").cast("string"), lit("#"),
              col("f").cast("string"))) % 1000)
        val w = Window.partitionBy("doc_id").orderBy("f")
        frames.withColumn("pf", lag(col("feat"), 1).over(w))
          .withColumn("kf",
            when(col("pf").isNull || abs(col("feat") - col("pf")) > 600, 1L)
              .otherwise(0L))
          .groupBy("doc_id", "n_frames")
          .agg(sum("kf").as("n_keyframes"),
               max(when(col("kf") === 1, col("f"))).as("last_keyframe"))
          // both ratios are integer/integer — round via the exact
          // half-up idiom ⌊(2·p·scale + q)/(2q)⌋/scale instead of
          // round(float quotient): the sf1 flush caught 179/40 =
          // 4.475 landing EXACTLY on a 2dp .5 boundary, where
          // Spark's shortest-string round and DuckDB's binary-value
          // round disagree
          .select(col("doc_id"), col("n_frames"), col("n_keyframes"),
            col("last_keyframe"),
            (expr("CAST((n_keyframes * 20000 + n_frames) " +
              "DIV (n_frames * 2) AS DOUBLE)") / 10000.0).as("keep_ratio"),
            (expr("CAST((n_frames * 200 + n_keyframes) " +
              "DIV (n_keyframes * 2) AS DOUBLE)") / 100.0).as("mean_shot_len"))
          .orderBy("doc_id")
      },
      Some("""WITH fr AS (
             |  SELECT doc_id, n_frames,
             |         CAST(unnest(generate_series(0, n_frames - 1)) AS BIGINT) AS f
             |  FROM (SELECT doc_id,
             |               ('0x' || substr(md5(text), 1, 15))::BIGINT % 240 + 1 AS n_frames
             |        FROM documents WHERE doc_id % 3 = 2)),
             |ft AS (SELECT doc_id, n_frames, f,
             |         ('0x' || substr(md5(doc_id::VARCHAR || '#' || f::VARCHAR), 1, 15))::BIGINT
             |           % 1000 AS feat
             |       FROM fr),
             |lg AS (SELECT doc_id, n_frames, f, feat,
             |         lag(feat) OVER (PARTITION BY doc_id ORDER BY f) AS pf FROM ft),
             |kf AS (SELECT doc_id, n_frames, f,
             |         CASE WHEN pf IS NULL OR abs(feat - pf) > 600 THEN 1 ELSE 0 END AS kf
             |       FROM lg)
             |SELECT doc_id, n_frames, CAST(sum(kf) AS BIGINT) AS n_keyframes,
             |       CAST(max(CASE WHEN kf = 1 THEN f END) AS BIGINT) AS last_keyframe,
             |       CAST((sum(kf) * 20000 + n_frames) // (n_frames * 2) AS DOUBLE)
             |         / 10000.0 AS keep_ratio,
             |       CAST((n_frames * 200 + sum(kf)) // (sum(kf) * 2) AS DOUBLE)
             |         / 100.0 AS mean_shot_len
             |FROM kf GROUP BY doc_id, n_frames ORDER BY doc_id""".stripMargin)),

    // multimodal data card: per modality (the engine's doc_id mod 3
    // convention — text/audio/video), asset counts and total content
    // units from the SAME deterministic stub metadata every mm_*
    // operator derives (frames for video, samples+seconds for audio,
    // chars for text) — ONE conditional map-side pass.
    "mm_modality_card" -> Q(
      (s, d) => {
        import graft.functions.VectorFunctions.md5Long
        val t = Tables.documents(s, d)
          .withColumn("hm", md5Long(col("text")))
          .withColumn("modality",
            when(col("doc_id") % 3 === 0, "text")
              .when(col("doc_id") % 3 === 1, "audio").otherwise("video"))
          .withColumn("units",
            when(col("doc_id") % 3 === 0, length(col("text")).cast("long"))
              .when(col("doc_id") % 3 === 1, col("hm") % 2000000 + 1)
              .otherwise(col("hm") % 240 + 1))
          .withColumn("sr", when(col("doc_id") % 3 === 1,
            element_at(array(lit(8000L), lit(16000L), lit(44100L)),
              (col("hm") % 3 + 1).cast("int"))))
        t.groupBy("modality")
          .agg(count(lit(1)).as("n_assets"),
               sum("units").as("total_units"),
               round(avg(col("units").cast("double")), 2).as("avg_units"),
               round(sum(when(col("sr").isNotNull,
                 col("units") / col("sr").cast("double")).otherwise(0.0)), 2)
                 .as("total_audio_sec"))
          .orderBy("modality")
      },
      Some("""WITH t AS (
             |  SELECT doc_id,
             |         ('0x' || substr(md5(text), 1, 15))::BIGINT AS hm,
             |         CASE WHEN doc_id % 3 = 0 THEN 'text'
             |              WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS modality,
             |         CASE WHEN doc_id % 3 = 0 THEN CAST(length(text) AS BIGINT)
             |              WHEN doc_id % 3 = 1
             |                THEN ('0x' || substr(md5(text), 1, 15))::BIGINT % 2000000 + 1
             |              ELSE ('0x' || substr(md5(text), 1, 15))::BIGINT % 240 + 1
             |         END AS units,
             |         CASE WHEN doc_id % 3 = 1 THEN
             |           ([8000, 16000, 44100])[CAST(('0x' || substr(md5(text), 1, 15))::BIGINT
             |             % 3 AS INTEGER) + 1]
             |         END AS sr
             |  FROM documents)
             |SELECT modality, CAST(count(*) AS BIGINT) AS n_assets,
             |       CAST(sum(units) AS BIGINT) AS total_units,
             |       round(avg(CAST(units AS DOUBLE)), 2) AS avg_units,
             |       round(sum(CASE WHEN sr IS NOT NULL
             |                 THEN units / CAST(sr AS DOUBLE) ELSE 0.0 END), 2)
             |         AS total_audio_sec
             |FROM t GROUP BY modality ORDER BY modality""".stripMargin)),

    // dHash perceptual near-dup (difference hash): 8×9 stub-decoded
    // luminance grid per image, 64 bits = horizontal-neighbor
    // gradients (px[r,c] < px[r,c+1]) — the gradient-structure
    // complement to mm_image_ahash's global-mean bits, robust to
    // uniform brightness shifts by construction. Same banded
    // pair-join + per-image nearest-neighbor report; the decode is
    // the deterministic md5 stub (no codec runtime in the sandbox),
    // the plumbing — grid fan-out, bit compare, hamming NN — real.
    "mm_image_dhash" -> Q(
      (s, d) => {
        import graft.functions.VectorFunctions.md5Long
        def px(i: Column) =
          md5Long(concat(col("text"), lit(":dpx"), i.cast("string"))) % 256
        val bits = Tables.documents(s, d)
          .filter(col("doc_id") % 3 === 1 && col("doc_id") < 120 &&
                  col("text").isNotNull)
          .select(col("doc_id"), col("text"),
            explode(sequence(lit(0L), lit(63L))).as("k"))
          .withColumn("i1", expr("k div 8") * 9 + col("k") % 8)
          .select(col("doc_id"), col("k"),
            (px(col("i1")) < px(col("i1") + 1)).cast("long").as("bit"))
          .localCheckpoint(eager = false) // both sides of the pair join
        val ham = bits.select(col("doc_id").as("da"), col("k"),
            col("bit").as("ba"))
          .join(bits.select(col("doc_id").as("db"), col("k"),
            col("bit").as("bb")), Seq("k"))
          .filter(col("da") =!= col("db"))
          .groupBy("da", "db")
          .agg(sum(abs(col("ba") - col("bb"))).as("hamming"))
        ham.withColumn("rk", row_number().over(
            Window.partitionBy("da").orderBy(col("hamming"), col("db"))))
          .filter(col("rk") === 1)
          .select(col("da").as("doc_id"), col("db").as("nn_doc"),
                  col("hamming").as("nn_hamming"))
          .orderBy("doc_id")
      },
      Some("""WITH imgs AS (SELECT doc_id, text FROM documents
             |              WHERE doc_id % 3 = 1 AND doc_id < 120
             |                AND text IS NOT NULL),
             |ks AS (SELECT doc_id, text, CAST(k AS BIGINT) AS k,
             |              (k // 8) * 9 + (k % 8) AS i1
             |       FROM imgs, LATERAL (SELECT unnest(generate_series(0, 63)) AS k)),
             |bits AS (SELECT doc_id, k,
             |           CAST((('0x' || substr(md5(text || ':dpx' || CAST(i1 AS VARCHAR)), 1, 15))::BIGINT % 256)
             |              < (('0x' || substr(md5(text || ':dpx' || CAST(i1 + 1 AS VARCHAR)), 1, 15))::BIGINT % 256)
             |             AS BIGINT) AS bit
             |         FROM ks),
             |ham AS (SELECT a.doc_id AS da, b.doc_id AS db,
             |               CAST(sum(abs(a.bit - b.bit)) AS BIGINT) AS hamming
             |        FROM bits a JOIN bits b ON a.k = b.k AND a.doc_id <> b.doc_id
             |        GROUP BY 1, 2),
             |rk AS (SELECT *, row_number() OVER (PARTITION BY da
             |                   ORDER BY hamming, db) AS rk
             |       FROM ham)
             |SELECT da AS doc_id, db AS nn_doc, hamming AS nn_hamming
             |FROM rk WHERE rk = 1 ORDER BY doc_id""".stripMargin)),

    // DCT perceptual hash (pHash) — the third of the perceptual trio
    // beside mm_image_ahash (global mean) and mm_image_dhash
    // (gradient): 16×16 stub luma → 8×8 DCT-II → 63 AC bits vs their
    // exact median — robust to brightness AND contrast shifts, the
    // industry near-dup screen for images. Cosines are quantized to
    // 3dp BEFORE the products (the ts_periodogram libm-vs-JDK ulp
    // defense at the term level), coefficients re-rounded to 4dp;
    // same banded hamming-NN report as the siblings. Decode is the
    // md5 stub (no codec in the sandbox) — the DCT plumbing is real.
    "mm_image_phash" -> Q(
      (s, d) => {
        // r17: folds DRIVER-side over the one distributed pass (the
        // ≤40-row bounded image-doc collect) — the in-plan form ran
        // the 655K-row DCT fan-out through a groupBy + median window
        // + pair join + NN window (~8 jobs) for a frame bounded by
        // construction at 40 docs. Arithmetic is replicated exactly:
        // Md5Hash.hash60 IS the md5Long expression's function,
        // Math.cos/BigDecimal-HALF_UP are what the cos/round
        // expressions evaluate, and the DCT sum accumulates in the
        // same pidx-ascending order the single-partition hash agg
        // used (terms are 3dp-quantized before the products — the
        // family's order-robustness discipline; re-verified oracle-
        // identical at sf0.001/0.01/0.1). Everything after `coef` is
        // integer/comparison logic.
        def round3(x: Double): Double = java.math.BigDecimal.valueOf(x)
          .setScale(3, java.math.RoundingMode.HALF_UP).doubleValue()
        def round4(x: Double): Double = java.math.BigDecimal.valueOf(x)
          .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()
        def md5of(str: String): Long = graft.functions.Md5Hash.hash60(
          org.apache.spark.unsafe.types.UTF8String.fromString(str))
        val imgs = Tables.documents(s, d)
          .filter(col("doc_id") % 3 === 2 && col("doc_id") < 120 &&
            col("text").isNotNull)
          .select(col("doc_id"), col("text")).collect()
          .map(r => (r.getLong(0), r.getString(1)))
        // per doc: 63 AC coefficients of the 8×8 DCT-II over the
        // 16×16 md5-stub luma, then bits vs the exact median (rank 32
        // of 63 by (coef, k))
        // the 3dp-rounded DCT basis has only 16×8 distinct values per
        // axis — precompute them once (same doubles the per-row
        // expression produced; the quantization is what makes the
        // sums order-robust)
        val cosTab = Array.tabulate(16, 8)((x, u) =>
          round3(math.cos(math.Pi * (x * 2 + 1) * u / 32.0)))
        val bitsOf: Array[(Long, Array[Long])] = imgs.map { case (id, text) =>
          val p = Array.tabulate(256)(i => md5of(s"$text:ppx$i") % 256)
          val coef = Array.tabulate(64) { k =>
            val u = k / 8; val v = k % 8
            var acc = 0.0
            var i = 0
            while (i < 256) {
              acc += p(i) * cosTab(i % 16)(u) * cosTab(i / 16)(v)
              i += 1
            }
            round4(acc)
          }
          val med = (1 until 64).map(k => (coef(k), k)).sorted.apply(31)._1
          id -> (1 until 64).map(k => if (coef(k) > med) 1L else 0L).toArray
        }
        import s.implicits._
        bitsOf.toSeq.flatMap { case (da, ba) =>
          val nn = bitsOf.collect { case (db, bb) if db != da =>
            (ba.zip(bb).map { case (x, y) => math.abs(x - y) }.sum, db) }
          if (nn.isEmpty) None else Some {
            val (h, db) = nn.min
            (da, db, h)
          }
        }.sortBy(_._1)
          .toDF("doc_id", "nn_doc", "nn_hamming")
          .orderBy("doc_id")
      },
      Some("""WITH imgs AS (SELECT doc_id, text FROM documents
             |              WHERE doc_id % 3 = 2 AND doc_id < 120
             |                AND text IS NOT NULL),
             |px AS (SELECT doc_id, text, CAST(pidx AS BIGINT) AS pidx,
             |              pidx % 16 AS x, pidx // 16 AS y,
             |              ('0x' || substr(md5(text || ':ppx' || CAST(pidx AS VARCHAR)), 1, 15))::BIGINT % 256 AS p
             |       FROM imgs, LATERAL (SELECT unnest(generate_series(0, 255)) AS pidx)),
             |freq AS (SELECT doc_id, CAST(k AS BIGINT) AS k,
             |                round(sum(p
             |                  * round(cos(pi() * (x * 2 + 1) * (k // 8) / 32.0), 3)
             |                  * round(cos(pi() * (y * 2 + 1) * (k % 8) / 32.0), 3)), 4) AS coef
             |         FROM px, LATERAL (SELECT unnest(generate_series(0, 63)) AS k)
             |         GROUP BY 1, 2),
             |med AS (SELECT doc_id, coef AS med FROM (
             |          SELECT doc_id, coef, row_number() OVER
             |            (PARTITION BY doc_id ORDER BY coef, k) AS rk
             |          FROM freq WHERE k > 0)
             |        WHERE rk = 32),
             |bits AS (SELECT f.doc_id, f.k,
             |                CAST(f.coef > m.med AS BIGINT) AS bit
             |         FROM freq f JOIN med m ON m.doc_id = f.doc_id
             |         WHERE f.k > 0),
             |ham AS (SELECT a.doc_id AS da, b.doc_id AS db,
             |               CAST(sum(abs(a.bit - b.bit)) AS BIGINT) AS hamming
             |        FROM bits a JOIN bits b ON a.k = b.k AND a.doc_id <> b.doc_id
             |        GROUP BY 1, 2),
             |rk AS (SELECT *, row_number() OVER (PARTITION BY da
             |                   ORDER BY hamming, db) AS rk
             |       FROM ham)
             |SELECT da AS doc_id, db AS nn_doc, hamming AS nn_hamming
             |FROM rk WHERE rk = 1 ORDER BY doc_id""".stripMargin)),

    // Aspect-ratio bucketing for batch shaping: every image assigned
    // to the geometrically-nearest canonical aspect (9:16, 3:4, 1:1,
    // 4:3, 16:9) so variable-resolution encoders batch same-shape
    // inputs without per-image padding waste — the image-side
    // companion to pipe_bucket_batches' token bands. Boundaries are
    // geometric midpoints of the canon ratios; w, h are integers so
    // the w/h comparisons are engine-identical. Pure map + one agg.
    "mm_aspect_buckets" -> Q(
      (s, d) => {
        val m = graft.multimodal.Multimodal.binaryMeta(Tables.documents(s, d))
          .withColumn("r", col("width").cast("double") / col("height"))
          .withColumn("bucket",
            when(col("r") < 0.649519, "9:16")
              .when(col("r") < 0.866025, "3:4")
              .when(col("r") < 1.154701, "1:1")
              .when(col("r") < 1.539601, "4:3")
              .otherwise("16:9"))
        m.groupBy("bucket")
          .agg(count(lit(1)).as("n_images"),
            round(sum(col("width") * col("height")).cast("double")
              / count(lit(1)) / 1e6, 4).as("avg_mpx"))
          .orderBy("bucket")
      },
      Some("""WITH m AS (
             |  SELECT doc_id, width, height,
             |         CAST(width AS DOUBLE) / height AS r
             |  FROM (SELECT doc_id, hm % 1024 + 1 AS width,
             |               (hm // 1024) % 1024 + 1 AS height
             |        FROM (SELECT doc_id, ('0x' || substr(md5(text), 1, 15))::BIGINT AS hm
             |              FROM documents))),
             |b AS (SELECT *,
             |        CASE WHEN r < 0.649519 THEN '9:16'
             |             WHEN r < 0.866025 THEN '3:4'
             |             WHEN r < 1.154701 THEN '1:1'
             |             WHEN r < 1.539601 THEN '4:3'
             |             ELSE '16:9' END AS bucket
             |      FROM m)
             |SELECT bucket, CAST(count(*) AS BIGINT) AS n_images,
             |       round(CAST(sum(width * height) AS DOUBLE)
             |             / count(*) / 1e6, 4) AS avg_mpx
             |FROM b GROUP BY bucket ORDER BY bucket""".stripMargin)),

    // Deterministic augmentation plan: resize-to-256 then a
    // reproducible 224² crop offset and flip flag per image, all
    // md5-derived — the data-aug PLUMBING a training pipeline must be
    // able to replay exactly across epochs and re-runs (decode itself
    // stays stubbed per the multimodal scope rule). Pure map over the
    // binary-metadata frame.
    "mm_augment_plan" -> Q(
      (s, d) => {
        import graft.functions.VectorFunctions.md5Long
        graft.multimodal.Multimodal.binaryMeta(Tables.documents(s, d))
          .filter(col("doc_id") < 50)
          .withColumn("scale",
            least(lit(1.0), lit(256.0) / greatest(col("width"), col("height"))))
          .select(col("doc_id"),
            greatest(lit(1L), floor(col("width") * col("scale")).cast("long")).as("w"),
            greatest(lit(1L), floor(col("height") * col("scale")).cast("long")).as("h"))
          .select(col("doc_id"), col("w"), col("h"),
            pmod(md5Long(concat(lit("cx:"), col("doc_id").cast("string"))),
              greatest(lit(1L), col("w") - 223)).as("crop_x"),
            pmod(md5Long(concat(lit("cy:"), col("doc_id").cast("string"))),
              greatest(lit(1L), col("h") - 223)).as("crop_y"),
            (md5Long(concat(lit("fl:"), col("doc_id").cast("string"))) % 2)
              .as("flip"))
          .orderBy("doc_id")
      },
      Some("""WITH m AS (
             |  SELECT doc_id, hm % 1024 + 1 AS width, (hm // 1024) % 1024 + 1 AS height
             |  FROM (SELECT doc_id, ('0x' || substr(md5(text), 1, 15))::BIGINT AS hm
             |        FROM documents WHERE doc_id < 50)),
             |r AS (
             |  SELECT doc_id,
             |         greatest(1, CAST(floor(width * least(1.0, 256.0 / greatest(width, height))) AS BIGINT)) AS w,
             |         greatest(1, CAST(floor(height * least(1.0, 256.0 / greatest(width, height))) AS BIGINT)) AS h
             |  FROM m)
             |SELECT doc_id, w, h,
             |       ('0x' || substr(md5('cx:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
             |         % greatest(1, w - 223) AS crop_x,
             |       ('0x' || substr(md5('cy:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
             |         % greatest(1, h - 223) AS crop_y,
             |       ('0x' || substr(md5('fl:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
             |         % 2 AS flip
             |FROM r ORDER BY doc_id""".stripMargin)),

    // Stub-luma image entropy (16×16 grid, 16 gray levels): the
    // flat/blank-image complexity filter an image-curation pass runs
    // before spending decode + encoder FLOPs — low-entropy grids are
    // solid colors and gradients. Decode stays stubbed (scope rule);
    // the histogram/entropy plumbing is real: exact level counts into
    // micro-unit-pinned c·ln c terms per image.
    "mm_image_entropy" -> Q(
      (s, d) => {
        import graft.functions.VectorFunctions.md5Long
        val dec = "decimal(38,0)"
        val lv = Tables.documents(s, d)
          .filter(col("doc_id") < 60)
          .select(col("doc_id"), col("text"),
            explode(sequence(lit(0L), lit(255L))).as("i"))
          .select(col("doc_id"),
            ((md5Long(concat(col("text"), lit(":epx"), col("i").cast("string")))
              % 256) / lit(16)).cast("long").as("lvl"))
          .groupBy("doc_id", "lvl").agg(count(lit(1)).as("c"))
        lv.groupBy("doc_id")
          .agg(count(lit(1)).as("n_levels"),
            sum(round(col("c") * log(col("c").cast("double")) * 1e6, 0)
              .cast(dec)).as("sclc"))
          .select(col("doc_id"), col("n_levels"),
            round((log(lit(256.0))
              - col("sclc").cast("double") / 1e6 / 256.0) / log(lit(2.0)), 4)
              .as("entropy_bits"))
          .orderBy("doc_id")
      },
      Some("""WITH px AS (
             |  SELECT doc_id,
             |         (('0x' || substr(md5(text || ':epx' || CAST(i AS VARCHAR)), 1, 15))::BIGINT
             |          % 256) // 16 AS lvl
             |  FROM documents, unnest(generate_series(0, 255)) AS t(i)
             |  WHERE doc_id < 60),
             |c AS (SELECT doc_id, lvl, CAST(count(*) AS BIGINT) AS c
             |      FROM px GROUP BY doc_id, lvl)
             |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_levels,
             |       round((ln(256.0)
             |              - CAST(sum(CAST(round(c * ln(CAST(c AS DOUBLE)) * 1e6)
             |                    AS BIGINT)) AS DOUBLE) / 1e6 / 256.0)
             |             / ln(2.0), 4) AS entropy_bits
             |FROM c GROUP BY doc_id ORDER BY doc_id""".stripMargin))
  )
}
