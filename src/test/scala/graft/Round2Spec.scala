package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.corpus.SynthCorpus
import graft.functions.{PageMetadata, TextFunctions}
import graft.pipeline.{Dedup, DedupConfig, ExactSubstring, ResumableDedupJob}
import graft.queries.{Segmentation, Serving}

/** Round-2 regression tests: judge/advisor items from VERDICT.md and
  * ADVICE.md — skew-aware production path, validSignatures wiring,
  * scale-safe pagination, merge-store compaction, scene segmentation,
  * typed HTML metadata, path scalars, suffix-array reuse.
  */
class Round2Spec extends SparkSpecBase {
  private val cfg = DedupConfig()

  test("configTag covers every banding-relevant field incl. rowsPerBand") {
    val base = cfg.configTag
    assert(cfg.copy(rowsPerBand = 2).configTag != base)
    assert(cfg.copy(bands = 32).configTag != base)
    assert(cfg.copy(shingleK = 4).configTag != base)
    assert(cfg.copy(threshold = 0.6).configTag != base)
    assert(cfg.copy(numHashes = 64, bands = 20).configTag != base)
  }

  test("validSignatures drops degenerate (empty-shingle) signatures before banding") {
    val spark2 = spark
    import spark2.implicits._
    // an empty shingle set leaves the MinHash kernel's init sentinel in
    // every slot -> first three components equal (ref
    // ray_extract_features.py:578-582 degenerate-signature semantics)
    val degen = Seq((99L, Seq.empty[Long])).toDF("id", "shingles")
    val degenSigs = Dedup.signatures(degen, cfg)
    val sig = degenSigs.select("sig").head.getSeq[Long](0)
    assert(sig(0) == sig(1) && sig(1) == sig(2))
    val real = Dedup.signatures(
      Dedup.shingleSets(Seq((1L, "a b c d e"), (2L, "a b c d e"))
        .toDF("id", "text"), cfg), cfg)
    val all = real.unionByName(degenSigs)
    val valid = Dedup.validSignatures(all)
    assert(valid.count() == 2 && valid.where(col("id") === 99L).count() == 0)
    // and the banding path never sees the degenerate row: the wired
    // pipeline (pairs) still finds exactly the real pair
    val bands = Dedup.bandTable(valid, cfg)
    assert(bands.where(col("id") === 99L).count() == 0)
    val p = Dedup.pairs(Seq((1L, "a b c d e"), (2L, "a b c d e"), (3L, "q r"))
      .toDF("id", "text"), cfg)
    assert(p.collect().map(r => (r.getLong(0), r.getLong(1))).toSet == Set((1L, 2L)))
  }

  test("production path: ResumableDedupJob.run on the skew fixture matches the plain pipeline") {
    val (skewed, _) = SynthCorpus.generate(spark, seed = 7L, nBase = 300,
      dupRate = 0.1, skewBoilerplate = true)
    val docs = Dedup.fromPages(skewed).localCheckpoint(true)
    val expected = Dedup.clusters(Dedup.pairs(docs, cfg))
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    val workDir = java.nio.file.Files.createTempDirectory("graft-skewrun").toString
    // tiny hotCap so the shared-boilerplate bands actually take the
    // salted branch (fixture bands reach width ~90)
    val got = ResumableDedupJob.run(docs, cfg, workDir, buckets = 4,
        hotCap = 8, saltBuckets = 4)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == expected)
    // identical pair set out of the skew-aware pairs stage
    val sigs = spark.read.parquet(s"$workDir/signatures/tag=${cfg.configTag}")
    val stage = ResumableDedupJob.pairsStage(sigs, cfg, hotCap = 8, saltBuckets = 4)
    val plainPairs = Dedup.pairs(docs, cfg)
      .select("id_a", "id_b").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(stage.select("id_a", "id_b").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet == plainPairs)
    // hot/cold split visible in the plan: the salted hot branch unions
    // with the plain cold branch
    val plan = stage.queryExecution.executedPlan.toString
    assert(plan.contains("Union"), s"expected hot/cold union in plan:\n${plan.take(800)}")
    // keep stage: durable curated-corpus decision — every doc present,
    // exactly one keeper per cluster, singletons keep themselves
    val clustersDf = spark.read
      .parquet(s"$workDir/clusters/tag=${cfg.configTag}")
    val keep = ResumableDedupJob.keepStage(docs, clustersDf, cfg, workDir)
    assert(keep.count() == docs.count())
    val perCluster = keep.groupBy("cluster_id")
      .agg(sum(when(col("kept"), 1).otherwise(0)).as("keepers"))
    assert(perCluster.where(col("keepers") =!= 1).count() == 0,
      "every cluster must have exactly one keeper")
    val clustered = clustersDf.select("id").distinct().count()
    val kept = keep.where(col("kept")).count()
    val singletons = docs.count() - clustered
    assert(kept == singletons +
      clustersDf.select("cluster_id").distinct().count())
  }

  test("listByMatchCount: top-k plan (no single-partition window), offset slices") {
    val spark2 = spark
    import spark2.implicits._
    val docs = (1L to 100L).map(i => (i, s"t$i")).toDF("id", "text")
    val edges = Seq((1L, 2L, 0.9), (1L, 3L, 0.9), (1L, 4L, 0.9), (2L, 3L, 0.8))
      .toDF("id_a", "id_b", "similarity")
    val page1 = Serving.listByMatchCount(docs, edges, limit = 3, offset = 0)
    val plan = page1.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"window in pagination plan:\n${plan.take(800)}")
    assert(plan.contains("TakeOrderedAndProject"), s"expected top-k plan:\n${plan.take(800)}")
    val got1 = page1.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    // hit counts: 1 -> 3, 2 -> 2, 3 -> 2, 4 -> 1, rest 0; order by
    // (hit_count desc, doc_id asc)
    assert(got1 == Seq((1L, 3L), (2L, 2L), (3L, 2L)))
    val page2 = Serving.listByMatchCount(docs, edges, limit = 3, offset = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(page2 == Seq((4L, 1L), (5L, 0L), (6L, 0L)))
  }

  test("nHopSlice: deterministic sorted offset/limit of the expansion") {
    val spark2 = spark
    import spark2.implicits._
    // chain 1-2-3-4-5
    val edges = Seq((1L, 2L, 1.0), (2L, 3L, 1.0), (3L, 4L, 1.0), (4L, 5L, 1.0))
      .toDF("id_a", "id_b", "similarity")
    val full = Serving.nHopCluster(edges, 1L, hops = 4)
      .collect().map(_.getLong(0)).toSet
    assert(full == Set(1L, 2L, 3L, 4L, 5L))
    val slice = Serving.nHopSlice(edges, 1L, hops = 4, offset = 1, limit = 2)
      .collect().map(_.getLong(0)).toSeq
    assert(slice == Seq(2L, 3L))
  }

  test("merge store: compaction preserves read() and collapses history; upserts continue") {
    val spark2 = spark
    import spark2.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-compact").toString
    val w = new graft.store.MergeWriter(spark, dir, Seq("url"))
    w.upsert(Seq(("u1", 10), ("u2", 20)).toDF("url", "v"), batchId = 1)
    w.upsert(Seq(("u2", 21), ("u3", 30)).toDF("url", "v"), batchId = 2)
    w.upsert(Seq(("u1", 11)).toDF("url", "v"), batchId = 3)
    val before = w.read().collect().map(r => (r.getString(0), r.getInt(1))).toSet
    assert(before == Set(("u1", 11), ("u2", 21), ("u3", 30)))
    w.compact()
    val dirs = new java.io.File(s"$dir/table").listFiles()
      .filter(_.getName.startsWith("_batch=")).map(_.getName).toSeq
    assert(dirs == Seq("_batch=3"), s"history not collapsed: $dirs")
    assert(w.read().collect().map(r => (r.getString(0), r.getInt(1))).toSet == before)
    // post-compaction upsert still wins over compacted state
    w.upsert(Seq(("u3", 31)).toDF("url", "v"), batchId = 4)
    assert(w.read().collect().map(r => (r.getString(0), r.getInt(1))).toSet ==
      Set(("u1", 11), ("u2", 21), ("u3", 31)))
    // retried batch replaces itself even with different values
    w.upsert(Seq(("u3", 32)).toDF("url", "v"), batchId = 4)
    assert(w.read().where(col("url") === "u3").head.getInt(1) == 32)
  }

  test("scene segmentation: per-item percentile threshold cuts, segment stats (hand oracle)") {
    val spark2 = spark
    import spark2.implicits._
    def ts(m: Int) = new Timestamp(1700000000000L + m * 60000L)
    val events = Seq(
      // user 1: values step 0.1 then jump 9.8 -> p90 of deltas
      // [.1,.1,9.8,.1] = 6.89 -> exactly one cut before e4
      (1L, 1L, ts(0), 0.0), (1L, 2L, ts(1), 0.1), (1L, 3L, ts(2), 0.2),
      (1L, 4L, ts(3), 10.0), (1L, 5L, ts(4), 10.1),
      // user 2: constant -> all deltas 0, threshold 0, no strict cut
      (2L, 6L, ts(0), 5.0), (2L, 7L, ts(1), 5.0), (2L, 8L, ts(2), 5.0)
    ).toDF("user_id", "event_id", "ts", "value")
    val stats = Segmentation.segmentStats(events)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSet
    assert(stats == Set(
      (1L, 0L, 3L, 0.1), (1L, 1L, 2L, 10.05), (2L, 0L, 3L, 5.0)))
    val segs = Segmentation.assignSegments(events)
      .select("event_id", "seg_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(segs == Map(1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 1L, 5L -> 1L,
      6L -> 0L, 7L -> 0L, 8L -> 0L))
  }

  test("listFiles: metadata sort (-desc prefix) + offset/limit pagination") {
    val spark2 = spark
    import spark2.implicits._
    def ts(d: Int) = new Timestamp(1700000000000L + d * 86400000L)
    val pages = Seq(
      ("u/a", ts(3), "x y z", "en"),
      ("u/b", ts(1), "x y", "en"),
      ("u/c", ts(3), "x", "de"),
      ("u/d", ts(2), "x y z w", "en")
    ).toDF("url", "warc_ts", "text", "lang")
    // newest first, url tiebreak: a (d3), c (d3), d (d2), b (d1)
    val got = Serving.listFiles(pages, sortBy = Seq("-warc_ts"),
      limit = Some(3)).select("url").collect().map(_.getString(0)).toSeq
    assert(got == Seq("u/a", "u/c", "u/d"))
    val page2 = Serving.listFiles(pages, sortBy = Seq("-warc_ts"),
      offset = 3, limit = Some(3)).select("url").collect().map(_.getString(0)).toSeq
    assert(page2 == Seq("u/b"))
    // filter + ascending lang sort composes
    val en = Serving.listFiles(pages, langIn = Seq("en"),
      sortBy = Seq("lang", "warc_ts"), limit = Some(10))
      .select("url").collect().map(_.getString(0)).toSeq
    assert(en == Seq("u/b", "u/d", "u/a"))
  }

  test("path scalars: basename + relativize (repr_utils semantics)") {
    val spark2 = spark
    import spark2.implicits._
    val df = Seq(
      ("https://ex.org/a/b/page.html", "https://ex.org"),
      ("https://ex.org/a/b/", "https://ex.org/a"),
      ("plain", "https://other.org"),
      ("https://other.org/x", "https://ex.org")
    ).toDF("path", "base")
    val got = df.select(
      TextFunctions.basename(col("path")).as("bn"),
      TextFunctions.relativize(col("path"), col("base")).as("rel"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(got == Seq(
      ("page.html", "a/b/page.html"),
      ("b", "b/"),
      ("plain", "plain"),
      ("x", "https://other.org/x")))
  }

  test("typed HTML metadata extraction: golden page + synthetic corpus invariants") {
    val spark2 = spark
    import spark2.implicits._
    val golden =
      """<!DOCTYPE html><html lang="en"><head><meta charset="utf-8">
        |<title>Hello World</title>
        |<meta name="description" content="A test page">
        |<meta name="keywords" content="a,b">
        |<link rel="canonical" href="https://ex.org/x">
        |<style>s{}</style><script>var i=1;</script></head>
        |<body><h1>H</h1><h2>I</h2><p>one</p><p>two</p>
        |<a href="/x">l</a><a href="/y">m</a><img src="i.png"></body></html>""".stripMargin
    val df = Seq(("https://ex.org/x", golden.getBytes("UTF-8"))).toDF("url", "html")
    val m = PageMetadata.extract(df).head
    assert(m.getAs[String]("title") == "Hello World")
    assert(m.getAs[String]("charset") == "utf-8")
    assert(m.getAs[String]("lang_attr") == "en")
    assert(m.getAs[String]("meta_description") == "A test page")
    assert(m.getAs[String]("meta_keywords") == "a,b")
    assert(m.getAs[String]("canonical_url") == "https://ex.org/x")
    assert(m.getAs[Long]("n_links") == 2L)
    assert(m.getAs[Long]("n_images") == 1L)
    assert(m.getAs[Long]("n_paragraphs") == 2L)
    assert(m.getAs[Long]("n_headings") == 2L)
    assert(m.getAs[Boolean]("has_script") && m.getAs[Boolean]("has_style"))
    // synthetic corpus: html wraps text in <p> blocks with script+style,
    // empty title -> null; text_len equals the extracted body text
    val (pages, _) = SynthCorpus.generate(spark, seed = 5L, nBase = 30)
    val meta = PageMetadata.extract(pages)
    assert(meta.where(col("title").isNotNull).count() == 0)
    assert(meta.where(!col("has_script") || !col("has_style")).count() == 0)
    val lens = meta.join(pages.select(col("url"), length(col("text")).as("want")), "url")
    assert(lens.where(col("text_len") =!= col("want")).count() == 0)
  }

  test("winnow kernel bit-equals the built-in HOF formulation (incl. unicode)") {
    val spark2 = spark
    import spark2.implicits._
    val docs = Seq(
      "the quick brown fox jumps over the lazy dog and runs far away",
      "short",
      "",
      "exact window edge", // length near w
      "uñicode 中文 mixed bytes ok here too yes", // multi-byte chars
      "aaaaaaaaaaaaaaaaaaaaaaaaaaaa" // repeated grams -> distinct matters
    ).toDF("text")
    Seq((8, 4), (4, 2), (12, 8)).foreach { case (w, p) =>
      val got = docs.select(
        TextFunctions.winnowFingerprints(col("text"), w, p).as("a"),
        TextFunctions.winnowFingerprintsHof(col("text"), w, p).as("b"))
        .collect()
      got.foreach(r => assert(r.getSeq[Long](0) == r.getSeq[Long](1),
        s"kernel/HOF mismatch at w=$w p=$p"))
    }
  }

  test("multimodal: real image-header decode (png/gif/bmp/jpeg) with stub fallback") {
    import graft.multimodal.BinaryPipeline
    def b(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray
    val png = b(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a,
      0, 0, 0, 13, 'I', 'H', 'D', 'R',
      0, 0, 2, 0x80, /* 640 */ 0, 0, 1, 0xe0 /* 480 */) ++ new Array[Byte](8)
    assert(BinaryPipeline.decodeImageHeader(png).contains(
      BinaryPipeline.MediaMeta("png", 640, 480, 1)))
    val gif = b('G', 'I', 'F', '8', '9', 'a',
      0x40, 0x01, /* 320 LE */ 0xc8, 0x00 /* 200 LE */) ++ new Array[Byte](6)
    assert(BinaryPipeline.decodeImageHeader(gif).contains(
      BinaryPipeline.MediaMeta("gif", 320, 200, 1)))
    val bmp = b('B', 'M') ++ new Array[Byte](16) ++
      b(0x20, 0x03, 0, 0, /* 800 LE */ 0xaf, 0xfd, 0xff, 0xff /* -593 -> 593 */)
    assert(BinaryPipeline.decodeImageHeader(bmp).contains(
      BinaryPipeline.MediaMeta("bmp", 800, 593, 1)))
    val jpg = b(0xff, 0xd8, 0xff, 0xe0, 0x00, 0x04, 0, 0, // APP0 segment
      0xff, 0xc0, 0x00, 0x0b, 0x08, 0x01, 0xe0, 0x02, 0x80) ++ new Array[Byte](4)
    assert(BinaryPipeline.decodeImageHeader(jpg).contains(
      BinaryPipeline.MediaMeta("jpeg", 640, 480, 1)))
    // unrecognized bytes fall back to the deterministic stub
    val junk = Array.tabulate[Byte](40)(i => (i % 127).toByte)
    assert(BinaryPipeline.decodeImageHeader(junk).isEmpty)
    assert(BinaryPipeline.decodeMeta(junk) == BinaryPipeline.decodeStub(junk))
    // and the DataFrame operator lands the real header values
    val spark2 = spark
    import spark2.implicits._
    val df = Seq(("p1", png), ("g1", gif)).toDF("id", "bytes")
    val got = BinaryPipeline.decode(df).collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2), r.getInt(3))).toSet
    assert(got == Set(("p1", "png", 640, 480), ("g1", "gif", 320, 200)))
  }

  test("multimodal: REAL bmp pixel decode + grid-luma featurization (hand-built image)") {
    import graft.multimodal.BinaryPipeline
    // 2x2 24bpp BMP: top row white,black; bottom row red,green.
    // Rows stored bottom-up, BGR, stride padded to 4 bytes (6 -> 8).
    def le32(v: Int) = Array[Byte]((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def le16(v: Int) = Array[Byte]((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    val header = Array[Byte]('B', 'M') ++ le32(70) ++ le32(0) ++ le32(54) ++
      le32(40) ++ le32(2) ++ le32(2) ++ le16(1) ++ le16(24) ++ le32(0) ++
      le32(16) ++ le32(0) ++ le32(0) ++ le32(0) ++ le32(0)
    assert(header.length == 54)
    val bottomRow = Array[Byte](0, 0, 255.toByte /* red BGR */ ,
      0, 255.toByte, 0 /* green */ , 0, 0)
    val topRow = Array[Byte](255.toByte, 255.toByte, 255.toByte /* white */ ,
      0, 0, 0 /* black */ , 0, 0)
    val bmp = header ++ bottomRow ++ topRow
    val Some((w, h, luma)) = BinaryPipeline.decodeBmpPixels(bmp)
    assert((w, h) == (2, 2))
    // top-down luma: white=255, black=0, red=76.245, green=149.685
    assert(luma(0) == 255.0 && luma(1) == 0.0)
    assert(math.abs(luma(2) - 76.245) < 1e-9 && math.abs(luma(3) - 149.685) < 1e-9)
    val f = BinaryPipeline.gridLumaFeature(w, h, luma, grid = 2)
    assert(f.toSeq == Seq(255.0f, 0.0f, 76.245f, 149.685f))
    assert(BinaryPipeline.featurize(bmp, 0, dim = 4).toSeq == f.toSeq)
    // non-BMP bytes keep the deterministic stub path
    val junk = Array.tabulate[Byte](64)(i => (i % 113).toByte)
    assert(BinaryPipeline.featurize(junk, 0, 8).toSeq ==
      BinaryPipeline.featurizeStub(junk, 0, 8).toSeq)
    // and the Dataset operator carries the real feature through
    val spark2 = spark
    import spark2.implicits._
    val frames = BinaryPipeline.sampleAndFeaturize(
      Seq(("img1", bmp)).toDF("id", "bytes"), stride = 1, dim = 4).collect()
    assert(frames.length == 1 && frames.head.feature.toSeq == f.toSeq)
  }

  test("multimodal: REAL png pixel decode (zlib inflate + all five unfilters)") {
    import graft.multimodal.BinaryPipeline
    def be32(v: Int) = Array[Byte]((v >>> 24).toByte, (v >>> 16).toByte,
      (v >>> 8).toByte, v.toByte)
    def chunk(typ: String, data: Array[Byte]): Array[Byte] = {
      val t = typ.getBytes("US-ASCII")
      val crc = new java.util.zip.CRC32(); crc.update(t); crc.update(data)
      be32(data.length) ++ t ++ data ++ be32(crc.getValue.toInt)
    }
    val pngSig = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
    // inverse filter (encoder side): filtered = raw - predictor mod 256
    def filterRow(f: Int, row: Array[Int], prev: Array[Int], bpp: Int): Array[Byte] =
      f.toByte +: row.indices.map { x =>
        val a = if (x >= bpp) row(x - bpp) else 0
        val b = prev(x); val c = if (x >= bpp) prev(x - bpp) else 0
        val pred = f match {
          case 0 => 0
          case 1 => a
          case 2 => b
          case 3 => (a + b) / 2
          case 4 =>
            val p = a + b - c
            val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
            if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
        }
        ((row(x) - pred) & 0xff).toByte
      }.toArray
    def makePng(w: Int, h: Int, colorType: Int, channels: Int,
                pixels: Array[Array[Int]], filters: Array[Int]): Array[Byte] = {
      val ihdr = be32(w) ++ be32(h) ++ Array[Byte](8, colorType.toByte, 0, 0, 0)
      var prev = Array.fill(w * channels)(0)
      val scan = pixels.zip(filters).flatMap { case (row, f) =>
        val out = filterRow(f, row, prev, channels); prev = row; out
      }
      val defl = new java.util.zip.Deflater()
      defl.setInput(scan); defl.finish()
      val buf = new Array[Byte](scan.length + 64)
      val n = defl.deflate(buf); defl.end()
      pngSig ++ chunk("IHDR", ihdr) ++ chunk("IDAT", buf.take(n)) ++
        chunk("IEND", Array.empty)
    }
    // grayscale 3x4 exercising every filter type (None/Sub/Up/Avg/Paeth)
    val gray = Array(
      Array(10, 20, 250), Array(15, 130, 7), Array(200, 0, 99), Array(1, 255, 128))
    val png = makePng(3, 4, colorType = 0, channels = 1, gray,
      filters = Array(0, 1, 2, 4))
    val Some((w, h, luma)) = BinaryPipeline.decodePngPixels(png)
    assert((w, h) == (3, 4))
    assert(luma.toSeq == gray.flatten.map(_.toDouble).toSeq)
    // RGB 2x2 with Average filter: BT.601 luma, same as the BMP contract
    val rgb = Array(
      Array(255, 255, 255, 0, 0, 0),   // white, black
      Array(255, 0, 0, 0, 255, 0))     // red, green
    val png2 = makePng(2, 2, colorType = 2, channels = 3, rgb,
      filters = Array(0, 3))
    val Some((w2, h2, luma2)) = BinaryPipeline.decodePngPixels(png2)
    assert((w2, h2) == (2, 2))
    assert(luma2(0) == 255.0 && luma2(1) == 0.0)
    assert(math.abs(luma2(2) - 76.245) < 1e-9 && math.abs(luma2(3) - 149.685) < 1e-9)
    // RGBA: alpha ignored for luma
    val rgba = Array(Array(255, 0, 0, 7, 0, 255, 0, 200))
    val Some((_, _, luma3)) = BinaryPipeline.decodePngPixels(
      makePng(2, 1, colorType = 6, channels = 4, rgba, filters = Array(4)))
    assert(math.abs(luma3(0) - 76.245) < 1e-9 && math.abs(luma3(1) - 149.685) < 1e-9)
    // featurize takes the REAL png path
    assert(BinaryPipeline.featurize(png2, 0, dim = 4).toSeq ==
      BinaryPipeline.gridLumaFeature(2, 2, luma2, grid = 2).toSeq)
    // corrupt/hostile inputs fall back cleanly: truncated IDAT, forged
    // huge IHDR (must not allocate), palette color type
    assert(BinaryPipeline.decodePngPixels(png.dropRight(30)).isEmpty)
    val forged = pngSig ++ chunk("IHDR",
      be32(1 << 20) ++ be32(1 << 20) ++ Array[Byte](8, 0, 0, 0, 0)) ++
      chunk("IEND", Array.empty)
    assert(BinaryPipeline.decodePngPixels(forged).isEmpty)
  }

  test("multimodal: REAL gif pixel decode (from-scratch LZW incl. KwKwK + code-width growth)") {
    import graft.multimodal.BinaryPipeline
    def le16(v: Int) = Array[Byte]((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    // LSB-first bit writer emitting codes at the decoder's expected width
    final class LzwWriter(minCodeSize: Int) {
      private val bits = scala.collection.mutable.ArrayBuffer[Int]()
      private val clear = 1 << minCodeSize
      private var codeSize = minCodeSize + 1
      private var dictSize = clear + 2
      private var prev = -1
      def writeCode(c: Int): Unit = {
        (0 until codeSize).foreach(i => bits += ((c >> i) & 1))
        if (c == clear) { codeSize = minCodeSize + 1; dictSize = clear + 2; prev = -1 }
        else if (prev == -1) prev = c
        else {
          dictSize += 1 // decoder adds one entry per non-first code
          if (dictSize == (1 << codeSize) && codeSize < 12) codeSize += 1
          prev = c
        }
      }
      def bytes: Array[Byte] = bits.grouped(8).map(g =>
        g.zipWithIndex.map { case (b, i) => b << i }.sum.toByte).toArray
    }
    // palette: 0=black, 1=white, 2=red, 3=green (global color table)
    val palette = Array[Byte](0, 0, 0, 255.toByte, 255.toByte, 255.toByte,
      255.toByte, 0, 0, 0, 255.toByte, 0)
    def makeGif(w: Int, h: Int, pixels: Array[Int],
                lzw: Array[Byte]): Array[Byte] =
      "GIF89a".getBytes("US-ASCII") ++ le16(w) ++ le16(h) ++
        Array[Byte](0x91.toByte /* GCT, 4 entries (2<<1) */, 0, 0) ++ palette ++
        // graphic-control extension (skipped by the decoder)
        Array[Byte](0x21, 0xf9.toByte, 4, 0, 0, 0, 0, 0) ++
        Array[Byte](0x2c) ++ le16(0) ++ le16(0) ++ le16(w) ++ le16(h) ++
        Array[Byte](0 /* no LCT, not interlaced */, 2 /* minCodeSize */) ++
        Array[Byte](lzw.length.toByte) ++ lzw ++ Array[Byte](0, 0x3b)
    // 12 literal pixels: enough non-first codes to push dictSize past 8,
    // exercising the 3->4 bit code-width growth mid-stream
    val px = Array(0, 1, 2, 3, 3, 2, 1, 0, 1, 1, 2, 0)
    val wr = new LzwWriter(2)
    wr.writeCode(4) // clear
    px.foreach(wr.writeCode)
    wr.writeCode(5) // EOI
    val gif = makeGif(4, 3, px, wr.bytes)
    val Some((w, h, luma)) = BinaryPipeline.decodeGifPixels(gif)
    assert((w, h) == (4, 3))
    val lumaOf = Array(0.0, 255.0, 76.245, 149.685)
    px.indices.foreach(i => assert(math.abs(luma(i) - lumaOf(px(i))) < 1e-9, s"px $i"))
    // KwKwK case: stream [clear, 1, 6] decodes to white,white,white
    // (code 6 == dictSize names the entry being defined)
    val wr2 = new LzwWriter(2)
    wr2.writeCode(4); wr2.writeCode(1); wr2.writeCode(6); wr2.writeCode(5)
    val Some((_, _, luma2)) = BinaryPipeline.decodeGifPixels(makeGif(3, 1, null, wr2.bytes))
    assert(luma2.toSeq == Seq(255.0, 255.0, 255.0))
    // featurize takes the real GIF path
    assert(BinaryPipeline.featurize(gif, 0, dim = 4).toSeq ==
      BinaryPipeline.gridLumaFeature(w, h, luma, grid = 2).toSeq)
    // corrupt inputs fall back cleanly: truncated stream
    assert(BinaryPipeline.decodeGifPixels(gif.dropRight(6)).isEmpty)
    // interlace flag = 4-pass row permutation on assembly: for h=3 the
    // transmission rows [0,1,2] land on actual rows [0,2,1]
    val interlaced = gif.clone()
    interlaced(13 + palette.length + 8 + 9) = 0x40.toByte // image-desc packed
    val Some((_, _, il)) = BinaryPipeline.decodeGifPixels(interlaced)
    val rows = luma.grouped(4).toArray
    assert(il.toSeq == (rows(0) ++ rows(2) ++ rows(1)).toSeq)
  }

  test("multimodal: JDK ImageIO codec path — jpeg decode, animated-gif frames, pure==codec parity") {
    import graft.multimodal.BinaryPipeline
    // jpeg: encode a half-white/half-black image with the JDK writer,
    // decode through the pipeline (lossy -> tolerance)
    val img = new java.awt.image.BufferedImage(16, 16,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until 16).foreach(y => (0 until 16).foreach(x =>
      img.setRGB(x, y, if (x < 8) 0xffffff else 0x000000)))
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "jpg", bos))
    val jpeg = bos.toByteArray
    val meta = BinaryPipeline.decodeMeta(jpeg)
    assert(meta.format == "jpeg" && meta.width == 16 && meta.height == 16 &&
      meta.nFrames == 1)
    val Some((jw, jh, jluma)) = BinaryPipeline.decodeImageIOFrame(jpeg, 0)
    assert((jw, jh) == (16, 16))
    val f = BinaryPipeline.featurize(jpeg, 0, dim = 4)
    assert(f(0) > 200f && f(2) > 200f, s"left cells white-ish: ${f.toSeq}")
    assert(f(1) < 55f && f(3) < 55f, s"right cells black-ish: ${f.toSeq}")
    // animated gif (two 1x1 frames, black then white): REAL frame count
    // + per-frame decode — the video-frame analog
    def le16(v: Int) = Array[Byte]((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    val palette = Array[Byte](0, 0, 0, 255.toByte, 255.toByte, 255.toByte,
      0, 0, 0, 0, 0, 0)
    def frameBlock(pix: Int): Array[Byte] = {
      // codes at width 3 (minCodeSize 2): clear=4, pixel, eoi=5 -> 9 bits
      val bits = Seq(4, pix, 5).flatMap(c => (0 until 3).map(i => (c >> i) & 1))
      val lzw = bits.grouped(8).map(g =>
        g.zipWithIndex.map { case (b, i) => b << i }.sum.toByte).toArray
      Array[Byte](0x2c) ++ le16(0) ++ le16(0) ++ le16(1) ++ le16(1) ++
        Array[Byte](0, 2, lzw.length.toByte) ++ lzw ++ Array[Byte](0)
    }
    val anim = "GIF89a".getBytes("US-ASCII") ++ le16(1) ++ le16(1) ++
      Array[Byte](0x91.toByte, 0, 0) ++ palette ++
      frameBlock(0) ++ frameBlock(1) ++ Array[Byte](0x3b)
    val ameta = BinaryPipeline.decodeMeta(anim)
    assert(ameta.format == "gif" && ameta.nFrames == 2, s"got $ameta")
    assert(BinaryPipeline.decodeImageIOFrame(anim, 0).exists(_._3.head == 0.0))
    assert(BinaryPipeline.decodeImageIOFrame(anim, 1).exists(_._3.head == 255.0))
    assert(BinaryPipeline.decodeImageIOFrame(anim, 2).isEmpty)
    // one row per frame through the Dataset operator, distinct features
    val spark2 = spark
    import spark2.implicits._
    val frames = BinaryPipeline.sampleAndFeaturize(
      Seq(("anim", anim)).toDF("id", "bytes"), stride = 1, dim = 1)
      .collect().sortBy(_.frameIdx)
    assert(frames.map(_.frameIdx).toSeq == Seq(0, 1))
    assert(frames(0).feature.head == 0.0f && frames(1).feature.head == 255.0f)
    // parity: the pure spec decoders and the JDK codec agree bit-for-bit
    // on lossless formats (PNG path exercised via a JDK-written png)
    val bos2 = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "png", bos2))
    val png = bos2.toByteArray
    val pure = BinaryPipeline.decodePngPixels(png)
    val codec = BinaryPipeline.decodeImageIOFrame(png, 0)
    assert(pure.isDefined, "JDK png output should be 8-bit non-interlaced")
    assert(pure.get._3.toSeq == codec.get._3.toSeq)
  }

  test("multimodal: visual near-dup pipeline on real pixels (the reference's own domain)") {
    import graft.multimodal.BinaryPipeline
    def makePng(pattern: (Int, Int) => Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(16, 16,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      (0 until 16).foreach(y => (0 until 16).foreach(x =>
        img.setRGB(x, y, pattern(x, y))))
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val leftWhite = makePng((x, _) => if (x < 8) 0xffffff else 0)
    // near-dup of leftWhite: two pixels flipped
    val leftWhite2 = makePng((x, y) =>
      if ((x, y) == (0, 0) || (x, y) == (15, 15)) 0x808080
      else if (x < 8) 0xffffff else 0)
    val topWhite = makePng((_, y) => if (y < 8) 0xffffff else 0)
    val topWhite2 = makePng((x, y) =>
      if ((x, y) == (3, 3)) 0x404040 else if (y < 8) 0xffffff else 0)
    val gradient = makePng((x, y) => { val v = (x * 16) & 0xff; (v << 16) | (v << 8) | v })
    val spark2 = spark
    import spark2.implicits._
    val media = Seq(("a1", leftWhite), ("a2", leftWhite2), ("b1", topWhite),
      ("b2", topWhite2), ("c1", gradient)).toDF("id", "bytes")
    val pairs = BinaryPipeline.mediaDuplicatePairs(media, threshold = 0.99)
    val got = pairs.select("id_a", "id_b").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == Set(("a1", "a2"), ("b1", "b2")), s"got $got")
    val clusters = BinaryPipeline.mediaClusters(pairs)
      .collect().map(r => (r.getString(0), r.getString(1))).toMap
    assert(clusters == Map("a1" -> "a1", "a2" -> "a1", "b1" -> "b1", "b2" -> "b1"))
    // sanity: the cross-pattern cosine really is far from the threshold
    // (left-half vs top-half grids overlap on one quadrant -> ~0.5)
    val emb = BinaryPipeline.itemEmbedding(
      BinaryPipeline.sampleAndFeaturize(media, stride = 1, dim = 16))
      .select(col("id"),
        expr("transform(embedding, x -> cast(x as float))").as("embedding"))
    val topk = graft.functions.Embeddings.bruteForceTopK(emb, emb, 4)
    val cross = topk.where(col("query_id") === "a1" && col("neighbor_id") === "b1")
      .select("cosine").collect().head.getDouble(0)
    assert(cross < 0.7, s"distinct patterns must stay below threshold: $cross")
  }

  test("multimodal: srpTopK swap works on media embeddings; mediaKeepList keeps highest resolution") {
    import graft.multimodal.BinaryPipeline
    import graft.functions.Embeddings
    val spark2 = spark
    import spark2.implicits._
    // grid-luma pooling is resolution-invariant for block patterns, so
    // the same pattern at 16x16 and 32x32 lands in one duplicate group
    def makePng(size: Int, pattern: (Int, Int) => Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(size, size,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      (0 until size).foreach(y => (0 until size).foreach(x =>
        img.setRGB(x, y, pattern(x * 16 / size, y * 16 / size))))
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val left = (x: Int, _: Int) => if (x < 8) 0xffffff else 0
    val top = (_: Int, y: Int) => if (y < 8) 0xffffff else 0
    val media = Seq(
      ("a_small", makePng(16, left)), ("a_big", makePng(32, left)),
      ("b_small", makePng(16, top)), ("b_big", makePng(32, top))
    ).toDF("id", "bytes")
    val pairs = BinaryPipeline.mediaDuplicatePairs(media, threshold = 0.99)
    val clusters = BinaryPipeline.mediaClusters(pairs)
    val keep = BinaryPipeline.mediaKeepList(media, clusters)
      .collect().map(r => r.getString(0) -> r.getBoolean(3)).toMap
    assert(keep == Map("a_small" -> false, "a_big" -> true,
      "b_small" -> false, "b_big" -> true), s"got $keep")
    // srpTopK (the documented scale swap) finds every planted media
    // near-dup pair that the threshold-complete scan finds
    val groups = 60
    val mediaN = (0 until groups * 3).map(i =>
      (i.toString, BinaryPipeline.syntheticBmp(i / 3, i % 3 + 1))).toDF("id", "bytes")
    val emb = BinaryPipeline.itemEmbedding(
        BinaryPipeline.sampleAndFeaturize(mediaN, stride = 1, dim = 16))
      .select(col("id"),
        expr("transform(embedding, x -> cast(x as float))").as("embedding"))
      .localCheckpoint(true)
    val want = Embeddings.bruteForceThresholdPairs(emb, 0.9995)
      .select("id_a", "id_b").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(want.size == groups * 3, s"planted pairs: ${want.size}") // C(3,2)=3 per group
    val gotSrp = Embeddings.srpTopK(emb, k = 4, bits = 8, tables = 4)
      .where(col("cosine") >= 0.9995 && col("query_id") < col("neighbor_id"))
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    val recall = (want & gotSrp).size.toDouble / want.size
    assert(recall >= 0.95, s"srp recall on media embeddings: $recall")
  }

  test("incremental media matching equals the full-batch pair set (new batch broadcast, store scanned)") {
    import graft.multimodal.BinaryPipeline
    val spark2 = spark
    import spark2.implicits._
    val tau = SparkEntry.mediaDedupThreshold
    // 40 groups x 3 variants, split across two ingest batches so many
    // groups straddle the batch boundary (the cross-batch join matters)
    val all = (0 until 120).map(i =>
      (i.toString, BinaryPipeline.syntheticBmp(i / 3, i % 3 + 1)))
    val batch1 = all.filter { case (id, _) => id.toLong % 2 == 0 }
    val batch2 = all.filter { case (id, _) => id.toLong % 2 == 1 }
    def embOf(rows: Seq[(String, Array[Byte])]) =
      BinaryPipeline.mediaEmbeddings(rows.toDF("id", "bytes")).localCheckpoint(true)
    val e1 = embOf(batch1); val e2 = embOf(batch2)
    def ps(df: org.apache.spark.sql.DataFrame) =
      df.select("id_a", "id_b").collect()
        .map(r => (r.getString(0), r.getString(1))).toSet
    val full = ps(BinaryPipeline.mediaDuplicatePairs(all.toDF("id", "bytes"), tau))
    // ingest batch1 into an empty store, then batch2 against the store
    val inc1 = ps(BinaryPipeline.incrementalMediaPairs(e1, e1.limit(0), tau))
    val inc2 = ps(BinaryPipeline.incrementalMediaPairs(e2, e1, tau))
    assert(inc1.intersect(inc2).isEmpty)
    assert((inc1 ++ inc2) == full,
      s"missing=${full -- inc1 -- inc2} extra=${(inc1 ++ inc2) -- full}")
    assert(full.size == 40 * 3) // C(3,2)=3 pairs per planted group
  }

  test("multimodal: scene detection over real animated-gif frames (frame-distance cuts)") {
    import graft.multimodal.BinaryPipeline
    val spark2 = spark
    import spark2.implicits._
    def le16(v: Int) = Array[Byte]((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    // 4x4 frames over a 2-color palette; literal-code LZW (16 pixels +
    // clear + eoi stays within 3-bit codes after growth handling)
    def frameBlock(pix: Seq[Int]): Array[Byte] = {
      var codeSize = 3; var dictSize = 6
      val bits = scala.collection.mutable.ArrayBuffer[Int]()
      var first = true
      (4 +: pix :+ 5).foreach { c =>
        (0 until codeSize).foreach(i => bits += ((c >> i) & 1))
        if (c != 4) {
          if (first) first = false
          else {
            dictSize += 1
            if (dictSize == (1 << codeSize) && codeSize < 12) codeSize += 1
          }
        }
      }
      val lzw = bits.grouped(8).map(g =>
        g.zipWithIndex.map { case (b, i) => b << i }.sum.toByte).toArray
      Array[Byte](0x2c) ++ le16(0) ++ le16(0) ++ le16(4) ++ le16(4) ++
        Array[Byte](0, 2, lzw.length.toByte) ++ lzw ++ Array[Byte](0)
    }
    val leftWhite = (0 until 16).map(i => if (i % 4 < 2) 1 else 0)
    val topWhite = (0 until 16).map(i => if (i / 4 < 2) 1 else 0)
    val palette = Array[Byte](0, 0, 0, 255.toByte, 255.toByte, 255.toByte,
      0, 0, 0, 0, 0, 0)
    // 6 frames: 3x scene A (left-white), then 3x scene B (top-white)
    val gif = "GIF89a".getBytes("US-ASCII") ++ le16(4) ++ le16(4) ++
      Array[Byte](0x91.toByte, 0, 0) ++ palette ++
      (Seq.fill(3)(frameBlock(leftWhite)) ++ Seq.fill(3)(frameBlock(topWhite)))
        .reduce(_ ++ _) ++ Array[Byte](0x3b)
    assert(BinaryPipeline.decodeMeta(gif).nFrames == 6)
    val scenes = BinaryPipeline.mediaScenes(
        Seq(("vid", gif)).toDF("id", "bytes"), stride = 1, dim = 4)
      .collect().map(r => (r.getLong(1), (r.getLong(2), r.getInt(3), r.getInt(4))))
      .toMap // seg_id -> (n_frames, frame_min, frame_max)
    assert(scenes == Map(0L -> ((3L, 0, 2)), 1L -> ((3L, 3, 5))),
      s"expected two 3-frame scenes cut at frame 3: $scenes")
  }

  test("multimodal: real WAV/PCM decode + audio near-dup through the shared frame pipeline") {
    import graft.multimodal.BinaryPipeline
    import graft.functions.Embeddings
    val spark2 = spark
    import spark2.implicits._
    def le16b(v: Int) = Array[Byte]((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    def le32b(v: Int) = le16b(v & 0xffff) ++ le16b((v >> 16) & 0xffff)
    def makeWav(freq: Double, amp: Double, rate: Int = 8000,
                seconds: Double = 0.5): Array[Byte] = {
      val n = (rate * seconds).toInt
      val data = new Array[Byte](n * 2)
      (0 until n).foreach { i =>
        val v = (amp * math.sin(2 * math.Pi * freq * i / rate) * 32767).toInt
        data(i * 2) = (v & 0xff).toByte
        data(i * 2 + 1) = ((v >> 8) & 0xff).toByte
      }
      "RIFF".getBytes("US-ASCII") ++ le32b(36 + data.length) ++
        "WAVE".getBytes("US-ASCII") ++
        "fmt ".getBytes("US-ASCII") ++ le32b(16) ++ le16b(1) ++ le16b(1) ++
        le32b(rate) ++ le32b(rate * 2) ++ le16b(2) ++ le16b(16) ++
        "data".getBytes("US-ASCII") ++ le32b(data.length) ++ data
    }
    // decode roundtrip: rate + sample values recovered
    val wav = makeWav(440.0, 0.5)
    val Some((rate, pcm)) = BinaryPipeline.decodeWavPcm(wav)
    assert(rate == 8000 && pcm.length == 4000)
    assert(math.abs(pcm(0)) < 1e-4) // sin(0) = 0
    assert(pcm.max > 0.49 && pcm.min < -0.49)
    // near-dup audio: same pitch at slightly different loudness pairs up;
    // the octave-apart clip (2x zero-crossing rate) stays out
    val media = Seq(
      ("tone_a", makeWav(440.0, 0.5)), ("tone_a2", makeWav(440.0, 0.52)),
      ("tone_b", makeWav(880.0, 0.5))).toDF("id", "bytes")
    val emb = BinaryPipeline.itemEmbedding(BinaryPipeline.audioFrames(media))
      .select(col("id"),
        expr("transform(embedding, x -> cast(x as float))").as("embedding"))
    val pairs = Embeddings.bruteForceThresholdPairs(emb, 0.999)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(pairs.map(p => (p._1, p._2)) == Set(("tone_a", "tone_a2")), s"got $pairs")
    // undecodable bytes fall back to one stub frame
    val junk = Array.tabulate[Byte](100)(i => (i * 7).toByte)
    val stubFrames = BinaryPipeline.audioFrames(
      Seq(("x", junk)).toDF("id", "bytes")).collect()
    assert(stubFrames.length == 1 &&
      stubFrames.head.feature.toSeq ==
        BinaryPipeline.featurizeStub(junk, 0, BinaryPipeline.AudioFeatureDim).toSeq)
  }

  test("multimodal hardening: null/empty/junk bytes flow through without errors") {
    import graft.multimodal.BinaryPipeline
    val spark2 = spark
    import spark2.implicits._
    val media = Seq(
      ("nul", null.asInstanceOf[Array[Byte]]),
      ("empty", Array.empty[Byte]),
      ("junk", Array.tabulate[Byte](64)(i => (i * 13).toByte)),
      ("real", BinaryPipeline.syntheticBmp(1L, 1))
    ).toDF("id", "bytes")
    val meta = BinaryPipeline.decode(media).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(meta("nul") == "empty" && meta("empty") == "empty" &&
      meta("real") == "bmp")
    val frames = BinaryPipeline.sampleAndFeaturize(media, stride = 1, dim = 4)
      .collect().groupBy(_.id)
    assert(frames.contains("real") && frames.contains("junk"))
    assert(!frames.contains("nul") && !frames.contains("empty"),
      "zero-frame media emits no rows") // decodeStub nFrames=0 for empty
    // pair search over the mixed table: no crash, only real-vs-real space
    assert(BinaryPipeline.mediaDuplicatePairs(media, threshold = 0.9999).count() == 0)
    // audio path on the same hostile inputs
    val af = BinaryPipeline.audioFrames(media).collect().groupBy(_.id)
    assert(af("junk").length == 1) // stub frame
  }

  test("differential: pure spec decoders bit-equal the JDK codecs on randomized images") {
    import graft.multimodal.BinaryPipeline
    val rnd = new scala.util.Random(77L)
    def write(img: java.awt.image.BufferedImage, fmt: String): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, fmt, bos), s"writer for $fmt")
      bos.toByteArray
    }
    var gifDecoded = 0
    for (t <- 0 until 10) {
      val w = 1 + rnd.nextInt(40); val h = 1 + rnd.nextInt(40)
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      (0 until h).foreach(y => (0 until w).foreach(x =>
        img.setRGB(x, y, rnd.nextInt(1 << 24))))
      for ((fmt, pure) <- Seq(
        ("png", BinaryPipeline.decodePngPixels _),
        ("bmp", BinaryPipeline.decodeBmpPixels _),
        ("gif", BinaryPipeline.decodeGifPixels _))) {
        val bytes = write(img, fmt)
        val codec = BinaryPipeline.decodeImageIOFrame(bytes, 0)
        assert(codec.isDefined, s"$fmt t=$t codec decode")
        pure(bytes) match {
          case Some((pw, ph, pl)) =>
            assert((pw, ph) == (w, h), s"$fmt t=$t dims")
            assert(pl.toSeq == codec.get._3.toSeq, s"$fmt t=$t luma mismatch")
            if (fmt == "gif") gifDecoded += 1
          case None =>
            // only acceptable for layouts the pure decoder declares out of
            // scope; the JDK writers emit 24bpp BMP / 8-bit PNG, so those
            // must always take the pure path
            assert(fmt == "gif", s"$fmt t=$t pure decoder refused a JDK-written file")
        }
      }
    }
    // the JDK gif writer emits real LZW (dictionary hits, not literals):
    // the from-scratch decoder must handle at least most of them
    assert(gifDecoded >= 8, s"pure gif decoder handled only $gifDecoded/10")
  }

  test("suffix-array containment: one SA per hay doc, semantics unchanged") {
    val spark2 = spark
    import spark2.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "brown fox"), (3L, "purple cow"), (4L, "dog"),
      (5L, "abc"), (6L, "abd")
    ).toDF("id", "text")
    // hay doc 1 appears in three pairs: SA built once per group
    val cands = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (5L, 6L))
      .toDF("id_a", "id_b")
    val got = ExactSubstring.containmentPairs(cands, docs)
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getBoolean(2))).toMap
    assert(got == Map(
      ("1", "2") -> true, ("1", "3") -> false, ("1", "4") -> true,
      ("2", "3") -> false, ("5", "6") -> false))
  }

  test("prefix-filtered exact Jaccard: identical pair set, fewer candidates on boilerplate skew") {
    // boilerplate-heavy fixture: the hot shared shingles are exactly what
    // the plain inverted-index join degenerates on
    val (skewed, _) = SynthCorpus.generate(spark, seed = 11L, nBase = 300,
      dupRate = 0.15, skewBoilerplate = true)
    val docs = Dedup.fromPages(skewed).localCheckpoint(true)
    def pairSet(df: org.apache.spark.sql.DataFrame) =
      df.select("id_a", "id_b").collect()
        .map(r => (r.getString(0), r.getString(1))).toSet
    val full = pairSet(Dedup.exactJaccardPairs(docs, cfg))
    assert(pairSet(Dedup.exactJaccardPairsPrefix(docs, cfg)) == full)
    assert(full.nonEmpty)
    // and at the low containment threshold used by the substring pass
    val low = cfg.copy(threshold = 0.3)
    assert(pairSet(Dedup.exactJaccardPairsPrefix(docs, low)) ==
      pairSet(Dedup.exactJaccardPairs(docs, low)))
    // pruning evidence: candidate volume strictly below the complete
    // inverted-index candidate volume (shared-shingle pairs)
    val shingled = Dedup.shingleSets(docs, cfg)
    val sh = shingled.select(col("id"), explode(col("shingles")).as("h"))
    val fullCands = sh.as("a").join(sh.as("b"),
        col("a.h") === col("b.h") && col("a.id") < col("b.id"))
      .select(col("a.id"), col("b.id")).distinct().count()
    val prefCands = Dedup.prefixCandidates(shingled, cfg).count()
    assert(prefCands < fullCands,
      s"prefix filter should prune: $prefCands vs $fullCands")
    assert(prefCands <= fullCands / 2,
      s"expected substantial pruning on the boilerplate fixture: $prefCands vs $fullCands")
  }

  test("keepList: best-quality doc kept per cluster, singletons kept, ties by min id") {
    val spark2 = spark
    import spark2.implicits._
    val docs = Seq(
      (1L, "short"),                                   // cluster {1,2,3}
      (2L, "the quick brown fox jumps over the lazy dog and keeps running"),
      (3L, "the quick brown fox jumps over the lazy dog and keeps"),
      (4L, "lonely singleton document with the usual words"), // singleton
      (5L, "x"), (6L, "x")                             // cluster {5,6}: equal quality -> min id kept
    ).toDF("id", "text")
    val clusters = Seq((1L, 1L), (2L, 1L), (3L, 1L), (5L, 5L), (6L, 5L))
      .toDF("id", "cluster_id")
    val got = Dedup.keepList(docs, clusters,
        graft.functions.TextFunctions.qualityScore(col("text")))
      .select("id", "cluster_id", "kept")
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getBoolean(2)))).toMap
    assert(got(4L) == (4L, true), "singleton keeps itself")
    assert(got(5L) == (5L, true) && got(6L) == (5L, false), "tie -> min id")
    // exactly one keeper in cluster 1, and it's the longest/richest doc (2)
    assert(got(2L)._2 && !got(1L)._2 && !got(3L)._2)
  }

  test("prefix filter completeness (property): random corpora x thresholds match brute force") {
    val spark2 = spark
    import spark2.implicits._
    val rnd = new scala.util.Random(4242L)
    // tiny vocabulary forces heavy shingle overlap — worst case for a
    // buggy prefix bound (qualifying pairs whose shared shingles are all
    // near the hot end of the frequency order)
    val vocab = Array("a", "b", "c", "d", "e", "f", "g", "h")
    for (trial <- 0 until 6) {
      val tau = Seq(0.3, 0.5, 0.7)(trial % 3)
      val n = 12 + rnd.nextInt(12)
      val docsSeq = (1 to n).map { i =>
        val len = 3 + rnd.nextInt(10)
        (i.toLong, Seq.fill(len)(vocab(rnd.nextInt(vocab.length))).mkString(" "))
      }
      val docs = docsSeq.toDF("id", "text")
      val c = cfg.copy(threshold = tau)
      def ps(df: org.apache.spark.sql.DataFrame) =
        df.select("id_a", "id_b").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
      val expect = ps(Dedup.exactJaccardPairs(docs, c))
      val got = ps(Dedup.exactJaccardPairsPrefix(docs, c))
      assert(got == expect,
        s"trial=$trial tau=$tau n=$n: prefix=${got.size} brute=${expect.size} " +
          s"missing=${expect -- got} extra=${got -- expect}")
    }
  }
}
