package graft

import org.apache.spark.sql.functions._
import graft.ops.Multimodal

class MultimodalSpec extends SparkTestBase {
  import spark.implicits._

  test("synthetic assets are deterministic with typed metadata + binary payload") {
    val a = Multimodal.syntheticAssets(spark, 100L).collect().sortBy(_.asset_id)
    val b = Multimodal.syntheticAssets(spark, 100L).collect().sortBy(_.asset_id)
    assert(a.length == 100)
    assert(a.map(_.content.toSeq).toSeq == b.map(_.content.toSeq).toSeq)
    assert(a.forall(x => x.content.length == (64 + (x.asset_id * 31) % 192).toInt))
    assert(a.map(_.media_type).distinct.sorted.toSeq == Seq("audio", "image", "video"))
  }

  test("feature extraction: fixed-dim embeddings, frame policy, partition-local") {
    val assets = Multimodal.syntheticAssets(spark, 100L).repartition(5)
    val feats = Multimodal.extractFeatures(assets, dim = 16).collect()
    assert(feats.length == 100)
    assert(feats.forall(_.embedding.length == 16))
    assert(feats.filter(_.media_type == "image").forall(_.frames_sampled == 1))
    assert(feats.filter(_.media_type != "image").forall(f =>
      f.frames_sampled >= 1 && f.frames_sampled <= 16))
    // deterministic regardless of partitioning
    val again = Multimodal.extractFeatures(
      Multimodal.syntheticAssets(spark, 100L).repartition(2), dim = 16).collect()
    assert(feats.sortBy(_.asset_id).map(_.embedding.toSeq).toSeq ==
      again.sortBy(_.asset_id).map(_.embedding.toSeq).toSeq)
  }

  test("resize: spatial media fits within bounds, never upscales; audio untouched") {
    val assets = Multimodal.syntheticAssets(spark, 200L)
    val original = assets.collect().map(a => a.asset_id -> a).toMap
    val out = Multimodal.resizeAssets(assets, maxW = 96, maxH = 96).collect()
    assert(out.length == 200)
    out.foreach { r =>
      val o = original(r.asset_id)
      if (r.media_type == "audio") {
        assert(r.width == o.width && r.height == o.height)
        assert(r.content.toSeq == o.content.toSeq)
      } else {
        assert(r.width <= 96 && r.height <= 96, s"${r.asset_id} not fitted")
        assert(r.width <= o.width && r.height <= o.height, "upscaled")
        // aspect ratio preserved to per-mille precision
        val scaleW = r.width.toLong * 1000 / o.width
        val scaleH = r.height.toLong * 1000 / o.height
        assert(math.abs(scaleW - scaleH) <= 20, s"aspect drift: $scaleW vs $scaleH")
        assert(r.content.length.toLong == r.n_bytes_out)
      }
    }
  }

  test("mediaNearDup: byte-identical twins at hamming 0, distinct payloads unpaired") {
    val base = Multimodal.syntheticAssets(spark, 200L)
    val twins = base.filter(_.asset_id % 7 == 0)
      .map(a => a.copy(asset_id = a.asset_id + 10000L))
    val feats = Multimodal.extractFeatures(base.union(twins), dim = 64).toDF()
      .select(col("asset_id"), col("embedding"))
    val pairs = Multimodal.mediaNearDup(feats)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSeq
    val planted = (0L until 200L by 7L).map(i => (i, i + 10000L, 0L))
    assert(pairs == planted, s"got: $pairs")
  }

  test("metadata-only profile never reads the content bytes (column pruning)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_media").toString
    Multimodal.syntheticAssets(spark, 100L).toDF()
      .write.mode("overwrite").parquet(dir)
    val profile = Multimodal.mediaProfile(spark.read.parquet(dir))
    val plan = profile.queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema"))
    assert(!plan.split("ReadSchema")(1).split("\n")(0).contains("content"),
      s"content column must be pruned from the scan:\n$plan")
    val rows = profile.collect()
    assert(rows.map(_.getAs[String]("media_type")).toSeq ==
      Seq("audio", "image", "video"))
  }

  test("extracted features feed the similarity operators") {
    val feats = Multimodal.extractFeatures(
      Multimodal.syntheticAssets(spark, 50L)).toDF()
    val nn = Multimodal.nearestAssets(feats, queryId = 0L, k = 3).collect()
    assert(nn.length == 3)
    assert(nn.forall(_.getAs[Long]("asset_id") != 0L))
  }

  test("sampleFrames: byte slices tile the payload exactly; hand case splits 10 into 3|3|4") {
    import spark.implicits._
    // invariant over the synthetic corpus: per asset, frame_bytes sum to
    // n_bytes, offsets are the running sum (no gap, no overlap)
    val frames = Multimodal.sampleFrames(Multimodal.syntheticAssets(spark, 60L))
      .collect()
      .map(r => (r.getAs[Long]("asset_id"), r.getAs[Long]("frame_idx"),
        r.getAs[Long]("byte_offset"), r.getAs[Long]("frame_bytes")))
    val byAsset = frames.groupBy(_._1)
    val lens = Multimodal.syntheticAssets(spark, 60L).collect()
      .map(a => a.asset_id -> a.content.length.toLong).toMap
    byAsset.foreach { case (id, fs) =>
      val sorted = fs.sortBy(_._2)
      assert(sorted.map(_._4).sum == lens(id), s"asset $id lost bytes")
      sorted.foldLeft(0L) { case (off, (_, _, bo, fb)) =>
        assert(bo == off, s"asset $id frame gap at $bo != $off"); off + fb
      }
    }
    // hand case: 3500 ms video, 10 bytes → frames of 3, 3, 4 bytes
    val one = Seq(Multimodal.MediaAsset(7L, "video", "opus", 64, 64, 3500L,
      Array.tabulate[Byte](10)(_.toByte))).toDS()
    val out = Multimodal.sampleFrames(one).collect()
      .map(r => (r.getAs[Long]("frame_idx"), r.getAs[Long]("offset_ms"),
        r.getAs[Long]("byte_offset"), r.getAs[Long]("frame_bytes")))
    assert(out.toSeq == Seq((0L, 0L, 0L, 3L), (1L, 1000L, 3L, 3L),
      (2L, 2000L, 6L, 4L)))
  }
}
