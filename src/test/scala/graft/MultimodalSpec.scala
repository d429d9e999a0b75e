package graft

import graft.multimodal.Multimodal

/** Multimodal plumbing: binary payload schema, deterministic stub
  * decode, chunking for skew control.
  */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs =
    Tables.load(spark, "/root/testdata/sf0.001", "documents")

  test("assets preserve payload bytes and schema") {
    val assets = Multimodal.assetsFromDocuments(docs)
    val one = assets.filter(_.asset_id == 0).collect()(0)
    val text = docs.filter($"doc_id" === 0).collect()(0).getAs[String]("text")
    assert(new String(one.payload, "UTF-8") == text)
    assert(one.kind == "text")
  }

  test("feature extraction is deterministic and complete") {
    val assets = Multimodal.assetsFromDocuments(docs)
    val f1 = Multimodal.extractFeatures(assets).collect()
      .map(f => f.asset_id -> ((f.n_bytes, f.checksum, f.head_hist.toSeq)))
      .toMap
    val f2 = Multimodal.extractFeatures(assets.repartition(7)).collect()
      .map(f => f.asset_id -> ((f.n_bytes, f.checksum, f.head_hist.toSeq)))
      .toMap
    assert(f1 == f2) // partitioning must not change results
    assert(f1.size == docs.count())
    val h = f1(0L)
    assert(h._3.sum == h._1) // histogram covers every byte
  }

  test("frame sampling keeps every stride-th frame only") {
    val assets = Multimodal.assetsFromDocuments(docs)
    val frames = Multimodal.sampleFrames(assets, frameBytes = 50, stride = 3)
      .select($"asset_id", $"frame_id")
      .as[(Long, Int)].collect()
    assert(frames.nonEmpty)
    assert(frames.forall(_._2 % 3 == 0))
    val chunks = Multimodal.chunk(assets, 50)
      .select($"asset_id", $"chunk_id").as[(Long, Int)].collect()
    val expected = chunks.filter(_._2 % 3 == 0).toSet
    assert(frames.toSet == expected)
  }

  test("chunking splits payloads without losing bytes") {
    val assets = Multimodal.assetsFromDocuments(docs)
    val chunks = Multimodal.chunk(assets, chunkBytes = 100)
    val back = chunks.orderBy($"asset_id", $"chunk_id")
      .groupBy($"asset_id")
      .agg(org.apache.spark.sql.functions.sum(
        org.apache.spark.sql.functions.length($"chunk")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val sizes = Multimodal.extractFeatures(assets).collect()
      .map(f => f.asset_id -> f.n_bytes.toLong).toMap
    assert(back == sizes)
  }
}
