package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal
import graft.sources.Tables

/** Multimodal plumbing: binary payload column + typed metadata + batched
  * (mapPartitions) stub decode + frame sampling. */
class MultimodalSpec extends AnyFunSuite with SparkSpec {

  private def media = Multimodal.mediaFromDocs(Tables.documents(spark, sf0001))

  test("media table has the binary payload schema") {
    val sch = media.schema
    assert(sch("bytes").dataType.typeName == "binary")
    assert(media.select("kind").distinct().count() == 3)
  }

  test("batched stub decode produces one feature row per media row, deterministically") {
    val f1 = Multimodal.extractFeatures(spark, media)
    assert(f1.count() == media.count())
    val row = f1.filter(col("media_id") === 0).head()
    val again = Multimodal.extractFeatures(spark, media)
      .filter(col("media_id") === 0).head()
    assert(row == again)
    assert(row.width == row.n_bytes % 640)
  }

  test("metadata pass matches the decode stub on shared fields") {
    val meta = Multimodal.mediaMeta(media).select("media_id", "n_bytes", "content_md5")
    val feat = Multimodal.extractFeatures(spark, media).toDF()
      .select(col("media_id"), col("n_bytes"), col("checksum").as("content_md5"))
    assert(meta.exceptAll(feat).count() == 0)
  }

  test("frame sampling yields up to 4 non-empty slices per payload") {
    val frames = Multimodal.frameSample(media, 4, 16)
    val perDoc = frames.groupBy("media_id").count()
    assert(perDoc.filter(col("count") > 4).count() == 0)
    assert(frames.filter(octet_length(col("frame")) === 0).count() == 0)
    assert(frames.count() > 0)
  }
}
