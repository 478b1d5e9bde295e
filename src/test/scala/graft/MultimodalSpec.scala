package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.Binary

class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("strideSample picks every k-th byte from offset 0") {
    val bytes = "abcdefghijk".getBytes("UTF-8")
    assert(new String(Binary.strideSample(bytes, 5), "UTF-8") === "afk")
  }

  test("extractFeatures digests match MessageDigest ground truth") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    val docs = Seq((1L, "hello world")).toDF("doc_id", "text")
    val feat = Binary.extractFeatures(Binary.withPayload(docs), 2).collect().head
    val md = java.security.MessageDigest.getInstance("MD5")
    def hex(b: Array[Byte]) = b.map(x => f"$x%02x").mkString
    assert(feat.n_bytes === 11)
    assert(feat.md5_hex === hex(md.digest("hello world".getBytes("UTF-8"))))
    md.reset()
    assert(feat.strided_md5 === hex(md.digest("hlowrd".getBytes("UTF-8"))))
  }
}
