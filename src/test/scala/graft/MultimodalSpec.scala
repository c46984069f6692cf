package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal

class MultimodalSpec extends SpecBase {
  import spark.implicits._

  private lazy val media = Multimodal.asMediaTable(Tables.documents(spark, SfDir)).cache()

  test("media table has binary payload + typed metadata") {
    val schema = media.schema
    assert(schema("media").dataType.typeName == "binary")
    val meta = schema("meta").dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(meta.fieldNames.toSeq == Seq("format", "n_bytes"))
    val row = media.orderBy("id").head()
    assert(row.getAs[Array[Byte]]("media").nonEmpty)
  }

  test("feature extraction is deterministic with the declared dimension") {
    val f1 = Multimodal.extractFeaturesPartitioned(spark, media, dim = 8).collect().sortBy(_.id)
    val f2 = Multimodal.extractFeaturesPartitioned(spark, media, dim = 8).collect().sortBy(_.id)
    assert(f1.length == media.count())
    assert(f1.forall(_.features.length == 8))
    assert(f1.zip(f2).forall { case (a, b) => a.features.sameElements(b.features) })
    assert(f1.forall(_.features.forall(v => v >= 0f && v <= 1f)))
  }

  test("columnar MediaFeatureFold is bit-equal to the mapPartitions codec contract") {
    // The codec swap (a real decoder replacing the stub inside
    // extractFeaturesPartitioned) must be behavior-preserving; this pins
    // the columnar expression q32 runs against the typed partition path,
    // including the affine one-pass fold vs the per-slot sequential fold.
    // Property over the contract space: every dim tier and degenerate
    // payloads (empty, 1-byte, shorter-than-dim) must agree bit-for-bit —
    // the codec boundary (mapPartitions) is the ONLY non-codegen stage in
    // the multimodal path, and this equality is what licenses q32 to run
    // the columnar expression instead.
    val edge = Seq(
      (900001L, "", "txt"), (900002L, "x", "txt"), (900003L, "ab", "txt"))
      .toDF("doc_id", "text", "lang")
    val corpus = Multimodal.asMediaTable(edge).unionByName(media)
    for (dim <- Seq(1, 4, 8, 16)) {
      val columnar = Multimodal.extractFeatures(corpus, dim)
        .collect().map(r => r.getLong(0) -> r.getSeq[Float](2)).toMap
      val typed = Multimodal.extractFeaturesPartitioned(spark, corpus, dim).collect()
      assert(typed.nonEmpty)
      assert(typed.forall(t => columnar(t.id).toArray.sameElements(t.features)),
        s"columnar/partitioned divergence at dim=$dim")
    }
  }

  test("frame sampling reconstitutes a prefix of the payload in order") {
    val one = media.orderBy("id").limit(1)
    val payload = one.head().getAs[Array[Byte]]("media")
    val frames = Multimodal.sampleFrames(one, n = 4).orderBy("frame_idx").collect()
    assert(frames.length == 4)
    val joined = frames.flatMap(_.getAs[Array[Byte]]("frame_bytes"))
    assert(joined.sameElements(payload.take(joined.length)))
  }

  test("resize shrinks payloads by the factor and keeps metadata consistent") {
    val resized = Multimodal.resize(spark, media, factor = 4)
    assert(resized.schema.fieldNames.toSeq == media.schema.fieldNames.toSeq, "schema preserved")
    val joined = media.select($"id", org.apache.spark.sql.functions.octet_length($"media").as("orig"))
      .join(resized.select($"id",
        org.apache.spark.sql.functions.octet_length($"media").as("small"),
        $"meta.n_bytes".as("n_bytes")), "id")
    val bad = joined.filter(
      $"small" =!= org.apache.spark.sql.functions.expr("(orig + 3) div 4") ||
        $"n_bytes" =!= $"small").count()
    assert(bad == 0, "every payload must shrink to ceil(n/4) with matching metadata")
    // deterministic: same bytes on re-run
    val a = Multimodal.resize(spark, media, 4).orderBy("id").head().getAs[Array[Byte]]("media").toSeq
    val b = resized.orderBy("id").head().getAs[Array[Byte]]("media").toSeq
    assert(a == b)
  }
}
