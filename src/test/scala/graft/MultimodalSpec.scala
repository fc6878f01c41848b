package graft

import graft.multimodal.Multimodal

class MultimodalSpec extends SparkTestBase {

  test("mapPartitions decode pipeline agrees with the expression-based meta query") {
    val fromExpr = Multimodal.meta(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getBoolean(6))).toSet
    val fromDecode = Multimodal.decodeMeta(spark, Sf).collect()
      .map(m => (m.doc_id, m.byte_len, m.fingerprint, m.fake_width, m.fake_height,
        m.fake_channels, m.fake_is_keyframe)).toSet
    assert(fromDecode.nonEmpty && fromDecode == fromExpr)
  }

  test("feature extraction yields fixed-dim vectors, 224-box resizes, ordered frames") {
    val feats = Multimodal.decodeFeatures(spark, Sf).collect()
    assert(feats.nonEmpty)
    feats.foreach { f =>
      assert(f.embedding.length == 16 && f.embedding.forall(x => x >= -1 && x < 1))
      assert(math.max(f.resized_w, f.resized_h) == 224,
        s"aspect-preserving resize targets a 224 box: ${f.resized_w}x${f.resized_h}")
      assert(f.frame_offsets.length == 4 && f.frame_offsets.sameElements(f.frame_offsets.sorted))
    }
    // deterministic: same payload -> same features on a second run
    val again = Multimodal.decodeFeatures(spark, Sf).collect()
      .map(f => f.doc_id -> f.embedding.toSeq).toMap
    feats.foreach(f => assert(again(f.doc_id) == f.embedding.toSeq))
  }

  test("mapPartitions decode embedding is bit-equal to the SQL hex embedding") {
    // the contract that makes mm_embed_topk oracle-checkable: the imperative
    // per-partition decode and the expression-based hexEmbedding compute the
    // SAME md5-hex-pair vector, byte for byte
    val fromDecode = Multimodal.decodeFeatures(spark, Sf).collect()
      .map(f => f.doc_id -> f.embedding.toSeq).toMap
    val fromExpr = Multimodal.hexEmbedding(spark, Sf).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(fromDecode.nonEmpty && fromDecode.keySet == fromExpr.keySet)
    fromDecode.foreach { case (id, v) => assert(v == fromExpr(id), s"doc $id") }
  }
}
