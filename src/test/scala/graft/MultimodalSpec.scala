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
}
