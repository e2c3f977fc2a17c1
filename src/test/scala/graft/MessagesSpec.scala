package graft

import graft.pipeline._
import graft.pipeline.Plugins._

/** message_to_jobs parity (launcher.py:269-328): file / dataset /
  * collection payloads, the path/uid fallback for filesystem-serialized
  * files, and metadata extraction incl. the comma-joined list convention. */
class MessagesSpec extends SparkSpec {

  test("file message: one uri, scalar + list metadata") {
    val m = Messages.parse(
      """{"type": "file", "data": {
        |  "uri": "/data/f1.nc", "uid": "f1.nc",
        |  "platform_name": "noaa15", "orbit": 7,
        |  "sensor": ["avhrr", "mhs"]}}""".stripMargin)
    assert(m.msgType == "file")
    assert(m.paths == Seq("/data/f1.nc"))
    assert(m.metadata("platform_name") == "noaa15")
    assert(m.metadata("orbit") == "7")
    assert(m.metadata("sensor") == "avhrr,mhs")
  }

  test("dataset message: one uri per element, in order") {
    val m = Messages.parse(
      """{"type": "dataset", "data": {
        |  "platform_name": "S3A",
        |  "dataset": [{"uri": "/d/a.nc", "uid": "a.nc"},
        |               {"uri": "/d/b.nc", "uid": "b.nc"}]}}""".stripMargin)
    assert(m.msgType == "dataset")
    assert(m.paths == Seq("/d/a.nc", "/d/b.nc"))
    assert(!m.metadata.contains("dataset")) // structure, not metadata
  }

  test("collection message: uris nested one level deeper") {
    val m = Messages.parse(
      """{"type": "collection", "data": {
        |  "collection": [
        |    {"dataset": [{"uri": "/c/1.nc"}, {"uri": "/c/2.nc"}]},
        |    {"dataset": [{"uri": "/c/3.nc"}]}]}}""".stripMargin)
    assert(m.paths == Seq("/c/1.nc", "/c/2.nc", "/c/3.nc"))
  }

  test("filesystem messages fall back to path, then uid") {
    val byPath = Messages.parse(
      """{"type": "file", "data": {
        |  "filesystem": {"cls": "s3fs.S3FileSystem"},
        |  "path": "bucket/f1.nc", "uid": "f1.nc"}}""".stripMargin)
    assert(byPath.paths == Seq("bucket/f1.nc"))
    val byUid = Messages.parse(
      """{"type": "file", "data": {
        |  "filesystem": {"cls": "s3fs.S3FileSystem"}, "uid": "f2.nc"}}""".stripMargin)
    assert(byUid.paths == Seq("f2.nc"))
  }

  test("toContext wires metadata and the expanded worklist") {
    val spec = ProductList(areas = Seq(
      AreaSpec(Some("euro"), products = Seq(ProductSpec("N")))))
    val (ctx, paths) = Messages.toContext(spark, spec,
      """{"type": "file", "data": {"uri": "/data/f1.nc", "platform_name": "noaa15"}}""")
    assert(paths == Seq("/data/f1.nc"))
    assert(ctx.metadata("platform_name") == "noaa15")
    assert(ctx.worklist.map(_.product) == Seq("N"))
    assert(ctx.aborted.isEmpty && ctx.frames.isEmpty)
  }

  test("format_decoration composes decorate.<i>.text templates per item") {
    val spec = ProductList(areas = Seq(
      AreaSpec(Some("euro"), products = Seq(ProductSpec("N", settings = Map(
        "decorate.0.text" -> "{productname} over {area} at {start_time:%H:%M}",
        "decorate.1.text" -> "(c) ops", "productname" -> "CTH")))),
      ))
    val ctx = PipelineContext(spark, spec,
      metadata = Map("start_time" -> "2026-08-12T06:30:00Z"),
      frames = Map.empty, worklist = Worklist.expand(spec))
    val out = FormatDecoration()(ctx)
    val st = out.worklist.head.settings
    assert(st("decorate.0.text") == "CTH over euro at 06:30")
    assert(st("decorate.1.text") == "(c) ops")   // no placeholders: unchanged
    assert(st("productname") == "CTH")           // non-decorate keys untouched
  }

  test("datetime_decoder parity: ISO strings decode recursively, rest untouched") {
    val m = Messages.parse(
      """{"type": "dataset", "data": {
        |  "start_time": "2019-01-01T12:00:00",
        |  "end_time": "2019-01-01T12:15:00+00:00",
        |  "platform_name": "noaa15", "orbit": 7,
        |  "dataset": [{"uri": "/d/a.nc", "creation_time": "2026-08-12T06:30:00Z"}]}}""".stripMargin)
    assert(m.datetimes("start_time") ==
      java.time.Instant.parse("2019-01-01T12:00:00Z"))   // naive -> UTC
    assert(m.datetimes("end_time") ==
      java.time.Instant.parse("2019-01-01T12:15:00Z"))   // offset form
    assert(m.datetimes("creation_time") ==
      java.time.Instant.parse("2026-08-12T06:30:00Z"))   // nested in dataset
    assert(!m.datetimes.contains("platform_name") && !m.datetimes.contains("orbit"))
    assert(m.metadata("start_time") == "2019-01-01T12:00:00") // strings stay
  }
}
