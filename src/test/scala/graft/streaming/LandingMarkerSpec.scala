package graft.streaming

import java.nio.file.Files

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.scalatest.funsuite.AnyFunSuite

/** Landing-marker name handling (in-package: the helpers are
 * `private[streaming]`). The strict numeric shape is the commit contract;
 * an operator-made COPY of a valid marker must be skipped, not wedge
 * every micro-batch retry; names with no numeric id at all stay fatal. */
class LandingMarkerSpec extends AnyFunSuite {

  private def fixture(): (FileSystem, Path) = {
    val dir = new Path(Files.createTempDirectory("graft-markers").toString)
    (FileSystem.getLocal(new Configuration()), dir)
  }

  test("versioned markers: highest id wins; missing dir is fresh (-1)") {
    val (fs, dir) = fixture()
    assert(StreamingIngest.lastLandedBatch(fs, dir) == -1L)
    StreamingIngest.writeLandedMarker(fs, dir, 3L)
    StreamingIngest.writeLandedMarker(fs, dir, 7L)
    assert(StreamingIngest.lastLandedBatch(fs, dir) == 7L)
  }

  test("marker copies with extra suffixes are skipped; no-id names throw") {
    val (fs, dir) = fixture()
    StreamingIngest.writeLandedMarker(fs, dir, 5L)
    val md = StreamingIngest.markerDir(dir)
    // a copy of a valid marker (operator backup) must not wedge the stream
    fs.create(new Path(md, "_last_landed_batch.5.bak")).close()
    assert(StreamingIngest.lastLandedBatch(fs, dir) == 5L)
    // a HIGHER id with an extra suffix is still a copy, not a commit
    fs.create(new Path(md, "_last_landed_batch.9.swp")).close()
    assert(StreamingIngest.lastLandedBatch(fs, dir) == 5L)
    // no numeric id at all: truly ambiguous, refuse to guess
    fs.create(new Path(md, "_last_landed_batch.abc")).close()
    intercept[java.io.IOException] { StreamingIngest.lastLandedBatch(fs, dir) }
  }
}
