package graft.streaming

import java.nio.file.Files

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.scalatest.funsuite.AnyFunSuite

/** Landing-marker name handling (in-package: the helpers are
 * `private[streaming]`). The strict numeric shape is the commit contract;
 * an operator-made COPY of a valid marker is skipped ONLY while a bare
 * numeric marker with the same-or-higher id still exists — a suffixed
 * file past every bare marker means the real marker may have been
 * RENAMED, and skipping would silently replay landed batches; names with
 * no numeric id at all stay fatal. */
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

  test("covered marker copies are skipped; uncovered or no-id names throw") {
    val (fs, dir) = fixture()
    StreamingIngest.writeLandedMarker(fs, dir, 5L)
    val md = StreamingIngest.markerDir(dir)
    // a copy of a still-present marker (operator backup) must not wedge
    // the stream — the bare marker still names the landed batch
    fs.create(new Path(md, "_last_landed_batch.5.bak")).close()
    assert(StreamingIngest.lastLandedBatch(fs, dir) == 5L)
    // a copy of a SUPERSEDED id is covered by any higher bare marker
    fs.create(new Path(md, "_last_landed_batch.2.bak")).close()
    assert(StreamingIngest.lastLandedBatch(fs, dir) == 5L)
    // a suffixed id PAST every bare marker may be the real marker,
    // renamed — skipping would replay landed batches, so fail safe
    fs.create(new Path(md, "_last_landed_batch.9.swp")).close()
    intercept[java.io.IOException] { StreamingIngest.lastLandedBatch(fs, dir) }
    fs.delete(new Path(md, "_last_landed_batch.9.swp"), false)
    // no numeric id at all: truly ambiguous, refuse to guess
    fs.create(new Path(md, "_last_landed_batch.abc")).close()
    intercept[java.io.IOException] { StreamingIngest.lastLandedBatch(fs, dir) }
  }

  test("a suffixed marker with NO bare marker at all fails safe") {
    val (fs, dir) = fixture()
    val md = StreamingIngest.markerDir(dir)
    fs.mkdirs(md)
    // only a renamed/copied file survives: regressing to -1 would
    // replay every batch of an existing table — refuse instead
    fs.create(new Path(md, "_last_landed_batch.4.bak")).close()
    intercept[java.io.IOException] { StreamingIngest.lastLandedBatch(fs, dir) }
  }

  test("the legacy ROOT marker covers operator copies during migration") {
    val (fs, dir) = fixture()
    val md = StreamingIngest.markerDir(dir)
    fs.mkdirs(md)
    // a pre-versioned table: the root file's CONTENT is the id
    val out = fs.create(new Path(dir, "_last_landed_batch"))
    out.write("9".getBytes("UTF-8")); out.close()
    // an operator copy made during migration, with no bare versioned
    // marker yet: the legacy id 9 proves batch 4 landed — skipping the
    // copy (not wedging) is correct, and the legacy id is the answer
    fs.create(new Path(md, "_last_landed_batch.4.bak")).close()
    assert(StreamingIngest.lastLandedBatch(fs, dir) == 9L)
    // but a copy PAST the legacy id may be the renamed real marker
    fs.create(new Path(md, "_last_landed_batch.12.bak")).close()
    intercept[java.io.IOException] { StreamingIngest.lastLandedBatch(fs, dir) }
  }
}
