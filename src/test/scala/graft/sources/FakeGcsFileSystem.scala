package graft.sources

import java.net.URI

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.RawLocalFileSystem

/** In-JVM Hadoop `FileSystem` for the `gs://` scheme — the hermetic
  * stand-in that lets the object-source seam run in CI with REAL
  * `gs://bucket/...` URIs and no network. `ObjectSource` and the
  * ingest stream talk exclusively to the Hadoop FileSystem API (list,
  * glob, open), which is precisely what the production GCS connector
  * (`gcs-connector-hadoop3`) implements; this fake keeps the URI shape
  * (`gs://<bucket>/<object path>` — scheme + authority + path) and
  * serves bytes from the local filesystem at `<object path>`, so every
  * code path from glob expansion to NDJSON decode is exercised
  * byte-for-byte. Registered per test via
  * `spark.hadoop.fs.gs.impl = graft.sources.FakeGcsFileSystem`
  * (identical to how the real connector registers).
  */
final class FakeGcsFileSystem extends RawLocalFileSystem {
  // NOT an initialized field: the superclass constructor already calls
  // getUri (via getInitialWorkingDirectory → makeQualified) before
  // Scala field initializers run
  private var fsUri: URI = _

  override def initialize(name: URI, conf: Configuration): Unit = {
    // keep the bucket (authority) so checkPath accepts gs://bucket/...
    fsUri = URI.create(
      name.getScheme + "://" + Option(name.getAuthority).getOrElse("") + "/")
    super.initialize(name, conf)
  }

  override def getUri: URI = if (fsUri == null) URI.create("gs:///") else fsUri
  override def getScheme: String = "gs"
}
