package graft.dedup

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ShardedBloomSpec extends SparkSpec {
  import spark.implicits._

  private def hashed(ids: Range) =
    ids.map(i => s"digest-$i").toDF("digest")
      .withColumn("__h", xxhash64(col("digest")))

  test("probe treats a TORN .tmp shard as absent (first-write crash window), never faults") {
    val store = tmpDir("torn-tmp-store")
    val spec = ShardedBloom.Spec(numShards = 4, expectedItems = 256L, fpp = 0.01)
    // simulate a crash mid-write of a shard's very first bytes: dst was
    // never renamed into place, the .tmp is garbage. Because filters
    // commit BEFORE docs, no corpus digest can depend on that shard yet
    // — the probe must degrade to "absent" (rows pass as new), not
    // throw in the executor and wedge every subsequent batch.
    val layout = java.nio.file.Paths.get(store, spec.layoutDir)
    java.nio.file.Files.createDirectories(layout)
    (0 until 4).foreach { s =>
      java.nio.file.Files.write(layout.resolve(f"shard=$s%05d.bin.tmp"),
        "not a bloom filter".getBytes("UTF-8"))
    }
    val flags = ShardedBloom.probeHits(hashed(0 until 50), "__h", store, spec)
    assert(flags.filter(col("__hit")).count() == 0L,
      "torn tmp shards must read as absent — definitively new")
    // and a later real merge overwrites the garbage and probes correctly
    ShardedBloom.mergeBatch(hashed(0 until 50), "__h", store, spec)
    assert(ShardedBloom.probeHits(hashed(0 until 50), "__h", store, spec)
      .filter(!col("__hit")).count() == 0L)
  }

  test("lost layout dir with a surviving meta pointer reads as stale, and rebuild recovers") {
    val store = tmpDir("lost-layout-store")
    val spec = ShardedBloom.Spec(numShards = 4, expectedItems = 256L, fpp = 0.01)
    ShardedBloom.mergeBatch(hashed(0 until 30), "__h", store, spec)
    assert(ShardedBloom.layoutExists(spark, store, spec))
    // delete the layout out-of-band, keep bloom-meta.json
    import scala.jdk.CollectionConverters._
    val layout = java.nio.file.Paths.get(store, spec.layoutDir)
    java.nio.file.Files.walk(layout).iterator().asScala.toSeq.reverse
      .foreach(java.nio.file.Files.delete)
    assert(!ShardedBloom.layoutExists(spark, store, spec),
      "callers key the rebuild decision on layoutExists — it must see the loss")
    ShardedBloom.rebuild(hashed(0 until 30), "__h", store, spec)
    assert(ShardedBloom.probeHits(hashed(0 until 30), "__h", store, spec)
      .filter(!col("__hit")).count() == 0L)
  }

  test("resize through ensureMeta garbage-collects the superseded layout") {
    val store = tmpDir("resize-gc-store")
    val a = ShardedBloom.Spec(numShards = 4, expectedItems = 256L, fpp = 0.01)
    val b = ShardedBloom.Spec(numShards = 2, expectedItems = 512L, fpp = 0.01)
    ShardedBloom.mergeBatch(hashed(0 until 20), "__h", store, a)
    // a merge at a NEW spec (the crash-window resize path: no rebuild
    // ran because there was nothing to rebuild from) must still flip
    // the pointer and GC the old layout — no orphaned directories
    ShardedBloom.mergeBatch(hashed(0 until 20), "__h", store, b)
    assert(ShardedBloom.readMeta(spark, store).contains(b))
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(store, a.layoutDir)),
      "superseded layout must be deleted after the pointer flip")
    assert(ShardedBloom.probeHits(hashed(0 until 20), "__h", store, b)
      .filter(!col("__hit")).count() == 0L)
  }
}
