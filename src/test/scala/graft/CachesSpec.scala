package graft

import graft.operators.Documents

/** The operator-internal persist registry: frames are registered when
  * an operator persists an intermediate and dropped — and ONLY those
  * frames — by a scoped release. */
class CachesSpec extends SparkSuite {

  test("operator persists register with Caches and release unpersists them") {
    Caches.release(spark) // start from a clean slate for this session
    assert(Caches.registered(spark) === 0)
    val out = Documents.dedupSimhash(spark, SparkSpec.sfTiny)
    out.count() // materializes the persisted signature frame
    assert(Caches.registered(spark) > 0,
      "dedupSimhash must route its persist through the registry")
    Caches.release(spark)
    assert(Caches.registered(spark) === 0)
    Caches.release(spark) // idempotent
    assert(Caches.registered(spark) === 0)
  }

  test("release is scoped: caller-owned caches survive") {
    val owned = Tables.load(spark, SparkSpec.sfTiny, "nation").cache()
    owned.count()
    Documents.dedupSimhash(spark, SparkSpec.sfTiny).count()
    Caches.release(spark)
    // the caller's cache is still registered with the cache manager
    assert(owned.storageLevel.useMemory,
      "scoped release must not evict caches it did not create")
    owned.unpersist()
  }
}
