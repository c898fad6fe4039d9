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

  test("memoFrame builds once per key and release clears it; the staged sweep rides it") {
    Caches.release(spark)
    var built = 0
    def get() = Caches.memoFrame(spark, ("spec", 1)) {
      built += 1
      spark.range(3).toDF("x")
    }
    assert(get().count() === 3)
    get()
    assert(built === 1, "second call must reuse the memoized frame")
    Caches.release(spark)
    get()
    assert(built === 2, "release must clear the frame memo")
    // the consumer that motivated it: a repeated STAGED pair pass must
    // not re-run its waves or register fresh persisted frames — the
    // output-plan semantic hash can never dedup a localCheckpoint
    // lineage, so the input-keyed memo is the only thing between a
    // long-lived session and unbounded re-execution
    Caches.release(spark)
    val docs = Tables.load(spark, SparkSpec.sfTiny, "documents")
    Documents.jaccardPairs(docs, 0.6, waves = Some(2)).count()
    val n1 = Caches.registered(spark)
    Documents.jaccardPairs(docs, 0.6, waves = Some(2)).count()
    assert(Caches.registered(spark) === n1,
      "a repeated staged pass must not register new frames")
    Caches.release(spark)
  }

  test("decideOnce memoizes per (plan, budget) and release clears the memo") {
    Caches.release(spark)
    var measured = 0
    def decide() = Caches.decideOnce(spark, planKey = 42, budget = 100L) {
      measured += 1; true
    }
    assert(decide() === true)
    assert(decide() === true)
    assert(measured === 1, "second call must reuse the memoized decision")
    // a different budget is a different question — re-measure
    Caches.decideOnce(spark, planKey = 42, budget = 7L) { measured += 1; false }
    assert(measured === 2)
    // release drops the memo with the persists: a fresh pipeline must
    // re-measure against the data as it is then (growing corpora)
    Caches.release(spark)
    assert(decide() === true)
    assert(measured === 3, "release must clear the decision memo")
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
