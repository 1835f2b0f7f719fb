package graft

/** Guards the driver's FIRST check: `SparkEntry.entry` must run the
  * full upload → stream-ingest → search journey and return rows. A
  * regression here fails the round before correctness is even looked
  * at, so it gets its own always-on smoke. */
class EntrySmokeSpec extends SparkSuite {

  test("driver flagship entry returns rows") {
    val n = SparkEntry.entry(spark).count()
    info(s"entry rows = $n")
    assert(n > 0)
  }
}
