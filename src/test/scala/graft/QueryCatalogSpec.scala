package graft

import org.scalatest.funsuite.AnyFunSuite

/** Catalog integrity: duplicate names would silently collapse in the
  * driver-facing Maps; every oracle must belong to a registered query.
  */
class QueryCatalogSpec extends AnyFunSuite {

  test("catalog names are unique") {
    val names = QueryCatalog.all.map(_.name)
    val dupes = names.groupBy(identity).collect { case (n, g) if g.size > 1 => n }
    assert(dupes.isEmpty, s"duplicate catalog names: $dupes")
  }

  test("streamingNames all exist in the catalog and carry 'stream' in the name") {
    val names = QueryCatalog.all.map(_.name).toSet
    assert(QueryCatalog.streamingNames.subsetOf(names),
      QueryCatalog.streamingNames -- names)
    // membership drift guard: every catalog entry named *stream* must be
    // declared streaming (a new streaming entry that skips the set would
    // silently lose its bench isolation)
    assert(names.filter(_.contains("stream")) === QueryCatalog.streamingNames)
  }

  test("storeBuildNames all exist and cover every persisted-store batch entry") {
    val names = QueryCatalog.all.map(_.name).toSet
    assert(QueryCatalog.storeBuildNames.subsetOf(names),
      QueryCatalog.storeBuildNames -- names)
    // membership drift guard (same rationale as streamingNames): every
    // batch entry whose name declares the incremental-store family must be
    // isolation-chunked, or its JVM litter taxes shared-chunk timings again
    val storeish = names.filter(n =>
      (n.contains("incremental") || n.contains("retrain")) && !n.contains("stream"))
    assert(storeish === QueryCatalog.storeBuildNames)
    assert(QueryCatalog.storeBuildNames.intersect(QueryCatalog.streamingNames).isEmpty)
  }

  test("driver maps cover the catalog exactly") {
    assert(SparkEntry.queries.keySet === QueryCatalog.all.map(_.name).toSet)
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
    assert(SparkEntry.oracleSql.size ===
      QueryCatalog.all.count(_.oracle.isDefined))
  }
}
