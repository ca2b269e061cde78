package graft.meta

import java.nio.file.Files
import java.sql.Timestamp

import graft.SparkSpec

class StagingSpec extends SparkSpec {

  test("JDBC-backed ledger has identical A/I semantics (embedded Derby)") {
    val props = new java.util.Properties()
    props.setProperty("driver", "org.apache.derby.iapi.jdbc.AutoloadedDriver")
    val st = new JdbcStaging(spark,
      "jdbc:derby:memory:graftstaging;create=true", "product_staging_table", props)
    val t0 = Timestamp.valueOf("2026-01-01 00:00:00")
    assert(st.activeFiles().isEmpty)
    st.markActive("b1", Seq("x.csv", "y.csv"), t0)
    assert(st.activeFiles() === Seq("x.csv", "y.csv"))
    st.markInactive("b1", Seq("x.csv"), Timestamp.valueOf("2026-01-01 01:00:00"))
    assert(st.activeFiles() === Seq("y.csv"))
  }

  test("A/I lifecycle: active set reflects latest status per file") {
    val ledger = Files.createTempDirectory("graft-staging").toString + "/ledger"
    val st = new Staging(spark, ledger)
    val t0 = Timestamp.valueOf("2026-01-01 00:00:00")
    val t1 = Timestamp.valueOf("2026-01-01 01:00:00")

    assert(st.activeFiles().isEmpty)
    st.markActive("b1", Seq("a.csv", "b.csv"), t0)
    assert(st.activeFiles() === Seq("a.csv", "b.csv"))
    st.markInactive("b1", Seq("a.csv"), t1)
    assert(st.activeFiles() === Seq("b.csv"))
    // idempotent re-run of a failed batch: appending a new generation works
    st.markActive("b2", Seq("b.csv"), t1)
    st.markInactive("b2", Seq("b.csv"),
      Timestamp.valueOf("2026-01-01 02:00:00"))
    assert(st.activeFiles().isEmpty)
  }

  test("same-timestamp re-activation wins over a prior INACTIVE (seq ordinal)") {
    val ledger = Files.createTempDirectory("graft-staging").toString + "/ledger"
    val st = new Staging(spark, ledger)
    val t0 = Timestamp.valueOf("2026-01-01 00:00:00")
    st.markActive("b1", Seq("a.csv"), t0)
    st.markInactive("b1", Seq("a.csv"), t0)
    // coarse clock: the new generation's ACTIVE lands at the exact same
    // updatedAt as the old INACTIVE — the append ordinal must break the tie
    st.markActive("b2", Seq("a.csv"), t0)
    assert(st.activeFiles() === Seq("a.csv"))
    st.markInactive("b2", Seq("a.csv"), t0)
    assert(st.activeFiles().isEmpty)
  }
}
