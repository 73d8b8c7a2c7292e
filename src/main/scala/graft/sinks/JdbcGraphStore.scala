package graft.sinks

import java.sql.{Connection, DriverManager}

/** JDBC-backed [[LiveGraphStore]]: the live-sink seam realized against
  * a real transactional store instead of a test stub. One connection
  * per partition ([[LiveGraphStoreFactory.open]]), one prepared
  * SQL:2003 `MERGE` per key — the statement is atomic, so the
  * find → create-if-absent → update-only-if-greater transaction the
  * reference spells out as two round-trips (dgraph.go:110-132,
  * 175-223) collapses into a single store call, exactly the contract
  * [[LiveUpsert.writeUpserts]] demands:
  *
  * {{{
  * MERGE INTO <table> t USING SYSIBM.SYSDUMMY1
  * ON t.src = ? AND t.dst = ?
  * WHEN MATCHED AND t.score < ? THEN UPDATE SET score = ?
  * WHEN NOT MATCHED THEN INSERT (src, dst, score) VALUES (?, ?, ?)
  * }}}
  *
  * Tested against embedded Apache Derby (in-process, on the Spark
  * classpath) in LiveUpsertSpec; any MERGE-capable JDBC store works by
  * swapping `url` (and `usingDual` for stores whose 1-row dummy table
  * is named differently — Oracle `DUAL`, MySQL 8 `(SELECT 1) t`).
  *
  * Write discipline: autoCommit off, one commit every `commitEvery`
  * upserts plus a final commit on close — the batched replacement for
  * the reference's per-row client transactions. A task that dies
  * mid-batch leaves a committed prefix; that is safe for the same
  * reason Spark's task retry is sufficient here at all: max-merge is
  * idempotent, so the retried task re-applies the prefix and
  * converges (LiveUpsert Scaladoc). Keys are hash-partitioned before
  * the write, so no two live connections ever contend on one key.
  */
class JdbcGraphStore(url: String, table: String, commitEvery: Int)
    extends LiveGraphStore {

  private val conn: Connection = DriverManager.getConnection(url)
  conn.setAutoCommit(false)
  private val stmt = conn.prepareStatement(
    s"MERGE INTO $table t USING SYSIBM.SYSDUMMY1 " +
      "ON t.src = ? AND t.dst = ? " +
      "WHEN MATCHED AND t.score < ? THEN UPDATE SET score = ? " +
      "WHEN NOT MATCHED THEN INSERT (src, dst, score) VALUES (?, ?, ?)")
  private var sinceCommit = 0

  override def upsertIfGreater(src: String, dst: String, score: Double): Unit = {
    stmt.setString(1, src)
    stmt.setString(2, dst)
    stmt.setDouble(3, score)
    stmt.setDouble(4, score)
    stmt.setString(5, src)
    stmt.setString(6, dst)
    stmt.setDouble(7, score)
    stmt.executeUpdate()
    sinceCommit += 1
    if (sinceCommit >= commitEvery) { conn.commit(); sinceCommit = 0 }
  }

  override def close(): Unit =
    try { if (sinceCommit > 0) conn.commit(); stmt.close() }
    finally conn.close()
}

/** Factory shipped to executors — holds only the URL string, so it is
  * trivially serializable; each partition opens its own connection.
  */
class JdbcGraphStoreFactory(url: String, table: String = "edge_state",
    commitEvery: Int = 1000) extends LiveGraphStoreFactory {
  override def open(partitionId: Int): LiveGraphStore =
    new JdbcGraphStore(url, table, commitEvery)
}

object JdbcGraphStore {
  /** Create the edge-state table if absent: `(src, dst)` primary key —
    * the key the batch is pre-merged and hash-partitioned on.
    */
  def ensureTable(url: String, table: String = "edge_state"): Unit = {
    val conn = DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      try st.executeUpdate(
        s"CREATE TABLE $table (" +
          "src VARCHAR(128) NOT NULL, dst VARCHAR(128) NOT NULL, " +
          "score DOUBLE NOT NULL, PRIMARY KEY (src, dst))")
      catch {
        // X0Y32: table already exists — idempotent ensure
        case e: java.sql.SQLException if e.getSQLState == "X0Y32" => ()
      } finally st.close()
    } finally conn.close()
  }
}
