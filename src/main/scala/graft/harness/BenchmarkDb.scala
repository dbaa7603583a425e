package graft.harness

import java.sql.{Connection, DriverManager, Statement}

/** SQL results sink — the reference's BenchmarkDb
  * (/root/reference/timedf/report/benchmark_db.py:26-75) against the
  * embedded Derby engine that ships in Spark's jar directory (the offline
  * stand-in for the reference's MySQL/Postgres/sqlite targets; the JSONL
  * sink in Results remains the file-based alternative).
  *
  * Schema mirrors /root/reference/timedf/report/schema.py:29-70:
  * `iteration` (autoincrement id, benchmark, backend, iteration_no,
  * run_id, date, host/param key-values) ←one-to-many→ `measurement`
  * (name, duration_s, iteration FK). Derby has no JSON column type, so
  * the schemaless host_info/params columns store the same JSON text the
  * JSONL sink writes.
  */
final class BenchmarkDb(url: String) extends AutoCloseable {

  private val conn: Connection = DriverManager.getConnection(url)
  createTables()

  private def createTables(): Unit = {
    val ddl = Seq(
      """CREATE TABLE iteration (
        |  id INT GENERATED ALWAYS AS IDENTITY PRIMARY KEY,
        |  benchmark VARCHAR(200) NOT NULL,
        |  backend VARCHAR(200) NOT NULL,
        |  iteration_no INT NOT NULL,
        |  run_id BIGINT NOT NULL,
        |  date_iso VARCHAR(64) NOT NULL,
        |  host_info VARCHAR(4000),
        |  params VARCHAR(4000))""".stripMargin,
      """CREATE TABLE measurement (
        |  id INT GENERATED ALWAYS AS IDENTITY PRIMARY KEY,
        |  name VARCHAR(500) NOT NULL,
        |  duration_s DOUBLE NOT NULL,
        |  iteration_id INT NOT NULL REFERENCES iteration (id))""".stripMargin)
    val st = conn.createStatement()
    try ddl.foreach { sql =>
      try st.executeUpdate(sql)
      catch {
        // Derby has no CREATE TABLE IF NOT EXISTS; X0Y32 = already exists
        case e: java.sql.SQLException if e.getSQLState == "X0Y32" => ()
      }
    } finally st.close()
  }

  /** Insert one iteration + its measurements (reference `report`). */
  def report(it: Results.Iteration): Unit = {
    val ins = conn.prepareStatement(
      "INSERT INTO iteration (benchmark, backend, iteration_no, run_id, date_iso, host_info, params) VALUES (?,?,?,?,?,?,?)",
      Statement.RETURN_GENERATED_KEYS)
    try {
      ins.setString(1, it.benchmark)
      ins.setString(2, it.backend)
      ins.setInt(3, it.iterationNo)
      ins.setLong(4, it.runId)
      ins.setString(5, it.dateIso)
      ins.setString(6, Results.toJsonObject(it.hostInfo))
      ins.setString(7, Results.toJsonObject(it.params))
      ins.executeUpdate()
      val keys = ins.getGeneratedKeys
      keys.next()
      val iterationId = keys.getInt(1)
      val m = conn.prepareStatement(
        "INSERT INTO measurement (name, duration_s, iteration_id) VALUES (?,?,?)")
      try {
        it.measurements.foreach { mm =>
          m.setString(1, mm.name)
          m.setDouble(2, mm.durationS)
          m.setInt(3, iterationId)
          m.addBatch()
        }
        m.executeBatch()
      } finally m.close()
    } finally ins.close()
  }

  /** Scalar count query (spec/report helper). */
  def count(table: String): Long = {
    require(Set("iteration", "measurement")(table), s"unknown table: $table")
    val st = conn.createStatement()
    try {
      val rs = st.executeQuery(s"SELECT COUNT(*) FROM $table")
      rs.next()
      rs.getLong(1)
    } finally st.close()
  }

  override def close(): Unit = conn.close()
}

object BenchmarkDb {
  /** Embedded-Derby URL for a database directory (created on first use). */
  def embeddedUrl(dbDir: String): String = s"jdbc:derby:$dbDir;create=true"
}
