package graft.sink

import graft.config.JdbcDestination
import org.scalatest.funsuite.AnyFunSuite

/** Driverless pin of the per-dialect swap DDL: `swapStatements` is a pure
  * function of the pre-swap table inventory, so every family's exact
  * statement sequence — strategy selection, rename spelling, restore-first
  * self-heal — is asserted here without oracle/snowflake/mssql/mysql
  * drivers on the classpath (only Derby ships in the sandbox; the other
  * families were previously untestable end-to-end).
  */
class SwapStrategySpec extends AnyFunSuite {

  private def commit(dialect: String, tables: Seq[String] = Seq("region", "account")) =
    JdbcSnapshotCommit(JdbcDestination(s"jdbc:$dialect://x/db", dialect), tables)

  test("dialect family strips the sqlalchemy-style driver suffix") {
    assert(commit("postgresql+psycopg2").family == "postgresql")
    assert(commit("mysql+pymysql").family == "mysql")
    assert(commit("snowflake").family == "snowflake")
  }

  test("rename spelling per family") {
    val c = commit("derby")
    assert(c.renameSql("a", "b") == "RENAME TABLE a TO b")
    assert(commit("mssql").renameSql("a", "b") == "EXEC sp_rename 'a', 'b'")
    assert(commit("postgresql").renameSql("a", "b") == "ALTER TABLE a RENAME TO b")
    assert(commit("oracle").renameSql("a", "b") == "ALTER TABLE a RENAME TO b")
  }

  test("transactional family: DROP then RENAME per table, inside one txn") {
    assert(commit("postgresql+psycopg2").swapStatements(Set("region")) == Seq(
      "DROP TABLE region",
      "ALTER TABLE region__tmp RENAME TO region",
      "ALTER TABLE account__tmp RENAME TO account"))
  }

  test("mysql family: ONE atomic multi-RENAME, then old-copy drops") {
    assert(commit("mysql+pymysql").swapStatements(Set("region", "account")) == Seq(
      "RENAME TABLE region TO region__old, region__tmp TO region, " +
        "account TO account__old, account__tmp TO account",
      "DROP TABLE region__old",
      "DROP TABLE account__old"))
    // first-ever run: nothing to move aside, still one RENAME statement
    assert(commit("mariadb").swapStatements(Set.empty) == Seq(
      "RENAME TABLE region__tmp TO region, account__tmp TO account"))
  }

  test("move-aside family (oracle/snowflake/mssql): old table is never dropped before promotion") {
    val stmts = commit("oracle").swapStatements(Set("region"))
    assert(stmts == Seq(
      "ALTER TABLE region RENAME TO region__old",
      "ALTER TABLE region__tmp RENAME TO region",
      "DROP TABLE region__old",
      "ALTER TABLE account__tmp RENAME TO account"))
    // invariant: at every prefix of the script, each table's data exists
    // under `t` or `t__old` or `t__tmp` — a crash anywhere loses nothing
    assert(stmts.indexWhere(_.startsWith("DROP TABLE region__old")) >
           stmts.indexWhere(_.contains("region__tmp RENAME TO region")))
  }

  test("self-heal is restore-first: orphaned __old promotes back when the live table is missing") {
    // crash happened after `region RENAME TO region__old` but before the
    // promote: region__old is the ONLY copy. The next swap must restore it
    // (not drop it) and then treat it as present (move it aside again).
    assert(commit("oracle", Seq("region")).swapStatements(Set("region__old")) == Seq(
      "ALTER TABLE region__old RENAME TO region",
      "ALTER TABLE region RENAME TO region__old",
      "ALTER TABLE region__tmp RENAME TO region",
      "DROP TABLE region__old"))
    // stale __old NEXT TO a live table is the post-promote crash: drop it
    assert(commit("oracle", Seq("region")).swapStatements(Set("region", "region__old")).head ==
      "DROP TABLE region__old")
  }

  test("mysql self-heal feeds the healed table back into the atomic RENAME") {
    assert(commit("mysql", Seq("region")).swapStatements(Set("region__old")) == Seq(
      "ALTER TABLE region__old RENAME TO region",
      "RENAME TABLE region TO region__old, region__tmp TO region",
      "DROP TABLE region__old"))
  }

  // ---- one golden sequence per remaining dialect family, under the
  // ---- exact alias spellings the reference maps (util.py:62-67)

  test("mariadb+pymysql (the reference's mariadb alias): single atomic multi-RENAME") {
    assert(commit("mariadb+pymysql").swapStatements(Set("region", "account")) == Seq(
      "RENAME TABLE region TO region__old, region__tmp TO region, " +
        "account TO account__old, account__tmp TO account",
      "DROP TABLE region__old",
      "DROP TABLE account__old"))
  }

  test("sqlite: transactional DROP + RENAME, ALTER TABLE spelling") {
    assert(commit("sqlite").swapStatements(Set("region", "account")) == Seq(
      "DROP TABLE region",
      "ALTER TABLE region__tmp RENAME TO region",
      "DROP TABLE account",
      "ALTER TABLE account__tmp RENAME TO account"))
  }

  test("derby: transactional DROP + RENAME, RENAME TABLE spelling") {
    assert(commit("derby").swapStatements(Set("region", "account")) == Seq(
      "DROP TABLE region",
      "RENAME TABLE region__tmp TO region",
      "DROP TABLE account",
      "RENAME TABLE account__tmp TO account"))
  }

  test("mssql: move-aside sequence with sp_rename spelling") {
    assert(commit("mssql", Seq("region")).swapStatements(Set("region")) == Seq(
      "EXEC sp_rename 'region', 'region__old'",
      "EXEC sp_rename 'region__tmp', 'region'",
      "DROP TABLE region__old"))
  }

  test("postgresql first-ever run: no DROPs, renames only") {
    assert(commit("postgresql+psycopg2").swapStatements(Set.empty) == Seq(
      "ALTER TABLE region__tmp RENAME TO region",
      "ALTER TABLE account__tmp RENAME TO account"))
  }

  test("every family's script keeps each table recoverable at every prefix") {
    // at any crash point, table data must exist under t, t__old, or t__tmp:
    // no statement may drop a name before its replacement was promoted
    for (dialect <- Seq("postgresql", "mysql", "mariadb+pymysql", "sqlite",
                        "derby", "oracle", "snowflake", "mssql")) {
      val stmts = commit(dialect, Seq("t1")).swapStatements(Set("t1"))
      val promoteIdx = stmts.indexWhere(s =>
        s.contains("t1__tmp") && (s.contains("TO t1") || s.contains("'t1'")))
      val dropOldIdx = stmts.indexWhere(_.startsWith("DROP TABLE t1__old"))
      assert(promoteIdx >= 0, s"$dialect: no promotion of t1__tmp in $stmts")
      if (dropOldIdx >= 0)
        assert(dropOldIdx > promoteIdx,
          s"$dialect: t1__old dropped before t1__tmp promoted in $stmts")
      // transactional families may DROP the live table directly (the txn
      // rolls back wholesale); auto-commit families must move aside first
      if (!Set("postgresql", "sqlite", "derby").contains(dialect.takeWhile(_ != '+')))
        assert(!stmts.exists(_ == "DROP TABLE t1"),
          s"$dialect: auto-commit DDL family dropped the live table in $stmts")
    }
  }
}
