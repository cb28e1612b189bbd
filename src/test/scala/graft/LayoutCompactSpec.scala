package graft

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Layout

/** Executable compaction (round-13 verdict item 7): the rewrite step
  * over [[Layout.compactionPlan]]'s assignment, with the atomic
  * directory-swap commit — re-run safety proven by killing inside each
  * crash window, and reads byte-identical before/after.
  */
class LayoutCompactSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def mkTable(dir: String): Unit = {
    import spark.implicits._
    // 12 small files + 1 big one: the small dozen should bin-pack, the
    // big file must carry over by rename (same name, same bytes)
    (0 until 1200).map(i => (i.toLong, s"row_$i", i % 7))
      .toDF("id", "s", "k").repartition(12)
      .write.mode("overwrite").parquet(dir)
    (10000 until 60000).map(i => (i.toLong, s"big_$i", i % 7))
      .toDF("id", "s", "k").coalesce(1)
      .write.mode("append").parquet(dir)
  }

  private def dataFiles(dir: String): Map[String, Long] =
    Files.list(Paths.get(dir)).iterator().asScala
      .filter(p => Files.isRegularFile(p))
      .map(_.getFileName.toString)
      .filterNot(n => n.startsWith("_") || n.startsWith("."))
      .map(n => n -> Files.size(Paths.get(dir, n))).toMap

  private def snapshot(dir: String): Seq[(Long, String, Int)] = {
    import spark.implicits._
    spark.read.parquet(dir).as[(Long, String, Int)].collect().sorted.toSeq
  }

  private def copyDir(from: Path, to: Path): Unit = {
    Files.createDirectories(to)
    Files.list(from).iterator().asScala.foreach { p =>
      Files.copy(p, to.resolve(p.getFileName), StandardCopyOption.COPY_ATTRIBUTES)
    }
  }

  test("compactTable: swap-committed rewrite, keepers renamed, reads identical") {
    val dir = Files.createTempDirectory("graft-compact").toString + "/t"
    mkTable(dir)
    val before = snapshot(dir)
    val filesBefore = dataFiles(dir)
    val bigName = filesBefore.maxBy(_._2)._1
    val target = filesBefore.values.toSeq.sorted.apply(4) * 4
    val r = Layout.compactTable(spark, dir, target)
    assert(r.groups_rewritten >= 2 && r.files_after < r.files_before,
      s"expected a real rewrite, got $r")
    assert(snapshot(dir) == before, "reads must be identical after the swap")
    val filesAfter = dataFiles(dir)
    assert(filesAfter(bigName) == filesBefore(bigName),
      "the keeper must carry over byte-identical under its own name")
    assert(filesAfter.keys.count(_.startsWith("compact-")) ==
      r.groups_rewritten)
    // re-run to the FIXPOINT: every pass keeps the rows identical and
    // strictly shrinks the file count until no mergeable group is left
    // (each pass rewrites >= 2 files into 1, so it terminates)
    var last = r
    var passes = 0
    while (last.groups_rewritten > 0 && passes < 10) {
      last = Layout.compactTable(spark, dir, target)
      assert(snapshot(dir) == before,
        s"pass $passes must not change the rows")
      passes += 1
    }
    assert(last.groups_rewritten == 0, s"must reach a fixpoint, got $last")
  }

  test("compactTable: every crash window recovers to a consistent table") {
    val root = Files.createTempDirectory("graft-compact-crash")
    val dir = root.toString + "/t"
    mkTable(dir)
    val before = snapshot(dir)
    val target = dataFiles(dir).values.toSeq.sorted.apply(4) * 4
    val staged = Paths.get(root.toString, "t._staged")
    val backupP = Paths.get(root.toString, "t._backup")

    // window 1 — torn stage (crash mid-merge, no keeper moves yet):
    // a leftover stage with garbage must be discarded, pass succeeds
    Files.createDirectories(staged)
    Files.writeString(staged.resolve("compact-g0.parquet"), "garbage")
    val r1 = Layout.compactTable(spark, dir, target)
    assert(r1.groups_rewritten >= 2 && snapshot(dir) == before)

    // rebuild a fresh un-compacted table for the next windows
    val dir2 = root.toString + "/t2"
    mkTable(dir2)
    val before2 = snapshot(dir2)
    val staged2 = Paths.get(root.toString, "t2._staged")
    val backup2 = Paths.get(root.toString, "t2._backup")
    val big2 = dataFiles(dir2).maxBy(_._2)._1
    val target2 = dataFiles(dir2).values.toSeq.sorted.apply(4) * 4

    // window 2 — crash mid-keeper-move: the manifest names the moved
    // keeper; recovery must put it back before discarding the stage
    Files.createDirectories(staged2)
    Files.writeString(staged2.resolve("_KEEPERS"), big2)
    Files.move(Paths.get(dir2, big2), staged2.resolve(big2))
    val r2 = Layout.compactTable(spark, dir2, target2)
    assert(r2.groups_rewritten >= 2 && snapshot(dir2) == before2,
      "a half-moved keeper must be recovered, not lost")

    // window 3 — crash between the two swap renames: table renamed
    // away, complete stage present; recovery rolls FORWARD
    val stagedCopy = Paths.get(root.toString, "t2._staged")
    copyDir(Paths.get(dir2), stagedCopy)
    Files.move(Paths.get(dir2), backup2)
    Layout.recoverTable(spark, dir2)
    assert(snapshot(dir2) == before2 && !Files.exists(backup2) &&
      !Files.exists(stagedCopy))

    // window 4 — crash after the swap, before backup cleanup
    copyDir(Paths.get(dir2), backup2)
    Layout.recoverTable(spark, dir2)
    assert(snapshot(dir2) == before2 && !Files.exists(backup2))

    // window 5 — only a backup left: not a protocol state; refuse
    Files.move(Paths.get(dir2), backup2)
    intercept[IllegalStateException] { Layout.recoverTable(spark, dir2) }
  }
}
