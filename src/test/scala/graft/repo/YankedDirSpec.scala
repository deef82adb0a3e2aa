package graft.repo

import graft.SparkSuite

/** The yanked-dir failure classifier, pinned at its round-20 narrowing:
  * a FileNotFoundException with a NULL message is only read as "the
  * superseded target was GC'd under the committer" when it sits beneath
  * a SparkException job-abort frame — a bare null-message FNFE from a
  * genuine missing source racing a supersede surfaces as itself instead
  * of being converted into the retryable no-rows-landed verdict.
  */
class YankedDirSpec extends SparkSuite {

  private lazy val repo = new TableRepo(scratch("yanked-classify"), spark)
  private val target = "/data/tables/t/data-v3"

  test("a message-bearing ENOENT naming the target (or its _temporary dir) classifies as yanked") {
    assert(repo.looksLikeYankedDir(
      new java.io.FileNotFoundException(s"File $target/part-0000 does not exist"), target))
    val nested = new RuntimeException("task failed",
      new java.io.IOException(s"rename failed: $target/_temporary/0 No such file or directory"))
    assert(repo.looksLikeYankedDir(nested, target))
  }

  test("a null-message FNFE classifies ONLY beneath a SparkException job-abort frame") {
    val bare = new java.io.FileNotFoundException()
    assert(bare.getMessage == null)
    assert(!repo.looksLikeYankedDir(bare, target),
      "a bare null-message FNFE with no committer context must surface as itself")
    val aborted = new org.apache.spark.SparkException("Job aborted.",
      new java.io.FileNotFoundException())
    assert(repo.looksLikeYankedDir(aborted, target),
      "the same FNFE beneath the committer's job-abort wrapper is the yanked-dir shape")
  }

  test("a genuine missing-INPUT failure never converts to the retryable verdict") {
    assert(!repo.looksLikeYankedDir(
      new java.io.FileNotFoundException("/some/other/input.parquet does not exist"), target))
    assert(!repo.looksLikeYankedDir(
      new org.apache.spark.SparkException("Job aborted.",
        new java.io.FileNotFoundException("/some/other/input.parquet does not exist")), target))
  }
}
