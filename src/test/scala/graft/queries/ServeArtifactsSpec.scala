package graft.queries

import java.io.File
import java.nio.file.{Files, Paths, StandardCopyOption}

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Serve-artifact invalidation: the artifact key must track CONTENT, not
  * just mtime — a corpus regenerated in place (same file name, same
  * mtime) must produce a different key and therefore a rebuild, never a
  * stale serve. */
class ServeArtifactsSpec extends AnyFunSuite with TestSpark {

  private def copyDir(src: String, dst: String): Unit = {
    new File(dst).mkdirs()
    new File(src).listFiles().filter(_.getName.endsWith(".parquet"))
      .foreach(f => Files.copy(f.toPath, Paths.get(dst, f.getName),
        StandardCopyOption.REPLACE_EXISTING))
  }

  test("content drift under an identical mtime changes the artifact key (forces rebuild)") {
    val s = spark
    val dir = Files.createTempDirectory("graft_serve_drift").toString
    copyDir("/root/testdata/sf0.001", dir)
    val k1 = ServeArtifacts.key(dir)
    assert(k1 === ServeArtifacts.key(dir), "key must be deterministic")

    // regenerate documents.parquet with different content (drop half the
    // docs), then restore the ORIGINAL mtime — the mtime-keyed scheme
    // this spec guards against would serve stale artifacts here
    val doc = new File(dir, "documents.parquet")
    val oldMtime = doc.lastModified
    val tmp = Files.createTempDirectory("graft_serve_rewrite").toString
    s.read.parquet(doc.toString).where("doc_id % 2 = 0")
      .coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = new File(tmp).listFiles()
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
      .head
    Files.copy(part.toPath, doc.toPath, StandardCopyOption.REPLACE_EXISTING)
    assert(doc.setLastModified(oldMtime), "must be able to pin mtime")
    assert(doc.lastModified === oldMtime)

    val k2 = ServeArtifacts.key(dir)
    assert(k2 !== k1,
      "regenerated content with identical mtime must change the artifact key")
    // the key names the artifact root (asserted by the ensure() test
    // below), so a changed key IS a rebuild
  }

  test("ensure() builds under the content key and round-trips the serve arms' inputs") {
    val s = spark
    val dir = Files.createTempDirectory("graft_serve_build").toString
    copyDir("/root/testdata/sf0.001", dir)
    val root = ServeArtifacts.ensure(s, dir)
    assert(root.endsWith(ServeArtifacts.key(dir)))
    assert(new File(root, "_done").exists)
    for (a <- Seq("pairs.parquet", "clusters.parquet", "contam.parquet",
        "decisions.parquet", "kmeans.parquet"))
      assert(s.read.parquet(s"$root/$a").columns.nonEmpty, s"$a must be readable")
  }
}
