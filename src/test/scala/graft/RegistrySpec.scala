package graft

import org.scalatest.funsuite.AnyFunSuite

/** Registry integrity. Scala `Map` literals silently keep the LAST entry
  * for a duplicated key, so a copy-pasted registration can shadow an
  * existing query with no compile error and no runtime signal — round 11
  * caught a second `"ev_cusum"` registration only because the dumped
  * columns looked wrong. The registration idiom is uniform
  * (`"name" -> ((s, d) => ...)`) in every module, so this spec recovers
  * the REGISTERED names from source text, where duplicates are still
  * visible, and cross-checks them against the live registry.
  */
class RegistrySpec extends AnyFunSuite {

  private val reg = """"([a-z0-9_]+)"\s*->\s*\(\(""".r

  private def scalaSources(dir: java.io.File): Seq[java.io.File] =
    if (dir.isDirectory) dir.listFiles.toSeq.flatMap(scalaSources)
    else if (dir.getName.endsWith(".scala")) Seq(dir)
    else Seq.empty

  private lazy val sourceNames: Seq[(String, String)] =
    scalaSources(new java.io.File("src/main/scala")).flatMap { f =>
      val text = new String(
        java.nio.file.Files.readAllBytes(f.toPath),
        java.nio.charset.StandardCharsets.UTF_8)
      reg.findAllMatchIn(text).map(m => m.group(1) -> f.getName)
    }

  test("no query name is registered twice anywhere in the source tree") {
    val dupes = sourceNames.groupBy(_._1).filter(_._2.size > 1)
    assert(dupes.isEmpty,
      s"duplicate registrations (the later one silently wins): " +
        dupes.map { case (n, fs) => s"$n in ${fs.map(_._2).mkString(", ")}" }.mkString("; "))
  }

  test("the source-text registrations are exactly the live registry") {
    // a mismatch here means the regex missed a registration idiom — fix
    // the spec, not the code
    assert(sourceNames.map(_._1).toSet === SparkEntry.queries.keySet)
  }

  test("every oracle belongs to a registered query") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }
}
