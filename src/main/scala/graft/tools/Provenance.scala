package graft.tools

/** Git provenance for stamped artifacts (LEAKCHECK.json, SCALING.md —
  * the Python `scripts/oracle_check.py` mirrors the same rules for
  * CORRECTNESS_local.json): the HEAD commit plus a dirty-tree flag.
  * A HEAD stamp alone can lie — a dirty-tree run attributes results to
  * a commit that cannot reproduce them — so every artifact records the
  * tree state too. The generated artifacts themselves are excluded
  * from the dirty check (regenerating one must not mark the next as
  * irreproducible; only SOURCE dirt does). When git cannot be invoked
  * at all, the flag defaults to TRUE: the anti-lying stamp must not
  * assert a clean tree exactly when it could not check. */
object Provenance {

  /** Generated artifact files excluded from the dirty-tree check. */
  val ArtifactFiles: Set[String] = Set(
    "CORRECTNESS_local.json", "LEAKCHECK.json", "SCALING.md",
    "bench_last.json")

  def gitHead: String =
    try new String(java.lang.Runtime.getRuntime
        .exec(Array("git", "rev-parse", "HEAD")).getInputStream
        .readAllBytes()).trim
    catch { case _: Exception => "unknown" }

  def gitTreeDirty: Boolean =
    try new String(java.lang.Runtime.getRuntime
        .exec(Array("git", "status", "--porcelain")).getInputStream
        .readAllBytes()).linesIterator
      .filter(_.trim.nonEmpty)
      .exists(l => !ArtifactFiles.contains(l.drop(3).trim))
    catch { case _: Exception => true } // could-not-check must read dirty
}
